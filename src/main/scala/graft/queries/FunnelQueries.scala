package graft.queries

import org.apache.spark.sql.functions._
import QH._

/** Product-analytics operator families over the events stream: ordered
  * funnel progression and cohort retention. Both are staples of the
  * platform-monitoring surface the reference serves (SURVEY §0: Amplitude
  * attribution, platform-monitoring pipelines) re-expressed as
  * batch-gold queries.
  */
object FunnelQueries {

  val qs: Seq[Q] = Seq(
    // ORDERED FUNNEL: view → click(after the view) → purchase(after the
    // click), per user. The sequential dependency ("first click AFTER
    // the first view") is what separates this from three independent
    // mins; the implementation is a chain of min-aggregates each
    // filtered against the previous stage's timestamp. Scale shape:
    // three map-side-combined aggregates and two equi joins, ALL keyed
    // on user_id — one hash-partitioning family end-to-end, no window
    // over raw events, no per-user sort. Each stage's frame is
    // fact-derived (one row per user) and carries no broadcast hint.
    Q("q114_funnel",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_type"))
        val users = ev.groupBy("user_id").agg(count(lit(1)).as("n_events"))
        val s1 = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts")).as("t_view"))
        val s2 = ev.filter(col("event_type") === "click")
          .join(s1, Seq("user_id"))
          .filter(col("ts") > col("t_view"))
          .groupBy("user_id").agg(min(col("ts")).as("t_click"))
        val s3 = ev.filter(col("event_type") === "purchase")
          .join(s2, Seq("user_id"))
          .filter(col("ts") > col("t_click"))
          .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
        users
          .join(s1, Seq("user_id"), "left")
          .join(s2, Seq("user_id"), "left")
          .join(s3, Seq("user_id"), "left")
          .select(col("user_id"), col("t_view"), col("t_click"),
            col("t_purchase"),
            when(col("t_purchase").isNotNull, 3)
              .when(col("t_click").isNotNull, 2)
              .when(col("t_view").isNotNull, 1)
              .otherwise(0).cast("integer").as("depth"))
          .orderBy("user_id")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
          FROM events),
        users AS (SELECT DISTINCT user_id FROM ev),
        s1 AS (
          SELECT user_id, MIN(ts) AS t_view FROM ev
          WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (
          SELECT e.user_id, MIN(e.ts) AS t_click
          FROM ev e JOIN s1 USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > s1.t_view
          GROUP BY e.user_id),
        s3 AS (
          SELECT e.user_id, MIN(e.ts) AS t_purchase
          FROM ev e JOIN s2 USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
          GROUP BY e.user_id)
        SELECT u.user_id, s1.t_view, s2.t_click, s3.t_purchase,
          CAST(CASE WHEN s3.t_purchase IS NOT NULL THEN 3
                    WHEN s2.t_click IS NOT NULL THEN 2
                    WHEN s1.t_view IS NOT NULL THEN 1
                    ELSE 0 END AS INTEGER) AS depth
        FROM users u
        LEFT JOIN s1 USING (user_id)
        LEFT JOIN s2 USING (user_id)
        LEFT JOIN s3 USING (user_id)
        ORDER BY user_id""")),

    // COHORT RETENTION: users cohorted by the week of their first
    // event; retention(k) = |cohort users active in cohort_week + k| /
    // |cohort|. Scale shape: the first-touch cohort is one
    // map-side-combined min-aggregate on user_id; the activity matrix
    // is a distinct over (user, week) — both shuffles carry one row
    // per user(-week), never raw events; the cohort-size join keys on
    // cohort_week (tiny frame, AQE may broadcast it — no hint, it is
    // fact-derived). Retention rates divide exact longs, rounded at 6.
    Q("q115_cohort_retention",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
        val cohort = ev.groupBy("user_id")
          .agg(min(col("week")).as("cohort_week"))
        val sizes = cohort.groupBy("cohort_week")
          .agg(count(lit(1)).as("cohort_size"))
        val active = ev.distinct()
        active.join(cohort, Seq("user_id"))
          .withColumn("week_offset",
            (datediff(col("week"), col("cohort_week")) / 7)
              .cast("integer"))
          .groupBy("cohort_week", "week_offset")
          .agg(countDistinct(col("user_id")).as("n_active"))
          .join(sizes, Seq("cohort_week"))
          .select(col("cohort_week"), col("week_offset"), col("n_active"),
            col("cohort_size"),
            round(col("n_active").cast("double") / col("cohort_size"), 6)
              .as("retention"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""
        WITH ev AS (
          SELECT user_id,
            CAST(DATE_TRUNC('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
              AS week
          FROM events),
        cohort AS (
          SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id),
        sizes AS (
          SELECT cohort_week, COUNT(*) AS cohort_size
          FROM cohort GROUP BY cohort_week),
        active AS (SELECT DISTINCT user_id, week FROM ev),
        ret AS (
          SELECT c.cohort_week,
            CAST(DATEDIFF('day', c.cohort_week, a.week) / 7 AS INTEGER)
              AS week_offset,
            COUNT(DISTINCT a.user_id) AS n_active
          FROM active a JOIN cohort c USING (user_id)
          GROUP BY 1, 2)
        SELECT r.cohort_week, r.week_offset, r.n_active, s.cohort_size,
          ROUND(CAST(r.n_active AS DOUBLE) / s.cohort_size, 6) AS retention
        FROM ret r JOIN sizes s USING (cohort_week)
        ORDER BY cohort_week, week_offset""")),

    // EVENT TRANSITION MATRIX (first-order Markov): for each ordered
    // pair of consecutive events by the same user, count the
    // (from_type, to_type) transition and normalize per from-state.
    // Scale shape: ONE window over (user_id) — the canonical
    // sequence-reconstruction shuffle; everything after it operates on
    // the transition-pair frame, whose size is bounded by
    // |event_type|^2 regardless of raw row count (the share-of-total
    // window therefore sees a handful of rows). Ties on ts are broken
    // by event_id so the lead() is deterministic.
    Q("q116_transition_matrix",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = t(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val pairs = ev
          .withColumn("to_type", lead(col("event_type"), 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        pairs
          .withColumn("p_transition",
            round(col("n").cast("double") /
              sum(col("n")).over(Window.partitionBy("from_type")), 6))
          .orderBy("from_type", "to_type")
      },
      Some("""
        WITH seq AS (
          SELECT event_type AS from_type,
            LEAD(event_type) OVER
              (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
          FROM events),
        pairs AS (
          SELECT from_type, to_type, COUNT(*) AS n
          FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
        SELECT from_type, to_type, n,
          ROUND(CAST(n AS DOUBLE) /
            SUM(n) OVER (PARTITION BY from_type), 6) AS p_transition
        FROM pairs
        ORDER BY from_type, to_type""")),

    // RFM SEGMENTATION: per purchasing user, recency (days since last
    // purchase, against the corpus max timestamp — data-derived, so
    // deterministic), frequency (purchase count) and monetary
    // (decimal-exact spend), each scored 1–4 against the EXACT
    // quartile breakpoints of the user population. Scale shape: the
    // user frame is one map-side-combined aggregate; the breakpoints
    // and the global max are 1-row frames cross-joined in (the O5
    // pattern) — broadcast, never a global sort: ntile would sort the
    // whole population on a single partition per metric. Exact
    // percentile buffers the per-user values on one reducer — fine for
    // a per-user frame, and approx_percentile is the drop-in at the
    // scale where even that frame overwhelms one executor (documented
    // trade; the oracle needs the exact one). Boundary safety: a user
    // value can only EQUAL a breakpoint when the breakpoint is that
    // order statistic itself (interpolated points lie strictly between
    // distinct observations), so engine-level last-ulp interpolation
    // differences cannot flip a <= comparison.
    Q("q124_rfm",
      (s, d) => {
        val ev = t(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
        val users = purchases.groupBy("user_id")
          .agg(max(col("ts")).as("last_ts"),
            count(lit(1)).as("frequency"),
            round(decSum(col("value")), 6).as("monetary"))
        val gmax = ev.agg(max(col("ts")).as("gmax"))
        val withR = users.crossJoin(gmax)
          .withColumn("recency_days",
            ((unix_timestamp(col("gmax")) - unix_timestamp(col("last_ts"))) /
              lit(86400)).cast("long"))
        val bp = withR.agg(
          expr("percentile(recency_days, array(0.25D, 0.5D, 0.75D))")
            .as("rp"),
          expr("percentile(frequency, array(0.25D, 0.5D, 0.75D))").as("fp"),
          expr("percentile(monetary, array(0.25D, 0.5D, 0.75D))").as("mp"))
        def asc(v: org.apache.spark.sql.Column, p: org.apache.spark.sql.Column) =
          when(v <= element_at(p, 1), 1)
            .when(v <= element_at(p, 2), 2)
            .when(v <= element_at(p, 3), 3)
            .otherwise(4)
        withR.crossJoin(bp)
          .select(col("user_id"), col("recency_days"), col("frequency"),
            col("monetary"),
            // low recency is GOOD: invert the ascending quartile score
            (lit(5) - asc(col("recency_days").cast("double"), col("rp")))
              .as("r_score"),
            asc(col("frequency").cast("double"), col("fp")).as("f_score"),
            asc(col("monetary"), col("mp")).as("m_score"))
          .withColumn("rfm_cell",
            col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
          .orderBy("user_id")
      },
      Some("""
        WITH purchases AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
          FROM events WHERE event_type = 'purchase'),
        users AS (
          SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS frequency,
            ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS VARCHAR)
              AS DOUBLE), 6) AS monetary
          FROM purchases GROUP BY user_id),
        gm AS (SELECT MAX(CAST(ts AS TIMESTAMP)) AS gmax FROM events),
        withr AS (
          SELECT u.*, CAST(DATE_DIFF('second', u.last_ts, g.gmax) // 86400
            AS BIGINT) AS recency_days
          FROM users u CROSS JOIN gm g),
        bp AS (
          SELECT
            QUANTILE_CONT(CAST(recency_days AS DOUBLE), 0.25) AS rp1,
            QUANTILE_CONT(CAST(recency_days AS DOUBLE), 0.5)  AS rp2,
            QUANTILE_CONT(CAST(recency_days AS DOUBLE), 0.75) AS rp3,
            QUANTILE_CONT(CAST(frequency AS DOUBLE), 0.25) AS fp1,
            QUANTILE_CONT(CAST(frequency AS DOUBLE), 0.5)  AS fp2,
            QUANTILE_CONT(CAST(frequency AS DOUBLE), 0.75) AS fp3,
            QUANTILE_CONT(monetary, 0.25) AS mp1,
            QUANTILE_CONT(monetary, 0.5)  AS mp2,
            QUANTILE_CONT(monetary, 0.75) AS mp3
          FROM withr),
        scored AS (
          SELECT w.user_id, w.recency_days, w.frequency, w.monetary,
            5 - (CASE WHEN CAST(w.recency_days AS DOUBLE) <= b.rp1 THEN 1
                 WHEN CAST(w.recency_days AS DOUBLE) <= b.rp2 THEN 2
                 WHEN CAST(w.recency_days AS DOUBLE) <= b.rp3 THEN 3
                 ELSE 4 END) AS r_score,
            CASE WHEN CAST(w.frequency AS DOUBLE) <= b.fp1 THEN 1
                 WHEN CAST(w.frequency AS DOUBLE) <= b.fp2 THEN 2
                 WHEN CAST(w.frequency AS DOUBLE) <= b.fp3 THEN 3
                 ELSE 4 END AS f_score,
            CASE WHEN w.monetary <= b.mp1 THEN 1
                 WHEN w.monetary <= b.mp2 THEN 2
                 WHEN w.monetary <= b.mp3 THEN 3
                 ELSE 4 END AS m_score
          FROM withr w CROSS JOIN bp b)
        SELECT user_id, recency_days, frequency, monetary,
          CAST(r_score AS INTEGER) AS r_score,
          CAST(f_score AS INTEGER) AS f_score,
          CAST(m_score AS INTEGER) AS m_score,
          CAST(r_score * 100 + f_score * 10 + m_score AS INTEGER) AS rfm_cell
        FROM scored
        ORDER BY user_id""")),

    // CONVERSION LATENCY — the timing half of the funnel (q114 counts
    // WHO converts; this measures HOW FAST): for every view, the first
    // purchase by the same user within 24 h, then the latency
    // distribution. The "first event after" pairing is the binned
    // as-of device (q191's day-bucket probe with the exact 24 h bound
    // as a residual and min() as the as-of resolution) — candidates
    // per view are the user's purchases in ≤ 2 calendar days, never a
    // per-user history scan. Latencies are integer epoch-seconds; the
    // percentile runs on the |conversions|-row latency frame (funnel-
    // bounded, far smaller than the stream), kept exact for the gate.
    Q("q195_conversion_latency",
      (s, d) => {
        val ev = t(s, d, "events")
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id").as("vid"), col("user_id"),
            col("ts").as("vts"), date_trunc("day", col("ts")).as("vd"))
        val probe = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts"))
          .withColumn("o", explode(sequence(lit(0), lit(1))))
          .select(col("user_id"), col("pts"),
            (date_trunc("day", col("pts"))
              - expr("INTERVAL '1' DAY") * col("o")).as("vd"))
        val lat = views.join(probe, Seq("user_id", "vd"))
          .filter(col("pts") >= col("vts") &&
            col("pts") < col("vts") + expr("INTERVAL '1' DAY"))
          .groupBy("vid", "vts").agg(min(col("pts")).as("first_p"))
          .select((unix_timestamp(col("first_p"))
            - unix_timestamp(col("vts"))).as("lat_s"))
        lat.agg(
          count(lit(1)).as("n_converted"),
          min(col("lat_s")).as("min_s"),
          round(expr("percentile(lat_s, 0.5D)"), 6).as("p50_s"),
          round(expr("percentile(lat_s, 0.9D)"), 6).as("p90_s"),
          max(col("lat_s")).as("max_s"))
      },
      Some("""
        WITH views AS (
          SELECT event_id AS vid, user_id, ts AS vts,
            DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS vd
          FROM events WHERE event_type = 'view'),
        purchases AS (
          SELECT user_id, ts AS pts,
            DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS pd
          FROM events WHERE event_type = 'purchase'),
        probe AS (
          SELECT user_id, pts, pd - o.o * INTERVAL 1 DAY AS vd
          FROM purchases CROSS JOIN (SELECT UNNEST(RANGE(0, 2)) AS o) o),
        cand AS (
          SELECT v.vid, v.vts, MIN(p.pts) AS first_p
          FROM views v JOIN probe p
            ON p.user_id = v.user_id AND p.vd = v.vd
          WHERE p.pts >= v.vts AND p.pts < v.vts + INTERVAL 1 DAY
          GROUP BY 1, 2),
        lat AS (
          SELECT CAST(FLOOR(EPOCH(first_p)) - FLOOR(EPOCH(vts)) AS BIGINT)
            AS lat_s
          FROM cand)
        SELECT COUNT(*) AS n_converted,
          CAST(MIN(lat_s) AS BIGINT) AS min_s,
          ROUND(QUANTILE_CONT(lat_s, 0.5), 6) AS p50_s,
          ROUND(QUANTILE_CONT(lat_s, 0.9), 6) AS p90_s,
          CAST(MAX(lat_s) AS BIGINT) AS max_s
        FROM lat""")),

    // PATH MINING — top event trigram paths (a→b→c): the sequence
    // extension of q116's single-step transition matrix, the "what do
    // users actually do" report behind any funnel redesign. TWO lead()
    // columns over ONE user partitioning (the q144 device — never a
    // per-user history array), a map-side-combined path aggregation
    // whose cardinality is bounded by |event_types|³, and the global
    // top-10 lowers to TakeOrderedAndProject (the q52 device —
    // k-bounded per partition before a single k-row merge). Total
    // deterministic order: count desc, then the path lexicographically.
    Q("q200_path_trigrams",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        t(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("a"))
          .withColumn("b", lead(col("a"), 1).over(w))
          .withColumn("c", lead(col("a"), 2).over(w))
          .filter(col("b").isNotNull && col("c").isNotNull)
          .groupBy("a", "b", "c").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("a"), col("b"), col("c"))
          .limit(10)
      },
      Some("""
        WITH seq AS (
          SELECT user_id, event_type AS a,
            LEAD(event_type, 1) OVER w AS b,
            LEAD(event_type, 2) OVER w AS c
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        paths AS (
          SELECT a, b, c, COUNT(*) AS n
          FROM seq WHERE b IS NOT NULL AND c IS NOT NULL
          GROUP BY 1, 2, 3)
        SELECT a, b, c, n FROM paths
        ORDER BY n DESC, a, b, c LIMIT 10"""))
  )
}
