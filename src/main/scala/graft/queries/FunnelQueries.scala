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
        ORDER BY from_type, to_type"""))
  )
}
