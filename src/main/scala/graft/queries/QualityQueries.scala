package graft.queries

import org.apache.spark.sql.functions._
import QH._

/** Round-10 data-quality & operational-diagnostics family — the
  * Deequ-shaped components a 100 TB pipeline runs before and after every
  * load: column profiling, declarative constraint checks, and join-key
  * skew diagnostics. All three reduce the corpus to metric rows in one
  * or two aggregation passes; nothing data-sized survives past the agg.
  */
object QualityQueries {

  val qs: Seq[Q] = Seq(
    // COLUMN PROFILE — per-column (rows, nulls, distinct, min, max) in
    // ONE scan: all stats fold into a single aggregation (the three
    // countDistincts expand the scan 3× map-side — still one pass, one
    // shuffle of partial aggregates), then a codegen'd stack() unpivots
    // the 1-row stats frame to one row per column. Numeric and string
    // extrema travel in separate typed columns: casting a double min to
    // string would make the gate hostage to two engines' float
    // formatting. Scale note: the distinct counts are EXACT here because
    // the oracle hashes exact values; a 100 TB profiler swaps them for
    // the mergeable HLL sketches already in-tree (q99/q101/q130) — a
    // one-line substitution that removes the expand entirely.
    Q("q146_column_profile",
      (s, d) =>
        t(s, d, "orders")
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("o_orderpriority").isNull, 1).otherwise(0))
              .cast("long").as("p_nulls"),
            countDistinct(col("o_orderpriority")).as("p_dist"),
            min(col("o_orderpriority")).as("p_min"),
            max(col("o_orderpriority")).as("p_max"),
            sum(when(col("o_custkey").isNull, 1).otherwise(0))
              .cast("long").as("c_nulls"),
            countDistinct(col("o_custkey")).as("c_dist"),
            min(col("o_custkey")).cast("double").as("c_min"),
            max(col("o_custkey")).cast("double").as("c_max"),
            sum(when(col("o_totalprice").isNull, 1).otherwise(0))
              .cast("long").as("t_nulls"),
            countDistinct(col("o_totalprice")).as("t_dist"),
            min(col("o_totalprice")).as("t_min"),
            max(col("o_totalprice")).as("t_max"))
          .select(expr(
            """stack(3,
              |  'o_orderpriority', n, p_nulls, p_dist,
              |    cast(null as double), cast(null as double), p_min, p_max,
              |  'o_custkey', n, c_nulls, c_dist, c_min, c_max,
              |    cast(null as string), cast(null as string),
              |  'o_totalprice', n, t_nulls, t_dist, t_min, t_max,
              |    cast(null as string), cast(null as string))
              |as (column_name, n_rows, n_nulls, n_distinct,
              |    min_num, max_num, min_str, max_str)""".stripMargin))
          .orderBy("column_name"),
      Some("""
        WITH s AS (SELECT
          COUNT(*) AS n,
          SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS p_nulls,
          COUNT(DISTINCT o_orderpriority) AS p_dist,
          MIN(o_orderpriority) AS p_min, MAX(o_orderpriority) AS p_max,
          SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS c_nulls,
          COUNT(DISTINCT o_custkey) AS c_dist,
          MIN(o_custkey) AS c_min, MAX(o_custkey) AS c_max,
          SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS t_nulls,
          COUNT(DISTINCT o_totalprice) AS t_dist,
          MIN(o_totalprice) AS t_min, MAX(o_totalprice) AS t_max
          FROM orders)
        SELECT 'o_orderpriority' AS column_name, n AS n_rows,
          CAST(p_nulls AS BIGINT) AS n_nulls, p_dist AS n_distinct,
          CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
          p_min AS min_str, p_max AS max_str FROM s
        UNION ALL SELECT 'o_custkey', n, CAST(c_nulls AS BIGINT), c_dist,
          CAST(c_min AS DOUBLE), CAST(c_max AS DOUBLE), NULL, NULL FROM s
        UNION ALL SELECT 'o_totalprice', n, CAST(t_nulls AS BIGINT), t_dist,
          t_min, t_max, NULL, NULL FROM s
        ORDER BY column_name""")),

    // CONSTRAINT CHECKS — assertions as data (the Deequ/DLT-expectations
    // shape, and the batch complement of the reference's DLT
    // `expect_or_drop` semantics): each named check reduces to ONE
    // violation count, the suite is their union — four tiny one-row
    // frames, so the union is free. The FK check is a broadcast ANTI
    // join (dim side broadcast; the fact side is counted, never
    // collected). Downstream orchestration gates on `passed`.
    Q("q147_constraint_checks",
      (s, d) => {
        val orders = t(s, d, "orders")
        val fk = orders
          .join(broadcast(t(s, d, "customer").select(col("c_custkey"))),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit("fk_custkey_in_customer").as("check_name"),
            col("violations"))
        val nn = orders
          .agg(sum(when(col("o_custkey").isNull, 1).otherwise(0))
            .cast("long").as("violations"))
          .select(lit("not_null_o_custkey").as("check_name"),
            col("violations"))
        val pk = orders
          .agg((count(lit(1)) - countDistinct(col("o_orderkey")))
            .cast("long").as("violations"))
          .select(lit("pk_unique_o_orderkey").as("check_name"),
            col("violations"))
        val pos = orders
          .agg(sum(when(col("o_totalprice") <= 0, 1).otherwise(0))
            .cast("long").as("violations"))
          .select(lit("positive_o_totalprice").as("check_name"),
            col("violations"))
        fk.unionByName(nn).unionByName(pk).unionByName(pos)
          .withColumn("passed", col("violations") === 0)
          .orderBy("check_name")
      },
      Some("""
        SELECT check_name, CAST(violations AS BIGINT) AS violations,
          violations = 0 AS passed FROM (
          SELECT 'fk_custkey_in_customer' AS check_name,
            (SELECT COUNT(*) FROM orders o LEFT JOIN customer c
              ON o.o_custkey = c.c_custkey
              WHERE c.c_custkey IS NULL) AS violations
          UNION ALL SELECT 'not_null_o_custkey',
            (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
          UNION ALL SELECT 'pk_unique_o_orderkey',
            (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
          UNION ALL SELECT 'positive_o_totalprice',
            (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0))
        ORDER BY check_name""")),

    // JOIN-KEY SKEW REPORT — the pre-join diagnostic that decides
    // whether q110's salting is needed: per-key cardinalities (one
    // aggregation), then key count / row count / hottest key / skew
    // factor (max·keys/rows) AND the top-5 heaviest keys in a SECOND
    // single aggregation whose only non-scalar state is the k-bounded
    // graft_topk buffer — the heavy-key list costs O(k) memory per map
    // task, not a sort. One row out; at 100 TB this is the cheap scout
    // job you run before committing to a join strategy.
    Q("q148_skew_report",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_orderkey").agg(count(lit(1)).as("c"))
          .agg(
            count(lit(1)).as("n_keys"),
            sum(col("c")).cast("long").as("n_rows"),
            max(col("c")).as("max_rows_per_key"),
            expr("graft_topk(cast(c as double), l_orderkey, 5)").as("top"))
          .select(
            col("n_keys"), col("n_rows"), col("max_rows_per_key"),
            ((col("max_rows_per_key") * col("n_keys")).cast("double")
              / col("n_rows")).as("skew_factor"),
            concat_ws(",", expr(
              "transform(top, x -> concat(cast(x.id as string), ':', cast(cast(x.ord as long) as string)))"))
              .as("top_keys")),
      Some("""
        WITH g AS (SELECT l_orderkey, COUNT(*) AS c
          FROM lineitem GROUP BY 1),
        top AS (SELECT LIST(l_orderkey || ':' || c
            ORDER BY c DESC, l_orderkey) AS l FROM (
          SELECT l_orderkey, c FROM g ORDER BY c DESC, l_orderkey LIMIT 5))
        SELECT COUNT(*) AS n_keys, CAST(SUM(c) AS BIGINT) AS n_rows,
          CAST(MAX(c) AS BIGINT) AS max_rows_per_key,
          CAST(MAX(c) * COUNT(*) AS DOUBLE) / SUM(c) AS skew_factor,
          (SELECT ARRAY_TO_STRING(l, ',') FROM top) AS top_keys
        FROM g""")),

    // TOKEN-DISTRIBUTION DRIFT — the training-data drift monitor: which
    // tokens shifted most between two corpus epochs (here doc_id parity
    // stands in for yesterday/today snapshots). One dictionary-shaped
    // aggregation (conditional counts per token), totals from the
    // dictionary frame broadcast back, and the drift rank key is the
    // CROSS-MULTIPLIED integer |c1·n2 − c2·n1| — exactly ordering rate
    // differences WITHOUT dividing first, so ranking never depends on
    // float rounding (the decimal product mirrors DuckDB's HUGEINT).
    // Top-20 lowers to TakeOrderedAndProject.
    Q("q151_token_drift",
      (s, d) => {
        val tok = t(s, d, "documents")
          .select((col("doc_id") % 2).as("epoch"),
            explode(split(col("text"), " ")).as("token"))
        val c = tok.groupBy("token").agg(
          sum(when(col("epoch") === 0, 1).otherwise(0)).cast("long").as("c1"),
          sum(when(col("epoch") === 1, 1).otherwise(0)).cast("long").as("c2"))
        val n = c.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
        c.crossJoin(broadcast(n))
          .select(col("token"), col("c1"), col("c2"),
            (col("c1").cast("double") / col("n1")).as("rate1"),
            (col("c2").cast("double") / col("n2")).as("rate2"),
            abs(col("c1").cast("decimal(38,0)") * col("n2").cast("decimal(19,0)")
              - col("c2").cast("decimal(38,0)") * col("n1").cast("decimal(19,0)"))
              .cast("double").as("drift"))
          .orderBy(desc("drift"), asc("token"))
          .limit(20)
      },
      Some("""
        WITH tok AS (
          SELECT doc_id % 2 AS epoch, UNNEST(STRING_SPLIT(text, ' ')) AS token
          FROM documents),
        c AS (
          SELECT token,
            COUNT(*) FILTER (epoch = 0) AS c1,
            COUNT(*) FILTER (epoch = 1) AS c2
          FROM tok GROUP BY token),
        n AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM c)
        SELECT token, CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2,
          CAST(c1 AS DOUBLE) / n1 AS rate1,
          CAST(c2 AS DOUBLE) / n2 AS rate2,
          CAST(ABS(c1 * n2 - c2 * n1) AS DOUBLE) AS drift
        FROM c, n
        ORDER BY drift DESC, token LIMIT 20""")),

    // DELETION-PROPAGATION AUDIT — the right-to-be-forgotten job: purge
    // every event of the users on a deletion list and PROVE the purge
    // (remaining_rows must be 0 — the anti join's complement checked by
    // a membership-marking left join, one pass over the kept frame).
    // The deletion list is broadcast: a compliance queue is structurally
    // tiny relative to the corpus (thousands of subjects vs billions of
    // rows) — that assumption is the documented contract, not a size
    // guess. rows_before/after/deleted reconcile exactly.
    Q("q152_deletion_audit",
      (s, d) => {
        val ev = t(s, d, "events")
        val del = ev.filter(col("user_id") % 10 === 7)
          .select(col("user_id")).distinct()
        val kept = ev.join(broadcast(del), Seq("user_id"), "left_anti")
        val keptStats = kept
          .join(broadcast(del.withColumn("in_del", lit(1))),
            Seq("user_id"), "left")
          .agg(count(lit(1)).as("rows_after"),
            sum(coalesce(col("in_del"), lit(0))).cast("long")
              .as("remaining_rows"))
        del.agg(count(lit(1)).as("n_users_deleted"))
          .crossJoin(ev.agg(count(lit(1)).as("rows_before")))
          .crossJoin(keptStats)
          .withColumn("rows_deleted", col("rows_before") - col("rows_after"))
          .select(col("n_users_deleted"), col("rows_before"),
            col("rows_after"), col("rows_deleted"), col("remaining_rows"))
      },
      Some("""
        WITH del AS (
          SELECT DISTINCT user_id FROM events WHERE user_id % 10 = 7),
        kept AS (
          SELECT e.* FROM events e LEFT JOIN del d ON e.user_id = d.user_id
          WHERE d.user_id IS NULL)
        SELECT
          (SELECT COUNT(*) FROM del) AS n_users_deleted,
          (SELECT COUNT(*) FROM events) AS rows_before,
          (SELECT COUNT(*) FROM kept) AS rows_after,
          (SELECT COUNT(*) FROM events) - (SELECT COUNT(*) FROM kept)
            AS rows_deleted,
          (SELECT COUNT(*) FROM kept k JOIN del d ON k.user_id = d.user_id)
            AS remaining_rows""")),

    // SNAPSHOT DRIFT — the cross-epoch twin of q146's single-snapshot
    // profile: split the stream at a calendar boundary, profile each
    // epoch per event_type (count, distinct users, exact decimal
    // mean), and flag volume drift (count ratio outside [0.8, 1.2])
    // and mean shift (>10% of the old mean). This is the check a
    // pipeline runs between yesterday's and today's load before
    // promoting a snapshot. Both profiles come out of ONE map-side-
    // combined groupBy over a single scan (epoch is just a second
    // grouping key); the A⋈B self-join is |types|-sized. Drift
    // booleans stay in integer cross-multiplication (n_b·10 > n_a·12)
    // and rounded-decimal arithmetic — no raw float ratio feeds a
    // gate.
    Q("q188_snapshot_drift",
      (s, d) => {
        val prof = t(s, d, "events")
          .withColumn("ep",
            when(col("ts").cast("date") < lit("2024-01-16").cast("date"),
              "A").otherwise("B"))
          .groupBy("event_type", "ep")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("users"),
            round(decAvg(col("value")), 6).as("mean_v"))
        val a = prof.filter(col("ep") === "A")
          .select(col("event_type"), col("n").as("n_a"),
            col("users").as("users_a"), col("mean_v").as("mean_a"))
        val b = prof.filter(col("ep") === "B")
          .select(col("event_type"), col("n").as("n_b"),
            col("users").as("users_b"), col("mean_v").as("mean_b"))
        a.join(b, "event_type")
          .select(col("event_type"), col("n_a"), col("n_b"),
            col("users_a"), col("users_b"), col("mean_a"), col("mean_b"),
            (col("n_b") * 10 > col("n_a") * 12 ||
              col("n_b") * 10 < col("n_a") * 8).as("count_drift"),
            (abs(col("mean_b") - col("mean_a")) * 10 > abs(col("mean_a")))
              .as("mean_drift"))
          .orderBy("event_type")
      },
      Some("""
        WITH tagged AS (
          SELECT event_type, user_id, value,
            CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
              THEN 'A' ELSE 'B' END AS ep
          FROM events),
        prof AS (
          SELECT event_type, ep, COUNT(*) AS n,
            COUNT(DISTINCT user_id) AS users,
            ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS VARCHAR)
              AS DOUBLE) / COUNT(*), 6) AS mean_v
          FROM tagged GROUP BY 1, 2),
        a AS (SELECT * FROM prof WHERE ep = 'A'),
        b AS (SELECT * FROM prof WHERE ep = 'B')
        SELECT a.event_type, a.n AS n_a, b.n AS n_b, a.users AS users_a,
          b.users AS users_b, a.mean_v AS mean_a, b.mean_v AS mean_b,
          (b.n * 10 > a.n * 12) OR (b.n * 10 < a.n * 8) AS count_drift,
          ABS(b.mean_v - a.mean_v) * 10 > ABS(a.mean_v) AS mean_drift
        FROM a JOIN b USING (event_type) ORDER BY a.event_type""")),

    // CORPUS DATACARD — the one-row summary published with a dataset
    // release (docs/tokens/languages/sources, exact-duplicate count via
    // fingerprint distinct, short-doc count, language share, mean
    // length): every number the reference's downstream consumers ask
    // for first, in ONE aggregation pass over ONE scan. The three
    // countDistincts expand the pass ×3 (Spark's distinct-agg rewrite)
    // but each leg is map-side combined and the fact is read once —
    // there is no cheaper exact shape, and the sketched alternative is
    // already in-tree (q169) when approximation is acceptable.
    Q("q197_corpus_datacard",
      (s, d) => {
        t(s, d, "documents")
          .select(col("lang"), col("source"), col("n_chars"),
            size(split(col("text"), " ")).cast("long").as("tok"),
            md5(col("text")).as("fp"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("total_chars"),
            sum(col("tok")).cast("long").as("total_tokens"),
            countDistinct(col("lang")).as("n_langs"),
            countDistinct(col("source")).as("n_sources"),
            (count(lit(1)) - countDistinct(col("fp"))).cast("long")
              .as("n_exact_dupes"),
            sum(when(col("n_chars") < 50, 1L).otherwise(0L)).as("n_short"),
            round(sum(when(col("lang") === "en", 1).otherwise(0))
              .cast("double") / count(lit(1)), 6).as("en_share"),
            round(sum(col("tok")).cast("double") / count(lit(1)), 6)
              .as("mean_tokens"))
      },
      Some("""
        SELECT COUNT(*) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS total_chars,
          CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS total_tokens,
          COUNT(DISTINCT lang) AS n_langs,
          COUNT(DISTINCT source) AS n_sources,
          CAST(COUNT(*) - COUNT(DISTINCT MD5(text)) AS BIGINT)
            AS n_exact_dupes,
          CAST(SUM(CASE WHEN n_chars < 50 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_short,
          ROUND(CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*), 6) AS en_share,
          ROUND(CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS DOUBLE)
            / COUNT(*), 6) AS mean_tokens
        FROM documents""")),

    // EXACT ROC-AUC BY RANK-SUM — the classifier-evaluation metric for
    // every quality/langid/dedup scorer in the corpus: per source, how
    // well does document length separate English from the rest?
    // AUC = P(score_pos > score_neg) + ½·P(tie), computed exactly via
    // the Mann–Whitney rank-sum with MIDRANKS for ties — and the scale
    // device is the same dictionary-CDF shape as q138/q190: group to
    // the per-(source, score) frequency frame first, take running
    // below-counts over that bounded dictionary (PARTITIONED by source
    // — no global window), and assemble 2·ΣR⁺ = Σ cp·(2·below + c + 1)
    // in integer arithmetic (decimal-accumulated: at 10¹² rows the sum
    // passes 2⁶³). The fact table is touched by exactly one map-side-
    // combined aggregate; everything after is dictionary-sized. One
    // mirrored IEEE division at the end; a source with no positives or
    // no negatives yields NULL (the q190 degenerate-row convention).
    Q("q216_auc",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, d, "documents").select(col("source"),
          col("n_chars").as("score"),
          when(col("lang") === "en", 1L).otherwise(0L).as("y"))
        val g = docs.groupBy("source", "score")
          .agg(sum(col("y")).as("cp"), count(lit(1)).as("c"))
        val r = g.withColumn("below", coalesce(sum(col("c")).over(
          Window.partitionBy("source").orderBy("score")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        r.groupBy("source").agg(
            sum((col("cp") * (col("below") * 2 + col("c") + 1))
              .cast("decimal(38,0)")).as("two_r"),
            sum(col("cp")).as("np"),
            sum(col("c")).as("n"))
          .select(col("source"), col("np"),
            (col("n") - col("np")).as("nn"),
            when(col("np") > 0 && col("n") > col("np"),
              round((col("two_r").cast("double")
                  - col("np").cast("double") * (col("np") + 1))
                / (col("np").cast("double") * (col("n") - col("np")) * 2),
                6))
              .otherwise(lit(null).cast("double")).as("auc"))
          .orderBy("source")
      },
      Some("""
        WITH s AS (
          SELECT source, n_chars AS score,
            CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
          FROM documents),
        g AS (
          SELECT source, score, SUM(y) AS cp, COUNT(*) AS c
          FROM s GROUP BY 1, 2),
        r AS (
          SELECT source, cp, c,
            COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY score
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
          FROM g),
        a AS (
          SELECT source, SUM(cp * (2 * below + c + 1)) AS two_r,
            SUM(cp) AS np, SUM(c) AS n
          FROM r GROUP BY 1)
        SELECT source, CAST(np AS BIGINT) AS np,
          CAST(n - np AS BIGINT) AS nn,
          CASE WHEN np > 0 AND n > np THEN
            ROUND((CAST(two_r AS DOUBLE) - CAST(np AS DOUBLE) * (np + 1))
              / (CAST(np AS DOUBLE) * (n - np) * 2), 6)
          ELSE NULL END AS auc
        FROM a ORDER BY source""")),

    // CALIBRATION BINS — q216's AUC measures ranking; this measures
    // whether the scores MEAN what they say (the reliability diagram +
    // expected calibration error, the standard pair for any quality /
    // langid / dedup classifier before its threshold is trusted). The
    // synthetic "predicted probability" is exact thousandths
    // ((n_chars mod 1000)/1000), so bin assignment is pure integer
    // arithmetic ((n_chars mod 1000) div 100) and mean confidence per
    // bin is a decimal-exact ratio — no transcendental anywhere, the
    // gate hashes exact sextodecimal... exact 6-dp values. Scale shape:
    // ONE map-side-combined aggregate to 10 bins; ECE is assembled from
    // the bin frame (a 10-row broadcast), never a second corpus pass.
    Q("q217_calibration",
      (s, d) => {
        val docs = t(s, d, "documents").select(
          (col("n_chars") % 1000).as("mille"),
          when(col("lang") === "en", 1L).otherwise(0L).as("y"))
        val bins = docs
          .groupBy(((col("mille")) / lit(100)).cast("long").as("bin"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"),
            sum(col("mille")).as("conf_sum"))
        val total = bins.agg(sum(col("n")).as("n_total"))
        // every ratio is one IEEE division of two EXACT integers (the
        // corpus's mirrored-division convention — decimal division has
        // engine-specific result scales, integer→double does not)
        bins.crossJoin(broadcast(total))
          .select(col("bin"), col("n"), col("pos"),
            round(col("conf_sum").cast("double") / (col("n") * 1000), 6)
              .as("conf"),
            round(col("pos").cast("double") / col("n"), 6).as("acc"),
            round(abs(col("pos") * 1000 - col("conf_sum")).cast("double")
              / (col("n") * 1000), 6).as("gap"),
            round(col("n").cast("double") / col("n_total"), 6)
              .as("weight"))
          .orderBy("bin")
      },
      Some("""
        WITH s AS (
          SELECT n_chars % 1000 AS mille,
            CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
          FROM documents),
        b AS (
          SELECT mille // 100 AS bin, COUNT(*) AS n, SUM(y) AS pos,
            SUM(mille) AS conf_sum
          FROM s GROUP BY 1),
        tot AS (SELECT SUM(n) AS n_total FROM b)
        SELECT CAST(bin AS BIGINT) AS bin, n, CAST(pos AS BIGINT) AS pos,
          ROUND(CAST(conf_sum AS DOUBLE) / (n * 1000), 6) AS conf,
          ROUND(CAST(pos AS DOUBLE) / n, 6) AS acc,
          ROUND(CAST(ABS(pos * 1000 - conf_sum) AS DOUBLE) / (n * 1000), 6)
            AS gap,
          ROUND(CAST(n AS DOUBLE) / n_total, 6) AS weight
        FROM b, tot ORDER BY bin""")),

    // K-ANONYMITY AUDIT — the privacy complement of the deletion audit
    // (q152): how re-identifiable is a release keyed by quasi-
    // identifiers? Group by the QI tuple (lang, source, length band),
    // then roll the GROUP-SIZE distribution into k bands: singleton
    // cells are unique individuals, cells below k=5 fail the classic
    // disclosure threshold. Both levels are map-side-combined
    // aggregates; the second operates on the cell frame (|QI
    // dictionary| rows), so the fact table is scanned once however
    // large the release. All-integer output — nothing for the gate to
    // drift on.
    Q("q218_k_anonymity",
      (s, d) => {
        val cells = t(s, d, "documents")
          .groupBy(col("lang"), col("source"),
            (col("n_chars") / lit(100)).cast("long").as("len_band"))
          .agg(count(lit(1)).as("k"))
        cells
          .groupBy(when(col("k") === 1, "k=1")
            .when(col("k") <= 4, "k=2-4")
            .when(col("k") <= 9, "k=5-9")
            .otherwise("k>=10").as("k_band"))
          .agg(count(lit(1)).as("n_cells"),
            sum(col("k")).as("n_records"),
            min(col("k")).as("k_min"),
            max(col("k")).as("k_max"))
          .orderBy("k_band")
      },
      Some("""
        WITH cells AS (
          SELECT lang, source, n_chars // 100 AS len_band, COUNT(*) AS k
          FROM documents GROUP BY 1, 2, 3)
        SELECT CASE WHEN k = 1 THEN 'k=1' WHEN k <= 4 THEN 'k=2-4'
            WHEN k <= 9 THEN 'k=5-9' ELSE 'k>=10' END AS k_band,
          COUNT(*) AS n_cells, CAST(SUM(k) AS BIGINT) AS n_records,
          CAST(MIN(k) AS BIGINT) AS k_min, CAST(MAX(k) AS BIGINT) AS k_max
        FROM cells GROUP BY 1 ORDER BY 1""")),

    // DIFFERENTIALLY-PRIVATE NOISY RELEASE — the perturbation side of
    // the privacy toolbox (q218 is the suppression side; q221 the
    // redaction side): publish per-(lang, source) corpus statistics
    // with discrete-Laplace noise and a contribution bound, the
    // mechanism shape of the standard DP aggregation libraries. The
    // pieces, each exact and engine-portable:
    //  * CONTRIBUTION BOUNDING: each document's token count is clamped
    //    to C=100 before aggregation — the release's sensitivity is C
    //    by construction, not by hoping documents are small.
    //  * NOISE: two-sided geometric with alpha = 1/2 (the discrete
    //    Laplace at eps = ln 2 per unit sensitivity), derived from the
    //    TRAILING-ZERO COUNT of a seeded md5 integer: P(ntz = k) =
    //    2^-(k+1) exactly, sign from the low bit — pure integer ops
    //    (h & -h isolates the lowest set bit; its binary length - 1 is
    //    the magnitude), no float inverse-CDF, bit-equal across
    //    engines. A production release draws fresh randomness; the
    //    seeded form is the TESTABLE core (same mechanism, pinned
    //    coins) and doubles as the deterministic-replay mode a privacy
    //    audit wants. The OR of 2^50 bounds the magnitude and removes
    //    the h=0 edge.
    //  * ACCOUNTING: two released stats per group at eps = ln 2 each;
    //    the ledger column carries 2·ln 2 in exact micro-nat
    //    fixed-point, summable downstream without float drift.
    // True columns are retained ONLY for the oracle gate and the
    // noise-audit spec — a production release projects them away.
    Q("q264_dp_noisy_release",
      (s, d) => {
        def geom(tag: String) = {
          val h = expr(
            s"cast(conv(substring(md5(concat_ws('|', lang, source, " +
              s"'graft-dp-v1', '$tag')), 1, 13), 16, 10) as bigint)")
          val x = shiftright(h, 1).bitwiseOR(lit(1L << 50))
          val lowestBit = x.bitwiseAND(lit(0L) - x)
          val mag = (length(conv(lowestBit, 10, 2)) - 1).cast("long")
          (lit(1L) - lit(2L) * h.bitwiseAND(lit(1L))) * mag
        }
        t(s, d, "documents")
          .select(col("lang"), col("source"),
            least(lit(100L), size(split(col("text"), " ")).cast("long"))
              .as("tok_capped"))
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("tok_capped")).as("tok_sum"))
          .select(col("lang"), col("source"),
            col("n_docs"), col("tok_sum"),
            geom("d").as("noise_docs"),
            (geom("t") * 100L).as("noise_tok"))
          .select(col("lang"), col("source"), col("n_docs"),
            col("tok_sum"), col("noise_docs"), col("noise_tok"),
            greatest(lit(0L), col("n_docs") + col("noise_docs"))
              .as("released_docs"),
            greatest(lit(0L), col("tok_sum") + col("noise_tok"))
              .as("released_tok"),
            lit(1386294L).as("eps_micronats"))
          .orderBy("lang", "source")
      },
      Some("""
        WITH g AS (
          SELECT lang, source, COUNT(*) AS n_docs,
            CAST(SUM(LEAST(100, LEN(STRING_SPLIT(text, ' ')))) AS BIGINT)
              AS tok_sum
          FROM documents GROUP BY 1, 2),
        h AS (
          SELECT *,
            CAST(LIST_REDUCE(LIST_TRANSFORM(
              SPLIT(SUBSTRING(MD5(CONCAT_WS('|', lang, source,
                'graft-dp-v1', 'd')), 1, 13), ''),
              x -> CAST(POSITION(x IN '0123456789abcdef') - 1 AS BIGINT)),
              (a, x) -> a * 16 + x) AS BIGINT) AS hd,
            CAST(LIST_REDUCE(LIST_TRANSFORM(
              SPLIT(SUBSTRING(MD5(CONCAT_WS('|', lang, source,
                'graft-dp-v1', 't')), 1, 13), ''),
              x -> CAST(POSITION(x IN '0123456789abcdef') - 1 AS BIGINT)),
              (a, x) -> a * 16 + x) AS BIGINT) AS ht
          FROM g),
        nz AS (
          SELECT lang, source, n_docs, tok_sum,
            (1 - 2 * (hd % 2)) *
              (LENGTH(printf('%b',
                ((hd // 2) | 1125899906842624)
                & -((hd // 2) | 1125899906842624))) - 1) AS noise_docs,
            (1 - 2 * (ht % 2)) *
              (LENGTH(printf('%b',
                ((ht // 2) | 1125899906842624)
                & -((ht // 2) | 1125899906842624))) - 1) * 100
              AS noise_tok
          FROM h)
        SELECT lang, source, CAST(n_docs AS BIGINT) AS n_docs, tok_sum,
          CAST(noise_docs AS BIGINT) AS noise_docs,
          CAST(noise_tok AS BIGINT) AS noise_tok,
          CAST(GREATEST(0, n_docs + noise_docs) AS BIGINT)
            AS released_docs,
          CAST(GREATEST(0, tok_sum + noise_tok) AS BIGINT)
            AS released_tok,
          CAST(1386294 AS BIGINT) AS eps_micronats
        FROM nz ORDER BY lang, source""")),

    // L-DIVERSITY AUDIT — the attribute-disclosure side of the privacy
    // toolbox (q218 measures re-identification via cell size k; this
    // measures what a matched cell REVEALS): per quasi-identifier cell
    // (nation, account-balance band) over customers, how diverse is the
    // sensitive attribute (market segment)? Two standard criteria, both
    // exact-integer so the gate is bit-tight:
    //  * DISTINCT l-diversity: number of distinct sensitive values in
    //    the cell (l >= 3 required here).
    //  * RECURSIVE (c,l)-diversity with c=2, l=3: the most common
    //    sensitive value must not dominate — top frequency
    //    < c * (sum of frequencies from rank l down). Pure integer
    //    window ranks, no entropy logs (entropy l-diversity needs ln,
    //    which is not bit-portable across engines; the recursive form
    //    is the stronger criterion anyway).
    // Scale shape: one hash agg to (cell, sensitive) counts — map-side
    // combined, cardinality bounded by |nations|x|bands|x|segments| —
    // then a window over each cell's <=5 segment rows. Nothing ever
    // shuffles more than the distinct-cell frame.
    Q("q268_l_diversity",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val freq = t(s, d, "customer")
          .groupBy(col("c_nationkey").as("nation"),
            floor(col("c_acctbal") / 2000).cast("long").as("bal_band"),
            col("c_mktsegment").as("seg"))
          .agg(count(lit(1)).as("f"))
        val w = Window.partitionBy("nation", "bal_band")
          .orderBy(desc("f"), col("seg"))
        val ranked = freq.withColumn("rk", row_number().over(w))
        ranked
          .groupBy("nation", "bal_band")
          .agg(sum(col("f")).as("k"),
            count(lit(1)).as("l_distinct"),
            max(when(col("rk") === 1, col("f"))).as("top_freq"),
            sum(when(col("rk") >= 3, col("f"))).as("tail_sum"))
          .select(col("nation"), col("bal_band"),
            col("k").cast("long").as("k"),
            col("l_distinct").cast("long").as("l_distinct"),
            col("top_freq").cast("long").as("top_freq"),
            coalesce(col("tail_sum"), lit(0L)).cast("long").as("tail_sum"),
            (col("l_distinct") >= 3 &&
              col("top_freq") < lit(2) * coalesce(col("tail_sum"), lit(0L)))
              .as("rcl_ok"))
          .orderBy("nation", "bal_band")
      },
      Some("""
        WITH freq AS (
          SELECT c_nationkey AS nation,
            CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS bal_band,
            c_mktsegment AS seg, COUNT(*) AS f
          FROM customer GROUP BY 1, 2, 3),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY nation, bal_band
            ORDER BY f DESC, seg) AS rk
          FROM freq)
        SELECT nation, bal_band, CAST(SUM(f) AS BIGINT) AS k,
          CAST(COUNT(*) AS BIGINT) AS l_distinct,
          CAST(MAX(CASE WHEN rk = 1 THEN f END) AS BIGINT) AS top_freq,
          CAST(COALESCE(SUM(CASE WHEN rk >= 3 THEN f END), 0) AS BIGINT)
            AS tail_sum,
          COUNT(*) >= 3 AND
            MAX(CASE WHEN rk = 1 THEN f END)
              < 2 * COALESCE(SUM(CASE WHEN rk >= 3 THEN f END), 0) AS rcl_ok
        FROM ranked GROUP BY nation, bal_band
        ORDER BY nation, bal_band""")),

    // BENFORD FIRST-DIGIT AUDIT — the fraud/fabrication screen on any
    // multiplicatively-spread amount column: naturally occurring
    // magnitudes put digit d first with probability log10(1 + 1/d);
    // synthetic or tampered figures do not. Engine-portability choices:
    // the first digit comes from the CENTS INTEGER's string form (a
    // double's string form is engine lore; a BIGINT's is not), the
    // expected probabilities are HARDCODED literals (no runtime log10 —
    // correctly-rounded transcendental math is not a cross-engine
    // contract), and each chi-square contribution is one IEEE
    // expression on exact integers rounded at 6dp. Scale shape: one
    // scan, one 9-row map-side-combined agg; everything after is
    // dictionary-sized.
    Q("q281_benford_audit",
      (s, d) => {
        val probs = Seq(
          1 -> 0.3010299956639812, 2 -> 0.17609125905568124,
          3 -> 0.12493873660829992, 4 -> 0.09691001300805642,
          5 -> 0.07918124604762482, 6 -> 0.06694678963061322,
          7 -> 0.05799194697768673, 8 -> 0.05115252244738129,
          9 -> 0.04575749056067514)
        val pCol = probs.tail.foldLeft(
          when(col("digit") === 1, probs.head._2)) { case (acc, (dd, p)) =>
          acc.when(col("digit") === dd, p)
        }
        val digits = t(s, d, "orders")
          .select(substring(round(col("o_totalprice") * 100, 0)
            .cast("long").cast("string"), 1, 1).cast("int").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n_obs"))
        digits
          .crossJoin(broadcast(digits.agg(sum(col("n_obs")).as("n"))))
          .withColumn("expected_p", pCol)
          .select(col("digit").cast("long").as("digit"), col("n_obs"),
            col("expected_p"),
            (col("n_obs").cast("double") / col("n").cast("double"))
              .as("obs_p"),
            round(
              (col("n_obs").cast("double") -
                col("n").cast("double") * col("expected_p")) *
                (col("n_obs").cast("double") -
                  col("n").cast("double") * col("expected_p")) /
                (col("n").cast("double") * col("expected_p")), 6)
              .as("chi2_contrib"))
          .orderBy("digit")
      },
      Some("""
        WITH digits AS (
          SELECT CAST(SUBSTRING(CAST(CAST(ROUND(o_totalprice * 100, 0)
              AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
            COUNT(*) AS n_obs
          FROM orders GROUP BY 1),
        tot AS (SELECT SUM(n_obs) AS n FROM digits),
        ex AS (SELECT * FROM (VALUES
          (1, 0.3010299956639812), (2, 0.17609125905568124),
          (3, 0.12493873660829992), (4, 0.09691001300805642),
          (5, 0.07918124604762482), (6, 0.06694678963061322),
          (7, 0.05799194697768673), (8, 0.05115252244738129),
          (9, 0.04575749056067514)) AS t(digit, expected_p))
        SELECT CAST(d.digit AS BIGINT) AS digit, d.n_obs, ex.expected_p,
          CAST(d.n_obs AS DOUBLE) / CAST(tot.n AS DOUBLE) AS obs_p,
          ROUND((CAST(d.n_obs AS DOUBLE) - CAST(tot.n AS DOUBLE)
              * ex.expected_p)
            * (CAST(d.n_obs AS DOUBLE) - CAST(tot.n AS DOUBLE)
              * ex.expected_p)
            / (CAST(tot.n AS DOUBLE) * ex.expected_p), 6)
            AS chi2_contrib
        FROM digits d JOIN ex ON d.digit = ex.digit CROSS JOIN tot
        ORDER BY digit"""))
  )
}
