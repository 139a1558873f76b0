package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import QH._

/** Round-10 extension: cluster-operations operators — the planning /
  * estimation layer a 100 TB deployment runs around its data jobs, plus
  * sketch machinery whose estimates are DETERMINISTIC (not just bounded),
  * so the oracle gate hash-compares the estimates themselves rather than
  * boolean error contracts. Shared device: every "random" hash is the
  * portable-md5 uniform (q66/q82/q158 convention), reproducible bit-wise
  * in any engine.
  */
object ScaleOpsQueries {

  /** Portable CMS bucket: first 13 hex digits of md5("tok#j") mod w.
    * Spark side (conv) ↔ DuckDB side (hex-char LIST_REDUCE, q158 device). */
  private def bucketSpark(tok: String, j: String, w: Int): String =
    s"cast(conv(substring(md5(concat($tok, '#', cast($j as string))), 1, 13), 16, 10) as bigint) % $w"

  private def bucketDuck(tok: String, j: String, w: Int): String =
    s"""CAST(LIST_REDUCE(LIST_TRANSFORM(SPLIT(SUBSTRING(MD5($tok || '#' || CAST($j AS VARCHAR)), 1, 13), ''),
       |  c -> CAST(POSITION(c IN '0123456789abcdef') - 1 AS BIGINT)),
       |  (a, x) -> a * 16 + x) AS BIGINT) % $w""".stripMargin

  val qs: Seq[Q] = Seq(
    // COUNT-MIN SKETCH frequency estimation — the d×w grid that answers
    // "how often does token X occur" from O(d·w) state instead of a
    // |vocabulary|-sized dictionary. Unlike Misra–Gries (q113), whose
    // counter VALUES depend on merge order (gate = boolean bounds), CMS
    // cell counts are plain sums — order-free, exact, deterministic —
    // so the oracle recomputes the SAME grid in DuckDB and the gate
    // hash-compares the estimates themselves. Scale shape: the corpus
    // collapses to its (token, count) dictionary first (q129/q137
    // dictionary-first convention — the only pass over raw token
    // volume is one map-side-combined groupBy); the grid aggregation
    // then shuffles at most d·w = 1024 rows regardless of corpus size,
    // and the probe side joins |heavy|·d rows against the broadcast
    // grid. est ≥ true is the CMS one-sided guarantee — pinned as a
    // gate column; the estimate value itself is pinned by the hash.
    Q("q159_countmin",
      (s, d) => {
        val D = 4; val W = 256
        val exact = t(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("cnt"))
          .cache() // feeds grid, total, and probe — one computation
        val total = exact.agg(sum(col("cnt")).as("n"))
        val grid = exact
          .select(col("tok"), col("cnt"),
            explode(expr(s"sequence(0, ${D - 1})")).as("j"))
          .withColumn("b", expr(bucketSpark("tok", "j", W)))
          .groupBy("j", "b").agg(sum(col("cnt")).as("cell"))
        val probes = exact.crossJoin(broadcast(total))
          .filter(col("cnt") > col("n") / lit(100.0d))
          .select(col("tok"), col("cnt"),
            explode(expr(s"sequence(0, ${D - 1})")).as("j"))
          .withColumn("b", expr(bucketSpark("tok", "j", W)))
        probes.join(broadcast(grid), Seq("j", "b"))
          .groupBy("tok", "cnt").agg(min(col("cell")).as("est"))
          .select(col("tok"), col("cnt"), col("est"),
            (col("est") >= col("cnt")).as("lower_bound_ok"))
          .orderBy(col("cnt").desc, col("tok"))
      },
      Some(s"""
        WITH toks AS (
          SELECT UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents),
        e AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
        tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM e),
        g0 AS (SELECT tok, cnt, UNNEST(RANGE(0, 4)) AS j FROM e),
        grid AS (
          SELECT j, ${bucketDuck("tok", "j", 256)} AS b,
            CAST(SUM(cnt) AS BIGINT) AS cell
          FROM g0 GROUP BY 1, 2),
        heavy AS (
          SELECT tok, cnt, UNNEST(RANGE(0, 4)) AS j
          FROM e, tot WHERE cnt > n / 100.0),
        probe AS (
          SELECT tok, cnt, j, ${bucketDuck("tok", "j", 256)} AS b FROM heavy)
        SELECT p.tok, p.cnt, MIN(g.cell) AS est, TRUE AS lower_bound_ok
        FROM probe p JOIN grid g ON p.j = g.j AND p.b = g.b
        GROUP BY p.tok, p.cnt
        ORDER BY p.cnt DESC, p.tok""")),

    // SMALL-FILE COMPACTION PLANNER — the nightly OPTIMIZE job's first
    // half: walk each partition's file inventory in file order and cut
    // contiguous compaction groups every time the running size crosses
    // the 512 MB target. The frame is METADATA-sized (one row per file
    // — millions of rows at 100 TB, never data-sized), so the per-
    // partition prefix-sum window is cheap and the partition key keeps
    // any one window task at the partition's file count. All arithmetic
    // is integer (sizes carried as exact integer bytes after one
    // round-to-integer per file; group cut by integer division) — no
    // decimal division rounding to diverge between engines. Exclusive
    // prefix sum ⇒ the first file of every partition opens group 0, and
    // a group may overshoot the target by at most one file — the
    // standard greedy coalesce semantics.
    Q("q160_compaction_plan",
      (s, d) => {
        val files = t(s, d, "orders").select(
          date_trunc("month", col("o_orderdate")).cast("date").as("part"),
          col("o_orderkey").as("file_id"),
          // file size in BYTES: o_totalprice is a 2-decimal double, so
          // ×1000 then round lands on an exact integer in both engines
          // (the product is within an ulp of an integer, never at a .5
          // tie) — files come out 1–550 MB, the realistic inventory mix
          expr("cast(round(o_totalprice * 1000, 0) as bigint)").as("bytes"))
        val w = Window.partitionBy("part").orderBy("file_id")
          .rowsBetween(Long.MinValue, -1)
        files
          .withColumn("cb", coalesce(sum(col("bytes")).over(w), lit(0L)))
          .withColumn("grp", expr("cb div 512000000"))
          .groupBy("part", "grp")
          .agg(count(lit(1)).as("n_files"),
            (sum(col("bytes")).cast("double") / lit(1000000.0d)).as("mb"))
          .orderBy("part", "grp")
      },
      Some("""
        WITH files AS (
          SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS part,
            o_orderkey AS file_id,
            CAST(ROUND(o_totalprice * 1000, 0) AS BIGINT) AS bytes
          FROM orders),
        c AS (
          SELECT part, file_id, bytes,
            COALESCE(SUM(bytes) OVER (PARTITION BY part ORDER BY file_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
          FROM files)
        SELECT part, CAST(cb // 512000000 AS BIGINT) AS grp, COUNT(*) AS n_files,
          CAST(SUM(bytes) AS DOUBLE) / 1000000.0 AS mb
        FROM c GROUP BY 1, 2 ORDER BY 1, 2""")),

    // LEAKAGE-SAFE TEMPORAL SPLIT with embargo — the time-series
    // train/test cut that drops a buffer zone after the training
    // horizon so near-boundary rows can't leak label information
    // backwards (standard purged/embargoed CV semantics). Cutoffs are
    // derived from the data's own [min, max] span (70% train, 2%
    // embargo) in integer microseconds — the min/max agg is one
    // broadcastable row, assignment is row-local arithmetic, and the
    // one double multiply per cutoff is the same IEEE op in both
    // engines. Output is the audit frame: per (split, event_type) row
    // and distinct-user counts — the class-balance check run before
    // any model sees the split.
    Q("q161_embargo_split",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(expr("unix_micros(ts)").as("us"),
            col("event_type"), col("user_id"))
        val span = ev.agg(min(col("us")).as("t0"), max(col("us")).as("t1"))
        ev.crossJoin(broadcast(span))
          .withColumn("lo",
            col("t0") + expr("cast(floor((t1 - t0) * 0.70d) as bigint)"))
          .withColumn("hi",
            col("t0") + expr("cast(floor((t1 - t0) * 0.72d) as bigint)"))
          .withColumn("split",
            when(col("us") < col("lo"), lit("train"))
              .when(col("us") >= col("hi"), lit("test"))
              .otherwise(lit("embargo")))
          .groupBy("split", "event_type")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy("split", "event_type")
      },
      Some("""
        WITH ev AS (
          SELECT EPOCH_US(ts) AS us, event_type, user_id FROM events),
        span AS (SELECT MIN(us) AS t0, MAX(us) AS t1 FROM ev),
        tagged AS (
          SELECT event_type, user_id,
            CASE WHEN us < t0 + CAST(FLOOR((t1 - t0) * 0.70) AS BIGINT)
                   THEN 'train'
                 WHEN us >= t0 + CAST(FLOOR((t1 - t0) * 0.72) AS BIGINT)
                   THEN 'test'
                 ELSE 'embargo' END AS split
          FROM ev, span)
        SELECT split, event_type, COUNT(*) AS n,
          COUNT(DISTINCT user_id) AS n_users
        FROM tagged GROUP BY 1, 2 ORDER BY 1, 2"""))
  )
}
