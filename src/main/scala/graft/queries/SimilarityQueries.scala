package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QH._

/** Approximate-nearest-neighbor search over the embeddings table
  * (`Array[Float]`, 64-dim). Brute-force cosine top-k is the correctness
  * baseline; the LSH variant (random-hyperplane buckets from a
  * deterministic LCG, so the oracle can reproduce them exactly) is the
  * scale path — at 100 TB the bucket equi-join replaces the cross join.
  * All vector math is codegen'd `zip_with`/`aggregate` — no UDFs.
  */
object SimilarityQueries {

  /** embeddings → (vec_id, v: array<double>). */
  private def vecs(s: org.apache.spark.sql.SparkSession, d: String) =
    t(s, d, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))

  /** Cosine via the native codegen'd expression
    * [[graft.expressions.CosineSimilarity]] — same sequential
    * accumulation as the zip_with/aggregate formulation (and the DuckDB
    * oracle), but inside whole-stage codegen instead of interpreted
    * lambda evaluation. */
  private val dotExpr = "graft_cosine(qv, v)"

  /** 8 deterministic LCG hyperplanes → 256 buckets, via the native
    * codegen'd [[graft.expressions.LcgLshBucket]] (the interpreted HOF
    * formulation re-derived the planes per row). Same integer
    * arithmetic is reproducible in the DuckDB oracle. */
  private val bucketExpr = "graft_lsh_bucket(v)"

  val qs: Seq[Q] = Seq(
    // Brute-force cosine top-5 for query vectors vec_id < 10.
    Q("q30_knn_bruteforce",
      (s, d) => {
        val all = vecs(s, d)
        val q = all.select(col("vec_id").as("query_id"), col("v").as("qv"))
        val joined = broadcast(q).crossJoin(all)
          .filter(col("query_id") < 10 && col("query_id") =!= col("vec_id"))
          .withColumn("sim", round(expr(dotExpr), 6))
        val w = Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("vec_id"))
        joined.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            col("sim"), col("rk"))
          .orderBy("query_id", "rk")
      },
      Some("""
        WITH n AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
            SQRT(LIST_SUM(LIST_TRANSFORM(CAST(embedding AS DOUBLE[]), x -> x*x))) AS nrm
          FROM embeddings),
        pairs AS (
          SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
            ROUND(LIST_DOT_PRODUCT(q.v, e.v) / (q.nrm * e.nrm), 6) AS sim
          FROM n q JOIN n e ON q.vec_id < 10 AND q.vec_id != e.vec_id)
        SELECT query_id, neighbor_id, sim,
          CAST(rk AS INTEGER) AS rk
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id) AS rk FROM pairs)
        WHERE rk <= 5
        ORDER BY query_id, rk""")),

    // LSH-bucketed ANN: candidates share the query's hyperplane bucket.
    // The per-query top-5 is the bounded aggregate
    // ([[graft.expressions.BoundedTopK]], same (sim desc, id asc) total
    // order as the window form) — each map task reduces its candidate
    // slice to ≤ 5 pairs before the exchange, where a row_number window
    // would shuffle every candidate row to its query first. At 100 TB
    // the candidate stream IS the job; this bounds it at
    // O(tasks × k) rows per query.
    Q("q31_knn_lsh",
      (s, d) => {
        val all = vecs(s, d).withColumn("bucket", expr(bucketExpr))
        val q = all.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("bucket"))
        broadcast(q).join(all, Seq("bucket"))
          .filter(col("query_id") =!= col("vec_id"))
          .withColumn("sim", round(expr(dotExpr), 6))
          .groupBy("query_id", "bucket")
          .agg(expr("graft_topk(sim, vec_id, 5)").as("top"))
          .select(col("query_id"), col("bucket"),
            posexplode(col("top")).as(Seq("rk0", "p")))
          .select(col("query_id"), col("p.id").as("neighbor_id"),
            col("p.ord").as("sim"),
            (col("rk0") + 1).cast("integer").as("rk"), col("bucket"))
          .orderBy("query_id", "rk")
      },
      Some("""
        WITH n AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
            SQRT(LIST_SUM(LIST_TRANSFORM(CAST(embedding AS DOUBLE[]), x -> x*x))) AS nrm
          FROM embeddings),
        b AS (
          SELECT vec_id, v, nrm, CAST(LIST_SUM(
            [CASE WHEN LIST_DOT_PRODUCT(
               [((1103515245::BIGINT * (p*64 + i) + 12345) % 2147483648)
                  / 2147483648.0 - 0.5 for i in GENERATE_SERIES(0, 63)],
               v) > 0 THEN (1 << p) ELSE 0 END
             for p in GENERATE_SERIES(0, 7)]) AS INTEGER) AS bucket
          FROM n),
        pairs AS (
          SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
            ROUND(LIST_DOT_PRODUCT(q.v, e.v) / (q.nrm * e.nrm), 6) AS sim,
            q.bucket
          FROM b q JOIN b e ON q.bucket = e.bucket AND q.vec_id != e.vec_id
          WHERE q.vec_id < 10)
        SELECT query_id, neighbor_id, sim, CAST(rk AS INTEGER) AS rk, bucket
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id) AS rk FROM pairs)
        WHERE rk <= 5
        ORDER BY query_id, rk""")),

    // IVF-bucketed ANN — the second scale path next to LSH (q31):
    // a deterministic coarse quantizer (centroids = the first 16
    // vectors; nearest-centroid assignment by cosine with id
    // tie-break) partitions the corpus into inverted lists, and a
    // query probes its 4 nearest centroids' lists only. At 100 TB the
    // assignment is a narrow shuffle on centroid id and each query
    // touches nprobe/K of the data; centroids would come from a
    // k-means job, which only changes the centroid table, not the plan.
    Q("q73_knn_ivf",
      (s, d) => {
        val all = vecs(s, d)
        val cents = all.filter(col("vec_id") < 16)
          .select(col("vec_id").as("centroid_id"), col("v").as("cv"))
        val aw = Window.partitionBy("vec_id")
          .orderBy(col("sim_c").desc, col("centroid_id"))
        val assigned = all.crossJoin(broadcast(cents))
          .withColumn("sim_c", round(expr("graft_cosine(v, cv)"), 6))
          .withColumn("rn", row_number().over(aw))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("v"), col("centroid_id").as("bucket"))
        val pw = Window.partitionBy("query_id")
          .orderBy(col("sim_c").desc, col("centroid_id"))
        val probes = all.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("v").as("qv"))
          .crossJoin(broadcast(cents))
          .withColumn("sim_c", round(expr("graft_cosine(qv, cv)"), 6))
          .withColumn("rn", row_number().over(pw))
          .filter(col("rn") <= 4)
          .select(col("query_id"), col("qv"), col("centroid_id").as("bucket"))
        // bounded top-5 across the probed lists (each vector lives in
        // exactly one inverted list, so no dedup is needed) — map-side
        // combine bounds the shuffle, see q31/q81
        probes.join(assigned, Seq("bucket"))
          .filter(col("query_id") =!= col("vec_id"))
          .withColumn("sim", round(expr("graft_cosine(qv, v)"), 6))
          .groupBy("query_id")
          .agg(expr("graft_topk(sim, vec_id, 5)").as("top"))
          .select(col("query_id"), posexplode(col("top")).as(Seq("rk0", "p")))
          .select(col("query_id"), col("p.id").as("neighbor_id"),
            col("p.ord").as("sim"),
            (col("rk0") + 1).cast("integer").as("rk"))
          .orderBy("query_id", "rk")
      },
      Some("""
        WITH n AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
            SQRT(LIST_SUM(LIST_TRANSFORM(CAST(embedding AS DOUBLE[]), x -> x*x))) AS nrm
          FROM embeddings),
        cents AS (
          SELECT vec_id AS centroid_id, v AS cv, nrm AS cnrm
          FROM n WHERE vec_id < 16),
        assign AS (
          SELECT vec_id, v, nrm, centroid_id AS bucket FROM (
            SELECT a.vec_id, a.v, a.nrm, c.centroid_id,
              ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
                ROUND(LIST_DOT_PRODUCT(a.v, c.cv) / (a.nrm * c.cnrm), 6) DESC,
                c.centroid_id) AS rn
            FROM n a CROSS JOIN cents c)
          WHERE rn = 1),
        probes AS (
          SELECT query_id, qv, qnrm, centroid_id AS bucket FROM (
            SELECT q.vec_id AS query_id, q.v AS qv, q.nrm AS qnrm,
              c.centroid_id,
              ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                ROUND(LIST_DOT_PRODUCT(q.v, c.cv) / (q.nrm * c.cnrm), 6) DESC,
                c.centroid_id) AS rn
            FROM n q CROSS JOIN cents c WHERE q.vec_id < 10)
          WHERE rn <= 4),
        pairs AS (
          SELECT p.query_id, a.vec_id AS neighbor_id,
            ROUND(LIST_DOT_PRODUCT(p.qv, a.v) / (p.qnrm * a.nrm), 6) AS sim
          FROM probes p JOIN assign a USING (bucket)
          WHERE a.vec_id != p.query_id)
        SELECT query_id, neighbor_id, sim, CAST(rk AS INTEGER) AS rk
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id) AS rk FROM pairs)
        WHERE rk <= 5
        ORDER BY query_id, rk""")),

    // The IVF coarse quantizer as a REAL k-means job (q73's note:
    // "centroids would come from a k-means job, which only changes the
    // centroid table, not the plan" — this is that job): deterministic
    // init (k smallest ids), two fixed Lloyd's rounds, then the final
    // partition map (vector → nearest centroid). Cross-engine exactness
    // comes from dyadic quantization ([[graft.ops.Vectors.quantized]]):
    // components rounded once to 2⁻²⁰ grid, after which every k-means
    // sum is EXACT in binary regardless of accumulation order — no
    // decimal casts, no order sensitivity, bit-identical on any
    // partitioning. The oracle replays the same two rounds in SQL.
    Q("q78_kmeans_ivf",
      (s, d) => {
        val all = vecs(s, d)
        val cents = graft.ops.Vectors.kmeansCentroids(
          all, "vec_id", "v", k = 16, iters = 2, dim = 64)
        val vq = all.select(col("vec_id"),
          graft.ops.Vectors.quantized("v").as("vq"))
        val aw = Window.partitionBy("vec_id")
          .orderBy(col("sim_c").desc, col("centroid_id"))
        vq.crossJoin(broadcast(cents))
          .withColumn("sim_c", round(expr("graft_cosine(vq, cv)"), 6))
          .withColumn("rn", row_number().over(aw))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("centroid_id"), col("sim_c"))
          .orderBy("vec_id")
      },
      Some("""
        WITH n AS (
          SELECT vec_id, LIST_TRANSFORM(CAST(embedding AS DOUBLE[]),
            x -> ROUND(x * 1048576) / 1048576) AS vq
          FROM embeddings),
        c0 AS (
          SELECT vec_id AS centroid_id, vq AS cv FROM n WHERE vec_id < 16),
        a1 AS (
          SELECT vec_id, vq, centroid_id FROM (
            SELECT v.vec_id, v.vq, c.centroid_id,
              ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
                ROUND(LIST_DOT_PRODUCT(v.vq, c.cv) /
                  (SQRT(LIST_SUM(LIST_TRANSFORM(v.vq, x -> x*x))) *
                   SQRT(LIST_SUM(LIST_TRANSFORM(c.cv, x -> x*x)))), 6) DESC,
                c.centroid_id) AS rn
            FROM n v CROSS JOIN c0 c) WHERE rn = 1),
        c1 AS (
          SELECT centroid_id, LIST(m ORDER BY g) AS cv FROM (
            SELECT centroid_id, g, SUM(vq[g]) / COUNT(*) AS m
            FROM a1, GENERATE_SERIES(1, 64) t(g)
            GROUP BY centroid_id, g)
          GROUP BY centroid_id),
        a2 AS (
          SELECT vec_id, vq, centroid_id FROM (
            SELECT v.vec_id, v.vq, c.centroid_id,
              ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
                ROUND(LIST_DOT_PRODUCT(v.vq, c.cv) /
                  (SQRT(LIST_SUM(LIST_TRANSFORM(v.vq, x -> x*x))) *
                   SQRT(LIST_SUM(LIST_TRANSFORM(c.cv, x -> x*x)))), 6) DESC,
                c.centroid_id) AS rn
            FROM n v CROSS JOIN c1 c) WHERE rn = 1),
        c2 AS (
          SELECT centroid_id, LIST(m ORDER BY g) AS cv FROM (
            SELECT centroid_id, g, SUM(vq[g]) / COUNT(*) AS m
            FROM a2, GENERATE_SERIES(1, 64) t(g)
            GROUP BY centroid_id, g)
          GROUP BY centroid_id)
        SELECT vec_id, centroid_id, sim_c FROM (
          SELECT v.vec_id, c.centroid_id,
            ROUND(LIST_DOT_PRODUCT(v.vq, c.cv) /
              (SQRT(LIST_SUM(LIST_TRANSFORM(v.vq, x -> x*x))) *
               SQRT(LIST_SUM(LIST_TRANSFORM(c.cv, x -> x*x)))), 6) AS sim_c,
            ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
              ROUND(LIST_DOT_PRODUCT(v.vq, c.cv) /
                (SQRT(LIST_SUM(LIST_TRANSFORM(v.vq, x -> x*x))) *
                 SQRT(LIST_SUM(LIST_TRANSFORM(c.cv, x -> x*x)))), 6) DESC,
              c.centroid_id) AS rn
          FROM n v CROSS JOIN c2 c) WHERE rn = 1
        ORDER BY vec_id""")),

    // Embedding-cosine near-duplicate pairs (the fifth dedup modality),
    // the same banded shape as q28's MinHash→exact-Jaccard: candidate
    // pairs share an 8-plane hyperplane bucket in ≥1 of 288 splitmix64
    // banks ([[graft.expressions.HashLshBanks]]), then exact cosine
    // verifies each candidate once. No cross join anywhere in the plan —
    // the bands self-join is a hash equi-join on (bank, bucket), and the
    // verify joins are equi joins, all linear in candidates. The bank
    // frame derives from the embeddings FACT (n×288 rows), so it is NOT
    // broadcast-hinted: the optimizer may still broadcast it while its
    // size estimate is under the threshold, but at 100× it grows with
    // the data and must become a shuffle join — a forced hint would
    // collect the whole frame on the driver (PlanSpec pins the no-hint
    // contract). This corpus has no engineered near-dups (max cosine
    // ≈ 0.5), so the threshold is 0.4 — near the hyperplane-LSH
    // feasibility edge (bit-agreement 0.63/plane); measured full recall
    // arrives by bank 251 at both test scales, and 288 = 251 + ~15%
    // margin (320 was defensive overkill paying pure row amplification).
    // At real near-dup thresholds (≥0.9) a handful of banks suffices
    // and the same plan is strictly sub-quadratic.
    Q("q67_embedding_neardup",
      (s, d) => {
        // spread (explicit partition count — AQE would coalesce the
        // sub-MB shuffle to one partition): the embeddings parquet is
        // one row group; without this the 288-bank hyperplane fold runs
        // on a single core.
        val all = QH.spread(s, col("vec_id"))(vecs(s, d))
        val banks = all.select(col("vec_id"),
          posexplode(expr("graft_lsh_banks(v, 288)")).as(Seq("bank", "bucket")))
        val cand = banks.as("x").join(banks.as("y"), Seq("bank", "bucket"))
          .filter(col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
        // Verify every banded collision, dedup AFTER the sim filter:
        // the cosine is codegen-fused into the broadcast-join probe, so
        // re-verifying a duplicate collision costs one 64-wide loop,
        // while a pre-verify distinct costs a full shuffle of the
        // candidate multiset (~2× the verify cost at 320 banks).
        cand
          .join(all.select(col("vec_id").as("vec_a"), col("v").as("qv")), "vec_a")
          .join(all.select(col("vec_id").as("vec_b"), col("v")), "vec_b")
          .withColumn("sim", round(expr("graft_cosine(qv, v)"), 6))
          .filter(col("sim") >= 0.4)
          .select("vec_a", "vec_b", "sim")
          .distinct()
          .orderBy("vec_a", "vec_b")
      },
      Some("""
        WITH n AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
            SQRT(LIST_SUM(LIST_TRANSFORM(CAST(embedding AS DOUBLE[]), x -> x*x))) AS nrm
          FROM embeddings)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
          ROUND(LIST_DOT_PRODUCT(a.v, b.v) / (a.nrm * b.nrm), 6) AS sim
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE ROUND(LIST_DOT_PRODUCT(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.4
        ORDER BY vec_a, vec_b""")),

    // BUDGETED near-dup verify — q67's DECLARED scale path for the
    // regime where exact banded verification cannot complete (q67 is
    // this corpus's known single-box ceiling at sf10: its pair density
    // is scale-invariant by construction, so the verify join is
    // honestly quadratic). A production corpus runs the bounded
    // variant: every (bank, bucket) verifies AT MOST the 4 lowest
    // vec_ids it holds — a row-local, deterministic budget, so
    // candidate pairs per bucket are ≤ C(4,2) and TOTAL candidates are
    // O(banks × buckets) REGARDLESS of corpus size. The cap is not
    // silent (the "no silent caps" rule): the result row carries the
    // drop ledger — how many (vector, bank) slots were cut and how many
    // buckets hit the cap — next to what was found, so a reader sees
    // exactly how much recall was traded for boundedness. Banks come
    // from graft_lcg_banks (portable LCG + index-mix planes) because
    // this oracle must REPLAY the candidate set, not just the verified
    // truth — q67 keeps splitmix64 banks (better-conditioned, full
    // recall) against its all-pairs oracle.
    Q("q302_budgeted_neardup",
      (s, d) => {
        val all = QH.spread(s, col("vec_id"))(vecs(s, d))
        val banks = all.select(col("vec_id"),
          posexplode(expr("graft_lcg_banks(v, 16)")).as(Seq("bank", "bucket")))
        val w = Window.partitionBy("bank", "bucket").orderBy("vec_id")
        val ranked = banks.withColumn("rn", row_number().over(w))
        val kept = ranked.filter(col("rn") <= 4)
          .select("vec_id", "bank", "bucket")
        val ledger = ranked.filter(col("rn") > 4)
          .agg(count(lit(1)).as("n_members_dropped"),
            countDistinct(col("bank") * 256 + col("bucket"))
              .as("n_buckets_capped"))
        val cand = kept.as("x").join(kept.as("y"), Seq("bank", "bucket"))
          .filter(col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
          .distinct()
        // one pass: candidate count, verified count, and an integrity
        // checksum of the found pairs read off the same verify join
        // (the q196 lesson — separate aggregates re-run the input)
        val stats = cand
          .join(all.select(col("vec_id").as("vec_a"), col("v").as("qv")),
            "vec_a")
          .join(all.select(col("vec_id").as("vec_b"), col("v")), "vec_b")
          .withColumn("sim", round(expr(dotExpr), 6))
          .agg(count(lit(1)).as("n_cand"),
            count(when(col("sim") >= 0.4, 1)).as("n_pairs"),
            coalesce(sum(when(col("sim") >= 0.4,
              col("vec_a").cast("long") * 131071 + col("vec_b"))), lit(0L))
              .as("pair_checksum"))
        stats.crossJoin(ledger) // two 1-row frames
      },
      Some("""
        WITH n AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
            SQRT(LIST_SUM(LIST_TRANSFORM(CAST(embedding AS DOUBLE[]), x -> x*x))) AS nrm
          FROM embeddings),
        bk AS (
          SELECT vec_id, b.b AS bank,
            CAST(LIST_SUM([CASE WHEN LIST_DOT_PRODUCT(
                [((1103515245::BIGINT *
                    ((((b.b*8 + p)*64 + i) * 2654435761::BIGINT
                      + 1013904223) % 2147483648)
                   + 12345) % 2147483648) / 2147483648.0 - 0.5
                 for i in GENERATE_SERIES(0, 63)],
                v) > 0 THEN (1 << p) ELSE 0 END
              for p in GENERATE_SERIES(0, 7)]) AS INTEGER) AS bucket
          FROM n CROSS JOIN (SELECT UNNEST(RANGE(0, 16)) AS b) b),
        rk AS (
          SELECT vec_id, bank, bucket,
            ROW_NUMBER() OVER (PARTITION BY bank, bucket
              ORDER BY vec_id) AS rn
          FROM bk),
        ledger AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_members_dropped,
            CAST(COUNT(DISTINCT bank * 256 + bucket) AS BIGINT)
              AS n_buckets_capped
          FROM rk WHERE rn > 4),
        kept AS (SELECT vec_id, bank, bucket FROM rk WHERE rn <= 4),
        cand AS (
          SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
          FROM kept x JOIN kept y
            ON x.bank = y.bank AND x.bucket = y.bucket
              AND x.vec_id < y.vec_id),
        ver AS (
          SELECT c.vec_a, c.vec_b,
            ROUND(LIST_DOT_PRODUCT(a.v, b.v) / (a.nrm * b.nrm), 6) AS sim
          FROM cand c JOIN n a ON a.vec_id = c.vec_a
            JOIN n b ON b.vec_id = c.vec_b),
        stats AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_cand,
            CAST(COUNT(CASE WHEN sim >= 0.4 THEN 1 END) AS BIGINT)
              AS n_pairs,
            COALESCE(CAST(SUM(CASE WHEN sim >= 0.4 THEN
              CAST(vec_a AS BIGINT) * 131071 + vec_b END) AS BIGINT), 0)
              AS pair_checksum
          FROM ver)
        SELECT n_cand, n_pairs, pair_checksum, n_buckets_capped,
          n_members_dropped
        FROM stats CROSS JOIN ledger""")),

    // PRODUCT QUANTIZATION + ADC scan — the missing fourth ANN path
    // (after brute q30 / LSH q31 / IVF q73) and the one that changes the
    // MEMORY story at 100 TB: a 64-dim float vector compresses to 4
    // one-byte codes (4 subspaces × 16 centroids), so the scan touches
    // codes, not vectors, and distances come from a per-query lookup
    // table of (subspace × centroid) partial distances — the ADC table
    // is 10 queries × 4 × 16 rows here, broadcast exactly like the real
    // algorithm keeps it in L1. Encode is one (vector-subspace ×
    // centroid) nearest-centroid pass over the codegen'd native
    // `graft_l2` (expressions/SquaredL2 — the hot scalar; HOF lambdas
    // would run interpreted), with min-distance/centroid-id total
    // ordering. Codebooks here are the 16 seed vectors' subvectors
    // (deterministic; production trains them with
    // ops/Vectors.kmeansCentroids per subspace — encode/ADC is
    // invariant to how the codebook was trained). Dyadic quantization
    // makes every distance and every ADC partial-sum exact in IEEE
    // doubles, so the oracle matches bit-for-bit with no tolerance.
    Q("q106_pq_adc",
      (s, d) => {
        val all = vecs(s, d)
        val vq = all.select(col("vec_id"),
          graft.ops.Vectors.quantized("v").as("vq"))
        val subs = vq.select(col("vec_id"), posexplode(expr(
          "transform(sequence(0, 3), m -> slice(vq, m * 16 + 1, 16))"))
            .as(Seq("m", "sub")))
        val cb = subs.filter(col("vec_id") < 16)
          .select(col("m"), col("vec_id").cast("integer").as("cid"),
            col("sub").as("cv"))
        val ew = Window.partitionBy("vec_id", "m")
          .orderBy(col("dist"), col("cid"))
        val codes = subs.join(broadcast(cb), Seq("m"))
          .withColumn("dist", expr("graft_l2(sub, cv)"))
          .withColumn("rn", row_number().over(ew))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("m"), col("cid"))
        val lut = subs.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("m"),
            col("sub").as("qsub"))
          .join(broadcast(cb), Seq("m"))
          .withColumn("pd", expr("graft_l2(qsub, cv)"))
          .select(col("query_id"), col("m"), col("cid"), col("pd"))
        codes.join(broadcast(lut), Seq("m", "cid"))
          .filter(col("query_id") =!= col("vec_id"))
          .groupBy("query_id", "vec_id")
          .agg(sum(col("pd")).as("adc0")) // dyadic partials: exact sum
          .withColumn("neg", -col("adc0"))
          .groupBy("query_id")
          .agg(expr("graft_topk(neg, vec_id, 5)").as("top"))
          .select(col("query_id"), posexplode(col("top")).as(Seq("rk0", "p")))
          .select(col("query_id"), col("p.id").as("neighbor_id"),
            round(-col("p.ord"), 6).as("adc"),
            (col("rk0") + 1).cast("integer").as("rk"))
          .orderBy("query_id", "rk")
      },
      Some("""
        WITH n AS (
          SELECT vec_id, LIST_TRANSFORM(CAST(embedding AS DOUBLE[]),
            x -> ROUND(x * 1048576) / 1048576) AS vq
          FROM embeddings),
        subs AS (
          SELECT vec_id, m, vq[m * 16 + 1 : m * 16 + 16] AS sub
          FROM n, (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS m)),
        cb AS (
          SELECT m, CAST(vec_id AS INTEGER) AS cid, sub AS cv
          FROM subs WHERE vec_id < 16),
        dists AS (
          SELECT s.vec_id, s.m, c.cid,
            LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, 16),
              i -> (s.sub[i] - c.cv[i]) * (s.sub[i] - c.cv[i]))) AS dist
          FROM subs s JOIN cb c USING (m)),
        codes AS (
          SELECT vec_id, m, cid FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
              ORDER BY dist, cid) AS rn FROM dists)
          WHERE rn = 1),
        lut AS (
          SELECT s.vec_id AS query_id, s.m, c.cid,
            LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, 16),
              i -> (s.sub[i] - c.cv[i]) * (s.sub[i] - c.cv[i]))) AS pd
          FROM subs s JOIN cb c USING (m)
          WHERE s.vec_id < 10),
        adc AS (
          SELECT l.query_id, co.vec_id, SUM(l.pd) AS adc0
          FROM codes co JOIN lut l ON co.m = l.m AND co.cid = l.cid
          WHERE l.query_id != co.vec_id
          GROUP BY 1, 2)
        SELECT query_id, vec_id AS neighbor_id, ROUND(adc0, 6) AS adc,
          CAST(rk AS INTEGER) AS rk
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY adc0, vec_id) AS rk FROM adc)
        WHERE rk <= 5 ORDER BY query_id, rk""")),

    // SEMANTIC DEDUPLICATION (the SemDeDup shape, Abbas et al. 2023):
    // k-means-cluster the embedding space, then prune near-duplicates
    // WITHIN each cluster only — the published trick that turns O(n²)
    // semantic dedup into k × O((n/k)²): grow k ∝ n and the per-cluster
    // width stays constant, so the whole pass is linear in the corpus.
    // Pure composition of existing machinery: the coarse quantizer is
    // the q78 Lloyd's job (ops/Vectors.kmeansCentroids — dyadic-exact,
    // bit-reproducible on any partitioning), assignment is the same
    // broadcast argmax, and the within-cluster pair join is a hash
    // EQUI-join on centroid_id — no cartesian; the per-cluster pairwise
    // cost is the algorithm's own bounded budget, not a plan accident.
    // (A pathologically hot cluster is an input-distribution problem the
    // operator surfaces, and the fix is raising k — re-clustering — not
    // salting, which cannot split a semantic cluster without changing
    // the answer.) Survivor rule is deterministic and NON-iterative: a
    // vector is dropped iff a SMALLER-id vector in the same cluster has
    // cosine ≥ τ — a total order, safe under retry/AQE, and
    // SQL-expressible without transitive closure (q77 is the
    // closure-based variant in MinHash space; SemDeDup's own greedy
    // keep-first-seen is exactly this id-order rule).
    Q("q108_semdedup",
      (s, d) => {
        val all = QH.spread(s, col("vec_id"))(vecs(s, d))
        val cents = graft.ops.Vectors.kmeansCentroids(
          all, "vec_id", "v", k = 16, iters = 2, dim = 64)
        val vq = all.select(col("vec_id"),
          graft.ops.Vectors.quantized("v").as("vq"))
        val aw = Window.partitionBy("vec_id")
          .orderBy(col("sim_c").desc, col("centroid_id"))
        // barrier: the assignment feeds THREE consumers (both pair-join
        // sides and the final verdict) — without it each one replays the
        // broadcast-argmax, and the k-bounded centroid cross join would
        // sit inside the pair-join plan (PlanSpec pins it out)
        val (assigned, _) = graft.ops.Checkpoints.checkpointTracked(
          vq.crossJoin(broadcast(cents))
            .withColumn("sim_c", round(expr("graft_cosine(vq, cv)"), 6))
            .withColumn("rn", row_number().over(aw))
            .filter(col("rn") === 1)
            .select(col("vec_id"), col("vq"), col("centroid_id")))
        val lhs = assigned.select(col("centroid_id"),
          col("vec_id").as("ia"), col("vq").as("va"))
        val rhs = assigned.select(col("centroid_id"),
          col("vec_id").as("ib"), col("vq").as("vb"))
        val removed = lhs.join(rhs, Seq("centroid_id"))
          .filter(col("ia") < col("ib") &&
            round(expr("graft_cosine(va, vb)"), 6) >= 0.4)
          .select(col("ib").as("vec_id")).distinct()
          .withColumn("rm", lit(true))
        assigned.join(removed, Seq("vec_id"), "left")
          .select(col("vec_id"), col("centroid_id"),
            col("rm").isNull.as("kept"))
          .orderBy("vec_id")
      },
      Some("""
        WITH n AS (
          SELECT vec_id, LIST_TRANSFORM(CAST(embedding AS DOUBLE[]),
            x -> ROUND(x * 1048576) / 1048576) AS vq
          FROM embeddings),
        c0 AS (
          SELECT vec_id AS centroid_id, vq AS cv FROM n
          ORDER BY vec_id LIMIT 16),
        a1 AS (
          SELECT vec_id, vq, centroid_id FROM (
            SELECT v.vec_id, v.vq, c.centroid_id,
              ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
                ROUND(LIST_DOT_PRODUCT(v.vq, c.cv) /
                  (SQRT(LIST_SUM(LIST_TRANSFORM(v.vq, x -> x*x))) *
                   SQRT(LIST_SUM(LIST_TRANSFORM(c.cv, x -> x*x)))), 6) DESC,
                c.centroid_id) AS rn
            FROM n v CROSS JOIN c0 c) WHERE rn = 1),
        c1 AS (
          SELECT centroid_id, LIST(m ORDER BY g) AS cv FROM (
            SELECT centroid_id, g, SUM(vq[g]) / COUNT(*) AS m
            FROM a1, GENERATE_SERIES(1, 64) t(g)
            GROUP BY centroid_id, g)
          GROUP BY centroid_id),
        a2 AS (
          SELECT vec_id, vq, centroid_id FROM (
            SELECT v.vec_id, v.vq, c.centroid_id,
              ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
                ROUND(LIST_DOT_PRODUCT(v.vq, c.cv) /
                  (SQRT(LIST_SUM(LIST_TRANSFORM(v.vq, x -> x*x))) *
                   SQRT(LIST_SUM(LIST_TRANSFORM(c.cv, x -> x*x)))), 6) DESC,
                c.centroid_id) AS rn
            FROM n v CROSS JOIN c1 c) WHERE rn = 1),
        c2 AS (
          SELECT centroid_id, LIST(m ORDER BY g) AS cv FROM (
            SELECT centroid_id, g, SUM(vq[g]) / COUNT(*) AS m
            FROM a2, GENERATE_SERIES(1, 64) t(g)
            GROUP BY centroid_id, g)
          GROUP BY centroid_id),
        a3 AS (
          SELECT vec_id, vq, centroid_id FROM (
            SELECT v.vec_id, v.vq, c.centroid_id,
              ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
                ROUND(LIST_DOT_PRODUCT(v.vq, c.cv) /
                  (SQRT(LIST_SUM(LIST_TRANSFORM(v.vq, x -> x*x))) *
                   SQRT(LIST_SUM(LIST_TRANSFORM(c.cv, x -> x*x)))), 6) DESC,
                c.centroid_id) AS rn
            FROM n v CROSS JOIN c2 c) WHERE rn = 1),
        removed AS (
          SELECT DISTINCT b.vec_id
          FROM a3 a JOIN a3 b
            ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
          WHERE ROUND(LIST_DOT_PRODUCT(a.vq, b.vq) /
            (SQRT(LIST_SUM(LIST_TRANSFORM(a.vq, x -> x*x))) *
             SQRT(LIST_SUM(LIST_TRANSFORM(b.vq, x -> x*x)))), 6) >= 0.4)
        SELECT a3.vec_id, a3.centroid_id, (r.vec_id IS NULL) AS kept
        FROM a3 LEFT JOIN removed r ON a3.vec_id = r.vec_id
        ORDER BY a3.vec_id""")),

    // ANN RECALL EVALUATION — the measurement loop that makes an
    // approximate index trustworthy: recall@5 of the LSH path (q31)
    // against brute-force ground truth (q30), per query. At 100 TB you
    // run this on a sampled query set before trusting a new index
    // layout; here the ENTIRE evaluation — both retrieval paths and the
    // intersection — is one plan, and every stage reuses the pinned
    // q30/q31 shapes (bounded graft_topk aggregates, bucket equi join,
    // broadcast query side). The denominator is fixed k=5, so recall is
    // an exact small-integer ratio — no float tolerance anywhere.
    Q("q150_ann_recall",
      (s, d) => {
        val all = vecs(s, d)
        val q = all.select(col("vec_id").as("query_id"), col("v").as("qv"))
        val truth = broadcast(q).crossJoin(all)
          .filter(col("query_id") < 10 && col("query_id") =!= col("vec_id"))
          .withColumn("sim", round(expr(dotExpr), 6))
          .groupBy("query_id")
          .agg(expr("graft_topk(sim, vec_id, 5)").as("top"))
          .select(col("query_id"),
            explode(expr("transform(top, x -> x.id)")).as("neighbor_id"))
        val withB = all.withColumn("bucket", expr(bucketExpr))
        val qb = withB.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("bucket"))
        val approx = broadcast(qb).join(withB, Seq("bucket"))
          .filter(col("query_id") =!= col("vec_id"))
          .withColumn("sim", round(expr(dotExpr), 6))
          .groupBy("query_id")
          .agg(expr("graft_topk(sim, vec_id, 5)").as("top"))
          .select(col("query_id"),
            explode(expr("transform(top, x -> x.id)")).as("neighbor_id"))
        // truth/approx/hits are all ≤ |queries|·k rows — bounded by the
        // evaluation design, so broadcasting them is structural, not a
        // size guess the optimizer has to make post-aggregation
        val hits = truth
          .join(broadcast(approx), Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
        truth.select("query_id").distinct()
          .join(broadcast(hits), Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"))
          .withColumn("recall_at_5", col("n_hits").cast("double") / lit(5.0d))
          .orderBy("query_id")
      },
      Some("""
        WITH n AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
            SQRT(LIST_SUM(LIST_TRANSFORM(CAST(embedding AS DOUBLE[]), x -> x*x))) AS nrm
          FROM embeddings),
        truth AS (
          SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
              ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                ROUND(LIST_DOT_PRODUCT(q.v, e.v) / (q.nrm * e.nrm), 6) DESC,
                e.vec_id) AS rk
            FROM n q JOIN n e ON q.vec_id < 10 AND q.vec_id != e.vec_id)
          WHERE rk <= 5),
        b AS (
          SELECT vec_id, v, nrm, CAST(LIST_SUM(
            [CASE WHEN LIST_DOT_PRODUCT(
               [((1103515245::BIGINT * (p*64 + i) + 12345) % 2147483648)
                  / 2147483648.0 - 0.5 for i in GENERATE_SERIES(0, 63)],
               v) > 0 THEN (1 << p) ELSE 0 END
             for p in GENERATE_SERIES(0, 7)]) AS INTEGER) AS bucket
          FROM n),
        approx AS (
          SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
              ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                ROUND(LIST_DOT_PRODUCT(q.v, e.v) / (q.nrm * e.nrm), 6) DESC,
                e.vec_id) AS rk
            FROM b q JOIN b e
              ON q.bucket = e.bucket AND q.vec_id != e.vec_id
            WHERE q.vec_id < 10)
          WHERE rk <= 5),
        hits AS (
          SELECT t.query_id, COUNT(*) AS n_hits
          FROM truth t JOIN approx a
            ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
          GROUP BY 1)
        SELECT q.query_id, COALESCE(n_hits, 0) AS n_hits,
          CAST(COALESCE(n_hits, 0) AS DOUBLE) / 5.0 AS recall_at_5
        FROM (SELECT DISTINCT query_id FROM truth) q
        LEFT JOIN hits USING (query_id)
        ORDER BY query_id""")),

    // MULTI-PROBE LSH — the recall lever that does NOT change the index
    // (Lv et al.'s multi-probe idea on the hyperplane scheme): each
    // query probes its own bucket PLUS the 8 buckets at Hamming
    // distance 1 (one plane flipped), trading a 9× broadcast of the
    // tiny query side for recall that single-bucket q31 only gets by
    // rebuilding with more banks. Candidates stay bucket-equi-join
    // shaped; a candidate lives in exactly ONE bucket, and the 9 probe
    // buckets are distinct, so no dedup stage is needed. Per-query
    // top-5 is the bounded graft_topk aggregate, as in q31/q150.
    Q("q157_multiprobe_lsh",
      (s, d) => {
        val all = vecs(s, d).withColumn("bucket", expr(bucketExpr))
        val probes = all.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            explode(expr(
              """array_append(
                |  transform(sequence(0, 7),
                |    p -> cast(bucket ^ shiftleft(1, p) as int)),
                |  bucket)""".stripMargin)).as("bucket"))
        broadcast(probes).join(all, Seq("bucket"))
          .filter(col("query_id") =!= col("vec_id"))
          .withColumn("sim", round(expr(dotExpr), 6))
          .groupBy("query_id")
          .agg(expr("graft_topk(sim, vec_id, 5)").as("top"))
          .select(col("query_id"), posexplode(col("top")).as(Seq("rk0", "p")))
          .select(col("query_id"), col("p.id").as("neighbor_id"),
            col("p.ord").as("sim"),
            (col("rk0") + 1).cast("integer").as("rk"))
          .orderBy("query_id", "rk")
      },
      Some("""
        WITH n AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
            SQRT(LIST_SUM(LIST_TRANSFORM(CAST(embedding AS DOUBLE[]), x -> x*x))) AS nrm
          FROM embeddings),
        b AS (
          SELECT vec_id, v, nrm, CAST(LIST_SUM(
            [CASE WHEN LIST_DOT_PRODUCT(
               [((1103515245::BIGINT * (p*64 + i) + 12345) % 2147483648)
                  / 2147483648.0 - 0.5 for i in GENERATE_SERIES(0, 63)],
               v) > 0 THEN (1 << p) ELSE 0 END
             for p in GENERATE_SERIES(0, 7)]) AS INTEGER) AS bucket
          FROM n),
        probes AS (
          SELECT vec_id AS query_id, v AS qv, nrm AS qnrm,
            UNNEST(LIST_APPEND(LIST_TRANSFORM(RANGE(0, 8),
              p -> xor(bucket, CAST((1 << p) AS INTEGER))), bucket))
              AS bucket
          FROM b WHERE vec_id < 10),
        pairs AS (
          SELECT p.query_id, e.vec_id AS neighbor_id,
            ROUND(LIST_DOT_PRODUCT(p.qv, e.v) / (p.qnrm * e.nrm), 6) AS sim
          FROM probes p JOIN b e
            ON p.bucket = e.bucket AND p.query_id != e.vec_id)
        SELECT query_id, neighbor_id, sim, CAST(rk AS INTEGER) AS rk
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id) AS rk FROM pairs)
        WHERE rk <= 5 ORDER BY query_id, rk""")),

    // INT8 SCALAR QUANTIZATION — the other standard embedding
    // compression next to q106's product quantization: per-DIMENSION
    // affine quantization to 0..255 (the faiss SQ8 / ONNX
    // per-channel shape, 4× memory cut before any index is built).
    // Everything runs on the 2⁻²⁰ dyadic integer grid (the q134/q142
    // device), so scale, codes, and reconstruction errors are EXACT
    // INTEGER arithmetic — identical in both engines, no IEEE division
    // anywhere: code q = ⌊(2·255·(x−lo) + span) / (2·span)⌋ (half-up),
    // error in 1/255-of-span units = |255·(x−lo) − q·span|. Scale
    // shape: posexplode is row-local; per-dim min/max is one map-side-
    // combined aggregation to a 64-row frame broadcast back; codes and
    // errors are row-local; the report re-aggregates per dim.
    Q("q211_int8_quantize",
      (s, d) => {
        val x = t(s, d, "embeddings")
          .select(col("vec_id"), posexplode(expr(
            "transform(embedding, v -> cast(round(cast(v AS double) * 1048576) AS bigint))"))
            .as(Seq("dim", "xi")))
        val mm = x.groupBy("dim")
          .agg(min(col("xi")).as("lo"), max(col("xi")).as("hi"))
        x.join(broadcast(mm), "dim")
          .withColumn("span", col("hi") - col("lo"))
          .withColumn("qv", when(col("span") === 0, lit(0L)).otherwise(
            expr("(2 * 255 * (xi - lo) + span) div (2 * span)")))
          .withColumn("errn", when(col("span") === 0, lit(0L)).otherwise(
            abs(lit(255L) * (col("xi") - col("lo")) - col("qv") * col("span"))))
          .groupBy("dim")
          .agg(max(col("span")).as("span"),
            min(col("qv")).as("q_min"), max(col("qv")).as("q_max"),
            max(col("errn")).as("max_err_num"),
            sum(col("errn")).as("sum_err_num"))
          .orderBy("dim")
      },
      Some("""
        WITH x AS (
          SELECT e.vec_id, i AS dim,
            CAST(ROUND(CAST(e.embedding[i + 1] AS DOUBLE) * 1048576) AS BIGINT) AS xi
          FROM embeddings e, LATERAL (SELECT UNNEST(GENERATE_SERIES(0, 63)) AS i)),
        mm AS (SELECT dim, MIN(xi) AS lo, MAX(xi) AS hi FROM x GROUP BY dim),
        q AS (
          SELECT x.dim, x.xi, mm.lo, mm.hi, mm.hi - mm.lo AS span,
            CASE WHEN mm.hi = mm.lo THEN 0
              ELSE (2 * 255 * (x.xi - mm.lo) + (mm.hi - mm.lo))
                   // (2 * (mm.hi - mm.lo))
            END AS qv
          FROM x JOIN mm USING (dim)),
        e AS (
          SELECT dim, span, qv,
            CASE WHEN span = 0 THEN 0
              ELSE ABS(255 * (xi - lo) - qv * span) END AS errn
          FROM q)
        SELECT CAST(dim AS INTEGER) AS dim, CAST(MAX(span) AS BIGINT) AS span,
          CAST(MIN(qv) AS BIGINT) AS q_min, CAST(MAX(qv) AS BIGINT) AS q_max,
          CAST(MAX(errn) AS BIGINT) AS max_err_num,
          CAST(SUM(errn) AS BIGINT) AS sum_err_num
        FROM e GROUP BY dim ORDER BY dim""")),

    // nDCG@10 — THE standard graded ranking metric, completing the
    // retrieval-evaluation family next to recall@k (q150) and RBO
    // (q198): score the cosine-ranked top-10 per query against
    // label-match relevance grades, normalized by the IDEAL DCG over
    // the full candidate pool (min(10, #relevant) perfect hits).
    // Portability discipline: each 1/log2 term is rounded to 6 dp
    // FIRST (coarse enough to absorb any libm last-ulp difference
    // between engines), then summed decimal-exact (decSum), so the
    // gate hashes whole numbers of millionths; the final dcg/idcg is
    // one mirrored IEEE division. A query with zero relevant docs
    // yields NULL nDCG (the q190 degenerate-row convention). NOTE the
    // sequence guard: Spark's sequence(1, 0) infers a NEGATIVE step
    // and yields [1, 0] — the empty-relevant case must short-circuit
    // to an empty array explicitly.
    Q("q212_ndcg",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> cast(x AS double))").as("v"))
        val queries = emb.filter(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
            col("v").as("qv"))
        val pairs = emb.crossJoin(broadcast(queries))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("qlabel"),
            col("vec_id").as("doc_id"), col("label"),
            expr("graft_cosine(qv, v)").as("sim"))
        val ranked = pairs
          .withColumn("rk", row_number().over(Window.partitionBy("query_id")
            .orderBy(col("sim").desc, col("doc_id"))))
          .filter(col("rk") <= 10)
          .withColumn("rel",
            when(col("label") === col("qlabel"), 2).otherwise(0))
          .withColumn("term",
            round(col("rel") / log2(col("rk") + 1), 6))
        val dcg = ranked.groupBy("query_id")
          .agg(round(decSum(col("term")), 6).as("dcg"))
        val idcg = pairs.groupBy("query_id")
          .agg(sum(when(col("label") === col("qlabel"), 1).otherwise(0))
            .as("cnt"))
          .select(col("query_id"), explode_outer(
            when(col("cnt") > 0, expr("sequence(1, int(least(10L, cnt)))"))
              .otherwise(expr("array()"))).as("i"))
          .withColumn("iterm", round(lit(2.0) / log2(col("i") + 1), 6))
          .groupBy("query_id")
          .agg(round(decSum(coalesce(col("iterm"), lit(0.0))), 6).as("idcg"))
        dcg.join(idcg, "query_id")
          .select(col("query_id"), col("dcg"), col("idcg"),
            when(col("idcg") > 0, round(col("dcg") / col("idcg"), 6))
              .otherwise(lit(null).cast("double")).as("ndcg"))
          .orderBy("query_id")
      },
      Some("""
        WITH n AS (
          SELECT vec_id, label,
            LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v,
            SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
          FROM embeddings),
        pairs AS (
          SELECT q.vec_id AS query_id, q.label AS qlabel,
            e.vec_id AS doc_id, e.label AS dlabel,
            LIST_DOT_PRODUCT(q.v, e.v) / (q.nrm * e.nrm) AS sim
          FROM n q JOIN n e ON q.vec_id < 20 AND e.vec_id <> q.vec_id),
        ranked AS (
          SELECT query_id,
            CASE WHEN dlabel = qlabel THEN 2 ELSE 0 END AS rel,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY sim DESC, doc_id) AS rk
          FROM pairs),
        dcg AS (
          SELECT query_id, ROUND(CAST(CAST(SUM(CAST(
              ROUND(rel / LOG2(rk + 1), 6) AS DECIMAL(28,6)))
            AS VARCHAR) AS DOUBLE), 6) AS dcg
          FROM ranked WHERE rk <= 10 GROUP BY query_id),
        cnt AS (
          SELECT query_id,
            SUM(CASE WHEN dlabel = qlabel THEN 1 ELSE 0 END) AS cnt
          FROM pairs GROUP BY query_id),
        iterm AS (
          SELECT c.query_id, ROUND(2.0 / LOG2(i + 1), 6) AS iterm
          FROM cnt c, LATERAL (SELECT UNNEST(
            GENERATE_SERIES(1, CAST(LEAST(10, c.cnt) AS BIGINT))) AS i)),
        idcg AS (
          SELECT c.query_id, COALESCE(ROUND(CAST(CAST(SUM(CAST(
              it.iterm AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE), 6), 0.0)
            AS idcg
          FROM cnt c LEFT JOIN iterm it USING (query_id)
          GROUP BY c.query_id)
        SELECT d.query_id, d.dcg, i.idcg,
          CASE WHEN i.idcg > 0 THEN ROUND(d.dcg / i.idcg, 6)
            ELSE NULL END AS ndcg
        FROM dcg d JOIN idcg i USING (query_id) ORDER BY d.query_id"""))
,
    // MRR@10 / PRECISION@10 / HIT@10 — the binary-relevance companions
    // of q212's graded nDCG, completing the standard retrieval-eval
    // triple (recall@k already measured by q150). Same ranking device:
    // cosine top-10 per query over the broadcast query set, relevance =
    // label match. Precision is an exact tenths fraction; the
    // reciprocal rank is ONE IEEE division 1.0/rk mirrored verbatim, so
    // even the float columns hash-match. Queries with no relevant doc
    // in the top 10 surface NULL first_rel/rr and hit 0 (the q190
    // degenerate-row convention) — a macro-average would hide exactly
    // the queries an index regression hurts.
    Q("q222_retrieval_metrics",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> cast(x AS double))").as("v"))
        val queries = emb.filter(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
            col("v").as("qv"))
        val ranked = emb.crossJoin(broadcast(queries))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"),
            when(col("label") === col("qlabel"), 1L).otherwise(0L).as("rel"),
            row_number().over(Window.partitionBy("query_id")
              .orderBy(expr("graft_cosine(qv, v)").desc, col("vec_id")))
              .as("rk"))
        ranked.groupBy("query_id")
          .agg(
            sum(when(col("rk") <= 10, col("rel")).otherwise(0L))
              .as("rel_at_10"),
            round(sum(when(col("rk") <= 10, col("rel")).otherwise(0L))
              / lit(10.0), 6).as("p_at_10"),
            min(when(col("rel") === 1 && col("rk") <= 10, col("rk")))
              .cast("long").as("first_rel"),
            round(lit(1.0) / min(when(col("rel") === 1 && col("rk") <= 10,
              col("rk"))), 6).as("rr"),
            (sum(when(col("rk") <= 10, col("rel")).otherwise(0L)) > 0)
              .cast("long").as("hit_at_10"))
          .orderBy("query_id")
      },
      Some("""
        WITH n AS (
          SELECT vec_id, label,
            LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v,
            SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
          FROM embeddings),
        pairs AS (
          SELECT q.vec_id AS query_id, q.label AS qlabel,
            e.vec_id AS doc_id, e.label AS dlabel,
            LIST_DOT_PRODUCT(q.v, e.v) / (q.nrm * e.nrm) AS sim
          FROM n q JOIN n e ON q.vec_id < 20 AND e.vec_id <> q.vec_id),
        ranked AS (
          SELECT query_id,
            CASE WHEN dlabel = qlabel THEN 1 ELSE 0 END AS rel,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY sim DESC, doc_id) AS rk
          FROM pairs)
        SELECT query_id,
          CAST(SUM(CASE WHEN rk <= 10 THEN rel ELSE 0 END) AS BIGINT)
            AS rel_at_10,
          ROUND(SUM(CASE WHEN rk <= 10 THEN rel ELSE 0 END) / 10.0, 6)
            AS p_at_10,
          CAST(MIN(CASE WHEN rel = 1 AND rk <= 10 THEN rk END) AS BIGINT)
            AS first_rel,
          ROUND(1.0 / MIN(CASE WHEN rel = 1 AND rk <= 10 THEN rk END), 6)
            AS rr,
          CAST(CASE WHEN SUM(CASE WHEN rk <= 10 THEN rel ELSE 0 END) > 0
            THEN 1 ELSE 0 END AS BIGINT) AS hit_at_10
        FROM ranked GROUP BY query_id ORDER BY query_id""")),

    // SEMANTIC DECONTAMINATION — the embedding-level leak check n-gram
    // decontamination (q83) cannot perform: a paraphrased eval item
    // shares no 8-gram with its corpus twin but sits next to it in
    // embedding space. The eval BENCHMARK is fixed (vec_id % 37 = 0
    // within the first 500 ids — benchmarks do not grow with the
    // corpus, which is what keeps this scan LINEAR: |corpus| × |eval|
    // with a broadcast eval side, map-side max-combine per corpus id),
    // every corpus vector gets its max cosine to any eval item via the
    // codegen'd graft_cosine, and the output is the decontamination
    // report: per-0.1-sim-bin counts plus the flagged total at the
    // τ = 0.3 removal threshold. The oracle recomputes every cosine
    // with DuckDB list algebra.
    Q("q255_semantic_decontamination",
      (s, d) => {
        val all = vecs(s, d)
        val eval_ = all.filter(col("vec_id") % 37 === 0 &&
            col("vec_id") < 500)
          .select(col("vec_id").as("eval_id"), col("v").as("qv"))
        val corpus = all.filter(!(col("vec_id") % 37 === 0 &&
          col("vec_id") < 500))
        val maxSim = corpus.crossJoin(broadcast(eval_))
          .groupBy("vec_id")
          .agg(max(round(expr(dotExpr), 6)).as("max_sim"))
        maxSim
          .select(col("vec_id"), col("max_sim"),
            floor(col("max_sim") * 10).cast("long").as("bin"),
            (col("max_sim") >= 0.3).cast("long").as("flagged"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n_vectors"),
            sum(col("flagged")).as("n_flagged"))
          .orderBy("bin")
      },
      Some("""
        WITH n AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
            SQRT(LIST_SUM(LIST_TRANSFORM(CAST(embedding AS DOUBLE[]),
              x -> x*x))) AS nrm
          FROM embeddings),
        ev AS (SELECT * FROM n WHERE vec_id % 37 = 0 AND vec_id < 500),
        corpus AS (
          SELECT * FROM n WHERE NOT (vec_id % 37 = 0 AND vec_id < 500)),
        ms AS (
          SELECT c.vec_id,
            MAX(ROUND(LIST_DOT_PRODUCT(c.v, e.v) / (c.nrm * e.nrm), 6))
              AS max_sim
          FROM corpus c CROSS JOIN ev e GROUP BY c.vec_id)
        SELECT CAST(FLOOR(max_sim * 10) AS BIGINT) AS bin,
          COUNT(*) AS n_vectors,
          CAST(SUM(CASE WHEN max_sim >= 0.3 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_flagged
        FROM ms GROUP BY 1 ORDER BY bin""")),

    // BLOCKED MUTUAL NEAREST NEIGHBORS — the alignment primitive for
    // pairing items across (or within) corpora: a pair survives only if
    // each side is the OTHER's top-1 neighbor, which kills the hub
    // problem (one popular vector soaking up hundreds of asymmetric
    // "nearest" claims) that plain top-1 matching suffers. Candidates
    // are BLOCKED on (label, LSH bucket): the label is the coarse
    // semantic block, the q31 hyperplane bucket the FINE one — and the
    // fine key is what makes the shape scale, because label cardinality
    // is fixed while the corpus grows (label-only blocking re-grows
    // quadratic pair counts inside each block; the first sf1 sweep of
    // this query measured exactly that, 60× at 10× data, and the
    // bucket key brought it back to linear). Mutual-NN is therefore
    // approximate in the q31 sense: top-1 AMONG CO-BUCKETED candidates,
    // the trade every production ANN aligner makes. Mutuality is ONE
    // self-join of the per-vector top-1 frame on the reversed pair —
    // |vectors| rows, not |pairs|. Ties break (sim desc, id asc); cosine
    // rounds at 6dp inside the ordering, same as q30.
    Q("q276_mutual_nn",
      (s, d) => {
        val all = t(s, d, "embeddings")
          .select(col("vec_id"), col("label"),
            expr("transform(embedding, x -> cast(x AS double))").as("v"))
          .withColumn("bucket", expr(bucketExpr))
        val pairs = all.select(col("label"), col("bucket"),
            col("vec_id").as("a"), col("v").as("qv"))
          .join(all.select(col("label"), col("bucket"),
            col("vec_id").as("b"), col("v")), Seq("label", "bucket"))
          .filter(col("a") =!= col("b"))
          .withColumn("sim", round(expr(dotExpr), 6))
        val top1 = pairs
          .withColumn("rk", row_number().over(Window.partitionBy("a")
            .orderBy(col("sim").desc, col("b"))))
          .filter(col("rk") === 1)
          .select(col("label"), col("a"), col("b"), col("sim"))
        top1.as("x").join(top1.as("y"),
            col("x.a") === col("y.b") && col("x.b") === col("y.a"))
          .filter(col("x.a") < col("x.b"))
          .select(col("x.label").as("label"), col("x.a").as("a"),
            col("x.b").as("b"), col("x.sim").as("sim"))
          .orderBy("a")
      },
      Some("""
        WITH n AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
            SQRT(LIST_SUM(LIST_TRANSFORM(CAST(embedding AS DOUBLE[]),
              x -> x*x))) AS nrm
          FROM embeddings),
        b AS (
          SELECT vec_id, label, v, nrm, CAST(LIST_SUM(
            [CASE WHEN LIST_DOT_PRODUCT(
               [((1103515245::BIGINT * (p*64 + i) + 12345) % 2147483648)
                  / 2147483648.0 - 0.5 for i in GENERATE_SERIES(0, 63)],
               v) > 0 THEN (1 << p) ELSE 0 END
             for p in GENERATE_SERIES(0, 7)]) AS INTEGER) AS bucket
          FROM n),
        pairs AS (
          SELECT q.label, q.vec_id AS a, e.vec_id AS b,
            ROUND(LIST_DOT_PRODUCT(q.v, e.v) / (q.nrm * e.nrm), 6) AS sim
          FROM b q JOIN b e
            ON q.label = e.label AND q.bucket = e.bucket
              AND q.vec_id != e.vec_id),
        top1 AS (
          SELECT label, a, b, sim FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY a
              ORDER BY sim DESC, b) AS rk FROM pairs)
          WHERE rk = 1)
        SELECT x.label, x.a, x.b, x.sim
        FROM top1 x JOIN top1 y ON x.a = y.b AND x.b = y.a
        WHERE x.a < x.b
        ORDER BY x.a"""))
  )
}
