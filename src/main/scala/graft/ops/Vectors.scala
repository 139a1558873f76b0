package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed vector operations for the similarity-search paths
  * (SimilarityQueries q30/q31/q73/q78).
  */
object Vectors {

  /** Quantize every component to a 2⁻²⁰ dyadic: `round(x·2²⁰)/2²⁰`.
    * Power-of-two scaling and the final division are EXACT in binary
    * floating point, and the rounding boundary (an exact .5) resolves
    * half-away-from-zero in both Spark and DuckDB — so the quantized
    * vectors are bit-identical across engines, and every subsequent sum
    * of components (or of pairwise products, granularity 2⁻⁴⁰) stays
    * exact while the scaled magnitude is below 2⁵³. That makes k-means
    * sums order-insensitive WITHOUT decimal casts: partial aggregation,
    * shuffle order, and executor count cannot change a bit. */
  def quantized(vCol: String): org.apache.spark.sql.Column =
    expr(s"transform($vCol, x -> round(x * 1048576d) / 1048576d)")

  /** Lloyd's k-means for an IVF coarse quantizer, fully distributed and
    * exactly reproducible (the q73 IVF note says "centroids would come
    * from a k-means job" — this is that job):
    *
    *  - deterministic init: the k smallest `idCol` vectors;
    *  - a FIXED iteration count — no data-dependent convergence test, so
    *    a replay, a retry, or a different engine runs the same rounds;
    *  - assignment = highest cosine, centroid-id tie-break (total order);
    *  - update = per-dimension mean of exact dyadic sums (see
    *    [[quantized]]), one shuffled aggregate per round.
    *
    * Scale shape per round: one broadcast of k·dim doubles (a genuinely
    * bounded dimension — the hint is justified), one narrow shuffle on
    * (centroid, dim). Returns (centroid_id, cv: array<double>).
    */
  def kmeansCentroids(vecs: DataFrame, idCol: String, vCol: String,
                      k: Int, iters: Int, dim: Int): DataFrame = {
    import Checkpoints.{checkpointTracked, releasePinned}
    val vq = vecs.select(col(idCol).as("vec_id"), quantized(vCol).as("vq"))
    // genuinely the k SMALLEST ids (TakeOrderedAndProject — no full
    // sort), not `id < k`, which under-selects on sparse id spaces
    var (cents, centIds) = checkpointTracked(
      vq.orderBy(col("vec_id")).limit(k)
        .select(col("vec_id").as("centroid_id"), col("vq").as("cv")))
    // k rows per round; the checkpoint keeps the per-round plan flat
    val aw = Window.partitionBy("vec_id")
      .orderBy(col("sim_c").desc, col("centroid_id"))
    for (_ <- 1 to iters) {
      val assigned = vq.crossJoin(broadcast(cents))
        .withColumn("sim_c", round(expr("graft_cosine(vq, cv)"), 6))
        .withColumn("rn", row_number().over(aw))
        .filter(col("rn") === 1)
        .select(col("centroid_id"), col("vq"))
      val (next, nextIds) = checkpointTracked(assigned
        .select(col("centroid_id"), posexplode(col("vq")).as(Seq("pos", "x")))
        .groupBy("centroid_id", "pos")
        .agg((sum(col("x")) / count(lit(1))).as("m")) // exact dyadic sum
        .groupBy("centroid_id")
        .agg(expr("transform(array_sort(collect_list(struct(pos, m)))," +
          " s -> s.m)").as("cv")))
      releasePinned(cents, centIds) // superseded round
      cents = next
      centIds = nextIds
    }
    cents
  }
}
