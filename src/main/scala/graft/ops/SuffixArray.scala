package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed suffix-array construction by prefix QUADRUPLING — the
  * reusable core under q279 (see the query for the full dedup story).
  * Input: a character frame (pos: Long 0-based, r: Long = initial
  * order/equality-preserving code, e.g. the codepoint). Output: (pos,
  * r) where r is the suffix's 0-based rank in the lexicographic order
  * of all suffixes.
  *
  * Each round keys on (r(i), r(i+h), r(i+2h), r(i+3h)), gathered in
  * ONE exchange: every rank row scatters itself to the ≤ 4 positions
  * whose key tuple reads it (pos, pos−h, pos−2h, pos−3h — an explode,
  * row-local) and a single hash aggregation on the target position
  * reassembles the tuple with conditional maxes. The previous shape —
  * one equi self-join per shifted tap — paid 4 full-frame shuffles per
  * round (base + three shifted projections, each its own exchange:
  * the shift makes the sort keys distinct, so no exchange reuse);
  * scatter-gather pays 1 shuffle + map-side-combined agg for the same
  * tuple, and the win multiplies by the ceil(log4 n) rounds. Re-ranks
  * through [[Ranks.globalKeyRank]] (range-partitioned sort +
  * metadata-scale offset broadcast; never a single-partition window).
  * Rounds are lineage-severed; the tie accumulator stops the loop as
  * soon as every rank is unique.
  */
object SuffixArray {

  def ranks(chars: DataFrame, n: Long): DataFrame = {
    val s = chars.sparkSession
    var ranks = chars.select(col("pos"), col("r")).localCheckpoint()
    var h = 1L
    while (h < n) {
      // scatter: row (pos, r) serves tap j of target position pos−j·h;
      // gather: group by target, conditional-max per tap. Every target
      // in [0, n) has its tap-0 row (its own rank), taps past the end
      // of the corpus are absent → −1 (the "shorter suffix sorts
      // first" sentinel, as in the join formulation).
      val paired = ranks
        .select(explode(array((0 to 3).map(j =>
          struct((col("pos") - j * h).as("p"), lit(j).as("tap"))): _*))
          .as("t"), col("r"))
        .filter(col("t.p") >= 0)
        .groupBy(col("t.p").as("pos"))
        .agg(
          max(when(col("t.tap") === 0, col("r"))).as("r"),
          coalesce(max(when(col("t.tap") === 1, col("r"))), lit(-1L))
            .as("r2"),
          coalesce(max(when(col("t.tap") === 2, col("r"))), lit(-1L))
            .as("r3"),
          coalesce(max(when(col("t.tap") === 3, col("r"))), lit(-1L))
            .as("r4"))
      val ties = s.sparkContext.longAccumulator("sa_ties")
      ranks = Ranks
        .globalKeyRank(paired, Seq("r", "r2", "r3", "r4"), "nr",
          Some(ties))
        .select(col("pos"), col("nr").as("r"))
        .localCheckpoint()
      // converged — every suffix rank unique, further rounds are the
      // identity (the localCheckpoint above completed the pass, so the
      // tie count is final)
      h = if (ties.value == 0L) n else h * 4
    }
    ranks
  }
}
