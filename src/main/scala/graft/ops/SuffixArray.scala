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
  * Each round keys on (r(i), r(i+h), r(i+2h), r(i+3h)) — one equi
  * self-join per shifted tap — and re-ranks through
  * [[Ranks.globalKeyRank]] (range-partitioned sort + metadata-scale
  * offset broadcast; never a single-partition window). ceil(log4 n)
  * rounds, each lineage-severed; the tie accumulator stops the loop as
  * soon as every rank is unique.
  */
object SuffixArray {

  def ranks(chars: DataFrame, n: Long): DataFrame = {
    val s = chars.sparkSession
    var ranks = chars.select(col("pos"), col("r")).localCheckpoint()
    var h = 1L
    while (h < n) {
      val sh = (m: Long, nm: String) => ranks
        .select((col("pos") - m).as("pos"), col("r").as(nm))
      val paired = ranks
        .join(sh(h, "r2"), Seq("pos"), "left")
        .join(sh(2 * h, "r3"), Seq("pos"), "left")
        .join(sh(3 * h, "r4"), Seq("pos"), "left")
        .select(col("pos"), col("r"),
          coalesce(col("r2"), lit(-1L)).as("r2"),
          coalesce(col("r3"), lit(-1L)).as("r3"),
          coalesce(col("r4"), lit(-1L)).as("r4"))
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
