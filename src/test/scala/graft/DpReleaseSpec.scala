package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Catalog

/** q264's noise mechanism audited as a DISTRIBUTION, not just a hash
  * gate: the trailing-zero construction must actually produce the
  * two-sided geometric the epsilon ledger claims — magnitude
  * frequencies halving per level, balanced signs, bounded support —
  * and the release must be replay-deterministic.
  */
class DpReleaseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("trailing-zero noise is two-sided geometric(1/2): level " +
    "frequencies halve, signs balance, support is bounded") {
    val n = 20000L
    val h = expr("cast(conv(substring(md5(concat_ws('|', " +
      "cast(id as string), 'graft-dp-v1', 'd')), 1, 13), 16, 10) as bigint)")
    val x = shiftright(h, 1).bitwiseOR(lit(1L << 50))
    val noise = spark.range(n).select(
      (lit(1L) - lit(2L) * h.bitwiseAND(lit(1L))).as("sign"),
      (length(conv(x.bitwiseAND(lit(0L) - x), 10, 2)) - 1)
        .cast("long").as("mag"))
      .cache()
    val freq = noise.groupBy("mag").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // P(mag = k) = 2^-(k+1): 0.5, 0.25, 0.125 ± sampling noise
    assert(math.abs(freq(0L).toDouble / n - 0.5) < 0.02, s"mag0=${freq(0L)}")
    assert(math.abs(freq(1L).toDouble / n - 0.25) < 0.02)
    assert(math.abs(freq(2L).toDouble / n - 0.125) < 0.015)
    assert(freq.keys.max <= 50, "OR(2^50) must bound the support")
    val pos = noise.filter(col("sign") === 1L).count()
    assert(math.abs(pos.toDouble / n - 0.5) < 0.02, s"sign balance $pos")
  }

  test("q264 release: ledger constant, non-negative releases, " +
    "noise actually applied, deterministic replay") {
    val q = Catalog.byName("q264_dp_noisy_release")
    val a = q.run(spark, d).collect()
    val b = q.run(spark, d).collect()
    assert(a.toSeq === b.toSeq, "seeded release must replay identically")
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getAs[Long]("eps_micronats") === 1386294L)
      assert(r.getAs[Long]("released_docs") >= 0L)
      assert(r.getAs[Long]("released_tok") >= 0L)
      assert(r.getAs[Long]("released_docs") ===
        math.max(0L, r.getAs[Long]("n_docs") + r.getAs[Long]("noise_docs")))
      // token noise is scaled by the contribution bound
      assert(r.getAs[Long]("noise_tok") % 100L === 0L)
    }
    // across groups the noise must not be degenerate (some nonzero)
    assert(a.count(_.getAs[Long]("noise_docs") != 0L) > a.length / 4)
  }
}
