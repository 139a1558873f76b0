package graft

import org.scalacheck.{Gen, Prop, Properties}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.plans.RangeJoinRule

/** plans/RangeJoinRule: the binned rewrite must emit EXACTLY the pair
  * set of the nested-loop overlap join — no pair missed (the anchor
  * bin must lie inside both sides' generated bin spans for every value
  * combination) and no pair duplicated (exactly one anchor bin per
  * pair). Intervals are adversarial: negative bounds, empty (lo = hi)
  * and inverted (lo > hi) "intervals", spans from zero to many bin
  * widths, and bounds straddling bin boundaries (multiples of the
  * width ±1). Checked at several widths including one far larger than
  * every span and one smaller than most.
  */
object RangeJoinProperties extends Properties("graft.rangejoin") {

  // each trial runs real Spark joins; keep the trial count modest
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  /** Bounds cluster around bin edges of width 64 (the test width) so
    * the floor-division arithmetic is exercised at its corners. */
  private val boundGen: Gen[Long] = Gen.oneOf(
    Gen.choose(-500L, 500L),
    Gen.oneOf(Seq(-128L, -65L, -64L, -63L, -1L, 0L, 1L, 63L, 64L, 65L,
      127L, 128L, 192L)))

  private val rowGen: Gen[(Long, Long)] = for {
    lo <- boundGen
    span <- Gen.oneOf(Gen.choose(0L, 300L), Gen.const(-40L)) // inverted too
  } yield (lo, lo + span)

  private val frameGen: Gen[List[(Long, Long)]] =
    Gen.choose(2, 25).flatMap(n => Gen.listOfN(n, rowGen))

  private def df(rows: List[(Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      .toDF("id", "lo", "hi")
  }

  private def pairs(a: DataFrame, b: DataFrame): Seq[(Long, Long)] =
    a.join(b, a("lo") < b("hi") && b("lo") < a("hi"))
      .select(a("id"), b("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  property("rewrite ≡ nested loop, each pair exactly once") =
    Prop.forAll(frameGen, frameGen) { (ra, rb) =>
      val (a, b) = (df(ra), df(rb))
      val old = spark.conf.getOption(RangeJoinRule.WIDTH_KEY)
      try {
        spark.conf.set(RangeJoinRule.WIDTH_KEY, "0")
        val naive = pairs(a, b).toSet
        Prop.all(Seq("64", "7", "100000").map { w =>
          spark.conf.set(RangeJoinRule.WIDTH_KEY, w)
          val got = pairs(a, b)
          Prop(got.size == got.toSet.size) :| s"width $w duplicated" &&
            Prop(got.toSet == naive) :| s"width $w wrong set"
        }: _*)
      } finally old match {
        case Some(v) => spark.conf.set(RangeJoinRule.WIDTH_KEY, v)
        case None => spark.conf.unset(RangeJoinRule.WIDTH_KEY)
      }
    }
}
