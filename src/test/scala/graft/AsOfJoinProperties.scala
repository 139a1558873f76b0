package graft

import org.scalacheck.{Gen, Prop, Properties}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.AsOf

/** plans/AsOfJoinExec fuzzed against the composed
  * inequality-join+top-1 reference: random key skew (some keys on one
  * side only), duplicate timestamps on BOTH sides (the right-side dup
  * rule — latest in sort order wins — must agree with the reference's
  * deterministic top-1), and times colliding exactly.
  */
object AsOfJoinProperties extends Properties("graft.asofexec") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val rowGen: Gen[(String, Long, Long)] = for {
    k <- Gen.oneOf("a", "b", "c", "d", "e")
    t <- Gen.choose(0L, 30L) // tight range → many exact collisions
    v <- Gen.choose(0L, 1000L)
  } yield (k, t, v)

  private val frameGen: Gen[List[(String, Long, Long)]] =
    Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, rowGen))

  private def df(rows: List[(String, Long, Long)], p: String): DataFrame = {
    import spark.implicits._
    // a deterministic unique id makes the expected answer well-defined
    // even with duplicate (key, time): highest (time, id) wins
    rows.zipWithIndex.map { case ((k, t, v), i) => (k, t, i.toLong) }
      .toDF(s"${p}k", s"${p}t", s"${p}id")
  }

  property("merge-scan ≡ composed top-1 under skew and ties") =
    Prop.forAll(frameGen, frameGen) { (lr, rr) =>
      val l = df(lr, "l").cache()
      val r = df(rr, "r")
        // make the within-(key,time) winner unambiguous: as-of keeps
        // the LAST right row in (key, time, id) sort order, so fold id
        // into the time axis via t*1000 + id (id < 1000)
        .select(col("rk"), (col("rt") * 1000 + col("rid")).as("rt"),
          col("rid")).cache()
      val lAdj = l.select(col("lk"), (col("lt") * 1000 + 999).as("lt"),
        col("lid"))
      val got = AsOf.joinAsOf(lAdj, r, Seq(lAdj("lk") -> r("rk")),
        lAdj("lt"), r("rt"))
        .collect().map(x => (x.getLong(2),
          if (x.isNullAt(5)) -1L else x.getLong(5))).toSet
      val cand = lAdj.join(r, lAdj("lk") === r("rk") &&
        r("rt") <= lAdj("lt"), "left")
      val w = Window.partitionBy(lAdj("lid")).orderBy(r("rt").desc_nulls_last)
      val want = cand.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(lAdj("lid"), r("rid")).collect()
        .map(x => (x.getLong(0),
          if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
      Prop(got == want) :| s"got=$got want=$want"
    }
}
