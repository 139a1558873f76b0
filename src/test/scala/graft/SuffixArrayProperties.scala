package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** Property armor for [[graft.ops.SuffixArray]]: the distributed
  * prefix-quadrupling ranks must equal brute-force suffix sort on any
  * string — including adversarial shapes (all-equal characters, long
  * periodic repeats) that stress the tie-handling and the convergence
  * early-exit, under any input partitioning.
  */
object SuffixArrayProperties extends Properties("graft.suffixarray") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSpark.spark

  private val strGen: Gen[String] = Gen.oneOf(
    // random small-alphabet text (forces deep ties)
    Gen.choose(2, 60).flatMap(m =>
      Gen.listOfN(m, Gen.oneOf('a', 'b', 'c')).map(_.mkString)),
    // periodic repeats — the prefix-doubling stress case
    Gen.choose(1, 4).flatMap(p => Gen.choose(3, 15).map(rep =>
      ("ab".take(p max 1) + "ba".take(p max 1)) * rep)),
    // all-equal characters — every round ties until the length runs out
    Gen.choose(2, 40).map("a" * _))

  property("quadrupling ranks equal brute-force suffix sort") =
    Prop.forAll(strGen, Gen.choose(1, 7)) { (str, parts) =>
      val sp = spark
      import sp.implicits._
      val chars = str.zipWithIndex
        .map { case (c, i) => (i.toLong, c.toLong) }
        .toDF("pos", "r").repartition(parts)
      val got = graft.ops.SuffixArray.ranks(chars, str.length.toLong)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = str.indices
        .sortBy(i => str.substring(i))
        .zipWithIndex
        .map { case (pos, rank) => pos.toLong -> rank.toLong }.toMap
      got == expect
    }
}
