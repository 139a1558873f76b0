package graft

import org.scalacheck.{Gen, Prop, Properties}

/** q214's bucketed skyline (Relational.paretoFrontier2d) must equal the
  * brute-force dominance filter on arbitrary data — including the tie
  * cases the bucket decomposition has to get right: duplicate
  * (price, size) pairs (all survive), same price with different sizes
  * (only the max survives), same size across prices (only the cheapest
  * survives), and fewer distinct prices than buckets. */
object SkylineProperties extends Properties("graft.skyline") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  // small value domains force heavy ties
  private val rowGen: Gen[(Int, Int)] = for {
    price <- Gen.choose(0, 12)
    size <- Gen.choose(0, 12)
  } yield (price, size)

  private val dataGen: Gen[List[(Int, Int)]] =
    Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, rowGen))

  property("bucketed frontier equals brute-force dominance") =
    Prop.forAll(dataGen, Gen.oneOf(1, 2, 7, 32)) { (rows, buckets) =>
      val sp = spark
      import sp.implicits._
      val df = rows.zipWithIndex
        .map { case ((p, s), i) => (i.toLong, p, s) }
        .toDF("id", "price", "size")
      val truth = rows.zipWithIndex.collect {
        case ((p, s), i) if !rows.exists { case (p2, s2) =>
          p2 <= p && s2 >= s && (p2 < p || s2 > s) } => i.toLong
      }.toSet
      val got = graft.ops.Relational
        .paretoFrontier2d(df, "price", "size", buckets)
        .collect().map(_.getAs[Long]("id")).toSet
      got == truth
    }
}
