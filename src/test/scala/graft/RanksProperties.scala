package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** Property armor for [[graft.ops.Ranks.globalKeyRank]] — the
  * distributed rank op under q279's prefix doubling. The contract:
  * rank(row) = number of rows with a strictly smaller key (0-based,
  * ties share), regardless of input partitioning, including duplicate
  * keys, negative sentinels and empty-ish partitions; and the tie
  * accumulator is zero exactly when keys are unique.
  */
object RanksProperties extends Properties("graft.ranks") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSpark.spark

  private val rowsGen: Gen[List[(Long, Long)]] =
    Gen.choose(1, 120).flatMap { m =>
      Gen.listOfN(m, for {
        a <- Gen.choose(-1L, 8L)
        b <- Gen.choose(-1L, 8L)
      } yield (a, b))
    }

  property("rank = count of strictly-smaller keys, any partitioning") =
    Prop.forAll(rowsGen, Gen.choose(1, 9)) { (rows, parts) =>
      val sp = spark
      import sp.implicits._
      val df = rows.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("id", "a", "b").repartition(parts)
      val acc = sp.sparkContext.longAccumulator("ties")
      val got = graft.ops.Ranks
        .globalKeyRank(df, Seq("a", "b"), "rk", Some(acc))
      val collected = got.collect()
        .map(r => r.getLong(0) -> r.getLong(3)).toMap
      val sortedKeys = rows.sorted
      val expect = rows.zipWithIndex.map { case (k, i) =>
        i.toLong -> sortedKeys.count(x =>
          x._1 < k._1 || (x._1 == k._1 && x._2 < k._2)).toLong
      }.toMap
      val dupRows = rows.size - rows.distinct.size
      collected == expect &&
        ((acc.value == 0L) == (dupRows == 0))
    }
}
