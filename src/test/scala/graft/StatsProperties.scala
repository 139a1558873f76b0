package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the round-10 statistics devices: the closed-form
  * variance and the CDF binning must agree with brute-force references
  * on randomized inputs under randomized partitioning — the claims the
  * oracle gate checks on one dataset, checked here on many.
  */
object StatsProperties extends Properties("graft.stats") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = TestSpark.spark

  private val rowGen = for {
    g <- Gen.oneOf("a", "b", "c", "d")
    v <- Gen.choose(0L, 1000L)
  } yield (g, v)

  property("closed-form variance equals two-pass variance, any partitioning") =
    Prop.forAll(Gen.listOfN(80, rowGen), Gen.choose(1, 7)) { (rows, parts) =>
      val sp = spark
      import sp.implicits._
      val df = rows.toDF("g", "v").repartition(parts)
      val got = df.groupBy("g")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s1"),
          sum(col("v").cast("decimal(19,0)") * col("v").cast("decimal(19,0)"))
            .as("s2"))
        .select(col("g"),
          ((col("n").cast("decimal(38,0)") * col("s2")
            - col("s1").cast("decimal(19,0)") * col("s1").cast("decimal(19,0)"))
            .cast("double")
            / (col("n") * col("n")).cast("double")).as("var_pop"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      rows.groupBy(_._1).forall { case (g, grp) =>
        val xs = grp.map(_._2.toDouble)
        val mean = xs.sum / xs.size
        val expect = xs.map(x => (x - mean) * (x - mean)).sum / xs.size
        // the closed form is exact; the two-pass reference itself carries
        // float error, so compare within its own tolerance
        math.abs(got(g) - expect) <= 1e-6 * math.max(1.0, expect)
      }
    }

  property("CDF bins: monotone in value, ties share a bin, bin∈[0,3]") =
    Prop.forAll(Gen.listOfN(60, Gen.choose(0L, 40L)), Gen.choose(1, 7)) {
      (vals, parts) =>
        val sp = spark
        import sp.implicits._
        val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("id", "v").repartition(parts)
        val freq = df.groupBy("v").agg(count(lit(1)).as("c"))
        val cum = freq.withColumn("below", coalesce(
          sum(col("c")).over(org.apache.spark.sql.expressions.Window
            .orderBy("v").rowsBetween(Long.MinValue, -1)), lit(0L)))
          .select(col("v"), col("below"))
        val tot = freq.agg(sum(col("c")).as("n"))
        val got = df.join(broadcast(cum), "v").crossJoin(broadcast(tot))
          .select(col("id"), col("v"),
            least(lit(3), floor(col("below") * lit(4.0) / col("n")))
              .cast("int").as("qbin"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        val byVal = got.groupBy(_._2).view.mapValues(_.map(_._3).distinct)
        val tiesOneBin = byVal.forall(_._2.size == 1)
        val inRange = got.forall(r => r._3 >= 0 && r._3 <= 3)
        val sortedBins = got.sortBy(_._2).map(_._3)
        val monotone = sortedBins.zip(sortedBins.drop(1)).forall {
          case (a, b) => a <= b }
        tiesOneBin && inRange && monotone
    }

  property("graft_topk equals the row_number window top-k, any partitioning") =
    Prop.forAll(
      Gen.listOfN(60, for {
        g <- Gen.oneOf("a", "b", "c")
        // coarse ord values force ties so the (ord desc, id asc) total
        // order — the equivalence's hard part — is actually exercised
        o <- Gen.choose(0, 5)
        id <- Gen.choose(0L, 1000L)
      } yield (g, o.toDouble, id)),
      Gen.choose(1, 7)) { (rows, parts) =>
      val sp = spark
      import sp.implicits._
      val df = rows.distinct.toDF("g", "ord", "id").repartition(parts)
      val viaAgg = df.groupBy("g")
        .agg(expr("graft_topk(ord, id, 4)").as("top"))
        .select(col("g"), posexplode(col("top")).as(Seq("rk0", "p")))
        .select(col("g"), (col("rk0") + 1).as("rk"),
          col("p.ord"), col("p.id"))
        .collect().map(r => (r.getString(0), r.getInt(1) + 0L,
          r.getDouble(2), r.getLong(3))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("ord").desc, col("id").asc)
      val viaWindow = df
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 4)
        .select(col("g"), col("rk").cast("long"), col("ord"), col("id"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getDouble(2), r.getLong(3))).toSet
      viaAgg == viaWindow
    }

  property("LOO encoding: reconstructing the group mean from any row is exact") =
    Prop.forAll(Gen.listOfN(50, rowGen), Gen.choose(1, 7)) { (rows, parts) =>
      val sp = spark
      import sp.implicits._
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (i.toLong, g, v.toDouble / 4.0) }
        .toDF("id", "g", "v").repartition(parts)
      val stats = df.groupBy("g")
        .agg(graft.queries.QH.decSum(col("v")).as("s"),
          count(lit(1)).as("n"))
      val got = df.join(broadcast(stats), "g")
        .select(col("id"), col("g"), col("v"),
          when(col("n") > 1, (col("s") - col("v")) / (col("n") - 1))
            .as("loo"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      val groups = rows.zipWithIndex
        .map { case ((g, v), i) => (i.toLong, g, v.toDouble / 4.0) }
        .groupBy(_._2)
      got.forall { case (id, g, v, loo) =>
        val others = groups(g).filter(_._1 != id).map(_._3)
        loo match {
          case None => others.isEmpty
          // v/4.0 values are exact quarters, so sums are exact: LOO mean
          // must equal the brute-force mean of the others bit-for-bit
          case Some(m) => m == others.sum / others.size
        }
      }
    }
}
