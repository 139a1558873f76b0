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

  // q163's closed normal-equation form: integer-sum slope must match the
  // centered two-pass reference on random integer points, any
  // partitioning — including degenerate groups (all-same x → zero
  // denominator → excluded here; the query's corpus never produces one,
  // but the property pins behavior on everything else).
  property("closed-form OLS slope equals the two-pass reference") =
    Prop.forAll(
      Gen.listOfN(60, for {
        g <- Gen.oneOf("a", "b", "c")
        x <- Gen.choose(1L, 500L)
        y <- Gen.choose(0L, 300L)
      } yield (g, x, y)),
      Gen.choose(1, 7)) { (rows, parts) =>
      val sp = spark
      import sp.implicits._
      val df = rows.toDF("g", "x", "y").repartition(parts)
      val got = df.groupBy("g")
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast("decimal(38,0)")).as("sx"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum(expr("cast(x as decimal(38,0)) * cast(x as decimal(38,0))"))
            .as("sxx"),
          sum(expr("cast(x as decimal(38,0)) * cast(y as decimal(38,0))"))
            .as("sxy"))
        .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
        .filter(col("den") =!= 0)
        .select(col("g"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            col("den").cast("double")).as("slope"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      rows.groupBy(_._1).forall { case (g, grp) =>
        val xs = grp.map(_._2.toDouble); val ys = grp.map(_._3.toDouble)
        val xb = xs.sum / xs.size; val yb = ys.sum / ys.size
        val den = xs.map(x => (x - xb) * (x - xb)).sum
        if (den == 0.0) !got.contains(g)
        else {
          val slope = xs.zip(ys).map { case (x, y) => (x - xb) * (y - yb) }
            .sum / den
          math.abs(got(g) - slope) <= 1e-9 * math.max(1.0, math.abs(slope))
        }
      }
    }

  // q180's digest contract: the md5-fingerprint SUM is invariant under
  // row permutation AND partitioning, and flips when any single row
  // changes — on random multisets, not just the gate corpus.
  property("table digest: partition/order-free, sensitive to one row") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.choose(0L, 50L)).map(_.take(40)),
      Gen.choose(1, 7), Gen.choose(1, 7)) { (ids, p1, p2) =>
      val sp = spark
      import sp.implicits._
      val fp = "cast(conv(substring(md5(cast(id as string)), 1, 13), 16, 10)" +
        " as decimal(38,0))"
      def digest(xs: Seq[Long], parts: Int): String =
        xs.toDF("id").repartition(parts)
          .agg(sum(expr(fp)).cast("decimal(38,0)").cast("string"))
          .head.getString(0)
      val base = digest(ids, p1)
      val shuffled = digest(scala.util.Random.shuffle(ids), p2)
      val changed = digest(ids.updated(0, ids.head + 1000L), p1)
      (base == shuffled) && (changed != base)
    }

  // the q182 device: islands from the running max of PRIOR ends must
  // reproduce a driver-side interval union on arbitrary (possibly
  // touching, nested, duplicated) intervals under any partitioning
  private val ivGen = for {
    s <- Gen.choose(0L, 500L)
    len <- Gen.choose(0L, 80L)
  } yield (s, s + 1 + len)

  property("gaps-and-islands covered time equals brute-force union") =
    Prop.forAll(Gen.nonEmptyListOf(ivGen), Gen.choose(1, 7)) { (ivs, parts) =>
      val sp = spark
      import sp.implicits._
      import org.apache.spark.sql.expressions.Window
      val df = ivs.zipWithIndex.map { case ((s, e), i) => (s, e, i.toLong) }
        .toDF("s", "e", "id").repartition(parts)
      val ord = Window.orderBy("s", "e", "id")
      val prevMax = max(col("e")).over(
        ord.rowsBetween(Window.unboundedPreceding, -1))
      val got = df
        .withColumn("ni",
          when(prevMax.isNull || col("s") > prevMax, 1).otherwise(0))
        .withColumn("isl",
          sum(col("ni")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("isl").agg(min("s").as("is_"), max("e").as("ie"))
        .agg(sum(col("ie") - col("is_"))).head.getLong(0)
      val sorted = ivs.sorted
      var covered = 0L; var cs = Long.MinValue; var ce = Long.MinValue
      sorted.foreach { case (s, e) =>
        if (s > ce) { if (ce != Long.MinValue) covered += ce - cs; cs = s; ce = e }
        else if (e > ce) ce = e
      }
      covered += ce - cs
      got == covered
    }

  // the q186 contract: rendezvous routing's minimal-disruption property —
  // removing one shard reassigns ONLY that shard's keys
  property("HRW: removing a shard moves only that shard's keys") =
    Prop.forAll(Gen.listOfN(40, Gen.choose(0L, 100000L)), Gen.choose(0, 7)) {
      (rawIds, removed) =>
        val sp = spark
        import sp.implicits._
        val ids = rawIds.distinct
        def route(shards: Seq[Int]): Map[Long, Int] = {
          val arr = shards.mkString("array(", ", ", ")")
          ids.toDF("doc_id")
            .select(col("doc_id"), expr(
              s"""transform($arr, s ->
                 |  named_struct('wt', cast(conv(substring(md5(concat(
                 |    cast(doc_id as string), '#', cast(s as string))),
                 |    1, 13), 16, 10) as bigint), 'sh', s))"""
                .stripMargin).as("ws"))
            .select(col("doc_id"),
              expr("array_max(ws).sh").as("shard"))
            .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        }
        val full = route(0 to 7)
        val dropped = route((0 to 7).filterNot(_ == removed))
        ids.forall { id =>
          if (full(id) != removed) dropped(id) == full(id)
          else dropped(id) != removed
        }
    }

  // the q198 identity: RBO of a ranking against itself is Σ 2^-d — the
  // exact dyadic ceiling the spec bounds against
  property("RBO self-comparison hits the exact dyadic ceiling") =
    Prop.forAll(Gen.choose(20, 60)) { n =>
      val sp = spark
      import sp.implicits._
      import org.apache.spark.sql.expressions.Window
      val peru = (1 to n).map(i => (i.toLong, i * 3.0 + 1)).toDF("u", "x")
      val r = peru.select(col("u"),
        row_number().over(Window.orderBy(col("x").desc, col("u"))).as("ra"))
        .withColumn("rb", col("ra")) // identical ranking
        .select(greatest(col("ra"), col("rb")).as("m"))
      val depths = sp.range(1, 21).select(col("id").cast("int").as("d"))
      val total = depths.join(r, col("m") <= col("d"), "left")
        .groupBy("d").agg(count(col("m")).as("inter"))
        .select(sum((col("inter").cast("double") / col("d"))
          * pow(lit(0.5), col("d"))).as("rbo"))
        .head.getDouble(0)
      // with n ≥ 20 every depth d has inter = d, so rbo = 1 − 2⁻²⁰ EXACTLY
      total == 1.0 - math.pow(0.5, 20)
    }
}
