package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import graft.ops.Relational

/** Property tests (SURVEY.md §5.1): window/CDC operators vs brute-force
  * reference implementations over randomized inputs. */
object WindowProperties extends Properties("graft.ops") {

  // each trial runs real Spark jobs; 20 randomized trials per property
  // is plenty and keeps the suite fast
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(20)

  private lazy val spark = TestSpark.spark

  private val rowGen = for {
    key <- Gen.oneOf("a", "b", "c")
    ts <- Gen.choose(0L, 500L)
    v <- Gen.choose(-100, 100)
  } yield (key, ts, v.toDouble)

  private val rowsGen = Gen.listOfN(60, rowGen)

  property("trailingWindow sum equals brute force") = Prop.forAll(rowsGen) { rows =>
    val sp = spark
    import sp.implicits._
    val df = rows.toDF("k", "secs", "v")
      .withColumn("ts", timestamp_seconds(col("secs")))
      .withColumn("id", monotonically_increasing_id())
    val horizon = 60L
    val w = Relational.trailingWindow(Seq("k"), col("ts"), horizon)
    val got = df.select(col("k"), col("secs"), col("v"),
      sum(col("v")).over(w).as("s")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    got.forall { case (k, t, _, s) =>
      val expect = rows.filter { case (k2, t2, _) =>
        k2 == k && t2 <= t && t2 >= t - horizon
      }.map(_._3).sum
      math.abs(s - expect) < 1e-9
    }
  }

  property("applyChanges keeps exactly the max-(seq, tie) row per key") =
    Prop.forAll(rowsGen, Gen.choose(1, 8)) { (rows, parts) =>
      val sp = spark
      import sp.implicits._
      val df = rows.zipWithIndex
        .map { case ((k, seq, v), i) => (k, seq, v, i.toLong) }
        .toDF("k", "seq", "v", "tie")
        .repartition(parts)
      val got = Relational.applyChanges(Seq("k"), col("seq"), Seq(col("tie")))(df)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
      val expect = rows.zipWithIndex
        .map { case ((k, seq, _), i) => (k, seq, i.toLong) }
        .groupBy(_._1)
        .map { case (k, g) => k -> g.map(t => (t._2, t._3)).max }
      got == expect
    }

  property("rangeJoinBinned equals the naive theta join on random intervals") =
    Prop.forAll(Gen.listOfN(25, for {
      k <- Gen.oneOf("a", "b")
      s <- Gen.choose(0L, 2000L)
      len <- Gen.choose(1L, 900L)
    } yield (k, s, s + len)), Gen.oneOf(60L, 300L, 1000L)) { (ivs, bin) =>
      val sp = spark
      import sp.implicits._
      val l = ivs.toDF("k", "ls", "le")
        .select($"k", timestamp_seconds($"ls").as("l_s"),
          timestamp_seconds($"le").as("l_e"))
      val r = ivs.reverse.toDF("k", "rs", "re")
        .select($"k", timestamp_seconds($"rs").as("r_s"),
          timestamp_seconds($"re").as("r_e"))
      val binned = Relational.rangeJoinBinned(l, r,
          col("l_s"), col("l_e"), col("r_s"), col("r_e"), Seq("k"), bin)
        .select("k", "l_s", "r_s").collect()
        .map(x => (x.getString(0), x.getTimestamp(1), x.getTimestamp(2)))
        .sortBy(_.toString)
      val naive = l.join(r, Seq("k"))
        .filter(col("l_s") < col("r_e") && col("l_e") > col("r_s"))
        .select("k", "l_s", "r_s").collect()
        .map(x => (x.getString(0), x.getTimestamp(1), x.getTimestamp(2)))
        .sortBy(_.toString)
      binned.sameElements(naive)
    }

  property("cumulativeExclusiveOfFirst equals cumsum minus the first value") =
    Prop.forAll(rowsGen, Gen.choose(1, 8)) { (rows, parts) =>
      val sp = spark
      import sp.implicits._
      val df = rows.zipWithIndex
        .map { case ((k, t, v), i) => (k, t * 1000 + i, v) } // total order
        .toDF("k", "ord", "v").repartition(parts)
      val got = df.select(col("k"), col("ord"),
          Relational.cumulativeExclusiveOfFirst(
            Seq("k"), Seq(col("ord")))(col("v")).as("s"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Double])))
      val byKey = rows.zipWithIndex
        .map { case ((k, t, v), i) => (k, t * 1000L + i, v) }
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      got.forall { case (k, ord, s) =>
        val series = byKey(k)
        val first = series.head
        if (ord == first._2) s.isEmpty // first row → null (empty frame)
        else {
          val expect = series.takeWhile(_._2 <= ord).map(_._3).sum - first._3
          s.exists(x => math.abs(x - expect) < 1e-9)
        }
      }
    }

  property("dedupeExact keeps the min-keep row per key under any partitioning") =
    Prop.forAll(rowsGen, Gen.choose(1, 8)) { (rows, parts) =>
      val sp = spark
      import sp.implicits._
      val df = rows.zipWithIndex
        .map { case ((k, ord, _), i) => (k, ord * 1000 + i) }
        .toDF("k", "ord").repartition(parts)
      val got = Relational.dedupeExact(Seq("k"), col("ord"))(df)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expect = rows.zipWithIndex
        .map { case ((k, ord, _), i) => (k, ord * 1000 + i) }
        .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).min }
      got == expect
    }
}

/** Iterative-operator properties get their own (smaller) trial budget:
  * each connectedComponents trial runs diameter+1 distributed rounds. */
object GraphProperties extends Properties("graft.ops.graph") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  property("connectedComponents equals driver-side union-find") =
    Prop.forAll(
      Gen.listOfN(12, Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L))),
      Gen.choose(1, 8)) { (rawEdges, parts) =>
      val sp = spark
      import sp.implicits._
      val edges = rawEdges.filter { case (a, b) => a != b }
      if (edges.isEmpty) true
      else {
        val df = edges.toDF("a", "b").repartition(parts)
        val got = Relational.connectedComponents(df, "a", "b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // brute-force union-find; "max root points to min root" keeps
        // every tree's root = the component minimum, matching the
        // operator's min-label semantics
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expect = parent.keys.map(x => x -> find(x)).toMap
        got == expect
      }
    }
}
