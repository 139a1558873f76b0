package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Catalog

/** Invariants of the cluster-operations family (ScaleOpsQueries) beyond
  * the CatalogSpec smoke and the DuckDB hash gate: the structural
  * guarantees each operator's 100 TB story rests on.
  */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("q159: CMS estimate is a one-sided bound on every probed token") {
    val rows = Catalog.byName("q159_countmin").run(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cnt, est) = (r.getAs[Long]("cnt"), r.getAs[Long]("est"))
      assert(est >= cnt, s"token ${r.get(0)}: est $est < true $cnt")
      assert(r.getAs[Boolean]("lower_bound_ok"))
    }
  }

  test("q160: compaction groups are file-count-positive and cover every file") {
    val plan = Catalog.byName("q160_compaction_plan").run(spark, d)
    val nFiles = plan.agg(sum("n_files")).head.getLong(0)
    val nOrders = graft.tables.Tables.load(spark, d, "orders").count()
    assert(nFiles === nOrders, "every file lands in exactly one group")
    // greedy cut: a group exceeds the 512 MB target by at most one file,
    // and file sizes here are ≤ ~600 so any group is < target + max file
    val maxMb = plan.agg(max("mb")).head.getDouble(0)
    assert(maxMb < 512.0 + 600.0)
    // group ids are dense from 0 within each partition
    import spark.implicits._
    val holes = plan.groupBy("part")
      .agg(min("grp").as("lo"), max("grp").as("hi"), count(lit(1)).as("n"))
      .filter($"lo" =!= 0L || $"hi" =!= $"n" - 1)
      .count()
    assert(holes === 0L, "group ids must be dense per partition")
  }

  test("q161: splits partition the event stream; train precedes test in time") {
    val splits = Catalog.byName("q161_embargo_split").run(spark, d)
    val total = splits.agg(sum("n")).head.getLong(0)
    val nEvents = graft.tables.Tables.load(spark, d, "events").count()
    assert(total === nEvents, "train+embargo+test must cover every event")
    val bySplit = splits.groupBy("split").agg(sum("n").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("embargo", 0L),
      "embargo buffer must be small relative to train")
    assert(bySplit.contains("train") && bySplit.contains("test"))
  }

  test("q162: every fused doc has at least one arm; rrf bounded by 2/61") {
    val rows = Catalog.byName("q162_rrf_fusion").run(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!(r.isNullAt(1) && r.isNullAt(2)),
        "a fused doc must come from the lexical or the dense arm")
      val rrf = r.getAs[Double]("rrf")
      assert(rrf > 0.0 && rrf <= 2.0 / 61.0 + 1e-9)
    }
  }

  test("q163: closed-form slope matches the two-pass reference per source") {
    val got = Catalog.byName("q163_group_ols").run(spark, d).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("slope"),
        r.getAs[Double]("intercept"))).toMap
    val pts = graft.tables.Tables.load(spark, d, "documents")
      .select(col("source"), col("n_chars").cast("double").as("x"),
        size(split(col("text"), " ")).cast("double").as("y"))
      .collect()
      .groupBy(_.getString(0))
    pts.foreach { case (src, rows) =>
      val xs = rows.map(_.getDouble(1)); val ys = rows.map(_.getDouble(2))
      val n = xs.length.toDouble
      val xb = xs.sum / n; val yb = ys.sum / n
      val slope = xs.zip(ys).map { case (x, y) => (x - xb) * (y - yb) }.sum /
        xs.map(x => (x - xb) * (x - xb)).sum
      assert(math.abs(got(src)._1 - slope) < 1e-4,
        s"$src: closed-form ${got(src)._1} vs two-pass $slope")
      assert(math.abs(got(src)._2 - (yb - slope * xb)) < 1e-2)
    }
  }

  test("q164: sketch forecast upper-bounds the exact join size") {
    val rows = Catalog.byName("q164_join_size_estimate").run(spark, d).collect()
    assert(rows.length === 2)
    val nEvents = graft.tables.Tables.load(spark, d, "events").count()
    rows.foreach { r =>
      val (exact, est) =
        (r.getAs[Long]("exact_pairs"), r.getAs[Long]("est_pairs"))
      assert(est >= exact, s"${r.getString(0)}: est $est < exact $exact")
    }
    // a self-join on any key yields at least one pair per row
    val self = rows.find(_.getString(0) == "events_self_user").get
    assert(self.getAs[Long]("exact_pairs") >= nEvents)
  }
}
