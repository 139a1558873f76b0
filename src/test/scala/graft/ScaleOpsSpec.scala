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
}
