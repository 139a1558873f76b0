package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Relational

class RelationalOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("applyChanges keeps latest row per key, deterministic under shuffle") {
    val df = Seq(
      ("a", 1L, "v1"), ("a", 3L, "v3"), ("a", 2L, "v2"),
      ("b", 5L, "w5"), ("b", 5L, "w5b")).toDF("k", "seq", "v")
      .repartition(7)
    val out = Relational.applyChanges(Seq("k"), col("seq"), Seq(col("v")))(df)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(out === Set(("a", 3L, "v3"), ("b", 5L, "w5b")))
  }

  test("dedupeExact keeps the min-keep row per key") {
    val df = Seq(("x", 2, "late"), ("x", 1, "early"), ("y", 9, "only"))
      .toDF("k", "ord", "v")
    val out = Relational.dedupeExact(Seq("k"), col("ord"))(df)
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(out === Set(("x", "early"), ("y", "only")))
  }

  test("timeSpine generates inclusive hourly steps") {
    val df = Seq("2024-01-01 00:30:00", "2024-01-01 03:10:00")
      .toDF("s").select(to_timestamp($"s").as("ts"))
    val n = Relational.timeSpine(df, col("ts")).count()
    assert(n === 3) // 00:30, 01:30, 02:30
  }

  test("rollupWithAll adds a sentinel total bucket") {
    val df = Seq(("x", 1.0), ("x", 2.0), ("y", 10.0)).toDF("dim", "v")
    val out = Relational.rollupWithAll("dim", "ALL", Seq(sum($"v").as("s")))(df)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(out === Map("x" -> 3.0, "y" -> 10.0, "ALL" -> 13.0))
  }

  test("unpivotMetrics reshapes wide to long in one pass") {
    val df = Seq(("g1", 1.0, 2.0)).toDF("id", "m1", "m2")
    val out = Relational.unpivotMetrics(Seq("id"), Seq("m1", "m2"))(df)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(out === Set(("g1", "m1", 1.0), ("g1", "m2", 2.0)))
  }

  test("camelCaseAll renames snake_case columns") {
    val df = Seq((1, 2)).toDF("foo_bar_baz", "qux")
    assert(Relational.camelCaseAll(df).columns.toSeq ===
      Seq("fooBarBaz", "qux"))
  }

  test("epochOf anchors weekly epochs at Friday 08:00 UTC") {
    val df = Seq(
      "2024-01-05 07:59:59", // Fri just before anchor -> prior epoch
      "2024-01-05 08:00:00", // Fri at anchor -> new epoch
      "2024-01-11 23:00:00") // Thu -> same epoch as Jan 5 08:00
      .toDF("s").select(to_timestamp($"s").as("ts"))
    val out = df.select(Relational.epochOf($"ts").cast("string")).collect()
      .map(_.getString(0))
    assert(out(0) === "2023-12-29 08:00:00")
    assert(out(1) === "2024-01-05 08:00:00")
    assert(out(2) === "2024-01-05 08:00:00")
  }

  test("fixedPoint decodes scaled integers") {
    val df = Seq(1234567L).toDF("raw")
    val v = df.select(Relational.fixedPoint($"raw", 1e6)).head().getDouble(0)
    assert(v === 1.234567)
  }

  test("connectedComponents: chains close transitively, components stay apart") {
    // component {1,2,3,4} is a CHAIN (1-2, 2-3, 3-4): 4 reaches 1 only
    // transitively, which needs diameter rounds of propagation;
    // {10,11} is a separate pair; 99 never appears (caller left-joins)
    val edges = Seq((2L, 1L), (3L, 2L), (4L, 3L), (10L, 11L))
      .toDF("a", "b")
    val comps = Relational.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: a 120-node chain converges under maxIter " +
    "(pointer jumping, O(log) rounds)") {
    // plain min-propagation would need 119 rounds — far over maxIter=50;
    // path halving closes it in ~⌈log₂ 120⌉ ≈ 7
    val edges = (1L until 120L).map(i => (i - 1, i)).toDF("a", "b")
    val comps = Relational.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(comps.length === 120)
    assert(comps.forall(_._2 === 0L), "every chain node must label to 0")
  }

  test("trailingWindow sums exactly the inclusive range") {
    val df = Seq(
      ("u", "2024-01-01 00:00:00", 1.0),
      ("u", "2024-01-01 12:00:00", 2.0),
      ("u", "2024-01-02 00:00:00", 4.0), // 24h window includes all three
      ("u", "2024-01-02 12:00:01", 8.0)) // rows 1+2 aged out (>24h)
      .toDF("k", "s", "v").select($"k", to_timestamp($"s").as("ts"), $"v")
    val w = Relational.trailingWindow(Seq("k"), col("ts"), 86400L)
    val out = df.select(sum($"v").over(w)).collect().map(_.getDouble(0)).sorted
    assert(out.toSeq === Seq(1.0, 3.0, 7.0, 12.0))
  }
}
