package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RangeJoinRule

/** The optimizer rule's contract: result-identical to the naive theta
  * join at every width, nested-loop-free plans when it fires, and a
  * hard no-touch guarantee for joins outside its scope.
  */
class RangeJoinRuleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic interval frames, including negative bounds, empty
    * intervals (lo == hi), and spans much wider than the bin width. */
  private def intervals(n: Int, seed: Long): DataFrame =
    spark.range(n.toLong).select(
      col("id"),
      ((col("id") * 2654435761L + seed) % 4000 - 2000).as("lo"))
      .select(col("id"), col("lo"),
        (col("lo") + pmod(col("id") * 40503L + seed, lit(3000))).as("hi"))

  private def overlapJoin(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b,
      a("lo") < b("hi") && b("lo") < a("hi"))
      .select(a("id").as("a_id"), b("id").as("b_id"))

  private def withWidth[T](w: String)(body: => T): T = {
    val old = spark.conf.getOption(RangeJoinRule.WIDTH_KEY)
    spark.conf.set(RangeJoinRule.WIDTH_KEY, w)
    try body
    finally old match {
      case Some(v) => spark.conf.set(RangeJoinRule.WIDTH_KEY, v)
      case None => spark.conf.unset(RangeJoinRule.WIDTH_KEY)
    }
  }

  test("rewrite is result-identical to the nested-loop join, " +
    "negative bounds included, across widths") {
    val a = intervals(400, 7)
    val b = intervals(300, 1000003)
    val naive = withWidth("0") {
      overlapJoin(a, b).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(naive.nonEmpty)
    for (w <- Seq("16", "1024", "1000000")) {
      val got = withWidth(w) {
        overlapJoin(a, b).collect().map(r => (r.getLong(0), r.getLong(1)))
      }
      assert(got.length === got.toSet.size,
        s"width $w: anchor must emit each pair exactly once")
      assert(got.toSet === naive, s"width $w: wrong pair set")
    }
  }

  test("fires on the pure-overlap join: equi join appears, " +
    "nested loop disappears") {
    val a = intervals(50, 7)
    val b = intervals(50, 11)
    val off = withWidth("0") {
      overlapJoin(a, b).queryExecution.executedPlan.toString }
    assert(off.contains("NestedLoopJoin") || off.contains("Cartesian"),
      "without the rule this join has no equi shape")
    val on = withWidth("1024") {
      overlapJoin(a, b).queryExecution.executedPlan.toString }
    assert(!on.contains("NestedLoopJoin") && !on.contains("Cartesian"),
      "rule must remove the nested loop")
    assert(on.contains("SortMergeJoin") || on.contains("ShuffledHashJoin")
      || on.contains("BroadcastHashJoin"),
      "rule must introduce an equi join on the bin key")
  }

  test("leaves out-of-scope joins alone: extra equi conjunct, " +
    "non-long bounds, outer joins") {
    val a = intervals(50, 7).withColumn("k", col("id") % 5)
    val b = intervals(50, 11).withColumn("k", col("id") % 5)
    withWidth("1024") {
      // an equality conjunct → already hash-joinable → untouched
      val p1 = a.join(b, a("k") === b("k") && a("lo") < b("hi") &&
        b("lo") < a("hi")).queryExecution.optimizedPlan.toString
      assert(!p1.contains("__graft_bin"),
        "equi-keyed range conditions must not be rewritten")
      // double bounds are out of scope
      val ad = a.select(col("id"), col("lo").cast("double").as("lo"),
        col("hi").cast("double").as("hi"))
      val bd = b.select(col("id"), col("lo").cast("double").as("lo"),
        col("hi").cast("double").as("hi"))
      val p2 = overlapJoin(ad, bd).queryExecution.optimizedPlan.toString
      assert(!p2.contains("__graft_bin"))
      // outer join semantics are out of scope
      val p3 = a.join(b, a("lo") < b("hi") && b("lo") < a("hi"),
        "left_outer").queryExecution.optimizedPlan.toString
      assert(!p3.contains("__graft_bin"))
    }
  }

  test("point-in-interval containment (a degenerate overlap) also " +
    "fires and matches the nested loop") {
    // b.lo <= a.p < b.hi is overlap of [p, p] with [lo, hi): the left
    // side explodes to exactly ONE bin — the rule needs no special case
    val a = intervals(300, 7).select(col("id"), col("lo").as("p"))
    val b = intervals(40, 11)
    def joined = a.join(b, b("lo") <= a("p") && a("p") < b("hi"))
      .select(a("id").as("a_id"), b("id").as("b_id"))
    val naive = withWidth("0") {
      joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet }
    assert(naive.nonEmpty)
    withWidth("64") {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoopJoin") && !plan.contains("Cartesian"))
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size && got.toSet === naive)
    }
  }

  test("same-direction comparisons (skyline dominance shape) are " +
    "not an overlap and stay untouched") {
    val a = intervals(30, 7)
    val b = intervals(30, 11)
    withWidth("1024") {
      val p = a.join(b, a("lo") < b("lo") && a("hi") < b("hi"))
        .queryExecution.optimizedPlan.toString
      assert(!p.contains("__graft_bin"))
    }
  }
}
