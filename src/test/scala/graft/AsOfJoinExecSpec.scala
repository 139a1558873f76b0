package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOf

/** The physical as-of operator (plans/AsOfJoinExec) against a
  * composed reference implementation, plus the plan-shape contract
  * that justifies its existence: one exchange per side, no window, no
  * nested loop, O(1) state in the merge.
  */
class AsOfJoinExecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** trades: (sym, t, qty); quotes: (sym, t, px). Quote times collide
    * with trade times (ties must match: rTime ≤ lTime is inclusive),
    * some symbols have no quotes at all, some trades precede every
    * quote. */
  private def trades: DataFrame =
    spark.range(400).select(
      concat(lit("S"), col("id") % 7).as("sym"),
      ((col("id") * 37) % 1000).as("t"),
      col("id").as("qty"))

  private def quotes: DataFrame =
    spark.range(150).select(
      concat(lit("S"), col("id") % 5).as("qsym"), // S5, S6 quoteless
      ((col("id") * 91) % 1000).as("qt"),
      (col("id") * 10).as("px"))

  /** Reference: inequality join + row_number top-1 (the composed form
    * the operator replaces). */
  private def composed(l: DataFrame, r: DataFrame): Set[(String, Long, Long, Option[Long])] = {
    val cand = l.join(r, l("sym") === r("qsym") && r("qt") <= l("t"), "left")
    val w = Window.partitionBy(l("sym"), l("t"), l("qty"))
      .orderBy(r("qt").desc_nulls_last)
    cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(l("sym"), l("t"), l("qty"), r("px")).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) None else Some(x.getLong(3)))).toSet
  }

  test("merge-scan as-of equals the composed inequality-join+top-1, " +
    "including quoteless keys and pre-first-quote trades") {
    val l = trades.cache(); val r = quotes.cache()
    val got = AsOf.joinAsOf(l, r, Seq(l("sym") -> r("qsym")),
      l("t"), r("qt"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(5)) None else Some(x.getLong(5)))).toSet
    val want = composed(l, r)
    assert(got === want)
    assert(got.exists(_._4.isEmpty), "quoteless keys must survive with nulls")
    assert(got.exists(_._4.nonEmpty), "matches must exist")
  }

  test("exact-tie quotes match (rTime ≤ lTime is inclusive) and the " +
    "LATEST of several candidates wins") {
    val l = Seq(("A", 10L, 1L)).toDF("sym", "t", "qty")
    val r = Seq(("A", 5L, 50L), ("A", 10L, 100L), ("A", 11L, 110L))
      .toDF("qsym", "qt", "px")
    val out = AsOf.joinAsOf(l, r, Seq(l("sym") -> r("qsym")),
      l("t"), r("qt")).collect()
    assert(out.length === 1 && out.head.getLong(5) === 100L)
  }

  test("plan shape: one exchange + sort per side, no window, " +
    "no nested loop — the operator IS the join") {
    val l = trades; val r = quotes
    val plan = AsOf.joinAsOf(l, r, Seq(l("sym") -> r("qsym")),
      l("t"), r("qt")).queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinExec") || plan.contains("AsOfJoin"),
      s"custom operator missing from plan:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("NestedLoop"),
      "the physical operator must replace the window/top-1 machinery")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2,
      "exactly one key shuffle per side")
  }
}
