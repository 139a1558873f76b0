package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.tables.Bucketing

/** Co-located join via bucketing: same key, same bucket count → join
  * plans with zero shuffle exchanges. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed fact-fact join has no shuffle exchange") {
    val d = TestSpark.sf0001
    // disable broadcast so the join strategy decision is about shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        graft.tables.Tables.load(spark, d, "lineitem"),
        "b_lineitem", "l_orderkey", 8, sortCols = Seq("l_orderkey"))
      Bucketing.writeBucketed(
        graft.tables.Tables.load(spark, d, "orders"),
        "b_orders", "o_orderkey", 8, sortCols = Seq("o_orderkey"))
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan)
        .size
      // the join itself must be exchange-free (the final groupBy may
      // still shuffle on its own key)
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join should not reshuffle its inputs:\n$plan")
      assert(joined.count() === 5) // one row per order priority
      assert(joined.agg(sum("q")).head().getDouble(0) === 152257.0)
      assert(exchanges <= 1) // only the aggregation's shuffle
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("mismatched bucket counts fall back to a correct join") {
    // the one layout-DEPENDENT operator's failure mode: if the two
    // sides were bucketed at different counts (a re-layout half-applied,
    // or two teams picking different counts), Spark must NOT zip buckets
    // positionally — it either shuffles a side or coalesces buckets, and
    // the RESULT must equal the plain unbucketed join bit-for-bit
    val d = TestSpark.sf0001
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        graft.tables.Tables.load(spark, d, "lineitem"),
        "b8_lineitem", "l_orderkey", 8, sortCols = Seq("l_orderkey"))
      Bucketing.writeBucketed(
        graft.tables.Tables.load(spark, d, "orders"),
        "b16_orders", "o_orderkey", 16, sortCols = Seq("o_orderkey"))
      val bucketed = spark.table("b8_lineitem")
        .join(spark.table("b16_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
        .orderBy("o_orderpriority")
      val plain = graft.tables.Tables.load(spark, d, "lineitem")
        .join(graft.tables.Tables.load(spark, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
        .orderBy("o_orderpriority")
      assert(bucketed.collect().toSeq === plain.collect().toSeq,
        "mismatched bucket counts must degrade to a correct join, " +
          "never to positionally-zipped buckets")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b8_lineitem")
      spark.sql("DROP TABLE IF EXISTS b16_orders")
    }
  }
}
