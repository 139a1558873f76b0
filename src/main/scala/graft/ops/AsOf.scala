package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

import graft.plans.AsOfJoinPlan

/** User API for the physical as-of join (plans/AsOfJoinPlan →
  * AsOfJoinExec). Columns must be frame-qualified (`left("k")`), so
  * their expressions are already resolved against the two inputs; the
  * logical node is built on the ANALYZED child plans and needs no
  * analyzer support.
  */
object AsOf {

  /** Left-outer as-of: every left row joined to the LATEST right row
    * with `rightTime ≤ leftTime` sharing the key, nulls when none.
    * Time columns must be LongType epochs; key column types must match
    * positionally. */
  def joinAsOf(left: DataFrame, right: DataFrame,
               keys: Seq[(Column, Column)],
               leftTime: Column, rightTime: Column): DataFrame = {
    import org.apache.spark.sql.graft.GraftSql.{expression, ofRows}
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    ofRows(left.sparkSession,
      AsOfJoinPlan(lp, rp,
        keys.map(k => expression(k._1)), keys.map(k => expression(k._2)),
        expression(leftTime), expression(rightTime)))
  }
}
