package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (sessions are expensive;
  * specs must not stop() it). */
object TestSpark {
  lazy val spark: SparkSession = graft.core.GraftSession.local(4)
  val sf0001 = "/root/testdata/sf0.001"
}
