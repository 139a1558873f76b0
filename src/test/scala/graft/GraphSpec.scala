package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{Registry, TableDef}

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("registry resolves a diamond DAG, planning shared nodes once") {
    val sp = spark
    import sp.implicits._
    val reg = new Registry(sp)
    var baseLoads = 0
    reg.source("base", () => { baseLoads += 1; Seq(1, 2, 3).toDF("x") })
    reg.register(TableDef("l", Seq("base"), ds => ds.head.withColumn("y", $"x" * 2)))
    reg.register(TableDef("r", Seq("base"), ds => ds.head.withColumn("z", $"x" + 10)))
    reg.register(TableDef("top", Seq("l", "r"),
      ds => ds(0).join(ds(1), "x")))
    assert(reg.resolve("top").count() === 3)
    assert(baseLoads === 1)
  }

  test("registry detects cycles") {
    val reg = new Registry(spark)
    reg.register(TableDef("a", Seq("b"), ds => ds.head))
    reg.register(TableDef("b", Seq("a"), ds => ds.head))
    intercept[IllegalStateException] { reg.resolve("a") }
  }

  test("topoOrder respects dependencies") {
    val sp = spark
    import sp.implicits._
    val reg = new Registry(sp)
    reg.register(TableDef("c", Seq("b"), ds => ds.head))
    reg.register(TableDef("a", Seq(), _ => Seq(1).toDF("x")))
    reg.register(TableDef("b", Seq("a"), ds => ds.head))
    val order = reg.topoOrder
    assert(order.indexOf("a") < order.indexOf("b"))
    assert(order.indexOf("b") < order.indexOf("c"))
  }
}
