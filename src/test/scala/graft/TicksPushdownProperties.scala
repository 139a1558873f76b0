package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** Generative armor for graft-ticks' filter pushdown: ANY stack of
  * range/equality predicates on tick_id (including contradictory and
  * fully-out-of-range ones) must return exactly what the same
  * predicates return when the connector is NOT allowed to see them —
  * pushdown may never change results, only skip generation.
  */
object TicksPushdownProperties extends Properties("graft.tickspushdown") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = TestSpark.spark
  private val ROWS = 2000L

  private sealed trait P { def sql: String; def keep(id: Long): Boolean }
  private case class Ge(v: Long) extends P {
    def sql = s"tick_id >= $v"; def keep(id: Long) = id >= v }
  private case class Gt(v: Long) extends P {
    def sql = s"tick_id > $v"; def keep(id: Long) = id > v }
  private case class Le(v: Long) extends P {
    def sql = s"tick_id <= $v"; def keep(id: Long) = id <= v }
  private case class Lt(v: Long) extends P {
    def sql = s"tick_id < $v"; def keep(id: Long) = id < v }
  private case class Eq(v: Long) extends P {
    def sql = s"tick_id = $v"; def keep(id: Long) = id == v }

  private val predGen: Gen[P] = for {
    v <- Gen.choose(-100L, ROWS + 100L) // includes out-of-range bounds
    p <- Gen.oneOf[Long => P](Ge.apply _, Gt.apply _, Le.apply _,
      Lt.apply _, Eq.apply _)
  } yield p(v)

  property("any predicate stack: pushed result == brute-force result") =
    Prop.forAll(Gen.listOfN(3, predGen), Gen.choose(1, 6)) { (ps, parts) =>
      val df = spark.read.format("graft-ticks")
        .option("rows", ROWS).option("parts", parts).load()
        .filter(ps.map(_.sql).mkString(" AND "))
      val got = df.select("tick_id").collect().map(_.getLong(0)).sorted
      val expect = (0L until ROWS)
        .filter(id => ps.forall(_.keep(id))).toArray
      got.sameElements(expect)
    }
}
