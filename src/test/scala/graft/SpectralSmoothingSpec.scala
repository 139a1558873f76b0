package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Catalog

/** Structural armor for the round-13 analytic additions that the oracle
  * gate checks on one dataset: the Walsh basis identity, the Brown fold
  * against a plain-Scala replay, and the k-core peel against an
  * independent in-memory peeler — all at sf0.001 so the suite stays
  * fast.
  */
class SpectralSmoothingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def synth(docId: Long, i: Int): Long =
    ((docId % 65536) * 11 + ((i.toLong * i) % 65536) * 17) % 65536 - 32768

  test("Walsh basis: full-spectrum Parseval holds exactly (integer)") {
    // the query probes 8 bands; the basis claim behind its bessel_ok
    // column is Parseval over the COMPLETE basis — check it exhaustively
    // for several ids with plain integer arithmetic
    for (id <- Seq(1L, 7L, 123L, 65535L)) {
      val s = Array.tabulate(256)(i => synth(id, i))
      val energy = s.map(x => x * x).sum
      var total = 0L
      var k = 0
      while (k < 256) {
        var w = 0L
        var i = 0
        while (i < 256) {
          val sign = 1 - 2 * (java.lang.Long.bitCount((i & k).toLong) % 2)
          w += s(i) * sign
          i += 1
        }
        total += w * w
        k += 1
      }
      assert(total === 256L * energy, s"Parseval failed for id=$id")
    }
  }

  test("q272 bessel_ok holds on every row at sf0.001") {
    val df = Catalog.byName("q272_walsh_spectrum").run(spark, sf)
    assert(df.filter(!col("bessel_ok")).count() === 0)
  }

  test("q271 Brown fold equals a plain-Scala replay of the recurrence") {
    val hourly = graft.tables.Tables.load(spark, sf, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("x"))
      .orderBy("event_type", "hr")
      .collect()
      .groupBy(_.getString(0))
    val expect = hourly.map { case (et, rows) =>
      val xs = rows.map(_.getLong(2))
      var s = xs.head; var s2 = xs.head
      xs.tail.foreach { x =>
        s = (x + s) / 2
        s2 = (s + s2) / 2
      }
      et -> ((xs.length.toLong, s, s2))
    }
    val got = Catalog.byName("q271_brown_smoothing").run(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expect)
    // and the derived forecast columns are the alpha=1/2 Brown identities
    val row = Catalog.byName("q271_brown_smoothing").run(spark, sf)
      .collect().head
    val (s, s2) = (row.getLong(2), row.getLong(3))
    assert(row.getLong(4) === 2 * s - s2)      // level
    assert(row.getLong(5) === s - s2)          // trend
    assert(row.getLong(6) === 3 * s - 2 * s2)  // level + 1*trend
    assert(row.getLong(7) === 5 * s - 4 * s2)  // level + 3*trend
  }

  test("q274 equals an independent in-memory 6-round peeler") {
    val pairs = graft.tables.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(graft.tables.Tables.load(spark, sf, "orders")
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("c"),
        concat(lit("s"), col("l_suppkey")).as("sp"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
    var edges: Set[(String, String)] =
      pairs.flatMap(p => Seq(p, p.swap)).toSet
    // adaptive K = floor(E / 2N), mirroring the query (distinct srcs =
    // node count: the edge set is symmetric)
    val nNodes = edges.map(_._1).toSet.size
    val k = edges.size / (2 * nNodes)
    for (_ <- 1 to 6) {
      val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= k).keySet
      edges = edges.filter(e => keep(e._1) && keep(e._2))
    }
    val expect = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = Catalog.byName("q274_kcore").run(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expect)
  }
}
