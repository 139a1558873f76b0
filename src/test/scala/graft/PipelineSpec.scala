package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipelines.EventsPipeline
import graft.serving.ParquetKVSink
import graft.sources.JsonSource

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("medallion DAG resolves bronze→silver→gold→serving") {
    val reg = EventsPipeline.build(spark, d)
    assert(reg.topoOrder.head === "cleaned_events")
    val gold = reg.resolve("agg_events_24h_rolling")
    assert(gold.count() > 0)
    // densified: every (hour, type) cell exists
    val hours = gold.select("timestamp").distinct().count()
    val types = gold.select("event_type").distinct().count()
    assert(gold.count() === hours * types)
    // rolling sum never below the 1h value
    val bad = gold.filter(col("event_count_24h") < col("event_count")).count()
    assert(bad === 0)
  }

  test("serving_events writes through the parquet KV sink with unix timestamps") {
    val out = Files.createTempDirectory("kvsink").toString
    val served = EventsPipeline.serve(spark, d, new ParquetKVSink(out))
    assert(served.columns.contains("sortKey"))
    val back = spark.read.parquet(s"$out/serving_events")
    assert(back.count() === served.count())
    // timestamps converted to unix seconds (long), camelCase applied
    assert(back.schema("timestamp").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(back.columns.toSet.contains("eventCount24h"))
  }

  test("JsonSource discovers hive-partitioned landing-zone columns") {
    val dir = Files.createTempDirectory("jsonhive").toString
    val part = java.nio.file.Path.of(s"$dir/year=2024/month=01/day=05/hour=09")
    Files.createDirectories(part)
    Files.writeString(part.resolve("batch1.json"),
      """{"id":1,"v":1.5}
        |{"id":2,"v":2.5}""".stripMargin)
    val df = JsonSource.batch(spark, dir, "id bigint, v double")
    // partition columns come from the directory layout (transactions:77)
    assert(df.columns.toSet === Set("id", "v", "year", "month", "day", "hour"))
    val r = df.orderBy("id").collect()
    assert(r.map(_.getAs[Int]("hour")).toSeq === Seq(9, 9))
  }

  test("JsonSource round-trips a fixed-schema landing zone, batch and stream") {
    val dir = Files.createTempDirectory("jsonsrc").toString
    Files.writeString(java.nio.file.Path.of(s"$dir/part1.json"),
      """{"id":1,"ts":"2024-01-01T10:00:00Z","v":1.5}
        |{"id":2,"ts":"2024-01-01T11:00:00Z","v":2.5}""".stripMargin)
    val ddl = "id bigint, ts timestamp, v double"
    val b = JsonSource.batch(spark, dir, ddl)
    assert(b.count() === 2)
    val withParts = JsonSource.withDatePartitions(b, "ts")
    assert(withParts.select("hour_").collect().map(_.getString(0)).toSet
      === Set("10", "11"))
    // streaming read over the same landing zone
    val st = JsonSource.stream(spark, dir, ddl, maxFilesPerTrigger = 1)
    assert(st.isStreaming)
    val q = st.writeStream.format("memory").queryName("jsonsrc_t")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM jsonsrc_t").head().getLong(0) === 2)
    } finally q.stop()
  }

  // The reference's Amplitude ingest reads compressed landing zones via
  // a `*.json.gz` glob (zetadex-amplitude-events-pipeline.py:126–136):
  // nested export dirs, gzip codec resolved per file extension. Spark
  // handles the codec natively, but the glob+codec path must be
  // EXERCISED — a broken glob or a codec regression would otherwise
  // surface only in production.
  test("JsonSource ingests gzip-compressed nested landing zones, batch and stream") {
    import java.util.zip.GZIPOutputStream
    val dir = Files.createTempDirectory("jsongz").toString
    def writeGz(rel: String, lines: String): Unit = {
      val p = java.nio.file.Path.of(s"$dir/$rel")
      Files.createDirectories(p.getParent)
      val out = new GZIPOutputStream(Files.newOutputStream(p))
      try out.write(lines.getBytes("UTF-8")) finally out.close()
    }
    // the Amplitude export layout: <project>/<yyyy-MM>/<export>.json.gz
    writeGz("186037/2024-01/export_1.json.gz",
      """{"id":1,"v":1.5}
        |{"id":2,"v":2.5}""".stripMargin)
    writeGz("186037/2024-02/export_2.json.gz", """{"id":3,"v":3.5}""")
    val glob = s"$dir/*/*/*.json.gz"
    val ddl = "id bigint, v double"
    val b = JsonSource.batch(spark, glob, ddl)
    assert(b.select("id").collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
    // streaming over the same glob: each gz file is one unsplittable
    // unit (the codec is not seekable), picked up per micro-batch
    val st = JsonSource.stream(spark, glob, ddl, maxFilesPerTrigger = 1)
    assert(st.isStreaming)
    val q = st.writeStream.format("memory").queryName("jsongz_t")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT sum(id) FROM jsongz_t").head().getLong(0) === 6L)
    } finally q.stop()
  }

  test("JsonSource quarantines malformed records with the raw line intact") {
    val dir = Files.createTempDirectory("jsonbad").toString
    // BROKEN and "not json" set the corrupt-record slot; the blank line
    // and the literal `null` parse to a NULL struct with NO _cr flag —
    // they must quarantine too, not land as all-null clean rows
    Files.writeString(java.nio.file.Path.of(s"$dir/mixed.json"),
      """{"id":1,"v":1.5}
        |{"id":2,"v":BROKEN
        |{"id":3,"v":3.5}
        |
        |null
        |not json at all""".stripMargin)
    val (clean, corrupt) = JsonSource.batchWithQuarantine(
      spark, dir, "id bigint, v double")
    assert(clean.orderBy("id").collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
    assert(!clean.columns.contains("_corrupt_record"))
    val bad = corrupt.collect().map(_.getString(0)).sorted
    assert(bad.length === 4)
    assert(bad.exists(_.contains("BROKEN")), "raw line preserved for replay")
    assert(bad.exists(_.contains("not json at all")))
    assert(bad.contains("") && bad.contains("null"),
      "null-struct lines quarantine instead of passing as all-null rows")
  }

  test("JsonSource rescues undeclared fields instead of dropping them") {
    val dir = Files.createTempDirectory("jsonrescue").toString
    // producer starts emitting `extra` (scalar) and `meta` (object) fields
    // the declared DDL knows nothing about
    Files.writeString(java.nio.file.Path.of(s"$dir/evolved.json"),
      """{"id":1,"v":1.5}
        |{"id":2,"v":2.5,"extra":"x2","meta":{"k":7}}
        |{"id":3,"v":3.5,"extra":"x3"}""".stripMargin)
    val df = JsonSource.batchWithRescue(spark, dir, "id bigint, v double")
    assert(df.columns.toSeq === Seq("id", "v", "_rescued"))
    val rows = df.orderBy("id").collect()
    // old readers: declared columns parse exactly as before
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    // row 1 has no undeclared fields → rescue column is null, not {}
    assert(rows(0).isNullAt(2))
    val r2 = rows(1).getMap[String, String](2)
    assert(r2("extra") === "x2")
    assert(r2("meta").contains("7"), "nested objects rescued as JSON text")
    assert(rows(2).getMap[String, String](2).keySet === Set("extra"))
    // promoting a rescued field = widening the DDL; it leaves the map
    val widened = JsonSource.batchWithRescue(
      spark, dir, "id bigint, v double, extra string")
    val w = widened.orderBy("id").collect()
    assert(w(2).getString(2) === "x3")
    assert(w(1).getMap[String, String](3).keySet === Set("meta"))
    assert(w(2).isNullAt(3), "promoted field no longer rescued")
  }

  test("JsonSource rescues declared-field type mismatches and raw lines") {
    val dir = Files.createTempDirectory("jsonrescue2").toString
    // row 2: declared `v double` arrives as a non-numeric string —
    // PERMISSIVE parsing nulls the field; the raw text must survive in
    // the rescue map instead of vanishing. row 3: legitimate JSON null
    // is NOT a mismatch. row 4: unparseable line → whole line under _raw.
    Files.writeString(java.nio.file.Path.of(s"$dir/drift.json"),
      """{"id":1,"v":1.5}
        |{"id":2,"v":"oops"}
        |{"id":3,"v":null}
        |garbage line""".stripMargin)
    val rows = JsonSource.batchWithRescue(spark, dir, "id bigint, v double")
      .orderBy("id").collect()
    assert(rows.length === 4)
    // nulls-first ascending: rows(0) is the unparseable line
    assert(rows(0).isNullAt(0))
    assert(rows(0).getMap[String, String](2)("_raw") === "garbage line")
    val byId = rows.filter(!_.isNullAt(0)).map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getDouble(1) === 1.5 && byId(1L).isNullAt(2),
      "clean row: nothing rescued")
    assert(byId(2L).isNullAt(1), "type mismatch nulls the declared field")
    assert(byId(2L).getMap[String, String](2)("v") === "oops",
      "...but the raw text survives in the rescue map")
    assert(byId(3L).isNullAt(1) && byId(3L).isNullAt(2),
      "explicit JSON null is a legitimate value, nothing rescued")
  }

  test("IncrementalIngest processes each landing-zone file exactly once") {
    import graft.sources.{DirectoryListing, IncrementalIngest, NotifiedFiles}
    val zone = Files.createTempDirectory("ingestzone").toString
    val ledger = s"$zone/_ledger/processed.txt"
    Files.writeString(java.nio.file.Path.of(s"$zone/a.json"), """{"id":1}""")
    Files.writeString(java.nio.file.Path.of(s"$zone/b.json"), """{"id":2}""")
    val listing = new DirectoryListing(zone)
    var seen = Vector.empty[Long]
    def ingest(): Seq[String] =
      IncrementalIngest.runOnce(spark, listing, "id bigint", ledger) { df =>
        seen ++= df.collect().map(_.getLong(0))
      }
    assert(ingest().size === 2)
    assert(seen.sorted === Vector(1L, 2L))
    // nothing new → write not called
    assert(ingest().isEmpty && seen.size === 2)
    // a new file arrives: ONLY it is read (O(new), not a re-read)
    Files.writeString(java.nio.file.Path.of(s"$zone/c.json"), """{"id":3}""")
    assert(ingest() === Seq(s"$zone/c.json"))
    assert(seen.sorted === Vector(1L, 2L, 3L))
    // the notification-driven implementation plugs into the same seam:
    // discovery cost is O(drained paths), independent of zone size
    val buf = scala.collection.mutable.Queue[String](s"$zone/a.json")
    val notified = new NotifiedFiles(() => buf.dequeueAll(_ => true).toSeq)
    val ledger2 = s"$zone/_ledger2/processed.txt"
    var n = 0L
    IncrementalIngest.runOnce(spark, notified, "id bigint", ledger2) { df =>
      n = df.count()
    }
    assert(n === 1L)
    // queue drained → next trigger sees nothing, no listing ever happens
    assert(IncrementalIngest.runOnce(spark, notified, "id bigint", ledger2)(
      _ => fail("write must not be called with no new files")).isEmpty)
  }

  test("IncrementalIngest re-delivers a notified batch whose write crashed") {
    import graft.sources.{IncrementalIngest, NotifiedFiles}
    val zone = Files.createTempDirectory("ingestcrash").toString
    val ledger = s"$zone/_ledger/processed.txt"
    Files.writeString(java.nio.file.Path.of(s"$zone/a.json"), """{"id":1}""")
    Files.writeString(java.nio.file.Path.of(s"$zone/b.json"), """{"id":2}""")
    // one-shot queue: the drain destroys the paths — exactly the case
    // where a crashed write used to lose files silently
    val buf = scala.collection.mutable.Queue[String](
      s"$zone/a.json", s"$zone/b.json")
    val notified = new NotifiedFiles(() => buf.dequeueAll(_ => true).toSeq)
    intercept[RuntimeException] {
      IncrementalIngest.runOnce(spark, notified, "id bigint", ledger) { _ =>
        throw new RuntimeException("sink down")
      }
    }
    assert(buf.isEmpty, "queue really is drained — no re-notification")
    // next trigger: the pending journal re-delivers both paths
    var seen = Vector.empty[Long]
    val redelivered =
      IncrementalIngest.runOnce(spark, notified, "id bigint", ledger) { df =>
        seen = df.collect().map(_.getLong(0)).toVector.sorted
      }
    assert(redelivered.map(_.split('/').last).sorted === Seq("a.json", "b.json"))
    assert(seen === Vector(1L, 2L))
    // and once ledgered, a third trigger is a no-op
    assert(IncrementalIngest.runOnce(spark, notified, "id bigint", ledger)(
      _ => fail("must not reprocess")).isEmpty)
  }
}
