package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Conf
import graft.serving.{ParquetKVSink, ServingJobs}

class ServingJobsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(s: String) = Timestamp.valueOf(s)

  test("serveSnapshot: as-of hour filter, ALL rollup, unpivot, KV write") {
    val sp = spark
    import sp.implicits._
    val gold = Seq(
      (ts("2024-01-30 10:00:00"), "SOL", 100.0, 10.0),
      (ts("2024-01-30 10:00:00"), "ETH", 50.0, 5.0),
      (ts("2024-01-30 09:00:00"), "SOL", 999.0, 99.0)) // wrong hour, dropped
      .toDF("timestamp", "asset", "volume", "fees")
    val conf = Conf(Instant.parse("2024-01-30T12:00:00Z"))
    val out = Files.createTempDirectory("servejobs").toString
    val served = ServingJobs.serveSnapshot(gold, "timestamp", "asset",
      Seq("volume", "fees"), conf, new ParquetKVSink(out), "leaderboard")
    val rows = served.collect()
      .map(r => (r.getAs[String]("asset"), r.getAs[String]("metric")) ->
        r.getAs[Double]("value")).toMap
    assert(rows(("SOL", "volume")) === 100.0)
    assert(rows(("ALL", "volume")) === 150.0)
    assert(rows(("ALL", "fees")) === 15.0)
    assert(rows.size === 6) // 3 asset buckets x 2 metrics
    val back = spark.read.parquet(s"$out/leaderboard")
    assert(back.count() === 6)
    assert(back.columns.contains("ttl"))
    // ttl = snapshot + 14 days in unix seconds
    val snapSecs = Instant.parse("2024-01-30T12:00:00Z").getEpochSecond
    assert(back.select("ttl").head().getLong(0) === snapSecs + 14 * 86400)
  }

  test("serveFunding snapshots asOf-2h with the composite sort key") {
    val sp = spark
    import sp.implicits._
    val gold = Seq(
      (ts("2024-01-30 10:00:00"), "SOL", "authA", 1.5),
      (ts("2024-01-30 09:00:00"), "SOL", "authA", 9.9)) // wrong hour
      .toDF("timestamp", "asset", "authority", "balance_change")
    val conf = Conf(Instant.parse("2024-01-30T12:00:00Z"))
    val out = Files.createTempDirectory("servefund").toString
    val served = ServingJobs.serveFunding(gold, conf,
      new ParquetKVSink(out), "funding")
    val rows = served.collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("timestamp#asset")
      === s"${ts("2024-01-30 10:00:00").getTime / 1000}#SOL")
    assert(rows.head.getAs[Double]("balanceChange") === 1.5)
  }

  test("serveLeaderboard: one-pass 11-way period unpivot, no Union in plan") {
    val sp = spark
    import sp.implicits._
    // q68-shaped single-account snapshot with distinct per-period values
    val periods = Seq("24h", "7d", "30d", "alltime")
    val row = (Seq[Any](ts("2024-01-30 12:00:00"), 7L, 1.1) ++
      periods.zipWithIndex.flatMap { case (_, i) =>
        Seq[Any](10.0 + i, 0.1 + i, 100.0 + i, 1.0 + i, 5.0 + i, 6.0 + i)
      } ++ Seq[Any](1, 2, 3, 4, 5, 6, 7, -1, -2, -3, -4, -5, -6, -7,
        11, 12, 13, 14, -11, -12, -13, -14)).toArray
    val cols = Seq("timestamp", "user_id", "z_multiplier_nft") ++
      periods.flatMap(p => Seq(s"pnl_$p", s"roi_$p", s"z_score_$p",
        s"z_multiplier_$p", s"maker_volume_$p", s"taker_volume_$p")) ++
      Seq("pnl_24h_rank", "pnl_7d_rank", "pnl_30d_rank", "pnl_alltime_rank",
        "roi_24h_rank", "roi_7d_rank", "roi_30d_rank",
        "pnl_24h_rank_change", "pnl_7d_rank_change", "pnl_30d_rank_change",
        "pnl_alltime_rank_change", "roi_24h_rank_change",
        "roi_7d_rank_change", "roi_30d_rank_change",
        "z_score_24h_rank", "z_score_7d_rank", "z_score_30d_rank",
        "z_score_alltime_rank", "z_score_24h_rank_change",
        "z_score_7d_rank_change", "z_score_30d_rank_change",
        "z_score_alltime_rank_change")
    val schema = org.apache.spark.sql.types.StructType(cols.map {
      case "timestamp" => org.apache.spark.sql.types.StructField(
        "timestamp", org.apache.spark.sql.types.TimestampType)
      case "user_id" => org.apache.spark.sql.types.StructField(
        "user_id", org.apache.spark.sql.types.LongType)
      case c if c.endsWith("_rank") || c.endsWith("_rank_change") =>
        org.apache.spark.sql.types.StructField(
          c, org.apache.spark.sql.types.IntegerType)
      case c => org.apache.spark.sql.types.StructField(
        c, org.apache.spark.sql.types.DoubleType)
    })
    val gold = sp.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(row: _*)), schema)
    val conf = Conf(Instant.parse("2024-01-30T12:00:00Z"))
    val out = Files.createTempDirectory("serveleader").toString
    val served = ServingJobs.serveLeaderboard(gold, conf,
      new ParquetKVSink(out), "leaderboard_v2")
    val rows = served.collect()
    assert(rows.length === 11, "3 metrics x 4 periods minus roi#alltime")
    val byKey = rows.map(r =>
      r.getAs[String]("metric#timePeriod") -> r).toMap
    assert(byKey("PNL#TWENTY_FOUR_HOURS").getAs[Int]("rank") === 1)
    assert(byKey("ROI#SEVEN_DAYS").getAs[Int]("rank") === 6)
    assert(byKey("Z_SCORE#ALL_TIME").getAs[Int]("rankChange") === -14)
    assert(byKey("PNL#ALL_TIME").isNullAt(
      byKey("PNL#ALL_TIME").fieldIndex("roi")), "no alltime roi")
    assert(byKey("PNL#SEVEN_DAYS").getAs[Double]("pnl") === 11.0)
    // the reference's union loop rescans 11x; the one-pass explode must
    // produce a plan without any Union node
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), "one pass, not a union loop")
  }

  test("servePnlSnapshots: hourly with 2-week TTL, daily keeps midnight only " +
    "(S2:572–611)") {
    val sp = spark
    import sp.implicits._
    val pnl = Seq(
      (ts("2024-01-30 00:00:00"), "authA", 100.0, 5.0, 105.0, 3.0),
      (ts("2024-01-30 12:00:00"), "authA", 110.0, -5.0, 105.0, 1.5),
      (ts("2024-01-30 12:00:00"), "authB", 50.0, 0.0, 50.0, 0.0),
      (ts("2024-01-30 11:00:00"), "authA", 999.0, 0.0, 999.0, 9.9)) // wrong hr
      .toDF("timestamp", "authority", "balance", "unrealized_pnl",
        "equity", "cumulative_pnl")
    val conf = Conf(Instant.parse("2024-01-30T12:00:00Z"))
    val out = Files.createTempDirectory("servepnl").toString
    val served = ServingJobs.servePnlSnapshots(pnl, conf,
      new ParquetKVSink(out), "cleaned_pnl")
    // snapshot = the as-of hour only
    assert(served.collect().map(_.getAs[String]("authority")).sorted
      === Array("authA", "authB"))
    assert(served.columns.toSeq === Seq("timestamp", "authority", "balance",
      "unrealizedPnl", "equity", "cumulativePnl"))
    val hourly = spark.read.parquet(s"$out/cleaned_pnl_hourly_v2")
    assert(hourly.count() === 2)
    val snapSecs = ts("2024-01-30 12:00:00").getTime / 1000
    assert(hourly.select("ttl").head().getLong(0) === snapSecs + 14 * 86400)
    // daily keeps only hour-0 snapshots: the 12:00 as-of hour has none
    val daily = spark.read.parquet(s"$out/cleaned_pnl_daily_v2")
    assert(daily.count() === 0)
    assert(!daily.columns.contains("ttl"), "daily history never expires")
    // at midnight as-of, the daily table retains the row
    val confMidnight = Conf(Instant.parse("2024-01-30T00:00:00Z"))
    ServingJobs.servePnlSnapshots(pnl, confMidnight,
      new ParquetKVSink(out), "cleaned_pnl")
    assert(spark.read.parquet(s"$out/cleaned_pnl_daily_v2").count() === 1)
  }

  test("serveTable: whole-table camelCase push (fee_tiers / referral rewards)") {
    val sp = spark
    import sp.implicits._
    val tiers = Seq(("authA", ts("2024-01-30 10:00:00"), 123456.0, 1))
      .toDF("authority", "block_time", "volume_30d", "fee_tier")
    val out = Files.createTempDirectory("servetable").toString
    val served = ServingJobs.serveTable(tiers, new ParquetKVSink(out),
      "fee_tiers", hashKey = "authority", rangeKey = Some("blockTime"))
    assert(served.columns.toSeq ===
      Seq("authority", "blockTime", "volume30d", "feeTier"))
    val back = spark.read.parquet(s"$out/fee_tiers")
    // timestamps serve as unix seconds (numeric sort key)
    assert(back.select("blockTime").head().getLong(0)
      === ts("2024-01-30 10:00:00").getTime / 1000)
  }

  test("serveAllTimeStats folds in the historical backfill constants") {
    val sp = spark
    import sp.implicits._
    val hourly = Seq(("SOL", 10.0, 2L), ("ETH", 5.0, 1L))
      .toDF("asset", "volume", "trade_count")
    val out = Files.createTempDirectory("servestats").toString
    val served = ServingJobs.serveAllTimeStats(hourly, "volume",
      "trade_count", baseVolume = 455316870.8536678, baseCount = 200322L,
      new ParquetKVSink(out), "stats")
    val r = served.head()
    assert(r.getAs[Double]("totalVolume") === 455316870.8536678 + 15.0)
    assert(r.getAs[Long]("totalCount") === 200325L)
  }

  // ---- KV control plane (KVTableSpec — zetadex-serving.py:40–175) ----

  test("KVTableSpec renders the reference create-table request shape") {
    val sp = spark
    import sp.implicits._
    import graft.serving.KVTableSpec
    import graft.serving.KVTableSpec._
    val df = Seq((1L, 100L, "a", 5L, 1.5))
      .toDF("id", "timestamp", "gsi_hash_key", "lsi_range_key", "v")
    val spec = KVTableSpec("served", hashKey = "id",
      rangeKey = Some("timestamp"),
      lsis = Seq(Lsi("LSIName", "lsi_range_key")),
      gsis = Seq(Gsi("GSIName", "gsi_hash_key", Some("timestamp"),
        readCapacityUnits = Some(5), writeCapacityUnits = Some(5))),
      ttlAttribute = Some("timestamp"))
    val json = spec.createTableParams(df.schema)
    // attribute types derive from the ACTUAL schema; definitions are
    // deduplicated in first-reference order (the reference assembles
    // the same list imperatively, zetadex-serving.py:63–139)
    assert(json.contains(
      """"AttributeDefinitions":[{"AttributeName":"id","AttributeType":"N"},""" +
        """{"AttributeName":"timestamp","AttributeType":"N"},""" +
        """{"AttributeName":"lsi_range_key","AttributeType":"N"},""" +
        """{"AttributeName":"gsi_hash_key","AttributeType":"S"}]"""))
    assert(json.contains(
      """"KeySchema":[{"AttributeName":"id","KeyType":"HASH"},{"AttributeName":"timestamp","KeyType":"RANGE"}]"""))
    assert(json.contains(""""BillingMode":"PAY_PER_REQUEST""""))
    assert(json.contains(""""IndexName":"LSIName""""))
    assert(json.contains(
      """"ProvisionedThroughput":{"ReadCapacityUnits":5,"WriteCapacityUnits":5}"""))
    assert(json.contains(
      """"TimeToLiveSpecification":{"AttributeName":"timestamp","Enabled":true}"""))
  }

  test("KVTableSpec validation fails fast on bad key schemas") {
    val sp = spark
    import sp.implicits._
    import graft.serving.KVTableSpec
    import graft.serving.KVTableSpec._
    val df = Seq((1L, ts("2024-01-01 00:00:00"), Seq(1, 2)))
      .toDF("id", "observed_at", "tags")
    // missing column
    assertThrows[IllegalArgumentException](
      KVTableSpec("t", "nope").validate(df.schema))
    // raw temporal key: must go through servingProjection first
    assertThrows[IllegalArgumentException](
      KVTableSpec("t", "id", rangeKey = Some("observed_at"))
        .validate(df.schema))
    // non-scalar key
    assertThrows[IllegalArgumentException](
      KVTableSpec("t", "tags").validate(df.schema))
    // INCLUDE without attributes — the reference raises KeyError here
    assertThrows[IllegalArgumentException](
      KVTableSpec("t", "id",
        gsis = Seq(Gsi("g", "id", projection = ProjectInclude(Nil))))
        .validate(df.schema))
    // ...and after servingProjection the temporal key becomes valid
    val projected = new ParquetKVSink("/tmp/unused").servingProjection(df)
    KVTableSpec("t", "id", rangeKey = Some("observed_at"))
      .validate(projected.schema)
  }

  test("writeWithSpec materializes the table and every index dataset") {
    val sp = spark
    import sp.implicits._
    import graft.serving.KVTableSpec
    import graft.serving.KVTableSpec._
    val base = Files.createTempDirectory("kvspec").toString
    val df = Seq(
      (1L, 10L, "us", 5L, 1.5), (1L, 20L, "eu", 3L, 2.5),
      (2L, 10L, "us", 9L, 3.5)).toDF("id", "timestamp", "region", "score", "v")
    val spec = KVTableSpec("served", "id", Some("timestamp"),
      lsis = Seq(Lsi("byScore", "score", ProjectKeysOnly)),
      gsis = Seq(Gsi("byRegion", "region", Some("timestamp"),
        ProjectInclude(Seq("v")))))
    new ParquetKVSink(base).writeWithSpec(df, spec)
    assert(sp.read.parquet(s"$base/served").count() === 3)
    // LSI: keys-only projection = table keys + index range key
    val lsi = sp.read.parquet(s"$base/served__lsi_byScore")
    assert(lsi.columns.toSet === Set("id", "timestamp", "score"))
    // GSI: INCLUDE projection = table keys + index keys + named attrs
    val gsi = sp.read.parquet(s"$base/served__gsi_byRegion")
    assert(gsi.columns.toSet === Set("id", "timestamp", "region", "v"))
    assert(gsi.count() === 3)
  }

  // ---- Embedded KV data plane (round-12: the last unexercised
  // reference surface — a real store shape behind the sink) ----

  test("embedded KV: batch-25 chunking — write count is ceil(n/25)") {
    val sp = spark
    import sp.implicits._
    import graft.serving.{EmbeddedKVSink, EmbeddedKVStore}
    val id = "kv_batch25"
    EmbeddedKVStore.remove(id)
    // ONE hash key → one task writes all rows → request count is
    // exactly ceil(103/25) = 5 (multi-key writes chunk per task)
    val n = 103
    val df = (1 to n).map(i => ("acct", i.toLong, i * 1.5))
      .toDF("account", "seq", "value")
    new EmbeddedKVSink(id).write(df, "pnl", "account", Some("seq"))
    val store = EmbeddedKVStore(id)
    assert(store.itemCount("pnl") === n.toLong)
    assert(store.itemWriteCount("pnl") === n.toLong)
    assert(store.batchWriteCount("pnl") === ((n + 24) / 25).toLong,
      "bulk push must chunk at the BatchWriteItem limit of 25")
    // the store itself enforces the limit (the client must chunk)
    val over = (1 to 26).map(i => Map[String, Any](
      "account" -> "x", "seq" -> i.toLong)).toSeq
    val e = intercept[IllegalArgumentException] {
      store.batchWrite("pnl", over)
    }
    assert(e.getMessage.contains("25"))
  }

  test("embedded KV: point lookup by (hash, range) round-trips a " +
      "served table; query(hash) sorts numerically by range key") {
    val sp = spark
    import sp.implicits._
    import graft.serving.{EmbeddedKVSink, EmbeddedKVStore}
    val id = "kv_serve_gate"
    EmbeddedKVStore.remove(id)
    val gold = Seq(
      (ts("2024-01-30 10:00:00"), "SOL", 100.0, 10.0),
      (ts("2024-01-30 10:00:00"), "ETH", 50.0, 5.0),
      (ts("2024-01-30 09:00:00"), "SOL", 999.0, 99.0)) // wrong hour
      .toDF("timestamp", "asset", "volume", "fees")
    val conf = Conf(Instant.parse("2024-01-30T12:00:00Z"))
    val sink = new EmbeddedKVSink(id)
    val served = ServingJobs.serveSnapshot(gold, "timestamp", "asset",
      Seq("volume", "fees"), conf, sink, "leaderboard")
    val store = EmbeddedKVStore(id)
    assert(store.itemCount("leaderboard") === 6L)
    // EVERY served row must read back by its full primary key with its
    // payload intact — the SV:190–234 point-lookup contract
    served.collect().foreach { r =>
      val item = store.get("leaderboard", r.getAs[String]("metric"),
        Some(r.getAs[String]("sortKey"))).getOrElse(
        fail(s"point lookup missed ${r.getAs[String]("sortKey")}"))
      assert(item("value") === r.getAs[Double]("value"))
      assert(item("asset") === r.getAs[String]("asset"))
    }
    assert(store.get("leaderboard", "volume", Some("no#such#key")).isEmpty)
    // item collection: one hash key, range-sorted — with a NUMERIC
    // range key, 2 must sort before 10 (a string sort would invert)
    EmbeddedKVStore.remove("kv_numsort")
    val numSink = new EmbeddedKVSink("kv_numsort")
    numSink.write(Seq(("acct", 10L, "late"), ("acct", 2L, "early"))
      .toDF("account", "seq", "tag"), "hist", "account", Some("seq"))
    val hist = EmbeddedKVStore("kv_numsort").query("hist", "acct")
    assert(hist.map(_("tag")) === Seq("early", "late"),
      "number range keys must sort numerically, not lexicographically")
  }

  test("embedded KV: PutItem upsert is last-write-wins; lookups " +
      "validate the key schema") {
    val sp = spark
    import sp.implicits._
    import graft.serving.{EmbeddedKVSink, EmbeddedKVStore}
    val id = "kv_upsert"
    EmbeddedKVStore.remove(id)
    val store = EmbeddedKVStore(id)
    val df = Seq(("a", 1L, "v1")).toDF("h", "r", "payload")
    new EmbeddedKVSink(id).write(df, "t", "h", Some("r"))
    store.batchWrite("t", Seq(Map("h" -> "a", "r" -> 1L, "payload" -> "v2")))
    assert(store.get("t", "a", Some(1L)).get("payload") === "v2",
      "re-putting a key must replace the item")
    assert(store.itemCount("t") === 1L)
    // key-schema discipline: a (hash,range) table rejects hash-only gets
    intercept[IllegalArgumentException] { store.get("t", "a") }
    intercept[IllegalStateException] { store.get("nope", "a", Some(1L)) }
    // int 1 and long 1 are the same NUMBER key, like DynamoDB's N type
    assert(store.get("t", "a", Some(1)).isDefined)
  }

  test("embedded KV: task-retry replays with the same token count once") {
    import graft.serving.{EmbeddedKVSink, EmbeddedKVStore}
    val sp = spark
    import sp.implicits._
    val id = "kv_retry"
    EmbeddedKVStore.remove(id)
    new EmbeddedKVSink(id).write(
      Seq(("a", 1L, "v")).toDF("h", "r", "p"), "t", "h", Some("r"))
    val store = EmbeddedKVStore(id)
    val before = store.batchWriteCount("t")
    // a retried/speculative task re-issues the SAME (partition, chunk)
    // token: puts re-apply (idempotent upserts) but the WCU counters
    // must not inflate — they exist to measure ceil(n/25)
    val item = Map[String, Any]("h" -> "b", "r" -> 2L, "p" -> "w")
    store.batchWrite("t", Seq(item), token = Some("9:0"))
    store.batchWrite("t", Seq(item), token = Some("9:0")) // the retry
    assert(store.batchWriteCount("t") === before + 1,
      "same-token replay must not double-count requests")
    assert(store.get("t", "b", Some(2L)).isDefined)
    // tokenless calls (ad-hoc client writes) always count
    store.batchWrite("t", Seq(item))
    assert(store.batchWriteCount("t") === before + 2)
  }
}
