package graft.queries

import org.apache.spark.sql.functions._
import QH._

/** Nested struct/array/map operator families: J4 (join on a nested array
  * element) and the §2.9 UDF replacement — the reference's only Python
  * UDF, `place_trade_event_merge` (transactions:310–329), re-expressed
  * as pure SQL `filter`/`element_at`/`map_concat` that stays inside
  * whole-stage codegen.
  */
object NestedQueries {

  val qs: Seq[Q] = Seq(
    // J4 equi join on a nested/array element (transactions:184–192
    // `b.mint = a.events.compressed['assetId'][0]`): build per-user event
    // arrays, then join facts on the first element's event_id.
    Q("q53_nested_element_join",
      (s, d) => {
        val ev = t(s, d, "events")
        val arrs = ev.groupBy("user_id")
          .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
            col("event_type")))).as("evs"))
          .select(col("user_id"),
            expr("element_at(evs, 1).event_id").as("first_event_id"),
            size(col("evs")).as("n_events"))
        arrs.join(ev.select(col("event_id"), col("event_type"), col("value")),
            col("first_event_id") === col("event_id"))
          .select(col("user_id"), col("first_event_id"), col("n_events"),
            col("event_type").as("first_type"), col("value").as("first_value"))
          .orderBy("user_id")
      },
      Some("""
        WITH arrs AS (
          SELECT user_id,
            (LIST(struct_pack(ts := ts, event_id := event_id) ORDER BY ts, event_id))[1].event_id
              AS first_event_id,
            CAST(COUNT(*) AS INTEGER) AS n_events
          FROM events GROUP BY user_id)
        SELECT a.user_id, a.first_event_id, a.n_events,
          e.event_type AS first_type, e.value AS first_value
        FROM arrs a JOIN events e ON a.first_event_id = e.event_id
        ORDER BY a.user_id""")),

    // §2.9 place/trade event merge: per user, the first 'view' event map
    // merged with the first 'purchase' event map ({**place, **trade} —
    // trade keys override, place-only keys survive), exactly the
    // semantics of the reference's Python UDF but via map_concat.
    Q("q55_event_merge",
      (s, d) => {
        val ev = t(s, d, "events")
          .withColumn("k", expr("cast(get_json_object(props, '$.k') AS int)"))
          .withColumn("name", col("event_type"))
          .withColumn("event",
            when(col("event_type") === "view",
              map(lit("value"), col("value").cast("string"),
                lit("ts"), unix_timestamp(col("ts")).cast("string")))
              .otherwise(
                map(lit("value"), col("value").cast("string"),
                  lit("fee"), col("k").cast("string"))))
        val place = ev.filter(col("name") === "view")
          .groupBy("user_id")
          .agg(min_by(col("event"), struct(col("ts"), col("event_id")))
            .as("place"))
        val trade = ev.filter(col("name") === "purchase")
          .groupBy("user_id")
          .agg(min_by(col("event"), struct(col("ts"), col("event_id")))
            .as("trade"))
        // {**place, **trade}: trade keys win, place-only keys survive.
        // (map_concat alone would throw on duplicate keys under the
        // default EXCEPTION dedup policy — filter collisions first.)
        val merged = place.join(trade, Seq("user_id"), "left")
          .withColumn("merged",
            when(col("trade").isNotNull, map_concat(
              expr("map_filter(place, (k, v) -> NOT array_contains(map_keys(trade), k))"),
              col("trade")))
              .otherwise(col("place")))
        merged.select(col("user_id"),
            expr("try_element_at(merged, 'value')").as("m_value"),
            expr("try_element_at(merged, 'ts')").as("m_ts"),
            expr("try_element_at(merged, 'fee')").as("m_fee"))
          .orderBy("user_id")
      },
      Some("""
        WITH v AS (
          SELECT user_id, CAST(value AS VARCHAR) AS value_str,
            CAST(CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS VARCHAR) AS ts_str
          FROM events WHERE event_type = 'view'
          QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1),
        p AS (
          SELECT user_id, CAST(value AS VARCHAR) AS value_str,
            CAST(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER) AS VARCHAR) AS fee_str
          FROM events WHERE event_type = 'purchase'
          QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1)
        SELECT v.user_id,
          COALESCE(p.value_str, v.value_str) AS m_value,
          v.ts_str AS m_ts,
          p.fee_str AS m_fee
        FROM v LEFT JOIN p USING (user_id)
        ORDER BY v.user_id"""))
  )
}
