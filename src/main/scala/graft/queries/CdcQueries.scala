package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Relational
import QH._

/** CDC upsert / dedup operator families (SURVEY.md §2.10, A12), built on
  * the reusable [[graft.ops.Relational]] combinators.
  */
object CdcQueries {

  val qs: Seq[Q] = Seq(
    // DLT apply_changes: latest row per key by sequence column
    // (zetaflex-pipeline.py:138–151, referrals:138–152).
    Q("q38_apply_changes",
      (s, d) => {
        val ev = t(s, d, "events")
        Relational.applyChanges(Seq("user_id", "event_type"),
            col("ts"), Seq(col("event_id")))(ev)
          .select("user_id", "event_type", "event_id", "ts", "value")
          .orderBy("user_id", "event_type")
      },
      Some("""
        SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value
        FROM events
        QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
          ORDER BY ts DESC, event_id DESC) = 1
        ORDER BY user_id, event_type""")),

    // Deterministic exact dedup: min event_id per (user, type, minute)
    // (the safe re-expression of transactions:354's dropDuplicates).
    Q("q39_dedupe_minute",
      (s, d) => {
        val ev = t(s, d, "events")
          .withColumn("minute_", date_trunc("minute", col("ts")))
        Relational.dedupeExact(Seq("user_id", "event_type", "minute_"),
            col("event_id"))(ev)
          .select("event_id", "user_id", "event_type", "minute_")
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, user_id, event_type,
          CAST(DATE_TRUNC('minute', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS minute_
        FROM events
        QUALIFY ROW_NUMBER() OVER (
          PARTITION BY user_id, event_type, DATE_TRUNC('minute', CAST(ts AS TIMESTAMP))
          ORDER BY event_id) = 1
        ORDER BY event_id""")),

    // SCD TYPE 2 dimension build — the history-preserving complement to
    // q38's latest-wins apply_changes: every change event becomes a
    // validity interval [valid_from, valid_to) with an is_current flag
    // on the open interval. One lead() window per entity key is the
    // whole build: a single shuffle on user_id, no self-join, and the
    // partition carries one entity's history (bounded by change rate,
    // not corpus size). Ties on ts are broken by event_id so the
    // interval chain is deterministic.
    Q("q126_scd2",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
        t(s, d, "events")
          .withColumn("valid_to", lead(col("ts"), 1).over(w))
          .select(
            col("user_id"), col("event_id"),
            col("ts").as("valid_from"), col("valid_to"),
            col("value"),
            col("valid_to").isNull.as("is_current"))
          .orderBy("user_id", "valid_from", "event_id")
      },
      Some("""
        SELECT user_id, event_id,
          CAST(ts AS TIMESTAMP) AS valid_from,
          LEAD(CAST(ts AS TIMESTAMP)) OVER w AS valid_to,
          value,
          (LEAD(ts) OVER w IS NULL) AS is_current
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, valid_from, event_id""")),

    // SCD2 AS-OF LOOKUP — the consumption half of q126's history build:
    // enrich fact rows against the version valid AT the fact's event
    // time (`valid_from <= ts < valid_to`, open current version). This
    // is the equi-join-plus-interval-residual idiom users run against a
    // MATERIALIZED SCD2 table — physically different from q25's
    // union+window as-of merge (which needs both streams in one shuffle)
    // and the right shape when the dimension is already built: the join
    // clusters on the entity key, and the residual scans each user's
    // BOUNDED version list. Zero-width versions (tied timestamps) are
    // excluded by the half-open interval, so every probe matches exactly
    // one version — the gate's row count pins that uniqueness.
    Q("q155_scd2_asof_lookup",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
        val dim = t(s, d, "events")
          .withColumn("valid_to", lead(col("ts"), 1).over(w))
          .select(col("user_id").as("d_user"),
            col("event_id").as("version_id"),
            col("ts").as("valid_from"), col("valid_to"), col("value"))
        val probes = t(s, d, "events")
          .filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("probe_id"), col("ts"))
        probes.join(dim,
            col("user_id") === col("d_user") &&
              col("valid_from") <= col("ts") &&
              (col("valid_to").isNull || col("ts") < col("valid_to")))
          .select(col("probe_id"), col("user_id"), col("ts"),
            col("version_id"), col("value").as("state_value"))
          .orderBy("probe_id")
      },
      Some("""
        WITH dim AS (
          SELECT user_id AS d_user, event_id AS version_id,
            CAST(ts AS TIMESTAMP) AS valid_from,
            LEAD(CAST(ts AS TIMESTAMP)) OVER
              (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
            value
          FROM events),
        probes AS (
          SELECT user_id, event_id AS probe_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'click')
        SELECT probe_id, user_id, ts, version_id, value AS state_value
        FROM probes JOIN dim
          ON user_id = d_user AND valid_from <= ts
          AND (valid_to IS NULL OR ts < valid_to)
        ORDER BY probe_id"""))
  )
}
