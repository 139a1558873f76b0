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
        ORDER BY probe_id""")),

    // BITEMPORAL AS-OF-AS-AT — the two-axis upgrade of the SCD2 as-of
    // (q155): every version carries VALID time (when the fact was true)
    // and TRANSACTION time (when the warehouse learned it), and the
    // query "price valid at V, as known at T" must resolve both — the
    // audit/backtest primitive (what did the book say on date T about
    // date V?) that a single-axis history cannot answer. Versions are
    // synthesized deterministically: every order a v1 at
    // (valid=tx=orderdate); every 7th order a RETROACTIVE correction
    // (+10% in integer cents via floor division — exact) recorded 20
    // days later. Probes straddle the correction's tx time, so the gate
    // pins that T < tx sees the uncorrected price (the defining
    // bitemporal behavior). Resolution is the standard rule: among
    // versions with valid_from <= V and tx_from <= T, max valid_from
    // then max tx_from — ONE equi join on the key plus a per-probe
    // top-1 window, the q155 shape with a second time filter.
    Q("q287_bitemporal_asof",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val o = t(s, d, "orders")
          .select(col("o_orderkey").as("okey"), col("o_orderdate").as("od"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        val v1 = o.select(col("okey"), col("od").as("valid_from"),
          col("od").as("tx_from"), col("cents").as("price_cents"))
        val v2 = o.filter(col("okey") % 7 === 0)
          .select(col("okey"), col("od").as("valid_from"),
            (col("od") + expr("INTERVAL 20 DAYS")).as("tx_from"),
            (col("cents") + expr("cents div 10")).as("price_cents"))
        val versions = v1.unionByName(v2)
        val probes = o.filter(col("okey") % 3 === 0)
          .select(col("okey"),
            (col("od") + expr("INTERVAL 15 DAYS")).as("v_at"))
          .withColumn("t_at", explode(array(
            col("v_at") - expr("INTERVAL 5 DAYS"),
            col("v_at") + expr("INTERVAL 10 DAYS"))))
        val w = Window.partitionBy("okey", "v_at", "t_at")
          .orderBy(desc("valid_from"), desc("tx_from"))
        probes.join(versions, Seq("okey"))
          .filter(col("valid_from") <= col("v_at") &&
            col("tx_from") <= col("t_at"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("okey"), col("v_at"), col("t_at"), col("price_cents"))
          .orderBy("okey", "t_at")
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey AS okey, CAST(o_orderdate AS TIMESTAMP) AS od,
            CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
          FROM orders),
        versions AS (
          SELECT okey, od AS valid_from, od AS tx_from,
            cents AS price_cents FROM o
          UNION ALL
          SELECT okey, od, od + INTERVAL 20 DAY,
            cents + cents // 10 FROM o WHERE okey % 7 = 0),
        probes AS (
          SELECT okey, od + INTERVAL 15 DAY AS v_at,
            UNNEST([od + INTERVAL 10 DAY, od + INTERVAL 25 DAY]) AS t_at
          FROM o WHERE okey % 3 = 0),
        resolved AS (
          SELECT p.okey, p.v_at, p.t_at, v.price_cents,
            ROW_NUMBER() OVER (PARTITION BY p.okey, p.v_at, p.t_at
              ORDER BY v.valid_from DESC, v.tx_from DESC) AS rk
          FROM probes p JOIN versions v ON p.okey = v.okey
          WHERE v.valid_from <= p.v_at AND v.tx_from <= p.t_at)
        SELECT okey, v_at, t_at, price_cents
        FROM resolved WHERE rk = 1
        ORDER BY okey, t_at"""))
  )
}
