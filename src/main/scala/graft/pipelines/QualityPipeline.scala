package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{Mode, Registry, TableDef}

/** Data-quality enforcement as a dataflow DAG — the pipeline-API form of
  * the q146–q149 quality operators, and the full expect_or_drop
  * semantics the reference's DLT platform offers (no notebook uses it;
  * beyond-parity hardening): every event row is flag-checked ROW-LOCALLY
  * (streamable — the flags stage carries no state), clean rows flow on,
  * violating rows land in a quarantine table WITH their first failing
  * check named, and two audit tables — hourly violation metrics and a
  * one-row gate — let orchestration decide whether downstream tables may
  * build. Clean ∪ quarantine provably partitions the input
  * (QualityPipelineSpec pins it).
  *
  * Scale shape: flags/clean/quarantine are scan→project pipelines (zero
  * shuffles, Incremental mode so they run as streams); only the two
  * audit aggregations shuffle, and they reduce to |hours| and 1 row.
  */
object QualityPipeline {

  /** Check predicates, evaluated row-locally. Order = quarantine-reason
    * priority (first failing check names the row's reason). */
  private val checks: Seq[(String, org.apache.spark.sql.Column)] = Seq(
    "null_user" -> col("user_id").isNull,
    "null_props" -> col("props").isNull,
    "out_of_range" -> (col("value") > lit(400.0) || col("value") < lit(0.0)))

  /** @param events (event_id, ts, user_id, event_type, value, props) */
  def build(spark: SparkSession, events: () => DataFrame,
            maxViolationRate: Double = 0.05): Registry = {
    val reg = new Registry(spark)
    reg.source("events", events)

    // row-local violation flags — no state, no shuffle: streamable as-is
    reg.register(TableDef("event_flags", Seq("events"), { case Seq(ev) =>
      val flagged = checks.foldLeft(ev) { case (df, (name, pred)) =>
        df.withColumn(s"viol_$name", pred)
      }
      flagged.withColumn("reason",
        checks.foldRight(lit(null).cast("string")) {
          case ((name, _), rest) =>
            when(col(s"viol_$name"), lit(name)).otherwise(rest)
        })
    }, mode = Mode.Incremental))

    // expect_or_drop: the keep side …
    reg.register(TableDef("events_clean", Seq("event_flags"), {
      case Seq(f) => f.filter(col("reason").isNull)
        .drop(checks.map { case (n, _) => s"viol_$n" } :+ "reason": _*)
    }, mode = Mode.Incremental))

    // … and the quarantine side, carrying the named reason for replay
    // after the upstream defect is fixed
    reg.register(TableDef("events_quarantine", Seq("event_flags"), {
      case Seq(f) => f.filter(col("reason").isNotNull)
        .drop(checks.map { case (n, _) => s"viol_$n" }: _*)
    }, mode = Mode.Incremental))

    // hourly violation metrics (the q149 aggregation in its batch form)
    reg.register(TableDef("quality_metrics_hourly", Seq("event_flags"), {
      case Seq(f) =>
        val counters = checks.map { case (name, _) =>
          sum(when(col(s"viol_$name"), 1).otherwise(0)).cast("long")
            .as(s"n_$name")
        }
        f.groupBy(date_trunc("hour", col("ts")).as("hour_ts"))
          .agg(count(lit(1)).as("n"), counters: _*)
    }, mode = Mode.Full))

    // one-row gate: total violation rate vs the configured budget —
    // orchestration reads `passed` before building anything downstream
    reg.register(TableDef("quality_gate", Seq("event_flags"), {
      case Seq(f) =>
        f.agg(count(lit(1)).as("n_rows"),
          sum(when(col("reason").isNotNull, 1).otherwise(0)).cast("long")
            .as("n_violations"))
          .withColumn("violation_rate",
            col("n_violations").cast("double") / col("n_rows"))
          .withColumn("passed", col("violation_rate") <= lit(maxViolationRate))
    }, mode = Mode.Full))

    reg
  }
}
