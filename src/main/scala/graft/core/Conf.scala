package graft.core

import java.time.Instant

/** Engine configuration (SURVEY.md §7.5 determinism risks): the reference
  * embeds `current_timestamp()` in business logic (Dietz weights,
  * transactions:1581–1601; serving snapshot filters,
  * zetadex-serving-v2.py:348–351) and `rand(seed=42)` (madwars:60) —
  * both nondeterministic under replay/retry or across engines. The
  * engine threads an explicit as-of clock instead, and replaces rand
  * with hash-based sampling ([[graft.ops.Relational.deterministicSample]]).
  */
final case class Conf(
    asOf: Instant,
    network: String = "mainnet") {

  /** as-of as a Spark SQL timestamp literal column. */
  def asOfTs: org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.lit(
      java.sql.Timestamp.from(asOf))
}

object Conf {
  /** Deterministic default pinned to the test corpus' time range. */
  val ForTests: Conf = Conf(Instant.parse("2024-01-30T12:00:00Z"))

  /** The hardcoded bad burn signature the reference excludes inline
    * (zetadex-transactions-helius-pipeline.py:204–208) — centralized
    * here so engine and oracle share it (SURVEY.md §7.5 item 7). */
  val ExcludedBurnSignature: String =
    "52wXWMicfpXLzvDKbxtmmPwN3Jv2gq6NF1GtchG8iMQB94PwexTNkGZNYi749u9s8QLta6GVkdd5hr2391n9JYZY"
}
