package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench-contract guards — the driver parses a bounded stdout tail, so
  * the printed line's size is a CONTRACT, not a cosmetic choice (rounds
  * 8–9 shipped unparseable records when the full line outgrew the
  * capture). */
class BenchSpec extends AnyFunSuite {

  test("headline line stays under the driver's tail-capture budget") {
    // worst case: every catalog query at a 17-char double (the widest
    // `System.nanoTime`-derived seconds value observed)
    val names = graft.queries.Catalog.all.map(_.name)
    val headline = names.filter(Bench.isHeadline)
    assert(headline.size >= 15 && headline.size <= 25,
      s"headline subset drifted to ${headline.size} queries")
    val line = headline
      .map(n => "\"" + n + "\":123.456789012345678").mkString(",")
    // ~500 bytes of envelope fields (incl. r12's shard_loads + reps +
    // discarded_sec) + the sbt [success] trailer must also fit inside
    // the ~2000-byte capture window
    assert(line.length + 550 < 1900,
      s"printed headline line (${line.length} B + envelope) risks " +
        "truncation in the driver's stdout-tail capture")
  }

  test("every headline prefix matches exactly one catalog query family") {
    val names = graft.queries.Catalog.all.map(_.name)
    val unmatched = Bench.HEADLINE.filterNot(p =>
      names.exists(n => n.takeWhile(_ != '_') == p))
    assert(unmatched.isEmpty,
      s"headline prefixes with no catalog query: $unmatched")
  }

  test("streaming suspects: below-floor streaming runs are named") {
    val streaming = Set("q70_streaming_hourly", "q97_stream_stream_join")
    val results = Seq(
      "q70_streaming_hourly" -> 0.07,   // impossible: stale state
      "q97_stream_stream_join" -> 1.9,  // real run
      "q01_pricing_summary" -> 0.01)    // fast batch query: fine
    assert(Bench.streamingSuspects(results, streaming,
      Bench.STREAMING_FLOOR_SEC) === Seq("q70_streaming_hourly"))
  }

  test("all checkpointed streaming queries are in the suspect watch set") {
    val s = Bench.streamingNames
    for (q <- Seq("q70_streaming_hourly", "q87_streaming_sessions",
        "q88_streaming_apply_changes", "q91_stateful_sessions",
        "q97_stream_stream_join", "q104_stream_outer_join",
        "q105_incremental_neardup", "q149_streaming_expectations"))
      assert(s(q), s"$q missing from the streaming watch set")
  }

  test("shard assignment partitions the suite exactly, round-robin") {
    // sharded bench (round 11): every query runs in exactly one child
    // JVM, and consecutive sorted names land in different shards so the
    // heavy late-alphabet families spread instead of stacking
    val n = graft.queries.Catalog.all.size
    for (shards <- Seq(2, 4)) {
      val assign = (0 until n).map(Bench.shardOf(_, shards))
      assert(assign.toSet === (0 until shards).toSet)
      val sizes = assign.groupBy(identity).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, "round-robin must balance ±1")
      assert(assign.sliding(2).forall(p => p(0) != p(1)),
        "adjacent sorted queries must land in different shards")
    }
  }

  test("min-of-reps discards contention spikes, keeps plan cost") {
    // round-12 protocol: a host-load spike inflates one rep; the min is
    // the steady-state plan cost (contention only ever adds time)
    assert(Bench.minOfReps(Seq(20.7, 0.24, 0.26)) === 0.24)
    assert(Bench.minOfReps(Seq(1.5)) === 1.5)
    assert(Bench.DEFAULT_REPS >= 2 && Bench.DEFAULT_REPS <= 3,
      "verdict-r11 mandated N=2–3 timed reps per query")
  }

  test("adaptive rep policy: sub-floor queries keep min-of-N, heavy " +
      "get min-of-2") {
    // round-16: min-of-N protects sub-second queries from contention
    // spikes; repeating multi-second queries is where the suite's wall
    // cost lives (r15 top-20 = 80.9s min-sum but ~325s of bench wall).
    // Heavy queries keep min-of-TWO, not one: a single-rep protocol
    // recorded one polluted rep as a query's steady-state cost (q305
    // 3.13s vs 1.51s min-of-3) with nothing to reject it.
    assert(Bench.repsFor(0.3, Bench.DEFAULT_REPS) === Bench.DEFAULT_REPS)
    assert(Bench.repsFor(1.99, 3) === 3)
    assert(Bench.repsFor(Bench.ADAPTIVE_REP_FLOOR_SEC, 3) === 2)
    assert(Bench.repsFor(5.6, 3) === 2)
    // a dev run with SPARK_GRAFT_BENCH_REPS=1 stays 1 everywhere
    assert(Bench.repsFor(5.6, 1) === 1)
  }

  test("repDiscard: succeeded-only, never negative") {
    // normal: two reps at 1.0 over a 0.5 best discard 1.0s of contention
    assert(Bench.repDiscard(Seq(0.5, 1.0, 1.0), 0.5) === 1.0)
    // a 50ms failed rep is EXCLUDED from `succeeded`; the gauge must not
    // see it (the old allTimes.sum - best*allTimes.size went NEGATIVE
    // here: (0.05+2.0+2.1) - 2.0*3 = -1.85)
    assert(math.abs(Bench.repDiscard(Seq(2.0, 2.1), 2.0) - 0.1) < 1e-9)
    // all reps failed → best is a failure min, nothing discardable
    assert(Bench.repDiscard(Nil, 0.05) === 0.0)
    // float jitter must clamp at zero, not undercut the suite sum
    assert(Bench.repDiscard(Seq(1.0), 1.0 + 1e-12) >= 0.0)
  }

  test("code-cache instrumentation reads the JIT pools of this JVM") {
    val (peak, max) = Bench.codeCacheMb()
    assert(peak > 0, "a warmed JVM has compiled code")
    assert(max >= peak, "peak usage cannot exceed the reserved cache")
    assert(max >= 200, "ReservedCodeCacheSize should be ≥ the JVM default")
  }
}
