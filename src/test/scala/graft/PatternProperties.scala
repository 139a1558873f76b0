package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.ops.Relational

/** The q232 row-pattern lowering (direction classify → run islands →
  * run summaries → lead adjacency) must equal a straightforward
  * single-pass automaton on EVERY sequence — including the shapes that
  * break naive lowerings: flat plateaus splitting runs, V's at sequence
  * edges, W's (two V's sharing a middle run), and sub-threshold drops. */
object PatternProperties extends Properties("graft.pattern") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12) // each trial runs real Spark plans

  private lazy val spark = TestSpark.spark

  /** Values from a small alphabet so runs, plateaus, and exact-threshold
    * drops all occur frequently. */
  private val seqGen: Gen[List[Double]] = for {
    n <- Gen.choose(0, 14)
    vs <- Gen.listOfN(n, Gen.choose(0, 5).map(_ * 60.0))
  } yield vs

  private val corpusGen: Gen[Map[Long, List[Double]]] = for {
    k <- Gen.choose(1, 4)
    seqs <- Gen.listOfN(k, seqGen)
  } yield seqs.zipWithIndex.map { case (s, i) => i.toLong -> s }.toMap

  /** Reference automaton: walk the sequence once, tracking maximal
    * strict runs; emit (drop, rise) at every down-run → up-run flip. */
  private def brute(vs: List[Double], minDrop: Double): List[(Double, Double)] = {
    val dirs = vs.zip(vs.drop(1)).map { case (a, b) => math.signum(b - a) }
    if (dirs.isEmpty) return Nil
    // runs of equal direction over the DELTA sequence; value endpoints
    // of run i over deltas [l, r] are vs(l) and vs(r + 1)
    val runBounds = scala.collection.mutable.ListBuffer.empty[(Double, Int, Int)]
    var start = 0
    for (i <- 1 until dirs.length)
      if (dirs(i) != dirs(i - 1)) { runBounds += ((dirs(start), start, i - 1)); start = i }
    runBounds += ((dirs(start), start, dirs.length - 1))
    runBounds.toList.zip(runBounds.toList.drop(1)).collect {
      case ((d1, l1, r1), (d2, _, r2))
        if d1 == -1.0 && d2 == 1.0 && vs(l1) - vs(r1 + 1) >= minDrop =>
        (vs(l1) - vs(r1 + 1), vs(r2 + 1) - vs(r1 + 1))
    }
  }

  property("lowered pattern matches the single-pass automaton") =
    Prop.forAll(corpusGen) { corpus =>
      val sp = spark
      import sp.implicits._
      val rows = corpus.toSeq.flatMap { case (u, vs) =>
        vs.zipWithIndex.map { case (v, i) =>
          (u, new java.sql.Timestamp(1700000000000L + i * 60000L),
            i.toLong, v)
        }
      }
      val expected = corpus.toSeq.flatMap { case (u, vs) =>
        brute(vs, 120.0).map { case (dr, ri) => (u, dr, ri) }
      }.sorted
      if (rows.isEmpty) expected.isEmpty
      else {
        val df = rows.toDF("user_id", "ts", "event_id", "value")
        val got = Relational.vshapeMatches(
            df, "user_id", "ts", "event_id", "value", 120.0)
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
          .toSeq.sorted
        got == expected
      }
    }
}
