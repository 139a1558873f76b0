package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.expressions.MisraGries

/** The Misra–Gries guarantees q113 gates on, checked directly against
  * the buffer under ADVERSARIAL merge trees: a zipfy token stream is cut
  * into random partitions, each partition builds its own summary
  * (update path), and the summaries merge in a random order (merge
  * path) — exactly the nondeterminism a shuffle reduce exhibits. For
  * every split/merge order the mergeable-summaries theorem must hold:
  *   (1) est ≤ true_count for every summarized item,
  *   (2) true_count − est ≤ n/(k+1) for every summarized item,
  *   (3) every item with true_count > n/(k+1) appears in the summary.
  * These run on the raw Buf (no Spark) so hundreds of trials are cheap.
  */
object HeavyHitterProperties extends Properties("graft.heavyhitters") {

  private val k = 8

  /** Zipf-ish stream: a few hot tokens, a long random tail. */
  private val streamGen: Gen[List[String]] = for {
    nHot <- Gen.choose(1, 4)
    hotReps <- Gen.listOfN(nHot, Gen.choose(20, 60))
    tail <- Gen.listOfN(80, Gen.choose(0, 500).map(i => s"t$i"))
    shuffled <- {
      val hot = hotReps.zipWithIndex.flatMap { case (r, i) =>
        List.fill(r)(s"hot$i")
      }
      Gen.const(scala.util.Random.shuffle(hot ++ tail))
    }
  } yield shuffled

  /** Random cut points + random merge order over the partition summaries. */
  private val caseGen: Gen[(List[String], List[Int], Long)] = for {
    stream <- streamGen
    nParts <- Gen.choose(1, 7)
    cuts <- Gen.listOfN(nParts - 1, Gen.choose(0, stream.size))
    seed <- Gen.choose(Long.MinValue, Long.MaxValue)
  } yield (stream, cuts.sorted, seed)

  property("MG bounds hold for any partition split and merge order") =
    Prop.forAll(caseGen) { case (stream, cuts, seed) =>
      val truth = stream.groupBy(identity).map { case (t, xs) =>
        t -> xs.size.toLong
      }
      val n = stream.size.toLong
      val err = n.toDouble / (k + 1)

      // partition → per-partition summaries → random-order merge
      val parts = (0 +: cuts).zip(cuts :+ stream.size).map {
        case (s0, e0) =>
          val buf = new MisraGries.Buf(k)
          stream.slice(s0, e0).foreach(buf.add(_, 1L))
          buf
      }
      val order = new scala.util.Random(seed).shuffle(parts)
      val merged = order.reduceLeft { (a, b) => a.mergeFrom(b); a }

      import scala.jdk.CollectionConverters._
      val est = merged.m.asScala.map { case (t, c) => t -> c.longValue() }

      val overEstimate = est.collect {
        case (t, c) if c > truth.getOrElse(t, 0L) => t
      }
      val outOfBound = est.collect {
        case (t, c) if truth.getOrElse(t, 0L) - c > err => t
      }
      val missedHeavy = truth.collect {
        case (t, c) if c > err && !est.contains(t) => t
      }
      Prop(overEstimate.isEmpty && outOfBound.isEmpty && missedHeavy.isEmpty) :|
        s"over=$overEstimate oob=$outOfBound missed=$missedHeavy n=$n err=$err"
    }
}
