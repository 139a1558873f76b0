package graft

import org.scalacheck.{Gen, Prop, Properties}

/** q213's prefix filter (DedupQueries.prefixFilterCandidates): the
  * candidate set must contain EVERY pair with Jaccard ≥ t — losslessness
  * is what makes the prefix-filtered join EXACT, unlike MinHash's
  * probabilistic recall. Corpora are adversarial for the filter: base
  * token sets plus partial copies (high-overlap pairs straddling the
  * threshold), exact duplicates, and tiny sets where the ±1 in the
  * prefix-length formula matters most. Checked at two thresholds with
  * different (tNum, tDen) reduced fractions. */
object PPJoinProperties extends Properties("graft.ppjoin") {

  // each trial runs real Spark joins; keep the trial count modest
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  /** Token universe small (0–29) so random sets overlap heavily. */
  private val setGen: Gen[Set[Int]] =
    Gen.choose(1, 12).flatMap(k => Gen.pick(k, 0 until 30).map(_.toSet))

  /** Base sets plus one mutated copy each: drop up to 2 tokens, add up
    * to 2 — near-dup pairs at every overlap level around the cutoff. */
  private val corpusGen: Gen[List[Set[Int]]] = for {
    n <- Gen.choose(3, 8)
    bases <- Gen.listOfN(n, setGen)
    muts <- Gen.sequence[List[Set[Int]], Set[Int]](bases.map { b =>
      for {
        drop <- Gen.someOf(b.toSeq)
        add <- Gen.someOf(0 until 30)
      } yield {
        val m = (b -- drop.take(2)) ++ add.take(2)
        if (m.isEmpty) b else m
      }
    })
  } yield bases ++ muts

  private def jac(a: Set[Int], b: Set[Int]): Double =
    a.intersect(b).size.toDouble / a.union(b).size

  property("prefix-filter candidates contain every pair meeting the threshold") =
    Prop.forAll(corpusGen) { sets =>
      val sp = spark
      import sp.implicits._
      val sh = sets.zipWithIndex
        .flatMap { case (ts, i) => ts.map(t => (i.toLong, t.toString)) }
        .toDF("doc_id", "shingle")
      Seq((3, 5), (4, 5)).forall { case (tNum, tDen) =>
        val t = tNum.toDouble / tDen
        val truth = (for {
          (a, i) <- sets.zipWithIndex
          (b, j) <- sets.zipWithIndex if i < j
          if jac(a, b) >= t - 1e-12
        } yield (i.toLong, j.toLong)).toSet
        val cand = graft.queries.DedupQueries
          .prefixFilterCandidates(sh, tNum, tDen)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        truth.subsetOf(cand)
      }
    }
}
