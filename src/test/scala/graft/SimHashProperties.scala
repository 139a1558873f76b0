package graft

import org.scalacheck.{Gen, Prop, Properties}

/** q29's banding generalization (DedupQueries.simhashNearPairs): for BOTH
  * group widths — 4×15-bit/single-bit probes and 3×20-bit/double-bit
  * probes — the banded candidate search must return EXACTLY the quadratic
  * ground truth (perfect recall is the pigeonhole guarantee; perfect
  * precision is the verify filter). Corpora are adversarial: planted
  * near-dups at controlled Hamming distances straddling the ≤6 cutoff,
  * plus exact duplicates. */
object SimHashProperties extends Properties("graft.simhash") {

  // each trial runs real Spark joins for both widths; 10 randomized
  // trials keeps the suite fast
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val sigGen: Gen[Long] = Gen.choose(0L, (1L << 60) - 1)

  /** Base signatures plus one mutated copy each, flipping 0–9 random bits
    * (0 = exact dup; ≤6 = must be found; 7–9 = must be excluded). */
  private val corpusGen: Gen[List[Long]] = for {
    n <- Gen.choose(4, 12)
    bases <- Gen.listOfN(n, sigGen)
    masks <- Gen.listOfN(n, for {
      k <- Gen.choose(0, 9)
      bits <- Gen.pick(k, 0 until 60)
    } yield bits.foldLeft(0L)((m, b) => m | (1L << b)))
  } yield bases ++ bases.zip(masks).map { case (b, m) => b ^ m }

  property("banded near-pairs equal the exact quadratic result at 4 and 3 groups") =
    Prop.forAll(corpusGen) { sigs =>
      val sp = spark
      import sp.implicits._
      val df = sigs.zipWithIndex
        .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "simhash")
      val exact = (for {
        (a, i) <- sigs.zipWithIndex
        (b, j) <- sigs.zipWithIndex if i < j
        h = java.lang.Long.bitCount(a ^ b) if h <= 6
      } yield (i.toLong, j.toLong, h)).toSet
      Seq(4, 3).forall { groups =>
        val got = graft.queries.DedupQueries.simhashNearPairs(df, groups)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        got == exact
      }
    }
}
