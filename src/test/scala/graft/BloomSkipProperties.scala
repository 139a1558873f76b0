package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.graph.BloomSkip

/** The bloom encoding is EXACT at the position level: pack → encode →
  * mightContain must contain every packed position and exclude every
  * unpacked one (false positives enter only at the value→position
  * hashing layer, never the bit store — a bit-packing bug here would
  * either lose rows (dropped set bit → wrong definite-absence) or
  * destroy skipping (spurious set bits → no partition ever pruned)).
  * Word boundaries (63/64/127/128) and range edges (0, BITS−1) are
  * explicitly weighted into the generator. */
object BloomSkipProperties extends Properties("graft.bloomskip") {

  private val posGen: Gen[Int] = Gen.frequency(
    4 -> Gen.choose(0, BloomSkip.BITS - 1),
    1 -> Gen.oneOf(0, 1, 62, 63, 64, 65, 127, 128,
      BloomSkip.BITS - 2, BloomSkip.BITS - 1))

  private val setGen: Gen[Set[Int]] =
    Gen.chooseNum(0, 300).flatMap(n => Gen.listOfN(n, posGen)).map(_.toSet)

  property("packed positions are contained; unpacked are excluded") =
    Prop.forAll(setGen, posGen) { (s, probe) =>
      val enc = BloomSkip.pack(s)
      val allIn = s.forall(p => BloomSkip.mightContain(enc, Seq(p)))
      val probeRight = BloomSkip.mightContain(enc, Seq(probe)) == s(probe)
      // multi-probe semantics: ALL positions must be set
      val conj = s.isEmpty ||
        BloomSkip.mightContain(enc, s.toSeq) &&
          (s(probe) || !BloomSkip.mightContain(enc, s.toSeq :+ probe))
      allIn && probeRight && conj
    }

  property("foreign sizing or malformed encodings always KEEP") =
    Prop.forAll(setGen, posGen) { (s, probe) =>
      val enc = BloomSkip.pack(s)
      val b64 = enc.split(":", 3)(2)
      BloomSkip.mightContain(s"4096:4:$b64", Seq(probe)) &&
        BloomSkip.mightContain(s"8192:8:$b64", Seq(probe)) &&
        BloomSkip.mightContain("not-a-bloom", Seq(probe)) &&
        BloomSkip.mightContain(s"8192:4:@@@", Seq(probe)) &&
        BloomSkip.mightContain(s"8192:4:${b64.drop(8)}", Seq(probe))
    }

  property("out-of-range probe positions KEEP, never crash or exclude") =
    Prop.forAll(setGen) { s =>
      val enc = BloomSkip.pack(s)
      // real lookups compute positions mod BITS; an out-of-range probe
      // means corruption, which must keep (a definite-absence verdict
      // from garbage would silently lose rows)
      BloomSkip.mightContain(enc, Seq(-1)) &&
        BloomSkip.mightContain(enc, Seq(BloomSkip.BITS)) &&
        BloomSkip.mightContain(enc, Seq(Int.MaxValue))
    }
}
