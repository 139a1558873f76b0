package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.ops.ImageCodec

/** Properties of the q224 perceptual-hash device (ImageCodec.dHashBands):
  * codec transparency (the hash of encode→decode equals the hash of the
  * raw content — for BOTH real codecs, so the container can never leak
  * into the perceptual distance), bounded sensitivity (one perturbed
  * channel byte touches one cell, which owns at most its left and right
  * comparisons → Hamming ≤ 2 — the reason single-byte noise builds
  * near-dup families rather than scattering them), and the pigeonhole
  * the band join relies on (Hamming ≤ 3 ⇒ at least one of the 4 bands
  * identical, on adversarial hash pairs at controlled distances). */
object PhashProperties extends Properties("graft.phash") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(40)

  private val W = 18; private val H = 16; private val N = 3 * W * H

  private def hamming(a: Array[Long], b: Array[Long]): Int =
    a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum

  private val contentGen: Gen[Array[Byte]] =
    Gen.containerOfN[Array, Byte](N, Gen.choose(Byte.MinValue, Byte.MaxValue))

  property("hash is codec-transparent: raw == bmp round trip == png round trip") =
    Prop.forAll(contentGen) { rgb =>
      val raw = ImageCodec.dHashBands(ImageCodec.Decoded("raw", W, H, rgb))
      val viaBmp = ImageCodec.dHashBands(
        ImageCodec.decode(ImageCodec.encodeBmp(W, H, rgb)).get)
      val viaPng = ImageCodec.dHashBands(
        ImageCodec.decode(ImageCodec.encodePng(W, H, rgb)).get)
      raw.sameElements(viaBmp) && raw.sameElements(viaPng) &&
        raw.forall(b => b >= 0L && b <= 0xFFFFL)
    }

  property("one perturbed channel byte moves the hash by at most 2 bits") =
    Prop.forAll(for {
      rgb <- contentGen
      pos <- Gen.choose(0, N - 1)
      delta <- Gen.choose(1, 255)
    } yield (rgb, pos, delta)) { case (rgb, pos, delta) =>
      val noisy = rgb.clone()
      noisy(pos) = (((noisy(pos) & 0xFF) + delta) % 256).toByte
      val a = ImageCodec.dHashBands(ImageCodec.Decoded("raw", W, H, rgb))
      val b = ImageCodec.dHashBands(ImageCodec.Decoded("raw", W, H, noisy))
      hamming(a, b) <= 2
    }

  property("pigeonhole: hamming <= 3 pairs always share a band") =
    Prop.forAll(for {
      bands <- Gen.listOfN(4, Gen.choose(0L, 0xFFFFL))
      k <- Gen.choose(0, 6) // straddle the <=3 cutoff
      bits <- Gen.pick(k, 0 until 64)
    } yield (bands.toArray, bits)) { case (a, bits) =>
      val b = a.clone()
      bits.foreach(i => b(i / 16) ^= 1L << (i % 16))
      val shares = a.zip(b).exists { case (x, y) => x == y }
      if (hamming(a, b) <= 3) shares else true // >3 may or may not share
    }
}
