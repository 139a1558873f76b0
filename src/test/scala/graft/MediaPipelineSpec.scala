package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.ops.ImageCodec
import graft.pipelines.MediaPipeline

/** Hand-built media landing zone: a canonical image, its single-byte
  * near-dup (PhashProperties guarantees Hamming ≤ 2 → must pair), a
  * distant-seed distinct image, and three quarantine cases (garbage,
  * wrong geometry, truncated header). */
class MediaPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture = {
    val sp = spark
    import sp.implicits._
    val base = ImageCodec.content(3L, 18, 16)
    val near = base.clone(); near(100) = (((near(100) & 0xFF) + 90) % 256).toByte
    Seq(
      0L -> ImageCodec.encodeBmp(18, 16, base),
      1L -> ImageCodec.encodeBmp(18, 16, near),
      2L -> ImageCodec.encodeBmp(18, 16, ImageCodec.content(100L, 18, 16)),
      3L -> Array.fill[Byte](64)(0xFF.toByte),
      4L -> ImageCodec.encodeBmp(20, 16, ImageCodec.content(3L, 20, 16)),
      5L -> ImageCodec.encodeBmp(18, 16, base).take(10)
    ).toDF("doc_id", "payload")
  }

  test("null-id landing rows quarantine with their id kept NULL") {
    val sp = spark
    import sp.implicits._
    // two malformed rows with null ids, plus a legitimate doc_id of -1:
    // pre-r12 all three would have collapsed onto the -1 sentinel
    val rows = fixture.unionByName(Seq(
      (Option.empty[Long], Some(Array.fill[Byte](8)(1))),
      (Option.empty[Long], Option.empty[Array[Byte]]),
      (Some(-1L), Some(ImageCodec.encodeBmp(18, 16, ImageCodec.content(7L, 18, 16))))
    ).toDF("doc_id", "payload"))
    val reg = MediaPipeline.build(spark, () => rows)
    val quar = reg.resolve("media_quarantine").collect()
    val nullIdReasons = quar.filter(_.isNullAt(0)).map(_.getString(1)).toSeq
    assert(nullIdReasons === Seq("null_id", "null_id"),
      "each malformed row stays a distinct quarantine row with a NULL id")
    assert(!quar.exists(r => !r.isNullAt(0) && r.getLong(0) === -1L),
      "the legitimate doc_id -1 must NOT land in quarantine")
    val clean = reg.resolve("media_clean").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(clean.contains(-1L), "doc_id -1 is a valid image and stays clean")
  }

  test("media DAG: one decode pass, quality split, phash dedup, embeddings") {
    val reg = MediaPipeline.build(spark, () => fixture)

    val feats = reg.resolve("media_features").collect()
    assert(feats.length === 6, "every payload classifies, none crashes")
    val clean = reg.resolve("media_clean").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val quar = reg.resolve("media_quarantine")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(clean === Set(0L, 1L, 2L))
    assert(quar === Map(3L -> "undecodable", 4L -> "wrong_dims",
      5L -> "undecodable"), s"got $quar")
    assert(clean.size + quar.size === 6, "clean and quarantine partition")

    // the single-byte perturbation moves the hash by at most 2 bits
    // (PhashProperties), so (0, 1) MUST surface as a near-dup pair
    val pairs = reg.resolve("media_neardup_pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 === 0L && p._2 === 1L && p._3 <= 2L),
      s"0-1 must pair at Hamming <= 2, got ${pairs.toSeq}")

    val canon = reg.resolve("media_canonical")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(canon.keySet === clean, "every clean image canonicalizes")
    assert(canon(0L) === 0L && canon(1L) === 0L,
      "the near-dup family canonicalizes to its smallest doc_id")

    val corpus = reg.resolve("media_corpus").collect()
    val corpusIds = corpus.map(_.getLong(0)).toSet
    assert(!corpusIds.contains(1L), "the near-dup never survives")
    assert(corpusIds.contains(0L), "the canonical survives")
    assert(corpusIds.subsetOf(clean))
    assert(corpus.forall(r => !r.isNullAt(3) &&
      r.getSeq[Long](3).length === 8),
      "every surviving image carries its 8-dim extracted embedding")
  }
}
