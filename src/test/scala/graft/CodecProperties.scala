package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** Property armor for the round-11 devices: the CDF-ntile must equal
  * Spark's own NTILE on arbitrary data (it replaces a global sort — the
  * one thing it must never change is the answer), and the codecs must
  * round-trip arbitrary content, not just the closed-form generator. */
object CodecProperties extends Properties("graft.r11") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = TestSpark.spark

  private val ntileInput = for {
    n <- Gen.choose(1, 120)
    k <- Gen.choose(1, 9)
    // few distinct keys → heavy ties, the case that breaks naive ranks
    keys <- Gen.listOfN(n, Gen.choose(0, 6))
  } yield (keys, k)

  property("ntileByCdf equals Spark ntile over a global order") =
    Prop.forAll(ntileInput) { case (keys, k) =>
      val sp = spark
      import sp.implicits._
      import org.apache.spark.sql.expressions.Window
      val df = keys.zipWithIndex.map { case (key, i) => (key, i.toLong) }
        .toDF("key", "id")
      val got = graft.ops.Relational
        .ntileByCdf(df, col("key"), col("id"), k)
        .select(col("id"), col("bucket")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = df.withColumn("bucket",
          ntile(k).over(Window.orderBy(col("key"), col("id"))).cast("long"))
        .select(col("id"), col("bucket")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == want
    }

  private val imageGen = for {
    w <- Gen.choose(1, 24)
    h <- Gen.choose(1, 16)
    rgb <- Gen.listOfN(w * h * 3, Gen.choose(-128, 127))
  } yield (w, h, rgb.map(_.toByte).toArray)

  property("BMP and PNG round-trip ARBITRARY pixel content identically") =
    Prop.forAll(imageGen) { case (w, h, rgb) =>
      import graft.ops.ImageCodec
      val viaBmp = ImageCodec.decode(ImageCodec.encodeBmp(w, h, rgb)).get
      val viaPng = ImageCodec.decode(ImageCodec.encodePng(w, h, rgb)).get
      viaBmp.channels.toSeq == rgb.toSeq &&
        viaPng.channels.toSeq == rgb.toSeq &&
        viaBmp.width == w && viaPng.height == h
    }

  private val audioGen = for {
    n <- Gen.choose(1, 500)
    rate <- Gen.oneOf(8000, 16000, 44100)
    samples <- Gen.listOfN(n,
      Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))
  } yield (rate, samples.map(_.toShort).toArray)

  property("WAV round-trips arbitrary PCM content") =
    Prop.forAll(audioGen) { case (rate, samples) =>
      import graft.ops.AudioCodec
      val dec = AudioCodec.decodeWav(AudioCodec.encodeWav(rate, samples)).get
      dec.sampleRate == rate && dec.samples.toSeq == samples.toSeq
    }

  private val mulawGen = for {
    n <- Gen.choose(1, 300)
    rate <- Gen.oneOf(8000, 16000)
    samples <- Gen.listOfN(n,
      Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))
  } yield (rate, samples.map(_.toShort).toArray)

  property("mu-law WAV round-trips arbitrary PCM through the G.711 " +
    "quantizer (container exact, samples codec-quantized)") =
    Prop.forAll(mulawGen) { case (rate, samples) =>
      import graft.ops.AudioCodec
      val dec = AudioCodec.decodeWav(
        AudioCodec.encodeWavMulaw(rate, samples)).get
      dec.codec == "mulaw" && dec.sampleRate == rate &&
        dec.samples.length == samples.length &&
        samples.indices.forall { i =>
          dec.samples(i).toInt == AudioCodec.mulawDecodeSample(
            AudioCodec.mulawEncodeSample(samples(i).toInt))
        }
    }

  private val mjpegMutationGen = for {
    nFrames <- Gen.choose(1, 3)
    grays <- Gen.listOfN(nFrames, Gen.choose(16, 224))
    // mutate: truncate anywhere, flip any byte, or inflate the tail
    op <- Gen.oneOf("truncate", "flip", "inflate")
    at <- Gen.choose(0, 4096)
    b <- Gen.choose(-128, 127)
  } yield (grays, op, at, b.toByte)

  property("MJPEG/AVI decode never throws on arbitrary mutations: " +
    "None or a well-formed video") =
    Prop.forAll(mjpegMutationGen) { case (grays, op, at, b) =>
      import graft.ops.MjpegAvi
      val frames = grays.map(g => Array.fill(24 * 16 * 3)(g.toByte))
      val good = MjpegAvi.encode(24, 16, 12, frames)
      val mutated = op match {
        case "truncate" => java.util.Arrays.copyOf(good, at % good.length)
        case "inflate"  => good ++ Array.fill(1 + at % 7)(b)
        case _ =>
          val m = good.clone(); m(at % m.length) = b; m
      }
      val out = MjpegAvi.decode(mutated) // must not throw
      out.forall(v => v.width > 0 && v.height > 0 && v.fps > 0 &&
        v.nFrames > 0 && v.data.length == v.frameLen * v.nFrames)
    }

  private val chunkGen = for {
    n <- Gen.choose(1, 200)
    words <- Gen.listOfN(n, Gen.oneOf(
      (1 to 40).map(i => s"t$i")))
  } yield words

  property("cdcChunks partitions every document losslessly, in order") =
    Prop.forAll(chunkGen) { words =>
      val sp = spark
      import sp.implicits._
      val text = words.mkString(" ")
      val chunks = graft.ops.Chunking
        .cdcChunks(Seq((1L, text)).toDF("doc_id", "text"),
          col("doc_id"), col("text"))
        .orderBy("chunk_id").select("chunk").collect().map(_.getString(0))
      // concatenating the chunks in chunk order reconstructs the text
      chunks.mkString(" ") == text
    }
}
