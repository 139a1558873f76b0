package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §7.6): opaque binary payloads
  * processed per-partition in batches — the Scala analog of
  * `mapInPandas`, where a decoder amortizes its (expensive) setup once
  * per partition and streams through the rows.
  *
  * The actual decode (image/audio libs are not in this container) is
  * STUBBED as a deterministic feature extractor; the Spark-side contract
  * — schema, batch shape, partition-level setup, feature vector column —
  * is real and tested.
  */
object Multimodal {

  /** Output schema of [[extractFeatures]]: id + payload metadata + a
    * fixed-dim float feature vector. */
  def featureSchema(dim: Int): StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** Per-partition batched feature extraction over a binary column.
    * `decoderSetup` runs once per partition (the expensive model load in
    * a real pipeline) and yields the per-row decode function.
    */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String, dim: Int)(
      decoderSetup: () => Array[Byte] => Array[Float] = () => stubDecoder(dim))
      : DataFrame = {
    val schema = featureSchema(dim)
    val input = df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
    input.mapPartitions { rows =>
      val decode = decoderSetup() // once per partition
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        Row(r.getLong(0), bytes.length, decode(bytes).toSeq)
      }
    }(Encoders.row(schema))
  }

  /** Per-partition batched payload "resize": re-encode each binary
    * payload to a target size (a real pipeline would decode → rescale →
    * re-encode an image here; the container has no codecs, so the
    * transcode is STUBBED as deterministic byte sampling/padding —
    * schema and batching are the real contract). Output schema:
    * (id long, payload binary, n_bytes int). */
  def resizePayloads(df: DataFrame, idCol: String, binCol: String,
                     targetBytes: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false)))
    val input = df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
    input.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val out = Array.tabulate(targetBytes) { i =>
          if (bytes.isEmpty) 0.toByte
          else bytes((i.toLong * bytes.length / targetBytes).toInt)
        }
        Row(r.getLong(0), out, out.length)
      }
    }(Encoders.row(schema))
  }

  /** Deterministic stand-in for a real decoder: hash-derived features in
    * [-1, 1). Stable across partitionings and retries. */
  def stubDecoder(dim: Int): Array[Byte] => Array[Float] = { bytes =>
    var h = 1125899906842597L // FNV-ish rolling hash of the payload
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    Array.tabulate(dim) { j =>
      val x = h ^ (j.toLong * 0x9E3779B97F4A7C15L)
      val mixed = x ^ (x >>> 33)
      ((mixed & 0xFFFF).toFloat / 32768.0f) - 1.0f
    }
  }
}
