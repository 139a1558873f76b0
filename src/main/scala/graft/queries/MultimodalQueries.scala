package graft.queries

import org.apache.spark.sql.functions._
import QH._

/** Multimodal-column plumbing: opaque binary payloads with typed metadata,
  * deterministic feature extraction, and frame sampling. The decode step a
  * real pipeline would run (image/audio libs are not in this container) is
  * STUBBED as a deterministic digest — the Spark-side schema, batching,
  * and partitioning are real and verified against the oracle.
  */
object MultimodalQueries {

  val qs: Seq[Q] = Seq(
    // Binary payload metadata: byte length + content digest ("decode" stub).
    Q("q40_binary_meta",
      (s, d) =>
        t(s, d, "events")
          .withColumn("payload", encode(col("props"), "UTF-8"))
          .select(col("event_id"),
            octet_length(col("payload")).as("n_bytes"),
            md5(col("payload")).as("digest"),
            lower(hex(encode(substring(col("props"), 1, 8), "UTF-8")))
              .as("head_hex"))
          .orderBy("event_id"),
      Some("""
        SELECT event_id,
          CAST(OCTET_LENGTH(ENCODE(props)) AS INTEGER) AS n_bytes,
          MD5(props) AS digest,
          LOWER(HEX(ENCODE(SUBSTRING(props, 1, 8)))) AS head_hex
        FROM events ORDER BY event_id""")),

    // Frame sampling: fixed 32-byte frames, keep every 4th, digest each —
    // the video-frame-sample access pattern over an opaque binary column.
    Q("q41_frame_sample",
      (s, d) =>
        t(s, d, "documents")
          .select(col("doc_id"), col("text"),
            explode(expr(
              "sequence(0, cast(ceil(length(text) / 32.0) AS int) - 1)"))
              .as("frame_idx"))
          .filter(col("frame_idx") % 4 === 0)
          .select(col("doc_id"), col("frame_idx"),
            md5(expr("substring(text, frame_idx * 32 + 1, 32)")).as("frame_digest"))
          .orderBy("doc_id", "frame_idx"),
      Some("""
        SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
          MD5(SUBSTRING(text, CAST(frame_idx * 32 + 1 AS INTEGER), 32)) AS frame_digest
        FROM documents,
          LATERAL (SELECT UNNEST(GENERATE_SERIES(0,
            CAST(CEIL(LENGTH(text) / 32.0) AS INTEGER) - 1)) AS frame_idx)
        WHERE frame_idx % 4 = 0
        ORDER BY doc_id, frame_idx"""))
  )
}
