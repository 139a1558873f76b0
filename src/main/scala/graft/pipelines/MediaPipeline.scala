package graft.pipelines

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.graph.{Mode, Registry, TableDef}
import graft.ops.{ImageCodec, Relational}

/** Multimodal curation as a dataflow DAG — the pipeline-API form of the
  * oracle-verified media queries (q203–q205 decode, q224 perceptual
  * near-dup, q231 embedding extraction): an opaque-payload landing zone
  * flows through ONE streaming decode pass that extracts every derived
  * feature at once (metadata + dHash bands + embedding — pixels are
  * touched exactly once and never shuffled), then a quality gate splits
  * clean/quarantine, band-pigeonhole candidates + exact Hamming find
  * near-duplicate pairs, connected components pick canonical images,
  * and the final corpus carries one embedding per surviving image.
  *
  * Scale shape mirrors CorpusPipeline's: every stage prunes the next
  * stage's input, candidate generation is an equi join (never
  * all-pairs), and each operator is the same shared implementation its
  * hard-gated query runs, so the DAG inherits the oracle coverage.
  * The decode contract is the q224/q231 resize target (18×16): a real
  * deployment resizes before this pipeline; payloads that decode to any
  * other geometry quarantine as `wrong_dims` rather than poisoning the
  * hash space.
  */
object MediaPipeline {

  private val W = 18; private val H = 16

  private val featSchema = StructType(Seq(
    // nullable: a malformed landing-zone row KEEPS its null id in the
    // quarantine (was a -1 sentinel pre-r12, which collapsed all
    // malformed rows onto one key and could collide with a legitimate
    // doc_id of -1, losing row-level traceability)
    StructField("doc_id", LongType, nullable = true),
    StructField("ok", BooleanType, nullable = false),
    StructField("reason", StringType, nullable = true),
    StructField("format", StringType, nullable = true),
    StructField("pixel_sum", LongType, nullable = true),
    StructField("b0", LongType, nullable = true),
    StructField("b1", LongType, nullable = true),
    StructField("b2", LongType, nullable = true),
    StructField("b3", LongType, nullable = true),
    StructField("emb", ArrayType(LongType, containsNull = false),
      nullable = true)))

  /** @param media landing-zone factory: (doc_id bigint, payload binary) */
  def build(spark: SparkSession, media: () => DataFrame): Registry = {
    val reg = new Registry(spark)
    reg.source("media_raw", media)

    // ONE decode pass per payload: metadata, perceptual hash, and the
    // q231 linear-encoder embedding extracted together — a corrupt or
    // off-contract payload becomes a classified row, never an exception
    reg.register(TableDef("media_features", Seq("media_raw"), {
      case Seq(raw) =>
        raw.select(col("doc_id").cast("long"), col("payload").cast("binary"))
          .mapPartitions { rows =>
            rows.map { r =>
              // a null id is a malformed landing-zone row — classify it
              // with its id kept NULL (quarantine-traceable), never NPE
              val bytes = if (r.isNullAt(1)) Array.empty[Byte]
                else r.getAs[Array[Byte]](1)
              if (r.isNullAt(0))
                Row(null, false, "null_id", null, null,
                  null, null, null, null, null)
              else {
                val id = r.getLong(0)
                ImageCodec.decode(bytes) match {
                  case None =>
                    Row(id, false, "undecodable", null, null,
                      null, null, null, null, null)
                  case Some(dec) if dec.width != W || dec.height != H =>
                    Row(id, false, "wrong_dims", dec.format, null,
                      null, null, null, null, null)
                  case Some(dec) =>
                    var ps = 0L
                    var i = 0
                    while (i < dec.channels.length) {
                      ps += dec.channels(i) & 0xFF; i += 1
                    }
                    val bands = ImageCodec.dHashBands(dec)
                    Row(id, true, null, dec.format, ps,
                      bands(0), bands(1), bands(2), bands(3),
                      ImageCodec.linearEmbedding(dec).toSeq)
                }
              }
            }
          }(Encoders.row(featSchema))
    }, mode = Mode.Incremental))

    reg.register(TableDef("media_clean", Seq("media_features"), {
      case Seq(f) => f.filter(col("ok"))
    }, mode = Mode.Incremental))

    reg.register(TableDef("media_quarantine", Seq("media_features"), {
      case Seq(f) => f.filter(!col("ok"))
        .select("doc_id", "reason", "format")
    }, mode = Mode.Incremental))

    // q224's pigeonhole: Hamming <= 3 implies at least one equal band
    reg.register(TableDef("media_neardup_pairs", Seq("media_clean"), {
      case Seq(clean) =>
        val bands = clean.select(col("doc_id"), col("b0"), col("b1"),
          col("b2"), col("b3"),
          posexplode(array(col("b0"), col("b1"), col("b2"), col("b3"))))
          .withColumnRenamed("pos", "band").withColumnRenamed("col", "bv")
        bands.alias("a").join(bands.alias("b"),
            col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
              && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            (bit_count(col("a.b0").bitwiseXOR(col("b.b0"))) +
              bit_count(col("a.b1").bitwiseXOR(col("b.b1"))) +
              bit_count(col("a.b2").bitwiseXOR(col("b.b2"))) +
              bit_count(col("a.b3").bitwiseXOR(col("b.b3"))))
              .cast("long").as("hamming"))
          .dropDuplicates("doc_a", "doc_b")
          .filter(col("hamming") <= 3)
    }, mode = Mode.Full))

    // q77's device: smallest reachable doc_id canonicalizes each family
    reg.register(TableDef("media_canonical",
      Seq("media_neardup_pairs", "media_clean"), {
      case Seq(pairs, clean) =>
        val comp = Relational.connectedComponents(
          pairs.select("doc_a", "doc_b"), "doc_a", "doc_b")
          .select(col("node").as("doc_id"), col("comp").as("canonical_id"))
        // singletons (no near-dup edge) canonicalize to themselves
        clean.select(col("doc_id")).join(comp, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("canonical_id"), col("doc_id")).as("canonical_id"))
    }, mode = Mode.Full))

    // the deduplicated media corpus: one representative per family,
    // carrying its extracted embedding for downstream retrieval
    reg.register(TableDef("media_corpus",
      Seq("media_canonical", "media_clean"), {
      case Seq(canon, clean) =>
        canon.filter(col("doc_id") === col("canonical_id"))
          .select("doc_id")
          .join(clean, Seq("doc_id"))
          .select("doc_id", "format", "pixel_sum", "emb")
    }, mode = Mode.Full))

    reg
  }
}
