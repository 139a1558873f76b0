package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Catalog

/** Semantic invariants for the LM-based curation pair (q260 perplexity
  * filter, q261 DSIR importance sampling) beyond the DuckDB hash gate:
  * the integer-bits scores must reconcile with independently computed
  * per-doc n-gram counts, and the DSIR likelihood ratio must actually
  * PREFER the target domain it was fit to.
  */
class LmCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  private def docs = queries.QH.t(spark, d, "documents")

  test("q260: n_trigrams equals size(words)-2 per kept doc, and tier " +
    "matches the integer thresholds") {
    val out = Catalog.byName("q260_lm_perplexity_filter").run(spark, d)
    val expected = docs
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .filter(col("n") >= 3)
      .select(col("doc_id"), (col("n") - 2).cast("long").as("want"))
    // every kept doc appears exactly once with the exact trigram count
    val joined = out.join(expected, Seq("doc_id"), "full")
    assert(joined.filter(col("n_trigrams").isNull || col("want").isNull ||
      col("n_trigrams") =!= col("want")).count() === 0)
    // tier is a pure function of the integer pair (total_bits, n_trigrams)
    val badTier = out.filter(
      when(col("total_bits") <= col("n_trigrams") * 4,
        col("tier") =!= "head")
        .when(col("total_bits") <= col("n_trigrams") * 9,
          col("tier") =!= "middle")
        .otherwise(col("tier") =!= "tail"))
    assert(badTier.count() === 0)
    // bits are whole numbers in a sane LM range
    assert(out.filter(col("total_bits") < 0 ||
      col("total_bits") > col("n_trigrams") * 64).count() === 0)
  }

  test("q261: selection is exactly top-5 per source, n_feats reconciles, " +
    "and the fitted ratio prefers the target domain") {
    val out = Catalog.byName("q261_dsir_importance_sampling").run(spark, d)
      .cache()
    val perSource = out.groupBy("source").agg(
      sum(when(col("selected"), 1L).otherwise(0L)).as("n_sel"),
      count(lit(1)).as("n_docs"))
    assert(perSource.filter(
      col("n_sel") =!= least(lit(5L), col("n_docs"))).count() === 0)
    val expected = docs
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .filter(col("n") >= 2)
      .select(col("doc_id"), (col("n") - 1).cast("long").as("want"))
    assert(out.join(expected, "doc_id")
      .filter(col("n_feats") =!= col("want")).count() === 0)
    // DSIR's whole point: target-domain (en) documents carry higher
    // importance than the rest under the target/raw likelihood ratio
    val withLang = out.join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg(col("score").cast("double") / col("n_feats")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(withLang(true) > withLang(false),
      s"en mean per-feature score ${withLang(true)} should exceed " +
        s"non-en ${withLang(false)}")
  }
}
