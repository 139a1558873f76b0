package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Catalog

/** Semantic invariants for q262 blocked record linkage beyond the
  * DuckDB hash gate: the multi-pass blocking must miss EXACTLY the
  * pairs where both passes break, and every surviving true pair must
  * clear the link threshold.
  */
class RecordLinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("q262: misses are exactly the double-corruption residue; " +
    "every candidate true pair links") {
    val out = Catalog.byName("q262_record_linkage").run(spark, d).cache()
    val customers = queries.QH.t(spark, d, "customer")
      .select(col("c_custkey").cast("long").as("k")).cache()
    val n = customers.count()
    // true links recovered: all except k % 15 == 10 (balance AND
    // nation corrupted — both blocking passes break, by design)
    val trueLinks = out.filter(col("is_true")).select(col("a_key"))
    val missed = customers.join(trueLinks,
      customers("k") === trueLinks("a_key"), "left_anti")
    assert(missed.filter(col("k") % 15 =!= 10).count() === 0,
      "only the %15=10 residue may be missed")
    assert(missed.count() ===
      customers.filter(col("k") % 15 === 10).count(),
      "the %15=10 residue must be missed entirely (both passes break)")
    // linked pairs all clear the scale-aware threshold bitlen(N)
    val thresh = 64 - java.lang.Long.numberOfLeadingZeros(n)
    assert(out.filter(col("score") < thresh).count() === 0)
    // false links, if any, are balance collisions: a_key's balance
    // equals b_key's (possibly perturbed) balance by data coincidence —
    // they must agree on at least the two high-information fields'
    // worth of bits (score ≥ w_bal + w_seg), never on the unique name
    val falseLinks = out.filter(!col("is_true")).count()
    assert(falseLinks + out.filter(col("is_true")).count() === out.count())
    assert(out.count() >= n - n / 15 - 1 && out.count() <= n + 20,
      s"pair volume should stay ~linear in the registry (got ${out.count()})")
  }
}
