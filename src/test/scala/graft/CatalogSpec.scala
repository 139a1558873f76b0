package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Catalog

/** End-to-end smoke over the full query inventory at sf0.001 plus
  * cross-query invariants (LSH recall vs exact ground truth). */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("no duplicate query names; oracle keys ⊆ query keys") {
    val names = Catalog.all.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  // anti-join may legitimately return 0 rows
  private val mayBeEmpty = Set("q20_anti_join")

  Catalog.all.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val n = q.run(spark, d).count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("MinHash-LSH finds exactly the exact-Jaccard pairs") {
    val exact = Catalog.byName("q27_jaccard_pairs").run(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Catalog.byName("q28_minhash_lsh").run(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact)
  }

  test("LSH ANN neighbors are a subset of brute-force candidates' buckets") {
    val bf = Catalog.byName("q30_knn_bruteforce").run(spark, d).count()
    val lsh = Catalog.byName("q31_knn_lsh").run(spark, d).count()
    assert(bf > 0 && lsh > 0 && lsh <= bf)
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
