package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.graph.ManifestStore

/** partKey/decodeKey are the manifest's bridge to Spark's hive-dir
  * encoding — decodeKey MUST invert partKey for every value the store
  * supports, or manifest-level pruning (readWhere/readSkipping) would
  * silently mis-filter partitions whose values hive-escape. Exercised
  * over adversarial strings (path separators, '=', '%', spaces,
  * unicode), multi-column tuples, and the null partition. */
object ManifestKeyProperties extends Properties("graft.manifestkey") {

  private val valueGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.suchThat(_.nonEmpty),
    Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('/', '=', '%', ' ', ':', '#', '\\',
        '+', '.', '-', '日', 'é'))).map(_.mkString))

  private val tupleGen: Gen[List[(String, Option[String])]] = for {
    n <- Gen.choose(1, 3)
    cols <- Gen.listOfN(n, Gen.identifier.suchThat(_.nonEmpty))
      .suchThat(cs => cs.distinct.size == cs.size)
    vals <- Gen.listOfN(n, Gen.option(valueGen))
  } yield cols.zip(vals)

  property("decodeKey inverts partKey for escaped values and nulls") =
    Prop.forAll(tupleGen) { tuple =>
      val cols = tuple.map(_._1)
      val vals = tuple.map(_._2.orNull)
      val key = ManifestStore.encodeKeyForTest(cols, vals)
      val decoded = ManifestStore.decodeKey(key)
      decoded == tuple.map { case (c, v) => c -> v.orNull }.toMap
    }
}
