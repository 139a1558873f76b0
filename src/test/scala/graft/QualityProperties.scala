package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the round-10 cleaning/scheduling devices: identity
  * and partition invariants that must hold on ANY corpus, not just the
  * oracle-gated one. */
object QualityProperties extends Properties("graft.quality") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "hot")
  private val docGen = for {
    n <- Gen.choose(1, 30)
    ws <- Gen.listOfN(n, wordGen)
  } yield ws.mkString(" ")

  /** The q143 prune pipeline over (doc_id, text) with a threshold. */
  private def prune(docs: Seq[(Long, String)], threshold: Long) = {
    val sp = spark
    import sp.implicits._
    val df = docs.toDF("doc_id", "text")
    val segs = df.select(col("doc_id"), posexplode(expr(
      """transform(
        |  sequence(0, cast(ceil(size(split(text, ' ')) / 8.0d) as int) - 1),
        |  k -> concat_ws(' ', slice(split(text, ' '), k * 8 + 1, 8)))"""
        .stripMargin)).as(Seq("pos", "seg")))
    val freq = segs.groupBy("seg").agg(count(lit(1)).as("cnt"))
    segs.join(freq, "seg").filter(col("cnt") < threshold)
      .groupBy("doc_id")
      .agg(concat_ws(" ", expr(
        "transform(sort_array(collect_list(struct(pos, seg))), x -> x.seg)"))
        .as("new_text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  property("q143 prune at threshold=∞ is the identity rewrite") =
    Prop.forAll(Gen.listOfN(8, docGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val out = prune(docs, Long.MaxValue)
      docs.forall { case (id, t) => out.get(id).contains(t) }
    }

  property("q143 pruned text never contains a corpus-hot segment") =
    Prop.forAll(Gen.listOfN(10, docGen), Gen.choose(2L, 4L)) {
      (texts, threshold) =>
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        // recompute segment frequencies brute-force on the driver
        def segsOf(t: String): Seq[String] =
          t.split(" ").grouped(8).map(_.mkString(" ")).toSeq
        val freq = docs.flatMap(d => segsOf(d._2))
          .groupBy(identity).view.mapValues(_.size)
        val out = prune(docs, threshold)
        docs.forall { case (id, t) =>
          val kept = out.getOrElse(id, "")
          val keptSegs = segsOf(t).filter(s => freq(s) < threshold)
          kept == keptSegs.mkString(" ")
        }
    }

  property("q140-style interleave: slots are contiguous 1..n per band") =
    Prop.forAll(Gen.listOfN(40, Gen.choose(0, 99)), Gen.choose(1, 6)) {
      (scores, parts) =>
        val sp = spark
        import sp.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("band").orderBy(asc("h"), asc("id"))
        val got = scores.zipWithIndex
          .map { case (s, i) => (i.toLong, s / 10) }
          .toDF("id", "band").repartition(parts)
          .withColumn("h", md5(col("id").cast("string")))
          .withColumn("slot", row_number().over(w))
          .collect().map(r => (r.getInt(1), r.getInt(3)))
        got.groupBy(_._1).forall { case (_, rows) =>
          rows.map(_._2).sorted.sameElements(1 to rows.size)
        }
    }
}
