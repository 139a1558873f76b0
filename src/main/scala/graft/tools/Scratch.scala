package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc local probe main; not part of the engine API. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(16)
    val d = "/root/testdata/sf0.1"
    spark.read.parquet(d + "/lineitem.parquet").count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    import graft.queries.QH._

    val hashed = t(spark, d, "documents")
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"), expr(
        "transform(array_distinct(transform(sequence(1, size(words) - 2), " +
          "i -> concat_ws(' ', words[i-1], words[i], words[i+1]))), " +
          "s -> xxhash64(s))").as("hs"))
      .cache()
    time("hash shingles")(hashed.count())
    val ex = hashed.select(col("doc_id"), explode(col("hs")).as("h"))
    val mhCols = (0 until 128).map(p =>
      min(xxhash64(col("h"), lit(p))).as(s"m$p"))
    val docs = ex.groupBy("doc_id")
      .agg(mhCols.head, mhCols.tail: _*)
      .select(col("doc_id"),
        array((0 until 128).map(p => col(s"m$p")): _*).as("mh"))
      .cache()
    time("minhash agg")(docs.count())
    val bands = docs.select(col("doc_id"), posexplode(expr(
      "transform(sequence(0, 63), b -> struct(mh[2*b] as h1, mh[2*b+1] as h2))")))
      .select(col("doc_id"), col("pos").as("band"), col("col.h1"), col("col.h2"))
    time("bands")(bands.count())
    val cand = bands.as("x").join(bands.as("y"), Seq("band", "h1", "h2"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .distinct()
    time("candidates")(cand.count())
    time("cand again")(cand.count())
    val ver = cand
      .join(hashed.select(col("doc_id").as("doc_a"), col("hs").as("hsa")), "doc_a")
      .join(hashed.select(col("doc_id").as("doc_b"), col("hs").as("hsb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("hsa"), col("hsb"))))
      .withColumn("jaccard", round(col("inter").cast("double")
        / (size(col("hsa")) + size(col("hsb")) - col("inter")), 6))
      .filter(col("inter").cast("double")
        / (size(col("hsa")) + size(col("hsb")) - col("inter")) >= 0.6)
    time("verify")(ver.count())
    spark.stop()
  }
}
