package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of q28/q67 inner pipelines. */
object Profile28 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import graft.queries.QH.t

    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val run = i.taskMetrics.executorRunTime
          val cpu = i.taskMetrics.executorCpuTime / 1000000
          if (run > 200)
            println(s"    [stage ${i.stageId}] tasks=${i.numTasks} " +
              s"run=${run}ms cpu=${cpu}ms ${i.name.take(60)}")
        }
      })

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ---- q28 stages ----
    println("q28:")
    val hashed = t(spark, dir, "documents")
      .repartition(64, col("doc_id"))
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"), expr(
        "transform(array_distinct(transform(sequence(1, size(words) - 2), " +
          "i -> concat_ws(' ', words[i-1], words[i], words[i+1]))), " +
          "s -> xxhash64(s))")
        .as("hs"))
    time("hashed shingles")(hashed.count())
    time("hashed shingles 2nd")(hashed.count())
    time("hs forced")(hashed.agg(sum(size(col("hs")))).collect())
    time("hs forced 2nd")(hashed.agg(sum(size(col("hs")))).collect())
    val ex = hashed.select(col("doc_id"), explode(col("hs")).as("h"))
    time("explode")(ex.count())
    time("explode 2nd")(ex.count())
    val docs = ex.groupBy("doc_id")
      .agg(expr("graft_minhash(h, 128)").as("mh"))
    time("minhash agg")(docs.count())
    time("minhash agg 2nd")(docs.count())
    val bands = docs.select(col("doc_id"), posexplode(expr(
      "transform(sequence(0, 63), b -> struct(mh[2*b] as h1, mh[2*b+1] as h2))")))
      .select(col("doc_id"), col("pos").as("band"),
        col("col.h1"), col("col.h2"))
    val cand = bands.as("x").join(bands.as("y"), Seq("band", "h1", "h2"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .distinct()
    time("cand pairs")(println("    n=" + cand.count()))
    time("cand pairs 2nd")(cand.count())
    val full = cand
      .join(hashed.select(col("doc_id").as("doc_a"), col("hs").as("hsa")), "doc_a")
      .join(hashed.select(col("doc_id").as("doc_b"), col("hs").as("hsb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("hsa"), col("hsb"))))
      .withColumn("jaccard", round(col("inter").cast("double")
        / (size(col("hsa")) + size(col("hsb")) - col("inter")), 6))
      .filter(col("inter").cast("double")
        / (size(col("hsa")) + size(col("hsb")) - col("inter")) >= 0.6)
    time("verify full")(full.count())
    time("verify full 2nd")(full.count())

    // ---- q67 stages ----
    println("q67:")
    val all = t(spark, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .repartition(64, col("vec_id"))
    val banks = all.select(col("vec_id"),
      posexplode(expr("graft_lsh_banks(v, 320)")).as(Seq("bank", "bucket")))
    time("banks explode")(banks.count())
    time("banks explode 2nd")(banks.count())
    val raw = banks.as("x").join(banks.as("y"), Seq("bank", "bucket"))
      .filter(col("x.vec_id") < col("y.vec_id"))
    time("raw join pairs")(println("    nraw=" + raw.count()))
    val cand2 = raw
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    time("cand2")(println("    n=" + cand2.count()))
    time("cand2 2nd")(cand2.count())
    val full2 = cand2
      .join(all.select(col("vec_id").as("vec_a"), col("v").as("qv")), "vec_a")
      .join(all.select(col("vec_id").as("vec_b"), col("v")), "vec_b")
      .withColumn("sim", round(expr("graft_cosine(qv, v)"), 6))
      .filter(col("sim") >= 0.4)
    time("verify full2")(full2.count())
    time("verify full2 2nd")(full2.count())
    spark.stop()
  }
}
