package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — the FastCDC/LBFS family's idea at
  * word granularity: a chunk boundary falls AFTER every word whose
  * (portable md5) hash is ≡ 0 mod `mod`, so boundaries depend only on
  * LOCAL content, never on absolute position. That is the property that
  * makes CDC the storage- and corpus-dedup workhorse: inserting or
  * deleting a word reshapes only the chunk containing the edit — every
  * later boundary re-aligns (verified as a spec property), where
  * fixed-size chunking shifts ALL downstream chunks and destroys their
  * dedupability. Expected chunk length is `mod` words.
  *
  * Scale shape: posexplode is row-local; the running boundary count is
  * a window PARTITIONED BY doc (per-doc sort, never global); chunk
  * reassembly is one hash aggregation on (doc, chunk_id) using the
  * sorted-collect device (q47 convention). Everything downstream
  * (duplicate-chunk counting, byte savings) is dictionary-shaped.
  */
object Chunking {

  /** One row per chunk: (doc, chunk_id, chunk, n_words). `mod` is the
    * gear divisor (expected words/chunk). The hash criterion is the
    * portable-md5 device, mirrored in SQL as
    * `CAST(CONCAT('0x', SUBSTRING(MD5(w), 1, 8)) AS BIGINT) % mod = 0`. */
  def cdcChunks(df: DataFrame, doc: Column, text: Column,
                mod: Int = 8): DataFrame = {
    val words = df
      .select(doc.as("__doc"), posexplode(split(text, " ")).as(Seq("i", "w")))
    val flagged = words.withColumn("brk",
      (expr("cast(conv(substring(md5(w), 1, 8), 16, 10) AS bigint)")
        % mod === 0).cast("long"))
    val assigned = flagged.withColumn("chunk_id", coalesce(
      sum(col("brk")).over(Window.partitionBy(col("__doc")).orderBy(col("i"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    assigned
      .groupBy(col("__doc").as("doc"), col("chunk_id"))
      .agg(
        array_join(expr(
          "transform(array_sort(collect_list(struct(i, w))), x -> x.w)"),
          " ").as("chunk"),
        count(lit(1)).as("n_words"))
  }
}
