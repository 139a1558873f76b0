package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Catalog

/** Invariants of the round-10 resolution/planning additions (q182–q188)
  * beyond the DuckDB hash gate: each test re-derives the operator's
  * defining property from the raw tables (or from the output's own
  * internal consistency), so a future rewrite cannot silently change
  * semantics while still producing hash-stable rows.
  */
class ResolutionOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("q182: covered time equals a brute-force interval union per user") {
    val out = Catalog.byName("q182_interval_coverage").run(spark, d)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_islands"), r.getAs[Long]("covered_s"),
          r.getAs[Long]("span_s"))).toMap
    // brute force: merge each user's sorted intervals in driver code
    val iv = graft.tables.Tables.load(spark, d, "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("s"),
        (unix_timestamp(col("ts")) + lit(60L) +
          floor(col("value") * 10).cast("long")).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    iv.foreach { case (u, rows) =>
      val sorted = rows.map(t => (t._2, t._3)).sortBy(identity)
      var islands = 0; var covered = 0L
      var curS = Long.MinValue; var curE = Long.MinValue
      sorted.foreach { case (s, e) =>
        if (s > curE) {
          if (islands > 0) covered += curE - curS
          islands += 1; curS = s; curE = e
        } else if (e > curE) curE = e
      }
      covered += curE - curS
      val (gotIslands, gotCovered, gotSpan) = out(u)
      assert(gotIslands === islands.toLong, s"user $u islands")
      assert(gotCovered === covered, s"user $u covered")
      assert(gotSpan === sorted.map(_._2).max - sorted.head._1,
        s"user $u span")
      assert(gotCovered <= gotSpan)
    }
    assert(out.keySet === iv.keySet, "one output row per active user")
  }

  test("q183: rules are canonical-ordered, thresholded, and match a recount") {
    val rows = Catalog.byName("q183_assoc_rules").run(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("x") < r.getAs[String]("y"),
        "pairs must be canonical x < y")
      assert(r.getAs[Long]("cxy") >= 20L, "support threshold")
      val (cXY, cYX) =
        (r.getAs[Double]("conf_xy"), r.getAs[Double]("conf_yx"))
      assert(cXY > 0 && cXY <= 1 && cYX > 0 && cYX <= 1)
    }
    // recount one rule's support from the raw tables
    val (x, y, cxy) = (rows.head.getAs[String]("x"),
      rows.head.getAs[String]("y"), rows.head.getAs[Long]("cxy"))
    val items = graft.tables.Tables.load(spark, d, "lineitem")
      .join(graft.tables.Tables.load(spark, d, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("item"))
      .distinct()
    val recount = items.filter(col("item") === x).select("ok")
      .intersect(items.filter(col("item") === y).select("ok")).count()
    assert(recount === cxy, s"rule ($x,$y) support")
  }

  test("q184: buckets are equi-depth, exhaustive, and range-monotone") {
    val rows = Catalog.byName("q184_equidepth_histogram").run(spark, d)
      .orderBy("bucket").collect()
    assert(rows.map(_.getAs[Int]("bucket")).toSeq === (0 until 8))
    val n = graft.tables.Tables.load(spark, d, "lineitem").count()
    assert(rows.map(_.getAs[Long]("cnt")).sum === n, "counts cover the table")
    val target = n.toDouble / 8
    rows.foreach { r =>
      assert(math.abs(r.getAs[Long]("cnt") - target) <= target * 0.02 + 2,
        s"bucket ${r.get(0)} depth ${r.get(1)} vs target $target")
      assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi"))
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"),
        "bucket ranges must not overlap")
    case _ => ()
    }
  }

  test("q185: golden record is the max-quality member; merges are consistent") {
    val rows = Catalog.byName("q185_survivorship").run(spark, d).collect()
    val docs = graft.tables.Tables.load(spark, d, "documents")
      .select(col("doc_id"), col("n_chars"),
        md5(substring(col("text"), 1, 50)).as("blk"))
      .collect().map(r => (r.getString(2), r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
    // output rows = exactly the multi-member blocks
    val multi = docs.filter(_._2.size > 1)
    assert(rows.map(_.getAs[String]("blk")).toSet === multi.keySet)
    rows.foreach { r =>
      val members = multi(r.getAs[String]("blk"))
      assert(r.getAs[Long]("n_members") === members.size.toLong)
      assert(r.getAs[Long]("canonical_chars") === members.map(_._3).max,
        "canonical must carry the block's max n_chars")
      assert(r.getAs[Long]("total_chars") === members.map(_._3).sum)
      assert(r.getAs[Long]("first_doc") === members.map(_._2).min)
      assert(members.map(_._2).contains(r.getAs[Long]("canonical_doc")))
    }
  }

  test("q186: rendezvous routing is total, in-range, and deterministic") {
    val run1 = Catalog.byName("q186_rendezvous_shard").run(spark, d).collect()
    val run2 = Catalog.byName("q186_rendezvous_shard").run(spark, d).collect()
    assert(run1.toSeq === run2.toSeq, "routing must be reproducible")
    val nDocs = graft.tables.Tables.load(spark, d, "documents").count()
    assert(run1.map(_.getAs[Long]("n_docs")).sum === nDocs,
      "every document lands on exactly one shard")
    run1.foreach(r => assert((0 until 8).contains(r.getAs[Int]("shard"))))
  }

  test("q187: seasonal indices average to 1 under dow weights") {
    val rows = Catalog.byName("q187_seasonal_index").run(spark, d).collect()
    rows.foreach { r =>
      assert((0 to 6).contains(r.getAs[Int]("dow")))
      assert(r.getAs[Double]("seasonal_index") > 0)
    }
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val n = rs.map(_.getAs[Long]("n")).sum.toDouble
      val wmean = rs.map(r =>
        r.getAs[Long]("n") * r.getAs[Double]("seasonal_index")).sum / n
      assert(math.abs(wmean - 1.0) < 0.01,
        s"$t: dow-weighted mean index $wmean must be ~1")
    }
  }

  test("q189: Gini matches a driver-side recompute and sits in [0, 1)") {
    val rows = Catalog.byName("q189_gini_concentration").run(spark, d).collect()
    assert(rows.nonEmpty)
    val totals = graft.tables.Tables.load(spark, d, "events")
      .groupBy("event_type", "user_id")
      .agg(sum(col("value").cast("decimal(28,6)")).cast("double").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= 0.0 && g < 1.0)
      val xs = totals(r.getAs[String]("event_type"))
        .sortBy(t => (t._3, t._2)).map(_._3)
      val n = xs.size.toDouble
      val brute = 2.0 * xs.zipWithIndex.map { case (x, i) =>
        (i + 1) * x }.sum / (n * xs.sum) - (n + 1.0) / n
      assert(math.abs(g - brute) < 1e-4,
        s"${r.get(0)}: gini $g vs brute $brute")
    }
  }

  test("q190: deciles cover the corpus and lift averages to the base rate") {
    val rows = Catalog.byName("q190_decile_lift").run(spark, d).collect()
    assert(rows.map(_.getAs[Int]("decile")).sorted.toSeq === (0 until 10))
    val docs = graft.tables.Tables.load(spark, d, "documents")
    val n = docs.count()
    val pos = docs.filter(col("lang") === "en").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === n)
    assert(rows.map(_.getAs[Long]("positives")).sum === pos)
    rows.foreach { r =>
      val expect =
        r.getAs[Long]("positives") * n > r.getAs[Long]("n_docs") * pos
      assert(r.getAs[Boolean]("above_base") === expect)
    }
  }

  test("q191: each attributed purchase distributes exactly one unit of credit") {
    val rows = Catalog.byName("q191_linear_attribution").run(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach(r =>
      assert(r.getAs[Long]("n_credited") >= r.getAs[Long]("n_shared")))
    // Σ credit over touch types = number of purchases with ≥1 touch in
    // window (each splits exactly 1.0 across its touches)
    val totalCredit = rows.map(_.getAs[Double]("credit")).sum
    assert(math.abs(totalCredit - math.rint(totalCredit)) < 1e-3,
      s"total credit $totalCredit must be (near-)integral")
  }

  test("q192: recall contributions sum to 1 per truth row; cells cover corpus") {
    val rows = Catalog.byName("q192_langid_confusion").run(spark, d).collect()
    val nDocs = graft.tables.Tables.load(spark, d, "documents").count()
    assert(rows.map(_.getAs[Long]("c")).sum === nDocs)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lg, rs) =>
      val rec = rs.map(_.getAs[Double]("recall_contrib")).sum
      assert(math.abs(rec - 1.0) < 1e-4, s"truth $lg recall sums to $rec")
    }
    rows.groupBy(_.getAs[String]("pred")).foreach { case (p, rs) =>
      val prec = rs.map(_.getAs[Double]("precision_contrib")).sum
      assert(math.abs(prec - 1.0) < 1e-4, s"pred $p precision sums to $prec")
    }
  }

  test("q193: buckets are exact bit-lengths and cover every supplier") {
    val rows = Catalog.byName("q193_degree_histogram").run(spark, d).collect()
    val nSupp = graft.tables.Tables.load(spark, d, "lineitem")
      .select("l_suppkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_nodes")).sum === nSupp)
    rows.foreach { r =>
      val b = r.getAs[Int]("bucket")
      val (lo, hi) = (r.getAs[Long]("min_deg"), r.getAs[Long]("max_deg"))
      assert(lo <= hi)
      assert(lo >= (1L << (b - 1)) && hi < (1L << b),
        s"bucket $b must hold degrees in [2^${b - 1}, 2^$b)")
    }
  }

  test("q194: hashed features conserve vocabulary and mass") {
    val rows = Catalog.byName("q194_feature_hashing").run(spark, d).collect()
    val docs = graft.tables.Tables.load(spark, d, "documents")
    val vocab = docs.select(explode(split(col("text"), " ")).as("w"))
      .distinct().count()
    val tokens = docs.select(explode(split(col("text"), " ")).as("w")).count()
    assert(rows.map(_.getAs[Long]("vocab_in_bucket")).sum === vocab,
      "every vocabulary word lands in exactly one bucket")
    assert(rows.map(_.getAs[Long]("total_mass")).sum === tokens,
      "absolute mass equals the corpus token count")
    rows.foreach { r =>
      assert((0 until 32).contains(r.getAs[Int]("bucket")))
      assert(math.abs(r.getAs[Long]("total_signed")) <=
        r.getAs[Long]("total_mass"))
    }
  }

  test("q195: latency stats are ordered and match a brute-force pairing") {
    val row = Catalog.byName("q195_conversion_latency").run(spark, d).head()
    val (n, lo, p50, p90, hi) = (row.getAs[Long]("n_converted"),
      row.getAs[Long]("min_s"), row.getAs[Double]("p50_s"),
      row.getAs[Double]("p90_s"), row.getAs[Long]("max_s"))
    assert(lo <= p50 && p50 <= p90 && p90 <= hi)
    assert(lo >= 0 && hi < 86400, "24h window bounds every latency")
    // brute force: for each view, any purchase by the user in [vts, vts+24h)
    val ev = graft.tables.Tables.load(spark, d, "events")
      .select(col("event_type"), col("user_id"), unix_timestamp(col("ts")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val purchases = ev.filter(_._1 == "purchase").groupBy(_._2)
    val brute = ev.filter(_._1 == "view").count { case (_, u, vts) =>
      purchases.getOrElse(u, Array.empty[(String, Long, Long)])
        .exists(p => p._3 >= vts && p._3 < vts + 86400)
    }
    assert(n === brute.toLong, s"converted views: got $n, brute $brute")
  }

  test("q196: eval counts are consistent and truth matches q27's pair set") {
    val row = Catalog.byName("q196_minhash_eval").run(spark, d).head()
    val (cand, truth, hit) = (row.getAs[Long]("n_cand"),
      row.getAs[Long]("n_truth"), row.getAs[Long]("n_hit"))
    assert(hit <= cand && hit <= truth)
    assert(row.getAs[Double]("precision_") <= 1.0 &&
      row.getAs[Double]("recall_") <= 1.0)
    // the truth side IS q27's exact-Jaccard pair set
    val q27 = Catalog.byName("q27_jaccard_pairs").run(spark, d).count()
    assert(truth === q27, "q196 truth must equal the q27 ground truth")
    // 4 bands × 2 rows at j ≥ 0.6: per-pair miss ≤ (1−0.36)⁴ ≈ 0.17 —
    // recall should be well above half on any corpus
    assert(truth === 0 || hit.toDouble / truth > 0.5)
  }

  test("q197: datacard numbers agree with their standalone recomputes") {
    val row = Catalog.byName("q197_corpus_datacard").run(spark, d).head()
    val docs = graft.tables.Tables.load(spark, d, "documents")
    assert(row.getAs[Long]("n_docs") === docs.count())
    assert(row.getAs[Long]("n_exact_dupes") ===
      docs.count() - docs.select(md5(col("text"))).distinct().count())
    assert(row.getAs[Long]("total_tokens") ===
      docs.select(sum(size(split(col("text"), " ")).cast("long")))
        .head().getLong(0))
    assert(row.getAs[Double]("en_share") >= 0 &&
      row.getAs[Double]("en_share") <= 1)
  }

  test("q198: RBO structure — inter is monotone, bounded by depth; self-RBO = 1") {
    val rows = Catalog.byName("q198_rank_overlap").run(spark, d)
      .orderBy("depth").collect()
    assert(rows.map(_.getAs[Int]("depth")).toSeq === (1 to 20))
    rows.foreach { r =>
      assert(r.getAs[Long]("inter") <= r.getAs[Int]("depth").toLong)
      assert(r.getAs[Double]("agreement") >= 0 &&
        r.getAs[Double]("agreement") <= 1)
    }
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("inter") <= b.getAs[Long]("inter"),
          "intersection sizes are monotone in depth")
      case _ => ()
    }
    // truncated-RBO identity: an identical pair of rankings would give
    // contrib = 2^-d exactly; Σ agreement-weighted contribs ≤ Σ 2^-d
    val total = rows.map(_.getAs[Double]("contrib")).sum
    assert(total <= 1.0 - math.pow(0.5, 20) + 1e-9)
  }

  test("q199: TWAP bounds hold and covered time conserves across hour clips") {
    val rows = Catalog.byName("q199_twap").run(spark, d).collect()
    assert(rows.nonEmpty)
    val (lo, hi) = {
      val v = graft.tables.Tables.load(spark, d, "events")
        .agg(min("value"), max("value")).head()
      (v.getDouble(0), v.getDouble(1))
    }
    rows.foreach { r =>
      val tw = r.getAs[Double]("twap")
      assert(tw >= lo - 1e-9 && tw <= hi + 1e-9,
        "a weighted average cannot leave the value range")
      val cov = r.getAs[Long]("covered_us")
      assert(cov > 0 && cov <= 3600000000L,
        "per-hour coverage is bounded by the hour")
    }
    // conservation: Σ covered_us over all hours = Σ capped segment
    // durations (clipping splits, never creates or destroys, time)
    val totalCovered = rows.map(_.getAs[Long]("covered_us")).sum
    val segTotal = {
      import org.apache.spark.sql.expressions.Window
      val H = 3600000000L
      val ord = Window.partitionBy("event_type")
        .orderBy(col("ts"), col("event_id"))
      graft.tables.Tables.load(spark, d, "events")
        .select(col("event_type"), col("event_id"), col("ts"))
        .withColumn("t0", expr("unix_micros(ts)"))
        .withColumn("dur",
          least(coalesce(lead(col("t0"), 1).over(ord) - col("t0"),
            lit(H)), lit(H)))
        .filter(col("dur") > 0)
        .agg(sum("dur")).head().getLong(0)
    }
    assert(totalCovered === segTotal, "clipping must conserve total time")
  }

  test("q201: correlations are bounded, canonical, and one per type pair") {
    val rows = Catalog.byName("q201_correlation_matrix").run(spark, d).collect()
    val types = graft.tables.Tables.load(spark, d, "events")
      .select("event_type").distinct().count().toInt
    assert(rows.length === types * (types - 1) / 2,
      "exactly one row per unordered type pair")
    rows.foreach { r =>
      assert(r.getAs[String]("ta") < r.getAs[String]("tb"))
      val c = r.getAs[Double]("r")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(r.getAs[Long]("n") > 0)
    }
  }

  test("q202: each merge round shrinks the corpus by its pair count bound") {
    val rows = Catalog.byName("q202_bpe_merge_rounds").run(spark, d)
      .orderBy("round").collect()
    assert(rows.map(_.getAs[Int]("round")).toSeq === Seq(1, 2))
    val baseTokens = graft.tables.Tables.load(spark, d, "documents")
      .agg(sum(size(split(col("text"), " ")))).head().getLong(0)
    val Array(r1, r2) = rows
    // merging k non-overlapping occurrences removes exactly k tokens;
    // overlaps can only make the realized shrink smaller
    assert(r1.getAs[Long]("tokens_after") >=
      baseTokens - r1.getAs[Long]("pair_count"))
    assert(r1.getAs[Long]("tokens_after") < baseTokens,
      "round 1 must merge something")
    assert(r2.getAs[Long]("tokens_after") < r1.getAs[Long]("tokens_after"),
      "round 2 must merge something on the rewritten corpus")
    assert(r1.getAs[String]("merged").contains(" "))
  }

  test("q188: epoch profiles partition the stream; flags match their counts") {
    val rows = Catalog.byName("q188_snapshot_drift").run(spark, d).collect()
    val totals = graft.tables.Tables.load(spark, d, "events")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getAs[String]("event_type")).toSet === totals.keySet)
    rows.foreach { r =>
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(na + nb === totals(r.getAs[String]("event_type")),
        "epochs must partition the type's events")
      val expect = nb * 10 > na * 12 || nb * 10 < na * 8
      assert(r.getAs[Boolean]("count_drift") === expect,
        "count_drift must be the declared integer-ratio rule")
    }
  }
}
