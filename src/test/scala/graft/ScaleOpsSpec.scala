package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Catalog

/** Invariants of the cluster-operations family (ScaleOpsQueries) beyond
  * the CatalogSpec smoke and the DuckDB hash gate: the structural
  * guarantees each operator's 100 TB story rests on.
  */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  test("q159: CMS estimate is a one-sided bound on every probed token") {
    val rows = Catalog.byName("q159_countmin").run(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cnt, est) = (r.getAs[Long]("cnt"), r.getAs[Long]("est"))
      assert(est >= cnt, s"token ${r.get(0)}: est $est < true $cnt")
      assert(r.getAs[Boolean]("lower_bound_ok"))
    }
  }

  test("q160: compaction groups are file-count-positive and cover every file") {
    val plan = Catalog.byName("q160_compaction_plan").run(spark, d)
    val nFiles = plan.agg(sum("n_files")).head.getLong(0)
    val nOrders = graft.tables.Tables.load(spark, d, "orders").count()
    assert(nFiles === nOrders, "every file lands in exactly one group")
    // greedy cut: a group exceeds the 512 MB target by at most one file,
    // and file sizes here are ≤ ~600 so any group is < target + max file
    val maxMb = plan.agg(max("mb")).head.getDouble(0)
    assert(maxMb < 512.0 + 600.0)
    // group ids are dense from 0 within each partition
    import spark.implicits._
    val holes = plan.groupBy("part")
      .agg(min("grp").as("lo"), max("grp").as("hi"), count(lit(1)).as("n"))
      .filter($"lo" =!= 0L || $"hi" =!= $"n" - 1)
      .count()
    assert(holes === 0L, "group ids must be dense per partition")
  }

  test("q161: splits partition the event stream; train precedes test in time") {
    val splits = Catalog.byName("q161_embargo_split").run(spark, d)
    val total = splits.agg(sum("n")).head.getLong(0)
    val nEvents = graft.tables.Tables.load(spark, d, "events").count()
    assert(total === nEvents, "train+embargo+test must cover every event")
    val bySplit = splits.groupBy("split").agg(sum("n").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("embargo", 0L),
      "embargo buffer must be small relative to train")
    assert(bySplit.contains("train") && bySplit.contains("test"))
  }

  test("q162: every fused doc has at least one arm; rrf bounded by 2/61") {
    val rows = Catalog.byName("q162_rrf_fusion").run(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!(r.isNullAt(1) && r.isNullAt(2)),
        "a fused doc must come from the lexical or the dense arm")
      val rrf = r.getAs[Double]("rrf")
      assert(rrf > 0.0 && rrf <= 2.0 / 61.0 + 1e-9)
    }
  }

  test("q163: closed-form slope matches the two-pass reference per source") {
    val got = Catalog.byName("q163_group_ols").run(spark, d).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("slope"),
        r.getAs[Double]("intercept"))).toMap
    val pts = graft.tables.Tables.load(spark, d, "documents")
      .select(col("source"), col("n_chars").cast("double").as("x"),
        size(split(col("text"), " ")).cast("double").as("y"))
      .collect()
      .groupBy(_.getString(0))
    pts.foreach { case (src, rows) =>
      val xs = rows.map(_.getDouble(1)); val ys = rows.map(_.getDouble(2))
      val n = xs.length.toDouble
      val xb = xs.sum / n; val yb = ys.sum / n
      val slope = xs.zip(ys).map { case (x, y) => (x - xb) * (y - yb) }.sum /
        xs.map(x => (x - xb) * (x - xb)).sum
      assert(math.abs(got(src)._1 - slope) < 1e-4,
        s"$src: closed-form ${got(src)._1} vs two-pass $slope")
      assert(math.abs(got(src)._2 - (yb - slope * xb)) < 1e-2)
    }
  }

  test("q164: sketch forecast upper-bounds the exact join size") {
    val rows = Catalog.byName("q164_join_size_estimate").run(spark, d).collect()
    assert(rows.length === 2)
    val nEvents = graft.tables.Tables.load(spark, d, "events").count()
    rows.foreach { r =>
      val (exact, est) =
        (r.getAs[Long]("exact_pairs"), r.getAs[Long]("est_pairs"))
      assert(est >= exact, s"${r.getString(0)}: est $est < exact $exact")
    }
    // a self-join on any key yields at least one pair per row
    val self = rows.find(_.getString(0) == "events_self_user").get
    assert(self.getAs[Long]("exact_pairs") >= nEvents)
  }

  test("q165: buckets are contiguous key ranges, balanced to one key's weight") {
    val b = Catalog.byName("q165_range_planner").run(spark, d).collect()
    assert(b.nonEmpty && b.head.getAs[Long]("bucket") === 0L)
    // contiguous, non-overlapping key ranges in bucket order
    b.sliding(2).foreach {
      case Array(a, c) =>
        assert(a.getAs[Long]("hi_key") < c.getAs[Long]("lo_key"))
      case _ =>
    }
    val tw = b.map(_.getAs[Long]("total_w")).sum
    val maxKeyW = graft.tables.Tables.load(spark, d, "lineitem")
      .groupBy("l_partkey").agg(sum(col("l_quantity").cast("long")).as("w"))
      .agg(max("w")).head.getLong(0)
    b.foreach { r =>
      assert(r.getAs[Long]("total_w") <= tw / 8 + maxKeyW,
        s"bucket ${r.getAs[Long]("bucket")} overshoots the greedy bound")
    }
  }

  test("q166: hard negatives never share the query's label; sims descend") {
    import spark.implicits._
    val labels = graft.tables.Tables.load(spark, d, "embeddings")
      .select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Catalog.byName("q166_hard_negatives").run(spark, d).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (qid, rs) =>
      val ordered = rs.sortBy(_.getAs[Int]("rk"))
      ordered.foreach { r =>
        assert(labels(r.getAs[Long]("neg_id")) != labels(qid),
          s"negative shares label with query $qid")
      }
      val sims = ordered.map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  /** Canonical Hilbert xy2d reference (order 8) — the loop form of the
    * unrolled SQL in ScaleOpsQueries.hilbertSteps. */
  private def xy2d(x0: Int, y0: Int): Int = {
    var (x, y, dd) = (x0, y0, 0)
    var s = 128
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      dd += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = 255 - x; y = 255 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    dd
  }

  test("q167: unrolled SQL Hilbert index equals the canonical loop form") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(500)((rnd.nextInt(256), rnd.nextInt(256))) ++
      Seq((0, 0), (255, 255), (0, 255), (255, 0), (128, 127))
    val base = pts.toDF("x0", "y0").withColumn("d0", lit(0))
    val hil = graft.queries.ScaleOpsQueries.hilbertSteps
      .foldLeft(base) { case (df, (name, e)) => df.withColumn(name, expr(e)) }
      .select("x0", "y0", "d8").collect()
    hil.foreach { r =>
      val (x, y, got) = (r.getInt(0), r.getInt(1), r.getInt(2))
      assert(got === xy2d(x, y), s"($x,$y): sql $got != ref ${xy2d(x, y)}")
    }
  }

  test("hilbert reference walks the full grid with unit steps (locality)") {
    val byD = Array.ofDim[(Int, Int)](65536)
    for (x <- 0 until 256; y <- 0 until 256) byD(xy2d(x, y)) = (x, y)
    assert(byD.forall(_ != null), "xy2d must be a bijection on the grid")
    byD.sliding(2).foreach {
      case Array((x1, y1), (x2, y2)) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
          s"non-adjacent step at ($x1,$y1)->($x2,$y2)")
      case _ =>
    }
  }

  test("q168: date-clustered layout prunes; both layouts agree on the answer") {
    val rows = Catalog.byName("q168_zone_map_prune").run(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    val (a, b) = (rows("arrival_order"), rows("date_clustered"))
    assert(a.getAs[Long]("matching_rows") === b.getAs[Long]("matching_rows"),
      "layout must not change query results")
    assert(b.getAs[Long]("files_pruned") > a.getAs[Long]("files_pruned"))
    assert(b.getAs[Long]("rows_scanned") < a.getAs[Long]("rows_scanned"))
    Seq(a, b).foreach { r =>
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("matching_rows"))
    }
  }

  test("q170: KS statistic is a valid probability distance") {
    val r = Catalog.byName("q170_ks_test").run(spark, d).head
    val (n1, n2, dn) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
      r.getAs[Long]("d_num"))
    assert(n1 > 0 && n2 > 0)
    assert(dn >= 0 && dn <= n1 * n2, "D must normalize into [0,1]")
    val ds = r.getAs[Double]("d_stat")
    assert(ds >= 0.0 && ds <= 1.0)
  }

  test("q171: PMI pairs are canonical-ordered and ranked by ratio") {
    val rows = Catalog.byName("q171_cooccurrence_pmi").run(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pairs must be tok1 < tok2")
      assert(r.getAs[Long]("c_xy") > 0 && r.getAs[Long]("ratio") > 0)
    }
    val ratios = rows.map(_.getAs[Long]("ratio"))
    assert(ratios.zip(ratios.tail).forall { case (a, b) => a >= b })
  }

  test("q172: one attribution per purchase, non-negative gap, touch precedes") {
    import spark.implicits._
    val attr = Catalog.byName("q172_last_touch_attribution").run(spark, d)
      .collect()
    assert(attr.nonEmpty)
    val ids = attr.map(_.getAs[Long]("purchase_id"))
    assert(ids.distinct.length === ids.length,
      "a purchase must be attributed at most once")
    assert(attr.forall(_.getAs[Long]("gap_sec") >= 0L))
    val types = graft.tables.Tables.load(spark, d, "events")
      .select($"event_id", $"event_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    attr.foreach { r =>
      assert(types(r.getAs[Long]("purchase_id")) == "purchase")
      assert(types(r.getAs[Long]("touch_event_id")) != "purchase",
        "the attributed touch must not itself be a conversion")
    }
  }

  test("q173: triangle identities hold (3·tri ≤ wedges, transitivity ∈ [0,1])") {
    val r = Catalog.byName("q173_triangle_count").run(spark, d).head
    val (tri, wedges) =
      (r.getAs[Long]("n_triangles"), r.getAs[Long]("n_wedges"))
    assert(tri >= 0 && wedges >= 0)
    assert(3 * tri <= math.max(wedges, 1),
      "every triangle closes exactly three wedges")
    val t = r.getAs[Double]("transitivity")
    assert(t >= 0.0 && t <= 1.0)
    // an undirected simple graph: wedges bound by nodes choose 2 × max deg
    assert(r.getAs[Long]("n_edges") >= 0 && r.getAs[Long]("n_nodes") >= 0)
  }

  test("q174: incremental maintenance equals the full recompute") {
    import spark.implicits._
    val got = Catalog.byName("q174_incremental_agg").run(spark, d)
      .select("event_type", "n_total", "total_value").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val full = graft.tables.Tables.load(spark, d, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), graft.queries.QH.decSum($"value").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got.keySet === full.keySet)
    got.foreach { case (k, (n, s)) =>
      assert((n, s) === full(k), s"$k: merged $n/$s != recompute ${full(k)}")
    }
  }

  test("q175: salted two-phase aggregation is invisible in the result") {
    import spark.implicits._
    val got = Catalog.byName("q175_salted_agg").run(spark, d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val plain = graft.tables.Tables.load(spark, d, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), graft.queries.QH.decSum($"value").as("t"),
        min($"value").as("mn"), max($"value").as("mx"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got === plain)
  }

  test("q176: reconciliation statuses partition the ledger's keys") {
    val rows = Catalog.byName("q176_reconciliation").run(spark, d).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_keys"),
        r.getAs[Double]("total_drift"))).toMap
    val nOrders = graft.tables.Tables.load(spark, d, "orders").count()
    assert(rows.values.map(_._1).sum === nOrders,
      "every ledger key must land in exactly one status")
    assert(rows.contains("matched"))
    assert(rows("matched")._2 === 0.0, "matched keys must carry zero drift")
    rows.get("value_mismatch").foreach { case (n, drift) =>
      assert(math.abs(drift - n * 1.0) < 1e-6,
        "the simulated mismatch shifts each key by exactly 1.0")
    }
  }

  test("q177: source-overlap Jaccard is a valid (0,1] similarity") {
    val rows = Catalog.byName("q177_source_overlap").run(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "canonical src1 < src2")
      val (inter, un) = (r.getAs[Long]("inter"), r.getAs[Long]("un"))
      assert(inter > 0 && un >= inter)
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("q178: bloom honors no-false-negatives; member+probe keys partition") {
    val r = Catalog.byName("q178_bloom_fpr").run(spark, d).head
    assert(r.getAs[Boolean]("no_false_negatives"),
      "a bloom filter must never miss a member")
    assert(r.getAs[Boolean]("fpr_ok"))
    val nOrders = graft.tables.Tables.load(spark, d, "orders").count()
    assert(r.getAs[Long]("n_members") + r.getAs[Long]("n_probes") === nOrders)
  }

  test("q179: chi2 matches a direct contingency recompute for every row") {
    import spark.implicits._
    val docs = graft.tables.Tables.load(spark, d, "documents")
    val n = docs.count()
    val nEn = docs.filter($"lang" === "en").count()
    val byTok = docs
      .select($"doc_id", ($"lang" === "en").as("is_en"),
        explode(split($"text", " ")).as("tok"))
      .distinct().collect()
      .groupBy(_.getString(2))
    Catalog.byName("q179_chi2_tokens").run(spark, d).collect().foreach { r =>
      val tok = r.getString(0)
      val a = byTok(tok).count(_.getBoolean(1)).toLong
      val b = byTok(tok).size - a
      val c = nEn - a; val dd = n - nEn - b
      val num = (n * (a * dd - b * c) * (a * dd - b * c)).toDouble
      val den = math.max((a + b) * (c + dd) * (a + c) * (b + dd), 1L).toDouble
      assert(r.getAs[Long]("en_docs") === a)
      assert(math.abs(r.getAs[Double]("chi2") - num / den) < 1e-5,
        s"$tok: query chi2 ${r.getAs[Double]("chi2")} != direct ${num / den}")
    }
  }

  test("q180: digest is partition-order-free and detects a single-row change") {
    import spark.implicits._
    val q = Catalog.byName("q180_table_digest")
    val a = q.run(spark, d).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    // recompute from a differently-partitioned read: digests must agree
    val fp = "cast(conv(substring(md5(concat_ws('|', " +
      "cast(event_id as string), cast(user_id as string), event_type" +
      ")), 1, 13), 16, 10) as decimal(38,0))"
    val b = graft.tables.Tables.load(spark, d, "events")
      .repartition(13, $"user_id")
      .groupBy("event_type")
      .agg(sum(expr(fp)).cast("decimal(38,0)").cast("string").as("digest"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(a === b, "digest must not depend on partitioning")
    // drop one row → that group's digest must change, others unchanged
    val one = graft.tables.Tables.load(spark, d, "events")
      .orderBy("event_id").limit(1).select("event_id", "event_type")
      .head
    val c = graft.tables.Tables.load(spark, d, "events")
      .filter($"event_id" =!= one.getLong(0))
      .groupBy("event_type")
      .agg(sum(expr(fp)).cast("decimal(38,0)").cast("string").as("digest"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(c(one.getString(1)) != a(one.getString(1)),
      "a missing row must change its group's digest")
    (a.keySet - one.getString(1)).foreach(k => assert(c(k) === a(k)))
  }

  test("q181: z-test counts partition events; z2 is non-negative") {
    val r = Catalog.byName("q181_ab_ztest").run(spark, d).head
    val nEvents = graft.tables.Tables.load(spark, d, "events").count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") === nEvents)
    assert(r.getAs[Long]("conv_a") <= r.getAs[Long]("n_a"))
    assert(r.getAs[Long]("conv_b") <= r.getAs[Long]("n_b"))
    assert(r.getAs[Double]("z2") >= 0.0)
  }
}
