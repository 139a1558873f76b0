package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Relational

class ExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("graft_cosine equals the HOF zip_with/aggregate formulation bit-for-bit") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, -0.2, 0.3), Array(-0.4, 0.5, -0.6)))
      .toDF("a", "b")
    val rows = df.select(
      expr("graft_cosine(a, b)").as("native"),
      (expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
        / (expr("sqrt(aggregate(a, 0D, (acc, x) -> acc + x*x))")
          * expr("sqrt(aggregate(b, 0D, (acc, x) -> acc + x*x))"))).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("graft_cosine returns null for mismatched lengths and zero vectors") {
    val sp = spark
    import sp.implicits._
    val r1 = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
      .select(expr("graft_cosine(a, b)")).head()
    assert(r1.isNullAt(0))
    val r2 = Seq((Array(0.0, 0.0), Array(1.0, 2.0))).toDF("a", "b")
      .select(expr("graft_cosine(a, b)")).head()
    assert(r2.isNullAt(0))
  }

  test("graft_minhash equals per-permutation min(xxhash64(h, p))") {
    val sp = spark
    import sp.implicits._
    val df = Seq(("d1", 11L), ("d1", 22L), ("d1", 33L), ("d2", 11L))
      .toDF("doc", "h")
    val native = df.groupBy("doc").agg(expr("graft_minhash(h, 8)").as("mh"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val perCol = df.groupBy("doc")
      .agg(array((0 until 8).map(p => min(xxhash64(col("h"), lit(p)))): _*)
        .as("mh"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(native === perCol)
  }

  test("graft_lsh_bucket equals the HOF hyperplane formulation") {
    val df = TestSpark.spark.read
      .parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val rows = df.select(
      expr("graft_lsh_bucket(v)").as("native"),
      expr("""
        aggregate(sequence(0, 7), 0, (acc, p) -> acc + IF(
          aggregate(zip_with(
            transform(sequence(0, 63),
              i -> ((1103515245L * (p*64 + i) + 12345L) % 2147483648L)
                   / 2147483648.0 - 0.5),
            v, (x, y) -> x * y), 0D, (a, x) -> a + x) > 0,
          shiftleft(1, p), 0))""").as("hof"))
      .collect()
    assert(rows.length === 500)
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("aggregate buffers survive serde round-trips") {
    val mh = graft.expressions.MinHashSignature(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), numPerms = 16)
    val buf = mh.createAggregationBuffer()
    buf(3) = 42L; buf(7) = -9L
    assert(mh.deserialize(mh.serialize(buf)).toSeq === buf.toSeq)
    val sh = graft.expressions.SimHashSignature(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), bits = 12)
    val vb = sh.createAggregationBuffer()
    vb(0) = 5; vb(11) = -3
    assert(sh.deserialize(sh.serialize(vb)).toSeq === vb.toSeq)
    // empty-group eval: minhash -> null, simhash -> all-zero votes -> 0L
    assert(mh.eval(mh.createAggregationBuffer()) === null)
    assert(sh.eval(sh.createAggregationBuffer()) === 0L)
  }

  test("graft_topk: ties, short groups, and merge order are deterministic") {
    val sp = spark
    import sp.implicits._
    // group a: a tie on ord=5.0 resolves to the smaller id; group b has
    // fewer rows than k; 7 partitions force map-side partial buffers to
    // merge in arbitrary order
    val df = Seq(
      ("a", 5.0, 30L), ("a", 5.0, 10L), ("a", 9.0, 40L), ("a", 1.0, 2L),
      ("a", 5.0, 20L), ("b", 3.0, 7L))
      .toDF("k", "ord", "id").repartition(7)
    val out = df.groupBy("k")
      .agg(org.apache.spark.sql.functions.expr("graft_topk(ord, id, 3)").as("t"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(p => (p.getDouble(0), p.getLong(1)))).toMap
    assert(out("a") === Seq((9.0, 40L), (5.0, 10L), (5.0, 20L)))
    assert(out("b") === Seq((3.0, 7L)))
    // buffer serde round-trip
    val tk = graft.expressions.BoundedTopK(
      org.apache.spark.sql.catalyst.expressions.Literal(1.0),
      org.apache.spark.sql.catalyst.expressions.Literal(1L), k = 4)
    val buf = tk.createAggregationBuffer()
    buf.offer(2.0, 5L); buf.offer(7.0, 1L); buf.offer(2.0, 3L)
    val back = tk.deserialize(tk.serialize(buf))
    assert((0 until back.size).map(j => (back.ords(j), back.ids(j)))
      === Seq((7.0, 1L), (2.0, 3L), (2.0, 5L)))
    assert(tk.eval(tk.createAggregationBuffer()) === null)
    // NaN ords (graft_cosine of a zero vector) take Double.compare's
    // total order — above +∞, id tie-break — instead of arrival order
    val nb = tk.createAggregationBuffer()
    nb.offer(Double.NaN, 9L); nb.offer(3.0, 1L)
    nb.offer(Double.NaN, 4L); nb.offer(Double.PositiveInfinity, 6L)
    assert((0 until nb.size).map(j => (nb.ords(j), nb.ids(j))).map {
      case (o, i) => (if (o.isNaN) "NaN" else o.toString, i)
    } === Seq(("NaN", 4L), ("NaN", 9L), ("Infinity", 6L), ("3.0", 1L)))
    // -0.0 canonicalizes: it ties with +0.0 and resolves by id
    val zb = tk.createAggregationBuffer()
    zb.offer(-0.0, 7L); zb.offer(0.0, 2L)
    assert((0 until zb.size).map(j => zb.ids(j)) === Seq(2L, 7L))
  }

  test("q105's per-row signature path is bit-identical to the aggregate") {
    // The incremental-dedup stream side cannot window or aggregate, so
    // it recomputes shingles and the 128-slot MinHash per row with
    // nested array lambdas; history keeps the fast MinHashSignature
    // aggregate. Both must walk the SAME seed-42 XXH64 chain or band
    // keys never collide across the two paths and recall silently
    // drops to zero.
    import org.apache.spark.sql.functions._
    val docs = spark.createDataFrame(Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "x y z w"),
      (4L, "one two three four five six seven"))).toDF("doc_id", "text")
    val agg = graft.queries.DedupQueries.docSignatures(spark, docs)
      .select("doc_id", "mh").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val perRow = docs
      .withColumn("words", split(col("text"), " "))
      .withColumn("shs", expr(
        "transform(sequence(1, size(words) - 2), i -> " +
          "xxhash64(element_at(words, i), element_at(words, i + 1), " +
          "element_at(words, i + 2)))"))
      .withColumn("mh", expr("transform(sequence(0, 127), p -> " +
        "array_min(transform(shs, s -> xxhash64(s, CAST(p AS INT)))))"))
      .select("doc_id", "mh").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(perRow === agg)
    // and the tight-loop row expression q105 now actually uses (r16:
    // the nested-lambda form above was the stream side's dominant
    // interpreter cost) walks the same chain bit-for-bit
    val rowExpr = docs
      .withColumn("words", split(col("text"), " "))
      .withColumn("shs", expr(
        "transform(sequence(1, size(words) - 2), i -> " +
          "xxhash64(element_at(words, i), element_at(words, i + 1), " +
          "element_at(words, i + 2)))"))
      .withColumn("mh", expr("graft_minhash_row(shs, 128)"))
      .select("doc_id", "mh").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rowExpr === agg)
  }

  test("rangeJoinBinned equals the naive theta join") {
    val sp = spark
    import sp.implicits._
    def mk(rows: Seq[(String, String, String)], p: String) =
      rows.toDF("k", "s", "e").select($"k",
        to_timestamp($"s").as(s"${p}_s"), to_timestamp($"e").as(s"${p}_e"))
    val l = mk(Seq(
      ("u", "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
      ("u", "2024-01-01 12:00:00", "2024-01-01 12:30:00"),
      ("w", "2024-01-01 10:00:00", "2024-01-01 11:00:00")), "l")
    val r = mk(Seq(
      ("u", "2024-01-01 10:30:00", "2024-01-01 10:45:00"), // inside 1st
      ("u", "2024-01-01 10:59:00", "2024-01-01 12:10:00"), // spans 1st+2nd
      ("u", "2024-01-01 11:00:00", "2024-01-01 11:30:00"), // touches only (exclusive)
      ("x", "2024-01-01 10:30:00", "2024-01-01 10:45:00")), "r")
    val binned = Relational.rangeJoinBinned(l, r,
      $"l_s", $"l_e", $"r_s", $"r_e", Seq("k"), binSeconds = 600L)
      .select("k", "l_s", "r_s").collect()
      .map(x => (x.getString(0), x.getTimestamp(1), x.getTimestamp(2))).toSeq.sorted
    val naive = l.join(r, Seq("k"))
      .filter($"l_s" < $"r_e" && $"l_e" > $"r_s")
      .select("k", "l_s", "r_s").collect()
      .map(x => (x.getString(0), x.getTimestamp(1), x.getTimestamp(2))).toSeq.sorted
    assert(binned === naive)
    assert(naive.size === 3)
  }

  test("graft_normalize matches java.text.Normalizer across all four forms") {
    val sp = spark
    import sp.implicits._
    import java.text.Normalizer
    val samples = Seq(
      "plain ascii",
      "e\u0301 combining acute", // NFC -> precomposed \u00E9
      "\u00E9 precomposed",      // NFD -> e + \u0301
      "\uFB01le ligature",       // NFKC -> "file"
      "\u2460 circled one",      // NFKC -> "1"
      "mixed \u00E9 e\u0301 \uFB01",
      "")
    val df = samples.toDF("s")
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val got = df.selectExpr(s"graft_normalize(s, '$form') AS n")
        .collect().map(_.getString(0)).toSeq
      val want = samples.map(
        Normalizer.normalize(_, Normalizer.Form.valueOf(form)))
      assert(got === want, s"form $form")
      // idempotence: normalize ∘ normalize = normalize
      val twice = df.selectExpr(
        s"graft_normalize(graft_normalize(s, '$form'), '$form') AS n")
        .collect().map(_.getString(0)).toSeq
      assert(twice === want, s"$form not idempotent")
    }
    // default form is NFC; nulls pass through
    assert(Seq[String](null).toDF("s")
      .selectExpr("graft_normalize(s)").head().isNullAt(0))
    assert(df.selectExpr("graft_normalize(s)").collect().map(_.getString(0)).toSeq
      === samples.map(Normalizer.normalize(_, Normalizer.Form.NFC)))
    // NFC collapses the combining pair to ONE code point (what q208's
    // length columns measure)
    assert(Seq("é").toDF("s")
      .selectExpr("length(graft_normalize(s)) AS n").head().getInt(0) === 1)
  }
}
