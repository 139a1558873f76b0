package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Session extension registering the engine's custom Catalyst functions
  * (`graft_cosine`, `graft_minhash`) into the SQL function registry.
  *
  * Loaded via `spark.sql.extensions=graft.expressions.GraftExtensions`
  * (set by GraftSession / Verify / Bench) or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rule: pure interval-overlap theta joins → binned equi
    // joins (see graft.plans.RangeJoinRule; gated by
    // spark.graft.rangeJoin.binWidth, default on via GraftSession)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRule)

    // planner strategy: the physical as-of join operator
    // (plans/AsOfJoinPlan → AsOfJoinExec; built via ops/AsOf.joinAsOf)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)

    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_cosine(a, b) takes two arrays")
        CosineSimilarity(children.head, children(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_l2"),
      new ExpressionInfo(classOf[SquaredL2].getName, "graft_l2"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_l2(a, b) takes two arrays")
        SquaredL2(children.head, children(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashSignature].getName, "graft_simhash"),
      (children: Seq[Expression]) => children match {
        case Seq(h) => SimHashSignature(h)
        case Seq(h, Literal(b: Int, _)) => SimHashSignature(h, b)
        case _ => throw new IllegalArgumentException(
          "graft_simhash(hash[, bits]) — bits must be an int literal")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_lsh_bucket"),
      new ExpressionInfo(classOf[LcgLshBucket].getName, "graft_lsh_bucket"),
      (children: Seq[Expression]) => children match {
        case Seq(v) => LcgLshBucket(v)
        case Seq(v, Literal(p: Int, _), Literal(d: Int, _)) =>
          LcgLshBucket(v, p, d)
        case _ => throw new IllegalArgumentException(
          "graft_lsh_bucket(vec[, planes, dim]) — int literals")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_lsh_banks"),
      new ExpressionInfo(classOf[HashLshBanks].getName, "graft_lsh_banks"),
      (children: Seq[Expression]) => children match {
        case Seq(v) => HashLshBanks(v)
        case Seq(v, Literal(b: Int, _)) => HashLshBanks(v, b)
        case Seq(v, Literal(b: Int, _), Literal(p: Int, _), Literal(d: Int, _)) =>
          HashLshBanks(v, b, p, d)
        case _ => throw new IllegalArgumentException(
          "graft_lsh_banks(vec[, banks[, planes, dim]]) — int literals")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_lcg_banks"),
      new ExpressionInfo(classOf[LcgLshBanks].getName, "graft_lcg_banks"),
      (children: Seq[Expression]) => children match {
        case Seq(v) => LcgLshBanks(v)
        case Seq(v, Literal(b: Int, _)) => LcgLshBanks(v, b)
        case Seq(v, Literal(b: Int, _), Literal(p: Int, _), Literal(d: Int, _)) =>
          LcgLshBanks(v, b, p, d)
        case _ => throw new IllegalArgumentException(
          "graft_lcg_banks(vec[, banks[, planes, dim]]) — int literals")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[BoundedTopK].getName, "graft_topk"),
      (children: Seq[Expression]) => children match {
        case Seq(o, i) => BoundedTopK(o, i)
        case Seq(o, i, Literal(k: Int, _)) => BoundedTopK(o, i, k)
        case _ => throw new IllegalArgumentException(
          "graft_topk(ord, id[, k]) — k must be an int literal")
      }))

    // Spark's OWN runtime-filter building blocks (the exact classes
    // `InjectRuntimeFilter` instantiates — not a reimplementation),
    // surfaced as SQL functions so a query can express SEMI-JOIN
    // REDUCTION explicitly: aggregate a bloom filter over the dim
    // side's join keys (bounded bytes however large the dim is), hand
    // it to the fact side as a scalar subquery, and prune the fact
    // scan BEFORE its shuffle. The automatic rule only fires above
    // multi-GB scan-size thresholds, so at 100 TB it injects this very
    // shape by itself — the explicit form keeps the plan identical at
    // every scale and under the operator's control (q109).
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(h) => new BloomFilterAggregate(h)
        case Seq(h, n) => new BloomFilterAggregate(h, n)
        case _ => throw new IllegalArgumentException(
          "graft_bloom_agg(xxhash64(key)[, estimatedItems])")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName,
        "graft_might_contain"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_might_contain(bloom, xxhash64(key)) takes two arguments")
        BloomFilterMightContain(children.head, children(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_heavy"),
      new ExpressionInfo(classOf[MisraGries].getName, "graft_heavy"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => MisraGries(c)
        case Seq(c, Literal(k: Int, _)) => MisraGries(c, k)
        case _ => throw new IllegalArgumentException(
          "graft_heavy(item[, k]) — k must be an int literal")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "graft_normalize"),
      (children: Seq[Expression]) => children match {
        case Seq(s) => UnicodeNormalize(s, "NFC")
        case Seq(s, Literal(f, org.apache.spark.sql.types.StringType)) =>
          UnicodeNormalize(s, f.toString)
        case _ => throw new IllegalArgumentException(
          "graft_normalize(str[, form]) — form must be a string literal")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_minhash_row"),
      new ExpressionInfo(classOf[MinHashRowSignature].getName,
        "graft_minhash_row"),
      (children: Seq[Expression]) => children match {
        case Seq(a) => MinHashRowSignature(a)
        case Seq(a, Literal(n: Int, _)) => MinHashRowSignature(a, n)
        case _ => throw new IllegalArgumentException(
          "graft_minhash_row(hashes[, numPerms]) — numPerms must be an " +
            "int literal")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => children match {
        case Seq(h) => MinHashSignature(h)
        case Seq(h, Literal(n: Int, _)) => MinHashSignature(h, n)
        case _ => throw new IllegalArgumentException(
          "graft_minhash(hash[, numPerms]) — numPerms must be an int literal")
      }))
  }
}
