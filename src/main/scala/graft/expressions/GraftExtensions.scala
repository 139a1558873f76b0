package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Session extension registering the engine's custom Catalyst functions
  * (`graft_cosine`, `graft_minhash`) into the SQL function registry.
  *
  * Loaded via `spark.sql.extensions=graft.expressions.GraftExtensions`
  * (set by GraftSession / Verify / Bench) or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
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
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[BoundedTopK].getName, "graft_topk"),
      (children: Seq[Expression]) => children match {
        case Seq(o, i) => BoundedTopK(o, i)
        case Seq(o, i, Literal(k: Int, _)) => BoundedTopK(o, i, k)
        case _ => throw new IllegalArgumentException(
          "graft_topk(ord, id[, k]) — k must be an int literal")
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
