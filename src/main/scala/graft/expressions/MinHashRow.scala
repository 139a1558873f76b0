package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-ROW MinHash signature over an array of shingle hashes — the
  * row-local twin of the [[MinHashSignature]] aggregate, for places an
  * aggregation cannot go (a stateless streaming projection computing a
  * document's signature from its own shingle array, q105).
  *
  * Values are BIT-IDENTICAL to both the aggregate and the SQL form
  * `transform(sequence(0, P-1), p -> array_min(transform(shs, s ->
  * xxhash64(s, cast(p as int)))))`: Spark's xxhash64(long, int) chains
  * `hashInt(p, hashLong(s, 42))`, which is exactly this loop. The HOF
  * form was the q105 hot path's dominant interpreter cost — it
  * re-evaluates the lambda expression tree (and re-hashes the 8-byte
  * base!) once per (shingle × permutation); this expression hashes each
  * shingle's base ONCE and runs the permutation sweep as a tight
  * primitive loop (P× fewer hashLong calls, zero per-element dispatch).
  */
case class MinHashRowSignature(child: Expression, numPerms: Int = 128)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_row expects array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_row"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val out = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val base = XXH64.hashLong(arr.getLong(i), 42L)
      var p = 0
      while (p < numPerms) {
        val h = XXH64.hashInt(p, base)
        if (h < out(p)) out(p) = h
        p += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashRowSignature = copy(child = newChild)
}
