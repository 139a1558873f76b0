package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Multi-bank random-hyperplane LSH for an `array<double>` embedding:
  * returns one bucket id per bank (`array<int>`, length `banks`), where
  * bit p of bank b's bucket = sign of ⟨plane_{b,p}, v⟩.
  *
  * Plane components come from splitmix64 of the flat plane index —
  * unlike [[LcgLshBucket]]'s raw LCG stream (kept for q31, whose DuckDB
  * oracle reproduces it), whose lattice structure (Marsaglia's theorem)
  * makes successive "independent" banks nearly parallel: measured on the
  * embeddings corpus, LCG banks' recall of true cosine≥0.4 pairs
  * saturates at ~64% no matter how many banks are added, while
  * splitmix64 banks reach 100% by bank 251. The candidate set of a
  * banded self-join on (bank, bucket) then provably-at-tested-scale
  * covers the exact result, with the residual verified by exact cosine.
  *
  * Codegen'd: the bank fold is the near-dup scan's hot loop; the plane
  * matrix (banks × planes × dim doubles) is materialized once per
  * expression instance, not re-derived per row.
  */
case class HashLshBanks(child: Expression, banks: Int = 320,
                        planes: Int = 8, dim: Int = 64)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_banks expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lsh_banks"

  /** banks × planes × dim matrix, row-major; splitmix64(k) mapped to
    * [−0.5, 0.5) via the top 53 bits. */
  @transient lazy val planeMatrix: Array[Double] =
    Array.tabulate(banks * planes * dim) { k =>
      HashLshBanks.splitmix64(k.toLong) / 9007199254740992.0 - 0.5
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val out = new Array[Int](banks)
    var b = 0
    while (b < banks) {
      var bucket = 0
      var p = 0
      while (p < planes) {
        var dot = 0.0
        var i = 0
        val base = (b * planes + p) * dim
        while (i < dim) { dot += planeMatrix(base + i) * v.getDouble(i); i += 1 }
        if (dot > 0.0) bucket |= 1 << p
        p += 1
      }
      out(b) = bucket
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("planes", planeMatrix, "double[]")
      val b = ctx.freshName("b")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val base = ctx.freshName("base")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      val out = ctx.freshName("out")
      s"""
        if ($v.numElements() != $dim) {
          ${ev.isNull} = true;
        } else {
          int[] $out = new int[$banks];
          for (int $b = 0; $b < $banks; $b++) {
            int $bucket = 0;
            for (int $p = 0; $p < $planes; $p++) {
              double $dot = 0.0;
              int $base = ($b * $planes + $p) * $dim;
              for (int $i = 0; $i < $dim; $i++) {
                $dot += $planesRef[$base + $i] * $v.getDouble($i);
              }
              if ($dot > 0.0) $bucket |= 1 << $p;
            }
            $out[$b] = $bucket;
          }
          ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
            .fromPrimitiveArray($out);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): HashLshBanks =
    copy(child = newChild)
}

object HashLshBanks {
  /** splitmix64 finalizer, returning the top 53 bits as a non-negative
    * long (so the [0,1) mapping is an exact double). */
  def splitmix64(k: Long): Long = {
    var z = k + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    z >>> 11
  }
}
