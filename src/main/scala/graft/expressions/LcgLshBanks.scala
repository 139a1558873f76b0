package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Multi-bank random-hyperplane LSH whose plane matrix is CROSS-ENGINE
  * REPLAYABLE: plane component k (flat over bank, plane, dim) is the
  * exact rational
  *
  *   m = (k·2654435761 + 1013904223) mod 2³¹        (index mixing)
  *   w = ((1103515245·m + 12345) mod 2³¹) / 2³¹ − ½
  *
  * — every step fits 63-bit signed integers, so a DuckDB oracle
  * rebuilds the identical planes with plain BIGINT arithmetic (q31's
  * LCG device, plus one multiplicative index-mix step that breaks the
  * raw LCG stream's lattice correlation between consecutive banks).
  * [[HashLshBanks]] (splitmix64) remains the production bank family —
  * better-conditioned planes, but 64-bit wrapping multiplies that no
  * portable SQL replays, which is why its queries (q67) verify against
  * an all-pairs oracle instead of a candidate-replay oracle. This
  * expression exists for queries whose ORACLE must reproduce the exact
  * candidate set, e.g. q302's budgeted verify with its drop ledger.
  *
  * Returns one bucket id per bank (`array<int>`, length `banks`), bit p
  * of bank b's bucket = sign of ⟨plane_{b,p}, v⟩. Codegen'd; the plane
  * matrix is materialized once per expression instance.
  */
case class LcgLshBanks(child: Expression, banks: Int = 16,
                       planes: Int = 8, dim: Int = 64)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lcg_banks expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lcg_banks"

  /** banks × planes × dim matrix, row-major; exact rationals with
    * denominator 2³¹. */
  @transient lazy val planeMatrix: Array[Double] =
    Array.tabulate(banks * planes * dim) { k =>
      val m = (k.toLong * 2654435761L + 1013904223L) % 2147483648L
      ((1103515245L * m + 12345L) % 2147483648L) / 2147483648.0 - 0.5
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

  override protected def withNewChildInternal(newChild: Expression): LcgLshBanks =
    copy(child = newChild)
}
