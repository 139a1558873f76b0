package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Random-hyperplane LSH bucket id for an `array<double>` embedding:
  * bit p of the bucket = sign of ⟨plane_p, v⟩, where plane component
  * (p, i) is the exact rational `((1103515245·(p·dim+i) + 12345) mod 2³¹)
  * / 2³¹ − ½` — integer arithmetic, so the DuckDB oracle reproduces the
  * planes bit-for-bit (see q31's oracle SQL).
  *
  * Native + codegen'd because the plane fold is the ANN scan's second
  * hot loop after the cosine; the planes are materialized once per
  * expression instance instead of being re-derived per row as the
  * higher-order-function formulation does. Accumulation order matches
  * the HOF/oracle formulation exactly (sequential over i).
  */
case class LcgLshBucket(child: Expression, planes: Int = 8, dim: Int = 64)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bucket expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lsh_bucket"

  /** planes × dim matrix, row-major; exact rationals with denominator 2³¹. */
  @transient lazy val planeMatrix: Array[Double] =
    Array.tabulate(planes * dim) { k =>
      ((1103515245L * k + 12345L) % 2147483648L) / 2147483648.0 - 0.5
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    var bucket = 0
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += planeMatrix(p * dim + i) * v.getDouble(i); i += 1 }
      if (dot > 0.0) bucket |= 1 << p
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("planes", planeMatrix, "double[]")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      s"""
        if ($v.numElements() != $dim) {
          ${ev.isNull} = true;
        } else {
          int $bucket = 0;
          for (int $p = 0; $p < $planes; $p++) {
            double $dot = 0.0;
            for (int $i = 0; $i < $dim; $i++) {
              $dot += $planesRef[$p * $dim + $i] * $v.getDouble($i);
            }
            if ($dot > 0.0) $bucket |= 1 << $p;
          }
          ${ev.value} = $bucket;
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): LcgLshBucket =
    copy(child = newChild)
}
