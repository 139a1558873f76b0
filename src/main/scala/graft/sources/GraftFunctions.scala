package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{AggregateFunction, BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The graft catalog's [[org.apache.spark.sql.connector.catalog.FunctionCatalog]]
  * functions — the V2 function contract exercised BOTH ways:
  *
  *  - [[FixedPointFn]]: a SCALAR function with the magic `invoke`
  *    method (`ScalarFunction.MAGIC_METHOD_NAME`), so Catalyst compiles
  *    the call to a direct unboxed `Invoke` in generated code — the
  *    codegen-clean path; `produceResult` stays as the reflective
  *    fallback the contract requires. This is the reference's
  *    fixed-point decimal conversion (amounts stored as integer
  *    ticks × 10^-exp all through the transactions pipelines, e.g.
  *    /root/reference/dlt-pipelines/zetadex-transactions-helius-pipeline.py:384)
  *    exposed as `catalog.ns.fixed_point(v, exp)`.
  *
  *  - [[Xor64Fn]]: an AGGREGATE function (newAggregationState / update
  *    / merge / produceResult) whose merge is the XOR group — exactly
  *    associative-commutative, so partial aggregation is LOSSLESS and
  *    order-independent: the content-signature aggregate a 100 TB
  *    dataset-diff wants (XOR of row hashes detects any single-row
  *    difference without a sort), and hash-stable against the DuckDB
  *    oracle's bit_xor.
  *
  * Functions are namespace-scoped (`SELECT cat.ns.fixed_point(...)`) —
  * every namespace of a graft catalog serves the same function set.
  */
object GraftFunctions {
  val names: Seq[String] = Seq("fixed_point", "xor64")

  def load(name: String): Option[UnboundFunction] = name match {
    case "fixed_point" => Some(FixedPointFn)
    case "xor64" => Some(Xor64Fn)
    case _ => None
  }
}

object FixedPointFn extends UnboundFunction {
  override def name(): String = "fixed_point"
  override def description(): String =
    "fixed_point(v BIGINT, exp INT): DOUBLE — v * 10^-exp, the " +
      "integer-ticks decimal conversion"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2 &&
      inputType.fields(0).dataType == LongType &&
      inputType.fields(1).dataType == IntegerType,
      s"fixed_point wants (BIGINT, INT), got $inputType")
    Bound
  }
  object Bound extends ScalarFunction[java.lang.Double] {
    override def name(): String = "fixed_point"
    override def canonicalName(): String = "graft.fixed_point"
    override def inputTypes(): Array[DataType] =
      Array(LongType, IntegerType)
    override def resultType(): DataType = DoubleType
    override def isResultNullable: Boolean = false
    /** Magic method — resolved by name at bind time, compiled to a
      * direct call in generated code (no InternalRow boxing). One
      * IEEE division by an exactly-representable power of ten, so the
      * oracle's `v / POWER(10, exp)` reproduces it bit-for-bit. */
    def invoke(v: Long, exp: Int): Double = v / math.pow(10d, exp)
    override def produceResult(input: InternalRow): java.lang.Double =
      invoke(input.getLong(0), input.getInt(1))
  }
}

object Xor64Fn extends UnboundFunction {
  override def name(): String = "xor64"
  override def description(): String =
    "xor64(x BIGINT): BIGINT — XOR aggregate (order-independent " +
      "content signature; nulls ignored)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1 &&
      inputType.fields(0).dataType == LongType,
      s"xor64 wants (BIGINT), got $inputType")
    Bound
  }
  object Bound extends AggregateFunction[java.lang.Long, java.lang.Long] {
    override def name(): String = "xor64"
    override def canonicalName(): String = "graft.xor64"
    override def inputTypes(): Array[DataType] = Array(LongType)
    override def resultType(): DataType = LongType
    override def isResultNullable: Boolean = false
    override def newAggregationState(): java.lang.Long = 0L
    override def update(state: java.lang.Long, input: InternalRow)
        : java.lang.Long =
      if (input.isNullAt(0)) state // SQL aggregates skip nulls
      else state ^ input.getLong(0)
    override def merge(left: java.lang.Long, right: java.lang.Long)
        : java.lang.Long = left ^ right
    override def produceResult(state: java.lang.Long): java.lang.Long = state
  }
}
