package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

object CovOps {
  /** Fused covariance accumulator over a centered `array<double>`
    * column: ONE aggregate returning the dim² cell sums (integer
    * micro-units) plus the row count, replacing the dim²-struct
    * `explode(flatten(transform(...)))` + groupBy shape that
    * materialized 4096 rows per input vector before the map-side
    * combine. Exactly the arithmetic of
    * `sum(cast(cᵢ·cⱼ AS DECIMAL(18,6)))` per cell — see
    * [[CovMicroSums.quantMicro]] — so [[CovMicroSums.snapCell]] over
    * this aggregate's output is hash-identical to the explode
    * pipeline and the DuckDB oracle is unchanged. */
  def cov_micro_sums(c: Column, dim: Int): Column =
    GraftShims.toColumn(
      CovMicroSums(GraftShims.toExpression(c), dim).toAggregateExpression())
}

object CovMicroSums {
  /** Sentinel for "this product contributes nothing to the sum" —
    * mirrors `CAST(p AS DECIMAL(18,6))` returning NULL (non-finite
    * input or magnitude ≥ 1e12 overflows precision 18) which Spark's
    * `sum` skips while `count(lit(1))` still counts the row. */
  val Skip: Long = Long.MinValue

  private val MaxUnscaled = BigInteger.TEN.pow(18)

  /** `CAST(p AS DECIMAL(18,6))` in micro-units, bit-exactly: Spark
    * casts via `BigDecimal(p)` (shortest-decimal `valueOf`) then
    * `changePrecision(18, 6)` = setScale(6, HALF_UP). The fast path
    * avoids the `Double.toString` inside `valueOf` away from the
    * .5e-6 tie boundary: for |y| < 1e9 (y = p·1e6) the combined
    * deviation between the true binary value, the shortest-decimal
    * representation, and the double multiply is < 3e-7 in fractional
    * units, so any frac outside [0.5−1e-4, 0.5+1e-4] rounds
    * identically under both; ties and large magnitudes take the
    * exact BigDecimal path. */
  def quantMicro(p: Double): Long = {
    if (!java.lang.Double.isFinite(p)) return Skip
    val y = p * 1e6
    if (Math.abs(y) < 1e9) {
      val f = Math.floor(y)
      val frac = y - f
      if (Math.abs(frac - 0.5) > 1e-4)
        (if (frac < 0.5) f else f + 1).toLong
      else slowQuant(p)
    } else slowQuant(p)
  }

  /** The reference quantizer (exactly Spark's double→DECIMAL(18,6)
    * cast); also the property-spec oracle for [[quantMicro]]. */
  def slowQuant(p: Double): Long = {
    val bd = JBigDecimal.valueOf(p).setScale(6, RoundingMode.HALF_UP)
    val u = bd.unscaledValue
    if (u.abs.compareTo(MaxUnscaled) >= 0) Skip else u.longValueExact
  }

  /** The per-cell finishing step of the explode pipeline,
    * `round(round(sumDec / count, 6) * 1e6).cast("long")`, replayed
    * on the exact integer sum: Decimal(…,6)→double is
    * `BigDecimal(unscaled, 6).doubleValue`, each `round(x, s)` is
    * `BigDecimal.valueOf(x).setScale(s, HALF_UP).doubleValue`, and
    * the final long cast truncates the (integral) double. */
  def snapCell(sumMicro: Long, n: Long): Long = {
    val sumD = new JBigDecimal(BigInteger.valueOf(sumMicro), 6).doubleValue
    val avg6 = JBigDecimal.valueOf(sumD / n)
      .setScale(6, RoundingMode.HALF_UP).doubleValue
    JBigDecimal.valueOf(avg6 * 1e6)
      .setScale(0, RoundingMode.HALF_UP).doubleValue.toLong
  }
}

/** Partition-accumulating covariance-cell aggregate: buffer = one
  * `Array[Long]` of dim² micro-unit sums plus the row count in the
  * last slot; update adds the quantized centered outer product of one
  * vector (a compiled dim² loop — no per-cell row materialization,
  * no shuffle beyond one buffer per partition); merge is element-wise
  * `addExact`. Overflow bound: each |cell| < 1e18 requires
  * Σ|cᵢ·cⱼ| < 1e12 per cell — at embedding magnitudes (|c| ≲ 10²,
  * products ≲ 10⁴·1e6 micro) that is ≥ 10⁸ rows per cell before
  * `addExact` throws (loudly, never silently wrong); beyond that,
  * pre-aggregate per partition group. */
case class CovMicroSums(child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  override def prettyName: String = "cov_micro_sums"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"cov_micro_sums needs array<double>, got ${t.sql}")
    }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](dim * dim + 1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val arr = child.eval(input)
    if (arr != null) {
      val c = arr.asInstanceOf[ArrayData].toDoubleArray()
      require(c.length == dim,
        s"cov_micro_sums: vector length ${c.length} != dim $dim")
      var i = 0
      while (i < dim) {
        val ci = c(i)
        val base = i * dim
        var j = 0
        while (j < dim) {
          val q = CovMicroSums.quantMicro(ci * c(j))
          if (q != CovMicroSums.Skip)
            buf(base + j) = Math.addExact(buf(base + j), q)
          j += 1
        }
        i += 1
      }
      buf(dim * dim) += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var k = 0
    while (k < buf.length) {
      buf(k) = Math.addExact(buf(k), other(k))
      k += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CovMicroSums =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CovMicroSums =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : CovMicroSums = copy(child = newChild)
}
