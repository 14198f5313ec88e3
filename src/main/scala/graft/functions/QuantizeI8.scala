package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Int8 vector quantization for the embedding family.
  *
  * At cluster scale the dominant cost of every embedding operator is
  * moving vectors: a 64-dim float32 embedding is 256 B on the wire
  * (520 B once promoted to `array<double>` rows); its int8-quantized
  * form is 72 B (8-byte scale header + one signed byte per element) —
  * a ~7× reduction in broadcast/shuffle bytes, which is exactly what
  * a 100-TB ANN/dedup pass is bounded by. Cosine over the quantized
  * codes needs no de-scaling (per-vector scales cancel), and the
  * integer dot products are exact, so the approximate scores are
  * engine-portable: the DuckDB oracle reproduces them bit-for-bit
  * from the same explicit floor-based rounding formula.
  *
  * Layout: 8 bytes IEEE-754 big-endian scale (max |x_i|), then one
  * signed byte per element: q_i = round_half_away(x_i * 127 / s),
  * spelled `x >= 0 ? floor(x*127/s + 0.5) : -floor(-(x*127/s) + 0.5)`
  * so both engines run the identical IEEE sequence (no reliance on
  * either engine's round() tie semantics). A zero vector (s = 0)
  * quantizes to all-zero codes; a nonzero vector never does (its max
  * element always maps to ±127), so quantization cannot create new
  * zero-norm vectors.
  */
object QuantizeOps {
  /** array<double> → binary quantized form (null in → null out;
    * a null element poisons the vector to null, as [[DotProduct]]
    * does). */
  def quantize_i8(v: Column): Column =
    GraftShims.toColumn(QuantizeI8(GraftShims.toExpression(v)))

  /** Exact integer dot product of two quantized payloads (headers
    * skipped); null on length mismatch or malformed input. */
  def dot_i8(a: Column, b: Column): Column =
    GraftShims.toColumn(DotI8(
      GraftShims.toExpression(a), GraftShims.toExpression(b)))
}

case class QuantizeI8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "quantize_i8"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${t.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val ax = math.abs(a.getDouble(i))
      if (ax > s) s = ax
      i += 1
    }
    val out = new Array[Byte](8 + n)
    val bits = java.lang.Double.doubleToLongBits(s)
    var j = 0
    while (j < 8) {
      out(j) = (bits >>> (56 - 8 * j)).toByte
      j += 1
    }
    i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val q = if (s == 0.0) 0.0
        else {
          val v = x * 127.0 / s
          if (v >= 0) math.floor(v + 0.5) else -math.floor(-v + 0.5)
        }
      out(8 + i) = q.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("scale")
      val ax = ctx.freshName("ax")
      val out = ctx.freshName("out")
      val bits = ctx.freshName("bits")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      val q = ctx.freshName("q")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $ax = Math.abs($a.getDouble($i));
         |  if ($ax > $s) $s = $ax;
         |}
         |if (!${ev.isNull}) {
         |  byte[] $out = new byte[8 + $n];
         |  long $bits = Double.doubleToLongBits($s);
         |  for (int $i = 0; $i < 8; $i++) {
         |    $out[$i] = (byte) ($bits >>> (56 - 8 * $i));
         |  }
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $a.getDouble($i);
         |    double $q;
         |    if ($s == 0.0) {
         |      $q = 0.0;
         |    } else {
         |      double $v = $x * 127.0 / $s;
         |      $q = ($v >= 0) ? Math.floor($v + 0.5) : -Math.floor(-$v + 0.5);
         |    }
         |    $out[8 + $i] = (byte) $q;
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : QuantizeI8 = copy(child = newChild)
}

case class DotI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_i8"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, binary), " +
        s"got (${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Array[Byte]]
    val b = r.asInstanceOf[Array[Byte]]
    if (a.length != b.length || a.length < 8) return null
    var acc = 0L
    var i = 8
    while (i < a.length) {
      acc += a(i).toLong * b(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.length != $b.length || $a.length < 8) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 8; $i < $a.length; $i++) {
         |    $acc += (long) $a[$i] * (long) $b[$i];
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotI8 =
    copy(left = newLeft, right = newRight)
}
