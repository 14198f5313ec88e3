package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

object MatVec {
  /** `mat · v` as ONE compiled expression node — see [[MatVecLit]]. */
  def mat_vec_lit(v: Column, mat: Array[Array[Double]]): Column =
    GraftShims.toColumn(MatVecLit(GraftShims.toExpression(v), mat))
}

/** Dense matrix–vector product against a PLAN-CONSTANT matrix, in the
  * exact arithmetic of the literal expression tree it replaces:
  * output dim i = `((mat(i)(0)·v₀ + mat(i)(1)·v₁) + …)` — the strict
  * left-fold `reduceLeft(_ + _)` order of
  * `(0 until dim).map(j => lit(mat(i)(j)) * v(j)).reduceLeft(_ + _)`,
  * which is also the order of the oracle's `a + b + c` SQL chain, so
  * cross-engine doubles stay bit-identical (MatVecSpec pins tree ≡
  * kernel, element for element, nulls included).
  *
  * Why a kernel: the tree form embeds dim² literal nodes — 4096 at
  * dim = 64 — and every Catalyst pass over the query re-walks that
  * subtree; measured 6.75 s WARM (17.4 s cold) for one sf0.1
  * projection job whose actual compute is ~0.1 s (round-15 OPQ
  * profile). Here the matrix rides as one reference object, the plan
  * carries one node, and the row loop is whole-stage-codegen.
  *
  * Semantics (identical to the tree, case by case):
  *  - float input elements widen to double (exact), as the tree's
  *    `transform(v, _.cast("double"))` did;
  *  - a NULL input element poisons every output dim — the tree's
  *    per-dim fold saw the null at its `element_at` term — so the
  *    result is an array of all-NULL dims, never a NULL array;
  *  - an input shorter than the matrix width would have been an
  *    out-of-bounds `element_at`; no catalog input can reach it
  *    (embeddings are fixed-width), and the kernel throws the same
  *    error class ANSI `element_at` would rather than guess.
  */
case class MatVecLit(child: Expression, mat: Array[Array[Double]])
    extends UnaryExpression {
  require(mat.nonEmpty && mat.forall(_.length == mat(0).length),
    "mat_vec_lit requires a non-empty rectangular matrix")

  private val rows = mat.length
  private val width = mat(0).length

  override def dataType: DataType = ArrayType(DoubleType, true)
  override def prettyName: String = "mat_vec_lit"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double>, " +
        s"got ${t.simpleString}")
    }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() < width)
      throw new ArrayIndexOutOfBoundsException(
        s"mat_vec_lit: input has ${arr.numElements()} elements, " +
        s"matrix width is $width")
    var j = 0
    while (j < width) {
      if (arr.isNullAt(j)) return new GenericArrayData(new Array[Any](rows))
      j += 1
    }
    val e = new Array[Double](width)
    j = 0
    while (j < width) {
      e(j) = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      j += 1
    }
    val out = new Array[Double](rows)
    var i = 0
    while (i < rows) {
      val row = mat(i)
      var acc = row(0) * e(0)
      var k = 1
      while (k < width) { acc += row(k) * e(k); k += 1 }
      out(i) = acc
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.addReferenceObj("mat", mat, "double[][]")
      val e = ctx.freshName("e")
      val out = ctx.freshName("out")
      val row = ctx.freshName("row")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val anyNull = ctx.freshName("anyNull")
      val get = if (isFloat) s"(double) $c.getFloat" else s"$c.getDouble"
      val gad = classOf[GenericArrayData].getName
      val uad = classOf[UnsafeArrayData].getName
      s"""
         |if ($c.numElements() < $width) {
         |  throw new ArrayIndexOutOfBoundsException(
         |    "mat_vec_lit: input has " + $c.numElements() +
         |    " elements, matrix width is $width");
         |}
         |boolean $anyNull = false;
         |for (int $j = 0; $j < $width; $j++) {
         |  if ($c.isNullAt($j)) { $anyNull = true; break; }
         |}
         |if ($anyNull) {
         |  ${ev.value} = new $gad(new Object[$rows]);
         |} else {
         |  double[] $e = new double[$width];
         |  for (int $j = 0; $j < $width; $j++) $e[$j] = $get($j);
         |  double[] $out = new double[$rows];
         |  for (int $i = 0; $i < $rows; $i++) {
         |    double[] $row = $m[$i];
         |    double $acc = $row[0] * $e[0];
         |    for (int $j = 1; $j < $width; $j++) $acc += $row[$j] * $e[$j];
         |    $out[$i] = $acc;
         |  }
         |  ${ev.value} = $uad.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : MatVecLit = copy(child = newChild)
}
