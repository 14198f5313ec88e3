package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen'd POSITIONAL k-gram hashes: element i of the result is the
  * polynomial code-point hash of tokens[i..i+k-1] joined by spaces —
  * the same hash family as [[RollingHash]]/[[WinnowSet]], so the
  * DuckDB mirror is `polyhash(array_to_string(toks[i:i+k-1], ' '))`.
  *
  * Unlike [[ShingleSet]] this keeps ONE entry PER POSITION (no
  * distinct, no sort — position identity is the point: occurrence-
  * level dedup needs to know WHERE a gram sits, not just that it
  * occurs) and emits an EMPTY array for docs shorter than k (no
  * truncated whole-doc gram — a short doc has no k-token span to
  * cut). Same single-compiled-pass rationale as [[WinnowSet]]: the
  * HOF spelling allocates a slice + gram string per position; this
  * loop hashes characters exactly once per gram.
  */
case class GramHashes(child: Expression, k: Int,
    mult: Long, modulus: Long) extends UnaryExpression {
  require(k >= 1, "gram width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, false)
  override def prettyName: String = "gram_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = math.max(n - k + 1, 0)
    val gh = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var t = i
      while (t < i + k) {
        if (t > i) h = (h * mult + 32L) % modulus
        if (!arr.isNullAt(t)) {
          val s = arr.getUTF8String(t).toString
          var j = 0
          while (j < s.length) {
            val cp = s.codePointAt(j)
            h = (h * mult + cp) % modulus
            j += Character.charCount(cp)
          }
        }
        t += 1
      }
      gh(i) = h
      i += 1
    }
    new GenericArrayData(gh)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val gh = ctx.freshName("gh")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val t = ctx.freshName("t")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val cp = ctx.freshName("cp")
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $n = $c.numElements();
         |int $m = Math.max($n - $k + 1, 0);
         |long[] $gh = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  long $h = 0L;
         |  for (int $t = $i; $t < $i + $k; $t++) {
         |    if ($t > $i) $h = ($h * ${mult}L + 32L) % ${modulus}L;
         |    if (!$c.isNullAt($t)) {
         |      String $s = $c.getUTF8String($t).toString();
         |      int $j = 0;
         |      while ($j < $s.length()) {
         |        int $cp = $s.codePointAt($j);
         |        $h = ($h * ${mult}L + $cp) % ${modulus}L;
         |        $j += Character.charCount($cp);
         |      }
         |    }
         |  }
         |  $gh[$i] = $h;
         |}
         |${ev.value} = new $gad($gh);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : GramHashes = copy(child = newChild)
}

object GramHashes {
  /** Column wrapper; default constants match the library's portable
    * polynomial hash family (31 / 2^31−1) and the DuckDB oracle. */
  def gram_hashes(toks: Column, k: Int, mult: Long = 31L,
      modulus: Long = 2147483647L): Column =
    GraftShims.toColumn(GramHashes(
      GraftShims.toExpression(toks), k, mult, modulus))
}
