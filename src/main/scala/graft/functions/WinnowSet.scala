package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen'd winnowing fingerprint set (Schleimer et al. 2003, the
  * MOSS scheme): over a token array, hash every positional `k`-token
  * gram (the polynomial code-point hash of the space-joined gram —
  * identical to [[RollingHash]] of the gram string), slide a window
  * of `w` consecutive gram hashes, select each window's minimum, and
  * return the sorted distinct selected values.
  *
  * Exactly the HOF formulation
  * `array_sort(array_distinct(transform(sequence(1, m-w+1), j =>
  * array_min(slice(array_poly_hash(grams), j, w)))))` with the
  * short-document edges (fewer grams than the window → the single min
  * of all grams; fewer tokens than `k` → empty set) — but in ONE
  * compiled pass: the interpreted version allocates a slice and a
  * gram string per position (~10M lambda invocations at 50k docs) and
  * measured 75s on the 10× probe corpus; this loop hashes characters
  * exactly once per gram and never materializes gram strings.
  */
case class WinnowSet(child: Expression, k: Int, w: Int,
    mult: Long, modulus: Long) extends UnaryExpression {
  require(k >= 1 && w >= 1, "gram width and window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, false)
  override def prettyName: String = "winnow_set"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = n - k + 1
    val set = new java.util.TreeSet[java.lang.Long]()
    if (m > 0) {
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
      val nw = math.max(m - w + 1, 1)
      var t = 0
      while (t < nw) {
        val end = math.min(t + w, m)
        var mn = gh(t)
        var u = t + 1
        while (u < end) { if (gh(u) < mn) mn = gh(u); u += 1 }
        set.add(mn)
        t += 1
      }
    }
    val out = new Array[Long](set.size())
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val set = ctx.freshName("set")
      val gh = ctx.freshName("gh")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val t = ctx.freshName("t")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val cp = ctx.freshName("cp")
      val nw = ctx.freshName("nw")
      val end = ctx.freshName("end")
      val mn = ctx.freshName("mn")
      val u = ctx.freshName("u")
      val arr = ctx.freshName("arr")
      val outv = ctx.freshName("outv")
      val gad = classOf[GenericArrayData].getName
      // NB: raw TreeSet — Janino cannot compile generic type arguments
      s"""
         |int $n = $c.numElements();
         |int $m = $n - $k + 1;
         |java.util.TreeSet $set = new java.util.TreeSet();
         |if ($m > 0) {
         |  long[] $gh = new long[$m];
         |  for (int $i = 0; $i < $m; $i++) {
         |    long $h = 0L;
         |    for (int $t = $i; $t < $i + $k; $t++) {
         |      if ($t > $i) $h = ($h * ${mult}L + 32L) % ${modulus}L;
         |      if (!$c.isNullAt($t)) {
         |        String $s = $c.getUTF8String($t).toString();
         |        int $j = 0;
         |        while ($j < $s.length()) {
         |          int $cp = $s.codePointAt($j);
         |          $h = ($h * ${mult}L + $cp) % ${modulus}L;
         |          $j += Character.charCount($cp);
         |        }
         |      }
         |    }
         |    $gh[$i] = $h;
         |  }
         |  int $nw = Math.max($m - $w + 1, 1);
         |  for (int $t = 0; $t < $nw; $t++) {
         |    int $end = Math.min($t + $w, $m);
         |    long $mn = $gh[$t];
         |    for (int $u = $t + 1; $u < $end; $u++)
         |      if ($gh[$u] < $mn) $mn = $gh[$u];
         |    $set.add(Long.valueOf($mn));
         |  }
         |}
         |Object[] $arr = $set.toArray();
         |long[] $outv = new long[$arr.length];
         |for (int $i = 0; $i < $arr.length; $i++)
         |  $outv[$i] = ((Long) $arr[$i]).longValue();
         |${ev.value} = new $gad($outv);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : WinnowSet = copy(child = newChild)
}

object WinnowSet {
  /** Column wrapper; default constants match the library's portable
    * polynomial hash family (31 / 2^31−1) and the DuckDB oracle. */
  def winnow_set(toks: Column, k: Int, w: Int, mult: Long = 31L,
      modulus: Long = 2147483647L): Column =
    GraftShims.toColumn(WinnowSet(
      GraftShims.toExpression(toks), k, w, mult, modulus))
}
