package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd array kernels for the dedup / similarity hot paths.
  *
  * All four replace higher-order-function formulations
  * (`transform`/`aggregate`/`zip_with`), whose per-element lambdas are
  * interpreted — ~10³× slower than a compiled loop (see NOTES /
  * BASELINE measurements). Each kernel keeps the exact semantics of
  * the HOF version it replaces (specs assert equivalence), so the
  * DuckDB oracles are unchanged.
  */
object ArrayOps {
  def shingle_set(tokens: Column, n: Int): Column =
    GraftShims.toColumn(ShingleSet(GraftShims.toExpression(tokens), n))

  def sorted_intersect_size(a: Column, b: Column): Column =
    GraftShims.toColumn(SortedIntersectSize(
      GraftShims.toExpression(a), GraftShims.toExpression(b)))

  def dot_product(a: Column, b: Column): Column =
    GraftShims.toColumn(DotProduct(
      GraftShims.toExpression(a), GraftShims.toExpression(b)))

  def array_poly_hash(arr: Column, mult: Long = 31L,
      modulus: Long = 2147483647L): Column =
    GraftShims.toColumn(ArrayPolyHash(
      GraftShims.toExpression(arr), mult, modulus))

  def token_set_counts(tokens: Column, sets: Seq[Seq[String]]): Column =
    GraftShims.toColumn(TokenSetCounts(
      GraftShims.toExpression(tokens), sets))
}

/** Sorted distinct word n-gram shingle set in one compiled pass.
  *
  * Exactly `array_sort(array_distinct(transform(sequence(0,
  * greatest(size(toks)-n, 0)), i => concat_ws(" ", slice(toks, i+1,
  * n)))))` — including the short-document edge case (fewer than `n`
  * tokens → one shingle of all tokens) and binary (UTF8String) sort
  * order. The HOF version allocates a slice array and evaluates an
  * interpreted lambda per position; this builds each shingle with one
  * `concatWs` into a TreeSet.
  */
case class ShingleSet(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, false)
  override def prettyName: String = "shingle_set"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sz = arr.numElements()
    val last = math.max(sz - n, 0)
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i <= last) {
      val end = math.min(i + n, sz)
      var m = 0
      var parts = new Array[UTF8String](end - i)
      var j = i
      while (j < end) {
        if (!arr.isNullAt(j)) { parts(m) = arr.getUTF8String(j); m += 1 }
        j += 1
      }
      if (m < parts.length) parts = java.util.Arrays.copyOf(parts, m)
      set.add(UTF8String.concatWs(ShingleSet.Sep, parts: _*))
      i += 1
    }
    new GenericArrayData(set.toArray())
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sep = ctx.addReferenceObj("sep", ShingleSet.Sep,
        classOf[UTF8String].getName)
      val set = ctx.freshName("set")
      val sz = ctx.freshName("sz")
      val last = ctx.freshName("last")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val end = ctx.freshName("end")
      val parts = ctx.freshName("parts")
      val utf8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      // NB: raw TreeSet — Janino cannot compile generic type arguments
      s"""
         |int $sz = $c.numElements();
         |int $last = Math.max($sz - $n, 0);
         |java.util.TreeSet $set = new java.util.TreeSet();
         |for (int $i = 0; $i <= $last; $i++) {
         |  int $end = Math.min($i + $n, $sz);
         |  int $m = 0;
         |  $utf8[] $parts = new $utf8[$end - $i];
         |  for (int $j = $i; $j < $end; $j++) {
         |    if (!$c.isNullAt($j)) { $parts[$m++] = $c.getUTF8String($j); }
         |  }
         |  if ($m < $parts.length)
         |    $parts = ($utf8[]) java.util.Arrays.copyOf($parts, $m);
         |  $set.add($utf8.concatWs($sep, $parts));
         |}
         |${ev.value} = new $gad($set.toArray());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : ShingleSet = copy(child = newChild)
}

object ShingleSet {
  val Sep: UTF8String = UTF8String.fromString(" ")
}

/** |a ∩ b| for two ascending-sorted arrays (string or long elements)
  * by a single merge walk — no per-pair hash-set build the way
  * `size(array_intersect(a, b))` does it, and no intermediate array.
  * Inputs must be sorted and distinct (as produced by [[ShingleSet]] /
  * `array_sort(array_distinct(...))`); equal count then matches
  * `array_intersect` semantics exactly.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if lt == rt && (lt == StringType || lt == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two arrays of the same element type " +
        s"(string or bigint), got (${l.simpleString}, ${r.simpleString})")
    }

  private lazy val elemType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var cnt = 0
    elemType match {
      case StringType =>
        while (i < na && j < nb) {
          val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
          if (c == 0) { cnt += 1; i += 1; j += 1 }
          else if (c < 0) i += 1 else j += 1
        }
      case LongType =>
        while (i < na && j < nb) {
          val x = a.getLong(i); val y = b.getLong(j)
          if (x == y) { cnt += 1; i += 1; j += 1 }
          else if (x < y) i += 1 else j += 1
        }
      case t => throw new IllegalArgumentException(
        s"sorted_intersect_size: unsupported element type $t")
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val cmp = ctx.freshName("cmp")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val body = elemType match {
        case StringType =>
          s"""int $cmp = $a.getUTF8String($i).compareTo(
             |  $b.getUTF8String($j));
             |if ($cmp == 0) { $cnt++; $i++; $j++; }
             |else if ($cmp < 0) $i++; else $j++;""".stripMargin
        case LongType =>
          s"""long $x = $a.getLong($i); long $y = $b.getLong($j);
             |if ($x == $y) { $cnt++; $i++; $j++; }
             |else if ($x < $y) $i++; else $j++;""".stripMargin
        case t => throw new IllegalArgumentException(
          s"sorted_intersect_size: unsupported element type $t")
      }
      s"""
         |int $i = 0; int $j = 0; int $cnt = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  $body
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** Σ aᵢ·bᵢ over two double arrays, strict left-to-right accumulation —
  * the same order as the `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * HOF fold and DuckDB's `list_dot_product`, so cross-engine float
  * parity is bit-exact — INCLUDING the degenerate cases: a length
  * mismatch or a null element yields NULL, exactly as the HOF fold
  * does (`zip_with` pads the shorter side with nulls and a null
  * product poisons the whole fold). Exposed as SQL `dot_product`, so
  * users can feed it anything; silently truncating used to diverge
  * from the documented equivalence.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), " +
        s"got (${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Element-wise [[RollingHash]] over a string array: one compiled pass
  * producing `(Σ cp·31^k) mod p` per element — the engine-portable
  * hash family shared with the DuckDB oracles (`list_transform(...,
  * s -> list_reduce(...))`), unlike `xxhash64`, which only Spark can
  * compute. Null elements hash to 0 (the inputs — `split` tokens —
  * never contain nulls).
  */
case class ArrayPolyHash(child: Expression, mult: Long, modulus: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, false)
  override def prettyName: String = "array_poly_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[Long](arr.numElements())
    var i = 0
    while (i < out.length) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).toString
        var h = 0L
        var j = 0
        while (j < s.length) {
          val cp = s.codePointAt(j)
          h = (h * mult + cp) % modulus
          j += Character.charCount(cp)
        }
        out(i) = h
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val cp = ctx.freshName("cp")
      val gad = classOf[GenericArrayData].getName
      s"""
         |long[] $out = new long[$c.numElements()];
         |for (int $i = 0; $i < $out.length; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    String $s = $c.getUTF8String($i).toString();
         |    long $h = 0L;
         |    int $j = 0;
         |    while ($j < $s.length()) {
         |      int $cp = $s.codePointAt($j);
         |      $h = ($h * ${mult}L + $cp) % ${modulus}L;
         |      $j += Character.charCount($cp);
         |    }
         |    $out[$i] = $h;
         |  }
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : ArrayPolyHash = copy(child = newChild)
}

/** Hit count per word-set for a token array in one compiled pass:
  * result(k) = |{ i : tokens(i) ∈ sets(k) }| (duplicates counted,
  * matching `size(filter(toks, t => t.isin(words)))`). Used by the
  * text-quality and language-ID operators, which need counts against
  * several small stopword sets — the HOF `filter`+`isin` formulation
  * evaluates an interpreted lambda with a linear list scan per token
  * per set. Null tokens match nothing (isin is null-safe false here).
  */
case class TokenSetCounts(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, false)
  override def prettyName: String = "token_set_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.simpleString}")
    }

  @transient private lazy val lookup: Array[java.util.HashSet[UTF8String]] =
    sets.map { words =>
      val s = new java.util.HashSet[UTF8String](words.size * 2)
      words.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](lookup.length)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        var k = 0
        while (k < lookup.length) {
          if (lookup(k).contains(t)) counts(k) += 1
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // raw array-of-raw-HashSet: Janino cannot compile generics
      val sets = ctx.addReferenceObj("sets", lookup,
        "java.util.HashSet[]")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val t = ctx.freshName("t")
      val utf8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |int[] $counts = new int[${lookup.length}];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i)) {
         |    $utf8 $t = $c.getUTF8String($i);
         |    for (int $k = 0; $k < ${lookup.length}; $k++) {
         |      if ($sets[$k].contains($t)) $counts[$k]++;
         |    }
         |  }
         |}
         |${ev.value} = new $gad($counts);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : TokenSetCounts = copy(child = newChild)
}
