package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.GraftShims

import graft.functions.{ArrayPolyHash, DotProduct, GramHashes,
  MinHashSig, RollingHash, ShingleSet, SimHash32, SortedIntersectSize,
  WinnowSet}

/** Session extension registering the engine's custom Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT
  * rolling_hash(text) ...")` works next to the Column API.
  *
  * Activate at session build time:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  * or on a live session via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      e.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
    e.injectOptimizerRule(_ => graft.rules.FoldRollingHash)
  }
}

object GraftExtensions {

  private def longArg(e: Expression, default: Long): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case _ => default
  }

  /** Arity gate: a wrong argument count surfaces as a clear analysis
    * failure instead of an IndexOutOfBoundsException from the builder
    * (input *types* are validated by each expression's
    * checkInputDataTypes). */
  private def arity(name: String, exprs: Seq[Expression], min: Int,
      max: Int): Unit =
    if (exprs.length < min || exprs.length > max)
      throw new IllegalArgumentException(
        s"$name expects $min" +
        (if (max > min) s" to $max" else "") +
        s" arguments, got ${exprs.length}")

  /** name → expression builder (1-arg form uses library defaults). */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "rolling_hash" -> { exprs =>
      arity("rolling_hash", exprs, 1, 3)
      RollingHash(exprs.head,
        if (exprs.length > 1) longArg(exprs(1), 31L) else 31L,
        if (exprs.length > 2) longArg(exprs(2), 2147483647L)
        else 2147483647L)
    },
    "minhash_sig" -> { exprs =>
      arity("minhash_sig", exprs, 1, 2)
      MinHashSig(exprs.head,
        if (exprs.length > 1) longArg(exprs(1), 16L).toInt else 16)
    },
    "shingle_set" -> { exprs =>
      arity("shingle_set", exprs, 1, 2)
      ShingleSet(exprs.head,
        if (exprs.length > 1) longArg(exprs(1), 3L).toInt else 3)
    },
    "sorted_intersect_size" -> { exprs =>
      arity("sorted_intersect_size", exprs, 2, 2)
      SortedIntersectSize(exprs.head, exprs(1))
    },
    "dot_product" -> { exprs =>
      arity("dot_product", exprs, 2, 2)
      DotProduct(exprs.head, exprs(1))
    },
    "array_poly_hash" -> { exprs =>
      arity("array_poly_hash", exprs, 1, 3)
      ArrayPolyHash(exprs.head,
        if (exprs.length > 1) longArg(exprs(1), 31L) else 31L,
        if (exprs.length > 2) longArg(exprs(2), 2147483647L)
        else 2147483647L)
    },
    "simhash32" -> { exprs =>
      arity("simhash32", exprs, 1, 1)
      SimHash32(exprs.head)
    },
    "winnow_set" -> { exprs =>
      arity("winnow_set", exprs, 1, 5)
      WinnowSet(exprs.head,
        if (exprs.length > 1) longArg(exprs(1), 4L).toInt else 4,
        if (exprs.length > 2) longArg(exprs(2), 4L).toInt else 4,
        if (exprs.length > 3) longArg(exprs(3), 31L) else 31L,
        if (exprs.length > 4) longArg(exprs(4), 2147483647L)
        else 2147483647L)
    },
    "gram_hashes" -> { exprs =>
      arity("gram_hashes", exprs, 1, 4)
      GramHashes(exprs.head,
        if (exprs.length > 1) longArg(exprs(1), 8L).toInt else 8,
        if (exprs.length > 2) longArg(exprs(2), 31L) else 31L,
        if (exprs.length > 3) longArg(exprs(3), 2147483647L)
        else 2147483647L)
    })

  /** Register on an already-running session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      GraftShims.registerFunction(spark, name, b)
    }
}
