package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The int8 quantization kernels must reproduce the explicit
  * floor-based rounding formula the DuckDB oracle runs — that
  * equivalence is what lets `s_ann_int8` be hash-verified — and the
  * integer dot must be exact. */
class QuantizeI8Spec extends SparkSpec {
  import spark.implicits._

  private def quantRef(xs: Seq[Double]): Seq[Int] = {
    val s = if (xs.isEmpty) 0.0 else xs.map(math.abs).max
    xs.map { x =>
      if (s == 0.0) 0
      else {
        val v = x * 127.0 / s
        (if (v >= 0) math.floor(v + 0.5) else -math.floor(-v + 0.5)).toInt
      }
    }
  }

  private val vectors = Seq(
    Seq(1.0, -1.0, 0.5, -0.5, 0.0),
    Seq(0.0, 0.0, 0.0),                    // zero vector → all-zero codes
    Seq(3.25, -3.25, 1.625),               // exact .5 code boundaries
    Seq(1e-9, -1e-9, 2e-9),                // tiny magnitudes
    Seq(127.0, -127.0, 63.5, 64.0))

  test("quantize_i8 codes match the oracle rounding formula; max maps to ±127") {
    val df = vectors.map(Tuple1(_)).toDF("v")
      .select(col("v"), QuantizeOps.quantize_i8(col("v")).as("q"))
    val rows = df.as[(Seq[Double], Array[Byte])].collect()
    rows.foreach { case (v, q) =>
      assert(q.length == 8 + v.length)
      val scaleBits = (0 until 8).map(i =>
        (q(i).toLong & 0xff) << (56 - 8 * i)).sum
      val s = java.lang.Double.longBitsToDouble(scaleBits)
      assert(s == (if (v.isEmpty) 0.0 else v.map(math.abs).max))
      val codes = q.drop(8).map(_.toInt).toSeq
      assert(codes == quantRef(v), s"input $v")
      if (v.exists(_ != 0.0))
        assert(codes.map(math.abs).max == 127,
          "nonzero vector must span the int8 range")
    }
  }

  test("dot_i8 equals the exact integer dot of the reference codes") {
    val pairs = for (a <- vectors.filter(_.length == 3);
                     b <- vectors.filter(_.length == 3)) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(QuantizeOps.dot_i8(
        QuantizeOps.quantize_i8(col("a")),
        QuantizeOps.quantize_i8(col("b"))).as("d"))
      .as[Long].collect()
    val want = pairs.map { case (a, b) =>
      quantRef(a).zip(quantRef(b)).map { case (x, y) => x.toLong * y }.sum
    }
    assert(got.toSeq == want)
  }

  test("null handling: null vector and length mismatch yield null") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0, 3.0))),
      (None: Option[Seq[Double]], Some(Seq(1.0))))
      .toDF("a", "b")
      .select(
        QuantizeOps.quantize_i8(col("a")).as("qa"),
        QuantizeOps.dot_i8(QuantizeOps.quantize_i8(col("a")),
          QuantizeOps.quantize_i8(col("b"))).as("d"))
    val rows = df.collect()
    assert(rows(0).get(0) != null)
    assert(rows(0).isNullAt(1), "length mismatch must be null")
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }

  test("interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val v = Seq(0.3, -0.7, 0.001, 0.7)
    // eval on a Literal child runs the interpreted path; the DataFrame
    // projection compiles through doGenCode
    val lit = Literal.create(v, ArrayType(DoubleType))
    val interp = QuantizeI8(lit).eval(null).asInstanceOf[Array[Byte]]
    val fromPlan = Seq(Tuple1(v)).toDF("v")
      .select(QuantizeOps.quantize_i8(col("v"))).as[Array[Byte]]
      .collect().head
    assert(interp.toSeq == fromPlan.toSeq)
    val dInterp = DotI8(Literal(interp), Literal(interp)).eval(null)
    val dPlan = Seq(Tuple1(v)).toDF("v")
      .select(QuantizeOps.dot_i8(QuantizeOps.quantize_i8(col("v")),
        QuantizeOps.quantize_i8(col("v")))).as[Long].collect().head
    assert(dInterp == dPlan)
  }
}
