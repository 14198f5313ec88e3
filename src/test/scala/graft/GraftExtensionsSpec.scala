package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val sql = spark.sql(
      "SELECT rolling_hash('abc') AS h, minhash_sig(array(7L, 11L), 4) AS m")
      .as[(Long, Seq[Long])].collect().head
    val api = Seq("abc").toDF("t").select(
      functions.RollingHash.rolling_hash(col("t")).as("h"),
      functions.MinHashSig.minhash_sig(
        array(lit(7L), lit(11L)), 4).as("m"))
      .as[(Long, Seq[Long])].collect().head
    assert(sql == api)
    // 'abc': ((0*31+97)*31+98)*31+99 = 96262 mod p
    assert(sql._1 == (97L * 31 + 98) * 31 + 99)
  }

  test("round-2 kernels are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      """SELECT
        |  shingle_set(array('a', 'b', 'c'), 2) AS sh,
        |  sorted_intersect_size(array(1L, 3L, 7L),
        |    array(3L, 7L, 9L)) AS n,
        |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |  array_poly_hash(array('abc')) AS ph,
        |  simhash32(array_poly_hash(array('abc'))) AS sim,
        |  winnow_set(array('a', 'b', 'c', 'd'), 4, 4) AS wn,
        |  gram_hashes(array('a', 'b', 'c', 'd'), 4) AS gh
        |""".stripMargin)
      .as[(Seq[String], Int, Double, Seq[Long], Long, Seq[Long], Seq[Long])]
      .collect().head
    assert(got._1 == Seq("a b", "b c"))
    assert(got._2 == 2)
    assert(got._3 == 11.0)
    assert(got._4 == Seq((97L * 31 + 98) * 31 + 99))
    assert(got._5 == (97L * 31 + 98) * 31 + 99) // one token votes its bits
    // 4 tokens = one 4-gram = one window = hash of "a b c d"
    val abcd = "a b c d".foldLeft(0L)((a, c) => (a * 31 + c.toInt)
      % 2147483647L)
    assert(got._6 == Seq(abcd))
    assert(got._7 == Seq(abcd)) // one positional 4-gram, same hash
  }

  test("SQL surface rejects wrong arity and wrong input types at " +
      "analysis, not execution") {
    GraftExtensions.register(spark)
    val badArity = intercept[Exception] {
      spark.sql("SELECT sorted_intersect_size(array(1L))").collect()
    }
    assert(badArity.getMessage.contains("expects 2"))
    val badType = intercept[Exception] {
      spark.sql("SELECT dot_product(array('x'), array('y'))").collect()
    }
    assert(badType.getMessage.toLowerCase.contains("array<double>") ||
      badType.getMessage.contains("DATATYPE_MISMATCH"))
    val badScalar = intercept[Exception] {
      spark.sql("SELECT rolling_hash(array(1, 2))").collect()
    }
    assert(badScalar.getMessage.contains("string") ||
      badScalar.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("FoldRollingHash optimizer rule folds literal input to a " +
      "plain Literal") {
    spark.experimental.extraOptimizations =
      Seq(rules.FoldRollingHash)
    try {
      val df = Seq(1).toDF("x").select(
        functions.RollingHash.rolling_hash(lit("const")).as("h"))
      val optimized = df.queryExecution.optimizedPlan
      val stillThere = optimized.expressions.exists(_.exists(
        _.isInstanceOf[functions.RollingHash]))
      assert(!stillThere, s"RollingHash not folded: $optimized")
      val want = "const".codePoints.toArray.foldLeft(0L)(
        (h, cp) => (h * 31 + cp) % 2147483647L)
      assert(df.as[Long].collect().head == want)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rolling_hash matches the reference fold over unicode text") {
    GraftExtensions.register(spark)
    val zh = "的是了 mixed 文本"
    val got = Seq(zh).toDF("t")
      .select(functions.RollingHash.rolling_hash(col("t")))
      .as[Long].collect().head
    val want = zh.codePoints.toArray.foldLeft(0L)(
      (h, cp) => (h * 31 + cp) % 2147483647L)
    assert(got == want)
  }
}
