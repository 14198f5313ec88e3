package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Specs for the round-9 additions `d_collocations` (PMI collocation
  * mining) and `q_salted_join` (skew-salted fact⋈dim join). The
  * DuckDB oracle is the correctness gate; these tests pin the
  * STRUCTURAL claims the oracle cannot see: the salted plan really
  * shuffles on (key, salt), and the collocation ranking really is the
  * lift order over the raw counts. */
class CollocationSaltSpec extends SparkSpec {

  test("q_salted_join equals the plain unsalted join result") {
    val salted = AnalyticsExt.qSaltedJoin(spark, sf0001).collect()
      .map(_.toSeq).sortBy(_.toString)

    val hot = (u: org.apache.spark.sql.Column) =>
      when(u % 4 === 0, lit(0L)).otherwise(u.cast("long"))
    val dim = Tables.customer(spark, sf0001)
      .select(hot(col("c_custkey") % 200).as("k"), col("c_acctbal"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_cust"),
        QueryUtil.sumDec(col("c_acctbal")).as("bal_sum"))
    val fact = Tables.events(spark, sf0001)
      .select(hot(col("user_id")).as("k"), col("value"))
    val plain = fact.join(dim, Seq("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_events"),
        QueryUtil.sumDec(col("value")).as("value_sum"),
        first(col("n_cust")).as("n_cust"),
        first(col("bal_sum")).as("bal_sum"))
      .collect().map(_.toSeq).sortBy(_.toString)

    assert(salted.nonEmpty)
    assert(salted.toSeq == plain.toSeq)
  }

  test("q_salted_join's executed exchange partitions on (k, _salt), " +
      "not on the bare hot key") {
    // force the shuffle path: with the dim auto-broadcast the join has
    // no exchange at all and salting is vacuous
    val saved = scala.util.Try(
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")).toOption
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = AnalyticsExt.qSaltedJoin(spark, sf0001)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // the join's two exchanges must both hash on the composite key —
      // the salt column appearing inside hashpartitioning is exactly
      // the property that spreads a hot key over SaltBuckets reducers
      assert(plan.contains("hashpartitioning"), plan.take(2000))
      assert(plan.contains("_salt"), plan.take(2000))
    } finally saved.foreach(
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
  }

  test("d_collocations: ranks are 1..n unique, support threshold " +
      "holds, and lift is the exact ratio of the raw counts") {
    val out = TrainingData.dCollocations(spark, sf0001).collect()
    assert(out.nonEmpty && out.length <= 50)
    val rks = out.map(_.getLong(0))
    assert(rks.toSeq == (1L to out.length).toSeq)
    assert(out.forall(_.getLong(3) >= 5L))
    // lift is non-increasing in rank
    val lifts = out.map(_.getDouble(4))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })

    // recompute the top pair's lift from first principles
    val top = out.head
    val (w1, w2) = (top.getString(1), top.getString(2))
    val toks = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("w"))
    val nTok = toks.count()
    val nX = toks.filter(col("w") === w1).count()
    val nY = toks.filter(col("w") === w2).count()
    val bi = Tables.documents(spark, sf0001)
      .select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2), " +
          "i -> struct(t[i] as w1, t[i+1] as w2))")).as("bg"))
      .select(col("bg.w1"), col("bg.w2"))
    val nBig = bi.count()
    val nXY = bi.filter(col("w1") === w1 && col("w2") === w2).count()
    val expect = BigDecimal(
      nXY.toDouble * nTok * nTok / (nBig.toDouble * nX * nY))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(top.getDouble(4) - expect) < 1e-6,
      s"lift ${top.getDouble(4)} vs recomputed $expect")
    assert(nXY == top.getLong(3))
  }
}
