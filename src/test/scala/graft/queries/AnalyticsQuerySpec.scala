package graft.queries

import graft.SparkSpec

/** Equivalence checks between catalog queries and their demoted
  * reference formulations. */
class AnalyticsQuerySpec extends SparkSpec {

  test("histogram percentiles match the buffering percentile() form " +
      "(demoted to spec-only)") {
    val dist = AnalyticsExt.qPercentilesDist(spark, sf0001)
      .collect().map(_.toSeq)
    val buf = AnalyticsExt.percentilesBuffering(spark, sf0001)
      .collect().map(_.toSeq)
    assert(dist.toSeq == buf.toSeq)
  }

  test("q_bloom_join: no false negatives and exact membership counts") {
    import org.apache.spark.sql.functions._
    val b = AnalyticsExt.qBloomJoin(spark, sf0001).cache()
    // structural: the sketch can only over-approximate
    assert(b.filter(col("n_actual") > col("n_bloom_pass")).isEmpty)
    assert(b.filter(col("n_false_pos") =!=
      col("n_bloom_pass") - col("n_actual")).isEmpty)
    // n_actual per segment must equal the exact semi-join
    val exact = graft.Tables.customer(spark, sf0001)
      .join(graft.Tables.orders(spark, sf0001)
        .filter(col("o_totalprice") > 490000)
        .select(col("o_custkey")).distinct(),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("want"))
    val bad = b.join(exact, Seq("c_mktsegment"), "left")
      .filter(col("n_actual") =!= coalesce(col("want"), lit(0L)))
    assert(bad.isEmpty)
    b.unpersist()
  }

  test("catalog q_percentiles is the scale-safe histogram form") {
    // Guard against a buffering percentile() aggregate sneaking back
    // into the catalog: the optimized plan of the catalog entry must
    // contain no Percentile expression.
    val plan = AnalyticsExt.queries("q_percentiles")(spark, sf0001)
      .queryExecution.optimizedPlan
    val hasBuffering = plan.expressions.exists(
      _.find(_.getClass.getSimpleName == "Percentile").isDefined) ||
      plan.collect { case p =>
        p.expressions.exists(
          _.find(_.getClass.getSimpleName == "Percentile").isDefined)
      }.exists(identity)
    assert(!hasBuffering,
      "catalog q_percentiles must not buffer group values")
  }
}
