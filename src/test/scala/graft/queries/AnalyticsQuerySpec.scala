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
