package graft.queries

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The engine's skew playbook is two-tier: STATIC salting where the
  * hot keys are known (`q_salted_agg`), and AQE's runtime skew-join
  * split where they are not. This spec proves the second tier
  * actually fires under the engine's recommended configuration — a
  * join whose shuffle lands ~half its rows on one key is re-planned
  * mid-query into a skew-split sort-merge join (`isSkewJoin`), with
  * results identical to the non-adaptive plan. */
class AqeSkewJoinSpec extends SparkSpec {

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  test("AQE splits a runtime-skewed partition: final sort-merge join " +
      "reports skew=true and results match the static plan") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "64KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // ~half of 200k fact rows collapse onto key 0 — the unplanned
      // hot key no static salt knows about
      val fact = spark.range(200000)
        .select(when(col("id") % 2 === 0, lit(0L))
          .otherwise(col("id")).as("k"), col("id").as("v"))
      val dim = spark.range(2000)
        .select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = fact.join(dim, "k")
        .groupBy(col("k") === 0).agg(count(lit(1)).as("n"),
          sum(col("v") + col("w")).as("s"))
      val adaptive = joined.collect().sortBy(_.toString)

      // NB: plan.collect cannot descend into AQE QueryStageExec nodes
      // (their plans are fields, not children) — assert on the final
      // plan's rendering, where the join prints `skew=true` and the
      // shuffle read prints `AQEShuffleRead skewed`
      val planStr = finalPlan(joined.queryExecution.executedPlan)
        .toString
      assert(planStr.contains("SortMergeJoin(skew=true)"),
        s"expected a skew-split sort-merge join in:\n$planStr")
      assert(planStr.contains("AQEShuffleRead skewed"),
        s"expected a skewed shuffle read in:\n$planStr")

      conf.set("spark.sql.adaptive.enabled", "false")
      val static = fact.join(dim, "k")
        .groupBy(col("k") === 0).agg(count(lit(1)).as("n"),
          sum(col("v") + col("w")).as("s"))
        .collect().sortBy(_.toString)
      assert(adaptive.toSeq == static.toSeq,
        "skew split must not change results")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
