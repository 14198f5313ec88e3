package graft.queries

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The point of the bucketed layout is a PLAN property — the join
  * runs with no exchange below it (zero network movement of either
  * table) — so that is what this spec asserts, with broadcast
  * disabled to force the sort-merge path a large×large production
  * join takes. */
class BucketedJoinSpec extends SparkSpec {

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  test("bucketed tables sort-merge join with ZERO shuffle below the " +
      "join (network elimination — the 100-TB property), and results " +
      "equal the plain join") {
    val conf = spark.conf
    val savedBc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedAqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Relational.bucketedJoin(spark,
        Tables.orders(spark, sf0001), Tables.lineitem(spark, sf0001))
      val rows = df.orderBy("o_orderpriority").collect()

      val plan = finalPlan(df.queryExecution.executedPlan)
      val smj = plan.collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, s"expected a sort-merge join:\n$plan")
      // the exchange is the data-sized network cost; the remaining
      // SortExec below the join is PARTITION-LOCAL (bucket-local
      // rows, no network) — Spark ≥3 re-sorts bucket files unless
      // the legacy sorted-scan flag asserts one-file-per-bucket order
      val below = smj.head.children.flatMap(_.collect {
        case e: ShuffleExchangeExec => e
      })
      assert(below.isEmpty,
        s"bucketed join must need no exchange below it:\n$plan")

      // bucketing must never change semantics
      val plain = Tables.orders(spark, sf0001)
        .select("o_orderkey", "o_orderpriority")
        .join(Tables.lineitem(spark, sf0001),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          QueryUtil.sumDec(col("l_extendedprice") *
            (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy("o_orderpriority").collect()
      assert(rows.toSeq == plain.toSeq)
      assert(rows.nonEmpty)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
      conf.set("spark.sql.adaptive.enabled", savedAqe)
    }
  }
}
