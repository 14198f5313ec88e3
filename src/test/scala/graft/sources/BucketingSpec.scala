package graft.sources

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Bucketed tables: pre-shuffled storage so equi-joins on the bucket
  * key need no Exchange at query time — the co-located-join strategy
  * for repeatedly-joined big tables at scale.
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key runs without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(spark, sf0001)
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sf0001)
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    // suppress broadcast so the bucketed sort-merge path is exercised
    // (at real scale both sides exceed any broadcast threshold)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined =
      try spark.table("b_lineitem")
        .join(spark.table("b_orders"), Seq("o_orderkey"))
        .groupBy("o_orderpriority").count()
      finally {}
    val plan =
      try joined.queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        10 * 1024 * 1024)
    // the join itself must not shuffle either side (only the final
    // aggregation exchanges); bucketed scan feeds SortMergeJoin direct
    val joinSubtree = plan.split("HashAggregate").last
    assert(joinSubtree.contains("SortMergeJoin"))
    assert(!joinSubtree.contains("Exchange hashpartitioning(o_orderkey"),
      s"unexpected join-side shuffle:\n$plan")
    assert(joined.count() == 5)
  }
}
