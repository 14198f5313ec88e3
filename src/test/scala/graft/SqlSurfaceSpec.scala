package graft

import org.apache.spark.sql.functions._

/** The engine is equally usable through SQL strings: testdata tables
  * registered as temp views + `spark.sql(...)` must agree with the
  * DataFrame catalog queries.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("spark.sql over registered views equals the DataFrame query") {
    for (t <- Seq("lineitem", "orders", "customer"))
      spark.read.parquet(s"$sf0001/$t.parquet")
        .createOrReplaceTempView(t)
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
        |    AS sum_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '2000-01-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
      .collect().toSeq
    val df = queries.Analytics.q1PricingSummary(spark, sf0001)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
      .collect().toSeq
    assert(sql == df)
  }

  test("csv round-trip preserves typed data") {
    val dir = java.nio.file.Files.createTempDirectory("csv_rt").toString
    val src = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
        "o_orderpriority")
    src.write.mode("overwrite").option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss").csv(dir)
    val back = spark.read.option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .schema(src.schema).csv(dir)
    assert(back.count() == src.count())
    val a = src.orderBy("o_orderkey").collect().toSeq
    val b = back.orderBy("o_orderkey").collect().toSeq
    assert(a == b)
  }
}
