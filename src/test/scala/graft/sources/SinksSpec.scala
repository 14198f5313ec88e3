package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Sink-side coverage (SURVEY.md §2.1 S3/S4): partitioned parquet
  * layout, partition pruning on read-back, and atomic overwrite — the
  * lakehouse stand-ins for the reference's JDBC target (no database in
  * this container; `Merge` provides the MERGE semantics).
  */
class SinksSpec extends SparkSpec {

  test("hive-partitioned write prunes partitions on read-back") {
    val dir = Files.createTempDirectory("orders_part").toString
    Tables.orders(spark, sf0001)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").mode("overwrite").parquet(dir)

    // layout: one dir per year
    val years = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("o_year=")).map(_.getName).sorted
    assert(years.nonEmpty && years.forall(_.matches("o_year=\\d{4}")))

    val pruned = spark.read.parquet(dir).filter(col("o_year") === 1996)
    val plan = pruned.queryExecution.executedPlan.toString
    // pruning happens at planning: non-matching partition dirs are
    // never listed as input files
    val files = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("o_year=1996")))
    assert(pruned.count() ==
      Tables.orders(spark, sf0001)
        .filter(year(col("o_orderdate")) === 1996).count())
  }

  test("overwrite of a partitioned table replaces content atomically " +
      "per write") {
    val dir = Files.createTempDirectory("cust_part").toString
    val c = Tables.customer(spark, sf0001)
    c.write.partitionBy("c_mktsegment").mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir).count()
    // second write with updated values fully replaces
    c.withColumn("c_acctbal", col("c_acctbal") + 1)
      .write.partitionBy("c_mktsegment").mode("overwrite").parquet(dir)
    val after = spark.read.parquet(dir)
    assert(after.count() == before)
    val delta = after.agg(sum(col("c_acctbal"))).first().getDouble(0) -
      c.agg(sum(col("c_acctbal"))).first().getDouble(0)
    assert(math.abs(delta - before) < 1e-6)
  }
}
