package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = queries.Parity.queries("p_scd2_merge")(
      spark, "/root/testdata/sf0.001")
    println(df.queryExecution.executedPlan.treeString.split("\n")
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Generate") || l.contains("Scan parquet"))
      .mkString("\n"))
    spark.stop()
  }
}
