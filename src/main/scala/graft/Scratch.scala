package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.experimental.extraOptimizations = Seq(rules.FoldRollingHash)
    val df = Seq(1).toDF("x").select(
      functions.RollingHash.rolling_hash(lit("const")).as("h"))
    println("optimized plan: " + df.queryExecution.optimizedPlan)
    df.show()
    spark.stop()
  }
}
