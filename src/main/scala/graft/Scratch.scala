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
    val df = spark.read.format("sheet").load("/tmp/sheet_ok.json")
    df.show(false); df.printSchema()
    println("empty sheet rows: " +
      spark.read.format("sheet").load("/tmp/sheet_empty.json").count())
    try spark.read.format("sheet").load("/tmp/nope.json").show()
    catch { case e: Throwable => println("probe error: " + e.getMessage) }
    spark.stop()
  }
}
