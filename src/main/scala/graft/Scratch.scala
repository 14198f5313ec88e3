package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scratchpad (not part of the driver contract). */
object Scratch {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
      .repartition(spark.sparkContext.defaultParallelism)

    // warmup
    noop(docs.select(col("doc_id")))

    val sh0 = docs.select(col("doc_id"),
      ext.Dedup.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    time("shingles only")(noop(sh0))
    time("shingles+block")(noop(sh0.withColumn("block",
      array_min(col("sh")))))
    time("full jaccardPairs")(noop(ext.Dedup.jaccardPairs(
      docs, "doc_id", "text", 3, 0.2)))
    time("full jaccardPairs x2")(noop(ext.Dedup.jaccardPairs(
      docs, "doc_id", "text", 3, 0.2)))
    spark.stop()
  }
}
