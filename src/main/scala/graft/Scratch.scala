package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiling scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }

    val docs = Tables.documents(spark, d)
    time("warmup") { docs.write.format("noop").mode("overwrite").save() }
    time("shingles 1 partition") {
      docs.select(col("doc_id"), ext.Dedup.shingles(col("text"), 3).as("sh"))
        .write.format("noop").mode("overwrite").save()
    }
    time("shingles repartitioned") {
      docs.repartition(32)
        .select(col("doc_id"), ext.Dedup.shingles(col("text"), 3).as("sh"))
        .write.format("noop").mode("overwrite").save()
    }
    time("fingerprint HOF repart") {
      docs.repartition(32)
        .select(col("doc_id"), ext.TextStats.fingerprint(col("text")))
        .write.format("noop").mode("overwrite").save()
    }
    time("sha2 dedup repart") {
      ext.Dedup.exact(docs.repartition(32), "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
