package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val d = "/root/testdata/sf0.001"

    // SQL registration of custom expressions
    GraftExtensions.register(spark)
    spark.sql("SELECT rolling_hash('graft') AS h").show()

    // stateful streaming sessionization end-to-end
    val staged = java.nio.file.Files
      .createTempDirectory("scratch_events").toString
    Tables.events(spark, d)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(staged)
    val src = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(
        streaming.EventsStream.schema.filter(_.name != "props")))
      .parquet(staged)
      .as[streaming.StatefulOps.EventRow]
    val q = streaming.StatefulOps.sessionizeStream(src, 600000000L,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.outputMode("append")
      .format("memory").queryName("scratch_sessions").start()
    q.processAllAvailable(); q.stop()
    println("closed sessions emitted: " +
      spark.table("scratch_sessions").count())
    spark.table("scratch_sessions").orderBy("user_id", "session_start")
      .show(3, false)
    spark.stop()
  }
}
