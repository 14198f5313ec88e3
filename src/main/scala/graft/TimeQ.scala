package graft

import org.apache.spark.sql.SparkSession

/** Dev-only micro-timer: phase-level timing of one catalog query
  * (construction — which includes any eager localCheckpoint — vs the
  * evaluated noop write). Usage: TimeQ <name> [sfDir]. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("p_projects_pipeline")
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$n%-30s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    val q = SparkEntry.queries(name)
    // warmup: scheduler/codegen spin-up on an unrelated query
    SparkEntry.queries("q_having")(spark, d)
      .write.format("noop").mode("overwrite").save()
    time("cold full (construct+noop)") {
      q(spark, d).write.format("noop").mode("overwrite").save()
    }
    val df = time("construct only") { q(spark, d) }
    time("noop write of constructed") {
      df.write.format("noop").mode("overwrite").save()
    }
    time("warm full") {
      q(spark, d).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
