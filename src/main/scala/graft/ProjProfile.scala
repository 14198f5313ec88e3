package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: per-section wall-time profile of p_projects_pipeline's
  * output union at a probe corpus — which of the six section scans
  * actually costs at scale. Usage: ProjProfile [dir]. */
object ProjProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1parityprobe")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(n: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $n%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    // construction runs the eager localCheckpoint (merge + id window)
    // once — timed separately from the six per-section scans
    var q: Seq[(String, org.apache.spark.sql.DataFrame)] = null
    time("construct (ckpt merge)") {
      q = graft.queries.Parity.projProfileParts(spark, d)
    }
    for ((name, df) <- q)
      time(name) {
        df.write.format("noop").mode("overwrite").save()
      }
    spark.stop()
  }
}
