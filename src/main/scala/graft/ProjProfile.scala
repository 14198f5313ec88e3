package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: wall-time profile of p_projects_pipeline at a probe
  * corpus. Since the r7 lifecycle fix the builder evaluates the whole
  * dataflow eagerly (union localCheckpoint, then melt-cache release),
  * so "construct" carries the full pipeline cost and the six section
  * timings measure reads of the materialized frame — useful as a
  * sanity floor, not a section-cost breakdown. (The r7 section-cost
  * A/B/C in BASELINE.md was measured on the pre-fix lazy shape.)
  * Usage: ProjProfile [dir]. */
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
