package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Dev-only phase profiler for the stored-PQ-index entries
  * (round-15 evidence). */
object IdxProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$n%-34s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    SparkEntry.queries("q_having")(spark, d)
      .write.format("noop").mode("overwrite").save()
    for (round <- Seq("cold", "warm")) {
      val e = Tables.embeddings(spark, d)
        .repartition(spark.sparkContext.defaultParallelism)
      val dir = java.nio.file.Files
        .createTempDirectory("graft_pqidx_prof").toString
      try {
        time(s"[$round] buildPqIndex") {
          Similarity.buildPqIndex(e, dir, m = 16, kSub = 32, iters = 2,
            fitSampleMod = 4L)
        }
        val probe = time(s"[$round] pqIndexProbe construct") {
          Similarity.pqIndexProbe(spark, dir, e,
            Similarity.sampleQueryIds(
              e.filter(col("embedding").isNotNull), n = 16),
            k = 5, nprobe = 3)
        }
        time(s"[$round] probe noop") {
          probe.orderBy("query_id", "rank")
            .write.format("noop").mode("overwrite").save()
        }
      } finally graft.queries.QueryUtil.deleteRecursively(dir)
    }
    spark.stop()
  }
}
