package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase profiler for the OPQ ANN chain (round-15 evidence):
  * splits s_ann_pq_opq-shaped work into its eager phases so the
  * optimization targets the measured wall, not a guess.
  * Usage: scripts/run.sh graft.OpqProfile [sfDir]
  */
object OpqProfile {
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
    // warmup
    SparkEntry.queries("q_having")(spark, d)
      .write.format("noop").mode("overwrite").save()
    val e = Tables.embeddings(spark, d)
      .repartition(spark.sparkContext.defaultParallelism)
    val (_, c) = time("covMeans") {
      graft.ext.Pca.covMeans(e, 64)
    }
    val rot = time("opqRotation (local)") {
      graft.ext.Pca.opqRotation(c, 64, m = 16)
    }
    val rotated = time("applyRotation+localCheckpoint") {
      graft.ext.Pca.applyRotation(e, rot).localCheckpoint()
    }
    val out = time("pqTopK construct") {
      graft.ext.Similarity.pqTopK(rotated,
        graft.ext.Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, m = 16, kSub = 32, iters = 2)
    }
    time("noop write") {
      out.orderBy("query_id", "rank")
        .write.format("noop").mode("overwrite").save()
    }
    // second run, warm
    time("WARM covMeans") { graft.ext.Pca.covMeans(e, 64) }
    val rotated2 = time("WARM applyRotation+ckpt") {
      graft.ext.Pca.applyRotation(e, rot).localCheckpoint()
    }
    val out2 = time("WARM pqTopK construct") {
      graft.ext.Similarity.pqTopK(rotated2,
        graft.ext.Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, m = 16, kSub = 32, iters = 2)
    }
    time("WARM noop write") {
      out2.orderBy("query_id", "rank")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
