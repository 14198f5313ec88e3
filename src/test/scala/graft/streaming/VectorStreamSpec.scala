package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Similarity

/** Pins the streaming ANN ingest gate's contract
  * ([[VectorStream]]): the gate is STATELESS given the static index,
  * so the union of per-micro-batch outputs equals the one-shot batch
  * probe row-for-row regardless of how the file source batches the
  * input, and the streaming query runs with NO state store. */
class VectorStreamSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batched gate outputs union to the one-shot batch probe; " +
      "the query is stateless and reads every input row exactly once") {
    val emb = graft.Tables.embeddings(spark, sf0001)
      .filter($"embedding".isNotNull)
    val manifest = emb.filter($"vec_id" % 5 =!= 0)
    val incoming = emb.filter($"vec_id" % 5 === 0)
    val built = Similarity.ivfIndexBuild(manifest,
      targetPartitionSize = 64, iters = 2)
    // static state between refits — persisted exactly as production
    val index = built.copy(
      centroids = built.centroids.localCheckpoint(),
      members = built.members.localCheckpoint())

    val srcDir = java.nio.file.Files
      .createTempDirectory("vecgate_src").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("vecgate_ckpt").toString
    try {
      // 4 files + maxFilesPerTrigger=1 → 4 micro-batches
      incoming.repartition(4).write.mode("overwrite").parquet(srcDir)
      val out = new ConcurrentLinkedQueue[(Long, Long, Double, Int)]()
      val q = VectorStream.ingestGateStream(spark, srcDir, index,
          k = 2, nprobe = 2, ckpt) { (attach: DataFrame, _: Long) =>
        attach.select("new_id", "match_id", "cos_sim", "rank")
          .as[(Long, Long, Double, Int)].collect().foreach(out.add)
        ()
      }
      try q.processAllAvailable() finally q.stop()

      // every input row read exactly once, across >1 micro-batch
      val progress = q.recentProgress
      assert(progress.map(_.numInputRows).sum == incoming.count())
      assert(progress.count(_.numInputRows > 0) > 1,
        "fixture degenerated to a single micro-batch — parity would " +
          "be vacuous")
      // STATELESS: no state store operator ever materialized
      assert(progress.flatMap(_.stateOperators).forall(
        _.numRowsTotal == 0),
        "the gate must not accumulate streaming state")

      val streamed = out.toArray(
        Array.empty[(Long, Long, Double, Int)]).toSet
      val batch = VectorStream.gateBatch(index, k = 2, nprobe = 2,
          incoming)
        .select("new_id", "match_id", "cos_sim", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(streamed == batch,
        "micro-batched gate diverged from the one-shot batch probe")
    } finally {
      graft.queries.QueryUtil.deleteRecursively(srcDir)
      graft.queries.QueryUtil.deleteRecursively(ckpt)
    }
  }
}
