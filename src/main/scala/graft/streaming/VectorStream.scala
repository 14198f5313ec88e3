package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.ext.Similarity

/** Structured Streaming surface for the ANN ingest gate — the
  * stream-side composition of the vector family with §2.10's
  * streaming tier (north-star extension; the reference is batch-only).
  *
  * Production shape: the IVF index is STATIC state between refits
  * ([[Similarity.ivfIndexBuild]] / [[Similarity.ivfIndexBuildSqrt]] —
  * persisted centroids + members, the FAISS train+add split), and the
  * incoming vector stream is gated per micro-batch through
  * [[Similarity.ivfProbe]] — each arriving vector emits its top-k
  * attach points against the manifest for downstream dedup-or-link
  * decisions. The gate is STATELESS by construction: an incoming
  * row's attach points depend only on itself and the static index, so
  * (a) the streaming query needs NO state store (nothing accumulates,
  * nothing to water-mark — the plan is a per-batch projection+join),
  * and (b) stream ≡ batch parity holds for ANY batching of the input
  * — VectorStreamSpec pins the union of per-micro-batch outputs
  * row-for-row against the one-shot batch probe, plus the
  * no-stateful-operator claim. Exactly-once lands on the usual
  * file-source/foreachBatch contract: source offsets checkpoint, and
  * the sink write is idempotent per (vec_id, rank).
  *
  * The batch core is the SAME [[Similarity.ivfProbe]] the
  * hash-verified `s_ann_incremental` / `s_ann_incremental_sqrt`
  * entries run — the streaming wrapper adds no arithmetic of its own,
  * which is what makes the parity argument airtight. */
object VectorStream {

  /** embeddings schema for readStream. */
  val schema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** The per-micro-batch gate body: probe `incoming` against the
    * static `index`, emitting (new_id, match_id, cos_sim, rank). */
  def gateBatch(index: Similarity.IvfIndex, k: Int, nprobe: Int,
      incoming: DataFrame): DataFrame =
    Similarity.ivfProbe(index, incoming, k, nprobe)

  /** Wire a parquet-directory vector stream through the gate via
    * foreachBatch. `onBatch` receives each micro-batch's attach
    * points (already computed); checkpointing and restart semantics
    * are the standard file-source contract. */
  def ingestGateStream(spark: SparkSession, srcDir: String,
      index: Similarity.IvfIndex, k: Int, nprobe: Int,
      checkpointDir: String)(
      onBatch: (DataFrame, Long) => Unit): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, epoch: Long) =>
        onBatch(gateBatch(index, k, nprobe, b), epoch)
      }
      .start()

  /** The per-micro-batch SEMANTIC dedup gate body — the
    * [[Similarity.SemDedupState]] sibling of [[gateBatch]], completing
    * the manifest-gate trio's streaming story (MinHash and ANN gates
    * came first): each arriving vector is kept/dropped against the
    * FROZEN manifest state plus this batch's own smaller ids. Unlike
    * the ANN gate the body is stateless per BATCH, not per row
    * (within-batch greedy couples rows that share a micro-batch);
    * the cross-batch contract is the family's: the manifest does not
    * grow between refits, so dups split across micro-batches are both
    * kept until the next refit folds accepted rows in —
    * VectorStreamSpec pins both sides of that contract. */
  def semGateBatch(state: Similarity.SemDedupState, threshold: Double,
      incoming: DataFrame): DataFrame =
    Similarity.semDedupGateBatch(state, incoming, threshold)

  /** [[ingestGateStream]] for the semantic gate: per-file micro-
    * batches through [[semGateBatch]] against the frozen state. */
  def ingestSemGateStream(spark: SparkSession, srcDir: String,
      state: Similarity.SemDedupState, threshold: Double,
      checkpointDir: String)(
      onBatch: (DataFrame, Long) => Unit): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, epoch: Long) =>
        onBatch(semGateBatch(state, threshold, b), epoch)
      }
      .start()
}
