package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only 10× scale probe (not part of the driver contract): the
  * harness ships sf0.1 as its largest dataset, so the 100×-design
  * claims of the dedup/ANN family are substantiated by synthesizing a
  * 10× corpus (sf1-equivalent: 50k docs / 20k vectors) and timing the
  * operators on it.
  *
  * Corpus construction is deterministic: replica i of a document gets
  * doc_id + i·10⁷ and every token suffixed with a replica tag
  * (regexp_replace), so cross-replica Jaccard is exactly 0 — the
  * true-duplicate structure scales linearly (10× blocks, 10× pairs),
  * which is the honest scaling question. (A first attempt used a
  * consonant `translate`; this corpus's short vocabulary mostly
  * survived it, silently merging min-shingle blocks across replicas
  * into 100× candidate counts — a useful stress, but not the
  * linear-scaling measurement.) Embedding replicas keep their vectors
  * (denser clusters — the realistic shape for a larger corpus) under
  * shifted ids.
  *
  * Usage: ScaleProbe [reps] — writes parquet under /tmp/sf1probe once,
  * then times d_minhash_lsh, d_jaccard_pairs, d_dup_clusters,
  * s_ann_ivf_kmeans against it and prints plan audit lines.
  */
object ScaleProbe {

  val ProbeDir = "/tmp/sf1probe"
  val Queries = Seq("d_minhash_lsh", "d_jaccard_pairs",
    "d_dup_clusters", "s_ann_ivf_kmeans",
    // round-4 additions: d_semdedup is the interesting one (its
    // within-cluster pair join is Σ|cluster|² — at 10× with k fixed
    // at 8 this measures the WORST case, clusters 10× oversized;
    // production raises k with N)
    "d_semdedup", "d_span_dedup", "d_lm_score",
    // second-half round-4 additions. s_ann_recall is deliberately NOT
    // probed: its brute-force ground-truth leg is the documented
    // O(queries·corpus) baseline and the query set scales with the
    // corpus here (vec_id % 40), so 10× data = 100× work by design —
    // at scale recall is estimated on a fixed query sample (see its
    // scaladoc), which the probe corpus can't express without
    // changing the query.
    "d_chunk_dedup", "d_kl_sources", "d_incremental_dedup",
    "q_funnel", "q_retention_cohorts")

  def buildCorpus(spark: SparkSession, srcDir: String): Unit = {
    val docs = Tables.documents(spark, srcDir)
    val emb = Tables.embeddings(spark, srcDir)
    val replicasD = (0 until 10).map { i =>
      docs.select(
        (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        (if (i == 0) col("text")
         else regexp_replace(col("text"), "([a-z0-9]+)", "$1x" + i))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    replicasD.reduce(_ unionByName _)
      .repartition(64)
      .write.mode("overwrite").parquet(s"$ProbeDir/documents.parquet")
    val replicasE = (0 until 10).map { i =>
      emb.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        col("embedding"), col("label"))
    }
    replicasE.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$ProbeDir/embeddings.parquet")
    // events: shifted event ids AND user ids → 10× users with the
    // per-user event distribution preserved (the linear-scaling
    // question for funnel/retention, whose state is per-user).
    // Read RAW (ts stays a nanos long) so Tables.events' `ts div
    // 1000` conversion still applies to the probe copy.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$srcDir/events.parquet")
    val replicasV = (0 until 10).map { i =>
      ev.select((col("event_id") + lit(i * 10000000L)).as("event_id"),
        col("ts"), (col("user_id") + lit(i * 1000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }
    replicasV.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$ProbeDir/events.parquet")
  }

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[probe] building 10x corpus at $ProbeDir")
    val tBuild = System.nanoTime()
    buildCorpus(spark, "/root/testdata/sf0.1")
    println(f"[probe] corpus built in ${(System.nanoTime() - tBuild) / 1e9}%.1fs")
    for (q <- Queries) {
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, ProbeDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val med = times.sorted.apply(reps / 2)
      println(f"[probe] $q%-20s median ${med}%7.2fs  " +
        f"(runs ${times.map(t => f"$t%.2f").mkString("/")})")
      Scratch.audit(q, SparkEntry.queries(q)(spark, ProbeDir))
    }
    // The catalog d_semdedup holds k=8 (sized for the 2k-vector sf0.1
    // corpus) — at 10× that is the deliberate WORST case: mean cluster
    // size grows 10×, pair work Σ|c|² grows ~100×. The production
    // recipe keeps mean cluster size constant by scaling k with N;
    // measure it so both points are on record.
    {
      val kScaled = 80
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        graft.ext.Similarity.semDedup(
            graft.Tables.embeddings(spark, ProbeDir),
            kClusters = kScaled, iters = 2, threshold = 0.45)
          .orderBy("vec_id")
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val med = times.sorted.apply(reps / 2)
      println(f"[probe] d_semdedup(k=$kScaled) median ${med}%7.2fs  " +
        f"(runs ${times.map(t => f"$t%.2f").mkString("/")})")
    }
    spark.stop()
  }
}
