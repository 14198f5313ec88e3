package graft

import java.io.{File, PrintWriter}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: writes the round-16 plans/r16 evidence files. Many
  * touched queries end in a localCheckpoint, whose FINAL
  * explain("formatted") is a bare RDD scan — so each file also
  * carries the explain of the INTERNAL frame the round-16 change
  * lives in, where that frame is reachable from public API:
  *
  *  - the stored-index probe ([[graft.ext.Similarity.pqIndexProbe]]):
  *    v1 read coarse/codebooks parquet per consumer; v2 reads the
  *    packed meta once and broadcasts LocalRelations;
  *  - the semdedup gate state ([[graft.ext.Similarity.semDedupFit]]):
  *    centroids2 was a checkpoint scan, now a LocalRelation within
  *    the LUT gate;
  *  - one PageRank iteration's rank update (inline replica, the
  *    PlanDumpR15 BFS technique): the per-iteration
  *    crossJoin(broadcast(nRow)) vs the driver literal.
  *
  * Where a change is job-structure only (lazy-checkpoint fusion,
  * shared fit frames) the final plan is unchanged by design and the
  * evidence lives in plans/r16/jobaudit_{before,after}.txt — the
  * file says so in its header section.
  * Usage: scripts/run.sh graft.PlanDumpR16 <before|after> [sfDir]
  */
object PlanDumpR16 {
  private def w(path: String, sections: Seq[(String, String)]): Unit = {
    val pw = new PrintWriter(new File(path))
    try sections.foreach { case (title, body) =>
      pw.println(s"==== $title ====")
      pw.println(body)
      pw.println()
    } finally pw.close()
  }

  private def fmt(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("after")
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val outDir = "/root/repo/plans/r16"
    new File(outDir).mkdirs()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def finalPlan(q: String, note: String): Unit = {
      val fin = SparkEntry.queries(q)(spark, d)
      w(s"$outDir/${q}_$tag.txt", Seq(
        (s"$q FINAL query plan — $note", fmt(fin))))
      println(s"wrote ${q}_$tag")
    }

    // ---- stored PQ index: probe plan over the layout ----
    val e = Tables.embeddings(spark, d)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_plandump_idx").toString
    try {
      graft.ext.Similarity.buildPqIndex(e, dir, m = 16, kSub = 32,
        iters = 2, fitSampleMod = 4L)
      val probe = graft.ext.Similarity.pqIndexProbe(spark, dir, e,
        graft.ext.Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, nprobe = 3)
      val layoutNote =
        if (tag == "before") "v1 layout: coarse + codebooks read as " +
          "separate parquet artifacts (one scan per consumer — the " +
          "coarse broadcast, the codebook LUT broadcast, plus an " +
          "agg-max read for m)"
        else "v2 layout: ONE meta read collected driver-side; coarse " +
          "and codebook tables enter as LocalRelations (job-free " +
          "LocalTableScan under every broadcast)"
      for (q <- Seq("s_ann_index_scan", "s_ann_index_append")) {
        val fin = SparkEntry.queries(q)(spark, d)
        w(s"$outDir/${q}_$tag.txt", Seq(
          (s"$q FINAL query plan (checkpoint-ended; the probe below " +
            "is where the round-16 layout change lives)", fmt(fin)),
          (s"pqIndexProbe top-k plan over the stored layout — " +
            layoutNote, fmt(probe))))
        println(s"wrote ${q}_$tag")
      }
    } finally graft.queries.QueryUtil.deleteRecursively(dir)

    // ---- semdedup hier/gate: the level-2 state frame ----
    val st = graft.ext.Similarity.semDedupFit(e,
      targetClusterSize = 250L, iters = 1)
    w(s"$outDir/d_semdedup_hier_$tag.txt", Seq(
      ("d_semdedup_hier FINAL query plan (checkpoint-ended; the " +
        "level-2 loop-state frame below is where the round-16 change " +
        "lives — per-iteration evidence is job-count, see jobaudit_*)",
        fmt(SparkEntry.queries("d_semdedup_hier")(spark, d))),
      ("hierFit level-2 centroids2 state frame (" +
        (if (tag == "before") "per-iteration Ckpt → checkpoint RDD scan"
         else "bounded collect → LocalRelation (LUT gate k² ≤ 1024)") +
        ")", fmt(st.centroids2))))
    println(s"wrote d_semdedup_hier_$tag")
    w(s"$outDir/d_semdedup_incremental_$tag.txt", Seq(
      ("d_semdedup_incremental FINAL query plan (gate output; same " +
        "level-2 state change as d_semdedup_hier — see that file and " +
        "jobaudit_*)",
        fmt(SparkEntry.queries("d_semdedup_incremental")(spark, d)))))
    println(s"wrote d_semdedup_incremental_$tag")

    // ---- PageRank: one iteration's rank update (inline replica) ----
    val edges = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val e0 = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val deg = e0.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val nNodes = deg.count()
    val nodes = deg.select(col("src").as("node"))
    val lay = e0.join(deg, "src")
    val pr0 =
      if (tag == "before") {
        val nRow = deg.agg(count(lit(1)).as("n"))
        nodes.crossJoin(broadcast(nRow))
          .select(col("node"), expr("1000000000000L div n").as("pr_pico"))
      } else nodes.select(col("node"),
        lit(1000000000000L / nNodes).as("pr_pico"))
    val ranks = pr0.localCheckpoint()
      .select(col("node").as("src"), col("pr_pico"))
    val contrib = lay.join(broadcast(ranks), "src")
      .select(col("dst").as("node"), expr("pr_pico div deg").as("c"))
    val upd =
      if (tag == "before") {
        val nRow = deg.agg(count(lit(1)).as("n"))
        nodes.join(contrib.groupBy(col("node")).agg(sum(col("c")).as("s")),
            Seq("node"), "left")
          .crossJoin(broadcast(nRow))
          .select(col("node"),
            expr("(150000000000L div n) + ((85 * coalesce(s, 0L)) div 100)")
              .as("pr_pico"))
      } else
        nodes.join(contrib.groupBy(col("node")).agg(sum(col("c")).as("s")),
            Seq("node"), "left")
          .select(col("node"),
            (lit(150000000000L / nNodes) +
              expr("(85 * coalesce(s, 0L)) div 100")).as("pr_pico"))
    w(s"$outDir/g_pagerank_$tag.txt", Seq(
      ("g_pagerank FINAL query plan (checkpoint-ended; the iteration " +
        "update below is where the round-16 change lives)",
        fmt(SparkEntry.queries("g_pagerank")(spark, d))),
      ("one rank-update iteration (inline replica of the broadcast " +
        "regime) — " +
        (if (tag == "before") "1/n terms via crossJoin(broadcast(" +
          "1-row count)) re-executed per iteration"
         else "1/n terms as driver literals (nNodes already known " +
           "from the regime pick)"), fmt(upd))))
    println(s"wrote g_pagerank_$tag")

    // ---- job-structure-only changes: final plans + pointer ----
    finalPlan("d_dedup_recall",
      "both generators consume ONE shared persisted shingle frame " +
        "(r16); generators checkpoint internally, so the sharing is " +
        "job-structure evidence — jobaudit_before/after: 33 → 28 jobs")
    finalPlan("d_tokenizer_eval",
      "three tokenizer fits share ONE (w,cnt) corpus aggregate (r16); " +
        "fits run eagerly, so the final plan is the unchanged apply " +
        "union — jobaudit: 32 → 27 jobs, one corpus word-count scan " +
        "instead of three")
    finalPlan("g_bfs",
      "frontier loop: per-round truncation fused with the emptiness " +
        "count (Ckpt.lazily), sym checkpoint fused with the frontier " +
        "init — same plan shape per round, fewer jobs (jobaudit: " +
        "52 → 49)")
    finalPlan("g_doc_centrality",
      "composes minhashLshPairs + pagerank — inherits the PageRank " +
        "literal-1/n change and the CC/lazy-fusion job cuts " +
        "(jobaudit: 37 → 29 jobs)")
    finalPlan("d_dup_clusters",
      "ConnectedComponents label-propagation rounds: truncation " +
        "fused with the convergence change-count (Ckpt.lazily) — " +
        "jobaudit: 39 → 35 jobs")
    finalPlan("s_ann_pq",
      "PQ fit final codebook returns as a LocalRelation (LUT gate): " +
        "the encode collect and the ADC-LUT broadcast read local rows " +
        "job-free — jobaudit: 22 → 21 jobs, bench 2.47 → 1.92 s")
    spark.stop()
  }
}
