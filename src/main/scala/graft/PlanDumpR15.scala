package graft

import java.io.{File, PrintWriter}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: writes the round-15 plans/r15 evidence files. For
  * checkpoint-ended queries the FINAL explain("formatted") is a bare
  * RDD scan, so each file also carries the explain of the internal
  * job the optimization changed (the rotation projection / the
  * per-round BFS join), labeled per section.
  * Usage: scripts/run.sh graft.PlanDumpR15 <before|after> [sfDir]
  */
object PlanDumpR15 {
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
    val outDir = "/root/repo/plans/r15"
    new File(outDir).mkdirs()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = Tables.embeddings(spark, d)
      .repartition(spark.sparkContext.defaultParallelism)
    val (_, c) = graft.ext.Pca.covMeans(e, 64)
    val rot = graft.ext.Pca.opqRotation(c, 64, m = 16)

    // the one physical job the MatVecLit change replaced: the rotated
    // projection (identical change feeds s_ann_pq_opq,
    // s_ann_ivf_pq_opq_res, s_ann_ivf_pq_opq_res_sampled)
    val proj =
      if (tag == "before") graft.ext.Pca.applyRotationTree(e, rot)
      else graft.ext.Pca.applyRotation(e, rot)
    for (q <- Seq("s_ann_pq_opq", "s_ann_ivf_pq_opq_res",
        "s_ann_ivf_pq_opq_res_sampled")) {
      val fin = SparkEntry.queries(q)(spark, d)
      w(s"$outDir/${q}_$tag.txt", Seq(
        (s"$q FINAL query plan (checkpoint-ended; the rotation job " +
          "below is where the round-15 change lives)", fmt(fin)),
        ("rotation projection job (applyRotation" +
          (if (tag == "before") "Tree — dim^2 literal fold" else
            " — one mat_vec_lit kernel node") + ")", fmt(proj))))
      println(s"wrote ${q}_$tag")
    }

    // g_bfs: the per-round frontier join against (before) the
    // persisted bucketed adjacency table vs (after) the in-memory
    // checkpointed sym frame, plus the final plan
    val e0 = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val finBfs = SparkEntry.queries("g_bfs")(spark, d)
    val roundJoin: DataFrame =
      if (tag == "before") {
        val dir = java.nio.file.Files
          .createTempDirectory("graft_bfs_plandump").toString
        val tbl = "graft_bfs_plandump_adj"
        val symRaw = e0.select(col("src").as("a"), col("dst").as("b"))
          .unionByName(e0.select(col("dst").as("a"), col("src").as("b")))
          .distinct()
        symRaw.repartition(32, col("a"))
          .write.bucketBy(32, "a").sortBy("a")
          .option("path", s"$dir/adj").mode("overwrite").saveAsTable(tbl)
        val sym = spark.table(tbl)
        val frontier = graft.ext.Ckpt(sym.agg(min(col("a")).as("node"))
          .withColumn("dist", lit(0L)).filter(col("node").isNotNull))
        frontier.join(sym, frontier("node") === sym("a"))
          .select(col("b").as("node"), (col("dist") + 1).as("dist"))
          .distinct()
          .join(frontier.select(col("node")), Seq("node"), "left_anti")
      } else {
        // mirrors the shipped path: dedup-free symmetrize (the g_bfs
        // even/odd proof) coalesced to session parallelism
        val sym = e0.select(col("src").as("a"), col("dst").as("b"))
          .unionByName(e0.select(col("dst").as("a"), col("src").as("b")))
          .coalesce(32).localCheckpoint()
        val frontier = graft.ext.Ckpt(sym.agg(min(col("a")).as("node"))
          .withColumn("dist", lit(0L)).filter(col("node").isNotNull))
        frontier.join(sym, frontier("node") === sym("a"))
          .select(col("b").as("node"), (col("dist") + 1).as("dist"))
          .distinct()
          .join(frontier.select(col("node")), Seq("node"), "left_anti")
      }
    w(s"$outDir/g_bfs_$tag.txt", Seq(
      ("g_bfs FINAL query plan (checkpoint-ended)", fmt(finBfs)),
      ("per-round frontier join (" +
        (if (tag == "before") "persisted bucketed adjacency table"
         else "in-memory checkpointed sym — layout bypassed below " +
           "the 4M sym-edge bound") + ")", fmt(roundJoin))))
    println("wrote g_bfs_" + tag)
    spark.stop()
  }
}
