package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scratchpad (not part of the driver contract): plan audits
  * for the hot queries — join strategies, exchanges, scan pushdown. */
object Scratch {
  def audit(name: String, df: DataFrame): Unit = {
    // explainString rather than executedPlan.treeString: under AQE the
    // top node renders only the current (collapsed) subtree
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    val interesting = plan.split("\n").filter(l =>
      l.contains("Join") || l.contains("Exchange") ||
      l.contains("Scan parquet") || l.contains("InMemory") ||
      l.contains("WholeStageCodegen"))
    println(s"===== $name =====")
    println(interesting.take(30).mkString("\n"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // First arg starting with "/" overrides the table dir (e.g. a
    // ScaleProbe corpus at /tmp/sf10probe); the rest are query names.
    val (d, names) = args.toSeq match {
      case dir +: rest if dir.startsWith("/") => (dir, rest)
      case rest => ("/root/testdata/sf0.01", rest)
    }
    val qs = if (names.nonEmpty) names
      else Seq("d_jaccard_pairs", "d_embed_dups", "q_hll_portable",
        "s_ann_ivf", "d_minhash_lsh")
    for (q <- qs) audit(q, SparkEntry.queries(q)(spark, d))
    spark.stop()
  }
}
