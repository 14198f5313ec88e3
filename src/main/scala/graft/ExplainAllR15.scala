package graft

import java.io.PrintWriter
import org.apache.spark.sql.SparkSession

/** Dev-only (round-15 audit): constructs every declared query and
  * writes a per-query PLAN-SHAPE summary — physical operator counts
  * (Exchange / join strategies / WholeStageCodegen spans) and every
  * scan's ReadSchema + PushedFilters line — to one committed file.
  * The full formatted plans land beside it in /tmp for inspection.
  * Usage: scripts/run.sh graft.ExplainAllR15 [sfDir] [outFile]
  */
object ExplainAllR15 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1)
      .getOrElse("/root/repo/plans/r15/plan_shapes_all.txt")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pw = new PrintWriter(out)
    pw.println(s"# Physical plan shapes, every declared query, $d")
    pw.println("# count columns: Exchange / BroadcastExchange / " +
      "SortMergeJoin / BroadcastHashJoin / ShuffledHashJoin / " +
      "BroadcastNestedLoopJoin / WholeStageCodegen spans")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val df = fn(spark, d)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
        // count operator NODES in the numbered detail list ("(n) Op")
        // so join-type words between name and paren don't hide them
        def c(op: String): Int = plan.linesIterator.count(l =>
          l.matches(s"""^\\(\\d+\\) $op.*"""))
        val exch = plan.linesIterator.count(l =>
          l.matches("""^\(\d+\) Exchange.*"""))
        pw.println(f"$name%-30s exch=$exch bexch=${c("BroadcastExchange")} " +
          f"smj=${c("SortMergeJoin")} bhj=${c("BroadcastHashJoin")} " +
          f"shj=${c("ShuffledHashJoin")} bnlj=${c("BroadcastNestedLoopJoin")} " +
          f"wsc=${c("WholeStageCodegen")}")
        plan.linesIterator
          .filter(l => l.contains("PushedFilters") ||
            l.contains("ReadSchema"))
          .foreach(l => pw.println("    " + l.trim.take(160)))
        val fpw = new PrintWriter(s"/tmp/plans_r15_all_$name.txt")
        try fpw.println(plan) finally fpw.close()
      } catch { case e: Throwable =>
        pw.println(s"$name  EXPLAIN FAILED: ${e.getMessage}")
      }
      pw.flush()
    }
    pw.close()
    println(s"wrote $out")
    spark.stop()
  }
}
