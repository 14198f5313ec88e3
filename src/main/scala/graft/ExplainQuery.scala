package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the optimized/physical plan of any catalog query —
  * the `.explain("formatted")` loop the build process runs after each
  * operator lands (broadcast vs shuffle joins, pushed filters, read
  * schemas, whole-stage codegen spans).
  *
  * Usage: scripts/run.sh graft.ExplainQuery <query> [sfDir] [mode]
  *   mode: formatted (default) | simple | extended | cost
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse {
      System.err.println(
        "usage: graft.ExplainQuery <query> [sfDir] [mode]\n" +
        "  queries: " + SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val mode = args.lift(2).getOrElse("formatted")
    val fn = SparkEntry.queries.getOrElse(name, {
      System.err.println(s"unknown query '$name'")
      sys.exit(2)
    })
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    fn(spark, sfDir).explain(mode)
    spark.stop()
  }
}
