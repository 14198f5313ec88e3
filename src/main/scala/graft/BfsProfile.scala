package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase profiler for the g_bfs entry (round-15 evidence). */
object BfsProfile {
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
      val e0 = time(s"[$round] edge frame construct") {
        Tables.lineitem(spark, d)
          .join(Tables.orders(spark, d),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct()
      }
      val cnt = time(s"[$round] edges.count") { e0.count() }
      println(s"  raw edges: $cnt")
      val sym = time(s"[$round] sym distinct+ckpt") {
        e0.select(col("src").as("a"), col("dst").as("b"))
          .unionByName(e0.select(col("dst").as("a"), col("src").as("b")))
          .distinct()
          .localCheckpoint()
      }
      var frontier = time(s"[$round] seed") {
        graft.ext.Ckpt(sym.agg(min(col("a")).as("node"))
          .withColumn("dist", lit(0L))
          .filter(col("node").isNotNull))
      }
      var labels = frontier
      var iter = 0
      var done = frontier.isEmpty
      while (!done && iter < 20) {
        val next = time(f"[$round] round $iter%2d next") {
          graft.ext.Ckpt(frontier
            .join(sym, frontier("node") === sym("a"))
            .select(col("b").as("node"), (col("dist") + 1).as("dist"))
            .distinct()
            .join(labels.select(col("node")), Seq("node"), "left_anti"))
        }
        val empty = time(f"[$round] round $iter%2d isEmpty") {
          next.isEmpty
        }
        if (empty) done = true
        else { labels = labels.unionByName(next); frontier = next; iter += 1 }
      }
      time(s"[$round] final noop") {
        labels.select(
          when(col("node") % 2 === 0, lit("cust"))
            .otherwise(lit("supp")).as("kind"),
          floor(col("node") / 2).cast("long").as("id"),
          col("dist"))
          .orderBy("kind", "id")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
