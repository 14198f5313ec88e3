package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue is the Morton interleave (reference bit-twiddle on " +
      "sampled keys), monotone-safe in each dim at fixed other dim") {
    def refZ(x: Long, y: Long): Long = {
      var z = 0L
      for (b <- 0 until 21)
        z |= (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
      z
    }
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (14999L, 2404L),
      (123456L, 654321L), ((1L << 21) - 1, (1L << 21) - 1))
    val got = samples.toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == samples.map { case (x, y) => refZ(x, y) },
      s"got ${got.toSeq}")
  }

  test("materialized z-order layout: engine PARTITION PRUNING serves " +
      "the box (scan reads strictly fewer files than the layout " +
      "holds; plan carries the partition filter) and results equal " +
      "the plain box filter") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val dir = java.nio.file.Files
      .createTempDirectory("zorder_spec").toString
    try {
      val orders = graft.Tables.orders(spark, sf0001)
      ZOrder.writeZOrdered(orders, dir)
      val allFiles = {
        def walk(f: java.io.File): Seq[java.io.File] = {
          val cs = Option(f.listFiles()).toSeq.flatten
          cs.filter(_.isFile) ++ cs.filter(_.isDirectory).flatMap(walk)
        }
        walk(new java.io.File(dir))
          .count(_.getName.endsWith(".parquet"))
      }
      assert(allFiles > 4, s"layout too small to prove pruning: $allFiles")
      // an sf0.001-sized box (custkeys only reach ~150 here; the
      // catalog's both_selective box would be EMPTY and AQE collapses
      // an all-pruned scan to EmptyRelation — no scan left to assert)
      val (cl, ch, dl, dh) = (16L, 112L, 320L, 960L)
      val pruned = ZOrder.scanBox(spark, dir, cl, ch, dl, dh)
        .orderBy("o_orderkey")
      val got = pruned.collect().toSeq
      // numFiles metric of the executed scan < total layout files
      // (recurse through AQE query-stage wrappers — `collect` does
      // not traverse into QueryStageExec.plan)
      def allScans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allScans(q.plan)
        case f: FileSourceScanExec => Seq(f)
        case o => o.children.flatMap(allScans)
      }
      val scans = allScans(pruned.queryExecution.executedPlan)
      assert(scans.nonEmpty)
      val numFiles = scans.map(_.metrics("numFiles").value).sum
      assert(numFiles > 0 && numFiles < allFiles,
        s"expected pruning: read $numFiles of $allFiles files")
      assert(scans.exists(_.toString.contains("PartitionFilters: [")))
      // layout must never change results
      val want = orders.select(col("o_orderkey"),
          col("o_custkey").cast("long").as("ck"),
          datediff(col("o_orderdate"), to_date(lit("1995-01-01")))
            .cast("long").as("dy"))
        .filter(col("ck") >= cl && col("ck") < ch &&
          col("dy") >= dl && col("dy") < dh)
        .orderBy("o_orderkey").collect().toSeq
      assert(got.nonEmpty && got == want,
        s"got=${got.size} want=${want.size}")
    } finally {
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("zBucketsForBox is exact: every in-box row's bucket is " +
      "enumerated, and enumeration stays box-sized") {
    val orders = graft.Tables.orders(spark, sf0001)
    val keyed = orders.select(
        col("o_custkey").cast("long").as("ck"),
        datediff(col("o_orderdate"), to_date(lit("1995-01-01")))
          .cast("long").as("dy"))
      .withColumn("zbkt", shiftright(
        ZOrder.zValue(col("ck"), col("dy")), 16))
    for ((bn, cl, ch, dl, dh) <- ZOrder.Boxes) {
      val buckets = ZOrder.zBucketsForBox(cl, ch, dl, dh).toSet
      val inBox = keyed.filter(col("ck") >= cl && col("ck") < ch &&
          col("dy") >= dl && col("dy") < dh)
        .select("zbkt").distinct().collect().map(_.getLong(0)).toSet
      assert(inBox.subsetOf(buckets),
        s"$bn: rows in non-enumerated buckets ${inBox -- buckets}")
    }
  }

  test("skipping report: z-order is strictly better than both 1-D " +
      "sorts on the mixed box, and never degrades to a full scan " +
      "on single-dim boxes (each 1-D sort does, on its wrong box)") {
    val rep = ZOrder.skippingReport(
      graft.Tables.orders(spark, "/root/testdata/sf0.01"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(4), r.getLong(5))).toMap
    val total = graft.Tables.orders(spark, "/root/testdata/sf0.01").count()
    def scanned(l: String, b: String) = rep((l, b))._1
    // mixed box: z-order reads the fewest rows
    assert(scanned("zorder", "both_selective") <=
      scanned("cust_sort", "both_selective"))
    assert(scanned("zorder", "both_selective") <=
      scanned("date_sort", "both_selective"))
    // wrong-dimension 1-D sorts read everything; z-order never does
    assert(scanned("date_sort", "cust_selective") == total)
    assert(scanned("cust_sort", "date_selective") == total)
    assert(scanned("zorder", "cust_selective") < total)
    assert(scanned("zorder", "date_selective") < total)
    // pruned scans are sound: scanned >= matching, every layout/box
    for (((l, b), (sc, m)) <- rep)
      assert(sc >= m, s"$l/$b: scanned $sc < matching $m")
  }
}
