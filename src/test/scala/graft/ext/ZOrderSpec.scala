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
