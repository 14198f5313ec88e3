package graft.queries

import graft.{SparkSpec, Tables}

/** Specs for `q_moving_window` (90-day RANGE-frame trailing spend)
  * and `d_mad_filter` (per-source median/MAD outlier filter): both
  * are replayed against independent plain-Scala brute-force
  * references on the real sf0.001 tables, so the window-frame
  * semantics (value-bounded pane, tied-date peers) and the
  * lower-median rank arithmetic are pinned by something other than
  * the SQL oracle's own phrasing. */
class RobustStatsSpec extends SparkSpec {

  test("q_moving_window equals a brute-force 90-day pane per order, " +
      "tied dates included as peers") {
    val got = AnalyticsExt.qMovingWindow(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(got.nonEmpty)

    val orders = Tables.orders(spark, sf0001)
      .selectExpr("o_custkey", "o_orderkey",
        "datediff(o_orderdate, date'1970-01-01') AS day",
        "CAST(o_totalprice AS DECIMAL(18,4)) AS price")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDecimal(3)))
    val byCust = orders.groupBy(_._1)
    for ((ck, ok, day, _) <- orders) {
      val pane = byCust(ck).filter(o => o._3 >= day - 90 && o._3 <= day)
      val expSum = pane.map(_._4.doubleValue()).map(BigDecimal(_))
        .sum.toDouble
      val (gotSum, gotN) = got((ck, ok))
      assert(gotN == pane.length, s"($ck,$ok): n $gotN vs ${pane.length}")
      assert(math.abs(gotSum - expSum) < 1e-6,
        s"($ck,$ok): $gotSum vs $expSum")
    }
  }

  test("d_mad_filter matches a plain-Scala lower-median/MAD per " +
      "source, and the keep verdict is the 3-MAD rule with the floor") {
    val got = TrainingData.dMadFilter(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
      .toMap
    assert(got.nonEmpty)

    val docs = Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def lowerMedian(vs: Seq[(Long, Long)]): Long = {
      // (value, doc_id) rank order, element at (n+1)/2 (1-based)
      val sorted = vs.sortBy(identity).map(_._1)
      sorted((sorted.length + 1) / 2 - 1)
    }
    val medBySrc = docs.groupBy(_._2).map { case (src, ds) =>
      src -> lowerMedian(ds.map(d => (d._3, d._1)).toSeq)
    }
    val madBySrc = docs.groupBy(_._2).map { case (src, ds) =>
      src -> lowerMedian(ds.map(d =>
        (math.abs(d._3 - medBySrc(src)), d._1)).toSeq)
    }
    for ((id, src, n) <- docs) {
      val (gSrc, gN, gMed, gMad, gDev, gKeep) = got(id)
      assert(gSrc == src && gN == n)
      assert(gMed == medBySrc(src), s"doc $id med")
      assert(gMad == madBySrc(src), s"doc $id mad")
      val dev = math.abs(n - medBySrc(src))
      assert(gDev == dev)
      assert(gKeep == (dev <= 3 * math.max(madBySrc(src), 1L)),
        s"doc $id keep")
    }
    // the filter must actually discriminate on this corpus (a
    // constant-true verdict would be vacuous)
    assert(got.values.exists(!_._6), "no outliers flagged at sf0.001")
  }
}
