package graft.queries

import graft.SparkSpec

/** Equivalence checks between catalog queries and their demoted
  * reference formulations. */
class AnalyticsQuerySpec extends SparkSpec {

  test("histogram percentiles match the buffering percentile() form " +
      "(demoted to spec-only)") {
    val dist = AnalyticsExt.qPercentilesDist(spark, sf0001)
      .collect().map(_.toSeq)
    val buf = AnalyticsExt.percentilesBuffering(spark, sf0001)
      .collect().map(_.toSeq)
    assert(dist.toSeq == buf.toSeq)
  }

  test("q_bloom_join: no false negatives and exact membership counts") {
    import org.apache.spark.sql.functions._
    val b = AnalyticsExt.qBloomJoin(spark, sf0001).cache()
    // structural: the sketch can only over-approximate
    assert(b.filter(col("n_actual") > col("n_bloom_pass")).isEmpty)
    assert(b.filter(col("n_false_pos") =!=
      col("n_bloom_pass") - col("n_actual")).isEmpty)
    // n_actual per segment must equal the exact semi-join
    val exact = graft.Tables.customer(spark, sf0001)
      .join(graft.Tables.orders(spark, sf0001)
        .filter(col("o_totalprice") > 490000)
        .select(col("o_custkey")).distinct(),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("want"))
    val bad = b.join(exact, Seq("c_mktsegment"), "left")
      .filter(col("n_actual") =!= coalesce(col("want"), lit(0L)))
    assert(bad.isEmpty)
    b.unpersist()
  }

  test("catalog q_percentiles is the scale-safe histogram form") {
    // Guard against a buffering percentile() aggregate sneaking back
    // into the catalog: the optimized plan of the catalog entry must
    // contain no Percentile expression.
    val plan = AnalyticsExt.queries("q_percentiles")(spark, sf0001)
      .queryExecution.optimizedPlan
    val hasBuffering = plan.expressions.exists(
      _.find(_.getClass.getSimpleName == "Percentile").isDefined) ||
      plan.collect { case p =>
        p.expressions.exists(
          _.find(_.getClass.getSimpleName == "Percentile").isDefined)
      }.exists(identity)
    assert(!hasBuffering,
      "catalog q_percentiles must not buffer group values")
  }

  test("g_pagerank: rank mass is conserved (in pico-units, up to " +
      "integer-division truncation) and covers every graph node") {
    import org.apache.spark.sql.functions._
    val pr = AnalyticsExt.queries("g_pagerank")(spark, sf0001).cache()
    assert(pr.filter(col("pr_pico") <= 0).isEmpty)
    // node set = distinct customers + distinct suppliers in lineitem×orders
    val li = graft.Tables.lineitem(spark, sf0001)
      .join(graft.Tables.orders(spark, sf0001),
        col("l_orderkey") === col("o_orderkey"))
    val nNodes = li.select(col("o_custkey")).distinct().count() +
      li.select(col("l_suppkey")).distinct().count()
    assert(pr.count() == nNodes)
    // Σ ranks stays ~1.0 (10^12 pico): div-truncation only ever loses
    // mass, bounded by (nodes + edges) units per iteration
    val mass = pr.agg(sum(col("pr_pico"))).head().getLong(0)
    assert(mass <= 1000000000000L && mass > 990000000000L,
      s"rank mass out of range: $mass")
    pr.unpersist()
  }

  test("q_funnel: stage counts are monotonically non-increasing and " +
      "conversion is bounded") {
    val f = AnalyticsExt.queries("q_funnel")(spark, sf0001)
      .orderBy("stage").collect()
    assert(f.length == 3)
    val counts = f.map(_.getAs[Long]("n_users"))
    assert(counts(0) >= counts(1) && counts(1) >= counts(2),
      s"ordered funnel can only narrow: ${counts.mkString(",")}")
    f.foreach { r =>
      val conv = r.getAs[Double]("conv_from_top")
      assert(conv >= 0.0 && conv <= 1.0)
    }
    assert(f(0).getAs[Double]("conv_from_top") == 1.0)
  }

  test("q_retention_cohorts: offsets non-negative and offset-0 " +
      "actives cover every user exactly once") {
    import org.apache.spark.sql.functions._
    val r = AnalyticsExt.queries("q_retention_cohorts")(spark, sf0001)
      .cache()
    assert(r.filter(col("week_offset") < 0).isEmpty)
    // every user is active in their own cohort week, and in exactly
    // one cohort → Σ offset-0 n_active == distinct users
    val atZero = r.filter(col("week_offset") === 0)
      .agg(sum(col("n_active"))).head().getLong(0)
    val users = graft.Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    assert(atZero == users, s"offset-0 total $atZero != users $users")
    r.unpersist()
  }

  test("q_sessionize: hand-built gaps split exactly at 30 minutes, " +
      "sessions are contiguous, and one user_id shuffle serves the " +
      "whole query") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // user 1: events at 0s, 10s, 1800s-after-10s (exactly 30min gap →
    // SAME session), then 1800.000001s after that (→ new session).
    // user 2: one event.
    val base = 1700000000000000L // µs
    val ev = Seq(
      (1L, base, 1L, "view"),
      (2L, base + 10L * 1000000, 1L, "view"),
      (3L, base + 10L * 1000000 + 1800L * 1000000, 1L, "click"),
      (4L, base + 10L * 1000000 + 1800L * 1000000 + 1800000001L, 1L,
        "view"),
      (5L, base, 2L, "view"))
      .toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"))
    val dir = java.nio.file.Files.createTempDirectory("sess").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AnalyticsExt.queries("q_sessionize")(spark, dir)
      .select("user_id", "session_idx", "n_events", "duration_us")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 3L, 1810L * 1000000), // 30-min gap does NOT split
      (1L, 2L, 1L, 0L),              // 30min+1µs does
      (2L, 1L, 1L, 0L)), s"got $got")
    // plan: exactly one exchange — HashPartitioning(user_id) must
    // satisfy the (user_id, session_idx) aggregate's clustering
    val plan = AnalyticsExt.queries("q_sessionize")(spark, sf0001)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, plan:\n$plan")
  }

  test("sessionize agrees with Spark's native session_window " +
      "operator session-for-session on the real corpus (independent " +
      "second implementation of the same semantics)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val gapUs = 600000000L // the streaming family's 10-minute gap
    val ev = graft.Tables.events(spark, sf0001)
    val dp = AnalyticsExt.sessionize(ev, gapUs)
      .select(col("user_id"), col("session_start"),
        col("session_end"), col("n_events"))
    val native = graft.streaming.EventsStream.sessionAgg(ev)
    // native end = last event + gap (the window extent); the DP end
    // is the last event itself — shift to compare
    val nativeAligned = native.select(col("user_id"),
      col("session_start"),
      timestamp_micros(unix_micros(col("session_end")) - gapUs)
        .as("session_end"), col("n_events"))
    assert(dp.count() == native.count(),
      "session counts diverge between implementations")
    assert(dp.exceptAll(nativeAligned).isEmpty &&
      nativeAligned.exceptAll(dp).isEmpty,
      "per-session rows diverge between implementations")
    // both implementations share the same boundary convention: a
    // successor at EXACTLY the gap merges; one microsecond past it
    // splits — planted probes pin that agreement at the edge
    def plant(deltaUs: Long) = Seq(
      (1L, 1000000L, 7L, "view"),
      (2L, 1000000L + deltaUs, 7L, "view"))
      .toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"))
    assert(AnalyticsExt.sessionize(plant(gapUs), gapUs).count() == 1L)
    assert(graft.streaming.EventsStream.sessionAgg(plant(gapUs))
      .count() == 1L)
    assert(AnalyticsExt.sessionize(plant(gapUs + 1), gapUs)
      .count() == 2L)
    assert(graft.streaming.EventsStream.sessionAgg(plant(gapUs + 1))
      .count() == 2L)
  }

  test("TPC-H batch plan shapes: dims broadcast, top-k never global-" +
      "sorts, the returnflag filter reaches the scan") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def planStr(name: String): String = {
      val qe = Analytics.queries(name)(spark, sf0001).queryExecution
      qe.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
    }
    // q10: top-20 must be TakeOrderedAndProject (no global Sort of
    // the aggregate), customer + nation broadcast, and the R-flag
    // predicate pushed into the parquet scan
    val q10 = planStr("q10_returned_items")
    assert(q10.contains("TakeOrderedAndProject"), q10.take(3000))
    assert(q10.contains("BroadcastHashJoin"), q10.take(3000))
    assert(q10.contains("PushedFilters") &&
      q10.contains("EqualTo(l_returnflag,R)"), q10.take(3000))
    // q18: top-100 via TakeOrderedAndProject; the HAVING side is a
    // partial-aggregated shuffle, not a hint-broadcast
    val q18 = planStr("q18_large_orders")
    assert(q18.contains("TakeOrderedAndProject"), q18.take(3000))
    // q19: disjunction stays a residual post-join filter; the part
    // dim broadcasts
    val q19 = planStr("q19_disjunctive")
    assert(q19.contains("BroadcastHashJoin"), q19.take(3000))
    // q17: the brand restriction applies BEFORE the per-part average
    // (the aggregate's child contains the broadcast semi-restriction)
    val q17 = Analytics.q17SmallQty(spark, sf0001).collect()
    assert(q17.length == 1 && !q17(0).isNullAt(1))
  }
  test("q_interval_coverage: hand-built fixture — overlap merges, " +
      "touching merges, gaps split, singletons count full window") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val W = 300000000L // 5-min activity window in micros
    // user 1: events at t=0s and t=100s (overlap -> one island,
    //   coverage 100s + 300s); t=1000s (gap -> own island, 300s)
    // user 2: events at t=0s and t=300s (touching -> ONE island, 600s)
    // user 3: one event (one island, 300s)
    val rows = Seq(
      (1L, 0L), (1L, 100000000L), (1L, 1000000000L),
      (2L, 0L), (2L, 300000000L),
      (3L, 42L))
    val ev = rows.zipWithIndex.map { case ((u, us), i) =>
      (i.toLong, new java.sql.Timestamp(us / 1000L), u, "view", 0.0,
        "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivspec").toString
    // micro-parquet dir standing in for a testdata sf dir: the query
    // only reads events
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    try {
      val got = AnalyticsExt.qIntervalCoverage(spark, dir)
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(got == Seq(
        (1L, 3L, 2L, (100000000L + W) + W),
        (2L, 2L, 1L, 2 * W),
        (3L, 1L, 1L, W)), s"got $got")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }
  test("q15: every returned supplier holds exactly the max revenue " +
      "(ties kept, argmax not LIMIT 1)") {
    import org.apache.spark.sql.functions._
    val out = Analytics.q15TopSupplier(spark, sf0001).cache()
    assert(out.count() >= 1)
    assert(out.select(countDistinct(col("total_revenue")))
      .head().getLong(0) == 1L)
  }

  test("q13: custdist sums to the full customer population — the " +
      "LEFT join keeps zero-order customers in the k=0 bucket") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = Analytics.q13OrderCounts(spark, sf0001).cache()
    val nCust = graft.Tables.customer(spark, sf0001).count()
    assert(out.agg(sum($"custdist")).head().getLong(0) == nCust)
    // the inner-join variant would lose exactly the k=0 bucket
    val zeroBucket = out.filter($"c_count" === 0L)
      .select($"custdist").as[Long].collect().headOption.getOrElse(0L)
    val noOrder = graft.Tables.customer(spark, sf0001)
      .join(graft.Tables.orders(spark, sf0001)
          .filter($"o_orderpriority" =!= "1-URGENT"),
        $"c_custkey" === $"o_custkey", "left_anti").count()
    assert(zeroBucket == noOrder)
  }

  test("skylinePoints equals the quadratic dominance reference on a " +
      "fixture with coincident points and single-axis ties") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // (x minimize, y maximize). Deliberate hazards: (1,5) twice
    // (coincident points are mutually non-dominating and BOTH stay),
    // (1,3) (dominated on y at equal x), (2,5) (dominated on x at
    // equal y), (0,9) (dominates most), (3,1) (dominated), (0,2)
    // (equal-x tie with the dominator), plus an incomparable chain
    val pts = Seq((1L, 5L), (1L, 5L), (1L, 3L), (2L, 5L), (0L, 9L),
      (3L, 1L), (0L, 2L), (2L, 7L), (4L, 8L), (5L, 10L))
    val df = pts.toDF("x", "y")
    val got = AnalyticsExt.skylinePoints(df, "x", "y")
      .as[(Long, Long)].collect().toSet
    val distinct = pts.distinct
    val want = distinct.filter { case (x, y) =>
      !distinct.exists { case (x2, y2) =>
        x2 <= x && y2 >= y && (x2 < x || y2 > y) }
    }.toSet
    assert(got == want, s"got $got want $want")
    // the corpus entry: every returned order is undominated, and
    // every dropped order has a dominator (spot-check via count
    // against the quadratic reference on the small corpus)
    // compare dates as epoch micros — the parquet timestamp may
    // surface as TIMESTAMP_NTZ (LocalDateTime rows), and the integer
    // form sidesteps the accessor type entirely
    val out = AnalyticsExt.qSkyline(spark, sf0001)
    val orders = graft.Tables.orders(spark, sf0001)
      .select($"o_totalprice",
        unix_micros($"o_orderdate".cast("timestamp_ltz")).as("us"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    val sky = orders.distinct.filter { case (p, t) =>
      !orders.exists { case (p2, t2) =>
        p2 <= p && t2 >= t && (p2 < p || t2 > t) }
    }.toSet
    val gotPts = out.select($"o_totalprice",
        unix_micros($"o_orderdate".cast("timestamp_ltz")).as("us"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSet
    assert(gotPts == sky)
  }
}
