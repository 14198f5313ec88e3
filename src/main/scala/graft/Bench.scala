package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at the dir in
  * SPARK_GRAFT_SF_DIR and prints the result as JSON on stdout: first
  * a line with the COMPLETE per-query map, then a FINAL compact line
  * (same schema, largest entries only, hard ≤1400-byte bound) that is
  * guaranteed to fit the driver's ~2KB stdout tail-capture window
  * whatever the catalog size (BENCH_r14 was unparseable because the
  * single full line outgrew that window).
  *
  * The action is a `noop`-format write — unlike `count()`, it forces
  * full evaluation of every output column (no aggregate-pruning
  * shortcuts), so the numbers reflect real query cost.
  *
  * Noise robustness: every query runs `SPARK_GRAFT_REPS` times
  * (default 3) and the stdout line reports the per-query MIN — this
  * host's contention can inflate a 0.5s query to 190s on a single run
  * (see BASELINE.md), contention only ever inflates (never deflates),
  * and the min is the best available estimate of the plan's true cost.
  * The rep loop is OUTERMOST: rep r of every query runs before rep
  * r+1 of any query, so one multi-minute contention window cannot
  * cover all reps of the same query (back-to-back reps were exactly
  * how BENCH_r04 recorded 628s for a 76s catalog). Median and all raw
  * runs are emitted on stderr (`"runs"`, per-query GC in `"gc_sec"`),
  * so a contended run stays visible instead of being mistaken for a
  * plan regression.
  *
  * Optional env:
  *   SPARK_GRAFT_QUERIES  comma-separated subset to run (profiling)
  *   SPARK_GRAFT_REPS     repetitions per query (default 3, min)
  */
object Bench {

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).filter(_ > 0).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    // NOTE (r15, measured): AQE coalescing by target size
    // (parallelismFirst=false + 64m advisory) was A/B-tested here and
    // REVERTED — a 10-query subset ran 26.5 s untuned vs 28.8–30.7 s
    // tuned (min-of-3 each). Collapsing KB-sized shuffles to one
    // partition serializes post-shuffle stages that still profit from
    // local parallelism at bench SFs; the default keeps them wide.
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val subset = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => subset.forall(_.contains(n)) }
    // untimed warmup: JVM/codegen/scheduler spin-up otherwise lands on
    // whichever query happens to run first
    try SparkEntry.queries.get("q1_pricing_summary")
      .foreach(_(spark, sfDir).write.format("noop").mode("overwrite").save())
    catch { case _: Throwable => }
    // Rep loop OUTERMOST: one catalog-wide sweep per rep. A contention
    // window of any length shorter than a full sweep can inflate at
    // most one rep of each query, and the min-of-reps below discards it.
    val sweeps: Seq[Seq[(Double, Double)]] = (0 until reps).map { r =>
      val s0 = System.nanoTime()
      val sweep = selected.map { case (name, fn) =>
        val g0 = gcMillis()
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed (rep $r): ${e.getMessage}")
        }
        val sec = (System.nanoTime() - t0) / 1e9
        // wall-clock stamp per run: a contention window shows up as a
        // contiguous stretch of inflated stamps, attributable post hoc
        if (sec >= 1.0) System.err.println(
          f"[bench r$r] $name%-24s $sec%7.2fs @${System.currentTimeMillis() / 1000}")
        (sec, (gcMillis() - g0) / 1e3)
      }
      System.err.println(
        f"[bench] sweep $r done in ${(System.nanoTime() - s0) / 1e9}%.1fs")
      sweep
    }
    val results = selected.zipWithIndex.map { case ((name, _), i) =>
      val runs = sweeps.map(_(i))
      val times = runs.map(_._1)
      val best = times.min
      val med = times.sorted.apply(reps / 2)
      val gc = runs.map(_._2).sum
      System.err.println(f"[bench] $name%-24s min $best%7.2fs med $med%7.2fs  " +
        f"(runs ${times.map(t => f"$t%.2f").mkString("/")}, gc $gc%.1fs)")
      (name, best, times, gc)
    }
    // Locale.ROOT: a comma-decimal default locale would otherwise
    // render 58,9 and break the driver's JSON parse
    def jnum(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(d))
    // Compact number for the stdout line: the driver captures only the
    // LAST 2000 bytes of stdout, so the final JSON line must fit
    // entirely in that window or it is truncated mid-line and
    // unparseable (this is exactly what broke BENCH_r01..r03).
    // 2 decimals with trailing zeros trimmed keeps 83 queries around
    // 1.8 KB; full precision plus raw runs and GC time go to stderr.
    def cnum(d: Double): String = {
      val s = String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
      val t = s.reverse.dropWhile(_ == '0').reverse
      if (t.endsWith(".")) t + "0" else t
    }
    val runsJson = results.map { case (k, _, rs, _) =>
      "\"" + k + "\":[" + rs.map(jnum).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val gcJson = results.map { case (k, _, _, g) =>
      "\"" + k + "\":" + jnum(g)
    }.mkString("{", ",", "}")
    System.err.println(s"""{"detail":"raw_runs","runs":$runsJson,"gc_sec":$gcJson}""")
    val total = results.map(_._2).sum
    // sf as a bare number ("sf0.1" -> 0.1) to shave bytes off the line
    val sfNum = """sf([0-9]+(?:\.[0-9]+)?)$""".r.findFirstMatchIn(sfDir)
      .map(_.group(1)).getOrElse("\"" + sfDir + "\"")
    def mkLine(fmt: Double => String, minKeep: Double = 0.0): String = {
      val kept = results.filter(_._2 >= minKeep)
      val qs = kept
        .map { case (k, v, _, _) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      // "dropped" makes a key missing from "queries" distinguishable
      // from a query removed from the catalog: round-over-round
      // consumers see spurious removals otherwise when contention
      // pushes the line onto a higher-threshold fallback tier
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"dropped":${results.length - kept.length},"sf":$sfNum,"reps":$reps}"""
    }
    // Emission contract (round 15, measurement-channel fix): the
    // driver captures only the LAST ~2000 bytes of stdout and parses
    // the final JSON line. BENCH_r14 was "parsed": null because every
    // fallback tier above — including the unguarded last resort —
    // outgrew that window once the non-trivial query count hit 106.
    // Fix: (a) the COMPLETE per-query map rides its own earlier
    // stdout line (plus stderr, as before); (b) the FINAL line keeps
    // the same schema but fills "queries" with the LARGEST entries
    // that fit a hard byte budget, so it is complete-by-construction
    // regardless of catalog growth. Old behaviour (value = sum of
    // per-query minima, cnum formatting, "dropped" marker) unchanged.
    println(mkLine(cnum))
    def boundedLine(budget: Int): String = {
      val frame = s"""{"metric":"total","value":${cnum(total)},"unit":"sec","queries":{},"dropped":${results.length},"sf":$sfNum,"reps":$reps}"""
      var room = budget - frame.length
      val kept = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      for ((k, v, _, _) <- results.sortBy(-_._2)) {
        val entry = "\"" + k + "\":" + cnum(v)
        val cost = entry.length + (if (kept.nonEmpty) 1 else 0)
        if (cost <= room) { kept += ((k, v)); room -= cost }
      }
      val qs = kept.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + cnum(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${cnum(total)},"unit":"sec","queries":$qs,"dropped":${results.length - kept.length},"sf":$sfNum,"reps":$reps}"""
    }
    println(boundedLine(1400))
    spark.stop()
  }
}
