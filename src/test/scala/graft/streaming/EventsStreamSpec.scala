package graft.streaming

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class EventsStreamSpec extends SparkSpec {

  test("streaming tumbling agg equals batch tumbling agg (file source " +
      "→ memory sink)") {
    // stage sf0.001 events as µs-timestamp parquet for the stream source
    val staged = java.nio.file.Files
      .createTempDirectory("events_stream").toString
    Tables.events(spark, sf0001).write.mode("overwrite").parquet(staged)

    val q = EventsStream.streamingTumbling(spark, staged)
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_out")
        .orderBy("window_start", "event_type")
        .collect().toSeq
      val batch = EventsStream.tumblingAgg(Tables.events(spark, sf0001))
        .orderBy("window_start", "event_type")
        .collect().toSeq
      assert(streamed == batch,
        s"stream/batch divergence: ${streamed.size} vs ${batch.size} rows")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("streaming interval join equals batch interval join") {
    val staged = java.nio.file.Files
      .createTempDirectory("events_join_stream").toString
    Tables.events(spark, sf0001).write.mode("overwrite").parquet(staged)
    val q = EventsStream.streamingClickPurchaseJoin(spark, staged)
      .writeStream.outputMode("append")
      .format("memory").queryName("join_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("join_out")
        .orderBy("click_id", "purchase_id").collect().toSeq
      val ev = Tables.events(spark, sf0001)
      val batch = EventsStream.clickPurchaseJoin(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"))
        .orderBy("click_id", "purchase_id").collect().toSeq
      assert(streamed == batch,
        s"stream/batch divergence: ${streamed.size} vs ${batch.size} rows")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("streaming LEFT OUTER interval join equals the batch left join " +
      "once a sentinel advances the watermark past every click window") {
    import spark.implicits._
    val staged = java.nio.file.Files
      .createTempDirectory("events_leftjoin_stream").toString
    val ev = Tables.events(spark, sf0001)
    ev.write.mode("overwrite").parquet(staged)
    // NULL-side rows only emit once the purchase watermark passes the
    // click's 30-minute window; on a bounded source the tail would
    // stay in state forever, so append one far-future click to push
    // the watermark past all real windows (excluded from the compare)
    val maxTs = ev.agg(max("ts")).head().getTimestamp(0)
    val sentinelTs = new java.sql.Timestamp(
      maxTs.getTime + 3L * 3600 * 1000)
    Seq((-999L, sentinelTs, -999L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(staged)
    val q = EventsStream.streamingClickPurchaseLeftJoin(spark, staged)
      .writeStream.outputMode("append")
      .format("memory").queryName("leftjoin_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("leftjoin_out")
        .filter(col("click_id") =!= -999L)
        .orderBy("click_id", "purchase_id").collect().toSeq
      val batch = EventsStream.clickPurchaseLeftJoin(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"))
        .orderBy("click_id", "purchase_id").collect().toSeq
      assert(streamed == batch,
        s"stream/batch divergence: ${streamed.size} vs ${batch.size} rows")
      assert(batch.exists(_.isNullAt(2)),
        "corpus must contain unmatched clicks for the outer side to matter")
    } finally q.stop()
  }

  test("streaming FULL OUTER interval join equals the batch full join " +
      "once sentinels of BOTH types advance both watermarks") {
    import spark.implicits._
    val staged = java.nio.file.Files
      .createTempDirectory("events_fulljoin_stream").toString
    val ev = Tables.events(spark, sf0001)
    ev.write.mode("overwrite").parquet(staged)
    // each NULL direction is gated on the OPPOSITE side's watermark:
    // unmatched clicks need the purchase watermark past their window,
    // unmatched purchases need the click watermark past their ts —
    // so the flush needs one far-future sentinel of EACH type
    val maxTs = ev.agg(max("ts")).head().getTimestamp(0)
    val sentinelTs = new java.sql.Timestamp(
      maxTs.getTime + 3L * 3600 * 1000)
    Seq((-999L, sentinelTs, -999L, "click", 0.0, "{}"),
        (-998L, sentinelTs, -998L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(staged)
    val q = EventsStream.streamingClickPurchaseFullJoin(spark, staged)
      .writeStream.outputMode("append")
      .format("memory").queryName("fulljoin_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("fulljoin_out")
        .filter(coalesce($"click_id", lit(0L)) =!= -999L &&
          coalesce($"purchase_id", lit(0L)) =!= -998L)
        .orderBy("click_id", "purchase_id", "user_id")
        .collect().toSeq
      val batch = EventsStream.clickPurchaseFullJoin(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"))
        .orderBy("click_id", "purchase_id", "user_id")
        .collect().toSeq
      assert(streamed == batch,
        s"stream/batch divergence: ${streamed.size} vs ${batch.size} rows")
      assert(batch.exists(_.isNullAt(2)),
        "corpus must contain unmatched clicks")
      assert(batch.exists(_.isNullAt(1)),
        "corpus must contain unmatched purchases for the full join " +
          "to differ from the left join")
    } finally q.stop()
  }

  test("outer-join tail state DRAINS once sentinels advance the " +
      "watermarks: numRowsTotal drops to the sentinel rows alone") {
    // The production-drain story, proven rather than narrated: on a
    // bounded source the unmatched tail sits in join state waiting
    // for a watermark that never comes; one far-future event per
    // side advances both watermarks past every REAL row and the
    // state store evicts them all. Exact zero is impossible on a
    // terminating source — the newest rows (here: the sentinels
    // themselves) always sit above their own watermark — so the
    // assertion is equality with the sentinel count, which is the
    // strongest drain statement a bounded run can make (a production
    // stream keeps running and holds only the most recent interval).
    import spark.implicits._
    val staged = java.nio.file.Files
      .createTempDirectory("events_drain_stream").toString
    val ev = Tables.events(spark, sf0001)
    ev.write.mode("overwrite").parquet(staged)
    val q = EventsStream.streamingClickPurchaseFullJoin(spark, staged)
      .writeStream.outputMode("append")
      .format("memory").queryName("drain_out").start()
    try {
      q.processAllAvailable()
      val before = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      // the multi-batch file source advances the watermark as it
      // goes, so mid-corpus state was already evicted incrementally
      // (bounded state, proven elsewhere); what MUST remain stuck is
      // the tail — real rows above the final watermark, which no
      // further input will ever release
      assert(before > 2, s"no stuck tail to drain (state $before)")
      val maxTs = ev.agg(max("ts")).head().getTimestamp(0)
      val sentinelTs = new java.sql.Timestamp(
        maxTs.getTime + 3L * 3600 * 1000)
      Seq((-999L, sentinelTs, -999L, "click", 0.0, "{}"),
          (-998L, sentinelTs, -998L, "purchase", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(staged)
      q.processAllAvailable()
      val after = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(after == 2,
        s"state after sentinel flush is $after rows, expected exactly " +
          "the 2 sentinels — the real tail did not drain")
    } finally q.stop()
  }

  test("stream-static enrichment join equals the batch join (stateless " +
      "— no watermark required)") {
    val staged = java.nio.file.Files
      .createTempDirectory("events_enrich_stream").toString
    Tables.events(spark, sf0001).write.mode("overwrite").parquet(staged)
    val cust = Tables.customer(spark, sf0001)
    val q = EventsStream.streamingEnrich(spark, staged, cust)
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("enrich_out")
        .orderBy("event_id").collect().toSeq
      val batch = EventsStream.enrichWithSegment(
          Tables.events(spark, sf0001), cust)
        .orderBy("event_id").collect().toSeq
      assert(streamed == batch,
        s"stream/batch divergence: ${streamed.size} vs ${batch.size} rows")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup (bounded state) equals batch distinct when " +
      "recurrences fall inside the watermark delay") {
    import spark.implicits._
    val staged = java.nio.file.Files
      .createTempDirectory("events_dedup_stream").toString
    // every key recurs within minutes — well inside the 1h state
    // window, so dropDuplicatesWithinWatermark ≡ DISTINCT here
    Seq(
      (1L, "2024-01-01 00:00:00", 7L, "view", 1.0, "{}"),
      (2L, "2024-01-01 00:02:00", 7L, "view", 1.0, "{}"),   // dup
      (3L, "2024-01-01 00:03:00", 7L, "click", 1.0, "{}"),
      (4L, "2024-01-01 00:10:00", 8L, "view", 1.0, "{}"),
      (5L, "2024-01-01 00:12:00", 7L, "view", 1.0, "{}"),   // dup again
      (6L, "2024-01-01 00:20:00", 8L, "view", 1.0, "{}"))   // dup
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(staged)

    val q = EventsStream.streamingDedup(spark, staged)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("dedup_out")
        .as[(Long, String)].collect().toSeq.sorted
      val batch = EventsStream.dedupEvents(
          spark.read.schema(EventsStream.schema).parquet(staged))
        .as[(Long, String)].collect().toSeq.sorted
      assert(streamed == batch,
        s"stream/batch divergence: $streamed vs $batch")
      assert(batch == Seq((7L, "click"), (7L, "view"), (8L, "view")))
    } finally q.stop()
  }

  test("late-data accounting: a row behind the watermark is DROPPED, " +
      "shows up in numRowsDroppedByWatermark, and never mutates a " +
      "finalized window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    import spark.implicits._
    import StatefulOps.EventRow
    def ev(id: Long, ts: String, uid: Long) = EventRow(id,
      java.sql.Timestamp.valueOf(ts), uid, "view", 1.0)
    val src = MemoryStream[EventRow]
    val agg = src.toDS().toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    try {
      // batch 1: two rows in hour 0 + one at 03:00 that advances the
      // watermark to 02:50 — hour 0 finalizes (and emits) next batch
      src.addData(ev(1, "2024-01-01 00:10:00", 1),
        ev(2, "2024-01-01 00:20:00", 2),
        ev(3, "2024-01-01 03:00:00", 3))
      q.processAllAvailable()
      // batch 2: a LATE row inside the already-closed hour 0 — the
      // watermark contract says drop it, count it, change nothing
      src.addData(ev(4, "2024-01-01 00:30:00", 4))
      q.processAllAvailable()
      val dropped = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 1L,
        s"late row not accounted: droppedByWatermark=$dropped")
      val rows = spark.table("late_out")
        .as[(java.sql.Timestamp, Long)].collect()
      assert(rows.nonEmpty, "hour-0 window never finalized")
      // the finalized hour-0 window holds exactly the two on-time rows
      val hour0 = rows.minBy(_._1.getTime)
      assert(hour0._2 == 2L,
        s"finalized window mutated by late data: $hour0")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark state is BOUNDED: dedup keys " +
      "are evicted once the watermark passes their expiry") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("events_dedup_state").toString
    def write(rows: Seq[(Long, String, Long, String)]): Unit =
      rows.toDF("event_id", "ts_s", "user_id", "event_type")
        .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
        .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
        .select("event_id", "ts", "user_id", "event_type", "value",
          "props")
        .coalesce(1).write.mode("append").parquet(dir)
    write(Seq((1L, "2024-01-01 00:00:00", 7L, "view"),
      (2L, "2024-01-01 00:05:00", 7L, "click"),
      (3L, "2024-01-01 00:10:00", 8L, "view")))
    val q = EventsStream.streamingDedup(spark, dir)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_state_out").start()
    try {
      q.processAllAvailable()
      val afterA = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(afterA == 3L, s"3 distinct keys must hold state, got $afterA")
      // jump event time 10h: the watermark (max ts − 1h) moves far
      // past the first batch's expiries (first sighting + 1h delay)
      write(Seq((4L, "2024-01-01 10:00:00", 9L, "view")))
      q.processAllAvailable()
      // eviction applies the watermark computed at the END of the
      // previous batch, so one more batch actually drops the rows
      write(Seq((5L, "2024-01-01 20:00:00", 10L, "view")))
      q.processAllAvailable()
      val afterC = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(afterC < afterA,
        s"expired dedup keys must leave state ($afterC vs $afterA) — " +
        "unbounded state would OOM a long-running ingest")
      // the flip side of bounded state, also per contract: a key
      // replayed after its state expired is emitted again
      write(Seq((6L, "2024-01-01 20:30:00", 7L, "view")))
      q.processAllAvailable()
      val out = spark.table("dedup_state_out")
        .as[(Long, String)].collect().toSeq
      assert(out.count(_ == (7L, "view")) == 2,
        "a key recurring past the delay re-emits (bounded-state price)")
    } finally q.stop()
  }

  test("session windows merge events within the gap") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 7L, "view", 1.0, "{}"),
      (2L, "2024-01-01 00:05:00", 7L, "view", 1.0, "{}"),  // same session
      (3L, "2024-01-01 00:30:00", 7L, "view", 1.0, "{}"))  // new session
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val got = EventsStream.sessionAgg(ev)
      .select("user_id", "n_events").as[(Long, Long)].collect()
      .sortBy(_._2)
    assert(got.toSeq == Seq((7L, 1L), (7L, 2L)))
  }

  test("STREAMING session windows: watermarked append emits merged " +
      "sessions once closed, equal to the batch form") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // (event_id, ts, user) — two sessions for user 7 split across
    // micro-batches (the second event EXTENDS the open session
    // across a batch boundary: the merging-session state path), one
    // for user 8; a far-future sentinel advances the watermark so
    // every real session closes and appends
    val mem = MemoryStream[(Long, String, Long)](spark)
    val src = mem.toDF().toDF("event_id", "ts_s", "user_id")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withWatermark("ts", "1 minute")
    val q = EventsStream.sessionAgg(src)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      mem.addData((1L, "2024-01-01 00:00:00", 7L),
        (10L, "2024-01-01 00:01:00", 8L))
      q.processAllAvailable()
      mem.addData((2L, "2024-01-01 00:05:00", 7L),   // extends open
        (3L, "2024-01-01 00:30:00", 7L))             // new session
      q.processAllAvailable()
      mem.addData((99L, "2024-01-02 00:00:00", 99L)) // sentinel
      q.processAllAvailable()
      val got = spark.table("sess_out")
        .filter(col("user_id") =!= 99L)
        .select("user_id", "session_start", "session_end", "n_events")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3))).toSet
      // batch reference on the same rows
      val batch = EventsStream.sessionAgg(Seq(
          (1L, "2024-01-01 00:00:00", 7L),
          (2L, "2024-01-01 00:05:00", 7L),
          (3L, "2024-01-01 00:30:00", 7L),
          (10L, "2024-01-01 00:01:00", 8L))
        .toDF("event_id", "ts_s", "user_id")
        .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3))).toSet
      assert(got == batch, s"stream $got vs batch $batch")
      // the cross-batch extension really merged: user 7 has a
      // 2-event session, not two 1-event sessions
      assert(got.exists(r => r._1 == 7L && r._4 == 2L))
    } finally q.stop()
  }
}
