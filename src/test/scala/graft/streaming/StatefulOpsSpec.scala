package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.{SparkSpec, Tables}

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._
  import StatefulOps._

  private val GapUs = 10 * 60 * 1000000L

  private def eventsDs = Tables.events(spark, sf0001)
    .select("event_id", "ts", "user_id", "event_type", "value")
    .as[EventRow]

  test("batch sessionization matches the session_window aggregation") {
    val custom = sessionizeBatch(eventsDs, GapUs)
      .toDF().orderBy("user_id", "session_start")
      .collect().toSeq
    val builtin = EventsStream.sessionAgg(
      Tables.events(spark, sf0001))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")
      .collect().toSeq
    assert(custom.nonEmpty)
    assert(custom == builtin,
      s"custom=${custom.size} builtin=${builtin.size}")
  }

  test("streaming sessionization emits the batch sessions (closed + " +
      "timeout flush)") {
    val staged = java.nio.file.Files
      .createTempDirectory("events_sessions").toString
    Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(staged)
    val src = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(
        EventsStream.schema.filter(f => f.name != "props")))
      .parquet(staged)
      .as[EventRow]
    // NoTimeout in-test: the processing-time flush of open sessions
    // waits wall-clock gap time and keeps scheduling timeout-check
    // batches, which processAllAvailable never sees as quiescent
    val q = sessionizeStream(src, GapUs,
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      q.processAllAvailable()
      // all data arrives in one micro-batch: every session except each
      // user's trailing open one is emitted immediately; the open ones
      // flush only after the (real-time) processing timeout, so the
      // test compares the closed set
      val streamed = spark.table("sessions_out")
        .orderBy("user_id", "session_start").collect().toSeq
      val batchClosed = {
        import org.apache.spark.sql.expressions.Window
        sessionizeBatch(eventsDs, GapUs).toDF()
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("user_id"))
              .orderBy(desc("session_start"))))
          .filter(col("rn") =!= 1).drop("rn")
          .orderBy("user_id", "session_start").collect().toSeq
      }
      assert(streamed.nonEmpty)
      assert(streamed == batchClosed,
        s"streamed=${streamed.size} batchClosed=${batchClosed.size}")
    } finally q.stop()
  }

  test("streaming funnel converges to the batch funnel under " +
      "ts-ordered micro-batches") {
    // Spark 4.1 moved MemoryStream under execution.streaming.runtime
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val rows = eventsDs.collect().sortBy(e => toMicros(e.ts)).toSeq
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val src = MemoryStream[EventRow]
    // NoTimeout in-test: exact convergence needs every user's state
    // held to the end — with TTL eviction a completed-then-reactive
    // user folds from empty and emits a fresh partial row, the
    // documented TTL trade the state-bound test below exercises
    val q = funnelStream(src.toDS(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_out")
      .start()
    try {
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
      // state fields only transition unset→value under ordered
      // arrival, so the final state per user is the max over updates
      val streamed = spark.table("funnel_out")
        .groupBy("user_id")
        .agg(max(col("t_view")).as("t_view"),
          max(col("t_click")).as("t_click"),
          max(col("t_purchase")).as("t_purchase"))
        .orderBy("user_id").collect().toSeq
      val batch = funnelBatch(eventsDs).toDF()
        .orderBy("user_id").collect().toSeq
      assert(streamed.nonEmpty)
      assert(streamed == batch,
        s"streamed=${streamed.size} batch=${batch.size}")
    } finally q.stop()
  }

  test("streaming latest-state upsert converges to the batch argmax " +
      "regardless of micro-batch boundaries (fold is order-safe)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    // deliberately UNSORTED batches (split by event_id parity): the
    // (ts, event_id) fold must not depend on arrival order — this is
    // the associativity claim the funnel (ordered-arrival contract)
    // cannot make
    val rows = eventsDs.collect().toSeq
    val (b1, b2) = rows.partition(_.event_id % 2 == 0)
    val src = MemoryStream[EventRow]
    val q = latestStream(src.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("latest_out")
      .start()
    try {
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
      // each user's LAST update (by ts, event_id — the emitted state
      // is monotone in that order) is the user's final state
      val streamed = spark.table("latest_out")
        .groupBy("user_id")
        .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
          col("value"))).as("s"))
        .select(col("user_id"), col("s.ts"), col("s.event_id"),
          col("s.event_type"), col("s.value"))
        .orderBy("user_id").collect().toSeq
      val batch = graft.queries.Streaming
        .stUpsertState(spark, sf0001).collect().toSeq
      assert(streamed.nonEmpty)
      assert(streamed == batch,
        s"streamed=${streamed.size} batch=${batch.size}")
    } finally q.stop()
  }

  test("checkpoint recovery: a stopped funnel query RESUMES from its " +
      "state store — the restarted query reads ONLY the new files " +
      "(source offsets recovered) yet converges to the single-run " +
      "result over all events (state recovered)") {
    import java.util.concurrent.ConcurrentLinkedQueue
    import org.apache.spark.sql.DataFrame
    val rows = eventsDs.collect().sortBy(e => toMicros(e.ts)).toSeq
    val (b1, b2) = rows.splitAt(rows.length / 2)
    // users with events in BOTH halves — without them run 2 could
    // succeed statelessly and the test would prove nothing
    val straddlers = b1.map(_.user_id).toSet
      .intersect(b2.map(_.user_id).toSet)
    assert(straddlers.nonEmpty)
    val srcDir = java.nio.file.Files
      .createTempDirectory("funnel_recov_src").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("funnel_recov_ckpt").toString
    val outRows = new ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    def startQ() = {
      val src = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(
          EventsStream.schema.filter(_.name != "props")))
        .parquet(srcDir)
        .as[EventRow]
      funnelStream(src,
          org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
        .toDF()
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.collect().foreach(outRows.add); ()
        }
        .start()
    }
    b1.toDF().coalesce(1).write.mode("append").parquet(srcDir)
    val q1 = startQ()
    q1.processAllAvailable()
    val run1Input = q1.recentProgress.map(_.numInputRows).sum
    q1.stop()
    assert(run1Input == b1.size.toLong)
    b2.toDF().coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = startQ()
    try {
      q2.processAllAvailable()
      // offsets recovered: run 2 saw ONLY the second half
      val run2Input = q2.recentProgress.map(_.numInputRows).sum
      assert(run2Input == b2.size.toLong,
        s"restart reprocessed data: read $run2Input of ${b2.size}")
      // state recovered: max-over-updates across BOTH runs' emitted
      // rows equals the batch funnel over ALL events — for straddling
      // users run 2's rows are correct ONLY if b1's funnel state was
      // restored from the checkpoint
      import spark.implicits._
      val emitted = outRows.toArray(Array.empty[org.apache.spark.sql.Row])
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString),
          Option(r.get(2)).map(_.toString),
          Option(r.get(3)).map(_.toString)))
        .toSeq
        .toDF("user_id", "t_view", "t_click", "t_purchase")
        .groupBy("user_id")
        .agg(max(col("t_view")).as("t_view"),
          max(col("t_click")).as("t_click"),
          max(col("t_purchase")).as("t_purchase"))
        .orderBy("user_id").collect().toSeq
      val batch = funnelBatch(eventsDs).toDF()
        .select(col("user_id"), col("t_view").cast("string"),
          col("t_click").cast("string"), col("t_purchase").cast("string"))
        .orderBy("user_id").collect().toSeq
      assert(emitted.nonEmpty && emitted == batch,
        s"emitted=${emitted.size} batch=${batch.size}")
    } finally {
      q2.stop()
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(srcDir)); rm(new java.io.File(ckpt))
    }
  }

  test("streaming funnel state is BOUNDED by the idle TTL, and a " +
      "completed funnel never regresses on post-purchase activity") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    def ev(id: Long, tsS: String, uid: Long, typ: String) =
      EventRow(id, Timestamp.valueOf(tsS), uid, typ, 1.0)
    val src = MemoryStream[EventRow]
    // event-time TTL: 1h watermark delay, 1h idle
    val q = funnelStream(src.toDS(), idleUs = 3600L * 1000000L)
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_state_out")
      .start()
    try {
      // user 1 COMPLETES the funnel; users 2 and 3 stay partial —
      // all three hold state until their TTL (a completed state is a
      // foldFunnel fixpoint; holding it is what makes post-purchase
      // activity harmless)
      src.addData(
        ev(1, "2024-01-01 00:00:00", 1, "view"),
        ev(2, "2024-01-01 00:01:00", 1, "click"),
        ev(3, "2024-01-01 00:02:00", 1, "purchase"),
        ev(4, "2024-01-01 00:00:00", 2, "view"),
        ev(5, "2024-01-01 00:00:00", 3, "view"))
      q.processAllAvailable()
      val afterA = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(afterA == 3L, s"3 users must hold state, got $afterA")
      // post-purchase activity within the TTL horizon: the completed
      // user browses again — the re-emitted row must still be the
      // COMPLETED conversion (same stages), never a partial reset
      // that the downstream Update-mode upsert would regress to
      src.addData(ev(6, "2024-01-01 00:30:00", 1, "view"))
      q.processAllAvailable()
      val u1 = spark.table("funnel_state_out")
        .filter(col("user_id") === 1)
        .select("t_view", "t_click", "t_purchase")
        .collect()
      assert(u1.length >= 2, "the post-purchase batch re-emits user 1")
      assert(u1.forall(r => !r.isNullAt(2)),
        "every emitted user-1 row keeps the completed conversion — " +
        "a NULL purchase here means eager eviction regressed it")
      // jump event time far past every TTL; eviction applies the
      // watermark computed at the END of the previous batch, so one
      // more batch actually drops the rows (same two-step as the
      // dedup spec)
      src.addData(ev(7, "2024-01-01 12:00:00", 4, "view"))
      q.processAllAvailable()
      src.addData(ev(8, "2024-01-01 23:00:00", 5, "view"))
      q.processAllAvailable()
      val afterC = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      // users 1/2/3 (TTLs ≤ 01:30) are gone; user 4 (TTL 13:00) may
      // also expire in the trailing no-data batch once the watermark
      // reached 22:00 — either way state declined despite 2 new users
      assert(afterC <= 2L && afterC < afterA,
        s"idle funnels (completed AND partial) must be evicted — got " +
        s"$afterC state rows; unbounded state grows with lifetime users")
      // eviction never loses emitted rows
      assert(!spark.table("funnel_state_out")
        .filter(col("user_id") === 2 && col("t_view").isNotNull)
        .isEmpty, "partial row must have been emitted before eviction")
      assert(!spark.table("funnel_state_out")
        .filter(col("user_id") === 1 && col("t_purchase").isNotNull)
        .isEmpty, "completed funnel row must have been emitted")
    } finally q.stop()
  }

  test("funnel fold: strict ordering semantics on a constructed " +
      "sequence") {
    // click before any view never counts; click at the view's exact
    // ts never counts (strict >); purchase needs a prior click
    val evs = Seq(("click", 5L), ("view", 10L), ("click", 10L),
      ("click", 12L), ("purchase", 11L), ("purchase", 13L))
      .sortBy(_._2)
    val s = foldFunnel(evs, EmptyFunnel)
    assert(s.tView == 10L)
    assert(s.tClick == 12L, "only the click strictly after the view")
    assert(s.tPurchase == 13L,
      "only the purchase strictly after the first counted click")
  }

  test("foreachBatch streaming upsert converges to the batch merge") {
    val srcDir = java.nio.file.Files
      .createTempDirectory("upsert_src").toString
    val targetDir = java.nio.file.Files
      .createTempDirectory("upsert_tgt").toString + "/users"
    // staged user updates derived from events
    val staged = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type").as("last_event"),
        col("value").as("score"))
      .dropDuplicates("user_id")
    staged.write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream
      .schema(staged.schema).parquet(srcDir)
    val q = StatefulOps.streamingUpsert(stream, targetDir,
      Seq("user_id"), Seq("last_event", "score")).start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.read.parquet(targetDir)
      .orderBy("user_id").collect().toSeq
    val want = staged.orderBy("user_id").collect().toSeq
    assert(got.map(_.getLong(0)) == want.map(_.getLong(0)))
    assert(got.size == want.size && got.nonEmpty)
  }
}
