package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table shape
  * (SURVEY.md §2.10 — pure north-star extension; the reference is
  * batch-only).
  *
  * The transformations are defined once over an arbitrary events
  * DataFrame — batch or streaming — so the exact same logic backs
  * (a) the oracle-verified batch queries in queries/Streaming.scala
  * and (b) a `readStream` pipeline with watermarks. Batch/stream
  * parity is asserted in ScalaTest via a file-source stream + memory
  * sink.
  */
object EventsStream {

  /** events schema for readStream (ts as µs timestamp). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling 1-hour counts/sums per event type. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding 1-hour / 30-minute windows per event type. */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"))

  /** Session windows (10-minute inactivity gap) per user. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "10 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Streaming variant of [[tumblingAgg]] with a watermark — late data
    * beyond 30 minutes is dropped and state is bounded, which is what
    * lets this run indefinitely on an unbounded source. */
  def streamingTumbling(spark: SparkSession, sourceDir: String): DataFrame =
    tumblingAgg(
      spark.readStream.schema(schema).parquet(sourceDir)
        .withWatermark("ts", "30 minutes"))

  /** Streaming deduplication: first event wins per (user_id,
    * event_type). Projected to the key columns so batch and stream
    * agree deterministically (which *row* survives depends on arrival
    * order; the surviving key set does not). Batch form for the
    * oracle; [[streamingDedup]] is the watermarked stream form. */
  def dedupEvents(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")

  /** Streaming [[dedupEvents]] with BOUNDED state:
    * `dropDuplicatesWithinWatermark` expires a key's dedup state once
    * the watermark passes its first sighting plus the delay — the
    * pattern a streaming training-data ingest uses to drop replayed
    * records indefinitely. (Plain `dropDuplicates` on a key subset
    * without the event-time column never expires state; a key that
    * recurs later than the delay is re-emitted here, which is the
    * price of bounded state.) */
  def streamingDedup(spark: SparkSession, sourceDir: String): DataFrame =
    spark.readStream.schema(schema).parquet(sourceDir)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_type"), col("ts"))
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"))

  /** Stream-stream interval join (attribution): each purchase joined
    * to the same user's clicks from the preceding 30 minutes. Defined
    * over arbitrary frames (batch or streaming); the time-range
    * predicate is what bounds the join state in streaming mode. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame)
      : DataFrame =
    clicks.alias("c").join(purchases.alias("p"),
        col("c.user_id") === col("p.user_id") &&
        col("p.ts") >= col("c.ts") &&
        col("p.ts") < col("c.ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("c.user_id").as("user_id"),
        col("c.event_id").as("click_id"),
        col("p.event_id").as("purchase_id"),
        col("c.ts").as("click_ts"), col("p.ts").as("purchase_ts"))

  /** Attribution with misses kept: [[clickPurchaseJoin]] as a LEFT
    * OUTER interval join — every click emits, matched to same-user
    * purchases in its 30-minute window or to NULLs when none came.
    * The unmatched-click rate is the abandonment metric the inner
    * join cannot report. */
  def clickPurchaseLeftJoin(clicks: DataFrame, purchases: DataFrame)
      : DataFrame =
    clicks.alias("c").join(purchases.alias("p"),
        col("c.user_id") === col("p.user_id") &&
        col("p.ts") >= col("c.ts") &&
        col("p.ts") < col("c.ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .select(col("c.user_id").as("user_id"),
        col("c.event_id").as("click_id"),
        col("p.event_id").as("purchase_id"),
        col("c.ts").as("click_ts"), col("p.ts").as("purchase_ts"))

  /** Streaming [[clickPurchaseLeftJoin]]: watermarks on both sides
    * bound the join state exactly as in the inner form, and
    * additionally gate the NULL emissions — an unmatched click row
    * can only be emitted once the purchase-side watermark has passed
    * the end of its 30-minute window (before that a matching purchase
    * could still arrive). Consequence for bounded sources: clicks
    * whose window the final watermark never passes stay unemitted —
    * the spec advances the watermark with a sentinel event to flush
    * them (in production the stream simply keeps running). */
  def streamingClickPurchaseLeftJoin(spark: SparkSession,
      sourceDir: String): DataFrame = {
    val src = spark.readStream.schema(schema).parquet(sourceDir)
    clickPurchaseLeftJoin(
      src.filter(col("event_type") === "click")
        .withWatermark("ts", "1 hour"),
      src.filter(col("event_type") === "purchase")
        .withWatermark("ts", "1 hour"))
  }

  /** Attribution with BOTH miss directions kept: the FULL OUTER
    * interval join — every click emits (matched or with NULL
    * purchase columns, the abandonment signal), and every purchase
    * with no qualifying same-user click in the preceding 30 minutes
    * ALSO emits, click columns NULL — the organic/dark-traffic
    * purchase signal the left join drops. user_id coalesces across
    * sides so the key survives either-side NULLs. */
  def clickPurchaseFullJoin(clicks: DataFrame, purchases: DataFrame)
      : DataFrame =
    clicks.alias("c").join(purchases.alias("p"),
        col("c.user_id") === col("p.user_id") &&
        col("p.ts") >= col("c.ts") &&
        col("p.ts") < col("c.ts") + expr("INTERVAL 30 MINUTES"),
        "full_outer")
      .select(
        coalesce(col("c.user_id"), col("p.user_id")).as("user_id"),
        col("c.event_id").as("click_id"),
        col("p.event_id").as("purchase_id"),
        col("c.ts").as("click_ts"), col("p.ts").as("purchase_ts"))

  /** Streaming [[clickPurchaseFullJoin]]: watermarks on both sides
    * bound state AND gate both NULL directions — an unmatched click
    * emits once the purchase watermark passes the end of its
    * 30-minute window; an unmatched purchase emits once the CLICK
    * watermark passes its timestamp (a click at c.ts ≤ p.ts could
    * otherwise still arrive and claim it). On bounded sources each
    * side's tail therefore needs the OTHER side's watermark advanced
    * (the spec appends one far-future sentinel of each type; a
    * production stream simply keeps running). */
  def streamingClickPurchaseFullJoin(spark: SparkSession,
      sourceDir: String): DataFrame = {
    val src = spark.readStream.schema(schema).parquet(sourceDir)
    clickPurchaseFullJoin(
      src.filter(col("event_type") === "click")
        .withWatermark("ts", "1 hour"),
      src.filter(col("event_type") === "purchase")
        .withWatermark("ts", "1 hour"))
  }

  /** Stream-static enrichment join: each event decorated with its
    * user's dimension attributes (market segment from the customer
    * table). Defined over arbitrary frames — batch for the oracle
    * entry, streaming via [[streamingEnrich]].
    *
    * Streaming semantics: a stream-static equi-join is STATELESS —
    * no watermark, no join state; each micro-batch probes the static
    * side as of that batch's execution. No broadcast hint on
    * purpose: under the autoBroadcastJoinThreshold the optimizer
    * broadcasts the dim into every micro-batch (the common case —
    * a user dim is orders smaller than the event stream), and a
    * genuinely huge dim falls back to a per-batch shuffled join
    * rather than OOMing the driver. Inner join = enrich-or-drop;
    * callers wanting to keep unmatched events use a left join on
    * the same frames. */
  def enrichWithSegment(events: DataFrame, customers: DataFrame)
      : DataFrame =
    events.join(customers.select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment")), Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("segment"))

  /** Streaming [[enrichWithSegment]]: the events side is a file
    * stream; the customer frame stays a batch DataFrame joined into
    * every micro-batch. */
  def streamingEnrich(spark: SparkSession, sourceDir: String,
      customers: DataFrame): DataFrame =
    enrichWithSegment(
      spark.readStream.schema(schema).parquet(sourceDir), customers)

  /** Streaming [[clickPurchaseJoin]]: watermarks on BOTH sides plus
    * the interval condition let Spark expire join state — clicks
    * older than the purchase watermark minus 30 minutes can never
    * match again and are dropped. */
  def streamingClickPurchaseJoin(spark: SparkSession, sourceDir: String)
      : DataFrame = {
    val src = spark.readStream.schema(schema).parquet(sourceDir)
    clickPurchaseJoin(
      src.filter(col("event_type") === "click")
        .withWatermark("ts", "1 hour"),
      src.filter(col("event_type") === "purchase")
        .withWatermark("ts", "1 hour"))
  }
}
