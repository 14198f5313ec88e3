package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated testdata tables (TESTDATA.md /
  * FIXTURES.md §B). Plain parquet reads with driver-written schemas:
  * Catalyst prunes columns and pushes filters into the scan, so no
  * explicit projection is needed here. At cluster scale these reads
  * split by `spark.sql.files.maxPartitionBytes`, so a 100 TB table
  * simply fans out to more input partitions.
  */
object Tables {
  // Per-path SCHEMA memo (r16): a bare `read.parquet(path)` launches
  // a footer-inference job every call, and the bench constructs each
  // entry's tables fresh per rep — one-to-three 1-task driver jobs
  // per entry that carry zero information after the first read (the
  // testdata is immutable for the process lifetime). Supplying the
  // once-inferred schema skips exactly that job; scan behavior
  // (pruning, pushdown, values) is unchanged — this is the metadata a
  // metastore would hold. Keyed by full path, so mixed-SF sessions
  // (the test suites) never cross.
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()
  private def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val sc = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(sc).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  /** `events.ts` has shipped as two parquet encodings across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects — read as a long via the legacy conf and truncate ns→µs,
    * lossless since the generator emits µs-grain values) and plain
    * TIMESTAMP(MICROS) without UTC adjustment (reads as
    * TIMESTAMP_NTZ). Dispatch on the INFERRED type so either
    * generation yields the same microsecond TimestampType column the
    * downstream windows/watermarks and the DuckDB oracle see —
    * matching on the file's type, not a generation flag, keeps this
    * robust to the next regeneration. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // session tz is UTC everywhere (builder + driver), so the
        // NTZ→TZ cast is value-identity; casting keeps every consumer
        // on the same TimestampType they were built against
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case TimestampType => raw
      case other =>
        // fail LOUDLY on the next encoding drift: a silent passthrough
        // (or a mis-scaled long) would diverge from the DuckDB oracle
        // with no visible error — the exact failure mode this dispatch
        // exists to prevent
        sys.error(s"events.ts: unhandled parquet encoding $other — " +
          "extend Tables.events' type dispatch")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
