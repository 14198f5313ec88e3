package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional layout and its data-skipping
  * payoff — the OTHER physical-layout lever next to bucketing
  * (`q_bucketed_join`): bucketing co-locates JOIN keys; z-ordering
  * co-locates RANGE boxes over several columns at once, so file-level
  * min/max statistics prune multi-predicate scans (the Delta/Iceberg
  * `OPTIMIZE ZORDER BY` idea, rooted in Morton 1966 and the UB-tree
  * line of work).
  *
  * The z-value is the bit-interleave of the two key columns —
  * expressed as a SUM of disjoint shifted bits (pure built-in
  * shift/mask arithmetic, whole-stage-codegen'd, engine-portable; no
  * UDF). At production scale the layout step is
  * `df.repartitionByRange(col("z"))` + write (sampled boundaries,
  * fully distributed, no global sort on one node); for the catalog
  * entry the bucket id is the FIXED-WIDTH value range `z >> shift` —
  * deterministic for the DuckDB oracle and identical in skipping
  * behavior (only balance differs, which the report measures rather
  * than assumes).
  *
  * The report: for each layout (z-order, custkey-sorted,
  * date-sorted) × each query box (customer-selective,
  * date-selective, both-selective), how many buckets exist, how many
  * a min/max-pruned scan must touch, and — the real cost — how many
  * ROWS live in the touched buckets vs how many actually match.
  * One aggregate pass per layout (bucket stats + per-box touch
  * flags), everything partial-combined; nothing corpus-sized
  * shuffles except the three bucket aggregations. */
object ZOrder {

  /** Bit-interleave: x in even positions, y in odd. Disjoint bits →
    * `+` is bitwise-or, and a plain sum keeps the expression portable
    * and codegen-friendly. */
  def zValue(x: Column, y: Column, bits: Int = 21): Column =
    (0 until bits).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)

  /** SQL mirror of [[zValue]]. */
  def zValueSql(x: String, y: String, bits: Int = 21): String =
    (0 until bits).map { b =>
      s"((($x >> $b) & 1) << ${2 * b}) + ((($y >> $b) & 1) << ${2 * b + 1})"
    }.mkString(" + ")

  /** The three query boxes: (name, custkey lo/hi, day lo/hi) —
    * half-open ranges; Long.MaxValue-free explicit bounds keep the
    * SQL mirror simple. */
  val Boxes: Seq[(String, Long, Long, Long, Long)] = Seq(
    ("cust_selective", 640L, 1280L, 0L, 1L << 20),
    ("date_selective", 0L, 1L << 20, 320L, 640L),
    ("both_selective", 640L, 2560L, 320L, 960L))

  // bucket widths are powers of two so both engines bucket with a
  // plain shift (no float division anywhere)
  private val ZShift = 16
  private val CustShift = 6   // width 64
  private val DayShift = 4    // width 16

  /** 9-row skipping report over orders(o_custkey, o_orderdate).
    *
    * Exactly ONE corpus aggregate per layout: the per-bucket pass
    * carries, for every box at once, the touch flag (max) AND the
    * per-bucket match count (sum), so bucket totals, touched buckets,
    * rows-scanned and rows-matching for all three boxes fold into a
    * single second-level aggregate whose one row fans out to the
    * three box rows via array+explode (a first version unioned 9
    * legs, each re-running the bucket aggregate plus a separate
    * matched count — ~18 scans of orders). `keyed` persists for the
    * report's build (3 layout scans of one cached projection) and
    * unpersists after the 9-row result is checkpointed. */
  def skippingReport(orders: DataFrame): DataFrame = {
    val keyed = orders.select(
      col("o_custkey").cast("long").as("ck"),
      datediff(col("o_orderdate"), to_date(lit("1995-01-01")))
        .cast("long").as("dy"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val layouts: Seq[(String, Column)] = Seq(
      ("zorder", shiftright(zValue(col("ck"), col("dy")), ZShift)),
      ("cust_sort", shiftright(col("ck"), CustShift)),
      ("date_sort", shiftright(col("dy"), DayShift)))
    val out = layouts.map { case (name, bucket) =>
      val matchCols = Boxes.map { case (bn, cl, ch, dl, dh) =>
        (col("ck") >= cl && col("ck") < ch &&
          col("dy") >= dl && col("dy") < dh).cast("long").as(s"m_$bn")
      }
      val perBucket = keyed
        .select(bucket.cast("long").as("bkt") +: matchCols: _*)
        .groupBy(col("bkt"))
        .agg(count(lit(1)).as("n"),
          Boxes.flatMap { case (bn, _, _, _, _) => Seq(
            max(col(s"m_$bn")).as(s"t_$bn"),
            sum(col(s"m_$bn")).as(s"mm_$bn")) }: _*)
      val aggCols = count(lit(1)).as("n_buckets") +:
        Boxes.flatMap { case (bn, _, _, _, _) => Seq(
          sum(col(s"t_$bn")).as(s"nt_$bn"),
          sum(when(col(s"t_$bn") === 1, col("n")).otherwise(0L))
            .as(s"rs_$bn"),
          sum(col(s"mm_$bn")).as(s"rm_$bn")) }
      perBucket.agg(aggCols.head, aggCols.tail: _*)
        .select(explode(array(Boxes.map { case (bn, _, _, _, _) =>
          struct(lit(name).as("layout"), lit(bn).as("box"),
            col("n_buckets"), col(s"nt_$bn").as("n_touched"),
            col(s"rs_$bn").as("rows_scanned"),
            col(s"rm_$bn").as("rows_matching"))
        }: _*)).as("r"))
        .select(col("r.*"))
    }.reduce(_ unionByName _)
      .orderBy("layout", "box")
      .localCheckpoint()
    keyed.unpersist()
    out
  }

  /** Scalar z-tile id for the HIGH coordinate pair (ck >> tileBits,
    * dy >> tileBits): because [[zValue]] is a carry-free sum of
    * disjoint interleaved bits, `zValue(x, y) >> (2·tileBits)` equals
    * the interleave of the high coordinates — so the bucket a row
    * lands in is computable from the TILE alone. */
  def zTileId(xh: Long, yh: Long): Long =
    (0 until 13).map(b =>
      (((xh >> b) & 1L) << (2 * b)) | (((yh >> b) & 1L) << (2 * b + 1)))
      .sum

  /** Z-range decomposition of a query box: the bucket ids whose
    * 2^tileBits-square (ck, dy) tile intersects [cl, ch) × [dl, dh) —
    * computed from the BOX alone (data-independent), which is what a
    * skipping reader pushes as a PARTITION filter. Exact: a bucket
    * fixes (ck >> tileBits, dy >> tileBits), so enumerating the
    * high-coordinate ranges covers precisely the buckets any in-box
    * row can occupy. */
  def zBucketsForBox(cl: Long, ch: Long, dl: Long, dh: Long,
      tileBits: Int = 8): Seq[Long] =
    for (xh <- (cl >> tileBits) to ((ch - 1) >> tileBits);
         yh <- (dl >> tileBits) to ((dh - 1) >> tileBits))
      yield zTileId(xh, yh)

  /** Materialize orders under the z-order LAYOUT proper: one
    * parquet dataset partitioned by the z-bucket directory key, so
    * box queries are served by ENGINE partition pruning — the real
    * skipping path, not the simulated report. The frame is
    * repartitioned ON the bucket before the write so each directory
    * is written by one task (a partitionBy straight off the scan
    * multiplies files by writer-task count and the dynamic-partition
    * writers dominate wall time — measured 9.1s vs ~2s at sf0.1);
    * production would additionally range-order by z WITHIN partitions
    * for row-group-level min/max locality. `tileBits` sizes the
    * directory tiles: the layout wants partitions near the target
    * file size, which is a COARSER grain than the report's in-file
    * statistics buckets. */
  def writeZOrdered(orders: DataFrame, dir: String,
      tileBits: Int = 8): Unit =
    orders.select(col("o_orderkey"),
        col("o_custkey").cast("long").as("ck"),
        datediff(col("o_orderdate"), to_date(lit("1995-01-01")))
          .cast("long").as("dy"))
      .withColumn("zbkt",
        shiftright(zValue(col("ck"), col("dy")), 2 * tileBits))
      .repartition(col("zbkt"))
      .write.mode("overwrite").partitionBy("zbkt").parquet(dir)

  /** Box query over a [[writeZOrdered]] layout (same `tileBits`): the
    * partition filter is the data-independent [[zBucketsForBox]] id
    * set (pruned at PLANNING time — ZOrderSpec asserts the scan's
    * numFiles metric), the box predicate stays as the in-partition
    * residual. Returns the matching (o_orderkey, ck, dy) rows. */
  def scanBox(spark: org.apache.spark.sql.SparkSession, dir: String,
      cl: Long, ch: Long, dl: Long, dh: Long,
      tileBits: Int = 8): DataFrame =
    spark.read.parquet(dir)
      .filter(col("zbkt").isin(
        zBucketsForBox(cl, ch, dl, dh, tileBits): _*))
      .filter(col("ck") >= cl && col("ck") < ch &&
        col("dy") >= dl && col("dy") < dh)
      .select(col("o_orderkey"), col("ck"), col("dy"))

  /** Directory-tile grain for the materialized catalog layout:
    * 1024×1024 tiles → ~70 partitions at sf0.1 (file-sized), vs the
    * report's 256-wide in-file statistics buckets. */
  val LayoutTileBits = 10

  /** Catalog entry: write the z-ordered layout to a run-scoped temp
    * dir, run the both_selective box through the PRUNED scan, then
    * reclaim the layout (the [[graft.queries.Relational]] bucketed-
    * join treatment — repeated runs must not accumulate layouts). */
  def zorderScan(spark: org.apache.spark.sql.SparkSession,
      orders: DataFrame): DataFrame = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_zorder").toString
    writeZOrdered(orders, dir, LayoutTileBits)
    val (_, cl, ch, dl, dh) = Boxes.find(_._1 == "both_selective").get
    val out = scanBox(spark, dir, cl, ch, dl, dh, LayoutTileBits)
      .orderBy("o_orderkey")
      .localCheckpoint()
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(dir))
    out
  }

  /** DuckDB oracle for [[zorderScan]]: the plain box filter — the
    * layout must never change results. */
  def zorderScanSql: String = {
    val (_, cl, ch, dl, dh) = Boxes.find(_._1 == "both_selective").get
    s"""WITH keyed AS (SELECT o_orderkey,
       |    CAST(o_custkey AS BIGINT) AS ck,
       |    CAST(datediff('day', DATE '1995-01-01',
       |      CAST(o_orderdate AS DATE)) AS BIGINT) AS dy
       |  FROM orders)
       |SELECT o_orderkey, ck, dy FROM keyed
       |WHERE ck >= $cl AND ck < $ch AND dy >= $dl AND dy < $dh
       |ORDER BY o_orderkey""".stripMargin
  }

  /** DuckDB oracle for [[skippingReport]]. */
  def skippingReportSql: String = {
    val z = zValueSql("ck", "dy")
    val layouts = Seq(
      "zorder" -> s"(($z) >> $ZShift)",
      "cust_sort" -> s"(ck >> $CustShift)",
      "date_sort" -> s"(dy >> $DayShift)")
    val legs = layouts.flatMap { case (name, bucket) =>
      Boxes.map { case (bn, cl, ch, dl, dh) =>
        val m = s"(ck >= $cl AND ck < $ch AND dy >= $dl AND dy < $dh)"
        s"""SELECT '$name' AS layout, '$bn' AS box,
           |  count(*) AS n_buckets,
           |  CAST(sum(t) AS BIGINT) AS n_touched,
           |  CAST(sum(CASE WHEN t = 1 THEN n ELSE 0 END) AS BIGINT)
           |    AS rows_scanned,
           |  (SELECT count(*) FROM keyed WHERE $m) AS rows_matching
           |FROM (SELECT $bucket AS bkt, count(*) AS n,
           |    max(CASE WHEN $m THEN 1 ELSE 0 END) AS t
           |  FROM keyed GROUP BY 1)""".stripMargin
      }
    }.mkString("\nUNION ALL\n")
    s"""WITH keyed AS MATERIALIZED (SELECT
       |    CAST(o_custkey AS BIGINT) AS ck,
       |    CAST(datediff('day', DATE '1995-01-01',
       |      CAST(o_orderdate AS DATE)) AS BIGINT) AS dy
       |  FROM orders)
       |SELECT * FROM (
       |$legs)
       |ORDER BY layout, box""".stripMargin
  }
}
