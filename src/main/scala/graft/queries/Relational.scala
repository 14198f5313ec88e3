package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import QueryUtil._

/** Third analytics batch: correlated-subquery patterns, nation-pair
  * volume (TPC-H Q7 shape), HAVING, and scalar date/string function
  * packs — the remaining relational surface a reference user would
  * expect from a general engine.
  */
object Relational {

  /** TPC-H Q2 pattern: rows matching a per-group minimum (correlated
    * scalar subquery), expressed as a window min — one shuffle, no
    * re-join of the subquery. */
  def qCorrelatedMin(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey"))
    Tables.supplier(s, d)
      .withColumn("min_bal", min(col("s_acctbal")).over(w))
      .filter(col("s_acctbal") === col("min_bal"))
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .orderBy("s_suppkey")
  }

  private val qCorrelatedMinSql =
    """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
      |FROM supplier s
      |WHERE s_acctbal = (SELECT min(s2.s_acctbal) FROM supplier s2
      |  WHERE s2.s_nationkey = s.s_nationkey)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q7 shape: shipping volume between supplier-nation and
    * customer-nation pairs per year. Nation (fixed 25 rows)
    * broadcasts by hint; supplier and customer scale with the corpus
    * (10k·SF / 150k·SF) so they carry no hint — AQE broadcasts while
    * they fit, shuffled hash join beyond the threshold (the q8/q18
    * treatment; a forced broadcast would OOM the driver at scale). */
  def qVolumeShipping(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey",
      "l_extendedprice", "l_discount", "l_shipdate")
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d)
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    li.join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, d)
          .select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(s, d)
          .select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
      .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .withColumn("l_year", year(col("l_shipdate")))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sumDec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("volume"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  private val qVolumeShippingSql =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  year(l_shipdate) AS l_year,
       |  ${sqlSumDec("l_extendedprice * (1.0 - l_discount)")} AS volume
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |WHERE n1.n_name <> n2.n_name
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** Aggregate filter (HAVING): big customers only. */
  def qHaving(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sumDec(col("o_totalprice")).as("spend"))
      .filter(col("n_orders") >= 15)
      .orderBy("o_custkey")

  private val qHavingSql =
    s"""SELECT o_custkey, count(*) AS n_orders,
       |  ${sqlSumDec("o_totalprice")} AS spend
       |FROM orders GROUP BY o_custkey
       |HAVING count(*) >= 15 ORDER BY o_custkey""".stripMargin

  /** Scalar date-function pack over order dates. */
  def qDateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("dom"),
      quarter(col("o_orderdate")).as("q"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      last_day(col("o_orderdate")).as("month_end"),
      datediff(lit("2002-01-01").cast("date"),
        col("o_orderdate").cast("date")).as("days_to_2002"),
      add_months(col("o_orderdate").cast("date"), 3).as("plus_quarter"))
      .orderBy("o_orderkey")

  private val qDateFuncsSql =
    """SELECT o_orderkey,
      |  year(o_orderdate) AS y, month(o_orderdate) AS m,
      |  CAST(day(o_orderdate) AS INT) AS dom,
      |  CAST(quarter(o_orderdate) AS INT) AS q,
      |  date_trunc('month', o_orderdate) AS month_start,
      |  CAST(last_day(o_orderdate) AS DATE) AS month_end,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE),
      |    DATE '2002-01-01') AS INT) AS days_to_2002,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
      |    AS plus_quarter
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Scalar string-function pack over part names. */
  def qStringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      upper(col("p_name")).as("up"),
      substring(col("p_name"), 2, 5).as("sub"),
      lpad(col("p_brand"), 12, "*").as("padded"),
      regexp_replace(col("p_type"), "[AEIOU]", "_").as("devoweled"),
      reverse(col("p_name")).as("rev"),
      length(col("p_name")).as("len"),
      concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
      split(col("p_name"), " ").getItem(0).as("first_word"))
      .orderBy("p_partkey")

  private val qStringFuncsSql =
    """SELECT p_partkey,
      |  upper(p_name) AS up,
      |  substring(p_name, 2, 5) AS sub,
      |  lpad(p_brand, 12, '*') AS padded,
      |  regexp_replace(p_type, '[AEIOU]', '_', 'g') AS devoweled,
      |  reverse(p_name) AS rev,
      |  CAST(length(p_name) AS INT) AS len,
      |  concat_ws('|', p_brand, p_type) AS joined,
      |  (string_split(p_name, ' '))[1] AS first_word
      |FROM part ORDER BY p_partkey""".stripMargin

  /** UNION-distinct vs UNION ALL semantics. */
  def qUnionDedup(s: SparkSession, d: String): DataFrame = {
    val a = Tables.customer(s, d).filter(col("c_custkey") % 2 === 0)
      .select(col("c_mktsegment").as("seg"))
    val b = Tables.customer(s, d).filter(col("c_custkey") % 3 === 0)
      .select(col("c_mktsegment").as("seg"))
    val dn = a.union(b).distinct()
      .agg(count(lit(1)).as("n_distinct_segments"))
    a.union(b)
      .groupBy("seg").agg(count(lit(1)).as("n_all"))
      .crossJoin(broadcast(dn))
      .orderBy("seg")
  }

  private val qUnionDedupSql =
    """WITH a AS (SELECT c_mktsegment AS seg FROM customer
      |    WHERE c_custkey % 2 = 0),
      |b AS (SELECT c_mktsegment AS seg FROM customer
      |    WHERE c_custkey % 3 = 0),
      |u AS (SELECT seg FROM a UNION ALL SELECT seg FROM b),
      |dn AS (SELECT count(*) AS n FROM
      |  (SELECT seg FROM a UNION SELECT seg FROM b))
      |SELECT seg, count(*) AS n_all,
      |  (SELECT n FROM dn) AS n_distinct_segments
      |FROM u GROUP BY seg ORDER BY seg""".stripMargin

  /** Bucket-co-located join — the storage-layout technique for
    * REPEATED large×large joins at corpus scale: both sides are
    * WRITTEN `bucketBy`+`sortBy` the join key (8 buckets here;
    * hundreds in production), so every later sort-merge join reads
    * bucket i directly against bucket i — ZERO exchange below the
    * join, i.e. zero network movement of either table. At 100 TB
    * that converts the dominant repeated shuffle (think
    * lineitem⋈orders run daily) into bucket-local work; the one-time
    * bucketed write is the amortized cost. (Spark ≥3 still inserts a
    * PARTITION-LOCAL sort below the join — bucket-local rows, no
    * network — unless the legacy sorted-scan flag vouches for
    * one-file-per-bucket order; the exchange elimination is the
    * scale property.) BucketedJoinSpec forces sort-merge and asserts
    * zero ShuffleExchange below the join; this catalog entry
    * hash-verifies the join's SEMANTICS against the plain-join
    * oracle (bucketing must never change results). The post-join
    * aggregation exchanges only the tiny priority frame. */
  def qBucketedJoin(s: SparkSession, d: String): DataFrame = {
    val r = bucketedJoinRun(s, Tables.orders(s, d), Tables.lineitem(s, d))
    // the result is priority-sized — checkpoint it, then reclaim the
    // bucketed tables + temp dir immediately (repeated catalog runs
    // must not accumulate bucket copies on disk)
    val out = r.df.orderBy("o_orderpriority").localCheckpoint()
    r.cleanup()
    out
  }

  /** One bucketed-join run: the live joined frame (plan inspectable —
    * BucketedJoinSpec asserts the zero-exchange property on it) plus
    * the action that drops its run-scoped tables and deletes its temp
    * dir once the frame has been consumed/materialized. */
  private[queries] final case class BucketRun(df: DataFrame,
      cleanup: () => Unit)

  // run token: pid (two sessions sharing a metastore/warehouse never
  // race on table names) + per-JVM counter (repeat invocations never
  // collide); dirs not reclaimed inline are deleted at JVM exit
  private val bkCounter = new java.util.concurrent.atomic.AtomicLong(0L)
  private val bkDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private def deleteRec(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRec)
    f.delete(): Unit
  }
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var d = bkDirs.poll()
      while (d != null) { deleteRec(new java.io.File(d)); d = bkDirs.poll() }
    }))
  }

  /** Core of [[qBucketedJoin]], spec-testable: writes both frames as
    * bucketed external tables under a fresh run-token-suffixed temp
    * dir (repartitioned to one file per bucket — the precondition for
    * sorted-scan reads on engines/flags that honor bucket-file
    * order), reads them back through the catalog, joins on the bucket
    * key, aggregates revenue per order priority. */
  def bucketedJoin(s: SparkSession, orders: DataFrame,
      lineitem: DataFrame): DataFrame =
    bucketedJoinRun(s, orders, lineitem).df

  private[queries] def bucketedJoinRun(s: SparkSession, orders: DataFrame,
      lineitem: DataFrame): BucketRun = {
    val token =
      s"${ProcessHandle.current().pid()}_${bkCounter.incrementAndGet()}"
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_buckets_$token").toString
    bkDirs.add(dir)
    val tOrd = s"graft_bk_orders_$token"
    val tLi = s"graft_bk_lineitem_$token"
    orders.select("o_orderkey", "o_orderpriority")
      .repartition(8, col("o_orderkey"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$dir/orders").mode("overwrite")
      .saveAsTable(tOrd)
    lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
      .repartition(8, col("l_orderkey"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$dir/lineitem").mode("overwrite")
      .saveAsTable(tLi)
    val df = s.table(tOrd)
      .join(s.table(tLi), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sumDec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
    BucketRun(df, () => {
      s.sql(s"DROP TABLE IF EXISTS $tOrd")
      s.sql(s"DROP TABLE IF EXISTS $tLi")
      bkDirs.remove(dir)
      deleteRec(new java.io.File(dir))
    })
  }

  private val qBucketedJoinSql =
    s"""SELECT o_orderpriority, count(*) AS n_items,
       |  ${sqlSumDec("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_bucketed_join" -> (qBucketedJoin _),
    "q_correlated_min" -> (qCorrelatedMin _),
    "q7_volume_shipping" -> (qVolumeShipping _),
    "q_having" -> (qHaving _),
    "q_date_funcs" -> (qDateFuncs _),
    "q_string_funcs" -> (qStringFuncs _),
    "q_union_dedup" -> (qUnionDedup _),
  )

  val oracle: Map[String, String] = Map(
    "q_bucketed_join" -> qBucketedJoinSql,
    "q_correlated_min" -> qCorrelatedMinSql,
    "q7_volume_shipping" -> qVolumeShippingSql,
    "q_having" -> qHavingSql,
    "q_date_funcs" -> qDateFuncsSql,
    "q_string_funcs" -> qStringFuncsSql,
    "q_union_dedup" -> qUnionDedupSql,
  )
}
