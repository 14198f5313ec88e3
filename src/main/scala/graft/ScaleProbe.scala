package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scale probe (not part of the driver contract): the
  * harness ships sf0.1 as its largest dataset, so the 100×-design
  * claims of the dedup/ANN family are substantiated by synthesizing a
  * larger corpus and timing the operators on it. Two depths:
  *
  *   - 10× (default, sf1-equivalent: 50k docs / 20k vectors / 1M
  *     events) — the full dedup/ANN/funnel family.
  *   - 100× (`ScaleProbe <reps> 100`, sf10-equivalent: ~500k docs /
  *     200k vectors) — the core near-dup chain one order deeper
  *     (d_minhash_lsh, d_jaccard_pairs, d_dup_clusters), plus a leg
  *     with a lowered block cap so the Jaccard hot-block → MinHash
  *     rescue actually fires on real over-cap blocks at this scale.
  *
  * Corpus construction is deterministic: replica i of a document gets
  * doc_id + i·(max source id + 1) and every token suffixed with a
  * replica tag (regexp_replace), so cross-replica Jaccard is exactly
  * 0 — the true-duplicate structure scales linearly (N× blocks, N×
  * pairs), which is the honest scaling question. (A first attempt
  * used a consonant `translate`; this corpus's short vocabulary
  * mostly survived it, silently merging min-shingle blocks across
  * replicas into 100× candidate counts — a useful stress, but not the
  * linear-scaling measurement.) Replica id offsets are derived from
  * the source's own max id, never fixed constants — a fixed offset
  * silently collides once the source outgrows it, merging replica
  * state with no error. Embedding replicas keep their vectors (denser
  * clusters — the realistic shape for a larger corpus) under shifted
  * ids.
  *
  * Usage: ScaleProbe [reps] [scale] — writes parquet under
  * /tmp/sf{1,10}probe once, then times the family and prints plan
  * audit lines.
  */
object ScaleProbe {

  val ProbeDir = "/tmp/sf1probe"
  val Queries = Seq("d_minhash_lsh", "d_jaccard_pairs",
    "d_dup_clusters", "s_ann_ivf_kmeans",
    // round-4 additions: d_semdedup is the interesting one (its
    // within-cluster pair join is Σ|cluster|² — at 10× with k fixed
    // at 8 this measures the WORST case, clusters 10× oversized;
    // production raises k with N)
    "d_semdedup", "d_span_dedup", "d_lm_score",
    // second-half round-4 additions. s_ann_recall is deliberately NOT
    // probed: its brute-force ground-truth leg is the documented
    // O(queries·corpus) baseline and the query set scales with the
    // corpus here (vec_id % 40), so 10× data = 100× work by design —
    // at scale recall is estimated on a fixed query sample (see its
    // scaladoc), which the probe corpus can't express without
    // changing the query.
    "d_chunk_dedup", "d_kl_sources", "d_incremental_dedup",
    "q_funnel", "q_retention_cohorts")

  def buildCorpus(spark: SparkSession, srcDir: String,
      dir: String = ProbeDir, replicas: Int = 10,
      withEvents: Boolean = true): Unit = {
    val docs = Tables.documents(spark, srcDir)
    val emb = Tables.embeddings(spark, srcDir)
    // replica id offsets from the source's own max id (+1): fixed
    // constants would silently collide (and merge replica state) the
    // day the source corpus outgrows them
    val docOff = docs.agg(max("doc_id")).head().getLong(0) + 1
    val parts = math.min(64 * math.max(replicas / 10, 1), 256)
    val replicasD = (0 until replicas).map { i =>
      docs.select(
        (col("doc_id") + lit(i * docOff)).as("doc_id"),
        (if (i == 0) col("text")
         else regexp_replace(col("text"), "([a-z0-9]+)", "$1x" + i))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    replicasD.reduce(_ unionByName _)
      .repartition(parts)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val vecOff = emb.agg(max("vec_id")).head().getLong(0) + 1
    val replicasE = (0 until replicas).map { i =>
      emb.select((col("vec_id") + lit(i * vecOff)).as("vec_id"),
        col("embedding"), col("label"))
    }
    replicasE.reduce(_ unionByName _)
      .repartition(parts / 2)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    if (withEvents) {
      // events: shifted event ids AND user ids → N× users with the
      // per-user event distribution preserved (the linear-scaling
      // question for funnel/retention, whose state is per-user).
      // Read RAW so ts keeps its on-disk encoding (nanos long or
      // TIMESTAMP_NTZ µs, generation-dependent) and Tables.events'
      // type dispatch still applies to the probe copy.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = spark.read.parquet(s"$srcDir/events.parquet")
      val evOff = ev.agg(max("event_id")).head().getLong(0) + 1
      val userOff = ev.agg(max("user_id")).head().getLong(0) + 1
      val replicasV = (0 until replicas).map { i =>
        ev.select((col("event_id") + lit(i * evOff)).as("event_id"),
          col("ts"), (col("user_id") + lit(i * userOff)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }
      replicasV.reduce(_ unionByName _)
        .repartition(parts / 2)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      // customer dim for the stream-static join (st_static_join):
      // one dim row per REPLICATED user — keyed with the same userOff
      // stride as the event replicas, so every scaled user resolves
      // its segment and the dim grows linearly with the user
      // population (the production shape; custkeys beyond the user
      // range are dead dim weight for this join and are dropped)
      val cust = spark.read.parquet(s"$srcDir/customer.parquet")
        .filter(col("c_custkey") < userOff)
      val replicasC = (0 until replicas).map { i =>
        cust.select((col("c_custkey") + lit(i * userOff)).as("c_custkey"),
          col("c_name"), col("c_nationkey"), col("c_acctbal"),
          col("c_mktsegment"))
      }
      replicasC.reduce(_ unionByName _)
        .coalesce(4)
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val scale = args.lift(1).map(_.toInt).getOrElse(10)
    // SPARK_GRAFT_SHUFFLE: deep-probe corpora are 100× the bench SF,
    // so 32 shuffle partitions can exceed per-task buffer memory on
    // the widest exchanges (e.g. auto-k semdedup assignment: 625M
    // rows at 200k vectors). Sizing partitions to the data volume is
    // the same spill-aware rule a real cluster applies; the bench
    // config itself is unchanged.
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.lift(2) match {
      case Some("lm") => probeLm(spark, scale, reps); spark.stop(); return
      case Some("parity") =>
        probeParity(spark, scale, reps); spark.stop(); return
      case Some("media") =>
        probeMedia(spark, scale, reps); spark.stop(); return
      case Some("jdbc") =>
        probeJdbc(spark, scale); spark.stop(); return
      case Some("tpch") =>
        probeTpch(spark, scale, reps); spark.stop(); return
      case _ => ()
    }
    if (scale != 10) { probeDeep(spark, scale, reps); spark.stop(); return }
    println(s"[probe] building 10x corpus at $ProbeDir")
    val tBuild = System.nanoTime()
    buildCorpus(spark, "/root/testdata/sf0.1")
    println(f"[probe] corpus built in ${(System.nanoTime() - tBuild) / 1e9}%.1fs")
    // SPARK_GRAFT_PROBE_QUERIES overrides here too (it always did for
    // the deep path) — without this a 10x point for a single query
    // cost a full default-family sweep
    val tenXQueries = sys.env.get("SPARK_GRAFT_PROBE_QUERIES")
      .map(_.split(",").map(_.trim).toSeq).getOrElse(Queries)
    for (q <- tenXQueries) {
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, ProbeDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val med = times.sorted.apply(reps / 2)
      println(f"[probe] $q%-20s median ${med}%7.2fs  " +
        f"(runs ${times.map(t => f"$t%.2f").mkString("/")})")
      Scratch.audit(q, SparkEntry.queries(q)(spark, ProbeDir))
    }
    // The catalog d_semdedup holds k=8 (sized for the 2k-vector sf0.1
    // corpus) — at 10× that is the deliberate WORST case: mean cluster
    // size grows 10×, pair work Σ|c|² grows ~100×. The production
    // recipe keeps mean cluster size constant by scaling k with N;
    // measure it so both points are on record. (Default-set runs
    // only, same rule as probeDeep's rescue leg.)
    if (sys.env.get("SPARK_GRAFT_PROBE_QUERIES").isEmpty) {
      val kScaled = 80
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        graft.ext.Similarity.semDedup(
            graft.Tables.embeddings(spark, ProbeDir),
            kClusters = kScaled, iters = 2, threshold = 0.45)
          .orderBy("vec_id")
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val med = times.sorted.apply(reps / 2)
      println(f"[probe] d_semdedup(k=$kScaled) median ${med}%7.2fs  " +
        f"(runs ${times.map(t => f"$t%.2f").mkString("/")})")
    }
    spark.stop()
  }

  /** The 100× probe: core near-dup chain (the operators whose 100-TB
    * story matters most) on an sf10-equivalent ~500k-doc corpus, one
    * order past the routine 10× evidence. Document+embedding tables
    * only (events/funnel are probed at 10×; this mode answers the
    * dedup-chain question). */
  /** Default deep-probe set; override with `SPARK_GRAFT_PROBE_QUERIES`
    * (comma-separated catalog names) to take any query one order
    * deeper — the corpus is reused if already built. */
  private val DeepQueries =
    Seq("d_minhash_lsh", "d_jaccard_pairs", "d_dup_clusters")

  /** LM/score-family probe (`ScaleProbe <reps> <scale> lm`). The
    * [[buildCorpus]] replication suffixes every token per replica so
    * near-dup structure scales linearly — which also pins per-token
    * counts at their 1× values, the WRONG corpus for the lmScore
    * hot-token question: real corpus growth shares a Zipf vocabulary
    * and head-token counts grow ~N×. This mode replicates documents
    * with text VERBATIM (only ids shift): the vocabulary stays
    * 1×-sized while head counts scale, which is exactly the regime
    * the deterministic hot-token broadcast branch
    * ([[graft.queries.TrainingData.lmScore]], cnt ≥ 2^20) exists for.
    * The sf0.1 head token appears 9,182× → scale 128 pushes it to
    * ~1.18M ≥ 2^20. Prints the hot-vocabulary counts and the plan's
    * join strategies (broadcast hot leg + shuffled cold leg) before
    * timing the family. */
  /** Verbatim-text document replication (ids shift, text unchanged)
    * shared by the lm and media probe modes — for both, the per-row
    * payload must stay 1×-sized while row count scales. */
  private def verbatimDocsCorpus(spark: SparkSession, scale: Int)
      : String = {
    // dir keyed on the RAW scale: an integer-divided key (sf{scale/10})
    // would silently reuse a wrong-size corpus for any non-multiple
    // of 10 and collide all scales below 10
    val dir = s"/tmp/docsprobe${scale}x"
    if (!new java.io.File(s"$dir/documents.parquet").exists()) {
      println(s"[probe] building verbatim ${scale}x docs at $dir")
      val t0 = System.nanoTime()
      val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      val docOff = docs.agg(max("doc_id")).head().getLong(0) + 1
      (0 until scale).map { i =>
        docs.select((col("doc_id") + lit(i * docOff)).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
        .repartition(math.min(64 * math.max(scale / 10, 1), 256))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      println(f"[probe] corpus built in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    } else println(s"[probe] reusing corpus at $dir")
    dir
  }

  /** Multimodal-family probe (`ScaleProbe <reps> <scale> media`): the
    * m_* catalog entries over a replicated documents-as-media corpus.
    * The mapPartitions batch-decode shape is embarrassingly parallel
    * — per-record work, no shuffle before the final orderBy — so the
    * probe question is (a) ~linear wall-time and (b) flat memory: the
    * per-sample byte cap (`mp4Samples.maxBytesPerSample`) and
    * per-batch iterators must keep the heap independent of corpus
    * size. Heap-in-use is printed per query (post-GC estimate) as the
    * memory evidence. */
  def probeMedia(spark: SparkSession, scale: Int, reps: Int): Unit = {
    val dir = verbatimDocsCorpus(spark, scale)
    for (q <- Seq("m_binary_meta", "m_media_decode", "m_frame_sample",
        "m_mp4_demux", "m_frame_decode", "m_features", "m_resize")) {
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val rt = Runtime.getRuntime
      System.gc()
      val usedMb = (rt.totalMemory() - rt.freeMemory()) >> 20
      println(f"[probe] $q%-16s min ${times.min}%7.2fs  " +
        f"(runs ${times.map(t => f"$t%.2f").mkString("/")})  " +
        f"heapAfterGc ${usedMb}MB")
    }
  }

  /** TPC-H fact-replication probe (`ScaleProbe <reps> <scale> tpch`):
    * the analytics family on a star schema whose FACTS grow
    * scale/10 × past sf0.1 while the part/supplier dims stay fixed —
    * the realistic shape (dims grow far slower than facts; the
    * broadcast claims must survive exactly this asymmetry).
    * lineitem/orders/customer replicate under shifted key strides
    * derived from the source's own max keys (same collision rule as
    * [[buildCorpus]]); dates are kept, so per-replica structure is
    * identical and the scaling question is purely volumetric. */
  def probeTpch(spark: SparkSession, scale: Int, reps: Int): Unit = {
    val rep = math.max(scale, 1)
    val dir = s"/tmp/tpch${rep}x"
    val src = "/root/testdata/sf0.1"
    if (!new java.io.File(s"$dir/_built").exists()) {
      println(s"[probe] building ${rep}x tpch star at $dir")
      val t0 = System.nanoTime()
      val cust = spark.read.parquet(s"$src/customer.parquet")
      val ord = spark.read.parquet(s"$src/orders.parquet")
      val li = spark.read.parquet(s"$src/lineitem.parquet")
      val custOff = cust.agg(max("c_custkey")).head().getLong(0) + 1
      val ordOff = ord.agg(max("o_orderkey")).head().getLong(0) + 1
      (0 until rep).map(i => cust.select(
          (col("c_custkey") + lit(i * custOff)).as("c_custkey"),
          col("c_name"), col("c_nationkey"), col("c_acctbal"),
          col("c_mktsegment")))
        .reduce(_ unionByName _).coalesce(4)
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      (0 until rep).map(i => ord.select(
          (col("o_orderkey") + lit(i * ordOff)).as("o_orderkey"),
          (col("o_custkey") + lit(i * custOff)).as("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
          col("o_orderpriority")))
        .reduce(_ unionByName _).repartition(math.min(32 * rep, 128))
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      (0 until rep).map(i => li.withColumn("l_orderkey",
          col("l_orderkey") + lit(i * ordOff)))
        .reduce(_ unionByName _).repartition(math.min(64 * rep, 256))
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      for (t <- Seq("part", "supplier", "nation", "region"))
        spark.read.parquet(s"$src/$t.parquet").coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      new java.io.File(s"$dir/_built").createNewFile()
      println(f"[probe] star built in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    } else println(s"[probe] reusing ${rep}x tpch star at $dir")
    val queries = sys.env.get("SPARK_GRAFT_PROBE_QUERIES")
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("q1_pricing_summary", "q3_shipping_priority",
        "q5_local_supplier", "q8_market_share", "q10_returned_items",
        "q14_promo_effect", "q17_small_qty", "q18_large_orders",
        "q19_disjunctive", "q_zorder_skipping"))
    for (q <- queries) {
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $q%-20s min ${times.min}%7.2fs  " +
        f"(runs ${times.map(t => f"$t%.2f").mkString("/")})")
    }
  }

  /** JDBC upsert-sink probe (`ScaleProbe <reps> <scale> jdbc`,
    * rows = scale × 100k; default 1M): the SinksSpec Derby round-trip
    * is row-count-tiny, so this pushes a production-sized batch
    * through the REAL live path — Spark JDBC staging write (batched
    * inserts, parallel partitions) + ONE server-side MERGE in one
    * transaction — against embedded in-memory Derby, the one JDBC
    * endpoint this sandbox can run. Asserts the script is exactly
    * [MERGE, DROP] (a hidden per-row path would surface as a
    * statement-per-row script or minutes of wall time) and verifies
    * the merged row count server-side. Two legs: all-insert, then
    * same-key all-update. */
  def probeJdbc(spark: SparkSession, scale: Int): Unit = {
    import graft.sources.JdbcUpsertSink
    import JdbcUpsertSink.JdbcTarget
    val n = scale * 100000L
    val url = "jdbc:derby:memory:graftsinkprobe;create=true"
    val seed = java.sql.DriverManager.getConnection(url)
    try {
      val st = seed.createStatement()
      st.execute("""CREATE TABLE "users" ("email" VARCHAR(40) """ +
        """NOT NULL PRIMARY KEY, "name" VARCHAR(40), "age" INT)""")
      st.close()
    } finally seed.close()
    val t = JdbcTarget(url, "users", "app", "", Map(
      "createTableColumnTypes" -> "email VARCHAR(40), name VARCHAR(40)",
      "batchsize" -> "10000", "numPartitions" -> "8"))
    def staged(tag: String) = spark.range(n).select(
      concat(lit("user"), col("id")).as("email"),
      concat(lit(tag), (col("id") % 997)).as("name"),
      (col("id") % 80).cast("int").as("age"))
    def countRows(): Long = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c.createStatement()
          .executeQuery("""SELECT count(*) FROM "users"""")
        rs.next(); rs.getLong(1)
      } finally c.close()
    }
    for ((tag, leg) <- Seq("v1" -> "insert", "v2" -> "update")) {
      val t0 = System.nanoTime()
      val script = JdbcUpsertSink.upsert(staged(tag), t, Seq("email"),
        batchId = if (leg == "insert") 1 else 2, dialect = "ansi")
      val secs = (System.nanoTime() - t0) / 1e9
      assert(script.length == 2 &&
        script.head.startsWith("MERGE INTO") &&
        script(1).startsWith("DROP TABLE"),
        s"script must be one MERGE + one DROP, got: $script")
      val rows = countRows()
      assert(rows == n, s"expected $n rows after $leg leg, got $rows")
      println(f"[probe] jdbc_upsert($leg) $n rows in $secs%7.2fs " +
        f"(${n / secs}%.0f rows/s), script = 1 MERGE + 1 DROP")
    }
  }

  def probeLm(spark: SparkSession, scale: Int, reps: Int): Unit = {
    val dir = verbatimDocsCorpus(spark, scale)
    val docsDf = Tables.documents(spark, dir)
    // hot-vocabulary evidence: the collect is bounded by construction
    // (≤ total_tokens / 2^20 rows can clear the threshold)
    val hot = docsDf
      .select(explode(graft.ext.TextStats.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= (1L << 20))
      .orderBy(desc("cnt"), asc("tok")).collect()
    println(s"[probe] hot tokens (cnt >= 2^20 = ${1L << 20}): ${hot.length}" +
      hot.take(8).map(r => s"\n[probe]   '${r.get(0)}' x ${r.get(1)}")
        .mkString)
    val plan = graft.queries.TrainingData
      .lmScore(docsDf, materialize = false)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
    println("[probe] lmScore join strategies:\n" + plan.split("\n")
      .filter(_.contains("Join")).map("[probe]   " + _.trim)
      .mkString("\n"))
    for (q <- Seq("d_lm_score", "d_lm_bigram", "d_quality_lr",
        "d_repetition_break")) {
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $q%-20s min ${times.min}%7.2fs  " +
        f"(runs ${times.map(t => f"$t%.2f").mkString("/")})")
    }
  }

  /** Parity-merge probe (`ScaleProbe <reps> <scale> parity`): the
    * reference-parity pipelines (p_users_merge, p_staffing_pipeline,
    * p_projects_pipeline) run full-outer SortMergeJoin merges over
    * frames derived from customer/orders — the operators an actual
    * user of the reference runs on a big roster, never scale-probed
    * before round 6. Replicates customer and orders with ids shifted
    * (o_custkey shifts by the same per-replica offset as c_custkey,
    * preserving FK structure, so staged/current frame sizes and merge
    * match rates scale linearly). */
  def probeParity(spark: SparkSession, scale: Int, reps: Int): Unit = {
    val dir = s"/tmp/sf${scale / 10}parityprobe"
    if (!new java.io.File(s"$dir/customer.parquet").exists()) {
      println(s"[probe] building ${scale}x customer/orders at $dir")
      val t0 = System.nanoTime()
      val cust = Tables.customer(spark, "/root/testdata/sf0.1")
      val ord = Tables.orders(spark, "/root/testdata/sf0.1")
      val custOff = cust.agg(max("c_custkey")).head().getLong(0) + 1
      val ordOff = ord.agg(max("o_orderkey")).head().getLong(0) + 1
      val parts = math.min(64 * math.max(scale / 10, 1), 256)
      (0 until scale).map { i =>
        cust.withColumn("c_custkey", col("c_custkey") + lit(i * custOff))
      }.reduce(_ unionByName _)
        .repartition(parts / 2)
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      (0 until scale).map { i =>
        ord.withColumn("o_orderkey", col("o_orderkey") + lit(i * ordOff))
          .withColumn("o_custkey", col("o_custkey") + lit(i * custOff))
      }.reduce(_ unionByName _)
        .repartition(parts)
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      println(f"[probe] built in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    } else println(s"[probe] reusing corpus at $dir")
    for (q <- Seq("p_users_merge", "p_staffing_pipeline",
        "p_projects_pipeline")) {
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $q%-22s min ${times.min}%7.2fs  " +
        f"(runs ${times.map(t => f"$t%.2f").mkString("/")})")
      Scratch.audit(q, SparkEntry.queries(q)(spark, dir))
    }
  }

  def probeDeep(spark: SparkSession, scale: Int, reps: Int): Unit = {
    val dir = s"/tmp/sf${scale / 10}probe"
    if (!new java.io.File(s"$dir/documents.parquet").exists()) {
      println(s"[probe] building ${scale}x corpus at $dir")
      val tBuild = System.nanoTime()
      buildCorpus(spark, "/root/testdata/sf0.1", dir, replicas = scale,
        withEvents = false)
      println(f"[probe] corpus built in ${(System.nanoTime() - tBuild) / 1e9}%.1fs " +
        s"(${spark.read.parquet(s"$dir/documents.parquet").count()} docs)")
    } else println(s"[probe] reusing ${scale}x corpus at $dir")
    val queries = sys.env.get("SPARK_GRAFT_PROBE_QUERIES")
      .map(_.split(",").map(_.trim).toSeq).getOrElse(DeepQueries)
    for (q <- queries) {
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $q%-20s min ${times.min}%7.2fs  " +
        f"(runs ${times.map(t => f"$t%.2f").mkString("/")})")
      Scratch.audit(q, SparkEntry.queries(q)(spark, dir))
    }
    // Hot-block rescue under real fire: this corpus's max natural
    // min-shingle block is ~15 docs per replica, so the catalog cap
    // (1000) never triggers; cap=8 routes every real over-cap block
    // through the MinHash rescue at full 500k-doc scale — measuring
    // the rescue path itself, not just its cold bypass. (Default-set
    // runs only; a custom query list skips it.)
    if (sys.env.get("SPARK_GRAFT_PROBE_QUERIES").isEmpty) {
      val docs = Tables.documents(spark, dir)
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        graft.ext.Dedup.jaccardPairs(docs, "doc_id", "text",
            n = 3, threshold = 0.2, maxBlockSize = 8)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] jaccard(cap=8,rescue) min ${times.min}%7.2fs  " +
        f"(runs ${times.map(t => f"$t%.2f").mkString("/")})")
    }
  }
}
