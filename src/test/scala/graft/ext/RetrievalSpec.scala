package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana cherry date"),
    (2L, "apple kiwi kiwi kiwi"),
    (3L, "banana banana banana banana banana banana banana banana"),
    (4L, "plum fig grape melon"),
    (5L, "apple kiwi kiwi kiwi kiwi kiwi kiwi kiwi"))
    .toDF("doc_id", "text")

  test("doc matching both query terms outranks single-term docs; " +
      "non-matching docs never appear") {
    val q = Seq((0L, "apple"), (0L, "banana")).toDF("qid", "term")
    val ranked = Retrieval.bm25TopK(corpus, q, k = 10)
      .orderBy("rk").select("doc_id").as[Long].collect().toSeq
    // doc 1 holds both terms at tf=1; docs 2/5 hold one term at tf=1
    // (doc 3's tf=8 single-term score may legitimately top it)
    assert(ranked.indexOf(1L) < ranked.indexOf(2L))
    assert(ranked.indexOf(1L) < ranked.indexOf(5L))
    assert(!ranked.contains(4L), "doc with no query term must be absent")
  }

  test("tf saturation: 8x the occurrences ranks higher but yields " +
      "far less than 8x the score") {
    val q = Seq((0L, "banana")).toDF("qid", "term")
    val sc = Retrieval.bm25TopK(corpus, q, k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(sc(3L) > sc(1L))
    assert(sc(3L) < 8 * sc(1L))
  }

  test("length normalization: same tf, shorter doc scores higher") {
    val q = Seq((0L, "apple")).toDF("qid", "term")
    val sc = Retrieval.bm25TopK(corpus, q, k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    // docs 2 and 5 both contain "apple" once; doc 5 is twice as long
    assert(sc(2L) > sc(5L))
  }

  test("ranks are dense 1..n per query and bounded by k") {
    val q = Seq((0L, "apple"), (1L, "banana")).toDF("qid", "term")
    val got = Retrieval.bm25TopK(corpus, q, k = 2)
      .select("qid", "rk").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(got(0L) == Seq(1L, 2L))
    assert(got(1L) == Seq(1L, 2L))
  }

  // exact integer micro-unit contribution the operator commits to
  private def c(rk: Long, kRrf: Long = 60L): Long =
    math.floor(1e9 / (kRrf + rk) + 0.5).toLong

  test("rrfFuse: cross-leg agreement wins — a doc ranked 2nd in both " +
      "legs beats each leg's unshared 1st") {
    val legA = Seq((0L, 10L, 1L), (0L, 99L, 2L), (0L, 11L, 3L))
      .toDF("qid", "doc_id", "rk")
    val legB = Seq((0L, 20L, 1L), (0L, 99L, 2L), (0L, 21L, 3L))
      .toDF("qid", "doc_id", "rk")
    val got = Retrieval.rrfFuse(Seq(legA, legB), k = 10)
      .orderBy("rk")
      .select("doc_id", "rrf", "n_legs", "rk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.head._1 == 99L, s"shared doc must fuse to rank 1: $got")
    assert(got.head._2 == 2 * c(2), "rrf must be the exact integer sum")
    assert(got.head._3 == 2L)
    // 2/(62) > 1/61: agreement at rank 2 beats a lone rank 1
    assert(2 * c(2) > c(1))
    val byDoc = got.map(g => g._1 -> g).toMap
    assert(byDoc(10L)._2 == c(1) && byDoc(10L)._3 == 1L)
  }

  test("rrfFuse: single-leg fusion preserves the leg's order and " +
      "ties break by doc_id") {
    val leg = Seq((0L, 5L, 1L), (0L, 3L, 2L), (0L, 9L, 3L))
      .toDF("qid", "doc_id", "rk")
    val got = Retrieval.rrfFuse(Seq(leg), k = 10)
      .orderBy("rk").select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(5L, 3L, 9L))
    // equal-rank docs across two queries stay per-query independent
    val twoQ = Seq((0L, 7L, 1L), (1L, 8L, 1L)).toDF("qid", "doc_id", "rk")
    val r = Retrieval.rrfFuse(Seq(twoQ), k = 10)
      .select("qid", "rk").as[(Long, Long)].collect().toSet
    assert(r == Set((0L, 1L), (1L, 1L)))
    // tie: same fused score → lower doc_id first
    val tie = Seq((0L, 42L, 1L), (0L, 41L, 1L)).toDF("qid", "doc_id", "rk")
    val tr = Retrieval.rrfFuse(Seq(tie), k = 10)
      .orderBy("rk").select("doc_id").as[Long].collect().toSeq
    assert(tr == Seq(41L, 42L))
  }

  test("rrfFuse bounds output at k per query") {
    val leg = (1L to 25L).map(i => (0L, 100L + i, i))
      .toDF("qid", "doc_id", "rk")
    assert(Retrieval.rrfFuse(Seq(leg), k = 10).count() == 10L)
  }

  test("phraseSearch: exact adjacency counts (overlapping occurrences " +
      "each count), no cross-phrase bleed, and the postings cache is " +
      "released on return") {
    spark.sharedState.cacheManager.clearCache()
    val docs = Seq(
      (1L, "a b a b a"),   // "a b": pos 0 and 2 → 2 hits
      (2L, "a b c"),       // "a b" once, "b c" once
      (3L, "b a b"),       // "a b" once (pos 1)
      (4L, "c c c")        // neither
    ).toDF("doc_id", "text")
    val phrases = Seq((1L, "a", "b"), (2L, "b", "c"))
      .toDF("pid", "w1", "w2")
    val got = Retrieval.phraseSearch(docs, phrases)
      .orderBy("pid")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 3L, 4L), (2L, 1L, 1L)),
      got.toSeq.toString)
    assert(spark.sharedState.cacheManager.isEmpty,
      "phraseSearch left a cached frame behind")
  }

  test("phraseIndexProbe: identical results to phraseSearch from the " +
      "persisted layout, partition-pruned scan, no storage left behind") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val toks = Seq((1L, "data", "stream"), (2L, "fast", "query"))
      .toDF("pid", "w1", "w2")
    val dir = java.nio.file.Files
      .createTempDirectory("phraseidx_spec").toString
    try {
      spark.sharedState.cacheManager.clearCache()
      Retrieval.buildPhraseIndex(docs, dir)
      val allFiles = {
        def walk(f: java.io.File): Seq[java.io.File] = {
          val cs = Option(f.listFiles()).toSeq.flatten
          cs.filter(_.isFile) ++ cs.filter(_.isDirectory).flatMap(walk)
        }
        walk(new java.io.File(dir))
          .count(_.getName.endsWith(".parquet"))
      }
      assert(allFiles > 4, s"layout too small to prove pruning: $allFiles")
      val probe = Retrieval.phraseIndexProbe(spark, dir, toks)
        .orderBy("pid")
      val got = probe.collect().toSeq
      val want = Retrieval.phraseSearch(docs, toks)
        .orderBy("pid").collect().toSeq
      assert(got == want, s"layout changed results: $got vs $want")
      // the executed probe read strictly fewer files than the layout
      // holds (4 query terms → ≤4 of the 64 hash buckets)
      def allScans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
        case q: QueryStageExec => allScans(q.plan)
        case f: FileSourceScanExec => Seq(f)
        case o => o.children.flatMap(allScans)
      }
      val scans = allScans(probe.queryExecution.executedPlan)
      assert(scans.nonEmpty)
      val numFiles = scans.map(_.metrics("numFiles").value).max
      assert(numFiles > 0 && numFiles < allFiles,
        s"expected partition pruning: read $numFiles of $allFiles files")
      assert(scans.exists(_.toString.contains("PartitionFilters: [")))
      // the probe path must carry NO corpus-proportional state — that
      // was the build-per-query form's 1000x memory cliff
      assert(spark.sharedState.cacheManager.isEmpty,
        "phraseIndexProbe cached a frame — the probe must be stateless")
    } finally {
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("topBigramsFromIndex: identical phrase frame to the text-sample " +
      "derivation at every mod, on real data") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files
      .createTempDirectory("phraseidx_derive_spec").toString
    try {
      Retrieval.buildPhraseIndex(docs, dir)
      for (mod <- Seq(1L, 4L)) {
        val fromText = graft.queries.TrainingData.topBigrams(docs, mod)
          .orderBy("pid").collect().toSeq
        val fromIdx = Retrieval.topBigramsFromIndex(spark, dir, mod)
          .orderBy("pid").collect().toSeq
        assert(fromText == fromIdx,
          s"mod=$mod derivation drift: $fromText vs $fromIdx")
        assert(fromText.size == 5)
      }
    } finally graft.queries.QueryUtil.deleteRecursively(dir)
  }

  test("autoSampleMod: exact integer rule — full derivation below the " +
      "floor, mod-4 at the 5000-doc bench corpus, corpus-independent " +
      "sample size beyond") {
    import graft.queries.TrainingData.autoSampleMod
    assert(autoSampleMod(500L) == 1L)   // sf0.01: full derivation
    assert(autoSampleMod(1249L) == 1L)
    assert(autoSampleMod(5000L) == 4L)  // sf0.1: the proven mod-4 pin
    assert(autoSampleMod(5000000L) == 4000L) // 1000x: ~1250-doc sample
  }

  test("autoPhraseBuckets: exact integer rule — floored at the proven " +
      "64, ceil division above it, capped at 2^16; and " +
      "buildPhraseIndexAuto probes identically to the hand-set grid") {
    import Retrieval.autoPhraseBuckets
    assert(autoPhraseBuckets(0L) == 64)          // empty corpus: floor
    assert(autoPhraseBuckets(1000000L) == 64)    // sf0.1 class: floor
    assert(autoPhraseBuckets(64L * 4000000L) == 64)  // boundary
    assert(autoPhraseBuckets(64L * 4000000L + 1) == 65)  // ceil
    assert(autoPhraseBuckets(1000000000L) == 250)    // 1000x class
    assert(autoPhraseBuckets(Long.MaxValue) == 65536) // cap
    // the auto build is layout-only: identical probe results
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val toks = Seq((1L, "data", "stream")).toDF("pid", "w1", "w2")
    val dirA = java.nio.file.Files
      .createTempDirectory("phraseidx_autoA").toString
    val dirB = java.nio.file.Files
      .createTempDirectory("phraseidx_autoB").toString
    try {
      val n = Retrieval.buildPhraseIndexAuto(docs, dirA)
      assert(n == 64, s"sf0.001 must floor at 64, derived $n")
      Retrieval.buildPhraseIndex(docs, dirB, 16)
      val got = Retrieval.phraseIndexProbe(spark, dirA, toks, n)
        .orderBy("pid").collect().toSeq
      val want = Retrieval.phraseIndexProbe(spark, dirB, toks, 16)
        .orderBy("pid").collect().toSeq
      assert(got == want, "bucket count changed probe results")
    } finally {
      graft.queries.QueryUtil.deleteRecursively(dirA)
      graft.queries.QueryUtil.deleteRecursively(dirB)
    }
  }
}
