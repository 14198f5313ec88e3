package graft.ext

import graft.SparkSpec

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
}
