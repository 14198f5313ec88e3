package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Structural invariants of the round-3 training-data operators (their
  * values are oracle-verified; these assert the properties the oracle
  * can't phrase). */
class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  test("d_pack: spans are ordered and per-source sequence counts " +
      "match the token totals") {
    val p = TrainingData.dPack(spark, sf0001).cache()
    assert(p.filter(col("pack_start") > col("pack_end")).isEmpty)
    assert(p.filter(col("n_tok") <= 0).isEmpty)
    // last sequence index per source == floor((total_tokens - 1)/128)
    val bad = p.groupBy("source")
      .agg(max(col("pack_end")).as("last_seq"),
        floor((sum(col("n_tok")) - 1) / 128).as("want"))
      .filter(col("last_seq") =!= col("want"))
    assert(bad.isEmpty)
    p.unpersist()
  }

  test("d_chunking: per-doc chunk counts and lengths are consistent") {
    val c = TrainingData.dChunking(spark, sf0001).cache()
    assert(c.filter(col("n_chunk_toks") < 1 ||
      col("n_chunk_toks") > 32).isEmpty)
    assert(c.filter(col("chunk_idx") === 0 && col("start_tok") =!= 0)
      .isEmpty)
    // chunk count per doc = floor((n-1)/24) + 1 over the doc's tokens
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
    val bad = c.groupBy("doc_id").agg(count(lit(1)).as("got"))
      .join(docs, "doc_id")
      .filter(col("got") =!= floor((col("n") - 1) / 24) + 1)
    assert(bad.isEmpty)
    c.unpersist()
  }

  test("d_gopher_rules: fractions bounded, verdict consistent with " +
      "its inputs") {
    val g = TrainingData.dGopherRules(spark, sf0001).cache()
    assert(g.filter(col("dup_tok_frac") < 0 || col("dup_tok_frac") > 1 ||
      col("dup_2gram_frac") < 0 || col("dup_2gram_frac") > 1).isEmpty)
    val recheck = col("n_tok") >= 20 &&
      col("mean_tok_len").between(3.0, 10.0) &&
      col("dup_tok_frac") <= 0.6 && col("dup_2gram_frac") <= 0.05
    assert(g.filter(col("keep") =!= recheck).isEmpty)
    // the verdict must actually split this corpus
    val (kept, total) = (g.filter(col("keep")).count(), g.count())
    assert(kept > 0 && kept < total)
    g.unpersist()
  }

  test("d_stratified_sample: rates legal, sample is a strict subset " +
      "and deterministic") {
    val s1 = TrainingData.dStratifiedSample(spark, sf0001)
      .as[(Long, String, Long)].collect().toSeq
    assert(s1.nonEmpty)
    assert(s1.forall(r => Set(10L, 25L, 40L).contains(r._3)))
    val total = graft.Tables.documents(spark, sf0001).count()
    assert(s1.size < total)
    val s2 = TrainingData.dStratifiedSample(spark, sf0001)
      .as[(Long, String, Long)].collect().toSeq
    assert(s1 == s2)
  }
}
