package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Skew evidence for the hot-token score joins (`d_lm_score` /
  * `d_lm_bigram`): their scaladocs claim (a) the vocabulary side
  * broadcasts under the default config, so the hot key never shuffles
  * into a skewed partition, and (b) if the vocab side ever outgrows
  * the broadcast threshold, the resulting sort-merge join is exactly
  * AQE's skew-join case. Both claims are executed-plan-verified here
  * instead of taken on faith. */
class LmSkewSpec extends SparkSpec {
  import spark.implicits._

  /** A corpus with one pathologically hot token: ~half of all token
    * occurrences are the same word, the rest unique fillers — the
    * "the"-at-100-TB shape compressed into a spec. */
  private def hotCorpus(nDocs: Int, tokensPerDoc: Int) =
    spark.range(nDocs.toLong).select(col("id").as("doc_id"),
      concat_ws(" ",
        (0 until tokensPerDoc).map(j =>
          if (j % 2 == 0) lit("hot")
          else concat(lit("w"), col("id") * tokensPerDoc + j)): _*)
        .as("text"))

  test("default config: the vocab side of the lm-score join " +
      "broadcasts (no skewable shuffle on the hot token)") {
    val df = TrainingData.lmScore(
      graft.Tables.documents(spark, sf0001), materialize = false)
    // collect() (not .write) so the inspected QueryExecution is the
    // one that ran — a write action plans its own QueryExecution and
    // leaves this frame's AQE plan un-finalized
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab join must broadcast under defaults:\n${plan.take(4000)}")
  }

  test("broadcast disabled: the deterministic hot-key bypass splits " +
      "the join — hot tokens broadcast, the shuffled branch is cold") {
    // MEASURED FINDING (this spec's earlier form): with the vocab
    // broadcast suppressed and AQE skew thresholds scaled to corpus
    // size (factor 2.0, threshold 32kb, advisory 16kb), AQE did NOT
    // split the hot token's partition — the SMJ's vocab child is a
    // HashAggregate over the shuffle, not a raw AQEShuffleRead, so
    // OptimizeSkewedJoin's pattern cannot match this operator's
    // shape. Hence the deterministic bypass in lmScore/lmBigram,
    // whose plan shape is asserted here under the same adversarial
    // config.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "32kb")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16kb")
      // hotThreshold 1000 < the 8000 "hot" occurrences → bypass fires
      val df = TrainingData.lmScore(hotCorpus(400, 40),
        materialize = false, hotThreshold = 1000L)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // hot branch: explicit broadcast hint survives threshold=-1
      assert(plan.contains("BroadcastHashJoin"),
        s"hot branch must broadcast:\n${plan.take(4000)}")
      // cold branch still shuffles — but only sub-threshold keys
      assert(plan.contains("SortMergeJoin") && plan.contains("Union"),
        s"cold branch + union expected:\n${plan.take(4000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("hot-key bypass is semantics-preserving: threshold extremes " +
      "agree for lmScore and lmBigram") {
    val corpus = hotCorpus(120, 30)
    def rowsS(t: Long) =
      TrainingData.lmScore(corpus, materialize = false, hotThreshold = t)
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    // Long.MaxValue → bypass never fires (pure single-join semantics);
    // 2 → almost every token rides the broadcast branch
    assert(rowsS(Long.MaxValue) == rowsS(2L))
    assert(rowsS(Long.MaxValue) == rowsS(1000L))
    def rowsB(t: Long) =
      TrainingData.lmBigram(corpus, materialize = false, hotThreshold = t)
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(rowsB(Long.MaxValue) == rowsB(2L))
    assert(rowsB(Long.MaxValue) == rowsB(1000L))
  }
}
