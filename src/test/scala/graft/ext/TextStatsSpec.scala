package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("bpe-ish token count splits letter/digit/punct runs") {
    val got = Seq("hello world42, ok!").toDF("t")
      .select(TextStats.bpeTokenCount($"t")).as[Int].collect().head
    // hello | world | 42 | , | ok | !  = 6
    assert(got == 6)
  }

  test("language ID picks the stopword-dominant language") {
    val in = Seq(
      "the cat is in the house and it is warm",
      "der Hund ist nicht in das Haus und",
      "el gato en la casa de los vecinos y",
      "xyzzy plugh quux").toDF("text")
    val got = in.select(TextStats.predictedLang(
      TextStats.tokens($"text"))).as[String].collect()
    assert(got.toSeq == Seq("en", "de", "es", "und"))
  }

  test("quality score is bounded and penalizes degenerate text") {
    val in = Seq(
      "the quick brown fox jumps over the lazy dog and that " +
        "is a fine thing to see in the morning light",
      "spam spam spam spam spam").toDF("text")
    val got = in.select(TextStats.qualityScore($"text"))
      .as[Double].collect()
    assert(got.forall(s => s >= 0.0 && s <= 1.0))
    assert(got(0) > got(1)) // rich text beats degenerate repetition
  }

  test("fingerprint is order-sensitive (unlike the set-based hashes)") {
    val got = Seq("ab", "ba", "ab").toDF("t")
      .select(TextStats.fingerprint($"t")).as[Long].collect()
    assert(got(0) != got(1))
    assert(got(0) == got(2))
  }
}
