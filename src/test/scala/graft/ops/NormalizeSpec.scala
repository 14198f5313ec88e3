package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("parseBoolean truth table incl. garbage→false (not null)") {
    val in = Seq("yes", "True", "1", " YES ", "no", "FALSE", "0", "",
      "maybe", null).toDF("v")
    val got = in.select(Normalize.parseBoolean($"v")).as[Boolean].collect()
    assert(got.toSeq == Seq(true, true, true, true, false, false, false,
      false, false, false))
  }

  test("blankToNull keeps non-blank untrimmed, nulls blanks") {
    val in = Seq("", "   ", " x ", null).toDF("v")
    val got = in.select(Normalize.blankToNull($"v")).as[Option[String]]
      .collect()
    assert(got.toSeq == Seq(None, None, Some(" x "), None))
  }

  test("coalesceCandidates prefers earlier non-blank candidate") {
    val in = Seq(
      ("a", "b", "c"), ("", "b", "c"), (null, "", "c"), ("", null, ""))
      .toDF("c1", "c2", "c3")
    val got = in.select(Normalize.coalesceCandidates(
      Seq($"c1", $"c2", $"c3"))).as[Option[String]].collect()
    assert(got.toSeq == Seq(Some("a"), Some("b"), Some("c"), None))
  }

  test("missingReason lists all missing required fields in order") {
    val in = Seq(("x", "y"), ("", "y"), ("", null)).toDF("a", "b")
    val got = in.select(Normalize.missingReason(
      Seq("A" -> $"a", "B" -> $"b"))).as[Option[String]].collect()
    assert(got.toSeq == Seq(None, Some("missing: A"),
      Some("missing: A, B")))
  }

  test("guardedInt routes unparseable to null without ANSI error") {
    val in = Seq("42", "x42", "", null).toDF("v")
    val got = in.select(Normalize.guardedInt($"v")).as[Option[Int]]
      .collect()
    assert(got.toSeq == Seq(Some(42), None, None, None))
  }
}
