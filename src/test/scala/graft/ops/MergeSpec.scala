package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def cur = Seq(
    ("a@x", 1L, "Alice", "old"),
    ("b@x", 2L, "Bob", "keep-me"),
    ("c@x", 3L, "Carol", "same"))
    .toDF("email", "user_id", "name", "note")

  private def staged = Seq(
    ("a@x", "Alice", "new"),   // changed → update
    ("c@x", "Carol", "same"),  // identical → noop
    ("d@x", "Dave", "fresh"))  // new key → insert
    .toDF("email", "name", "note")

  test("merge classifies insert/update/noop/keep and staged wins") {
    val m = Merge.merge(staged, cur, Seq("email"), Seq("name", "note"))
    val got = m.select("email", "name", "note", Merge.ActionCol)
      .as[(String, String, String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("a@x", "Alice", "new", "update"),
      ("b@x", "Bob", "keep-me", "keep"),
      ("c@x", "Carol", "same", "noop"),
      ("d@x", "Dave", "fresh", "insert")))
  }

  test("staged NULL overwrites current value on update (reference " +
      "UPDATE-to-NULL semantics)") {
    val st = Seq(("a@x", null.asInstanceOf[String], "new"))
      .toDF("email", "name", "note")
    val m = Merge.merge(st, cur, Seq("email"), Seq("name", "note"))
    val a = m.filter($"email" === "a@x")
      .select("name", Merge.ActionCol).as[(Option[String], String)]
      .collect().head
    assert(a == (None, "update"))
  }

  test("assignIds gives inserts max+rank ordered by business key") {
    val m = Merge.merge(staged, cur, Seq("email"), Seq("name", "note"))
    val withIds = Merge.assignIds(m, "user_id", "email")
    val got = withIds.select("email", "user_id")
      .as[(String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("a@x", 1L), ("b@x", 2L), ("c@x", 3L),
      ("d@x", 4L)))
  }

  test("merge is idempotent: re-merging the merged state is all noop/keep") {
    val m = Merge.merge(staged, cur, Seq("email"), Seq("name", "note"))
    val newCur = Merge.assignIds(m, "user_id", "email")
      .select("email", "user_id", "name", "note")
    val again = Merge.merge(staged, newCur, Seq("email"),
      Seq("name", "note"))
    val actions = again.select(Merge.ActionCol).as[String].collect()
    assert(actions.forall(a => a == "noop" || a == "keep"))
  }
}
