package graft.ops

import graft.SparkSpec

class MeltSpec extends SparkSpec {
  import spark.implicits._

  test("melt emits one row per non-null role, shared SC code") {
    val proj = Seq(
      (10L, Some(1L), Some(2L), None: Option[Long], Some(4L), Some(5L)),
      (20L, Some(6L), None: Option[Long], None: Option[Long],
        None: Option[Long], None: Option[Long]))
      .toDF("project_id", "em_id", "sm_id", "pm_id", "sc1_id", "sc2_id")
    val got = Melt.melt(proj, Seq("project_id"),
      Seq("EM" -> "em_id", "SM" -> "sm_id", "PM" -> "pm_id",
        "SC" -> "sc1_id", "SC" -> "sc2_id"), "role", "user_id")
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._3))
    assert(got.toSeq == Seq(
      (10L, "EM", 1L), (10L, "SM", 2L), (10L, "SC", 4L), (10L, "SC", 5L),
      (20L, "EM", 6L)))
  }
}
