package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components merges transitive chains and leaves " +
      "islands apart") {
    // two chains (1-2-3, 7-8) and an isolated edge (20-21)
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L), (20L, 21L))
      .toDF("src", "dst")
    val got = ConnectedComponents.components(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 8L -> 7L, 20L -> 20L, 21L -> 20L))
  }

  test("interval join finds exactly the in-tolerance pairs across " +
      "band boundaries") {
    def ts(sec: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-01 00:${sec / 60}%02d:${sec % 60}%02d")
    // tolerance 60s; pairs: (1,2) 59s apart spanning a band boundary,
    // (3,4) 61s apart must NOT match, (5,6) same instant
    val a = Seq((1L, 9L, ts(59)), (3L, 9L, ts(120)), (5L, 9L, ts(300)))
      .toDF("id_a", "user_id", "ts_a")
    val b = Seq((2L, 9L, ts(118)), (4L, 9L, ts(181)), (6L, 9L, ts(300)))
      .toDF("id_b", "user_id", "ts_b")
    val got = RangeJoin.intervalJoin(a, b, "user_id", "ts_a", "ts_b",
      60L * 1000000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // (1,2): 59s apart across a band boundary; (3,2): 2s apart;
    // (5,6): same instant; (3,4) at 61s must NOT match
    assert(got == Set((1L, 2L), (3L, 2L), (5L, 6L)))
  }

  test("interval join emits each qualifying pair exactly once") {
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("ts"))
    val a = ev.select(col("user_id"), col("event_id").as("ea"),
      col("ts").as("ts_a"))
    val b = ev.select(col("user_id"), col("event_id").as("eb"),
      col("ts").as("ts_b"))
    val pairs = RangeJoin.intervalJoin(a, b, "user_id", "ts_a", "ts_b",
      300L * 1000000).filter(col("ea") < col("eb"))
    assert(pairs.count() ==
      pairs.select("ea", "eb").distinct().count())
  }
}
