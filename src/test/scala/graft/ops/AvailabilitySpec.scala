package graft.ops

import graft.SparkSpec

class AvailabilitySpec extends SparkSpec {
  import spark.implicits._

  // sheet-shaped fixture: 3 slot headers, deliberately unsorted —
  // slot order must come from the lexicographic header sort
  // (reference `staffing-roster-pipeline.py:90-91`)
  private val rows = Seq(
    // (slotB, slotA, slotC) — sorted order is A, B, C
    ("Monday, Wednesday", "monday", "TUESDAY , monday"),
    ("", null, "Friday"),
  ).toDF("b GMT-0600", "a GMT-0600", "c GMT-0600")

  test("day bitmaps honor sorted slot order + case/space-insensitivity") {
    val maps = Availability.allDayBitmaps(rows.columns, "GMT-0600")
    val out = rows.withColumns(maps.toMap)
    val got = out.select("availability_mon", "availability_tue",
      "availability_wed", "availability_fri").as[(String, String, String,
      String)].collect()
    // row 1: mon in slots A(via "monday"), B, C → "111"; tue only C →
    // "001"; wed only B → "010"
    assert(got(0) == ("111", "001", "010", "000"))
    // row 2: empty/null slots contribute 0; fri only slot C
    assert(got(1) == ("000", "000", "000", "001"))
  }

  test("bitmap width always equals slot count") {
    val maps = Availability.allDayBitmaps(rows.columns, "GMT-0600")
    val out = rows.withColumns(maps.toMap)
    val lens = out.select(org.apache.spark.sql.functions.length(
      org.apache.spark.sql.functions.col("availability_sun")))
      .as[Int].collect()
    assert(lens.forall(_ == 3))
  }
}
