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
    // bitmaps are always 30 chars (reference pre-allocates '0'*30,
    // staffing-roster-pipeline.py:93); the 3 fixture slots fill the
    // first 3 positions
    def pad(s: String) = s.padTo(30, '0')
    // row 1: mon in slots A(via "monday"), B, C → "111"; tue only C →
    // "001"; wed only B → "010"
    assert(got(0) == (pad("111"), pad("001"), pad("010"), pad("000")))
    // row 2: empty/null slots contribute 0; fri only slot C
    assert(got(1) == (pad("000"), pad("000"), pad("000"), pad("001")))
  }

  test("bitmap width is always the fixed 30 (reference '0'*30)") {
    val maps = Availability.allDayBitmaps(rows.columns, "GMT-0600")
    val out = rows.withColumns(maps.toMap)
    val lens = out.select(org.apache.spark.sql.functions.length(
      org.apache.spark.sql.functions.col("availability_sun")))
      .as[Int].collect()
    assert(lens.forall(_ == 30))
  }

  test("more than 30 slot headers is rejected (reference IndexErrors)") {
    val cols = (1 to 31).map(i => f"slot$i%02d GMT-0600")
    intercept[IllegalArgumentException] {
      Availability.allDayBitmaps(cols, "GMT-0600")
    }
  }
}
