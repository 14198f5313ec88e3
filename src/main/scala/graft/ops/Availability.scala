package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's signature transform (SURVEY.md §2.4 R1): the
  * availability bitmap pivot, cf.
  * `pipelines/staffing-roster-pipeline.py:89-115`.
  *
  * Each half-hour slot is a sheet column holding a comma-separated
  * day-name list ("Monday, Wednesday"); the output is one fixed-width
  * '0'/'1' string per day with one character per slot, slots ordered by
  * the lexicographically sorted slot headers.
  *
  * Pure `Column` composition: `split` → `exists` HOF → `concat`. The
  * slot list comes from the DataFrame schema (driver side), mirroring
  * the reference's first-row-keys assumption — no data pass needed.
  */
object Availability {

  val DayNames: Seq[(String, String)] = Seq(
    "availability_mon" -> "monday", "availability_tue" -> "tuesday",
    "availability_wed" -> "wednesday", "availability_thu" -> "thursday",
    "availability_fri" -> "friday", "availability_sat" -> "saturday",
    "availability_sun" -> "sunday")

  /** Does a comma-separated day list mention `day` (case-insensitive,
    * trimmed)? Cf. `staffing-roster-pipeline.py:96-113`. */
  def slotMentionsDay(slot: Column, day: String): Column =
    exists(split(coalesce(slot, lit("")), ","),
      x => lower(trim(x)) === day.toLowerCase)

  /** Fixed bitmap width: the reference pre-allocates `['0'] * 30`
    * (staffing-roster-pipeline.py:93) and writes slot idx into it, so
    * the output is always exactly 30 chars regardless of how many slot
    * headers the sheet carries. */
  val BitmapWidth = 30

  /** One day's bitmask over the (pre-sorted) slot columns, right-padded
    * with '0' to the fixed 30-char width. More than 30 slots would
    * IndexError in the reference (write past the 30-slot list), so we
    * reject that case eagerly. */
  def dayBitmap(slotCols: Seq[Column], day: String): Column = {
    require(slotCols.size <= BitmapWidth,
      s"${slotCols.size} slot columns exceed the fixed $BitmapWidth-slot " +
        "bitmap (the reference raises IndexError past 30 slots)")
    val bits = slotCols.map(s =>
      when(slotMentionsDay(s, day), lit("1")).otherwise(lit("0")))
    rpad(if (bits.isEmpty) lit("") else concat(bits: _*),
      BitmapWidth, "0")
  }

  /** All 7 day bitmaps for a sheet frame whose slot headers contain
    * `slotMarker` (reference: "GMT-0600"). Returns (colName, expr)
    * pairs to attach with `withColumns`. */
  def allDayBitmaps(columns: Seq[String], slotMarker: String)
      : Seq[(String, Column)] = {
    val slots = columns.filter(_.contains(slotMarker)).sorted.map(col)
    DayNames.map { case (out, day) => out -> dayBitmap(slots, day) }
  }
}
