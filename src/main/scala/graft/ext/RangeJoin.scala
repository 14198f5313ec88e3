package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range (interval) join: pairs of rows whose timestamps fall
  * within a tolerance of each other.
  *
  * Spark plans a naive `|l.t - r.t| <= tol` predicate as a nested-loop
  * join (no equi key) — quadratic and a broadcast hazard. The scalable
  * composition buckets both sides into tolerance-width bands and
  * equi-joins on (key, band): every qualifying pair shares a band or
  * sits in adjacent bands, so expanding one side to its 3 candidate
  * bands (explode of a 3-element array) turns the range predicate into
  * a hash join plus a cheap residual filter. Work is
  * O(pairs-in-bands), one shuffle each side.
  */
object RangeJoin {

  /** Self-or-two-table interval join on an equi key + time tolerance.
    * Returns left columns + right columns (caller pre-aliases).
    * `toleranceUs` is in microseconds. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      toleranceUs: Long): DataFrame = {
    val band = (c: Column) =>
      (unix_micros(c) / toleranceUs).cast("long")
    // left expands to its band and both neighbors; right keeps one
    val l = left
      .withColumn("_band", explode(array(
        band(col(leftTs)) - 1, band(col(leftTs)), band(col(leftTs)) + 1)))
    val r = right.withColumn("_band", band(col(rightTs)))
    l.join(r, Seq(key, "_band"))
      .filter(abs(unix_micros(col(leftTs)) - unix_micros(col(rightTs)))
        <= toleranceUs)
      .drop("_band")
  }
}
