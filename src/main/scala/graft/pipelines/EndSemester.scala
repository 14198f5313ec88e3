package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-semester pipeline (reference
  * `pipelines/end-semester-pipeline.py:50-64`, SURVEY.md §3.3): one
  * whole-table rollover — status := 'Deferred',
  * semesters_in_ibc += 1 — plus the affected-row count (A2).
  * A single narrow stage; no shuffle.
  */
object EndSemester {

  case class Result(consultants: DataFrame, affected: DataFrame)

  def run(consultants: DataFrame): Result = {
    val updated = consultants
      .withColumn("status", lit("Deferred"))
      // SQL "SET semesters_in_ibc = semesters_in_ibc + 1" leaves NULL
      // rows NULL (end-semester-pipeline.py:50-55) — no coalesce
      .withColumn("semesters_in_ibc", col("semesters_in_ibc") + 1)
    Result(updated, updated.agg(count(lit(1)).as("affected_rows")))
  }
}
