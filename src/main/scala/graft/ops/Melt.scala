package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide→long unpivot (SURVEY.md §2.4 R2): the reference turns 5 role
  * columns into up to 5 link rows per project, skipping NULLs, cf.
  * `pipelines/projects-pipeline.py:186-199,329-333`.
  *
  * Implemented with `stack` — a Generator that expands rows inside
  * whole-stage codegen, no shuffle and no UDTF.
  */
object Melt {

  /** Melt `valueCols` (label → column name) into (keyName, valName)
    * rows, keeping `idCols`, dropping null values. */
  def melt(df: DataFrame, idCols: Seq[String],
      valueCols: Seq[(String, String)], keyName: String,
      valName: String): DataFrame = {
    val stackArgs = valueCols
      .map { case (label, c) => s"'$label', $c" }.mkString(", ")
    df.select(idCols.map(col) :+
      expr(s"stack(${valueCols.size}, $stackArgs) AS ($keyName, $valName)"): _*)
      .filter(col(valName).isNotNull)
  }
}
