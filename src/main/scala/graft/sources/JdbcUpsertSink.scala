package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.errors.DatabaseConnectionError
import graft.ops.Merge

/** Production JDBC sink for the reference's Cloud SQL Postgres target
  * (S3, cf. `/root/reference/pipelines/projects-pipeline.py:362-391`,
  * `staffing-roster-pipeline.py:255-300`).
  *
  * The reference opens one connection and issues 2–15 SQL round-trips
  * *per sheet row*. The Spark-native production shape is the
  * staging + server-side merge pattern:
  *
  *  1. the batch is bulk-written to a staging table with Spark's
  *     built-in JDBC writer — executors stream partitions in parallel
  *     (`numPartitions`/`batchsize` control fan-in), no driver
  *     materialization;
  *  2. ONE server-side set-based statement merges staging into the
  *     target (`INSERT … ON CONFLICT DO UPDATE` on Postgres, ANSI
  *     `MERGE INTO` elsewhere) inside a single transaction, then the
  *     staging table is dropped.
  *
  * Step 2 is idempotent — re-running a failed batch re-overwrites the
  * staging table and the merge converges to the same target state —
  * which is what replaces the reference's per-row
  * rollback-and-continue (E2). Change detection composes: pass a
  * [[graft.ops.Merge.merge]] output and only insert/update rows are
  * shipped (noop/keep rows never cross the wire).
  *
  * SQL generation is pure and unit-tested; the live path is exercised
  * only where a JDBC endpoint exists (none in this sandbox — see
  * SinksSpec for the generation contract).
  */
object JdbcUpsertSink {

  /** Connection coordinates. `options` passes through to the Spark
    * JDBC writer (driver, batchsize, numPartitions, …). */
  final case class JdbcTarget(
      url: String,
      table: String,
      user: String,
      password: String,
      options: Map[String, String] = Map.empty)

  /** Quoted SQL identifier (lower-cased names come straight from
    * DataFrame columns; quoting keeps reserved words safe). A
    * schema-qualified name quotes each dot-separated part —
    * `public.users` → `"public"."users"`. */
  private[sources] def q(ident: String): String = {
    require(!ident.contains("\""), s"illegal identifier: $ident")
    ident.split('.').map("\"" + _ + "\"").mkString(".")
  }

  /** Deterministic per-batch staging table name; a replayed batch id
    * overwrites the same staging table (idempotent retries). */
  def stagingTableFor(table: String, batchId: Long): String =
    s"${table}_staging_$batchId"

  /** Postgres upsert: one set-based statement for the whole batch.
    * Requires a unique index on `keys` (the reference's tables key on
    * email / user_id / project_name). Update set excludes the key
    * columns — the reference never updates the business key
    * (`staffing-roster-pipeline.py:170`). */
  def onConflictSql(target: String, staging: String,
      cols: Seq[String], keys: Seq[String]): String = {
    require(keys.nonEmpty && keys.forall(cols.contains),
      "keys must be a subset of cols")
    val updatable = cols.filterNot(keys.contains)
    val colList = cols.map(q).mkString(", ")
    val setList = updatable
      .map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")
    val action =
      if (updatable.isEmpty) "DO NOTHING"
      else s"DO UPDATE SET $setList"
    s"INSERT INTO ${q(target)} ($colList) " +
      s"SELECT $colList FROM ${q(staging)} " +
      s"ON CONFLICT (${keys.map(q).mkString(", ")}) $action"
  }

  /** ANSI `MERGE INTO` variant for targets without ON CONFLICT. */
  def ansiMergeSql(target: String, staging: String,
      cols: Seq[String], keys: Seq[String]): String = {
    require(keys.nonEmpty && keys.forall(cols.contains),
      "keys must be a subset of cols")
    val updatable = cols.filterNot(keys.contains)
    val onCond = keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
    val setList = updatable
      .map(c => s"t.${q(c)} = s.${q(c)}").mkString(", ")
    val insCols = cols.map(q).mkString(", ")
    val insVals = cols.map(c => s"s.${q(c)}").mkString(", ")
    val matched =
      if (updatable.isEmpty) ""
      else s"WHEN MATCHED THEN UPDATE SET $setList "
    s"MERGE INTO ${q(target)} t USING ${q(staging)} s ON $onCond " +
      matched +
      s"WHEN NOT MATCHED THEN INSERT ($insCols) VALUES ($insVals)"
  }

  def dropStagingSql(staging: String): String =
    s"DROP TABLE IF EXISTS ${q(staging)}"

  /** The statements run server-side after the staging write, in one
    * transaction. */
  def mergeScript(target: String, staging: String, cols: Seq[String],
      keys: Seq[String], dialect: String = "postgres"): Seq[String] = {
    val merge = dialect match {
      case "postgres" => onConflictSql(target, staging, cols, keys)
      case "ansi"     => ansiMergeSql(target, staging, cols, keys)
      case other => throw new IllegalArgumentException(
        s"unknown dialect: $other")
    }
    Seq(merge, dropStagingSql(staging))
  }

  /** Default executor: one driver-side connection, one transaction for
    * the whole script (the batch-level commit the reference approximates
    * with commit-at-end, minus its per-row rollback hazards). */
  private def execute(t: JdbcTarget)(script: Seq[String]): Unit = {
    val conn =
      try DriverManager.getConnection(t.url, t.user, t.password)
      catch { case e: Exception =>
        throw DatabaseConnectionError(
          s"Database connection failed: ${e.getMessage}")
      }
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try script.foreach(st.execute) finally st.close()
      conn.commit()
    } catch { case e: Exception =>
      try conn.rollback() catch { case _: Exception => () }
      throw e
    } finally conn.close()
  }

  /** Upsert `df` into `target.table` keyed on `keys`.
    *
    * If `df` carries a [[Merge.ActionCol]] column (i.e. it is a
    * [[graft.ops.Merge.merge]] output), only insert/update rows are
    * shipped — noop/keep rows are pruned before any bytes move.
    *
    * `runScript` defaults to the live JDBC execution; tests inject a
    * recorder. Returns the generated script (also handed to
    * `runScript`) so callers can log the exact server-side SQL. */
  def upsert(df: DataFrame, target: JdbcTarget, keys: Seq[String],
      batchId: Long = 0L, dialect: String = "postgres",
      runScript: Option[Seq[String] => Unit] = None): Seq[String] = {
    val payload =
      if (df.columns.contains(Merge.ActionCol))
        df.filter(col(Merge.ActionCol).isin("insert", "update"))
          .drop(Merge.ActionCol)
      else df
    val staging = stagingTableFor(target.table, batchId)
    // the writer gets the QUOTED name so the table it creates is
    // byte-identical to the one the merge script references (an
    // unquoted mixed-case name would be case-folded by the server)
    val writer = payload.write.format("jdbc")
      .option("url", target.url)
      .option("dbtable", q(staging))
      .option("user", target.user)
      .option("password", target.password)
      .options(target.options)
      .mode("overwrite")
    val script = mergeScript(target.table, staging,
      payload.columns.toSeq, keys, dialect)
    runScript match {
      case Some(run) => run(script) // test path: no live endpoint
      case None =>
        writer.save()
        execute(target)(script)
    }
    script
  }

  /** Structured-streaming adapter: upsert each micro-batch, staging
    * table keyed by `batchId` so a replayed epoch is idempotent.
    * Usage: `ds.writeStream.foreachBatch(foreachBatchUpsert(t, keys))`.
    * `runScript` injects a recorder in tests (same as [[upsert]]). */
  def foreachBatchUpsert(target: JdbcTarget, keys: Seq[String],
      dialect: String = "postgres",
      runScript: Option[Seq[String] => Unit] = None)
      : (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      upsert(batch, target, keys, batchId, dialect, runScript); ()
    }
}
