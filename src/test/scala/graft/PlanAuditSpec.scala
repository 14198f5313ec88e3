package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._

/** Catalog-wide plan audit: no `broadcast()` hint may sit over an
  * UNBOUNDED read of an sf-scaled table.
  *
  * The rule (r8 verdict): a `broadcast()` hint bypasses
  * `spark.sql.autoBroadcastJoinThreshold` with no fallback, so hinting
  * a frame whose cardinality grows with the corpus (customer is
  * 150k·SF, supplier 10k·SF, …) OOMs the driver at production scale.
  * The scale-safe treatment is NO hint — AQE broadcasts at runtime
  * while the side fits and falls back to a shuffled hash join beyond
  * the threshold. Hints stay legitimate on (a) genuinely fixed-size
  * dims (nation/region/part in this corpus) and (b) frames whose
  * cardinality was BOUNDED before the hint: an aggregate (key-bounded),
  * a limit, or an equi-join against such a bounded frame (the
  * `sampleQueryIds` pattern — |Q| rows by construction).
  *
  * This spec walks every catalog query's analyzed plan and fails on
  * any `ResolvedHint(BROADCAST)` whose subtree reaches an sf-scaled
  * scan with no cardinality-bounding node on the path. A negative
  * control proves the audit flags the exact pattern that was swept in
  * round 9 (q3/q5/q7/q_cube/q_grouping_sets).
  */
class PlanAuditSpec extends SparkSpec {

  /** Tables whose row count scales with the corpus (TESTDATA.md): the
    * fact tables plus customer/supplier, which TPC-H sizes at
    * 150k·SF / 10k·SF. region/nation/part are fixed-size here. */
  private val scaledTables = Set("lineitem", "orders", "customer",
    "supplier", "documents", "embeddings", "events")

  private def scaledLeaf(p: LogicalPlan): Option[String] = p match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.view.flatMap { rp =>
          scaledTables.find(t => rp.toString.endsWith(s"$t.parquet"))
        }.headOption
      case _ => None
    }
    case r: DataSourceV2Relation =>
      scaledTables.find(t => r.name.contains(s"$t.parquet"))
    case _ => None
  }

  /** Bounded cardinality for broadcast purposes: every path from this
    * node down to an sf-scaled scan passes through a bounding node.
    * Aggregates bound to their key space; limits bound absolutely; a
    * join bounds when the surviving side is bounded (inner equi-join
    * against a bounded id frame — the query-sample pattern). Leaves on
    * non-scaled tables (fixed dims, literal frames, temp outputs) are
    * bounded by definition of this audit. */
  private def bounded(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => true
    case _: GlobalLimit => true
    case _: LocalLimit => true
    case j: Join => j.joinType match {
      case Cross | FullOuter => bounded(j.left) && bounded(j.right)
      case Inner => bounded(j.left) || bounded(j.right)
      case LeftSemi | LeftAnti | LeftOuter => bounded(j.left)
      case RightOuter => bounded(j.right)
      case _ => bounded(j.left) && bounded(j.right)
    }
    case leaf: LeafNode => scaledLeaf(leaf).isEmpty
    case other => other.children.forall(bounded)
  }

  /** Violations in one query's analyzed plan: each unbounded
    * BROADCAST hint, described by the scaled tables it reaches. */
  private def violations(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.analyzed
    plan.collect {
      case h: ResolvedHint
          if h.hints.strategy.contains(BROADCAST) && !bounded(h.child) =>
        val tables = h.child.collectLeaves().flatMap(scaledLeaf).distinct
        s"broadcast hint over unbounded scan of ${tables.mkString(", ")}"
    }
  }

  test("no catalog query carries a broadcast hint over an unbounded " +
      "sf-scaled scan") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val vs =
          try violations(fn(spark, sf0001))
          catch { case e: Throwable =>
            Seq(s"query construction failed: ${e.getMessage}")
          }
        vs.map(v => s"$name: $v")
    }
    assert(bad.isEmpty, s"\nplan-audit violations:\n  ${bad.mkString("\n  ")}")
  }

  test("negative control: the audit flags a forced broadcast of a " +
      "corpus-scaled table") {
    val cust = Tables.customer(spark, sf0001).select("c_custkey")
    val df = Tables.orders(spark, sf0001)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderpriority").count()
    val vs = violations(df)
    assert(vs.nonEmpty && vs.head.contains("customer"), vs.toString)
  }

  test("negative control: aggregate / limit / id-join reductions stay " +
      "legitimate") {
    val li = Tables.lineitem(spark, sf0001)
    // aggregate of a fact table: key-bounded, hint allowed
    val agg = li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(violations(li.join(broadcast(agg), Seq("l_returnflag"))).isEmpty)
    // limit of a fact table: absolutely bounded
    val lim = li.select("l_orderkey").limit(10)
    assert(violations(li.join(broadcast(lim), Seq("l_orderkey"))).isEmpty)
    // inner equi-join against a limited id frame (sampleQueryIds shape)
    val restricted = li.join(lim, Seq("l_orderkey"))
    assert(violations(li.join(broadcast(restricted),
      li("l_linenumber") === restricted("l_linenumber"))).isEmpty)
  }
}
