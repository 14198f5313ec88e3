package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting by DEGREE-ORDERED edge orientation —
  * the node-iterator++ / forward algorithm (Schank & Wagner, WEA'05
  * "Finding, Counting and Listing All Triangles in Large Graphs";
  * the same orientation MapReduce formulations use, cf. Suri &
  * Vassilvitskii, WWW'11). Triangle density is the standard cluster-
  * quality diagnostic over a near-dup pair graph: a dup COMPONENT
  * ([[ConnectedComponents]]) says "transitively linked", its triangle
  * count says how much of the component is pairwise-verified rather
  * than chained through a hub.
  *
  * Scale shape: each undirected edge is oriented from its lower
  * endpoint under the total order π = (degree, id) ascending. Every
  * node's OUT-degree under π is then at most O(√m) (a node of degree
  * d > √(2m) has fewer than √(2m) neighbors of larger degree —
  * the classic arboricity bound), so the wedge self-join fans out at
  * most Σ outdeg(u)² ≤ m·√(2m) candidate wedges TOTAL, versus the
  * Σ deg(u)² of the naive wedge join, which a single hub makes
  * quadratic. Wedges and edges carry only (long, long) ids; the close
  * check is one equi-join of the wedge frame against the undirected
  * edge list on the (lo, hi) pair key. No all-pairs shape anywhere.
  */
object Triangles {

  /** Per-node triangle participation counts over an UNDIRECTED simple
    * graph given as (src, dst) rows (any orientation, duplicates and
    * self-loops tolerated — normalized away first). Returns every
    * node that appears in an edge with its triangle count (0 for
    * triangle-free nodes), plus each node's degree — ordered output
    * is the caller's concern. */
  def triangleCounts(edges: DataFrame, src: String,
      dst: String): DataFrame = {
    // normalize: unordered (lo, hi) pairs, dedup, drop self-loops
    val und = edges.select(
        least(col(src), col(dst)).cast("long").as("lo"),
        greatest(col(src), col(dst)).cast("long").as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
      .localCheckpoint() // feeds degree, orientation, AND the close
                         // join — cut the upstream (pair-generation)
                         // lineage once, the PageRank treatment
    val nodes = und.select(col("lo").as("node"))
      .unionByName(und.select(col("hi").as("node"))).distinct()
    val deg = und.select(col("lo").as("node"))
      .unionByName(und.select(col("hi").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient each edge from the smaller endpoint under π = (deg, id)
    val dl = deg.select(col("node").as("lo"), col("deg").as("d_lo"))
    val dh = deg.select(col("node").as("hi"), col("deg").as("d_hi"))
    val oriented = und.join(dl, "lo").join(dh, "hi")
      .select(
        when(struct(col("d_lo"), col("lo")) <
            struct(col("d_hi"), col("hi")), col("lo"))
          .otherwise(col("hi")).as("u"),
        when(struct(col("d_lo"), col("lo")) <
            struct(col("d_hi"), col("hi")), col("hi"))
          .otherwise(col("lo")).as("v"))
    // wedges at apex u: unordered out-neighbor pairs, id-asymmetric
    // so each wedge is generated exactly once
    val wedges = oriented.alias("a")
      .join(oriented.alias("b"),
        col("a.u") === col("b.u") && col("a.v") < col("b.v"))
      .select(col("a.u").as("apex"),
        col("a.v").as("lo"), col("b.v").as("hi"))
    // close: the wedge legs are id-ordered, und is (lo, hi) keyed —
    // one equi-join decides membership regardless of orientation
    val tris = wedges.join(und, Seq("lo", "hi"))
    val perNode = tris
      .select(explode(array(col("apex"), col("lo"), col("hi")))
        .as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    nodes.join(perNode, Seq("node"), "left")
      .join(deg, "node")
      .select(col("node"), coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        col("deg"))
  }
}
