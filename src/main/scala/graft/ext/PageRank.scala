package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic fixed-iteration PageRank — the web-graph quality
  * signal corpus curation uses (rank-weighted sampling of crawled
  * pages), expressed as the same kind of engine-portable iterative
  * DataFrame program as the k-means fit in [[Similarity]] — except
  * that here even decimal sums are not portable enough (see
  * [[pagerank]]), so the whole fit runs in 64-bit integer
  * arithmetic, which both engines evaluate bit-identically.
  *
  * Scale shape: per iteration, one equi-join of the edge list with
  * the rank frame on src (AQE handles hub skew) and one
  * partial-combined aggregation on dst; ranks and degrees are
  * node-sized. The edge list and degree frame are loop-invariant and
  * checkpointed ONCE before the loop (same hazard
  * [[ConnectedComponents]] documents: otherwise every iteration
  * re-executes the upstream edge-building pipeline); per-iteration
  * `localCheckpoint` truncates the otherwise-geometric rank lineage.
  */
object PageRank {

  /** `edges` must be the directed edge list (src, dst) with every
    * node appearing as a src (symmetrize first for undirected graphs
    * — that also eliminates dangling nodes). Returns (node, pr_pico):
    * ranks in fixed-point PICO-units (rank × 10¹²), computed entirely
    * in 64-bit INTEGER arithmetic — `div` for the per-edge share and
    * the 0.85 damping (85·s div 100). Floating point appears nowhere:
    * a float formulation has measure-positive rounding ties here
    * (damping times a decimal-aligned rank lands exactly between
    * rounding steps), and Spark and DuckDB resolve those ties
    * differently at any precision (measured at digits 12 AND 6).
    * Integer division is bit-identical everywhere, and 10¹² of
    * headroom keeps the truncation error irrelevant (≤ deg·10⁻¹² per
    * node per iteration). */
  def pagerank(edges: DataFrame, iters: Int): DataFrame = {
    // loop-invariant: checkpoint the edge list once; deg and the node
    // count derive from the checkpoint, not the upstream pipeline.
    // SERIALIZED storage for the one corpus-sized frame (the r12
    // rule): the default deserialized blocks OOM'd the 1000× tpch
    // graph (~1B symmetrized edges of two longs ballooning to object
    // rows on an 80g heap, MemoryStore.putIteratorAsValues) — SER
    // packs them columnar-tight and spills cleanly. Storage level
    // never changes results.
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val nodes = deg.select(col("src").as("node"))
    val nRow = deg.agg(count(lit(1)).as("n"))
    var pr = nodes.crossJoin(broadcast(nRow))
      .select(col("node"), expr("1000000000000L div n").as("pr_pico"))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(pr.select(col("node").as("src"), col("pr_pico")), "src")
        .join(deg, "src")
        .select(col("dst").as("node"),
          expr("pr_pico div deg").as("c"))
      // LEFT join from the full node set: a node with no in-edges
      // keeps its 0.15/n baseline instead of silently vanishing (and
      // with it, its out-edges' contributions in later iterations)
      pr = nodes
        .join(contrib.groupBy(col("node")).agg(sum(col("c")).as("s")),
          Seq("node"), "left")
        .crossJoin(broadcast(nRow))
        .select(col("node"),
          expr("(150000000000L div n) + ((85 * coalesce(s, 0L)) div 100)")
            .as("pr_pico"))
        .localCheckpoint()
    }
    pr
  }
}
