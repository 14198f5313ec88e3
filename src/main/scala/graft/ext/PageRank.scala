package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic fixed-iteration PageRank — the web-graph quality
  * signal corpus curation uses (rank-weighted sampling of crawled
  * pages), expressed as the same kind of engine-portable iterative
  * DataFrame program as the k-means fit in [[Similarity]]:
  * contributions are summed as exact decimals (order-independent
  * under partial aggregation) and each iteration's ranks are rounded,
  * so N unrolled iterations are bit-reproducible in ANSI SQL.
  *
  * Scale shape: per iteration, one equi-join of the edge list with
  * the rank frame on src (AQE handles hub skew) and one
  * partial-combined aggregation on dst; ranks and degrees are
  * node-sized, edges never materialize beyond the join stream.
  * `localCheckpoint` per iteration truncates the otherwise-geometric
  * plan lineage (as in the k-means fit).
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
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nRow = deg.agg(count(lit(1)).as("n"))
    var pr = deg.crossJoin(broadcast(nRow))
      .select(col("src").as("node"),
        expr("1000000000000L div n").as("pr_pico"))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(pr.select(col("node").as("src"), col("pr_pico")), "src")
        .join(deg, "src")
        .select(col("dst").as("node"),
          expr("pr_pico div deg").as("c"))
      pr = contrib.groupBy(col("node"))
        .agg(sum(col("c")).as("s"))
        .crossJoin(broadcast(nRow))
        .select(col("node"),
          expr("(150000000000L div n) + ((85 * s) div 100)")
            .as("pr_pico"))
        .localCheckpoint()
    }
    pr
  }
}
