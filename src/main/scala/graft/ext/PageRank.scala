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
  * Scale shape (the r12 layout rewrite — measured at the 1000× tpch
  * graph, ~1B symmetrized edges): the edge frame is materialized
  * ONCE as a dst-hash-partitioned SER checkpoint with the src degree
  * FOLDED IN, and each iteration joins the node-sized rank frame
  * into it by BROADCAST — a narrow join that preserves the layout's
  * partitioning, so the dst-aggregation that follows needs NO
  * exchange (alias-aware partitioning propagation, the same
  * layout-beats-shuffle move as [[Bfs.distancesIndexed]]). The loop
  * therefore shuffles NOTHING edge-sized: the previous shape
  * (edges ⋈ ranks shuffle join + dst aggregate) wrote two ~1B-row
  * exchanges per iteration and filled >65 GB of local shuffle
  * scratch at the 1000× tier — even with periodic-GC shuffle
  * reclamation — before this rewrite. Ranks and degrees are
  * node-sized; the broadcast is |nodes| rows per iteration (fine to
  * ~10⁸ nodes; beyond that the rank side would shuffle INTO the dst
  * layout, still node-sized, never edge-sized). Per-iteration
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
    // loop-invariant LAYOUT, built once: src degree folded into the
    // edge list (no per-iteration deg join) and the whole frame
    // hash-partitioned by dst before the checkpoint — every
    // iteration's contribution aggregate clusters on dst, so it runs
    // exchange-free on top of this layout. SERIALIZED storage for
    // the one corpus-sized frame (the r12 rule): the default
    // deserialized blocks OOM'd the 1000× tpch graph (~1B symmetrized
    // edges ballooning to object rows on an 80g heap,
    // MemoryStore.putIteratorAsValues) — SER packs them
    // columnar-tight and spills cleanly. Neither the storage level
    // nor the partitioning changes results (integer sums are
    // order-independent).
    val e0 = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val deg = e0.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    // PERSIST (not checkpoint) the layout: a localCheckpoint comes
    // back as a bare RDD scan with UnknownPartitioning — the planner
    // would re-exchange every iteration's aggregate, defeating the
    // layout (measured: the no-exchange GraphOpsSpec assertion fails
    // on the checkpointed form). The cached plan keeps its
    // `repartition(dst)` partitioning visible (Spark pins cached
    // output partitioning by default), the frame is loop-invariant so
    // cache reuse — not lineage truncation — is what the loop needs,
    // and SER storage keeps the blocks columnar-tight (the r12 rule).
    val e = e0.join(deg, "src")
      .repartition(col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // materialize the layout BEFORE planning the loop: the cached
    // plan is AQE-planned, and its output partitioning is only
    // exposed to downstream planning once the cache is built — an
    // unmaterialized cache reads as UnknownPartitioning and the
    // aggregate re-exchanges (the GraphOpsSpec plan assertion pins
    // the materialized shape)
    e.count()
    val nodes = deg.select(col("src").as("node"))
    val nRow = deg.agg(count(lit(1)).as("n"))
    var pr = nodes.crossJoin(broadcast(nRow))
      .select(col("node"), expr("1000000000000L div n").as("pr_pico"))
      .localCheckpoint()
    try {
      for (_ <- 1 to iters) {
        // broadcast the node-sized rank frame into the dst-partitioned
        // layout: narrow join, partitioning preserved through the
        // dst→node alias, dst aggregate exchange-free
        val contrib = e
          .join(broadcast(pr.select(col("node").as("src"),
            col("pr_pico"))), "src")
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
    } finally {
      // pr is checkpointed — the corpus-sized layout is reclaimed on
      // every exit path (the MvRefresh/Bfs reclamation rule: a failed
      // iteration must not strand edge-sized cache blocks)
      e.unpersist()
    }
    pr
  }
}
