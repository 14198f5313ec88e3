package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small-label-propagation connected components over an edge list —
  * the transitive-closure step that turns pairwise near-duplicate
  * hits into dedup clusters (a pair list alone under-merges: A≈B and
  * B≈C must collapse A, B, C together).
  *
  * Pregel-style iteration: every node repeatedly adopts the minimum
  * component label in its neighborhood until a fixpoint. Each round is
  * one shuffle (join + groupBy min); the driver only evaluates the
  * convergence count. Label propagation converges in O(diameter)
  * rounds — near-dup graphs are unions of small cliques, so a handful
  * of rounds suffices; `maxIter` bounds the worst case.
  */
object ConnectedComponents {

  /** edges: (src, dst) undirected pairs. Returns (id, component) for
    * every node that appears in an edge; component = min node id in
    * the connected component. */
  def components(edges: DataFrame, src: String, dst: String,
      maxIter: Int = 15): DataFrame = {
    // materialize the working edge set once — it is referenced every
    // round, and without this the upstream pipeline that produced the
    // edges (e.g. the whole shingle+Jaccard computation) would be
    // re-executed per iteration
    val sym0 = edges.select(col(src).as("a"), col(dst).as("b"))
      .unionByName(edges.select(col(dst).as("a"), col(src).as("b")))
      .distinct()
      .localCheckpoint()
    // size the per-iteration shuffles to the edge working set, not to
    // the session default: a near-dup edge list is typically orders of
    // magnitude smaller than the corpus, and at the default width each
    // of the O(diameter) rounds pays full shuffle/scheduling overhead
    // for mostly-empty partitions (measured 10.3s → ~4s at sf0.1).
    // Large edge sets keep full parallelism (~100k edges/partition).
    val spark = edges.sparkSession
    val nEdges = sym0.count()
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      nEdges / 100000L + 1L)).toInt
    val sym = sym0.repartition(parts, col("a")).localCheckpoint()
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // each node's new label: min of its own and its neighbors'.
      // The node's own label rides through the aggregation (marked
      // `own`) so convergence is read off the aggregate itself — no
      // extra join-with-previous-labels shuffle per round.
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "a"), Seq("a"))
        .select(col("b").as("id"), col("comp"),
          lit(false).as("own"))
      val next = labels.withColumn("own", lit(true))
        .unionByName(neighborMin)
        .groupBy("id").agg(min(col("comp")).as("comp"),
          min(when(col("own"), col("comp"))).as("old_comp"))
        .localCheckpoint() // truncate the growing lineage per round
      val changes = next
        .filter(col("comp") =!= col("old_comp")).count()
      labels = next.select(col("id"), col("comp"))
      converged = changes == 0
      iter += 1
    }
    // a component whose diameter exceeds maxIter would silently get
    // wrong labels — fail loudly instead (the dedup-cluster oracle is
    // the true transitive closure, so a quiet non-convergence would
    // surface as an unexplained mismatch)
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge in $maxIter iterations; " +
        "raise maxIter (graph diameter exceeds it)")
    labels
  }
}
