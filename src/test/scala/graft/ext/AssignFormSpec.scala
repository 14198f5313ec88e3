package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** Pins the two physical forms of nearest-centroid assignment —
  * plan-literal LUT projection vs broadcast one-row LUT projection —
  * frame-identical for both metrics (rounded cosine, rounded squared
  * L2), including on deliberate ties. The public `assignClusters*`
  * gate picks between them by centroid count
  * (`AssignLutMaxCentroids`); correctness must not depend on which
  * side of the gate a corpus lands on. Also proves the broadcast-row
  * plan carries NO n-group aggregate and NO N·k expansion: its only
  * join is a broadcast nested-loop against a single-row frame.
  */
class AssignFormSpec extends SparkSpec {
  import spark.implicits._

  // 40 base vectors spread over 3 dims, plus two rows equidistant
  // from two centroids (exact tie → smallest cid must win in BOTH
  // forms).
  private lazy val base: DataFrame = {
    val rows = (0 until 40).map { i =>
      (i.toLong, Seq((i % 5).toDouble + 0.25, ((i * 3) % 7).toDouble,
        ((i * 5) % 11).toDouble))
    } ++ Seq(
      (100L, Seq(1.0, 1.0, 1.0)), // cosine 1.0 with BOTH cid 3 and
      (101L, Seq(2.0, 2.0, 2.0))) //   cid 5 (scalar multiples) → tie
    rows.toDF("vec_id", "emb")
  }

  private lazy val cents: DataFrame = Seq(
    (0, Seq(1.0, 0.0, 0.0)),
    (1, Seq(0.0, 1.0, 0.0)),
    (2, Seq(0.0, 0.0, 1.0)),
    (3, Seq(1.0, 1.0, 1.0)),
    (4, Seq(3.0, 1.0, 2.0)),
    (5, Seq(2.0, 2.0, 2.0))).toDF("cid", "centroid") // = 2·cid3:
      // cosine-identical to cid 3 for EVERY vector — a guaranteed tie

  private def collected(c: DataFrame): Seq[(Int, Seq[Double])] =
    c.select("cid", "centroid").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq))
      .sortBy(_._1).toSeq

  private def frame(df: DataFrame): Seq[(Long, Seq[Double], Int)] =
    df.select("vec_id", "emb", "cid")
      .as[(Long, Seq[Double], Int)].collect().sortBy(_._1).toSeq

  test("cosine: literal-LUT and broadcast-row forms are " +
      "frame-identical, ties resolve to the smallest cid in both") {
    val lut = frame(Similarity.assignClustersLut(base, collected(cents)))
    val bc = frame(Similarity.assignClustersBcast(base, cents))
    assert(lut == bc)
    // the deliberate cosine ties: rows 100/101 score exactly 1.0
    // against BOTH cid 3 and cid 5 → smallest cid (3) must win
    assert(lut.find(_._1 == 100L).get._3 == 3)
    assert(lut.find(_._1 == 101L).get._3 == 3)
    // and the public gate (5 centroids → literal side) agrees
    assert(frame(Similarity.assignClusters(base, cents)) == lut)
  }

  test("L2: literal-LUT and broadcast-row forms are frame-identical " +
      "and match a window-oracle argmin") {
    val lut = frame(Similarity.assignClustersL2Lut(base, collected(cents)))
    val bc = frame(Similarity.assignClustersL2Bcast(base, cents))
    assert(lut == bc)
    assert(frame(Similarity.assignClustersL2(base, cents)) == lut)
    // window oracle: row_number over (d2 ASC, cid ASC) = 1, with the
    // SAME rounded algebraic l2 (⟨a,a⟩−2⟨a,b⟩+⟨b,b⟩, round 6)
    import org.apache.spark.sql.expressions.Window
    def dot(x: org.apache.spark.sql.Column,
        y: org.apache.spark.sql.Column) =
      graft.functions.ArrayOps.dot_product(x, y)
    val d2 = round(dot(col("emb"), col("emb"))
      - lit(2) * dot(col("emb"), col("centroid"))
      + dot(col("centroid"), col("centroid")), 6)
    val w = Window.partitionBy("vec_id").orderBy(col("a_d2"), col("cid"))
    val oracle = frame(base.crossJoin(cents)
      .withColumn("a_d2", d2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "emb", "cid"))
    assert(lut == oracle)
  }

  test("broadcast-row plan: no aggregate over base rows, join is a " +
      "single-row broadcast nested loop") {
    val plan = Similarity.assignClustersBcast(base, cents)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"))
    // the only HashAggregate allowed is the k-row codebook collapse
    // (input = centroids); nothing aggregates the N base rows
    val aggLines = plan.linesIterator
      .filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.forall(l => !l.contains("vec_id")),
      s"base-side aggregate leaked into the assign plan:\n$plan")
  }

  test("above the gate the public form switches to broadcast-row and " +
      "stays frame-identical to the literal form") {
    // 1030 centroids of dim 3 — past AssignLutMaxCentroids (1024)
    val big = (0 until 1030).map { c =>
      (c, Seq((c % 13).toDouble + 0.5, (c % 7).toDouble,
        (c % 3).toDouble))
    }.toDF("cid", "centroid")
    val viaGate = frame(Similarity.assignClustersL2(base, big))
    val lut = frame(Similarity.assignClustersL2Lut(base, collected(big)))
    assert(viaGate == lut)
    val plan = Similarity.assignClustersL2(base, big)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "gate did not switch to the broadcast-row form")
  }
}
