package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structural specs for [[Similarity.kcenterSelect]] (greedy k-center
  * diverse-subset selection) and [[Similarity.mipsTopK]] (MIPS via
  * norm augmentation). The DuckDB oracle pins the exact outputs on
  * the test corpus; these tests pin the ALGORITHMIC properties on
  * controlled fixtures — one-center-per-cluster coverage, the
  * non-increasing greedy radius, the constant augmented norm that
  * makes the XBOX reduction sound, and MIPS recall against the
  * brute-force inner-product ground truth. */
class KcenterMipsSpec extends SparkSpec {

  private def vecDf(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("float")).as("embedding"))
  }

  test("kcenterSelect picks one center per well-separated cluster, " +
      "covers every point, and the greedy radius never increases") {
    // 4 clusters on distinct axes (scale 10), 3 jittered points each
    val pts = for {
      c <- 0 until 4
      j <- 0 until 3
    } yield {
      val base = Array.fill(8)(0.0)
      base(c) = 10.0
      base((c + 4) % 8) = 0.1 * j // jitter off-axis, within-cluster
      ((c * 3 + j).toLong, base.toSeq)
    }
    val out = Similarity.kcenterSelect(vecDf(pts), 4).collect()
    assert(out.length == 4)
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    // one center per cluster: the greedy farthest-point sweep cannot
    // pick two points of one cluster while another cluster is empty
    val clusters = out.map(_.getLong(1) / 3).toSet
    assert(clusters.size == 4, s"centers collapsed: $clusters")
    // full coverage
    assert(out.map(_.getLong(3)).sum == 12L)
    // greedy radius is non-increasing from round 2 on (round 1 is the
    // seed, radius 0 by construction)
    val radii = out.sortBy(_.getInt(0)).map(_.getDouble(2))
    assert(radii.head == 0.0)
    assert(radii.tail.zip(radii.tail.tail)
      .forall { case (a, b) => a >= b }, radii.toSeq.toString)
  }

  test("kcenterSelect fails fast with a clear message when the " +
      "corpus has fewer rows than k (not a mid-loop index error)") {
    val tiny = vecDf(Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0))))
    val e = intercept[IllegalArgumentException] {
      Similarity.kcenterSelect(tiny, 5)
    }
    assert(e.getMessage.contains("k=5") && e.getMessage.contains("2"),
      e.getMessage)
  }

  test("kcenterSelect releases its persisted projection — the SQL " +
      "cache is empty after the call returns (no per-invocation leak)") {
    spark.sharedState.cacheManager.clearCache()
    val out = Similarity.kcenterSelect(
      graft.Tables.embeddings(spark, sf0001), 4)
    assert(out.count() == 4)
    assert(spark.sharedState.cacheManager.isEmpty,
      "kcenterSelect left a cached frame behind")
  }

  test("mipsTopK: scores are the true raw inner products under the " +
      "synthetic norms, and bucketed recall@5 is positive against " +
      "brute-force MIPS ground truth") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val qids = Similarity.sampleQueryIds(emb, 16)
    val got = Similarity.mipsTopK(emb, qids, k = 5,
      numPlanes = 4, seed = 77L).collect()
    assert(got.nonEmpty)

    // ground truth: brute-force top-5 by inner product on the same
    // synthetic norms
    val rows = emb.select(col("vec_id"),
      col("embedding").cast("array<double>")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val scaled = rows.map { case (id, v) =>
      val w = 1.0 + (id % 5).toDouble
      (id, v.map(_ * w))
    }.toMap
    val qSet = qids.collect().map(_.getLong(0)).toSet
    def ip(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val truth = rows.filter(r => qSet.contains(r._1)).map {
      case (qid, qv) =>
        qid -> scaled.view.filterKeys(_ != qid).toSeq
          .map { case (nid, sv) =>
            (nid, BigDecimal(ip(qv, sv))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
          .sortBy { case (nid, s) => (-s, nid) }.take(5)
    }.toMap

    // every reported score is the exact (rounded) raw inner product
    got.foreach { r =>
      val (qid, nid, s) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val qv = rows.find(_._1 == qid).get._2
      val expect = BigDecimal(ip(qv, scaled(nid)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(s - expect) < 1e-9, s"($qid,$nid): $s vs $expect")
    }

    // recall@5 over queries that produced results
    val byQ = got.groupBy(_.getLong(0))
    val recalls = byQ.map { case (qid, rs) =>
      val gotIds = rs.map(_.getLong(1)).toSet
      val trueIds = truth(qid).map(_._1).toSet
      gotIds.intersect(trueIds).size.toDouble / trueIds.size
    }
    assert(recalls.sum / recalls.size > 0.0)
  }
}
