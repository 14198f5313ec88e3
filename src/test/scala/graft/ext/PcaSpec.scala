package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Power-iteration PCA: eigen-properties on the real corpus and a
  * constructed corpus with a planted dominant direction. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("planted dominant direction is recovered; pc1 is unit; evr " +
      "dominates the planted fraction") {
    // 200 vectors in R^8: strong variance along e0+e1 (normalized),
    // small deterministic noise elsewhere
    val dim = 8
    val rows = (0 until 200).map { k =>
      val t = (k % 21).toDouble - 10.0      // strong axis, var ~ 36
      val base = Array.fill(dim)(0.0)
      base(0) = t * math.sqrt(0.5)
      base(1) = t * math.sqrt(0.5)
      for (j <- 2 until dim)
        base(j) = ((k * (j + 3)) % 7 - 3).toDouble * 0.05   // tiny
      (k.toLong, base.map(_.toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = Pca.topComponent(df, dim = dim, iters = 12)
      .orderBy("dim").collect()
    assert(out.length == dim)
    val pc = out.map(_.getDouble(2))
    val lambda = out.head.getDouble(3)
    val evr = out.head.getDouble(4)
    // unit norm (up to micro rounding)
    val nrm = math.sqrt(pc.map(x => x * x).sum)
    assert(math.abs(nrm - 1.0) < 1e-3, s"‖pc1‖ = $nrm")
    // direction: |cos(pc1, u)| ≈ 1 for u = (√.5, √.5, 0, …)
    val cos = (pc(0) + pc(1)) * math.sqrt(0.5)
    assert(math.abs(math.abs(cos) - 1.0) < 1e-2, s"cos = $cos")
    // the planted axis carries almost all variance
    assert(evr > 0.95 && evr <= 1.0, s"evr = $evr")
    assert(lambda > 0.0)
  }

  test("two components by deflation: ordered eigenvalues, near-" +
      "orthogonal directions, both planted axes recovered, " +
      "cumulative evr dominates") {
    // two planted directions of different strength: e0 (var ~36)
    // and e3 (var ~9), tiny deterministic noise elsewhere
    val dim = 8
    val rows = (0 until 200).map { k =>
      val t = (k % 21).toDouble - 10.0
      val s = ((k / 3) % 11).toDouble - 5.0
      val base = Array.fill(dim)(0.0)
      base(0) = t
      base(3) = s
      for (j <- Seq(1, 2, 4, 5, 6, 7))
        base(j) = ((k * (j + 3)) % 7 - 3).toDouble * 0.03
      (k.toLong, base.map(_.toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = Pca.topComponents2(df, dim = dim, iters = 16)
      .orderBy("comp", "dim").collect()
    assert(out.length == 2 * dim)
    val c1 = out.take(dim)
    val c2 = out.drop(dim)
    val p1 = c1.map(_.getDouble(2))
    val p2 = c2.map(_.getDouble(2))
    val (l1, l2) = (c1.head.getDouble(3), c2.head.getDouble(3))
    assert(l1 >= l2 && l2 > 0, s"l1=$l1 l2=$l2")
    // near-orthogonal (deflation + micro rounding)
    val dot = p1.zip(p2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 5e-3, s"dot=$dot")
    // axes recovered: comp1 ≈ ±e0, comp2 ≈ ±e3
    assert(math.abs(math.abs(p1(0)) - 1.0) < 2e-2, p1.toSeq.toString)
    assert(math.abs(math.abs(p2(3)) - 1.0) < 2e-2, p2.toSeq.toString)
    // cumulative subspace share dominates and is consistent
    val evr1 = c1.head.getDouble(4)
    val cum2 = c2.head.getDouble(5)
    assert(cum2 >= evr1 && cum2 > 0.95 && cum2 <= 1.0 + 1e-6,
      s"evr1=$evr1 cum2=$cum2")
  }

  test("all-but-the-top: Pythagoras holds (orig² ≈ coef² + corr²) " +
      "and the correction can only shrink the centered norm") {
    val e = graft.Tables.embeddings(spark, sf0001)
    val out = Pca.allButTop(e).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val coef = r.getDouble(1)
      val orig = r.getDouble(2)
      val corr = r.getDouble(3)
      assert(corr <= orig + 1e-4, s"vec ${r.getLong(0)}: $corr > $orig")
      val lhs = orig * orig
      val rhs = coef * coef + corr * corr
      assert(math.abs(lhs - rhs) < 1e-2 * math.max(lhs, 1.0),
        s"vec ${r.getLong(0)}: orig²=$lhs vs coef²+corr²=$rhs")
    }
  }

  test("real corpus: Rayleigh residual is small (C·v ≈ λ·v) and evr " +
      "is a valid share") {
    val e = graft.Tables.embeddings(spark, sf0001)
    val out = Pca.topComponent(e).orderBy("dim").collect()
    assert(out.length == 64)
    val pc = out.map(_.getDouble(2))
    val lambda = out.head.getDouble(3)
    val evr = out.head.getDouble(4)
    assert(evr > 0.0 && evr <= 1.0, s"evr = $evr")
    // rebuild C in plain Scala (double precision) and check the
    // eigen-residual of the returned vector
    val X = e.filter(col("embedding").isNotNull)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = X.length
    val m = Array.tabulate(64)(j => X.map(_(j)).sum / n)
    val c = Array.tabulate(64, 64)((i, j) =>
      X.map(x => (x(i) - m(i)) * (x(j) - m(j))).sum / n)
    val cv = Array.tabulate(64)(i =>
      (0 until 64).map(j => c(i)(j) * pc(j)).sum)
    val resid = math.sqrt(
      cv.zip(pc).map { case (a, b) => val d = a - lambda * b; d * d }
        .sum)
    assert(resid < 0.05 * math.abs(lambda) + 1e-4,
      s"residual $resid vs lambda $lambda")
  }
}
