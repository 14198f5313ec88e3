package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.queries.QueryUtil.{avgDec, sqlAvgDec}

/** Distributed PCA over the embedding corpus: top principal
  * component by deterministic power iteration — the embedding-space
  * diagnostic (anisotropy / dominant-direction analysis, cf. Mu &
  * Viswanath 2018 "All-but-the-Top") a curation pipeline runs before
  * trusting cosine similarity at scale.
  *
  * Scale shape: the ONLY corpus-sized pass builds the dim×dim
  * covariance — each row expands to its dim² centered outer-product
  * cells, which partial-aggregate map-side down to at most dim²
  * groups before the shuffle (the shuffle is matrix-sized, never
  * corpus-sized; no self-join on vec_id — the mean vector broadcasts
  * and centering is a per-row `zip_with`). Power iteration then runs
  * entirely on the tiny (i, j, c) covariance frame.
  *
  * Engine portability is by EXACT INTEGER arithmetic (the integer-
  * PageRank trick, not chained decimal quantization — iterating
  * double→DECIMAL(18,6) casts drifts between engines at 1e-4
  * magnitudes, measured): covariance entries and iterate components
  * live in 1e-6 micro-units as BIGINTs, the mat-vec product is an
  * exact integer sum (order-independent in any engine), squared
  * norms accumulate exactly in DECIMAL(38,0) (Spark) / HUGEINT
  * (DuckDB), and each iterate does ONE double step — w·1e6 / ‖w‖,
  * rounded back to integer micros — on bit-identical inputs. The
  * init vector is the exactly-representable uniform 0.125, so even
  * the eigenvector sign is reproducible. */
object Pca {

  private val Micro = 1000000L

  /** (dim, mean_v, pc1, lambda1, evr) — one row per dimension; the
    * Rayleigh-quotient eigenvalue and explained-variance ratio
    * repeat on every row so the result is one flat hashable table. */
  def topComponent(embeddings: DataFrame, dim: Int = 64,
      iters: Int = 12): DataFrame = {
    val emb = embeddings
      .select(Similarity.toDouble(col("embedding")).as("emb"))
      .filter(col("emb").isNotNull)
      .filter(coalesce(assert_true(size(col("emb")) === dim,
        lit(s"pca: embedding dim != $dim")), lit(true)))
    // per-dimension mean, rounded for engine portability, broadcast
    // back as ONE array row (no corpus self-join)
    val means = emb
      .select(posexplode(col("emb")).as(Seq("dim", "x")))
      .groupBy(col("dim")).agg(avgDec(col("x")).as("m"))
    val meanArr = means
      .agg(transform(array_sort(collect_list(struct(col("dim"),
        col("m")))), s => s("m")).as("m_arr"))
    // covariance in micro-units: the per-cell mean is a FIRST-level
    // decimal sum over raw double products (the portable sumDec
    // machinery), then snaps to an exact BIGINT. Deliberately the
    // FULL dim² cell matrix, not the symmetric triangle: an A/B at
    // sf0.1 measured the triangle variant (inner sequence(i, dim))
    // ~15% SLOWER — the constant-bound sequence constant-folds once
    // while a variable lower bound re-allocates per outer element,
    // costing more than the halved multiply count saves
    val cells = emb.crossJoin(broadcast(meanArr))
      .select(zip_with(col("emb"), col("m_arr"),
        (x, m) => x - m).as("c"))
      .select(explode(flatten(transform(
        sequence(lit(1), lit(dim)), i => transform(
          sequence(lit(1), lit(dim)), j => struct(
            (i - 1).as("i"), (j - 1).as("j"),
            (element_at(col("c"), i) * element_at(col("c"), j))
              .as("p")))))).as("cell"))
    val cov = cells
      .groupBy(col("cell.i").as("i"), col("cell.j").as("j"))
      .agg(round(avgDec(col("cell.p")) * Micro)
        .cast("long").as("ci"))
      .localCheckpoint()
    // LOCAL eigensolve on the collected dim² matrix — the MLlib
    // pattern (RowMatrix.computePrincipalComponents: distributed
    // Gramian, local eig). The matrix is scalar-sized; a first
    // implementation iterated it as 64-row DataFrames and paid a
    // job + localCheckpoint per round (~2s of pure scheduling at
    // sf0.1). Arithmetic replicates the engine semantics EXACTLY —
    // integer mat-vec in Long, BigInt squared norms (→ double by
    // round-to-nearest, same as the DECIMAL/HUGEINT casts), and
    // java BigDecimal HALF_UP for the one rounding step per
    // iterate, which is what Spark's round() does on doubles — so
    // the unchanged unrolled-CTE DuckDB oracle stays hash-green.
    def halfUpLong(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    def round6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val C = Array.ofDim[Long](dim, dim)
    cov.collect().foreach(r =>
      C(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    var v = Array.fill(dim)(Micro / 8)
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => C(i)(j) * v(j)).sum)
      val nrm = math.sqrt(
        w.map(x => BigInt(x) * BigInt(x)).sum.toDouble)
      v = w.map(wi => halfUpLong(wi.toDouble * Micro / nrm))
    }
    // Rayleigh quotient λ = vᵀCv / vᵀv and evr = λ / trace(C) —
    // numerators/denominators exact (the inner C·vᵢ product stays in
    // Long exactly as the engine formulation computed it)
    val num = (for (i <- 0 until dim; j <- 0 until dim)
      yield BigInt(C(i)(j) * v(i)) * v(j)).sum
    val den = v.map(x => BigInt(x) * BigInt(x)).sum
    val lambda1 = round6(num.toDouble / den.toDouble / Micro)
    val traceD = (0 until dim).map(i => C(i)(i)).sum.toDouble / Micro
    val evr = round6(lambda1 / traceD)
    val spark = embeddings.sparkSession
    import spark.implicits._
    val pcDf = v.toSeq.zipWithIndex
      .map { case (vv, i) => (i.toLong, vv.toDouble / Micro) }
      .toDF("pdim", "pc1")
    means
      .join(pcDf, col("dim").cast("long") === col("pdim"))
      .select(col("dim").cast("long").as("dim"), col("m").as("mean_v"),
        col("pc1"), lit(lambda1).as("lambda1"), lit(evr).as("evr"))
      .orderBy("dim")
  }

  /** All-but-the-Top embedding correction (Mu & Viswanath 2018):
    * remove the mean and the projection onto the dominant component
    * from every vector — the post-processing that makes cosine
    * similarity usable on anisotropic embedding spaces. Per vector:
    * the pc1 coefficient, the original norm, and the corrected norm
    * (what survives after the common direction is gone; a vector
    * that loses most of its norm carried little content signal).
    *
    * Scale shape: [[topComponent]]'s covariance pass plus ONE more
    * corpus scan — the correction itself is a per-row expression
    * against the broadcast (mean, pc1) pair; no shuffle beyond the
    * final order. Portability: same exact-integer recipe — centered
    * components quantize to BIGINT micros per element, the dot
    * product is an exact 64-term integer sum, and each corrected
    * component does one deterministic double step before snapping
    * back to micros. */
  def allButTop(embeddings: DataFrame, dim: Int = 64,
      iters: Int = 12): DataFrame = {
    val pc = topComponent(embeddings, dim, iters)
      .agg(transform(array_sort(collect_list(struct(col("dim"),
          col("mean_v"), col("pc1")))), s => s("mean_v")).as("m_arr"),
        transform(array_sort(collect_list(struct(col("dim"),
          col("pc1")))), s => round(s("pc1") * Micro).cast("long"))
          .as("p_arr"))
    val emb = embeddings
      .select(col("vec_id"), Similarity.toDouble(col("embedding"))
        .as("emb"))
      .filter(col("emb").isNotNull)
    val withC = emb.crossJoin(broadcast(pc))
      .select(col("vec_id"), col("p_arr"),
        zip_with(col("emb"), col("m_arr"),
          (x, m) => round((x - m) * Micro).cast("long")).as("c"))
    val num = aggregate(zip_with(col("c"), col("p_arr"),
      (ci, pi) => ci * pi), lit(0L), (acc, x) => acc + x)
    val corr = zip_with(col("c"), col("p_arr"), (ci, pi) =>
      round(ci.cast("double") -
        col("num").cast("double") * pi.cast("double") / lit(1e12))
        .cast("long"))
    val sumSq = (a: Column) => aggregate(transform(a, x => x * x),
      lit(0L), (acc, x) => acc + x)
    withC.withColumn("num", num)
      .withColumn("corr", corr)
      .select(col("vec_id"),
        round(col("num").cast("double") / lit(1e12), 6).as("pc1_coef"),
        round(sqrt(sumSq(col("c")).cast("double")) / Micro, 6)
          .as("orig_norm"),
        round(sqrt(sumSq(col("corr")).cast("double")) / Micro, 6)
          .as("corr_norm"))
      .orderBy("vec_id")
  }

  /** DuckDB oracle for [[allButTop]]. */
  def allButTopSql(dim: Int = 64, iters: Int = 12): String = {
    val top = topComponentSql(dim, iters)
    s"""WITH pcx AS MATERIALIZED ($top),
       |pc AS (SELECT list(mean_v ORDER BY dim) AS m_arr,
       |    list(CAST(round(pc1 * $Micro) AS BIGINT) ORDER BY dim)
       |      AS p_arr
       |  FROM pcx),
       |base AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |cc AS (SELECT vec_id, p_arr,
       |    list_transform(range(1, $dim + 1), i -> CAST(
       |      round((emb[i] - m_arr[i]) * $Micro) AS BIGINT)) AS c
       |  FROM base, pc),
       |dd AS (SELECT vec_id, c, p_arr,
       |    list_sum(list_transform(range(1, $dim + 1),
       |      i -> c[i] * p_arr[i])) AS num
       |  FROM cc),
       |ee AS (SELECT vec_id, num, c,
       |    list_transform(range(1, $dim + 1), i -> CAST(round(
       |      CAST(c[i] AS DOUBLE) -
       |      CAST(num AS DOUBLE) * CAST(p_arr[i] AS DOUBLE) / 1e12)
       |      AS BIGINT)) AS corr
       |  FROM dd)
       |SELECT vec_id,
       |  round(CAST(num AS DOUBLE) / 1e12, 6) AS pc1_coef,
       |  round(sqrt(CAST(list_sum(list_transform(c, x -> x * x))
       |    AS DOUBLE)) / $Micro, 6) AS orig_norm,
       |  round(sqrt(CAST(list_sum(list_transform(corr, x -> x * x))
       |    AS DOUBLE)) / $Micro, 6) AS corr_norm
       |FROM ee ORDER BY vec_id""".stripMargin
  }

  /** DuckDB oracle for [[topComponent]] — unrolled power iteration,
    * same exact-integer arithmetic (HUGEINT where Spark uses
    * DECIMAL(38,0); both are exact, both cast to the same double). */
  def topComponentSql(dim: Int = 64, iters: Int = 12): String = {
    val iterCtes = (1 to iters).map { r =>
      s"""w$r AS MATERIALIZED (SELECT i, sum(ci * vv) AS wv
         |  FROM cov JOIN v${r - 1} ON j = vi GROUP BY i),
         |n$r AS (SELECT sqrt(CAST(sum(CAST(wv AS HUGEINT) *
         |    CAST(wv AS HUGEINT)) AS DOUBLE)) AS nrm FROM w$r),
         |v$r AS MATERIALIZED (SELECT i AS vi, CAST(round(
         |    CAST(wv AS DOUBLE) * $Micro / (SELECT nrm FROM n$r))
         |    AS BIGINT) AS vv
         |  FROM w$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |means AS MATERIALIZED (SELECT dim, ${sqlAvgDec("x")} AS m FROM (
       |    SELECT unnest(emb) AS x,
       |      unnest(range(0, $dim)) AS dim FROM e)
       |  GROUP BY dim),
       |marr AS (SELECT list(m ORDER BY dim) AS m_arr FROM means),
       |cov AS MATERIALIZED (
       |  SELECT cell.i AS i, cell.j AS j,
       |    CAST(round(${sqlAvgDec("cell.p")} * $Micro) AS BIGINT) AS ci
       |  FROM (SELECT unnest(flatten(list_transform(range(1, $dim + 1),
       |      i -> list_transform(range(1, $dim + 1),
       |        j -> {'i': i - 1, 'j': j - 1, 'p': c[i] * c[j]}))))
       |      AS cell
       |    FROM (SELECT list_transform(range(1, $dim + 1),
       |        i -> emb[i] - m_arr[i]) AS c
       |      FROM e, marr))
       |  GROUP BY 1, 2),
       |v0 AS (SELECT DISTINCT i AS vi,
       |    CAST(${Micro / 8} AS BIGINT) AS vv FROM cov),
       |$iterCtes,
       |lam AS (SELECT round(
       |    CAST(sum(CAST(ci * a.vv AS HUGEINT) * b.vv) AS DOUBLE) /
       |    (SELECT CAST(sum(CAST(vv AS HUGEINT) * vv) AS DOUBLE)
       |      FROM v$iters) / $Micro, 6) AS lambda1
       |  FROM cov JOIN v$iters a ON i = a.vi JOIN v$iters b ON j = b.vi),
       |tr AS (SELECT CAST(sum(ci) AS DOUBLE) / $Micro AS trace
       |  FROM cov WHERE i = j)
       |SELECT CAST(dim AS BIGINT) AS dim, m AS mean_v,
       |  CAST(vv AS DOUBLE) / $Micro AS pc1,
       |  (SELECT lambda1 FROM lam) AS lambda1,
       |  round((SELECT lambda1 FROM lam) / (SELECT trace FROM tr), 6)
       |    AS evr
       |FROM means JOIN v$iters ON dim = vi
       |ORDER BY dim""".stripMargin
  }
}
