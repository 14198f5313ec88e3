package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query
  * set against the candidate corpus; linear scan, no shuffle of the
  * corpus, scales to any corpus size at O(|Q|·|C|) work.
  *
  * Scale path: random-hyperplane LSH — each vector gets a compact
  * signature; only same-bucket pairs are scored. Planes are
  * deterministic literals baked into the plan (no fit step, no
  * driver state).
  */
object Similarity {

  /** Cosine similarity of two double arrays as a strict left-to-right
    * fold (deterministic accumulation order — see QueryUtil notes).
    * Uses the codegen'd [[graft.functions.DotProduct]] kernel; the
    * `aggregate(zip_with(...))` HOF formulation computes the same
    * value through an interpreted lambda per element (~10³× slower —
    * it dominated every ANN query's runtime). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      graft.functions.ArrayOps.dot_product(x, y)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Deterministic fixed-size query sample: the `n` vec_ids with the
    * smallest portable multiplicative hash (MINSTD multiplier, mod
    * 2^31−1; ties by vec_id). The input id is reduced mod 2^31−1
    * BEFORE the multiply so the product never overflows a 64-bit long
    * at any BIGINT id — overflow would wrap silently in Spark but
    * raise in other engines, breaking oracle parity. A fixed n keeps
    * any eval built on the sample O(n·|C|) regardless of corpus size
    * (the production recall-eval recipe); the orderBy+limit compiles
    * to a per-partition top-n (TakeOrderedAndProject) — no global
    * sort shuffle. */
  def sampleQueryIds(base: DataFrame, n: Int): DataFrame =
    base.select(col("vec_id"),
        pmod(pmod(col("vec_id"), lit(2147483647L)) * lit(48271L),
          lit(2147483647L)).as("_h"))
      .orderBy(col("_h"), col("vec_id"))
      .limit(n)
      .select(col("vec_id"))

  /** Shared top-k ranking: score every (query, candidate) pair fed in
    * and keep the k best per query, ties by neighbor_id. Scores are
    * rounded before ranking so the ordering is reproducible
    * cross-engine. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos_sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Brute-force cosine top-k: for each query vector (chosen by
    * `isQuery`), the k most similar other vectors. The predicate may
    * select a corpus-proportional query set, so the scorer join
    * carries NO broadcast hint here — Spark's size estimate picks the
    * nested-loop build side at runtime (q8/q18 treatment: a forced
    * broadcast of a corpus-scaled q would OOM the driver). */
  def bruteForceTopK(embeddings: DataFrame, isQuery: Column, k: Int)
      : DataFrame = {
    val base = embeddings.select(col("vec_id"),
      toDouble(col("embedding")).as("emb"))
    val q = base.filter(isQuery)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    bruteCore(base, q, k, hintQ = false)
  }

  /** [[bruteForceTopK]] with the query set given as an id frame
    * (single `vec_id` column, e.g. from [[sampleQueryIds]]) instead of
    * a predicate — the fixed-|Q| shape. The id frame is tiny by
    * construction → broadcast equi-join to attach embeddings, and the
    * bounded q frame is safe to hint into the scorer. */
  def bruteForceTopK(embeddings: DataFrame, queryIds: DataFrame, k: Int)
      : DataFrame = {
    val base = embeddings.select(col("vec_id"),
      toDouble(col("embedding")).as("emb"))
    val q = base.join(broadcast(queryIds), Seq("vec_id"))
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    bruteCore(base, q, k, hintQ = true)
  }

  private def bruteCore(base: DataFrame, q: DataFrame, k: Int,
      hintQ: Boolean): DataFrame =
    rankTopK(
      base.join(if (hintQ) broadcast(q) else q,
          col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          round(cosine(col("q_emb"), col("emb")), 6).as("cos_sim")), k)

  /** Int8-quantized brute-force top-k: the bandwidth-bound variant of
    * [[bruteForceTopK]]. Vectors are quantized once to the 72-byte
    * int8 form ([[graft.functions.QuantizeOps.quantize_i8]] — 8-byte
    * scale header + one signed byte per dim) and ALL downstream work
    * runs on the codes: the broadcast query frame ships ~7× fewer
    * bytes than `array<double>` rows, the per-pair score is one exact
    * integer dot product, and per-vector scales cancel out of cosine
    * so no de-scaling is needed. Norms are computed once per vector
    * before the join (never per pair). Scores are the quantized
    * cosine — deterministic (integer dots are exact, the float tail
    * is one sqrt/divide/round) and engine-portable, so the entry is
    * hash-verified like the exact ANN family; SimilaritySpec bounds
    * its drift from exact cosine and its recall@k against brute
    * force. NULL embeddings are dropped on both sides (round-5 NULL
    * policy). */
  def int8TopK(embeddings: DataFrame, isQuery: Column, k: Int)
      : DataFrame = {
    val base = int8Base(embeddings)
    val q = base.filter(isQuery).select(col("vec_id").as("query_id"),
      col("qv").as("q_qv"), col("qn").as("q_qn"))
    int8Core(base, q, k)
  }

  /** [[int8TopK]] with the query set given as an id frame (single
    * `vec_id` column, e.g. from [[sampleQueryIds]]) — the fixed-|Q|
    * shape: total work O(|Q|·|C|) stays linear in the corpus. */
  def int8TopK(embeddings: DataFrame, queryIds: DataFrame, k: Int)
      : DataFrame = {
    val base = int8Base(embeddings)
    val q = base.join(broadcast(queryIds), Seq("vec_id"))
      .select(col("vec_id").as("query_id"),
        col("qv").as("q_qv"), col("qn").as("q_qn"))
    int8Core(base, q, k)
  }

  /** Quantized corpus frame shared by the int8 scorers: (vec_id, qv,
    * qn). Three drops, mirrored in every int8 oracle: NULL embeddings;
    * vectors a NULL element poisoned to a NULL code (they would emit
    * k rows ranked purely by neighbor_id — the failure mode the
    * [[hardNegatives]] NULL policy exists for); and zero-norm vectors
    * (qn = 0 divides to NULL in Spark but NaN/±inf under DuckDB's
    * IEEE float division — a hash-parity trap; a zero vector has no
    * cosine direction to rank anyway). In SQL the single `qn > 0`
    * predicate covers the last two: a NULL-element code yields NULL
    * qn, and NULL > 0 filters out. */
  private def int8Base(embeddings: DataFrame): DataFrame = {
    import graft.functions.QuantizeOps._
    embeddings.select(col("vec_id"),
        toDouble(col("embedding")).as("emb"))
      .filter(col("emb").isNotNull)
      .select(col("vec_id"), quantize_i8(col("emb")).as("qv"))
      .filter(col("qv").isNotNull)
      .withColumn("qn", sqrt(dot_i8(col("qv"), col("qv")).cast("double")))
      .filter(col("qn") > 0)
  }

  private def int8Core(base: DataFrame, q: DataFrame, k: Int): DataFrame = {
    import graft.functions.QuantizeOps._
    rankTopK(
      base.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          round(dot_i8(col("q_qv"), col("qv")).cast("double") /
            (col("q_qn") * col("qn")), 6).as("cos_sim")), k)
  }

  /** Hard-negative mining for contrastive training: for each query
    * (anchor) vector, the k most cosine-similar vectors carrying a
    * DIFFERENT label — close to the anchor in embedding space but of
    * another class, the negatives that actually move a contrastive
    * loss. Brute-force form over a small anchor set (same broadcast
    * argument as [[bruteForceTopK]]); the scale-path claim — label
    * exclusion is a post-filter on the candidate stream — is shipped
    * code, not prose: [[hardNegativesIvfInt8]] composes it with the
    * IVF × int8 pruned stream. */
  def hardNegatives(embeddings: DataFrame, isQuery: Column, k: Int)
      : DataFrame = {
    val base = hardNegBase(embeddings)
    val q = base.filter(isQuery)
      .select(col("vec_id").as("query_id"),
        col("label").as("q_label"), col("emb").as("q_emb"))
    hardNegCore(base, q, k)
  }

  /** [[hardNegatives]] with the anchor set given as an id frame
    * (single `vec_id` column, e.g. from [[sampleQueryIds]]) — the
    * fixed-|Q| baseline shape: the broadcast anchor frame is bounded
    * by construction and total work is O(|Q|·|C|), linear in the
    * corpus. The production scale path is [[hardNegativesIvfInt8]],
    * which also prunes the per-anchor candidate scan. */
  def hardNegatives(embeddings: DataFrame, queryIds: DataFrame, k: Int)
      : DataFrame = {
    val base = hardNegBase(embeddings)
    val q = base.join(broadcast(queryIds), Seq("vec_id"))
      .select(col("vec_id").as("query_id"),
        col("label").as("q_label"), col("emb").as("q_emb"))
    hardNegCore(base, q, k)
  }

  // NULL embeddings drop (same policy as lshTopK/semDedup): a NULL
  // anchor scores NULL against everything and would emit k rows
  // ranked purely by neighbor_id — semantically meaningless
  // negatives; a NULL neighbor could likewise enter a sparse top-k
  private def hardNegBase(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), col("label"),
        toDouble(col("embedding")).as("emb"))
      .filter(col("emb").isNotNull)

  private def hardNegCore(base: DataFrame, q: DataFrame, k: Int)
      : DataFrame = {
    val scored = base.join(broadcast(q),
        col("vec_id") =!= col("query_id") &&
        col("label") =!= col("q_label"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("label").as("neg_label"),
        round(cosine(col("q_emb"), col("emb")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos_sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Hard-negative mining on the IVF × int8 production path — the
    * scale-safe composition [[hardNegatives]]' scaladoc promises:
    * label exclusion rides the SAME pruned candidate stream as
    * [[ivfTopKInt8]] instead of a per-anchor full corpus scan.
    *
    * Two-level exclusion: (1) probe selection drops the anchor's own
    * label partition BEFORE ranking — an IVF partition is exactly one
    * label here, so probing it would yield only excluded candidates
    * (wasted nprobe slots and, for nprobe=1, an empty result);
    * (2) the candidate stream keeps the `label =!= q_label`
    * post-filter, the composition SURVEY §8 describes — redundant
    * given (1) for the label-quantizer, but load-bearing the moment
    * the coarse quantizer is k-means (a cluster then mixes labels).
    *
    * Scale shape = [[ivfTopKInt8]] exactly: one persisted corpus
    * scan, exact-decimal centroids quantized with the portable
    * formula, broadcast-pruned probes (only |Q|·nprobe partition
    * keys), int8 scoring on every pair. Total work
    * O(|Q|·(k_clusters + nprobe·|C|/k_clusters)) — corpus-linear,
    * nothing corpus-sized broadcasts. Hash-verified like the IVF
    * family (the DuckDB oracle reproduces both quantization levels
    * bit-for-bit). */
  def hardNegativesIvfInt8(embeddings: DataFrame, queryIds: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    import graft.functions.QuantizeOps._
    val base0 = embeddings.select(col("vec_id"), col("label"),
        toDouble(col("embedding")).as("emb"))
      .filter(col("emb").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cq = quantizedLabelCentroids(base0)
    val base = int8LabelBase(base0)
    val q = base.join(broadcast(queryIds), Seq("vec_id"))
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("qv").as("q_qv"), col("qn").as("q_qn"))
    val probes = q.crossJoin(broadcast(cq))
      .filter(col("label") =!= col("q_label"))
      .select(col("query_id"), col("q_label"), col("q_qv"), col("q_qn"),
        col("label"),
        round(dot_i8(col("q_qv"), col("c_qv")).cast("double") /
          (col("q_qn") * col("c_qn")), 6).as("c_sim"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(desc("c_sim"), asc("label"))
    val probed = probes.withColumn("prn", row_number().over(wq))
      .filter(col("prn") <= nprobe)
      .select(col("query_id"), col("q_label"), col("q_qv"), col("q_qn"),
        col("label"))
    val topk = rankTopK(
      base.join(broadcast(probed), Seq("label"))
        .filter(col("vec_id") =!= col("query_id") &&
          col("label") =!= col("q_label"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          col("label").as("neg_label"),
          round(dot_i8(col("q_qv"), col("qv")).cast("double") /
            (col("q_qn") * col("qn")), 6).as("cos_sim")), k)
    val out = topk.localCheckpoint()
    base0.unpersist()
    out
  }

  /** Deterministic pseudo-random hyperplanes: numPlanes × dim doubles
    * from a seeded JVM PRNG, shipped as plan literals. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-of-projection LSH bucket id (one int per vector).
    *
    * Reference composition, kept for the kernel-equivalence spec and
    * for readers: the production paths below use the
    * [[graft.functions.HyperplaneBuckets]] kernel, which computes the
    * identical bucket ids (same left-to-right IEEE dots, same bit
    * layout) without inlining planes × dim literals into the plan —
    * at auto-p scale the literal composition's analysis + Janino
    * compile dominated cold runs (~100 s at sf0.01 vs ~1 s warm). */
  def lshBucket(emb: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (plane, i) =>
      val proj = graft.functions.ArrayOps.dot_product(emb,
        typedLit(plane))
      when(proj > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: score only within the query's bucket. Trades
    * recall for a |C|/2^planes candidate reduction; the corpus shuffle
    * is a single hash partition on the bucket id. */
  def lshTopK(embeddings: DataFrame, isQuery: Column, k: Int,
      numPlanes: Int, seed: Long, dim: Int = 64): DataFrame = {
    val base = lshBase(embeddings, numPlanes, seed, dim)
    val q = base.filter(isQuery)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        col("bucket").as("q_bucket"))
    lshCore(base, q, k)
  }

  /** [[lshTopK]] with the query set given as an id frame (single
    * `vec_id` column, e.g. from [[sampleQueryIds]]) — the fixed-|Q|
    * shape; the id frame broadcasts. */
  def lshTopK(embeddings: DataFrame, queryIds: DataFrame, k: Int,
      numPlanes: Int, seed: Long, dim: Int): DataFrame = {
    val base = lshBase(embeddings, numPlanes, seed, dim)
    val q = base.join(broadcast(queryIds), Seq("vec_id"))
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        col("bucket").as("q_bucket"))
    lshCore(base, q, k)
  }

  // same null-drop + dim fail-fast as cosineDupPairs: a mismatch
  // would NULL every projection and collapse the corpus into one
  // bucket (silent brute force)
  private def lshBase(embeddings: DataFrame, numPlanes: Int, seed: Long,
      dim: Int): DataFrame =
    embeddings.select(col("vec_id"),
        toDouble(col("embedding")).as("emb"))
      .filter(col("emb").isNotNull)
      .filter(coalesce(assert_true(size(col("emb")) === dim,
        lit(s"lshTopK: embedding dim != $dim")), lit(true)))
      .withColumn("bucket", graft.functions.HyperplaneBuckets(
        col("emb"), Seq(hyperplanes(numPlanes, dim, seed))).getItem(0))

  private def lshCore(base: DataFrame, q: DataFrame, k: Int): DataFrame =
    rankTopK(
      base.join(broadcast(q),
          col("bucket") === col("q_bucket") &&
          col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          round(cosine(col("q_emb"), col("emb")), 6).as("cos_sim")), k)

  /** Multi-probe LSH top-k (Lv et al. 2007): beyond the query's own
    * bucket, probe the buckets reached by flipping the sign bits the
    * query is CLOSEST to (smallest |projection| — the planes where a
    * near neighbor most plausibly landed on the other side). The
    * standard recall lever at fixed plane count: `nProbe` buckets
    * searched instead of 2^planes-more tables or fewer planes, so
    * candidate volume grows by ≤ nProbe× while recall approaches the
    * OR-construction's at a fraction of the index size.
    *
    * Scale shape is [[lshTopK]]'s: the corpus side keys on its ONE
    * precomputed bucket id; only the tiny (query × nProbe) probe
    * frame replicates — the corpus is never re-bucketed or re-keyed
    * per probe. Probe order ties (equal |projection|) break by plane
    * index; every margin is one IEEE dot + abs, so the probe SET is
    * engine-reproducible and the operator carries a full DuckDB
    * oracle (probe selection replayed with a rank over the same
    * margins).
    *
    * `nProbe` = 1 degrades to exactly [[lshTopK]]. */
  def lshMultiProbeTopK(embeddings: DataFrame, queryIds: DataFrame,
      k: Int, numPlanes: Int, nProbe: Int, seed: Long, dim: Int)
      : DataFrame = {
    require(nProbe >= 1 && nProbe <= numPlanes + 1,
      s"nProbe $nProbe outside 1..${numPlanes + 1}")
    val base = lshBase(embeddings, numPlanes, seed, dim)
    val planes = hyperplanes(numPlanes, dim, seed)
    val q = base.join(broadcast(queryIds), Seq("vec_id"))
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        col("bucket").as("q_bucket"))
    // (|projection|, bit) per plane; array_sort orders by margin
    // then bit — the flip sequence, cheapest boundary first
    val margins = planes.zipWithIndex.map { case (p, i) =>
      struct(abs(graft.functions.ArrayOps.dot_product(col("q_emb"),
        typedLit(p))).as("m"), lit(1 << i).as("bit"))
    }
    val probes = q.withColumn("flip",
        slice(array_sort(array(margins: _*)), 1, nProbe - 1))
      .select(col("query_id"), col("q_emb"),
        explode(concat(array(col("q_bucket")),
          transform(col("flip"),
            f => col("q_bucket").bitwiseXOR(f.getField("bit")))))
          .as("p_bucket"))
    rankTopK(
      base.join(broadcast(probes),
          col("bucket") === col("p_bucket") &&
          col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          round(cosine(col("q_emb"), col("emb")), 6).as("cos_sim")), k)
  }

  /** Maximum-inner-product search (MIPS) via norm augmentation
    * (Bachrach et al. 2014, "XBOX"): when corpus vectors carry
    * meaningful NORMS (recommendation scores, popularity-weighted
    * embeddings), top-k by inner product ≠ top-k by cosine, and
    * angular LSH cannot index it directly. The reduction appends one
    * coordinate `√(M² − ‖v‖²)` to every corpus vector (M = max corpus
    * norm) and `0` to the query — inner-product order in the original
    * space becomes cosine order in the augmented space, so the
    * existing sign-projection LSH buckets (over dim+1 planes) serve
    * as the candidate generator. Candidates are then ranked by the
    * EXACT raw inner product.
    *
    * The corpus here is the unit-norm embedding table given
    * deterministic synthetic norms `w = 1 + (vec_id mod 5)` — the
    * shape a popularity-weighted deployment has.
    *
    * Scale shape: identical to [[lshTopK]] — the corpus is bucketed
    * once (narrow projection; the 1-row max-norm frame broadcasts),
    * candidates come from a bucket equi-join against the broadcast
    * |Q|-row query frame, and no pair outside the query's bucket is
    * ever scored. */
  def mipsTopK(embeddings: DataFrame, queryIds: DataFrame, k: Int,
      numPlanes: Int, seed: Long, dim: Int = 64): DataFrame = {
    def dot(x: Column, y: Column): Column =
      graft.functions.ArrayOps.dot_product(x, y)
    val base0 = embeddings.select(col("vec_id"),
        toDouble(col("embedding")).as("emb"))
      .filter(col("emb").isNotNull)
    val scaled = base0.select(col("vec_id"),
      transform(col("emb"), x =>
        x * (lit(1.0) + pmod(col("vec_id"), lit(5L)).cast("double")))
        .as("sv"))
    val m2 = scaled.agg(max(dot(col("sv"), col("sv"))).as("m2"))
    val planes = hyperplanes(numPlanes, dim + 1, seed)
    val bucketed = scaled.crossJoin(broadcast(m2))
      .select(col("vec_id"), col("sv"),
        graft.functions.HyperplaneBuckets(
          concat(col("sv"), array(sqrt(greatest(lit(0.0),
            col("m2") - dot(col("sv"), col("sv")))))),
          Seq(planes)).getItem(0).as("bucket"))
    val q = base0.join(broadcast(queryIds), Seq("vec_id"))
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        graft.functions.HyperplaneBuckets(
          concat(col("emb"), array(lit(0.0))),
          Seq(planes)).getItem(0).as("q_bucket"))
    val scored = bucketed.join(broadcast(q),
        col("bucket") === col("q_bucket") &&
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(dot(col("q_emb"), col("sv")), 6).as("ip"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("ip"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs — the vector-space member
    * of the dedup family (exact / Jaccard / MinHash / SimHash /
    * cosine): all pairs with cosine ≥ `threshold`, found via
    * multi-table hyperplane LSH blocking (OR-construction: `tables`
    * independent tables of `planesPerTable` planes each; a pair is a
    * candidate if it shares any table's bucket) and then exactly
    * verified. Miss probability (1−(1−θ/π)^b)^T — e.g. 8 tables × 2
    * planes ≈ 1.3% at cos 0.45.
    *
    * Scale shape mirrors [[Dedup.jaccardPairs]]: the bucket self-join
    * ships only (vec_id, table, bucket); embeddings + precomputed
    * norms reattach by id equi-join; per-(table,pair) duplicates are
    * NOT deduplicated before verification (verification is one
    * broadcast-join dot product — cheaper than a 10⁷-row distinct
    * shuffle; the tiny passing set dedups at the end). */
  def cosineDupPairs(embeddings: DataFrame, threshold: Double,
      tables: Int, planesPerTable: Int, seed: Long,
      dim: Int = 64): DataFrame = {
    def dot(x: Column, y: Column): Column =
      graft.functions.ArrayOps.dot_product(x, y)
    // feeds three plan subtrees (bucket keying + both reattaches) —
    // persist like Dedup.jaccardPairs so the scan+norm runs once.
    // NULL embeddings are dropped (they can never pair — pre-guard
    // they bucketed to 0 and verified to null cos_sim, i.e. were
    // dropped late); non-null rows fail fast on a dim mismatch:
    // hyperplanes are generated at `dim`, and dot_product would
    // otherwise NULL-out every projection, collapsing all vectors
    // into one bucket with no visible error. assert_true is kept
    // alive by the filter (a dropped column would be pruned).
    val base = embeddings.select(col("vec_id"),
        toDouble(col("embedding")).as("emb"))
      .filter(col("emb").isNotNull)
      .filter(coalesce(assert_true(size(col("emb")) === dim,
        lit(s"cosineDupPairs: embedding dim != $dim")), lit(true)))
      .withColumn("norm", sqrt(dot(col("emb"), col("emb"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one kernel call yields every table's bucket id — plan size is
    // independent of tables × planes (vs the literal composition,
    // whose codegen dominated cold runs at auto-p plane counts)
    val keyed = base.select(col("vec_id"),
      posexplode(graft.functions.HyperplaneBuckets(col("emb"),
        (0 until tables).map(t =>
          hyperplanes(planesPerTable, dim, seed + t)))))
      .withColumnRenamed("pos", "table")
      .withColumnRenamed("col", "bucket")
    val cand = keyed.alias("a").join(keyed.alias("b"),
        col("a.table") === col("b.table") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
    val ea = base.select(col("vec_id").as("vec_a"), col("emb").as("emb_a"),
      col("norm").as("norm_a"))
    val eb = base.select(col("vec_id").as("vec_b"), col("emb").as("emb_b"),
      col("norm").as("norm_b"))
    // no broadcast hint: the optimizer broadcasts while base is small
    // and falls back to an id-partitioned shuffle join at scale
    val pairs = cand.join(ea, "vec_a").join(eb, "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(dot(col("emb_a"), col("emb_b")) /
          (col("norm_a") * col("norm_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .distinct()
    // The passing pair set is orders smaller than the corpus:
    // materialize it once (localCheckpoint) and release the cached
    // base immediately, instead of leaking the persist until the
    // caller's frame is GC'd (long-lived sessions accumulate blocks).
    val out = pairs.localCheckpoint()
    base.unpersist()
    out
  }

  /** [[cosineDupPairs]] in its SCALE-SAFE parameterization: the
    * hyperplane count per table is derived from the corpus so the
    * bucket count tracks n (2^planes ≈ n / targetBucketSize) and the
    * per-bucket pair enumeration Σ|b|² stays ≈ n·targetBucketSize —
    * LINEAR in the corpus. With planes fixed (the hash-verified
    * `d_embed_dups` shape: 2 planes = 4 buckets per table) bucket
    * population grows with n and the self-join is quadratic: at the
    * 100× probe (200k vectors) 4 buckets/table means ~50k vectors per
    * bucket ≈ 10^10 candidate pairs per table — unrunnable, the exact
    * failure mode the deep probe caught. Growing planes with log n
    * keeps per-table candidate generation sparse while the
    * OR-construction over `tables` independent tables retains
    * near-dup recall (miss probability for a pair at angle θ is
    * (1−(1−θ/π)^p)^T — e.g. at cos 0.9, p=12, T=8: <6%; borderline
    * pairs near the threshold lose more, which is the documented
    * recall/cost trade every LSH blocking makes). Rows-only by
    * contract, like [[semDedupAuto]]: the oracle SQL inlines plane
    * literals, whose count auto-p by definition doesn't fix;
    * SimilaritySpec asserts auto ≡ explicit at the derived p. */
  def cosineDupPairsAuto(embeddings: DataFrame, threshold: Double,
      tables: Int, targetBucketSize: Long, seed: Long,
      dim: Int = 64): DataFrame = {
    require(targetBucketSize >= 1, "targetBucketSize must be >= 1")
    // bounded driver-side scalar (count), same pattern as semDedupAuto
    val n = embeddings.filter(col("embedding").isNotNull).count()
    val buckets = math.max(2L,
      (n + targetBucketSize - 1) / targetBucketSize)
    val planes = math.max(1,
      math.min(24, 64 - java.lang.Long.numberOfLeadingZeros(buckets - 1)))
    cosineDupPairs(embeddings, threshold, tables, planes, seed, dim)
  }

  /** Semantic (embedding-level) benchmark decontamination — the
    * embedding-space complement of the lexical 5-gram gate
    * (`d_decontaminate`): paraphrased or lightly-rewritten eval items
    * share no 5-grams with their corpus source but still sit at high
    * cosine, which is how modern decontamination actually audits a
    * pretraining corpus (cf. SemDeDup's cross-split variant). The
    * `isEval` predicate splits the embedded corpus into the held-out
    * eval set and the training side; candidate pairs are generated
    * ONLY across the split, through the same multi-table hyperplane
    * buckets as [[cosineDupPairs]] (one kernel call, all tables),
    * then exact-cosine verified at `threshold`. Output: one verdict
    * row per eval vector — match count, best similarity (NULL when
    * clean), contaminated flag.
    *
    * Scale shape: the eval side is a benchmark — constant-sized while
    * the corpus grows — so the bucket join degenerates to "probe the
    * corpus's bucket index with a tiny key set" (the
    * `d_incremental_minhash` ingest-gate shape; the optimizer
    * broadcasts the eval side on its own). Per-bucket work is
    * |E_b|·|C_b| with |E_b| bounded by the eval set; raising planes
    * with log n bounds |C_b| exactly as [[cosineDupPairsAuto]]
    * argues. Only ids and bucket keys shuffle; vectors reattach by id
    * for the verified candidates. */
  def embedDecontaminate(embeddings: DataFrame, isEval: Column,
      threshold: Double, tables: Int, planesPerTable: Int, seed: Long,
      dim: Int = 64): DataFrame = {
    def dot(x: Column, y: Column): Column =
      graft.functions.ArrayOps.dot_product(x, y)
    // same base guards as cosineDupPairs (NULL embeddings can never
    // pair; dim mismatch fails fast), plus the eval flag computed
    // once from the caller's predicate
    val base = embeddings.withColumn("_eval", isEval)
      .select(col("vec_id"), col("_eval"),
        toDouble(col("embedding")).as("emb"))
      .filter(col("emb").isNotNull)
      .filter(coalesce(assert_true(size(col("emb")) === dim,
        lit(s"embedDecontaminate: embedding dim != $dim")), lit(true)))
      .withColumn("norm", sqrt(dot(col("emb"), col("emb"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keyed = base.select(col("vec_id"), col("_eval"),
      posexplode(graft.functions.HyperplaneBuckets(col("emb"),
        (0 until tables).map(t =>
          hyperplanes(planesPerTable, dim, seed + t)))))
      .withColumnRenamed("pos", "table")
      .withColumnRenamed("col", "bucket")
    // cross-split candidates only: eval × corpus within a bucket
    val cand = keyed.filter(col("_eval")).alias("a")
      .join(keyed.filter(!col("_eval")).alias("b"),
        col("a.table") === col("b.table") &&
        col("a.bucket") === col("b.bucket"))
      .select(col("a.vec_id").as("eval_id"),
        col("b.vec_id").as("corpus_id"))
      .distinct()
    val ea = base.select(col("vec_id").as("eval_id"),
      col("emb").as("emb_a"), col("norm").as("norm_a"))
    val eb = base.select(col("vec_id").as("corpus_id"),
      col("emb").as("emb_b"), col("norm").as("norm_b"))
    val hits = cand.join(ea, "eval_id").join(eb, "corpus_id")
      .select(col("eval_id"), col("corpus_id"),
        round(dot(col("emb_a"), col("emb_b")) /
          (col("norm_a") * col("norm_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
    val perEval = hits.groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n_matches"), max(col("cos_sim")).as("best_sim"))
    val out = base.filter(col("_eval"))
      .select(col("vec_id").as("eval_id"))
      .join(perEval, Seq("eval_id"), "left")
      .select(col("eval_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("best_sim"),
        col("n_matches").isNotNull.as("contaminated"))
      .localCheckpoint()
    base.unpersist()
    out
  }

  /** Deterministic Lloyd's k-means over an embedding frame
    * (`vec_id`, `emb`): seeds are the `k` smallest vec_ids, every
    * iteration assigns by rounded cosine (ties → smallest cluster id)
    * and recomputes centroids with order-independent decimal sums —
    * so the fit is bit-reproducible across runs, partitionings, AND
    * engines (the DuckDB oracle unrolls the same iterations).
    *
    * The centroid mean is deliberately NOT rounded: `decimal-sum →
    * double → ÷ count` is one IEEE division of identical inputs —
    * bit-identical in both engines — whereas `round(mean, 6)` was a
    * cross-engine divergence point. A 6-decimal-quantized sum divided
    * by a count with only 2/5 prime factors terminates EXACTLY on a
    * 7th-decimal half (e.g. S=0.105872/2 = .0529355…ish), where
    * Spark (HALF_UP on the exact binary expansion) and DuckDB
    * (scaled-multiply round) legitimately disagree — observed once
    * across 4096 means in the m=16 PQ fit. Cluster counts are small,
    * so such counts are common; dropping the round removes the
    * entire hazard class instead of shrinking it.
    * Distributed shape: assignment is a broadcast cross join (k tiny),
    * the update is the same explode-by-dimension aggregation as
    * [[ivfTopK]] — no driver-side collect anywhere. */
  def kmeansCentroids(base: DataFrame, k: Int, iters: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seedW = Window.orderBy("vec_id")
    var centroids = base.orderBy("vec_id").limit(k)
      .withColumn("cid", (row_number().over(seedW) - 1).cast("int"))
      .select(col("cid"), col("emb").as("centroid"))
    // Iteration barriers (round 15): in LUT mode (k within the plan-
    // literal gate) the assignment COLLECTS the centroid frame anyway
    // and embeds it as literals, so lineage is flat by construction —
    // per-iteration truncation was a redundant materialization job
    // (the collect itself executes each update plan exactly once).
    // Past the gate (k ∝ N shapes) the broadcast-row assignment keeps
    // the plan chained, so every iteration still truncates via Ckpt.
    // Either path executes each Lloyd update exactly once; results
    // are bit-identical (AssignFormSpec pins Lut ≡ Bcast).
    // Final state (round 16): in LUT mode the fitted frame returns as
    // a LocalRelation ([[asLocalRelation]]) instead of a checkpoint —
    // consumers collect/broadcast it job-free; reliable mode keeps
    // Ckpt (durable-placement opt-in, CkptSpec).
    val lutMode = k <= AssignLutMaxCentroids
    val localFinish = lutMode && !reliableMode(base)
    for (i <- 0 until iters) {
      val assigned =
        if (lutMode) assignClustersLut(base, collectedSorted(centroids))
        else assignClustersBcast(base, centroids)
      centroids = assigned
        .select(col("cid"), posexplode(col("emb")).as(Seq("dim", "v")))
        .groupBy(col("cid"), col("dim"))
        .agg((graft.queries.QueryUtil.sumDec(col("v")) /
          count(lit(1))).as("cv"))
        .groupBy(col("cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("cv")))),
          x => x("cv")).as("centroid"))
      if (i == iters - 1)
        centroids =
          if (localFinish) asLocalRelation(centroids)
          else Ckpt(centroids)
      else if (!lutMode) centroids = Ckpt(centroids)
    }
    centroids
  }

  /** Bounded collect of a ≤[[AssignLutMaxCentroids]]-row centroid
    * frame in [[assignClustersLut]]'s (cid-sorted) input form. */
  private def collectedSorted(centroids: DataFrame)
      : Seq[(Int, Seq[Double])] =
    centroids.select(col("cid"), col("centroid")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq))
      .sortBy(_._1).toSeq

  /** True when the session has opted into durable loop-state
    * placement ([[Ckpt.ModeKey]] = reliable) — the LUT-mode local
    * finishes below then keep routing through [[Ckpt]] so the opt-in
    * still produces its recoverable files. */
  private def reliableMode(df: DataFrame): Boolean =
    df.sparkSession.conf.get(Ckpt.ModeKey, "local") == "reliable"

  /** FINAL-STATE placement for a LUT-gated fit frame (round 16): the
    * bounded rows collect once and re-enter as a LocalRelation —
    * exactly the rows a [[Ckpt]] would have materialized, but every
    * downstream consumer that COLLECTS or BROADCASTS the frame
    * ([[pqAssign]]'s bounded collect, [[assignClusters]]' probe, the
    * ADC-LUT / probe broadcasts) now reads local rows instead of
    * launching a block-scan job (`LocalTableScanExec.executeCollect`
    * is job-free). Data rides as relation ROWS, never as expression
    * literals, so the plan-size pathology documented at
    * [[assignSubClusters]] cannot arise; values are the collected
    * doubles unchanged, so results are bit-identical (the same
    * argument as the LUT-mode assignment forms). Only call under a
    * static row bound (the LUT gate) and never in reliable mode. */
  private def asLocalRelation(df: DataFrame): DataFrame = {
    val rows = df.collect()
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }

  /** Centroid-count gate for the plan-LITERAL projection assignment:
    * up to this many centroids the codebook collects driver-side and
    * embeds as plan-literal lookup arrays (two `typedLit`s — one
    * Literal node each, whole-stage codegen, no join node at all);
    * beyond it the literal itself becomes task-binary weight (k·dim
    * doubles serialized into every task) and the assignment switches
    * to the broadcast one-row LUT form — still a per-row projection
    * over the same candidate array (no N·k row expansion, no N-group
    * argmin/argmax aggregate), but the arrays arrive via a broadcast
    * single-row cross join instead of the plan. Every catalog k
    * (8–80) and the PQ fits (m·kSub ≤ 512) sit far under the gate;
    * the k ∝ N paths (auto-k semdedup, the ingest gate's coarse
    * quantizer) cross it at large corpora and take the broadcast-row
    * form. */
  private val AssignLutMaxCentroids = 1024

  /** The (a_sim, −cid, cid) candidate struct both cosine-assignment
    * forms rank with — ONE definition so the two physical shapes can
    * never drift. `array_max` over it orders by similarity then
    * smallest cid: identical semantics to `row_number() OVER (ORDER
    * BY a_sim DESC, cid ASC) = 1`. */
  private def cosCand(emb: Column)(c: Column, id: Column): Column =
    struct(round(cosine(emb, c), 6).as("a_sim"),
      (-id).as("neg_cid"), id.as("cid"))

  /** Plan-literal projection form of [[assignClusters]] — centroids
    * already collected and sorted by cid. */
  private[graft] def assignClustersLut(base: DataFrame,
      sorted: Seq[(Int, Seq[Double])]): DataFrame = {
    val centLut: Column = typedLit(sorted.map(_._2))
    val cidLut: Column = typedLit(sorted.map(_._1))
    base.select(col("vec_id"), col("emb"),
      array_max(zip_with(centLut, cidLut, cosCand(col("emb"))))
        .getField("cid").as("cid"))
  }

  /** Broadcast one-row LUT form of [[assignClusters]] — the k ∝ N
    * shape. The codebook aggregates to a SINGLE row of two arrays
    * (sorted by cid, so candidate order matches the literal form),
    * broadcast and cross-joined: every base row sees the same arrays
    * and runs the IDENTICAL `array_max(zip_with(…))` projection as
    * the literal form — no N·k row expansion, no N-group argmax
    * aggregate (the shape that spilled at the 1000× tier, r12
    * pqAssign finding), no k·dim plan literal. The only moving data
    * is one k·dim-double broadcast row. */
  private[graft] def assignClustersBcast(base: DataFrame,
      centroids: DataFrame): DataFrame = {
    val lutRow = broadcast(centroids
      .agg(array_sort(collect_list(struct(col("cid"), col("centroid"))))
        .as("_lut"))
      .select(transform(col("_lut"), e => e("centroid")).as("_cent_lut"),
        transform(col("_lut"), e => e("cid")).as("_cid_lut")))
    base.crossJoin(lutRow)
      .select(col("vec_id"), col("emb"),
        array_max(zip_with(col("_cent_lut"), col("_cid_lut"),
          cosCand(col("emb")))).getField("cid").as("cid"))
  }

  /** Nearest-centroid assignment by rounded cosine, ties broken by
    * cluster id — deterministic and SQL-mirrorable: equal
    * similarities resolve to the smallest cid, identical semantics to
    * `row_number() OVER (ORDER BY a_sim DESC, cid ASC) = 1`.
    *
    * Physical shape (the r12 pqAssign finding, measured at the 1000×
    * tier): ALWAYS a per-row projection over the candidate array —
    * never the broadcast-join + N-group argmax aggregate, which is
    * what SPILLS once N·k outgrows executor memory (it cost the PQ
    * build ~1.7× at 2M vectors). For bounded k
    * (≤ [[AssignLutMaxCentroids]]) the codebook embeds as plan
    * literals ([[assignClustersLut]], whole-stage codegen); above the
    * gate it arrives as one broadcast row ([[assignClustersBcast]]),
    * keeping tasks and plans small at k ∝ N. Both forms rank with the
    * SHARED [[cosCand]] struct on the same collected doubles in the
    * same cid order — bit-identical, AssignFormSpec pins frame
    * equality — so the DuckDB oracles verify either physical shape
    * unchanged. */
  def assignClusters(base: DataFrame, centroids: DataFrame): DataFrame = {
    val local = centroids.select(col("cid"), col("centroid"))
      .limit(AssignLutMaxCentroids + 1).collect()
    if (local.length > AssignLutMaxCentroids)
      assignClustersBcast(base, centroids)
    else
      assignClustersLut(base, local
        .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq))
        .sortBy(_._1).toSeq)
  }

  /** Rounded squared-L2 distance between two double arrays, in the
    * algebraic form `⟨a,a⟩ − 2⟨a,b⟩ + ⟨b,b⟩` — three [[cosine]]-style
    * codegen dot products and one fixed combination, so Spark and the
    * DuckDB oracle evaluate the IDENTICAL float expression tree
    * (an element-wise `Σ(aᵢ−bᵢ)²` would accumulate differently and
    * break hash parity). No division anywhere: L2 assignment is
    * well-defined even for zero-norm subvectors, which is why the PQ
    * fit uses it rather than cosine. */
  private def l2sq(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      graft.functions.ArrayOps.dot_product(x, y)
    round(dot(a, a) - lit(2) * dot(a, b) + dot(b, b), 6)
  }

  /** Nearest-centroid assignment under rounded squared-L2 — the
    * [[assignClusters]] sibling for L2 fits, with the same
    * literal-vs-broadcast-row projection gate and the same bit parity
    * argument: ties resolve by distance then smallest cid, identical
    * semantics to `row_number() OVER (ORDER BY d2 ASC, cid ASC) = 1`
    * in the oracle, in either physical form. */
  def assignClustersL2(base: DataFrame, centroids: DataFrame): DataFrame = {
    val local = centroids.select(col("cid"), col("centroid"))
      .limit(AssignLutMaxCentroids + 1).collect()
    if (local.length > AssignLutMaxCentroids)
      assignClustersL2Bcast(base, centroids)
    else
      assignClustersL2Lut(base, local
        .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq))
        .sortBy(_._1).toSeq)
  }

  /** The (a_d2, cid) candidate struct both L2-assignment forms rank
    * with — `array_min` over it = distance-then-smallest-cid. */
  private def l2Cand(emb: Column)(c: Column, id: Column): Column =
    struct(l2sq(emb, c).as("a_d2"), id.as("cid"))

  /** Plan-literal projection form of [[assignClustersL2]]. */
  private[graft] def assignClustersL2Lut(base: DataFrame,
      sorted: Seq[(Int, Seq[Double])]): DataFrame = {
    val centLut: Column = typedLit(sorted.map(_._2))
    val cidLut: Column = typedLit(sorted.map(_._1))
    base.select(col("vec_id"), col("emb"),
      array_min(zip_with(centLut, cidLut, l2Cand(col("emb"))))
        .getField("cid").as("cid"))
  }

  /** Broadcast one-row LUT form of [[assignClustersL2]] — see
    * [[assignClustersBcast]] for the shape argument. */
  private[graft] def assignClustersL2Bcast(base: DataFrame,
      centroids: DataFrame): DataFrame = {
    val lutRow = broadcast(centroids
      .agg(array_sort(collect_list(struct(col("cid"), col("centroid"))))
        .as("_lut"))
      .select(transform(col("_lut"), e => e("centroid")).as("_cent_lut"),
        transform(col("_lut"), e => e("cid")).as("_cid_lut")))
    base.crossJoin(lutRow)
      .select(col("vec_id"), col("emb"),
        array_min(zip_with(col("_cent_lut"), col("_cid_lut"),
          l2Cand(col("emb")))).getField("cid").as("cid"))
  }

  /** [[kmeansCentroids]] under squared-L2 assignment (the textbook
    * k-means objective and the metric PQ codebooks are trained with):
    * same smallest-vec_id seeding, same order-independent decimal-sum
    * centroid updates, same per-iteration lineage truncation — so the
    * fit is bit-reproducible across runs, partitionings, AND engines
    * and the DuckDB oracle can unroll it. */
  def kmeansCentroidsL2(base: DataFrame, k: Int, iters: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seedW = Window.orderBy("vec_id")
    var centroids = base.orderBy("vec_id").limit(k)
      .withColumn("cid", (row_number().over(seedW) - 1).cast("int"))
      .select(col("cid"), col("emb").as("centroid"))
    // same barrier + final-state structure as [[kmeansCentroids]]
    // (see its note)
    val lutMode = k <= AssignLutMaxCentroids
    val localFinish = lutMode && !reliableMode(base)
    for (i <- 0 until iters) {
      val assigned =
        if (lutMode)
          assignClustersL2Lut(base, collectedSorted(centroids))
        else assignClustersL2Bcast(base, centroids)
      centroids = assigned
        .select(col("cid"), posexplode(col("emb")).as(Seq("dim", "v")))
        .groupBy(col("cid"), col("dim"))
        .agg((graft.queries.QueryUtil.sumDec(col("v")) /
          count(lit(1))).as("cv"))
        .groupBy(col("cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("cv")))),
          x => x("cv")).as("centroid"))
      if (i == iters - 1)
        centroids =
          if (localFinish) asLocalRelation(centroids)
          else Ckpt(centroids)
      else if (!lutMode) centroids = Ckpt(centroids)
    }
    centroids
  }

  /** Greedy k-center (farthest-point traversal, Gonzalez 1985)
    * diverse-subset selection — the curation op that picks a maximally
    * spread sample of an embedding corpus (coreset seeding, eval-set
    * selection, k-means++-style init). Seeded by the smallest
    * portable-hash vec_id (the [[sampleQueryIds]] MINSTD order); each
    * round adds the point FARTHEST from the selected set under the
    * rounded squared-L2 of [[assignClustersL2]] (ties by vec_id), and
    * the output reports each center's selection radius — the greedy
    * 2-approximation of the optimal k-center cost — plus how many
    * corpus points it covers.
    *
    * Scale shape: k passes over the corpus. Each pass is a narrow
    * projection (min distance to ≤k PLAN-LITERAL centers — no join, no
    * shuffle) followed by `orderBy(...).limit(1)`, which compiles to a
    * per-partition top-1 (TakeOrderedAndProject): one row per
    * partition moves. The driver holds exactly k centers (k·dim
    * doubles). The final coverage pass is the same narrow projection
    * plus a map-side-combined count. Total O(kN) — the cost floor for
    * the greedy guarantee; FAISS seeds coarse quantizers the same way.
    */
  def kcenterSelect(embeddings: DataFrame, k: Int): DataFrame =
    kcenterSelectImpl(embeddings, k, materialize = true)

  /** [[kcenterSelect]] WITHOUT persist/localCheckpoint — the k driver
    * passes recompute the projection, but the returned frame keeps
    * its full parquet lineage for the scan audit (the public path
    * severs it: localCheckpoint is what lets `base` unpersist).
    * Tests only. */
  private[graft] def kcenterSelectPlan(embeddings: DataFrame,
      k: Int): DataFrame =
    kcenterSelectImpl(embeddings, k, materialize = false)

  private def kcenterSelectImpl(embeddings: DataFrame, k: Int,
      materialize: Boolean): DataFrame = {
    require(k >= 1, "k-center needs at least one center")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val baseLazy = embeddings.select(col("vec_id"),
        toDouble(col("embedding")).as("emb"))
    val base = if (materialize)
      baseLazy.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else baseLazy
    // k passes reuse `base`; a corpus smaller than k would exhaust the
    // isin-filtered argmax mid-loop (empty collect) — fail fast with
    // the actual counts instead of an ArrayIndexOutOfBoundsException.
    val n = base.count()
    require(n >= k,
      s"k-center needs at least k=$k corpus rows, found $n")
    def dot(x: Column, y: Column): Column =
      graft.functions.ArrayOps.dot_product(x, y)
    // distance of the corpus row's emb to one plan-literal center —
    // the exact [[l2sq]] expression shape, so the oracle can replay it
    def dLit(c: Seq[Double]): Column = {
      val ca = array(c.map(lit): _*)
      round(dot(col("emb"), col("emb")) - lit(2) * dot(col("emb"), ca)
        + dot(ca, ca), 6)
    }
    val seed = base.select(col("vec_id"), col("emb"),
        pmod(pmod(col("vec_id"), lit(2147483647L)) * lit(48271L),
          lit(2147483647L)).as("_h"))
      .orderBy(col("_h"), col("vec_id")).limit(1)
      .select(col("vec_id"), col("emb")).collect()(0)
    var centers = Vector(
      (seed.getLong(0), seed.getSeq[Double](1).toVector, 0.0))
    for (_ <- 2 to k) {
      val sel = centers.map(_._1)
      val minD = centers.map(c => dLit(c._2)).reduce(least(_, _))
      val nxt = base.filter(!col("vec_id").isin(sel: _*))
        .select(col("vec_id"), col("emb"), minD.as("d"))
        .orderBy(desc("d"), asc("vec_id")).limit(1).collect()(0)
      centers = centers :+ ((nxt.getLong(0),
        nxt.getSeq[Double](1).toVector, nxt.getDouble(2)))
    }
    val centersDf = centers.zipWithIndex.map { case ((id, emb, r), i) =>
      (i + 1, id, emb, r)
    }.toDF("sel_order", "vec_id", "center", "radius")
    // coverage: nearest center by (rounded d, sel_order) struct-min —
    // identical tie semantics to the oracle's row_number replay
    val counts = base
      .crossJoin(broadcast(centersDf
        .select(col("sel_order"), col("center"))))
      .withColumn("d", round(
        dot(col("emb"), col("emb"))
          - lit(2) * dot(col("emb"), col("center"))
          + dot(col("center"), col("center")), 6))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d"), col("sel_order"))).as("_b"))
      .groupBy(col("_b.sel_order").as("sel_order"))
      .agg(count(lit(1)).as("n_assigned"))
    // k rows total: materialize once and release the cached base
    // (same persist/localCheckpoint/unpersist hygiene as
    // [[cosineDupPairs]]) — the returned frame no longer references
    // `base`, so repeated calls don't accumulate cached blocks.
    val result = centersDf.join(counts, Seq("sel_order"), "left")
      .select(col("sel_order"), col("vec_id"), col("radius"),
        coalesce(col("n_assigned"), lit(0L)).as("n_assigned"))
      .orderBy("sel_order")
    if (!materialize) result
    else {
      val out = result.localCheckpoint()
      base.unpersist()
      out
    }
  }

  /** (vec_id, sub, semb): the corpus exploded into its m PQ
    * subspaces — one narrow pass, the posexplode index IS the
    * subspace id. All PQ fit/encode work runs on this one frame so
    * every Lloyd iteration is ONE broadcast join + two aggregates
    * regardless of m (the per-subspace formulation cost m separate
    * job chains — 16× the scheduling and corpus passes at the
    * catalog parameterization; measured 38.5s → see pqTopK). */
  private def pqSubExplode(base: DataFrame, m: Int, subDim: Int)
      : DataFrame =
    base.select(col("vec_id"), posexplode(
        array((0 until m).map(si =>
          slice(col("emb"), si * subDim + 1, subDim)): _*))
      .as(Seq("sub", "semb")))

  /** Batched nearest-centroid assignment for all m subspaces at once,
    * as a PURE PROJECTION: the codebook frame is m·kSub rows (≤512 at
    * the catalog parameterization — the k-center-argmax bound), so it
    * collects to the driver and embeds as two plan-literal lookup
    * arrays indexed by `sub`; each subspace row computes its argmin
    * over the ≤kSub (distance, cid) candidates with `zip_with` +
    * `array_min` — whole-stage-codegen, NO join explosion and NO
    * corpus-sized aggregate.
    *
    * This shape replaced the r11 broadcast-join + struct-min
    * aggregate after the 1000× diagnosis: at 2M vectors the join
    * expanded 32M subspace rows × kSub=32 into a ~1B-row argmin hash
    * aggregate over 32M groups — in-memory at 100×, SPILLING at
    * 1000× (the measured ~2.4× super-linear build constant that the
    * storage-level matrix could not move). As a projection the
    * encode is embarrassingly parallel and scan-bound at any scale.
    *
    * Semantics are EXACTLY the aggregate form's, bit for bit: the
    * collected centroid doubles re-embed unchanged, [[l2sq]] is the
    * same expression tree, and `array_min` over struct(a_d2, cid)
    * orders lexicographically — the identical distance-then-cid tie
    * break as `min(struct(a_d2, cid))` — so the unrolled per-subspace
    * DuckDB oracle verifies this physical shape unchanged. Missing
    * (sub, cid) slots (an empty Lloyd cluster drops out of the mean
    * update) simply shorten that sub's candidate array, exactly as
    * they were absent from the broadcast join. */
  private def pqAssign(subBase: DataFrame, cents: DataFrame): DataFrame = {
    // bounded collect: m·kSub codebook rows (the fit contract)
    val rows = cents.select(col("sub"), col("cid"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1),
        r.getSeq[Double](2).toIndexedSeq))
    val m = rows.map(_._1).max + 1
    val bySub: Seq[Seq[(Int, Int, IndexedSeq[Double])]] =
      (0 until m).map(s => rows.filter(_._1 == s).sortBy(_._2).toSeq)
    val centLut: Column =
      typedLit(bySub.map(_.map(_._3.toSeq)))
    val cidLut: Column = typedLit(bySub.map(_.map(_._2)))
    val cands = zip_with(
      element_at(centLut, col("sub") + 1),
      element_at(cidLut, col("sub") + 1),
      (c, id) => struct(l2sq(col("semb"), c).as("a_d2"),
        id.as("cid")))
    subBase.select(col("vec_id"), col("sub"), col("semb"),
      array_min(cands).getField("cid").as("cid"))
  }

  /** All m PQ codebooks fitted in one batched Lloyd loop. Seeds are
    * the kSub smallest vec_ids — the SAME rows for every subspace, so
    * one TakeOrdered of the unsliced corpus seeds all m codebooks
    * (sliced per subspace). Each iteration: [[pqAssign]] + the
    * decimal-mean update keyed (sub, cid, dim) — order-independent
    * and unrounded, per [[kmeansCentroids]]' portability note. */
  private def pqFitCodebooks(base: DataFrame, subBase: DataFrame,
      m: Int, subDim: Int, kSub: Int, iters: Int): DataFrame = {
    val seedW = Window.orderBy("vec_id")
    var cents = base.orderBy("vec_id").limit(kSub)
      .withColumn("cid", (row_number().over(seedW) - 1).cast("int"))
      .select(col("cid"), posexplode(
          array((0 until m).map(si =>
            slice(col("emb"), si * subDim + 1, subDim)): _*))
        .as(Seq("sub", "centroid")))
      .select(col("sub"), col("cid"), col("centroid"))
    // barrier structure per [[kmeansCentroids]]'s round-15 note:
    // [[pqAssign]] collects the codebook frame each iteration (the
    // bounded m·kSub contract) and embeds it as plan literals, so
    // lineage is flat without truncation — each update plan executes
    // exactly once (at the next iteration's collect). Final state
    // (round 16): the fitted codebook returns as a LocalRelation
    // ([[asLocalRelation]] — the same bounded m·kSub rows) so its two
    // consumers (the encode's [[pqAssign]] collect and the ADC-LUT
    // broadcast) read local rows job-free; reliable mode keeps Ckpt
    // (durable-placement opt-in, CkptSpec).
    val localFinish = m.toLong * kSub <= AssignLutMaxCentroids &&
      !reliableMode(base)
    for (i <- 0 until iters) {
      cents = pqAssign(subBase, cents)
        .select(col("sub"), col("cid"),
          posexplode(col("semb")).as(Seq("dim", "v")))
        .groupBy(col("sub"), col("cid"), col("dim"))
        .agg((graft.queries.QueryUtil.sumDec(col("v")) /
          count(lit(1))).as("cv"))
        .groupBy(col("sub"), col("cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("cv")))),
          x => x("cv")).as("centroid"))
      if (i == iters - 1)
        cents =
          if (localFinish) asLocalRelation(cents)
          else Ckpt(cents)
    }
    cents
  }

  /** Product-quantization ANN (Jégou et al. 2011) — the memory-layout
    * production shape for corpus-scale similarity search. The `dim`
    * dimensions are split into `m` contiguous subspaces of dim/m; a
    * separate [[kmeansCentroidsL2]] codebook of `kSub` centroids is
    * fitted per subspace; every corpus vector is encoded as `m` small
    * codes (nearest sub-centroid per subspace — at kSub ≤ 256 that is
    * m BYTES per vector vs 8·dim for raw doubles, a 128× compression
    * at the catalog's 64-dim/4-byte-code parameterization). Queries
    * are NOT quantized (asymmetric distance computation): each query
    * precomputes a lookup table of `⟨q_sub, centroid⟩` partial dots —
    * |Q|·m·kSub tiny rows, broadcast — and a candidate's approximate
    * inner product is the sum of its m table entries, reached without
    * ever touching the raw corpus vectors again.
    *
    * Distributed shape: all m codebooks fit in ONE batched Lloyd loop
    * over the subspace-exploded corpus ([[pqSubExplode]] /
    * [[pqFitCodebooks]] — per iteration one broadcast join + two
    * partial-combined aggregates, regardless of m; the per-subspace
    * formulation cost m separate job chains and ran 4× slower at
    * m=16); encode is one batched argmin aggregate; scoring joins
    * the corpus-sized CODES frame to the broadcast LUT and reduces
    * per (query, vector) with map-side combine — the only
    * corpus-sized shuffle carries (query_id, vec_id, partial-sum)
    * rows, never vectors. Every step is rounded/decimal-summed, so
    * the whole index — fit, codes, ADC scores — is hash-verified
    * against an unrolled DuckDB oracle.
    *
    * Scores are approximate inner products (`adc_dot`), the standard
    * PQ ranking score; recall vs the exact scan is bounded in
    * SimilaritySpec and measured per-corpus the same way
    * `s_ann_recall` does for LSH. */
  /** `fitSampleMod` > 1 fits the codebooks on the DETERMINISTIC
    * sample `vec_id % fitSampleMod == 0` (seeds, assignments and
    * centroid updates all over the sample) while the FULL corpus is
    * still encoded and scored — the production fit shape
    * (FAISS-class systems train quantizers on a bounded sample): fit
    * cost becomes sample-sized × iters, corpus-independent, and the
    * corpus pays exactly one encode pass. The modulus predicate is
    * SQL-mirrorable, so the sampled fit stays hash-verifiable. */
  def pqTopK(embeddings: DataFrame, queryIds: DataFrame, k: Int,
      m: Int, kSub: Int, iters: Int, dim: Int = 64,
      fitSampleMod: Long = 1L): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must split into m=$m")
    require(fitSampleMod >= 1L, "fitSampleMod must be >= 1")
    val subDim = dim / m
    val base = embeddings.select(col("vec_id"),
        toDouble(col("embedding")).as("emb"))
      .filter(col("emb").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Corpus-sized subspace frame storage — every option was MEASURED
    // at the 1000× tier (2M vectors / 32M subspace rows, one session,
    // BASELINE.md r12 ANN section):
    //  - FULL fit (3 passes: 2 Lloyd + encode): persist wins — SER
    //    cache 706s < no-persist re-explode 847s; SER vs the r11
    //    deserialized cache is ~neutral (the pressure is round-trip
    //    volume, not object overhead). Keep MEMORY_AND_DISK_SER.
    //  - SAMPLED fit: the frame is consumed exactly ONCE (the
    //    encode); persisting a single-use corpus frame is pure
    //    overhead — removing it cut the 1000× build ~2.2×
    //    host-adjusted (294s vs the r11 ~395s on a faster host).
    val subBaseLazy = pqSubExplode(base, m, subDim)
    val subBase =
      if (fitSampleMod > 1L) subBaseLazy
      else subBaseLazy.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val (fitBase, fitSub) =
      if (fitSampleMod > 1L) {
        val fb = base.filter(col("vec_id") % fitSampleMod === 0)
        (fb, pqSubExplode(fb, m, subDim))
      } else (base, subBase)
    val cents = pqFitCodebooks(fitBase, fitSub, m, subDim, kSub, iters)
    val codes = pqAssign(subBase, cents)
      .select(col("vec_id"), col("sub"), col("cid"))
    val q = base.join(broadcast(queryIds), Seq("vec_id"))
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    // pdot stays a RAW double: the decimal cast inside sumDec is the
    // one quantization point (the proven centroid-mean pattern). A
    // per-term round(·,6) here would add 16 extra half-way rounding
    // decisions per pair, and round() at a boundary is the one
    // operation Spark (exact-expansion HALF_UP) and DuckDB (scaled
    // multiply) can disagree on — observed once in 40 960 terms at
    // sf0.01 before this was removed.
    val lut = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("sub"), col("cid"),
        graft.functions.ArrayOps.dot_product(
          slice(col("q_emb"), col("sub") * lit(subDim) + lit(1),
            lit(subDim)),
          col("centroid")).as("pdot"))
    val scored = codes.join(broadcast(lut), Seq("sub", "cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(round(graft.queries.QueryUtil.sumDec(col("pdot")), 6)
        .as("adc_dot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("adc_dot"), asc("vec_id"))
    val topk = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("adc_dot"), col("rank"))
    val out = topk.localCheckpoint()
    subBase.unpersist() // no-op under a sampled fit (never persisted)
    base.unpersist()
    out
  }

  /** PQ with VARIANCE-BALANCED subspace assignment — the classic
    * pre-rotation fix for anisotropic embeddings (the allocation
    * heuristic OPQ [Ge et al. 2013] initializes from; PCA-permutation
    * balancing appears in Jégou et al. 2011 §5 as the "structured
    * ordering" variant): contiguous slicing puts correlated
    * high-variance dimensions in the SAME codebook, starving the
    * kSub centroids; ranking dimensions by variance and dealing them
    * round-robin across the m subspaces equalizes per-subspace
    * variance, so every codebook spends its centroids on comparable
    * signal. The true inner product is permutation-invariant, so
    * ground truth is unchanged — only the quantization error moves.
    *
    * The permutation derives from ONE narrow corpus pass (per-dim
    * decimal sums → dim² driver rows — 64 values, the MLlib
    * local-finish pattern) and is applied as a plan-literal
    * projection; everything downstream is the unmodified [[pqTopK]]
    * machinery, so the balanced index inherits its scale shape and
    * its oracle verifiability (the variance ranking is
    * SQL-mirrorable: same decimal sums, same (variance DESC, dim)
    * order). */
  def pqTopKBalanced(embeddings: DataFrame, queryIds: DataFrame,
      k: Int, m: Int, kSub: Int, iters: Int, dim: Int = 64)
      : DataFrame = {
    val permuted = variancePermuted(embeddings, m, dim,
      keep = Seq("vec_id"))
    pqTopK(permuted, queryIds, k, m, kSub, iters, dim)
  }

  /** The variance-balancing permutation applied as a plan-literal
    * projection — ONE definition shared by the balanced PQ and the
    * residual×balanced composition. Per-dim variance via exact
    * decimal sums: both engines compute (s2 − s1²/n)/n on identical
    * doubles, rounded before ranking so a 1-ulp divergence can never
    * flip the permutation; rank r deals to subspace r % m, slot
    * r / m. `keep` lists the id columns carried through (the IVF
    * variants need `label` next to `vec_id`). */
  private def variancePermuted(embeddings: DataFrame, m: Int,
      dim: Int, keep: Seq[String]): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must split into m=$m")
    val subDim = dim / m
    val base = embeddings.select(col("vec_id"),
        toDouble(col("embedding")).as("emb"))
      .filter(col("emb").isNotNull)
    val varRows = base
      .select(posexplode(col("emb")).as(Seq("dim", "v")))
      .groupBy(col("dim"))
      .agg(graft.queries.QueryUtil.sumDec(col("v")).as("s1"),
        graft.queries.QueryUtil.sumDec(col("v") * col("v")).as("s2"),
        count(lit(1)).as("n"))
      .select(col("dim"), round(
        (col("s2") - col("s1") * col("s1") / col("n")) / col("n"), 6)
        .as("variance"))
      .collect()
    val ranked = varRows.map(r => (r.getInt(0), r.getDouble(1)))
      .sortBy { case (d, v) => (-v, d) }
    // perm(newPos) = source dim
    val perm = new Array[Int](dim)
    ranked.zipWithIndex.foreach { case ((d, _), r) =>
      perm((r % m) * subDim + (r / m)) = d
    }
    embeddings
      .filter(col("embedding").isNotNull)
      .select(keep.map(col) :+ array(
        perm.toIndexedSeq.map(d =>
          element_at(col("embedding"), d + 1)): _*).as("embedding"): _*)
  }

  /** Residual IVF-PQ over the variance-balanced subspace layout —
    * the two orthogonal quantization-error levers composed (OPQ-style
    * allocation fixes WHICH dimensions share a codebook; residual
    * encoding fixes WHAT the codebook must represent). The
    * permutation is applied first as a plan-literal projection (the
    * true inner product is permutation-invariant, so coarse probing
    * and ground truth are unchanged up to summation order), then the
    * unmodified [[ivfTopKPqResidual]] machinery runs on the permuted
    * corpus — the composition inherits both parents' scale shape and
    * both parents' oracle fragments (SimilaritySpec pins recall ≥
    * each parent on the fixtures where each lever matters). */
  def ivfTopKPqResidualBalanced(embeddings: DataFrame,
      queryIds: DataFrame, k: Int, nprobe: Int, m: Int, kSub: Int,
      iters: Int, dim: Int = 64): DataFrame = {
    val permuted = variancePermuted(embeddings, m, dim,
      keep = Seq("vec_id", "label"))
    ivfTopKPqResidual(permuted, queryIds, k, nprobe, m, kSub, iters,
      dim)
  }

  /** IVF × PQ — the canonical production ANN composition (IVF-PQ,
    * Jégou et al. 2011; what FAISS/SCaNN-class systems deploy at
    * billion-vector scale): [[ivfTopK]]'s per-label coarse quantizer
    * prunes the corpus to `nprobe` label partitions per query, and
    * fine ranking inside the probed partitions runs entirely on the
    * [[pqTopK]] code index — candidates are scored by summing m
    * broadcast-LUT entries, never re-reading raw vectors. Codebooks
    * are fitted on the full vectors (non-residual IVF-PQ — the
    * residual variant quantizes `v − centroid(v)` for tighter error
    * at the same code size, but couples the two fits; the simpler
    * composition keeps both levels independently oracle-verifiable).
    *
    * The coded index frame (vec_id, label, m codes) is materialized
    * once — in production that IS the stored ANN index (codes live
    * next to the partition key; at kSub ≤ 256, m bytes + a label per
    * vector), and queries touch raw doubles only for their own
    * embeddings. Work per query: k_clusters coarse dots + nprobe·|C|/
    * k_clusters LUT-sum candidates — corpus-linear at fixed |Q|, with
    * the PQ constant ~32× smaller than the raw-vector IVF scan. */
  /** `fitSampleMod` > 1 trains all m codebooks on the deterministic
    * `vec_id % fitSampleMod == 0` sample (the [[pqTopK]] production
    * fit lever, measured at the 1000× tier: the full-corpus fit pays
    * THREE subspace-assign passes over the persisted 32M-row
    * subspace frame — two Lloyd iterations + the encode — and at 2M
    * vectors that frame's MEMORY_AND_DISK footprint round-trips to
    * disk; sampling bounds the two fit passes, the corpus pays
    * exactly one encode). SQL-mirrorable, so hash-verified. */
  /** `candidateFilter` composes the metadata-filtered search
    * ([[ivfTopKFiltered]]'s pre-filter form) with the CODED index —
    * what a filtered query actually runs on a 100 TB corpus, where
    * fine ranking must stay on the m-byte codes, never raw vectors:
    * the index (codes + label + vec_id, carrying whatever metadata
    * the deployment stores beside the codes) is filtered BEFORE the
    * probed-partition join, i.e. a pushed column predicate on the
    * partition-pruned index read — candidates are restricted, the
    * stored index and the codebooks are filter-agnostic (centroids
    * and fits always derive from the full corpus; a per-filter refit
    * would be absurd at production churn). Callers widen nprobe ∝
    * 1/selectivity, the documented filtered-search recall lever. */
  def ivfTopKPq(embeddings: DataFrame, queryIds: DataFrame, k: Int,
      nprobe: Int, m: Int, kSub: Int, iters: Int, dim: Int = 64,
      fitSampleMod: Long = 1L,
      candidateFilter: Option[Column] = None)
      : DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must split into m=$m")
    require(fitSampleMod >= 1L, "fitSampleMod must be >= 1")
    val subDim = dim / m
    val base = embeddings.select(col("vec_id"), col("label"),
        toDouble(col("embedding")).as("emb"))
      .filter(col("emb").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // coarse level: exact decimal-mean per-label centroids (the
    // ivfTopK frame, unrounded — see kmeansCentroids' portability
    // note), probed with raw-double cosine
    val cent = labelCentroids(base)
    // fine level: the pqTopK codebooks + code index (batched fit —
    // one Lloyd job chain for all m subspaces), label attached via
    // one (vec_id)-keyed join of two narrow frames, materialized once
    // as "the stored index"
    // same storage rule as pqTopK: SER-persist the subspace frame
    // for the 3-pass full fit, skip the persist when the sampled fit
    // leaves it single-use (both measured, see pqTopK). The coded
    // frame itself STREAMS into the probed join — in this query path
    // it is consumed exactly once, so the r11 eager localCheckpoint
    // materialized 32M rows to executor storage for nothing (in
    // production the deployment writes it out as the stored index;
    // that is a sink decision, not a query-path cost).
    val subBaseLazy = pqSubExplode(base, m, subDim)
    val subBase =
      if (fitSampleMod > 1L) subBaseLazy
      else subBaseLazy.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val (fitBase, fitSub) =
      if (fitSampleMod > 1L) {
        val fb = base.filter(col("vec_id") % fitSampleMod === 0)
        (fb, pqSubExplode(fb, m, subDim))
      } else (base, subBase)
    val cents = pqFitCodebooks(fitBase, fitSub, m, subDim, kSub, iters)
    val index = pqAssign(subBase, cents)
      .select(col("vec_id"), col("sub"), col("cid"))
      .join(base.select(col("vec_id"), col("label")), Seq("vec_id"))
    val q = base.join(broadcast(queryIds), Seq("vec_id"))
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    val probes = q.crossJoin(broadcast(cent))
      .select(col("query_id"), col("label"),
        round(cosine(col("q_emb"), col("centroid")), 6).as("c_sim"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(desc("c_sim"), asc("label"))
    val probed = probes.withColumn("prn", row_number().over(wq))
      .filter(col("prn") <= nprobe)
      .select(col("query_id"), col("label"))
    // raw pdots; the sumDec decimal cast is the one quantization
    // point (same rationale as pqTopK)
    val lut = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("sub"), col("cid"),
        graft.functions.ArrayOps.dot_product(
          slice(col("q_emb"), col("sub") * lit(subDim) + lit(1),
            lit(subDim)),
          col("centroid")).as("pdot"))
    // pre-filter ON THE CODE INDEX, before the probed-partition join:
    // candidates shrink at the index scan, scores stay pure ADC
    val cand = candidateFilter.map(index.filter).getOrElse(index)
    val scored = cand.join(broadcast(probed), Seq("label"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(broadcast(lut), Seq("query_id", "sub", "cid"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(round(graft.queries.QueryUtil.sumDec(col("pdot")), 6)
        .as("adc_dot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("adc_dot"), asc("vec_id"))
    val topk = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("adc_dot"), col("rank"))
    val out = topk.localCheckpoint()
    subBase.unpersist() // no-op under a sampled fit (never persisted)
    base.unpersist()
    out
  }

  /** Materialize the STORED IVF-PQ index — the ANN sibling of
    * [[graft.ext.Retrieval.buildPhraseIndex]], closing the persisted-
    * layout family (phrase postings, BFS adjacency, MV store, z-order
    * all have one; the coded ANN index is what a 100 TB deployment
    * actually keeps between corpus snapshots). Two artifacts
    * (layout v2, round 16 — the v1 layout wrote coarse and codebooks
    * as separate dirs, paying a parquet commit cycle each for two
    * vocab-sized tables every build):
    *
    *  - `$dir/codes` — (vec_id, sub, cid) PARTITIONED BY label: m
    *    small codes per vector, laid out so a probe's label set is a
    *    planning-time partition filter (the phrase-index bucket rule
    *    with the coarse quantizer's own key — probes are label
    *    lookups, there is no range to cluster);
    *  - `$dir/meta` — the two vocab-sized fit tables packed into ONE
    *    kind-discriminated file: `coarse` rows carry the per-label
    *    exact decimal-mean centroids (O(labels)), `codebooks` rows
    *    all m fitted sub-codebooks (m·kSub). One commit cycle, one
    *    read per serve ([[pqIndexProbe]] / [[appendToPqIndex]]
    *    collect it once driver-side — it is bounded by contract).
    *
    * Fit/encode are EXACTLY [[ivfTopKPq]]'s (shared helpers), with
    * the production `fitSampleMod` lever; parquet round-trips doubles
    * bit-exactly, so serving from the layout can never change
    * results — SimilaritySpec pins probe ≡ ivfTopKPq equality and the
    * partition pruning. Build cost is the index-build price, one
    * corpus scan + one encode projection, amortized across every
    * probe on the snapshot. */
  def buildPqIndex(embeddings: DataFrame, dir: String, m: Int,
      kSub: Int, iters: Int, dim: Int = 64,
      fitSampleMod: Long = 1L): Unit = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must split into m=$m")
    val subDim = dim / m
    val base = embeddings.select(col("vec_id"), col("label"),
        toDouble(col("embedding")).as("emb"))
      .filter(col("emb").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the ivfTopKPq storage rule: SER-persist the subspace frame only
    // when the full fit makes it multi-pass (it then also serves the
    // encode); a sampled fit leaves the corpus explode single-use
    val subBase = pqSubExplode(base, m, subDim)
    val (fitBase, fitSub, persisted) =
      if (fitSampleMod > 1L) {
        val fb = base.filter(col("vec_id") % fitSampleMod === 0)
        (fb, pqSubExplode(fb, m, subDim), None)
      } else {
        val sb = subBase.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        (base, sb, Some(sb))
      }
    val cents = pqFitCodebooks(fitBase, fitSub, m, subDim, kSub, iters)
    // coarse + codebooks ride one union into one commit cycle; label
    // is normalized to LONG at write time (the probe normalized the
    // partition-dir type the same way in v1, so joins stay exact)
    labelCentroids(base)
      .select(lit("coarse").as("kind"),
        col("label").cast("long").as("label"),
        lit(null).cast("int").as("sub"), lit(null).cast("int").as("cid"),
        col("centroid"))
      .unionByName(cents.select(lit("codebooks").as("kind"),
        lit(null).cast("long").as("label"), col("sub"), col("cid"),
        col("centroid")))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta")
    pqAssign(persisted.getOrElse(subBase), cents)
      .select(col("vec_id"), col("sub"), col("cid"))
      .join(base.select(col("vec_id"), col("label")), Seq("vec_id"))
      .repartition(col("label")) // one writer task per partition dir
      .write.mode("overwrite").partitionBy("label")
      .parquet(s"$dir/codes")
    persisted.foreach(_.unpersist())
    base.unpersist(): Unit
  }

  /** ONE read of a [[buildPqIndex]] layout's `meta` artifact,
    * collected driver-side (bounded: O(labels) + m·kSub rows by the
    * layout contract) and split back into its two tables as
    * LocalRelations — every downstream broadcast/collect of either
    * table is then job-free. Returns (coarse (label, centroid),
    * codebooks (sub, cid, centroid), m). */
  private def readPqIndexMeta(spark: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, DataFrame, Int) = {
    import org.apache.spark.sql.types._
    val df = spark.read.parquet(s"$dir/meta")
    val rows = df.collect()
    val iKind = df.schema.fieldIndex("kind")
    val iLabel = df.schema.fieldIndex("label")
    val iSub = df.schema.fieldIndex("sub")
    val iCid = df.schema.fieldIndex("cid")
    val iCent = df.schema.fieldIndex("centroid")
    val centType = df.schema("centroid").dataType
    val coarse = spark.createDataFrame(
      java.util.Arrays.asList(rows.filter(_.getString(iKind) == "coarse")
        .map(r => org.apache.spark.sql.Row(r.getLong(iLabel),
          r.get(iCent))): _*),
      StructType(Seq(StructField("label", LongType),
        StructField("centroid", centType))))
    val cbRows = rows.filter(_.getString(iKind) == "codebooks")
    val cents = spark.createDataFrame(
      java.util.Arrays.asList(cbRows
        .map(r => org.apache.spark.sql.Row(r.getInt(iSub),
          r.getInt(iCid), r.get(iCent))): _*),
      StructType(Seq(StructField("sub", IntegerType),
        StructField("cid", IntegerType),
        StructField("centroid", centType))))
    val m = cbRows.map(_.getInt(iSub)).max + 1
    (coarse, cents, m)
  }

  /** Append a batch to a [[buildPqIndex]] layout WITHOUT refit — the
    * FAISS `add` path on the stored index, the coded sibling of
    * [[ivfIncremental]]'s no-refit contract: the batch is encoded
    * with the STORED codebooks ([[pqAssign]]'s projection over the
    * collected ≤ m·kSub rows) and its codes land as an APPEND into
    * the label-partitioned codes layout — existing code files are
    * never rewritten, the coarse centroids and codebooks never move,
    * and a probe sees old and new vectors through the identical ADC
    * machinery. Encode cost is one narrow projection pass over the
    * batch (m·kSub candidate l2s per row); the append writes only the
    * batch's partitions. Production appends bounded batches between
    * refit cycles exactly like this; quantizer drift across many
    * appends is the documented trigger for the next [[buildPqIndex]]
    * refit. AppendSpec pins: manifest codes bit-identical pre/post
    * append, and split-appends compose to the one-shot append. */
  def appendToPqIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, batch: DataFrame, dim: Int = 64): Unit = {
    // one meta read serves m, the known-label check AND the frozen
    // codebooks (v1 read the codebooks artifact twice and coarse once
    // — three read jobs for two bounded tables)
    val (coarse, cents, m) = readPqIndexMeta(spark, dir)
    val subDim = dim / m
    val base = batch.select(col("vec_id"), col("label"),
        toDouble(col("embedding")).as("emb"))
      .filter(col("emb").isNotNull)
    // a label the stored coarse centroids don't know would land in a
    // partition NO probe ever selects — silently unreachable rows.
    // New labels are the refit trigger, not an append; fail loudly.
    val known = coarse.collect().map(_.getLong(0)).toSet
    val novel = base.select(col("label").cast("long")).distinct()
      .collect().map(_.getLong(0)).filterNot(known)
    require(novel.isEmpty,
      s"batch carries labels absent from the stored coarse index " +
        s"(${novel.mkString(",")}) — appending them would create " +
        "unreachable partitions; rebuild the index instead")
    pqAssign(pqSubExplode(base, m, subDim), cents)
      .select(col("vec_id"), col("sub"), col("cid"))
      .join(base.select(col("vec_id"), col("label")), Seq("vec_id"))
      .repartition(col("label"))
      .write.mode("append").partitionBy("label")
      .parquet(s"$dir/codes")
  }

  /** Probe served from a [[buildPqIndex]] layout: the query vectors
    * score the O(labels) stored coarse centroids, the |Q|·nprobe
    * probed set collects driver-side (bounded by the fixed-|Q|
    * contract — the phraseIndexProbe rule), its label set becomes a
    * PLANNING-time partition filter on the codes read, and fine
    * ranking is the usual broadcast-LUT ADC sum over the pruned
    * partitions — no raw corpus vectors, no fit, no
    * corpus-proportional probe state. `embeddings` supplies only the
    * |Q| query rows (queries are never quantized — the asymmetric-ADC
    * contract). Results are bit-identical to [[ivfTopKPq]] at the
    * same parameters: parquet preserves the fit's doubles exactly and
    * every downstream expression is shared. */
  def pqIndexProbe(spark: org.apache.spark.sql.SparkSession,
      dir: String, embeddings: DataFrame, queryIds: DataFrame, k: Int,
      nprobe: Int, dim: Int = 64): DataFrame = {
    // one meta read serves m and both fit tables (v1 launched three
    // parquet read jobs); the LocalRelations broadcast job-free below
    val (cent, cents, m) = readPqIndexMeta(spark, dir)
    val subDim = dim / m
    val q = embeddings.select(col("vec_id"),
        toDouble(col("embedding")).as("emb"))
      .filter(col("emb").isNotNull)
      .join(broadcast(queryIds), Seq("vec_id"))
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    // label normalized to LONG inside the probe: the source schema
    // may carry int labels and the partition directory re-infers its
    // own numeric type — one explicit width everywhere keeps the
    // joins exact regardless (meta stores label as long already; the
    // cast below is then a no-op)
    val probes = q.crossJoin(broadcast(cent))
      .select(col("query_id"), col("label").cast("long").as("label"),
        round(cosine(col("q_emb"), col("centroid")), 6).as("c_sim"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(desc("c_sim"), asc("label"))
    // |Q|·nprobe rows by contract → driver-side, labels become the
    // partition filter (the phraseIndexProbe planning-time prune)
    val probedRows = probes.withColumn("prn", row_number().over(wq))
      .filter(col("prn") <= nprobe)
      .select(col("query_id"), col("label"))
      .collect()
    val labels = probedRows.map(_.getLong(1)).distinct.toSeq
    import spark.implicits._
    val probed = probedRows.map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.toDF("query_id", "label")
    // filter BEFORE the cast so the isin stays a partition filter;
    // the directory-inferred partition type then normalizes to long
    val codes = spark.read.parquet(s"$dir/codes")
      .filter(col("label").isin(labels: _*))
      .withColumn("label", col("label").cast("long"))
    val lut = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("sub"), col("cid"),
        graft.functions.ArrayOps.dot_product(
          slice(col("q_emb"), col("sub") * lit(subDim) + lit(1),
            lit(subDim)),
          col("centroid")).as("pdot"))
    val scored = codes.join(broadcast(probed), Seq("label"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(broadcast(lut), Seq("query_id", "sub", "cid"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(round(graft.queries.QueryUtil.sumDec(col("pdot")), 6)
        .as("adc_dot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("adc_dot"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("adc_dot"), col("rank"))
  }

  /** The per-label exact decimal-mean coarse centroid frame — ONE
    * definition shared by [[ivfTopKPq]], [[ivfTopKPqResidual]] and
    * [[buildPqIndex]] (the three were identical inline copies before
    * r12; a drift here would desynchronize the stored index from the
    * inline composition). */
  private def labelCentroids(base: DataFrame): DataFrame = base
    .select(col("label"), posexplode(col("emb")).as(Seq("dim", "v")))
    .groupBy(col("label"), col("dim"))
    .agg((graft.queries.QueryUtil.sumDec(col("v")) /
      count(lit(1))).as("cv"))
    .groupBy(col("label"))
    .agg(transform(
      array_sort(collect_list(struct(col("dim"), col("cv")))),
      x => x("cv")).as("centroid"))

  /** RESIDUAL IVF-PQ — the production FAISS form of [[ivfTopKPq]]:
    * each vector is PQ-encoded not on its raw coordinates but on its
    * residual `r = v − c(v)` against its assigned coarse centroid.
    * Residuals concentrate near the origin (the coarse quantizer has
    * already explained the between-cell variance), so the same m×kSub
    * code budget spends its centroids on a tighter distribution —
    * better reconstruction, better recall at equal bits. The ADC
    * score decomposes exactly: `⟨q,v⟩ ≈ ⟨q,c(v)⟩ + ⟨q,r̂⟩`, where the
    * first term is one raw dot per (query, probed cell) — already
    * computed while probing — and the second is the usual m-entry
    * LUT sum over the residual codebooks.
    *
    * Distributed shape is [[ivfTopKPq]]'s with one extra narrow pass:
    * the residual frame is a broadcast join of the corpus against the
    * O(cells) centroid table followed by an element-wise `zip_with`
    * subtraction — no shuffle, IEEE-exact, and SQL-mirrorable, so the
    * coupled two-level fit (coarse means → residuals → all m Lloyd
    * fits) stays hash-verifiable end to end. Costs vs non-residual:
    * the LUT must be per (query, cell) in full generality; with the
    * single shared codebook set fitted on residuals (the standard
    * IVF-PQ simplification, FAISS's default) the LUT stays per-query
    * and the only extra per-candidate work is adding the coarse term.
    *
    * `fitSampleMod` > 1 trains all m residual codebooks on the
    * deterministic `vec_id % fitSampleMod == 0` sample — the
    * [[ivfTopKPq]] production fit lever composed THROUGH the coupled
    * two-level fit: coarse means stay full-corpus (one cheap decimal
    * aggregate, and the family's rule — the encode must subtract the
    * centroids every stored vector will subtract), the sampled
    * residuals feed seeds + both Lloyd rounds, and the full corpus
    * still pays exactly one encode projection. */
  def ivfTopKPqResidual(embeddings: DataFrame, queryIds: DataFrame,
      k: Int, nprobe: Int, m: Int, kSub: Int, iters: Int,
      dim: Int = 64, fitSampleMod: Long = 1L): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must split into m=$m")
    require(fitSampleMod >= 1L, "fitSampleMod must be >= 1")
    val subDim = dim / m
    val base = embeddings.select(col("vec_id"), col("label"),
        toDouble(col("embedding")).as("emb"))
      .filter(col("emb").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // coarse level: identical frame to ivfTopKPq (the shared
    // labelCentroids helper)
    val cent = labelCentroids(base)
      .localCheckpoint() // feeds residuals AND probes — compute once
    // residual pass: one broadcast join + element-wise subtraction
    // (raw doubles; a-b is IEEE-exact so Spark and DuckDB agree)
    // the residual BASE (corpus-sized vectors, same footprint class
    // as `base`) persists — it feeds the seeds and every subspace
    // re-explode; the 16×-larger SUBSPACE frame does not (re-explode
    // from the cached rbase per pass — the r12 1000× finding, see
    // pqTopK)
    // Storage follows the ivfTopKPq rule, extended to the residual
    // frame: under the FULL fit, rbase persists SER (it feeds the
    // seeds and every subspace re-explode) and so does the 3-pass
    // subspace frame; under a SAMPLED fit both become single-use —
    // the fit passes re-derive the sample-sized residual slice from
    // the cached base (the modulus filter pushes below the broadcast
    // join), and the full corpus streams through its one encode. The
    // coded frame streams into the probed join in both regimes.
    val rbaseLazy = base.join(broadcast(cent), Seq("label"))
      .select(col("vec_id"),
        zip_with(col("emb"), col("centroid"), (a, b) => a - b).as("emb"))
    val rbase =
      if (fitSampleMod > 1L) rbaseLazy
      else rbaseLazy.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val subResLazy = pqSubExplode(rbase, m, subDim)
    val subRes =
      if (fitSampleMod > 1L) subResLazy
      else subResLazy.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val (fitRes, fitSub) =
      if (fitSampleMod > 1L) {
        val fb = rbaseLazy.filter(col("vec_id") % fitSampleMod === 0)
        (fb, pqSubExplode(fb, m, subDim))
      } else (rbase, subRes)
    val cents = pqFitCodebooks(fitRes, fitSub, m, subDim, kSub, iters)
    val index = pqAssign(subRes, cents)
      .select(col("vec_id"), col("sub"), col("cid"))
      .join(base.select(col("vec_id"), col("label")), Seq("vec_id"))
    val q = base.join(broadcast(queryIds), Seq("vec_id"))
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    // probes carry BOTH the ranking cosine and the raw coarse dot
    // ⟨q,c⟩ — the first ADC term, free at probe time
    val probes = q.crossJoin(broadcast(cent))
      .select(col("query_id"), col("label"),
        round(cosine(col("q_emb"), col("centroid")), 6).as("c_sim"),
        graft.functions.ArrayOps.dot_product(col("q_emb"),
          col("centroid")).as("qc_dot"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(desc("c_sim"), asc("label"))
    val probed = probes.withColumn("prn", row_number().over(wq))
      .filter(col("prn") <= nprobe)
      .select(col("query_id"), col("label"), col("qc_dot"))
    // LUT over the RESIDUAL codebooks; pdots raw, sumDec is the one
    // quantization point (same rationale as pqTopK)
    val lut = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("sub"), col("cid"),
        graft.functions.ArrayOps.dot_product(
          slice(col("q_emb"), col("sub") * lit(subDim) + lit(1),
            lit(subDim)),
          col("centroid")).as("pdot"))
    val scored = index.join(broadcast(probed), Seq("label"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(broadcast(lut), Seq("query_id", "sub", "cid"))
      .groupBy(col("query_id"), col("vec_id"))
      // qc_dot is constant per (query, candidate): its cell is the
      // candidate's one label ∩ the query's probed set
      .agg(round(first(col("qc_dot")) +
        graft.queries.QueryUtil.sumDec(col("pdot")), 6).as("adc_dot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("adc_dot"), asc("vec_id"))
    val topk = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("adc_dot"), col("rank"))
    val out = topk.localCheckpoint()
    subRes.unpersist()
    rbase.unpersist()
    base.unpersist()
    out
  }

  /** [[ivfTopK]] with a real (deterministic) k-means coarse quantizer
    * instead of the `label` column: fit `kClusters` centroids with
    * [[kmeansCentroids]], assign the corpus, probe the `nprobe`
    * nearest centroids per query. */
  def ivfTopKKmeans(embeddings: DataFrame, isQuery: Column, k: Int,
      nprobe: Int, kClusters: Int, iters: Int): DataFrame =
    ivfTopKKmeansImpl(embeddings, _.filter(isQuery), k, nprobe,
      kClusters, iters)

  /** [[ivfTopKKmeans]] with the query set given as an id frame
    * (single `vec_id` column, e.g. from [[sampleQueryIds]]) — the
    * fixed-|Q| shape; the id frame broadcasts. */
  def ivfTopKKmeans(embeddings: DataFrame, queryIds: DataFrame, k: Int,
      nprobe: Int, kClusters: Int, iters: Int): DataFrame =
    ivfTopKKmeansImpl(embeddings,
      _.join(broadcast(queryIds), Seq("vec_id")), k, nprobe,
      kClusters, iters)

  private def ivfTopKKmeansImpl(embeddings: DataFrame,
      mkQ: DataFrame => DataFrame, k: Int,
      nprobe: Int, kClusters: Int, iters: Int): DataFrame = {
    // same NULL-drop as semDedup (they share the k-means fit AND the
    // unrolled-SQL oracle base, which filters NULLs — a NULL vector
    // would otherwise NULL its assignment cosines corpus-wide)
    val base = embeddings.select(col("vec_id"),
        toDouble(col("embedding")).as("emb"))
      .filter(col("emb").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val centroids = kmeansCentroids(base, kClusters, iters)
    val members = assignClusters(base, centroids)
    val q = mkQ(base)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("q_emb"), col("cid"),
        round(cosine(col("q_emb"), col("centroid")), 6).as("c_sim"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(desc("c_sim"), asc("cid"))
    val probed = probes.withColumn("prn", row_number().over(wq))
      .filter(col("prn") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("cid"))
    val scored = members.join(probed, Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("q_emb"), col("emb")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos_sim"), asc("neighbor_id"))
    val topk = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    // top-k per query is tiny: materialize and release the corpus
    // cache (same leak-avoidance pattern as cosineDupPairs)
    val out = topk.localCheckpoint()
    base.unpersist()
    out
  }

  /** IVF-style coarse quantization using per-label centroids (the
    * embeddings table's `label` column is the cluster assignment):
    * queries probe only the `nprobe` nearest centroids' partitions.
    * The centroid table is tiny → broadcast both directions. */
  def ivfTopK(embeddings: DataFrame, isQuery: Column, k: Int,
      nprobe: Int): DataFrame =
    ivfTopKImpl(embeddings, _.filter(isQuery), k, nprobe)

  /** [[ivfTopK]] with the query set given as an id frame (single
    * `vec_id` column, e.g. from [[sampleQueryIds]]) — the fixed-|Q|
    * shape; the id frame broadcasts. */
  def ivfTopK(embeddings: DataFrame, queryIds: DataFrame, k: Int,
      nprobe: Int): DataFrame =
    ivfTopKImpl(embeddings, _.join(broadcast(queryIds), Seq("vec_id")),
      k, nprobe)

  /** The ingest gate's index state: k-means coarse centroids
    * (cid, centroid) and the manifest's partition assignment
    * (vec_id, emb, cid). Both frames are what a production deployment
    * persists between refits — centroids are O(k) rows, members are
    * the manifest re-keyed by partition. */
  final case class IvfIndex(centroids: DataFrame, members: DataFrame,
      kClusters: Int)

  /** Build the ANN ingest gate's coarse index from the manifest with
    * the quantizer's k SCALED TO THE MANIFEST:
    * k = ⌈N / targetPartitionSize⌉, so partition size — and therefore
    * per-batch probe cost — stays flat as the corpus grows (the r8
    * fixed-k=8 label quantizer made probe cost linear in N: 1.9 s at
    * an 18k manifest → 15.4 s at 198k for the same 2k batch). The fit
    * is the deterministic [[kmeansCentroids]] (smallest-vec_id seeds,
    * exact-decimal updates) so the whole index is engine-portable and
    * DuckDB-verifiable. Build cost is the index-build price — `iters`+1
    * corpus×k assignment passes, O(N·k) = O(N²/target) with k ∝ N —
    * amortized across every batch until the next refit (the FAISS
    * train+add path). `fitSampleMod` > 1 bounds that build the way
    * production actually does (FAISS trains quantizers on a sample,
    * same shape as [[pqTopK]]'s `fitSampleMod`): seeds and every
    * Lloyd pass run on the deterministic `vec_id % mod = 0` sample
    * while the FULL manifest is still assigned to partitions — build
    * drops to O(N·k/mod) + one full assignment, and the modulus
    * predicate stays SQL-mirrorable. The 100× probe measured the
    * full fit at 637s vs 223s for mod=10 at the same flat probe cost;
    * the residue is the one unavoidable full N×k assignment pass,
    * which is why beyond ~10M vectors production additionally moves
    * to a √N-cluster or HNSW coarse quantizer (bounding k itself
    * rather than just the fit corpus). */
  def ivfIndexBuild(manifest: DataFrame, targetPartitionSize: Int,
      iters: Int, fitSampleMod: Long = 1L): IvfIndex =
    ivfIndexBuildWithK(manifest,
      n => math.ceil(n.toDouble / targetPartitionSize).toInt,
      iters, fitSampleMod)

  /** [[ivfIndexBuild]] with k = ⌈√N⌉ — the BOUNDED-k coarse quantizer
    * the k ∝ N scaladoc points to beyond ~10M vectors. √N is not an
    * arbitrary bound: per-query probe cost is `k + nprobe·N/k`
    * (centroid scoring + fine ranking in the probed partitions),
    * minimized at k = √(nprobe·N) — the classical IVF operating
    * point (FAISS's own guideline is k between √N and 16√N). The
    * trade vs k ∝ N: build drops from O(N²/target) to O(N^1.5)
    * (it stops being the refit-cadence wall), per-batch probe grows
    * as √N instead of staying flat — and at today's corpus sizes the
    * √N probe is CHEAPER anyway, because k ∝ N's k already exceeds
    * the √-optimum (198k manifest: k=3094 vs 446 — centroid scoring
    * dominates its probe). Same deterministic fit, same
    * `fitSampleMod` bound, oracle-mirrorable with
    * `ceil(sqrt(count(*)))` (IEEE sqrt is correctly rounded —
    * engine-portable). */
  def ivfIndexBuildSqrt(manifest: DataFrame, iters: Int,
      fitSampleMod: Long = 1L): IvfIndex =
    ivfIndexBuildWithK(manifest,
      n => math.ceil(math.sqrt(n.toDouble)).toInt, iters, fitSampleMod)

  private def ivfIndexBuildWithK(manifest: DataFrame,
      kOf: Long => Int, iters: Int, fitSampleMod: Long): IvfIndex = {
    require(fitSampleMod >= 1L, "fitSampleMod must be >= 1")
    val base = ivfBase(manifest).select(col("vec_id"), col("emb"))
    val n = base.count()
    val kClusters = math.max(1, kOf(n))
    val fitBase =
      if (fitSampleMod > 1L) base.filter(col("vec_id") % fitSampleMod === 0)
      else base
    val centroids = kmeansCentroids(fitBase, kClusters, iters)
    IvfIndex(centroids, assignClusters(base, centroids), kClusters)
  }

  /** Probe-only leg of the ingest gate: each incoming vector scores
    * the O(k) centroids, keeps its `nprobe` best partitions, and
    * fine-ranks ONLY against the manifest vectors in them — per-batch
    * cost |batch| × (k + nprobe × targetPartitionSize), flat in the
    * corpus. The fine-rank join on `cid` carries NO broadcast hint:
    * the probed frame scales with the batch (the documented
    * ingest-gate exception to the fixed-|Q| rule), so AQE broadcasts
    * it while a batch fits and shuffles on `cid` beyond the threshold
    * — a forced hint would OOM the driver on a large ingest. */
  def ivfProbe(index: IvfIndex, incoming: DataFrame, k: Int,
      nprobe: Int): DataFrame = {
    val q = ivfBase(incoming)
      .select(col("vec_id").as("new_id"), col("emb").as("q_emb"))
    val probes = q.crossJoin(broadcast(index.centroids))
      .select(col("new_id"), col("q_emb"), col("cid"),
        round(cosine(col("q_emb"), col("centroid")), 6).as("c_sim"))
    val wq = Window.partitionBy(col("new_id"))
      .orderBy(desc("c_sim"), asc("cid"))
    val probed = probes.withColumn("prn", row_number().over(wq))
      .filter(col("prn") <= nprobe)
      .select(col("new_id"), col("q_emb"), col("cid"))
    val scored = index.members.join(probed, Seq("cid"))
      .filter(col("vec_id") =!= col("new_id"))
      .select(col("new_id"), col("vec_id").as("match_id"),
        round(cosine(col("q_emb"), col("emb")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("new_id"))
      .orderBy(desc("cos_sim"), asc("match_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Index MAINTENANCE without refit — the ANN ingest gate, the
    * vector-side sibling of [[Dedup.minhashLshIncremental]]: the
    * `manifest` frame is the already-ingested corpus whose IVF index
    * EXISTS ([[ivfIndexBuild]] — in production, persisted state; here
    * built inline so the catalog entry is self-contained); the
    * `incoming` batch probes that index via [[ivfProbe]] — each new
    * vector is assigned its `nprobe` nearest centroids and fine-ranked
    * ONLY against the manifest vectors in those partitions, emitting
    * its top-`k` attach points (new_id, match_id, cos_sim, rank) for
    * dedup-or-link decisions downstream. The centroids are computed
    * from the MANIFEST alone — appending a batch moves no centroid and
    * re-encodes nothing, exactly how production IVF indexes absorb
    * inserts between refits (the FAISS `add` path).
    *
    * Scale shape: the coarse quantizer's k scales with the manifest
    * (k = ⌈N/targetPartitionSize⌉), so per-batch work is
    * |batch| × (k + nprobe × targetPartitionSize) — linear in the
    * batch, flat in the corpus; never all-pairs, never a refit. |Q|
    * here deliberately scales WITH the batch (the documented
    * ingest-gate exception to the fixed-|Q| rule, same as the MinHash
    * ingest gate). */
  def ivfIncremental(manifest: DataFrame, incoming: DataFrame, k: Int,
      nprobe: Int, targetPartitionSize: Int = 64, iters: Int = 2)
      : DataFrame =
    ivfProbe(ivfIndexBuild(manifest, targetPartitionSize, iters),
      incoming, k, nprobe)

  /** [[ivfIncremental]] on the √N-cluster index
    * ([[ivfIndexBuildSqrt]]) — the bounded-k ingest gate for corpora
    * where the k ∝ N build cost (O(N²/target)) outruns the refit
    * cadence. Identical probe machinery; only the coarse quantizer's
    * k rule changes. */
  def ivfIncrementalSqrt(manifest: DataFrame, incoming: DataFrame,
      k: Int, nprobe: Int, iters: Int = 2): DataFrame =
    ivfProbe(ivfIndexBuildSqrt(manifest, iters), incoming, k, nprobe)

  // NULL embeddings drop on the Spark side too (the oracle filters
  // `embedding IS NOT NULL`): a NULL row kept here would enter fine
  // ranking with a NULL cos_sim and surface whenever a probed label
  // partition holds fewer than k non-NULL candidates — a one-sided
  // divergence the other ANN bases (lshBase, int8Base, ivfTopKInt8,
  // ivfTopKKmeansImpl) already guard against.
  private def ivfBase(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), col("label"),
        toDouble(col("embedding")).as("emb"))
      .filter(col("emb").isNotNull)

  private def ivfTopKImpl(embeddings: DataFrame,
      mkQ: DataFrame => DataFrame, k: Int, nprobe: Int): DataFrame = {
    val base = ivfBase(embeddings)
    val q = mkQ(base)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    ivfCore(base, q, k, nprobe)
  }

  /** Metadata-FILTERED ANN — the vector-search feature every modern
    * deployment needs ("nearest neighbors among documents WHERE
    * <predicate>"): the predicate restricts CANDIDATES, not the
    * index. Centroids are still built from the full corpus (the
    * stored index is filter-agnostic — a per-filter refit would be
    * absurd at production churn), probing is unchanged, and the
    * predicate applies inside the probed partitions as a pre-filter
    * on the fine-rank scan — in storage terms, a pushed-down column
    * predicate on the partition-pruned index read, the cheapest of
    * the pre/post-filter family (post-filtering top-k then filtering
    * k·selectivity⁻¹ results is the recall trap this form avoids).
    *
    * The residual recall risk is selectivity: a probed partition may
    * hold < k matching candidates, so callers WIDEN nprobe in
    * proportion to 1/selectivity (the catalog entry probes 5 vs the
    * unfiltered 3 at ~1/3 selectivity); SimilaritySpec pins recall
    * against the filtered brute-force ground truth. */
  def ivfTopKFiltered(embeddings: DataFrame, queryIds: DataFrame,
      k: Int, nprobe: Int, candidateFilter: Column): DataFrame = {
    val base = ivfBase(embeddings)
    val q = base.join(broadcast(queryIds), Seq("vec_id"))
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    ivfCore(base, q, k, nprobe,
      candidates = Some(base.filter(candidateFilter)))
  }

  /** [[ivfTopKFiltered]] with nprobe DERIVED from the predicate's
    * measured selectivity — the `_auto` production sibling of the
    * hand-widened form, closing the one knob `s_ann_filtered` left
    * hand-set. Rule (exact integer arithmetic, oracle-mirrorable as a
    * scalar subquery): `nprobe = min(n_labels, ⌈baseNprobe · N /
    * N_match⌉)` — widen the unfiltered default by the inverse
    * selectivity so the EXPECTED number of matching candidates inside
    * the probed partitions stays what `baseNprobe` partitions yield
    * unfiltered (the standard filtered-search recall lever, here tied
    * to a corpus statistic instead of a guess; FAISS documents the
    * same 1/selectivity widening for metadata-filtered IVF search).
    * Clamped at the label count: past that, filtered search IS the
    * exact filtered scan.
    *
    * Cost of the derivation: one O(1)-row aggregate over the base
    * scan (count, match count, label count) — the same bounded
    * driver-side statistic the other `_auto` entries collect. The
    * coarse quantizer stays filter-agnostic ([[ivfCore]]'s contract:
    * centroids always derive from the FULL base — the stored index is
    * shared across predicates). */
  def ivfTopKFilteredAuto(embeddings: DataFrame, queryIds: DataFrame,
      k: Int, baseNprobe: Int, candidateFilter: Column): DataFrame = {
    val base = ivfBase(embeddings)
    val nprobe = autoNprobe(base, baseNprobe, candidateFilter)
    val q = base.join(broadcast(queryIds), Seq("vec_id"))
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    ivfCore(base, q, k, nprobe,
      candidates = Some(base.filter(candidateFilter)))
  }

  /** TWO-LEVEL coarse quantizer ANN (IMI-style hierarchy, Babenko &
    * Lempitsky's inverted multi-index argument specialized to a
    * label×sub-cluster grid): level 1 is the exact per-label centroid
    * index the IVF family stores; level 2 fits an INDEPENDENT
    * deterministic k-means of `k2` sub-clusters INSIDE each label
    * (seeds = the k2 smallest vec_ids per label, same rounded-cosine
    * assignment and decimal-mean updates as [[kmeansCentroids]], so
    * the whole grid is engine-portable and the DuckDB oracle unrolls
    * it with `label` added to every GROUP BY / PARTITION BY).
    *
    * WHY a hierarchy — the assignment-cost wall this retires: a flat
    * quantizer with C cells pays N·C candidate evaluations to assign
    * the corpus (the measured k ∝ N quadratic wall; √N bounds it at
    * O(N^1.5)). Two levels pay N·(k1 + k2) for k1·k2 cells — at 2M
    * vectors and a 31k-cell grid that is ~7×10⁸ evaluations instead
    * of 6×10¹⁰. Probe cost factors the same way: k1 coarse dots +
    * nprobe1·k2 sub-cluster dots + fine ranking inside
    * nprobe1·nprobe2 cells of ~N/(k1·k2) vectors each — finer
    * pruning granularity than one-level IVF at equal per-query
    * centroid work. This is the production regime FAISS reaches with
    * IMI/HNSW coarse quantizers once a flat coarse index stops
    * amortizing.
    *
    * Per-probed-label sub-cluster selection (`nprobe2` best cells per
    * probed label, not a global cell top-n) keeps the window
    * SQL-mirrorable and the probed-cell count exactly
    * nprobe1·nprobe2. Ties: rounded cosine then smallest id at both
    * levels, the family rule. */
  def ivfTopKTwoLevel(embeddings: DataFrame, queryIds: DataFrame,
      k: Int, nprobe1: Int, nprobe2: Int, k2: Int,
      iters: Int): DataFrame = {
    val base = ivfBase(embeddings)
    val cent1 = labelCentroids(base)
    val seedW = Window.partitionBy(col("label")).orderBy(col("vec_id"))
    var cents2 = base
      .withColumn("rn", row_number().over(seedW))
      .filter(col("rn") <= k2)
      .select(col("label"), (col("rn") - 1).cast("int").as("scid"),
        col("emb").as("centroid"))
    for (_ <- 0 until iters) {
      val assigned = assignSubClusters(base, cents2, "label")
      cents2 = assigned
        .select(col("label"), col("scid"),
          posexplode(col("emb")).as(Seq("dim", "v")))
        .groupBy(col("label"), col("scid"), col("dim"))
        .agg((graft.queries.QueryUtil.sumDec(col("v")) /
          count(lit(1))).as("cv"))
        .groupBy(col("label"), col("scid"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("cv")))),
          x => x("cv")).as("centroid"))
        // per-iteration truncation stays REQUIRED here (the
        // broadcast-LUT sub-assign never collects, so the plan would
        // chain geometrically) — routed through Ckpt so reliable mode
        // covers this fit loop too (r14 verdict)
        .transform(Ckpt(_))
    }
    val members = assignSubClusters(base, cents2, "label")
    val q = base.join(broadcast(queryIds), Seq("vec_id"))
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    val probes1 = q.crossJoin(broadcast(cent1))
      .select(col("query_id"), col("q_emb"), col("label"),
        round(cosine(col("q_emb"), col("centroid")), 6).as("c_sim"))
    val w1 = Window.partitionBy(col("query_id"))
      .orderBy(desc("c_sim"), asc("label"))
    val probed1 = probes1.withColumn("prn", row_number().over(w1))
      .filter(col("prn") <= nprobe1)
      .select(col("query_id"), col("q_emb"), col("label"))
    val probes2 = probed1.join(broadcast(cents2), Seq("label"))
      .select(col("query_id"), col("q_emb"), col("label"), col("scid"),
        round(cosine(col("q_emb"), col("centroid")), 6).as("s_sim"))
    val w2 = Window.partitionBy(col("query_id"), col("label"))
      .orderBy(desc("s_sim"), asc("scid"))
    val probed2 = probes2.withColumn("srn", row_number().over(w2))
      .filter(col("srn") <= nprobe2)
      .select(col("query_id"), col("q_emb"), col("label"), col("scid"))
    val scored = members.join(broadcast(probed2), Seq("label", "scid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("q_emb"), col("emb")), 6).as("cos_sim"))
    rankTopK(scored, k)
  }

  /** Sub-cluster assignment for the two-level grid: the per-group
    * codebooks collapse to ONE LUT row per group key (scid-sorted
    * centroid + id arrays), broadcast-hash-joined on `key` — no row
    * expansion (1 LUT row per group), no N-group aggregate, no plan
    * literal — and each row takes `array_max` over its OWN group's k2
    * candidates as a projection. Per-row candidate count is k2
    * regardless of how many groups exist; the broadcast is k1 rows of
    * k2·dim doubles (the grid contract). A map-literal variant of
    * this projection measured ~10× slower end-to-end at sf0.01: the
    * k1·k2·dim literal re-enters analysis + Janino per assign, the
    * exact cold-cost pathology the [[lshBucket]] kernel note
    * documents — the broadcast row keeps plans small instead. `key`
    * is `label` for the ANN grid, `cid` for the hierarchical
    * SemDeDup ([[semDedupHier]]). */
  private def assignSubClusters(base: DataFrame,
      cents2: DataFrame, key: String): DataFrame = {
    // r16: when the sub-codebook is ALREADY a LocalRelation (the
    // LUT-gated loop state / final fit frame — [[asLocalRelation]]),
    // group+sort it on the DRIVER instead of through the aggregate:
    // the broadcast then builds from a LocalRelation (job-free
    // executeCollect) where the aggregate form submitted one
    // 32-slice LocalTableScan stage job per consumer. Identical
    // rows: the SQL form's array_sort(collect_list(struct(scid,
    // centroid))) is a lexicographic struct sort whose FIRST field
    // (scid) is unique within a key, so sorting by scid alone
    // realizes the same order (SimilaritySpec pins the two forms).
    val lut = cents2.queryExecution.logical match {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        subClusterLutLocal(cents2, key)
      case _ =>
        cents2
          .groupBy(col(key))
          .agg(array_sort(collect_list(
            struct(col("scid"), col("centroid")))).as("_sl"))
          .select(col(key),
            transform(col("_sl"), e => e("centroid")).as("_cents"),
            transform(col("_sl"), e => e("scid")).as("_scids"))
    }
    val cands = zip_with(col("_cents"), col("_scids"),
      (c, id) => struct(round(cosine(col("emb"), c), 6).as("a_sim"),
        (-id).as("neg_scid"), id.as("scid")))
    base.join(broadcast(lut), Seq(key))
      .select(col("vec_id"), col(key), col("emb"),
        array_max(cands).getField("scid").as("scid"))
  }

  /** Driver-side construction of the (key, _cents, _scids) LUT frame
    * from a LOCAL sub-codebook frame — see [[assignSubClusters]]. */
  private def subClusterLutLocal(cents2: DataFrame, key: String)
      : DataFrame = {
    import org.apache.spark.sql.types._
    val schema = cents2.schema
    val iKey = schema.fieldIndex(key)
    val iScid = schema.fieldIndex("scid")
    val iCent = schema.fieldIndex("centroid")
    val rows = cents2.collect() // job-free: LocalTableScan
    val grouped = rows.groupBy(_.get(iKey)).toSeq.map { case (k, rs) =>
      val sorted = rs.sortBy(_.getInt(iScid))
      org.apache.spark.sql.Row(k,
        sorted.map(_.getSeq[Double](iCent)).toSeq,
        sorted.map(_.getInt(iScid)).toSeq)
    }
    cents2.sparkSession.createDataFrame(
      java.util.Arrays.asList(grouped: _*),
      StructType(Seq(schema(key),
        StructField("_cents", ArrayType(ArrayType(DoubleType))),
        StructField("_scids", ArrayType(IntegerType)))))
  }

  /** The selectivity-derived nprobe rule shared by the filtered
    * `_auto` entries: `min(n_labels, ⌈baseNprobe · N / N_match⌉)`,
    * exact integer arithmetic over one O(1)-row aggregate of the
    * (vec_id, label, …) base frame. */
  private[graft] def autoNprobe(base: DataFrame, baseNprobe: Int,
      candidateFilter: Column): Int = {
    val st = base.agg(count(lit(1)).as("n"),
      count(when(candidateFilter, lit(1))).as("m"),
      countDistinct(col("label")).as("l")).head()
    val (n, m, l) = (st.getLong(0), st.getLong(1), st.getLong(2))
    require(m > 0, "candidateFilter matches no rows — nothing to rank")
    math.min(l, (baseNprobe.toLong * n + m - 1) / m).toInt
  }

  /** Shared IVF probe + fine-rank core: centroids from `base`'s
    * label partitions, `q` probes its `nprobe` best partitions,
    * fine ranking only within them (restricted to `candidates` when
    * given — the filtered-search form; centroids ALWAYS derive from
    * the full `base`, the filter-agnostic stored index). */
  private def ivfCore(base: DataFrame, q: DataFrame, k: Int,
      nprobe: Int, candidates: Option[DataFrame] = None): DataFrame = {
    // centroid per label via explode-by-dimension — scales to any
    // partition size (no per-group collect of whole vectors). The
    // component mean uses the exact-decimal sum (QueryUtil strategy):
    // engine AVG accumulates doubles in partition order, which is
    // nondeterministic across runs and engines; this form is
    // order-independent and SQL-reproducible (→ DuckDB oracle).
    val centroids = base
      .select(col("label"), posexplode(col("emb")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg((graft.queries.QueryUtil.sumDec(col("v")) /
        count(lit(1))).as("cv"))
      .groupBy(col("label"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("cv")))),
        x => x("cv")).as("centroid"))
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("q_emb"), col("label"),
        round(cosine(col("q_emb"), col("centroid")), 6).as("c_sim"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(desc("c_sim"), asc("label"))
    val probed = probes.withColumn("prn", row_number().over(wq))
      .filter(col("prn") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("label"))
    val scored = candidates.getOrElse(base)
      .join(broadcast(probed), Seq("label"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("q_emb"), col("emb")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos_sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF × int8 — the production composition of the two ANN levers.
    * [[ivfTopK]]'s coarse quantizer prunes the corpus to `nprobe`
    * label partitions per query, and EVERY pair score downstream of
    * quantization (probe selection and fine ranking) runs on the
    * 72-byte int8 codes — so a 100-TB pass gets both the
    * nprobe/k_clusters candidate reduction and the ~7× byte reduction
    * on everything broadcast or shuffled. Centroids are the exact
    * decimal-arithmetic per-label means of [[ivfTopK]] (computed once
    * from the double embeddings, engine-portable), then quantized
    * with the identical formula as the corpus, so a DuckDB oracle
    * reproduces both levels bit-for-bit and the entry is
    * hash-verified. The query set is a fixed-size id frame
    * ([[sampleQueryIds]]): total work O(|Q|·(k_clusters +
    * nprobe·|C|/k_clusters)) — linear in the corpus, unlike the
    * brute [[int8TopK]] baseline with a proportional predicate.
    * One corpus scan: the double base persists across the centroid
    * aggregation and the quantization, then releases (the
    * [[cosineDupPairs]] leak-avoidance pattern). */
  def ivfTopKInt8(embeddings: DataFrame, queryIds: DataFrame, k: Int,
      nprobe: Int): DataFrame = {
    import graft.functions.QuantizeOps._
    val base0 = embeddings.select(col("vec_id"), col("label"),
        toDouble(col("embedding")).as("emb"))
      .filter(col("emb").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cq = quantizedLabelCentroids(base0)
    val base = int8LabelBase(base0)
    val q = base.join(broadcast(queryIds), Seq("vec_id"))
      .select(col("vec_id").as("query_id"),
        col("qv").as("q_qv"), col("qn").as("q_qn"))
    val probes = q.crossJoin(broadcast(cq))
      .select(col("query_id"), col("q_qv"), col("q_qn"), col("label"),
        round(dot_i8(col("q_qv"), col("c_qv")).cast("double") /
          (col("q_qn") * col("c_qn")), 6).as("c_sim"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(desc("c_sim"), asc("label"))
    val probed = probes.withColumn("prn", row_number().over(wq))
      .filter(col("prn") <= nprobe)
      .select(col("query_id"), col("q_qv"), col("q_qn"), col("label"))
    val topk = rankTopK(
      base.join(broadcast(probed), Seq("label"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          round(dot_i8(col("q_qv"), col("qv")).cast("double") /
            (col("q_qn") * col("qn")), 6).as("cos_sim")), k)
    val out = topk.localCheckpoint()
    base0.unpersist()
    out
  }

  /** Two-stage retrieval (coarse ANN + exact rerank) — the standard
    * production composition for recall-critical search: the IVF×int8
    * index of [[ivfTopKInt8]] generates `kCoarse` cheap candidates
    * per query, then ONLY those candidates are re-scored with the
    * exact double-precision cosine and the true top `k` kept. The
    * coarse stage eats the corpus-scale work on 72-byte codes; the
    * exact stage touches raw vectors for just |Q|·kCoarse pairs —
    * reattached by a vec_id equi-join against the corpus scan (ship
    * ids, not payloads; the small candidate side broadcast-joins), so
    * no corpus-sized frame is ever broadcast and recall losses from
    * quantization at the final ranking are repaired at negligible
    * cost. Deterministic end-to-end (both stages round before
    * ranking, ties by neighbor_id) and fully oracle-reproducible. */
  def ivfInt8RerankTopK(embeddings: DataFrame, queryIds: DataFrame,
      k: Int, kCoarse: Int, nprobe: Int): DataFrame = {
    val coarse = ivfTopKInt8(embeddings, queryIds, kCoarse, nprobe)
      .select(col("query_id"), col("neighbor_id"))
    val base = embeddings.select(col("vec_id"),
        toDouble(col("embedding")).as("emb"))
      .filter(col("emb").isNotNull)
    val q = base.join(broadcast(queryIds), Seq("vec_id"))
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    val exact = coarse
      .join(base.select(col("vec_id").as("neighbor_id"),
        col("emb").as("n_emb")), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q_emb"), col("n_emb")), 6).as("cos_sim"))
    rankTopK(exact, k)
  }

  /** Int8-quantized per-label centroid frame (label, c_qv, c_qn)
    * shared by the IVF×int8 scorers: the exact decimal-arithmetic
    * per-label means of [[ivfTopK]] (order-independent and
    * SQL-reproducible), then quantized with the identical portable
    * formula as the corpus codes. */
  private def quantizedLabelCentroids(base0: DataFrame): DataFrame = {
    import graft.functions.QuantizeOps._
    base0
      .select(col("label"), posexplode(col("emb")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg((graft.queries.QueryUtil.sumDec(col("v")) /
        count(lit(1))).as("cv"))
      .groupBy(col("label"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("cv")))),
        x => x("cv")).as("centroid"))
      .select(col("label"), quantize_i8(col("centroid")).as("c_qv"))
      .withColumn("c_qn",
        sqrt(dot_i8(col("c_qv"), col("c_qv")).cast("double")))
      .filter(col("c_qn") > 0)
  }

  /** Quantized labeled corpus (vec_id, label, qv, qn) — the only
    * frame that flows into IVF×int8 pair scoring (same NULL/zero-norm
    * drops as [[int8Base]], plus the label key). */
  private def int8LabelBase(base0: DataFrame): DataFrame = {
    import graft.functions.QuantizeOps._
    base0
      .select(col("vec_id"), col("label"), quantize_i8(col("emb")).as("qv"))
      .filter(col("qv").isNotNull)
      .withColumn("qn", sqrt(dot_i8(col("qv"), col("qv")).cast("double")))
      .filter(col("qn") > 0)
  }

  /** Semantic deduplication (the SemDeDup recipe, Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus with the deterministic
    * k-means of [[kmeansCentroids]], compute exact pairwise cosine
    * only WITHIN each cluster, and drop every vector that is
    * ≥ `threshold`-similar to a smaller-id vector in its cluster
    * (greedy keep-smallest-id — deterministic and SQL-mirrorable).
    * Output: one row per input vector — (vec_id, cid, kept).
    *
    * Scale shape: the quadratic step is confined to clusters. Total
    * pair work is Σ|cluster|² ≈ N²/k for balanced clusters, so at
    * corpus scale `kClusters` grows with N (the paper runs k≈11k on
    * 100M embeddings, mean cluster ≈10⁴) — the per-cluster join is an
    * equi-join on `cid`, hash-partitioned, never all-pairs. A skewed
    * (oversized) cluster concentrates work on one key; the mitigation
    * at scale is raising k (cluster size is a tuning invariant, like
    * the Jaccard block cap). Only (vec_id, cid) rows shuffle into the
    * pair join; vectors reattach by id equi-join afterward — same
    * ship-ids-not-payload shape as [[cosineDupPairs]].
    *
    * `fitSampleMod` > 1 trains the k-means on the DETERMINISTIC
    * `vec_id % fitSampleMod == 0` sample (seeds and every Lloyd pass
    * — the [[pqTopK]]/[[ivfIndexBuild]] production bound; FAISS
    * trains quantizers on a sample) while the FULL corpus is still
    * assigned and pair-pruned: the fit drops from O(N·k·iters) to
    * O(N·k·iters/mod) and the modulus stays SQL-mirrorable. Dedup
    * SEMANTICS are unchanged — clusters are only the blocking
    * structure; every vector still competes within its cell. */
  def semDedup(embeddings: DataFrame, kClusters: Int, iters: Int,
      threshold: Double, dim: Int = 64,
      fitSampleMod: Long = 1L): DataFrame = {
    require(fitSampleMod >= 1L, "fitSampleMod must be >= 1")
    val base = semDedupBase(embeddings, dim)
    try {
      val fitBase =
        if (fitSampleMod > 1L) base.filter(col("vec_id") % fitSampleMod === 0)
        else base
      val centroids = kmeansCentroids(fitBase, kClusters, iters)
      val members = assignClusters(base, centroids)
      // semDedupPrune checkpoints its output, so unpersisting base in
      // the finally below never strands the returned frame's lineage
      semDedupPrune(members, Seq("cid"), threshold)
    } finally {
      // reclaim the corpus-sized frame on every exit path (the
      // PageRank/MvRefresh rule): a failed Lloyd pass or pair join
      // must not strand MEMORY_AND_DISK blocks
      base.unpersist()
    }
  }

  /** Shared input guard of the SemDeDup family — same policy as
    * cosineDupPairs/lshTopK: NULL embeddings drop (they can never
    * pair), a dim mismatch fails fast — dot_product would otherwise
    * NULL every cosine and the threshold filter would silently drop
    * nothing (dedup no-op with bogus cids; a NULL seed would even
    * NULL assignments corpus-wide). Persisted: the frame feeds the
    * fit passes and the final assignment. */
  private def semDedupBase(embeddings: DataFrame, dim: Int): DataFrame =
    embeddings.select(col("vec_id"),
        toDouble(col("embedding")).as("emb"))
      .filter(col("emb").isNotNull)
      .filter(coalesce(assert_true(size(col("emb")) === dim,
        lit(s"semDedup: embedding dim != $dim")), lit(true)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Shared pair-pruning tail of the SemDeDup family: exact pairwise
    * cosine only WITHIN each cell (the `cellKeys` grouping of the
    * assigned membership frame), greedy keep-smallest-id.
    *
    * Physical shape (the r12 multiplicity finding): identical vectors
    * assign identically, so the pair join runs over DISTINCT
    * (cell, value) GROUPS — each collapsed to its min-id
    * representative — never over members. Member `b` is dropped iff
    * some qualifying group's representative id < b's vec_id, where
    * group A qualifies against b's group B when round(cos(A,B),6) ≥
    * threshold — INCLUDING A = B: the self-cosine rounds to exactly
    * 1.0 (x/(√x·√x) is within 1 ulp of 1), so own-group
    * qualification is precisely the `threshold ≤ 1` test and
    * non-representative members drop exactly as the member-level
    * rule dictates (their rep is a smaller-id vector at cosine 1).
    * An EXACT rewrite for every threshold — the DuckDB oracles
    * verify it unchanged — that makes pair work quadratic in
    * DISTINCT values per cell instead of in members: dedup corpora
    * are dup-heavy BY DEFINITION, and the member-level form pays
    * multiplicity² per value (the 1000× probe corpus, 2k distinct
    * values × 1000 copies, filled 80 GB of shuffle spill in the
    * member form; the group form's pair frame is 2k rows).
    * Output: one row per input vector — (vec_id, cellKeys…, kept). */
  private def semDedupPrune(members0: DataFrame, cellKeys: Seq[String],
      threshold: Double): DataFrame = {
    def dot(x: Column, y: Column): Column =
      graft.functions.ArrayOps.dot_product(x, y)
    // members feeds the group collapse and the final output —
    // checkpoint so assignment runs once, not twice
    val members = members0.localCheckpoint()
    val keys = cellKeys.map(col)
    val groups = members
      .groupBy(keys :+ col("emb"): _*)
      .agg(min(col("vec_id")).as("rep_id"))
      .withColumn("norm", sqrt(dot(col("emb"), col("emb"))))
    val cellEq = cellKeys.map(k => col(s"a.$k") === col(s"b.$k"))
      .reduce(_ && _)
    // directed qualifying pairs a → b over groups (a = b included —
    // self-cosine 1.0 makes own-group qualification ≡ threshold ≤ 1)
    val minQual = groups.alias("a").join(groups.alias("b"), cellEq)
      .filter(round(dot(col("a.emb"), col("b.emb")) /
        (col("a.norm") * col("b.norm")), 6) >= threshold)
      .groupBy(cellKeys.map(k => col(s"b.$k")) :+ col("b.emb"): _*)
      .agg(min(col("a.rep_id")).as("min_rep"))
    members
      .join(minQual, cellKeys :+ "emb", "left")
      .select(col("vec_id") +: keys :+
        (col("min_rep").isNull || col("min_rep") >= col("vec_id"))
          .as("kept"): _*)
      .localCheckpoint()
  }

  /** [[semDedup]] with the cluster count derived from the corpus:
    * k = ⌈n / targetClusterSize⌉ (min 2). This is the production
    * recipe as code — the 10× scale probe measured fixed-k as ~56×
    * slower for 10× data (pair work Σ|c|² is quadratic in cluster
    * size) while scaled-k restores ~linear cost; see BASELINE.md.
    * Costs one count() job up front; the catalog query keeps an
    * explicit k because its unrolled-iteration SQL oracle needs a
    * literal cluster count. `fitSampleMod` bounds the fit corpus as
    * in [[semDedup]] — with k ∝ N the FULL fit pays O(N²/target) per
    * Lloyd pass, the measured assignment wall of the k ∝ N family;
    * the sampled fit divides it by `mod`, and [[semDedupHier]] is
    * the structural answer beyond that. */
  def semDedupAuto(embeddings: DataFrame, targetClusterSize: Long,
      iters: Int, threshold: Double, dim: Int = 64,
      fitSampleMod: Long = 1L): DataFrame = {
    require(targetClusterSize >= 1, "targetClusterSize must be >= 1")
    val n = embeddings.count()
    val k = math.max(2L, (n + targetClusterSize - 1) / targetClusterSize)
      .min(Int.MaxValue).toInt
    semDedup(embeddings, k, iters, threshold, dim, fitSampleMod)
  }

  /** HIERARCHICAL SemDeDup — the two-level cell structure that
    * retires the flat k ∝ N variant's assignment wall structurally
    * (the [[ivfTopKTwoLevel]] argument applied to dedup blocking):
    * level 1 is a deterministic k-means of k₁ = ⌈√⌈N/target⌉⌉
    * clusters, level 2 an independent per-cluster k-means of the same
    * k₂ = k₁ sub-clusters, so the k₁·k₂ ≥ N/target cells keep mean
    * cell size ≤ ~target while EVERY assignment pass costs
    * N·(k₁+k₂) = O(N·√(N/target)) candidate evaluations instead of
    * the flat grid's N·k = O(N²/target) — at 2M vectors and
    * target 64, ~7×10⁸ instead of 6×10¹⁰. Pair work stays linear
    * (Σ|cell|² ≈ N·target for balanced cells). Dedup semantics are
    * the family's: exact within-cell cosine, greedy keep-smallest-id;
    * both fit levels and both assignments are deterministic
    * (smallest-vec_id seeds, rounded cosine, decimal-mean updates) so
    * the whole hierarchy unrolls into the DuckDB oracle with `cid`
    * added to every level-2 GROUP BY / PARTITION BY.
    *
    * Distributed shape: level-1 assignment is the [[assignClusters]]
    * projection (broadcast-row LUT above the literal gate); level-2
    * sub-assignment is [[assignSubClusters]] keyed on `cid` — one
    * broadcast LUT row per level-1 cluster, per-row candidate count
    * k₂ regardless of cell count. The broadcast is k₁·k₂·dim doubles
    * (~16 MB at 2M vectors / target 64); beyond ~100M vectors the
    * LUT itself outgrows broadcast and the join would shuffle on
    * `cid` — the same regime where production moves to an HNSW
    * coarse quantizer. */
  /** `fitSampleMod` > 1 trains BOTH k-means levels on deterministic
    * samples (the family's `fitSampleMod` lever, through the
    * hierarchy): level 1 fits on the `vec_id % mod == 0` slice of the
    * corpus; level 2 fits, per level-1 cell, on that cell's sampled
    * members PLUS the cell's min-id member — the fallback row that
    * keeps a cell with no sampled members seeded (otherwise its
    * members would have no level-2 centroids to assign to). Both
    * full-corpus assignments and the pair prune are unchanged; the
    * whole rule is integer-exact and unrolls into the oracle. */
  def semDedupHier(embeddings: DataFrame, targetCellSize: Long,
      iters: Int, threshold: Double, dim: Int = 64,
      fitSampleMod: Long = 1L): DataFrame = {
    require(targetCellSize >= 1, "targetCellSize must be >= 1")
    require(fitSampleMod >= 1L, "fitSampleMod must be >= 1")
    val base = semDedupBase(embeddings, dim)
    try {
    // k derives from the FULL corpus count — the cell grid is a
    // layout property of the corpus, not of the fit sample
    val n = base.count()
    val (_, cents2, m1) = hierFit(base, hierGridK(n, targetCellSize),
      iters, fitSampleMod)
    val members = assignSubClusters(m1, cents2, "cid")
    // prune checkpoints its output — safe to unpersist base below
    semDedupPrune(members, Seq("cid", "scid"), threshold)
    } finally {
      // every exit path reclaims the corpus-sized frame (the
      // PageRank/MvRefresh rule)
      base.unpersist()
    }
  }

  /** The hier grid rule shared by [[semDedupHier]] and the ingest
    * gate's [[semDedupFit]]: k₁ = k₂ = ⌈√⌈n/target⌉⌉ (min 2) — /2⁶
    * and IEEE sqrt/ceil are exactly rounded, so the derivation is
    * engine-portable as one integer scalar subquery in the oracle. */
  private def hierGridK(n: Long, target: Long): Int =
    math.max(2, math.ceil(math.sqrt(
      math.ceil(n.toDouble / target))).toInt)

  /** The two-level fit shared by [[semDedupHier]] and [[semDedupFit]]
    * (EXACT extraction of the r13 hier body): level 1 is a k-cluster
    * k-means over `base` (or its `fitSampleMod` slice), level 2 an
    * independent per-cell k-means of the same k over each cell's fit
    * members (sampled members + the cell's min-id fallback row under
    * sampling — the row that keeps sample-free cells seeded). Returns
    * (level-1 centroids, level-2 centroids keyed (cid, scid), the
    * checkpointed level-1 assignment of the FULL base). Every cid
    * with ≥1 base member carries level-2 structure, and every cid in
    * `cents2` is backed by ≥1 base member (a cell empty in the fresh
    * level-1 assignment has no rows to seed from and drops out) —
    * the occupancy fact [[semDedupGateBatch]]'s restricted incoming
    * assignment relies on. */
  private def hierFit(base: DataFrame, k: Int, iters: Int,
      fitSampleMod: Long): (DataFrame, DataFrame, DataFrame) = {
    val fitBase =
      if (fitSampleMod > 1L) base.filter(col("vec_id") % fitSampleMod === 0)
      else base
    val cent1 = kmeansCentroids(fitBase, k, iters)
    // m1 feeds every level-2 fit pass and the final sub-assignment —
    // checkpoint so level-1 assignment runs once
    val m1 = Ckpt(assignClusters(base, cent1))
    val m1fit =
      if (fitSampleMod > 1L) {
        val mw = Window.partitionBy(col("cid"))
        m1.withColumn("mn", min(col("vec_id")).over(mw))
          .filter(col("vec_id") % fitSampleMod === 0 ||
            col("vec_id") === col("mn"))
          .drop("mn")
          .transform(Ckpt(_)) // sample-sized; seeds + both Lloyd passes
      } else m1
    val seedW = Window.partitionBy(col("cid")).orderBy(col("vec_id"))
    var cents2 = m1fit
      .withColumn("rn", row_number().over(seedW))
      .filter(col("rn") <= k)
      .select(col("cid"), (col("rn") - 1).cast("int").as("scid"),
        col("emb").as("centroid"))
    // Level-2 loop state (round 16): the grid is k×k cells, so within
    // the LUT gate (k² ≤ AssignLutMaxCentroids — every catalog tier;
    // k² ≈ n/target crosses it only at corpus scale) each update
    // collects ONCE into a LocalRelation instead of checkpointing —
    // flat lineage without the per-iteration truncation job, and the
    // returned state broadcasts/filters job-free in the gate batches.
    // Past the gate (or in reliable mode) the Ckpt form is unchanged.
    // r13's rejected alternative embedded the grid as a MAP LITERAL
    // (~10× slower cold — Janino re-entry per assign, see
    // [[assignSubClusters]]); a LocalRelation carries the rows as
    // data, not expression nodes, so that pathology cannot arise.
    val localLoop = k.toLong * k <= AssignLutMaxCentroids &&
      !reliableMode(m1fit)
    // the seed localizes too, so iteration 1's assign already takes
    // the driver-built-LUT branch of [[assignSubClusters]] (the seed
    // window executes exactly once either way — here as the collect
    // instead of inlined under iteration 1's broadcast aggregate)
    if (localLoop) cents2 = asLocalRelation(cents2)
    for (_ <- 0 until iters) {
      val assigned = assignSubClusters(m1fit, cents2, "cid")
      val updated = assigned
        .select(col("cid"), col("scid"),
          posexplode(col("emb")).as(Seq("dim", "v")))
        .groupBy(col("cid"), col("scid"), col("dim"))
        .agg((graft.queries.QueryUtil.sumDec(col("v")) /
          count(lit(1))).as("cv"))
        .groupBy(col("cid"), col("scid"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("cv")))),
          x => x("cv")).as("centroid"))
      cents2 =
        if (localLoop) asLocalRelation(updated) else Ckpt(updated)
    }
    (cent1, cents2, m1)
  }

  /** INCREMENTAL SemDeDup — the ingest gate of the dedup family (the
    * [[ivfIncremental]] shape applied to semantic dedup, the sibling
    * of the MinHash manifest gate): the cluster structure is fitted
    * on the MANIFEST only with the HIERARCHICAL two-level grid
    * ([[hierFit]], k₁ = k₂ = ⌈√⌈N_man/target⌉⌉ — at scale this is
    * the amortized index the batches reuse until the next refit),
    * each incoming vector is assigned to its manifest (cell,
    * sub-cell), and it is dropped iff it is ≥ `threshold`-similar
    * to ANY manifest vector in that sub-cell or to a SMALLER-ID
    * incoming vector in it (the family's one-pass greedy rule, so a
    * batch that contains its own duplicates keeps exactly the
    * smallest id). Output: one row per incoming vector — (vec_id,
    * cid, scid, kept); the manifest is never re-judged (it IS the
    * kept corpus).
    *
    * The r13 form fit the FLAT k ∝ N_man grid here — the family's
    * measured assignment wall (every refit pays N_man·k =
    * O(N²/target) per Lloyd pass, and every batch pays |B|·k): the
    * r12 campaign measured the flat gate at 110.4 s vs hier 14.1 s
    * at the 100× tier, with the 1000× flat legs gated by policy.
    * Composing [[hierFit]] (r14) puts BOTH the refit and the
    * per-batch assignment on the hier cost line: refit Lloyd passes
    * are N_man·√k̄-class, batches pay |B|·2k₁ = O(|B|·√(N_man/t)).
    *
    * Per-batch cost is bounded by the batch: |B| · 2k₁ assignment
    * plus the within-sub-cell pair join, which runs over distinct
    * (cell, value) GROUPS (the [[semDedupPrune]] multiplicity
    * collapse — exact for every threshold): a dup-heavy batch, the
    * regime an ingest gate exists for, pays distinct-values² per
    * sub-cell, never multiplicity². Deterministic end to end, so the
    * whole gate hash-verifies via the two-level split fit/assign
    * oracle fragment. */
  def semDedupIncremental(manifest: DataFrame, incoming: DataFrame,
      targetClusterSize: Long, iters: Int, threshold: Double,
      dim: Int = 64, fitSampleMod: Long = 1L): DataFrame =
    semDedupGateBatch(
      semDedupFit(manifest, targetClusterSize, iters, dim,
        fitSampleMod),
      incoming, threshold, dim)

  /** The FITTED state of the semantic-dedup ingest gate — what a
    * deployment keeps between refits (the amortized index of the
    * manifest-gate trio, the [[IvfIndex]] sibling): the manifest's
    * TWO-LEVEL cluster centroids ([[hierFit]]) plus its distinct
    * (cell, sub-cell, value) groups with min-id representatives. All
    * three frames are checkpointed and O(manifest) at most; every
    * incoming batch is judged against this state without touching
    * manifest text again. */
  case class SemDedupState(centroids1: DataFrame,
      centroids2: DataFrame, manGroups: DataFrame)

  /** Fit the gate state on the manifest ([[semDedupIncremental]]'s
    * fit half): the [[hierFit]] two-level deterministic k-means
    * (k₁ = k₂ = ⌈√⌈N_man/target⌉⌉, optionally `fitSampleMod`-sampled
    * Lloyd passes) + the manifest's per-sub-cell group collapse. k
    * derives from the NULL-filtered manifest — the frame the fit
    * actually runs on, matching [[semDedupHier]]'s convention. */
  def semDedupFit(manifest: DataFrame, targetClusterSize: Long,
      iters: Int, dim: Int = 64,
      fitSampleMod: Long = 1L): SemDedupState = {
    require(targetClusterSize >= 1, "targetClusterSize must be >= 1")
    def dot(x: Column, y: Column): Column =
      graft.functions.ArrayOps.dot_product(x, y)
    val man = semDedupBase(manifest, dim)
    try {
      val nM = man.count()
      // an EMPTY manifest would fit zero centroids and the gate's
      // occupied-cell restriction would then drop every incoming
      // vector — violating its 'one row per incoming vector'
      // contract (r14 advice). An empty manifest can drop nothing,
      // so there is nothing to fit: fail loudly at fit time (free —
      // nM is already counted) instead of silently emitting an empty
      // gate output per batch.
      require(nM > 0, "semDedupFit: empty manifest — nothing to fit; " +
        "an empty manifest cannot drop incoming vectors, ingest the " +
        "first batch unfiltered instead")
      val (cent1, cents2, m1) = hierFit(man,
        hierGridK(nM, targetClusterSize), iters, fitSampleMod)
      val manGroups = assignSubClusters(m1, cents2, "cid")
        .groupBy(col("cid"), col("scid"), col("emb"))
        .agg(min(col("vec_id")).as("rep_id"))
        .withColumn("norm", sqrt(dot(col("emb"), col("emb"))))
        .transform(Ckpt(_)) // ≤ O(manifest); reused by every batch
      SemDedupState(cent1, cents2, manGroups)
    } finally {
      // the corpus-sized frame reclaimed on every exit path (the
      // PageRank/MvRefresh rule)
      man.unpersist()
    }
  }

  /** Judge ONE incoming batch against a fitted [[SemDedupState]]
    * ([[semDedupIncremental]]'s gate half, and the per-micro-batch
    * body of the STREAMING gate): each incoming vector is assigned to
    * its manifest (cell, sub-cell) and dropped iff ≥
    * `threshold`-similar to any manifest group there or to a
    * smaller-id vector of THIS batch (one-pass greedy within the
    * batch; the state is frozen between refits, so vectors in
    * different batches never judge each other — the documented
    * manifest-gate contract). Output: one row per incoming vector —
    * (vec_id, cid, scid, kept).
    *
    * The batch's level-1 assignment ranks over OCCUPIED cells only
    * (cells with ≥1 manifest member — exactly the cids carrying
    * level-2 structure, [[hierFit]]'s occupancy fact): a level-1
    * centroid can end the fit with zero fresh manifest members, and
    * an incoming vector falling into such a cell would have no
    * sub-cell to assign to and silently vanish from the output;
    * restricted, it re-assigns to its nearest occupied cell and is
    * judged there. The oracle mirrors the restriction (occ/c2o
    * CTEs). `state` must carry ≥1 centroid — [[semDedupFit]], the
    * one constructor, rejects an empty manifest at fit time (an
    * entirely empty state would otherwise empty the output, not
    * keep-all). */
  def semDedupGateBatch(state: SemDedupState, incoming: DataFrame,
      threshold: Double, dim: Int = 64): DataFrame = {
    def dot(x: Column, y: Column): Column =
      graft.functions.ArrayOps.dot_product(x, y)
    val inc = semDedupBase(incoming, dim)
    try {
    val occ1 = state.centroids1.join(
      state.centroids2.select(col("cid")).distinct(),
      Seq("cid"), "left_semi")
    val mInc = Ckpt(assignSubClusters(
      assignClusters(inc, occ1), state.centroids2, "cid"))
    val gInc = Ckpt(mInc
      .groupBy(col("cid"), col("scid"), col("emb"))
      .agg(min(col("vec_id")).as("rep_id"))
      .withColumn("norm", sqrt(dot(col("emb"), col("emb")))))
    // qualifying source groups a for each incoming target group b
    def qual(a: DataFrame): DataFrame = a.alias("a")
      .join(gInc.alias("b"), col("a.cid") === col("b.cid") &&
        col("a.scid") === col("b.scid"))
      .filter(round(dot(col("a.emb"), col("b.emb")) /
        (col("a.norm") * col("b.norm")), 6) >= threshold)
    // manifest side: EXISTENCE — any qualifying manifest value in the
    // sub-cell drops every member of b's group (manifest ids are all
    // "smaller" by contract: the manifest IS the kept corpus)
    val manHit = qual(state.manGroups)
      .groupBy(col("b.cid"), col("b.scid"), col("b.emb"))
      .agg(lit(true).as("man_hit"))
    // incoming side: min qualifying incoming representative (own
    // group included — the threshold ≤ 1 test of [[semDedupPrune]])
    val minInc = qual(gInc)
      .groupBy(col("b.cid"), col("b.scid"), col("b.emb"))
      .agg(min(col("a.rep_id")).as("min_rep"))
    Ckpt(mInc
      .join(manHit, Seq("cid", "scid", "emb"), "left")
      .join(minInc, Seq("cid", "scid", "emb"), "left")
      .select(col("vec_id"), col("cid"), col("scid"),
        (!coalesce(col("man_hit"), lit(false)) &&
         (col("min_rep").isNull || col("min_rep") >= col("vec_id")))
          .as("kept")))
    } finally {
      // the batch-sized frame reclaimed on every exit path
      inc.unpersist()
    }
  }
}
