package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, Similarity, TextStats}
import QueryUtil._

/** Training-data pipeline operators over `documents` / `embeddings`:
  * dedup (exact, Jaccard, MinHash+LSH, SimHash), similarity search
  * (brute-force / LSH / IVF), and text analysis. Every operator
  * carries a DuckDB oracle except the stubbed media decode — the
  * sketch ops use the engine-portable polynomial hash family and
  * plan-literal hyperplanes precisely so their full pipelines are
  * SQL-reproducible.
  */
object TrainingData {

  /** The documents/embeddings testdata arrives as a single parquet
    * split locally, which would serialize all per-doc expression work
    * onto one core; a round-robin repartition spreads it across the
    * session's parallelism. The rebalance is *gated on the actual
    * split count*: at production scale the scan already arrives in
    * thousands of splits and a corpus-wide round-robin shuffle would
    * be the single most expensive operation in the file, so a scan
    * that is already at least as parallel as the session passes
    * through untouched. (Inspecting the scan's partitioning costs
    * only file listing, not a job.) */
  private def spread(df: DataFrame, s: SparkSession): DataFrame = {
    val parallelism = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < parallelism)
      df.repartition(parallelism)
    else df
  }

  private def docs(s: SparkSession, d: String): DataFrame =
    spread(Tables.documents(s, d), s)

  private def embs(s: SparkSession, d: String): DataFrame =
    spread(Tables.embeddings(s, d), s)

  // ---- dedup --------------------------------------------------------
  def dDedupExact(s: SparkSession, d: String): DataFrame =
    Dedup.exact(docs(s, d), "doc_id", "text")
      .orderBy("content_hash")

  /** DuckDB mirror of [[Dedup.contentHash]] — the ONE oracle-side
    * definition of the normalized content hash (exact dedup family). */
  private val sqlContentHash =
    """sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))"""

  private val dDedupExactSql =
    s"""SELECT $sqlContentHash
      |    AS content_hash,
      |  min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin

  /** Snapshot diff ([[Dedup.snapshotDiff]]) — release accounting
    * between two corpus versions, both derived deterministically from
    * the documents table: the previous snapshot lacks doc_id%10==3
    * (those are `added`), the current snapshot lacks doc_id%10==9
    * (`removed`) and revises the text of doc_id%10==7 (`changed`);
    * everything else is `unchanged`. Output one (doc_id, status) row
    * per doc in either snapshot. */
  def dSnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val dd = docs(s, d)
    val prev = dd.filter(col("doc_id") % 10 =!= 3)
    val cur = dd.filter(col("doc_id") % 10 =!= 9)
      .withColumn("text", when(col("doc_id") % 10 === 7,
        concat(col("text"), lit(" rev2"))).otherwise(col("text")))
    Dedup.snapshotDiff(prev, cur, "doc_id", "text")
      .orderBy("doc_id")
  }

  private val dSnapshotDiffSql =
    s"""WITH prev AS (SELECT doc_id, $sqlContentHash AS h
      |  FROM documents WHERE doc_id % 10 <> 3),
      |cur0 AS (SELECT doc_id,
      |    CASE WHEN doc_id % 10 = 7 THEN text || ' rev2'
      |      ELSE text END AS text
      |  FROM documents WHERE doc_id % 10 <> 9),
      |cur AS (SELECT doc_id, $sqlContentHash AS h FROM cur0)
      |SELECT coalesce(p.doc_id, c.doc_id) AS doc_id,
      |  CASE WHEN p.h IS NULL THEN 'added'
      |    WHEN c.h IS NULL THEN 'removed'
      |    WHEN p.h <> c.h THEN 'changed'
      |    ELSE 'unchanged' END AS status
      |FROM prev p FULL JOIN cur c ON p.doc_id = c.doc_id
      |ORDER BY doc_id""".stripMargin

  /** Incremental (cross-snapshot) exact dedup — the daily-ingest
    * shape: a new batch (doc_id % 5 == 0 here) is reduced against the
    * EXISTING corpus. A batch doc is `dup_corpus` if its normalized
    * content hash already exists in the corpus, `dup_batch` if a
    * smaller-id batch doc carries the same hash, else `kept`.
    *
    * Scale shape: at production scale the existing side is a hash
    * MANIFEST (one 64-char column per historical doc), not corpus
    * text — the corpus leg here projects to exactly that. Both the
    * corpus probe and the within-batch min-id election key on the
    * same hash column, so the batch exchange is reused; no text ever
    * shuffles. */
  def dIncrementalDedup(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).select(col("doc_id"), col("source"),
        Dedup.contentHash(col("text")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val batch = base.filter(col("doc_id") % 5 === 0)
    val manifest = base.filter(col("doc_id") % 5 =!= 0)
      .select(col("h")).distinct().withColumn("in_corpus", lit(true))
    val keepers = batch.groupBy(col("h"))
      .agg(min(col("doc_id")).as("keep_id"))
    val out = batch.join(keepers, "h")
      .join(manifest, Seq("h"), "left")
      .select(col("doc_id"), col("source"),
        when(col("in_corpus"), lit("dup_corpus"))
          .when(col("doc_id") =!= col("keep_id"), lit("dup_batch"))
          .otherwise(lit("kept")).as("verdict"))
      .orderBy("doc_id")
      .localCheckpoint()
    base.unpersist()
    out
  }

  private val dIncrementalDedupSql =
    s"""WITH b AS (SELECT doc_id, source, $sqlContentHash AS h
       |  FROM documents WHERE doc_id % 5 = 0),
       |c AS (SELECT DISTINCT $sqlContentHash AS h FROM documents
       |  WHERE doc_id % 5 <> 0),
       |k AS (SELECT h, min(doc_id) AS keep_id FROM b GROUP BY 1)
       |SELECT b.doc_id, b.source,
       |  CASE WHEN c.h IS NOT NULL THEN 'dup_corpus'
       |       WHEN b.doc_id <> k.keep_id THEN 'dup_batch'
       |       ELSE 'kept' END AS verdict
       |FROM b JOIN k USING (h) LEFT JOIN c ON b.h = c.h
       |ORDER BY doc_id""".stripMargin

  def dJaccardPairs(s: SparkSession, d: String): DataFrame =
    Dedup.jaccardPairs(docs(s, d), "doc_id", "text",
      n = 3, threshold = 0.2)
      .withColumn("jaccard", round(col("jaccard"), 6))
      .orderBy("doc_a", "doc_b")

  private val dJaccardPairsSql =
    s"""WITH sh AS (SELECT doc_id, $sqlShingles AS sh
      |  FROM documents),
      |blocked AS (SELECT doc_id, sh, sh[1] AS block FROM sh
      |  WHERE len(sh) > 0)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  round(len(list_intersect(a.sh, b.sh))::DOUBLE /
      |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
      |    AS jaccard
      |FROM blocked a JOIN blocked b
      |  ON a.block = b.block AND a.doc_id < b.doc_id
      |WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
      |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.2
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Exact threshold-Jaccard pairs via PREFIX FILTERING
    * ([[Dedup.jaccardPrefixPairs]], the AllPairs/SSJoin family):
    * lossless candidate pruning on the global df-rarity token order,
    * so — unlike [[dJaccardPairs]]' min-shingle blocking — the result
    * provably equals the all-pairs exact join. The oracle states
    * exactly that: it compares EVERY pair with no pruning, so the
    * hash match IS the recall-1.0 proof. τ = 4/5 as a rational (the
    * prefix length must be exact integer arithmetic): prefix length
    * is (1−τ)·l+1, so the exact join is a HIGH-threshold tool — at
    * τ=0.8 each doc indexes ~l/5 tokens; at τ=0.2 it would index
    * ~4l/5 and candidate volume approaches the all-pairs it exists
    * to avoid (measured in BASELINE.md's τ-sensitivity row). The
    * low-τ regime belongs to MinHash/LSH ([[dMinhashLsh]]), which
    * trades exactly that recall guarantee for τ-independent cost. */
  def dJaccardPrefix(s: SparkSession, d: String): DataFrame =
    Dedup.jaccardPrefixPairs(docs(s, d), "doc_id", "text",
      n = 3, tNum = 4, tDen = 5)
      .withColumn("jaccard", round(col("jaccard"), 6))
      .orderBy("doc_a", "doc_b")

  private val dJaccardPrefixSql =
    s"""WITH sh AS (SELECT doc_id, $sqlShingles AS sh
      |  FROM documents),
      |s2 AS (SELECT doc_id, sh, len(sh) AS l FROM sh
      |  WHERE len(sh) > 0),
      |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    len(list_intersect(a.sh, b.sh)) AS ni,
      |    a.l AS la, b.l AS lb
      |  FROM s2 a JOIN s2 b ON a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b,
      |  round(ni::DOUBLE / (la + lb - ni), 6) AS jaccard
      |FROM p WHERE ni::DOUBLE / (la + lb - ni) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Asymmetric containment near-dup pairs
    * ([[Dedup.containmentPairs]]): C(A→B) = |S_A ∩ S_B| / |S_A| over
    * 8-token shingle-hash sets — the doc-in-doc signal (quotation,
    * boilerplate inclusion, version supersets) that symmetric Jaccard
    * under-scores. Candidates come only from grams with document
    * frequency ≤ 16 (the hot-gram cap — see the operator's scale
    * note); each emitted pair carries the exact shared-gram count and
    * both containment directions. */
  def dContainment(s: SparkSession, d: String): DataFrame =
    Dedup.containmentPairs(docs(s, d), "doc_id", "text",
      n = 8, threshold = 0.5, dfCap = 16)
      .orderBy("doc_a", "doc_b")

  /** [[dContainment]] with the hot-gram cap DERIVED from corpus size
    * ([[Dedup.containmentPairsAuto]]: cap = ⌈16·N/5000⌉, min 2, exact
    * integer arithmetic) — the production sibling for corpora where a
    * fixed absolute cap would prune a growing share of true pairs as
    * boilerplate df scales with N (recall measurements in
    * BASELINE.md's containment-cap section). */
  def dContainmentAuto(s: SparkSession, d: String): DataFrame =
    Dedup.containmentPairsAuto(docs(s, d), "doc_id", "text",
      n = 8, threshold = 0.5)
      .orderBy("doc_a", "doc_b")

  private val dContainmentSql = containmentSqlWith("16")

  private val dContainmentAutoSql = containmentSqlWith(
    "(SELECT greatest(2, (16 * count(*) + 4999) // 5000) " +
      "FROM documents)")

  private def containmentSqlWith(capExpr: String): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
       |  FROM documents),
       |g AS (SELECT doc_id, unnest(list_transform(
       |    ${sqlShingleList("toks", 8)},
       |    s -> ${sqlPolyHash("s")})) AS g
       |  FROM t),
       |sz AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY 1),
       |dfq AS (SELECT g, count(*) AS df FROM g GROUP BY 1),
       |rare AS (SELECT g.doc_id, g.g FROM g JOIN dfq USING (g)
       |  WHERE dfq.df <= $capExpr),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM rare a JOIN rare b
       |    ON a.g = b.g AND a.doc_id < b.doc_id),
       |sh AS (SELECT c.doc_a, c.doc_b, count(*) AS n_shared
       |  FROM cand c
       |  JOIN g ga ON ga.doc_id = c.doc_a
       |  JOIN g gb ON gb.doc_id = c.doc_b AND gb.g = ga.g
       |  GROUP BY 1, 2)
       |SELECT sh.doc_a, sh.doc_b, sh.n_shared,
       |  round(sh.n_shared::DOUBLE / sa.n_grams, 6) AS cont_a,
       |  round(sh.n_shared::DOUBLE / sb.n_grams, 6) AS cont_b
       |FROM sh
       |JOIN sz sa ON sa.doc_id = sh.doc_a
       |JOIN sz sb ON sb.doc_id = sh.doc_b
       |WHERE greatest(round(sh.n_shared::DOUBLE / sa.n_grams, 6),
       |  round(sh.n_shared::DOUBLE / sb.n_grams, 6)) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  /** MinHash+LSH near-dup pairs, exact-Jaccard-verified so every
    * emitted pair is a true near duplicate. Oracle-verified: the
    * signature family is the engine-portable polynomial hash, so the
    * full pipeline (shingle → 64-permutation minima → 16 band keys →
    * candidate join → verification) is mirrored in DuckDB SQL. */
  def dMinhashLsh(s: SparkSession, d: String): DataFrame =
    Dedup.minhashLshPairs(docs(s, d), "doc_id", "text",
      n = 3, bands = 16, rowsPerBand = 4, threshold = 0.2)
      .withColumn("jaccard", round(col("jaccard"), 6))
      .orderBy("doc_a", "doc_b")

  private val minhashP = 2147483647L

  // oracle-side polynomial hash: the single shared definition lives
  // in QueryUtil.sqlPolyHash (imported via `QueryUtil._`)

  /** DuckDB fragment: the distinct word-n-gram list over token-list
    * expression `toks` — the ONE oracle-side mirror of
    * [[graft.functions.ShingleSet]], including its truncated
    * whole-doc gram when a doc has fewer than `n` tokens. Every
    * gram-building oracle (Jaccard/MinHash n=3, decontamination n=5,
    * span dedup n=8) must use it so an edge-case fix cannot drift
    * between copies (defs, not vals: order-independent within the
    * object). */
  private def sqlShingleList(toks: String, n: Int): String =
    s"list_distinct(list_transform(" +
    s"range(1, greatest(len($toks) - ${n - 1}, 1) + 1), " +
    s"i -> array_to_string($toks[i:i+${n - 1}], ' ')))"

  /** Sorted n=3 variant over raw `text` (Jaccard/MinHash oracles —
    * sorted because [[Dedup.shingles]] sorts for the min-shingle
    * block and the merge-walk intersect). */
  private def sqlShingles: String =
    s"list_sort(${sqlShingleList("(string_split(text, ' '))", 3)})"

  /** One SIDE of the MinHash oracle (shingle → 64-hash signature →
    * 16 band keys) as CTEs suffixed `sfx`, over `documents` rows
    * matching `where` (empty = all). Shared by the self-join and
    * incremental oracles so the signature family cannot drift between
    * them. */
  private def minhashSideCtes(sfx: String, where: String): String = {
    val numHashes = 64
    val bands = 16
    val rowsPerBand = 4
    val sigExprs = (0 until numHashes).map { j =>
      s"list_min(list_transform(hs, h -> " +
      s"((${2L * j + 1} * h + ${7919L * (j + 1)}) % $minhashP))) AS s_$j"
    }.mkString(",\n    ")
    val sigList = "[" + (0 until numHashes).map("s_" + _).mkString(", ") + "]"
    val bandSelects = (0 until bands).map { b =>
      val lo = b * rowsPerBand + 1
      val hi = b * rowsPerBand + rowsPerBand
      s"SELECT doc_id, $b AS band, " +
      s"array_to_string(sig[$lo:$hi], ',') AS band_key FROM sig$sfx"
    }.mkString("\n  UNION ALL ")
    // MATERIALIZED on h/sig: the same DuckDB per-reference CTE
    // inlining the OPQ rotation hit — the 64-hash signature is
    // re-derived by each of the 16 band selects and every downstream
    // consumer. Measured on g_doc_centrality at sf0.01: 37.2 s
    // as-dumped → 1.6 s with both materialized, results identical;
    // every mh_pairs consumer (neardup pipeline, dup clusters,
    // centrality, minhash_lsh) shares the cut.
    s"""shs$sfx AS (SELECT doc_id, $sqlShingles AS sh FROM documents$where),
       |f$sfx AS (SELECT doc_id, sh FROM shs$sfx WHERE len(sh) > 0),
       |h$sfx AS MATERIALIZED (SELECT doc_id,
       |    list_transform(sh, s -> ${sqlPolyHash("s")}) AS hs FROM f$sfx),
       |sigc$sfx AS (SELECT doc_id,
       |    $sigExprs
       |  FROM h$sfx),
       |sig$sfx AS MATERIALIZED (SELECT doc_id, $sigList AS sig FROM sigc$sfx),
       |bands$sfx AS ($bandSelects)""".stripMargin
  }

  /** Shared oracle fragment: the full MinHash+LSH near-dup pipeline
    * (shingle → 64-hash signature → 16 band keys → candidate join →
    * exact-Jaccard verify at 0.2) as a WITH-clause body ending in CTE
    * `mh_pairs(doc_a, doc_b, jaccard)`. Used by both the pair query
    * and the end-to-end near-dup dedup pipeline so they cannot
    * drift. */
  private def minhashPairsCtes: String =
    s"""${minhashSideCtes("", "")},
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band
       |    AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |v AS (SELECT doc_a, doc_b,
       |    len(list_intersect(sa.sh, sb.sh)) AS n_inter,
       |    len(sa.sh) AS n_a, len(sb.sh) AS n_b
       |  FROM cand JOIN f sa ON sa.doc_id = cand.doc_a
       |    JOIN f sb ON sb.doc_id = cand.doc_b),
       |mh_pairs AS (SELECT doc_a, doc_b,
       |    round(n_inter::DOUBLE / (n_a + n_b - n_inter), 6) AS jaccard
       |  FROM v WHERE n_inter::DOUBLE / (n_a + n_b - n_inter) >= 0.2)""".stripMargin

  private val dMinhashLshSql =
    s"""WITH $minhashPairsCtes
       |SELECT doc_a, doc_b, jaccard FROM mh_pairs
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Candidate-generation eval for the near-dup family — the dedup
    * analog of [[sAnnRecall]]: how much of the blocked-exact-Jaccard
    * pair set ([[dJaccardPairs]]' min-shingle blocking) the
    * MinHash+LSH index ([[dMinhashLsh]]) recovers, and how many true
    * pairs LSH finds that blocking misses (both generators verify
    * with exact Jaccard, so every emitted pair is true — the two
    * heuristics differ only in which CANDIDATES they surface). The
    * accept/reject metric for banding parameters, exactly like
    * recall@k gates an ANN index. Output: one row — n_exact, n_lsh,
    * n_both, recall_lsh, n_lsh_only.
    *
    * Scale shape: both pair generators are the shipped linear paths
    * (block equi-join / band equi-join); the overlap is a pair-keyed
    * equi-join of two pair-id frames and the rest is three
    * partial-combined counts folded into one broadcast-composed row.
    * Nothing here adds a shape beyond what the generators already
    * carry at 100×. */
  def dDedupRecall(s: SparkSession, d: String): DataFrame = {
    val dd = docs(s, d)
    // both generators consume the SAME corpus at the SAME shingle
    // width — tokenize+shingle once (r16; guide §5: cache exactly
    // what ≥2 consumers re-read). Each generator localCheckpoints its
    // pair set, so the shared cache releases as soon as both return.
    val sh = Dedup.shingleFrame(dd, "doc_id", "text", n = 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ex = Dedup.jaccardPairsOnShingles(sh, threshold = 0.2)
      .select(col("doc_a"), col("doc_b"))
    val mh = Dedup.minhashLshPairsOnShingles(sh,
        bands = 16, rowsPerBand = 4, threshold = 0.2)
      .select(col("doc_a"), col("doc_b"))
    sh.unpersist()
    val exC = ex.agg(count(lit(1)).as("n_exact"))
    val mhC = mh.agg(count(lit(1)).as("n_lsh"))
    val bothC = ex.join(mh, Seq("doc_a", "doc_b"))
      .agg(count(lit(1)).as("n_both"))
    exC.crossJoin(broadcast(mhC)).crossJoin(broadcast(bothC))
      .select(col("n_exact"), col("n_lsh"), col("n_both"),
        round(col("n_both").cast("double") / col("n_exact"), 6)
          .as("recall_lsh"),
        (col("n_lsh") - col("n_both")).as("n_lsh_only"))
  }

  private val dDedupRecallSql =
    s"""WITH $minhashPairsCtes,
       |esh AS (SELECT doc_id, $sqlShingles AS sh FROM documents),
       |eblocked AS (SELECT doc_id, sh, sh[1] AS block FROM esh
       |  WHERE len(sh) > 0),
       |ex_pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM eblocked a JOIN eblocked b
       |    ON a.block = b.block AND a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
       |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
       |    >= 0.2),
       |bc AS (SELECT count(*) AS n_both FROM ex_pairs e
       |  JOIN mh_pairs m ON e.doc_a = m.doc_a AND e.doc_b = m.doc_b),
       |ec AS (SELECT count(*) AS n_exact FROM ex_pairs),
       |mc AS (SELECT count(*) AS n_lsh FROM mh_pairs)
       |SELECT CAST(n_exact AS BIGINT) AS n_exact,
       |  CAST(n_lsh AS BIGINT) AS n_lsh,
       |  CAST(n_both AS BIGINT) AS n_both,
       |  round(n_both::DOUBLE / n_exact, 6) AS recall_lsh,
       |  CAST(n_lsh - n_both AS BIGINT) AS n_lsh_only
       |FROM ec, mc, bc""".stripMargin

  /** Incremental near-dup ingest gate ([[Dedup.minhashLshIncremental]]):
    * the batch = every 10th doc, the manifest = the rest; output =
    * which incoming docs near-duplicate the already-ingested corpus
    * (band-key probe join + exact-Jaccard verify — per-batch work
    * scales with the batch, never all-pairs over the corpus). The
    * near-dup counterpart of `d_incremental_dedup`. */
  def dIncrementalMinhash(s: SparkSession, d: String): DataFrame = {
    val all = docs(s, d)
    Dedup.minhashLshIncremental(
        all.filter(col("doc_id") % 10 === 0),
        all.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", n = 3, bands = 16, rowsPerBand = 4,
        threshold = 0.2)
      .withColumn("jaccard", round(col("jaccard"), 6))
      .orderBy("new_id", "dup_of")
  }

  private val dIncrementalMinhashSql =
    s"""WITH ${minhashSideCtes("_n", " WHERE doc_id % 10 = 0")},
       |${minhashSideCtes("_m", " WHERE doc_id % 10 <> 0")},
       |cand AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS dup_of
       |  FROM bands_n a JOIN bands_m b ON a.band = b.band
       |    AND a.band_key = b.band_key),
       |v AS (SELECT new_id, dup_of,
       |    len(list_intersect(sa.sh, sb.sh)) AS n_inter,
       |    len(sa.sh) AS n_a, len(sb.sh) AS n_b
       |  FROM cand JOIN f_n sa ON sa.doc_id = cand.new_id
       |    JOIN f_m sb ON sb.doc_id = cand.dup_of)
       |SELECT new_id, dup_of,
       |  round(n_inter::DOUBLE / (n_a + n_b - n_inter), 6) AS jaccard
       |FROM v WHERE n_inter::DOUBLE / (n_a + n_b - n_inter) >= 0.2
       |ORDER BY new_id, dup_of""".stripMargin

  /** Corpus data card: per (source, lang) release accounting — doc
    * and token counts, mean document length, and each cell's share of
    * corpus tokens. The one-stop summary a dataset release ships
    * with. One partial-combined aggregate over a token-count
    * projection; the corpus total attaches as a broadcast 1-row
    * cross join. */
  def dCorpusCard(s: SparkSession, d: String): DataFrame = {
    // the cell frame feeds both the total and the output — persist
    // the (cells-sized) frame so the corpus scan + aggregate runs once
    val byCell = docs(s, d)
      .select(col("source"), col("lang"),
        size(TextStats.tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        avgDec(col("n_tok").cast("double")).as("mean_tokens"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = byCell.agg(sum(col("n_tokens")).as("t"))
    val out = byCell.crossJoin(broadcast(total))
      .select(col("source"), col("lang"), col("n_docs"),
        col("n_tokens"),
        col("mean_tokens"),
        round(col("n_tokens").cast("double") / col("t"), 6)
          .as("token_share"))
      .orderBy("source", "lang")
      .localCheckpoint()
    byCell.unpersist()
    out
  }

  private val dCorpusCardSql =
    s"""WITH c AS (SELECT source, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |  FROM documents),
       |cell AS (SELECT source, lang, count(*) AS n_docs,
       |    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |    ${sqlAvgDec("n_tok")} AS mean_tokens
       |  FROM c GROUP BY 1, 2),
       |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM cell)
       |SELECT source, lang, n_docs, n_tokens, mean_tokens,
       |  round(n_tokens::DOUBLE / t, 6) AS token_share
       |FROM cell, tot ORDER BY source, lang""".stripMargin

  /** End-to-end near-duplicate dedup — the production composition the
    * pair/cluster queries exist FOR: MinHash+LSH verified pairs →
    * connected components → keep the smallest-id representative per
    * cluster → per-source accounting (docs / clustered / dropped /
    * kept). [[dCurationPipeline]] is the exact-dedup flow; this is
    * its near-dup counterpart.
    *
    * Scale shape: inherits its stages' — banded candidate generation,
    * O(log n)-round label propagation over id pairs, and a final
    * partial-combined accounting aggregate; the only per-doc join is
    * the left join of (doc_id, source) against the cluster map. */
  def dNeardupPipeline(s: SparkSession, d: String): DataFrame = {
    val dd = docs(s, d)
    val pairs = Dedup.minhashLshPairs(dd, "doc_id", "text",
      n = 3, bands = 16, rowsPerBand = 4, threshold = 0.2)
    val comps = graft.ext.ConnectedComponents
      .components(pairs, "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("comp"))
    dd.select(col("doc_id"), col("source"))
      .join(comps, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(col("comp")).as("n_clustered"),
        count(when(col("comp").isNotNull &&
          col("comp") =!= col("doc_id"), 1)).as("n_dropped"))
      .withColumn("n_kept", col("n_docs") - col("n_dropped"))
      .orderBy("source")
  }

  private val dNeardupPipelineSql =
    s"""WITH RECURSIVE $minhashPairsCtes,
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM mh_pairs
       |  UNION SELECT doc_b, doc_a FROM mh_pairs),
       |reach(a, b) AS (SELECT a, b FROM edges
       |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |comp AS (SELECT a AS doc_id, least(a, min(b)) AS comp
       |  FROM reach GROUP BY a)
       |SELECT d.source, count(*) AS n_docs,
       |  count(c.comp) AS n_clustered,
       |  count(CASE WHEN c.comp IS NOT NULL AND c.comp <> d.doc_id
       |    THEN 1 END) AS n_dropped,
       |  count(*) - count(CASE WHEN c.comp IS NOT NULL AND
       |    c.comp <> d.doc_id THEN 1 END) AS n_kept
       |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** Document centrality in the near-duplicate similarity graph:
    * integer-arithmetic PageRank ([[graft.ext.PageRank]]) over the
    * symmetrized MinHash+LSH pair graph — highly-connected documents
    * are template/boilerplate hubs (rank DOWN for training-data
    * diversity), isolated documents never enter the graph. The
    * composition reuses both shared fragments: the engine reuses
    * `Dedup.minhashLshPairs` + `PageRank.pagerank`; the oracle splices
    * the `mh_pairs` CTE chain into the unrolled integer iterations. */
  def gDocCentrality(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.minhashLshPairs(docs(s, d), "doc_id", "text",
      n = 3, bands = 16, rowsPerBand = 4, threshold = 0.2)
    val edges = pairs.select(col("doc_a").as("src"),
        col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"),
        col("doc_a").as("dst")))
    graft.ext.PageRank.pagerank(edges, iters = 2)
      .select(col("node").as("doc_id"), col("pr_pico"))
      .orderBy("doc_id")
  }

  private val gDocCentralitySql = {
    def iterSql(prev: String, out: String) =
      s"""$out AS (SELECT d0.src AS node,
         |    (150000000000 // max(nn.n)) +
         |      ((85 * CAST(coalesce(sum(t.c), 0) AS BIGINT)) // 100)
         |      AS pr_pico
         |  FROM pdeg d0 LEFT JOIN (SELECT pe.dst,
         |      p.pr_pico // d.deg AS c
         |    FROM pe JOIN $prev p ON pe.src = p.node
         |      JOIN pdeg d ON d.src = pe.src) t ON t.dst = d0.src, nn
         |  GROUP BY d0.src)""".stripMargin
    s"""WITH $minhashPairsCtes,
       |pe AS (SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
       |  UNION ALL SELECT doc_b, doc_a FROM mh_pairs),
       |pdeg AS (SELECT src, count(*) AS deg FROM pe GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM pdeg),
       |p0 AS (SELECT src AS node, 1000000000000 // n AS pr_pico
       |  FROM pdeg, nn),
       |${iterSql("p0", "p1")},
       |${iterSql("p1", "p2")}
       |SELECT node AS doc_id, pr_pico FROM p2
       |ORDER BY doc_id""".stripMargin
  }

  /** Per-doc triangle participation over the near-dup pair graph
    * ([[graft.ext.Triangles]], degree-ordered wedge join): the
    * cluster-quality diagnostic that separates pairwise-verified
    * near-dup cliques from hub-chained components — a dup component
    * with zero triangles is transitive linking through one template
    * doc, one with many is a genuine mutual-duplicate family. Edges
    * are [[dJaccardPairs]]' generator; output is (doc_id, n_tri, deg)
    * for every doc in the pair graph, zeros included. The oracle
    * enumerates each id-ordered triangle once with NO orientation —
    * the degree ordering is pure Spark-side candidate pruning, proven
    * result-neutral by the hash match. */
  def gTriangles(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.jaccardPairs(docs(s, d), "doc_id", "text",
      n = 3, threshold = 0.2)
    graft.ext.Triangles.triangleCounts(pairs, "doc_a", "doc_b")
      .select(col("node").as("doc_id"), col("n_tri"), col("deg"))
      .orderBy("doc_id")
  }

  private val gTrianglesSql =
    s"""WITH sh AS (SELECT doc_id, $sqlShingles AS sh
      |  FROM documents),
      |blocked AS (SELECT doc_id, sh, sh[1] AS block FROM sh
      |  WHERE len(sh) > 0),
      |e AS (SELECT DISTINCT a.doc_id AS lo, b.doc_id AS hi
      |  FROM blocked a JOIN blocked b
      |    ON a.block = b.block AND a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
      |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
      |    >= 0.2),
      |n AS (SELECT lo AS node FROM e UNION SELECT hi FROM e),
      |d AS (SELECT node, count(*) AS deg FROM
      |  (SELECT lo AS node FROM e UNION ALL SELECT hi FROM e)
      |  GROUP BY node),
      |t AS (SELECT e1.lo AS u, e1.hi AS v, e2.hi AS w
      |  FROM e e1 JOIN e e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
      |  JOIN e e3 ON e3.lo = e1.hi AND e3.hi = e2.hi),
      |c AS (SELECT node, count(*) AS n_tri FROM
      |  (SELECT u AS node FROM t UNION ALL SELECT v FROM t
      |   UNION ALL SELECT w FROM t) GROUP BY node)
      |SELECT n.node AS doc_id,
      |  CAST(coalesce(c.n_tri, 0) AS BIGINT) AS n_tri, d.deg
      |FROM n JOIN d ON n.node = d.node
      |LEFT JOIN c ON n.node = c.node
      |ORDER BY doc_id""".stripMargin

  /** Per-doc 32-bit SimHash fingerprints. Oracle-verified via the
    * portable polynomial token hash (bit 31 is constantly 0 — the
    * hash range is [0, 2^31−1)). */
  def dSimhash(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"), Dedup.simhash32(col("text")).as("simhash"))
      .orderBy("doc_id")

  private val dSimhashSql = {
    // vote_i = 2·(#tokens with hash bit i set) − n; bit set iff > 0
    val votes = (0 until 32).map(i =>
      s"2 * len(list_filter(hs, h -> ((h >> $i) & 1) = 1)) - len(hs) " +
      s"AS v_$i").mkString(",\n    ")
    val bits = (0 until 32).map(i =>
      s"CASE WHEN v_$i > 0 THEN ${1L << i} ELSE 0 END").mkString(" + ")
    s"""WITH t AS (SELECT doc_id,
       |    list_transform(string_split(text, ' '),
       |      s -> ${sqlPolyHash("s")}) AS hs
       |  FROM documents),
       |v AS (SELECT doc_id,
       |    $votes
       |  FROM t)
       |SELECT doc_id, CAST($bits AS BIGINT) AS simhash
       |FROM v ORDER BY doc_id""".stripMargin
  }

  // ---- text analysis ------------------------------------------------
  def dTextStats(s: SparkSession, d: String): DataFrame = {
    val toks = TextStats.tokens(col("text"))
    docs(s, d).select(
      col("doc_id"),
      length(col("text")).as("n_chars_m"),
      size(toks).as("n_tokens"),
      TextStats.bpeTokenCount(col("text")).as("n_bpe_tokens"),
      round(size(array_distinct(toks)).cast("double") /
        greatest(size(toks), lit(1)).cast("double"), 6).as("ttr"),
      TextStats.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")
  }

  private val dTextStatsSql = {
    val stop = TextStats.AllStopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, length(text) AS n_chars_m,
       |    string_split(text, ' ') AS toks,
       |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
       |      AS n_bpe_tokens
       |  FROM documents),
       |s AS (SELECT doc_id, n_chars_m, n_bpe_tokens,
       |    len(toks) AS n_tokens,
       |    len(list_distinct(toks))::DOUBLE /
       |      greatest(len(toks), 1) AS ttr,
       |    least(len(toks)::DOUBLE / 20.0, 1.0) AS len_score,
       |    least((len(list_filter(toks, x -> x IN ($stop)))::DOUBLE /
       |      greatest(len(toks), 1)::DOUBLE) * 4.0, 1.0) AS stop_score
       |  FROM t)
       |SELECT doc_id, n_chars_m, n_tokens, n_bpe_tokens,
       |  round(ttr, 6) AS ttr,
       |  round(len_score * 0.4 + ttr * 0.4 + stop_score * 0.2, 6)
       |    AS quality
       |FROM s ORDER BY doc_id""".stripMargin
  }

  def dLangId(s: SparkSession, d: String): DataFrame = {
    val toks = TextStats.tokens(col("text"))
    docs(s, d).select(
      col("doc_id"), col("lang"),
      TextStats.predictedLang(toks).as("pred_lang"))
      .withColumn("correct", col("lang") === col("pred_lang"))
      .orderBy("doc_id")
  }

  /** Oracle fragments of the stopword-voting langid
    * (`scoreCols`, `best`, `pred`) — ONE SQL definition of the vote,
    * shared by [[dLangIdSql]] and [[dFilterStackSql]]. */
  private def langIdSqlFragments: (String, String, String) = {
    val scoreCols = TextStats.StopwordsByLang.map { case (lang, words) =>
      val lst = words.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(toks, x -> x IN ($lst))) AS s_$lang"
    }.mkString(",\n    ")
    val langs = TextStats.StopwordsByLang.map(_._1)
    val best = s"greatest(${langs.map("s_" + _).mkString(", ")})"
    val pred = langs.map(l =>
      s"WHEN s_$l = best AND best > 0 THEN '$l'").mkString(" ")
    (scoreCols, best, pred)
  }

  private val dLangIdSql = {
    val (scoreCols, best, pred) = langIdSqlFragments
    s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
       |  FROM documents),
       |sc AS (SELECT doc_id, lang,
       |    $scoreCols
       |  FROM t),
       |b AS (SELECT *, $best AS best FROM sc)
       |SELECT doc_id, lang, CASE $pred ELSE 'und' END AS pred_lang,
       |  lang = (CASE $pred ELSE 'und' END) AS correct
       |FROM b ORDER BY doc_id""".stripMargin
  }

  def dFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"), TextStats.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  private val dFingerprintSql =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(text, ''), c -> ord(c)::BIGINT)),
      |    (a, b) -> (a * 31 + b) % 2147483647) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Winnowing document fingerprints (Schleimer et al. 2003 — the
    * MOSS local fingerprinting scheme, public): hash every POSITIONAL
    * 4-token gram (order kept, duplicates kept — unlike the shingle
    * SET of the Jaccard family), slide a window of 4 consecutive gram
    * hashes, select each window's minimum hash (value-min selection;
    * a doc with fewer grams than the window contributes the single
    * min of all its grams), and keep the distinct selected values as
    * the doc's fingerprint set. Winnowing guarantees any shared token
    * run of ≥ w+k−1 = 7 tokens produces at least one shared
    * fingerprint — position-robust overlap detection at a density of
    * ~2/(w+1) of the grams. Output per doc: fingerprint count, the
    * max document frequency among its fingerprints (≥2 ⇔ some
    * fingerprint is shared), and how many are unique to the doc —
    * the originality signal plagiarism/dedup pipelines report.
    *
    * Scale shape: selection is a pure per-doc HOF projection (no
    * shuffle); the corpus pass is one explode into a
    * partial-combined count keyed by the 8-byte hash, reattached by
    * an fp equi-join — compact keys, linear in corpus size, and no
    * doc-pair frame is ever materialized (pair generation is
    * [[dJaccardPairs]]' job; this op reports overlap statistics
    * without the quadratic). */
  def dWinnowing(s: SparkSession, d: String): DataFrame =
    winnowStats(docs(s, d))

  /** Operator body of [[dWinnowing]] over any (doc_id, text) frame —
    * separate so specs can assert the winnowing guarantee on
    * constructed corpora. Fingerprint selection is the codegen'd
    * [[graft.functions.WinnowSet]] kernel — the interpreted HOF
    * formulation ([[hofWinnowFps]], kept for equivalence specs)
    * allocates a gram string + slice per position and measured 75s
    * on the 10× probe corpus vs ~2s compiled. */
  def winnowStats(documents: DataFrame): DataFrame = {
    val base = documents.select(col("doc_id"),
        graft.functions.WinnowSet.winnow_set(
          split(col("text"), " "), k = 4, w = 4).as("fps"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ex = base.select(col("doc_id"), explode(col("fps")).as("fp"))
    val dfreq = ex.groupBy(col("fp")).agg(count(lit(1)).as("df"))
    val perDoc = ex.join(dfreq, Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fp"), max(col("df")).as("max_fp_df"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique_fp"))
    val out = base.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_fp"), lit(0L)).as("n_fp"),
        col("max_fp_df"),
        coalesce(col("n_unique_fp"), lit(0L)).as("n_unique_fp"))
      .orderBy("doc_id")
    val res = out.localCheckpoint()
    base.unpersist()
    res
  }

  /** HOF reference formulation of the [[graft.functions.WinnowSet]]
    * kernel — interpreted lambda per position; kept for equivalence
    * testing only (TrainingDataSpec). */
  def hofWinnowFps(textCol: Column, k: Int = 4, w: Int = 4): Column = {
    val toks = split(textCol, " ")
    val n = size(toks)
    val grams = when(n >= k,
        transform(sequence(lit(1), n - (k - 1)),
          i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array().cast("array<string>"))
    val gh = graft.functions.ArrayOps.array_poly_hash(grams)
    val m = size(gh)
    val sel = when(m >= w,
        transform(sequence(lit(1), m - (w - 1)),
          j => array_min(slice(gh, j, lit(w)))))
      .when(m > 0, array(array_min(gh)))
      .otherwise(array().cast("array<long>"))
    array_sort(array_distinct(sel))
  }

  private val dWinnowingSql =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
       |  FROM documents),
       |g AS (SELECT doc_id,
       |    CASE WHEN len(toks) >= 4 THEN
       |      list_transform(range(1, len(toks) - 3 + 1),
       |        i -> array_to_string(toks[i:i+3], ' '))
       |    ELSE [] END AS grams
       |  FROM t),
       |h AS (SELECT doc_id,
       |    list_transform(grams, gr -> ${sqlPolyHash("gr")}) AS gh
       |  FROM g),
       |sel AS (SELECT doc_id,
       |    CASE WHEN len(gh) >= 4 THEN
       |      list_transform(range(1, len(gh) - 3 + 1),
       |        j -> list_aggregate(gh[j:j+3], 'min'))
       |    WHEN len(gh) > 0 THEN [list_aggregate(gh, 'min')]
       |    ELSE [] END AS s
       |  FROM h),
       |f AS (SELECT doc_id, list_sort(list_distinct(s)) AS fps
       |  FROM sel),
       |ex AS (SELECT doc_id, unnest(fps) AS fp FROM f),
       |dfreq AS (SELECT fp, count(*) AS df FROM ex GROUP BY 1),
       |pd AS (SELECT e.doc_id, count(*) AS n_fp,
       |    max(d.df) AS max_fp_df,
       |    CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_unique_fp
       |  FROM ex e JOIN dfreq d ON e.fp = d.fp GROUP BY 1)
       |SELECT f.doc_id,
       |  CAST(coalesce(pd.n_fp, 0) AS BIGINT) AS n_fp,
       |  pd.max_fp_df,
       |  CAST(coalesce(pd.n_unique_fp, 0) AS BIGINT) AS n_unique_fp
       |FROM f LEFT JOIN pd ON f.doc_id = pd.doc_id
       |ORDER BY f.doc_id""".stripMargin

  /** Flagship curation pipeline: the full training-data pass chained
    * end-to-end — exact dedup (keep min doc_id per content hash) →
    * quality floor → language filter → per-source kept/dropped
    * accounting. Every stage is itself oracle-verified above; this
    * query verifies their composition. */
  def dCurationPipeline(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d)
    // exact dedup inline as a window over the content hash: ONE corpus
    // shuffle (by hash) replaces the groupBy-aggregate + semi-join
    // formulation's two corpus passes; min-doc_id-per-hash semantics
    // are identical to Dedup.exact's keep_id
    val wDup = org.apache.spark.sql.expressions.Window
      .partitionBy(Dedup.contentHash(col("text")))
      .orderBy(col("doc_id"))
    // the token array is projected ONCE and every downstream stage
    // (quality + langid share a fused TokenSetCounts kernel) reads the
    // attribute — a guaranteed single tokenize, not a CSE accident
    val (quality, predLang) = TextStats.qualityAndLangFrom(col("_toks"))
    base
      .withColumn("_rn", row_number().over(wDup))
      .filter(col("_rn") === 1)
      .withColumn("_toks", TextStats.tokens(col("text")))
      .withColumn("quality", quality)
      .withColumn("pred_lang", predLang)
      .withColumn("kept",
        col("quality") >= 0.5 && col("pred_lang") =!= "und")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("kept"), 1)).as("n_kept"),
        // exact-decimal mean: engine AVG accumulates doubles in
        // engine-specific order (see QueryUtil)
        round(sum(when(col("kept"), col("quality"))
            .cast("decimal(18,6)")).cast("double") /
          count(when(col("kept"), 1)), 6).as("avg_kept_quality"))
      .orderBy("source")
  }

  private val dCurationPipelineSql = {
    val stop = TextStats.AllStopwords.map(w => s"'$w'").mkString(", ")
    val scoreCols = TextStats.StopwordsByLang.map { case (lang, words) =>
      val lst = words.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(toks, x -> x IN ($lst))) AS s_$lang"
    }.mkString(", ")
    val langs = TextStats.StopwordsByLang.map(_._1)
    val best = s"greatest(${langs.map("s_" + _).mkString(", ")})"
    val pred = langs.map(l =>
      s"WHEN s_$l = best AND best > 0 THEN '$l'").mkString(" ")
    s"""WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents
       |    GROUP BY sha256(regexp_replace(lower(trim(text)), '\\s+', ' ',
       |      'g'))),
       |t AS (SELECT d.doc_id, d.source, string_split(d.text, ' ') AS toks
       |  FROM documents d JOIN keep k ON d.doc_id = k.doc_id),
       |q AS (SELECT doc_id, source, toks,
       |    least(len(toks)::DOUBLE / 20.0, 1.0) * 0.4 +
       |    (len(list_distinct(toks))::DOUBLE / greatest(len(toks), 1))
       |      * 0.4 +
       |    least((len(list_filter(toks, x -> x IN ($stop)))::DOUBLE /
       |      greatest(len(toks), 1)::DOUBLE) * 4.0, 1.0) * 0.2
       |      AS quality_raw,
       |    $scoreCols
       |  FROM t),
       |p AS (SELECT doc_id, source, round(quality_raw, 6) AS quality,
       |    CASE $pred ELSE 'und' END AS pred_lang
       |  FROM (SELECT *, $best AS best FROM q)),
       |k2 AS (SELECT source, quality,
       |    quality >= 0.5 AND pred_lang <> 'und' AS kept FROM p)
       |SELECT source, count(*) AS n_docs,
       |  count(CASE WHEN kept THEN 1 END) AS n_kept,
       |  round(CAST(sum(CAST(CASE WHEN kept THEN quality END
       |      AS DECIMAL(18,6))) AS DOUBLE) /
       |    count(CASE WHEN kept THEN 1 END), 6) AS avg_kept_quality
       |FROM k2 GROUP BY source ORDER BY source""".stripMargin
  }

  /** Near-dup clusters: Jaccard pairs → connected components →
    * cluster assignment per doc (transitive closure of near-dup
    * hits). Oracle: recursive CTE over the same pair list. */
  def dDupClusters(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.jaccardPairs(docs(s, d), "doc_id", "text",
      n = 3, threshold = 0.2)
    graft.ext.ConnectedComponents
      .components(pairs, "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("comp").as("component"))
      .orderBy("doc_id")
  }

  /** Shared recursive-CTE chain computing near-dup components from
    * 3-gram Jaccard pairs (min-id component labels), ending at
    * `comp(doc_id, comp)` — ONE SQL definition of the transitive
    * closure, shared by [[dDupClustersSql]] and
    * [[dDedupKeepBestSql]]. */
  private val dupClusterCtes =
    """WITH RECURSIVE sh AS (SELECT doc_id,
      |    list_sort(list_distinct(list_transform(
      |      range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
      |      i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))))
      |      AS sh
      |  FROM documents),
      |blocked AS (SELECT doc_id, sh, sh[1] AS block FROM sh
      |  WHERE len(sh) > 0),
      |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM blocked a JOIN blocked b
      |    ON a.block = b.block AND a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
      |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
      |    >= 0.2),
      |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      |  UNION SELECT doc_b, doc_a FROM pairs),
      |reach(a, b) AS (SELECT a, b FROM edges
      |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      |comp AS (SELECT a AS doc_id, least(a, min(b)) AS comp
      |  FROM reach GROUP BY a)""".stripMargin

  private val dDupClustersSql =
    s"""$dupClusterCtes
      |SELECT doc_id, comp AS component
      |FROM comp ORDER BY doc_id""".stripMargin

  /** Quality-aware near-dup resolution — what production curation
    * actually does with a duplicate cluster: instead of keeping the
    * arbitrary min-id representative, keep the HIGHEST-QUALITY member
    * (hashing-trick LR score of [[dQualityLr]]; exact integer milli
    * units, so the argmax is deterministic cross-engine; ties by
    * smallest doc_id). Docs in no cluster are their own singleton
    * component and always kept. Output: one row per doc —
    * (doc_id, component, score_milli, keep).
    *
    * Scale shape: clustering is the [[dDupClusters]] blocked-pair +
    * label-propagation path (never all-pairs); the quality score is a
    * pure projection; resolution is one window keyed by component —
    * components are near-dup clusters, bounded by the block cap, so
    * no window partition is corpus-sized. Only (doc_id, component,
    * score) rows shuffle. */
  def dDedupKeepBest(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dd = docs(s, d)
    val pairs = Dedup.jaccardPairs(dd, "doc_id", "text",
      n = 3, threshold = 0.2)
    val comps = graft.ext.ConnectedComponents
      .components(pairs, "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("comp"))
    val labeled = lrScoreMilli(dd)
      .select(col("doc_id"), col("score_milli"))
      .join(comps, Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("comp"), col("doc_id")))
    val w = Window.partitionBy(col("component"))
      .orderBy(desc("score_milli"), asc("doc_id"))
    labeled.withColumn("rnk", row_number().over(w))
      .select(col("doc_id"), col("component"), col("score_milli"),
        (col("rnk") === 1).as("keep"))
      .orderBy("doc_id")
  }

  private val dDedupKeepBestSql =
    s"""$dupClusterCtes,
      |$lrScoreCtes,
      |l AS (SELECT w.doc_id,
      |    coalesce(c.comp, w.doc_id) AS component, w.score_milli
      |  FROM w LEFT JOIN comp c ON w.doc_id = c.doc_id)
      |SELECT doc_id, component, score_milli,
      |  row_number() OVER (PARTITION BY component
      |    ORDER BY score_milli DESC, doc_id ASC) = 1 AS keep
      |FROM l ORDER BY doc_id""".stripMargin

  // ---- similarity search --------------------------------------------
  // Proportional query predicate — kept ONLY by the two deliberate
  // full-scan shapes (s_ann_brute: the documented O(Q·C) bandwidth
  // reference; s_hard_negatives: mining legitimately visits every
  // anchor). Every approximate entry (lsh/ivf/ivf_kmeans/int8/
  // ivf_int8) uses the fixed |Q| = 16 sampleQueryIds shape instead:
  // with Q ∝ N even an index's total cost grows quadratically.
  private val isQuery = col("vec_id") % 40 === 0

  def sAnnBrute(s: SparkSession, d: String): DataFrame =
    Similarity.bruteForceTopK(embs(s, d), isQuery, k = 5)
      .orderBy("query_id", "rank")

  private val sAnnBruteSql =
    """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS emb
      |  FROM embeddings),
      |q AS (SELECT vec_id AS query_id, emb AS q_emb FROM base
      |  WHERE vec_id % 40 = 0),
      |scored AS (SELECT query_id, vec_id AS neighbor_id,
      |    round(list_dot_product(q_emb, emb) /
      |      (sqrt(list_dot_product(q_emb, q_emb)) *
      |       sqrt(list_dot_product(emb, emb))), 6) AS cos_sim
      |  FROM base CROSS JOIN q WHERE vec_id <> query_id),
      |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Greedy k-center diverse subset selection (k = 8) over the
    * embedding corpus — [[Similarity.kcenterSelect]]. */
  def sKcenter(s: SparkSession, d: String): DataFrame =
    Similarity.kcenterSelect(embs(s, d), 8)

  /** `s_kcenter` oracle: the greedy farthest-point loop UNROLLED —
    * one CTE per round whose argmax references the earlier centers as
    * scalar subqueries, then the coverage pass replayed with the same
    * (rounded distance, sel_order) tie order Spark's struct-min uses.
    * Distance is the engine-shared `⟨a,a⟩ − 2⟨a,b⟩ + ⟨b,b⟩` form,
    * rounded to 6 dp before every comparison. */
  private def sKcenterSql(k: Int): String = {
    def dist(e: String, c: String) =
      s"round(list_dot_product($e, $e) - 2*list_dot_product($e, $c)" +
        s" + list_dot_product($c, $c), 6)"
    val sb = new StringBuilder
    // MATERIALIZED is load-bearing: each cᵢ references all earlier
    // centers several times (distance + NOT IN), and DuckDB inlines
    // plain CTEs — the expansion is exponential in k and exhausts
    // file handles re-opening the parquet. Materializing caps every
    // CTE at one evaluation.
    sb ++= "WITH base AS MATERIALIZED (SELECT vec_id," +
      " embedding::DOUBLE[] AS emb FROM embeddings),\n"
    sb ++= "c1 AS MATERIALIZED (SELECT vec_id, emb, 0.0 AS d FROM base\n" +
      "  ORDER BY ((((vec_id % 2147483647) + 2147483647) % 2147483647)" +
      " * 48271) % 2147483647, vec_id LIMIT 1),\n"
    for (i <- 2 to k) {
      val notIn = (1 until i).map(j => s"SELECT vec_id FROM c$j")
        .mkString(" UNION ALL ")
      val dists = (1 until i)
        .map(j => dist("b.emb", s"(SELECT emb FROM c$j)"))
      val minD =
        if (dists.size == 1) dists.head
        else s"least(${dists.mkString(",\n    ")})"
      sb ++= s"c$i AS MATERIALIZED (SELECT b.vec_id, b.emb, $minD AS d\n" +
        s"  FROM base b WHERE b.vec_id NOT IN ($notIn)\n" +
        s"  ORDER BY d DESC, b.vec_id LIMIT 1),\n"
    }
    val cent = (1 to k).map(i =>
      s"SELECT $i AS sel_order, vec_id, emb, d AS radius FROM c$i")
      .mkString("\n  UNION ALL ")
    sb ++= s"cent AS ($cent),\n"
    sb ++= "asg AS (SELECT b.vec_id AS v, cent.sel_order,\n" +
      "    row_number() OVER (PARTITION BY b.vec_id ORDER BY " +
      s"${dist("b.emb", "cent.emb")}, cent.sel_order) AS rn\n" +
      "  FROM base b CROSS JOIN cent),\n" +
      "n AS (SELECT sel_order, count(*) AS n_assigned FROM asg" +
      " WHERE rn = 1 GROUP BY 1)\n"
    sb ++= "SELECT cent.sel_order, cent.vec_id, cent.radius,\n" +
      "  coalesce(n.n_assigned, 0) AS n_assigned\n" +
      "FROM cent LEFT JOIN n USING (sel_order) ORDER BY sel_order"
    sb.toString
  }

  /** MIPS via norm augmentation ([[Similarity.mipsTopK]]): corpus
    * vectors carry synthetic norms `1 + (vec_id mod 5)`, queries are
    * the 16 sampled raw embeddings, candidates come from sign-LSH
    * buckets over the (dim+1)-augmented space, ranked by exact inner
    * product. */
  def sAnnMips(s: SparkSession, d: String): DataFrame =
    Similarity.mipsTopK(embs(s, d),
        Similarity.sampleQueryIds(embs(s, d), 16), k = 5,
        numPlanes = 4, seed = 77L)
      .orderBy("query_id", "rank")

  private val sAnnMipsSql = {
    val planes = Similarity.hyperplanes(numPlanes = 4, dim = 65,
      seed = 77L)
    def bucket(v: String) = planes.zipWithIndex.map { case (pl, i) =>
      val arr = "[" + pl.mkString(", ") + "]"
      s"CASE WHEN list_dot_product($v, $arr) > 0 " +
        s"THEN ${1 << i} ELSE 0 END"
    }.mkString("\n    + ")
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |sc AS (SELECT vec_id, emb,
       |    list_transform(emb,
       |      x -> x * (1.0 + CAST(((vec_id % 5) + 5) % 5 AS DOUBLE))) AS sv
       |  FROM base),
       |m AS (SELECT max(list_dot_product(sv, sv)) AS m2 FROM sc),
       |corp AS (SELECT vec_id, sv,
       |    list_append(sv, sqrt(greatest(0.0,
       |      (SELECT m2 FROM m) - list_dot_product(sv, sv)))) AS av
       |  FROM sc),
       |bk AS (SELECT vec_id, sv,
       |    ${bucket("av")} AS bucket
       |  FROM corp),
       |$qidsSql,
       |qa AS (SELECT b.vec_id, b.emb,
       |    list_append(b.emb, 0.0) AS aq
       |  FROM base b JOIN qids s ON b.vec_id = s.vec_id),
       |q AS (SELECT vec_id AS query_id, emb AS q_emb,
       |    ${bucket("aq")} AS q_bucket
       |  FROM qa),
       |scored AS (SELECT query_id, vec_id AS neighbor_id,
       |    round(list_dot_product(q_emb, sv), 6) AS ip
       |  FROM bk JOIN q ON bucket = q_bucket AND vec_id <> query_id),
       |ranked AS (SELECT *, CAST(row_number() OVER (
       |    PARTITION BY query_id
       |    ORDER BY ip DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, ip, rank FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** Int8-quantized brute-force ANN — the bandwidth REFERENCE POINT:
    * all scoring runs on 72-byte quantized codes (~7× fewer
    * broadcast / shuffle bytes than `array<double>` rows), the lever
    * a 100-TB embedding pass is actually bounded by. Hash-verified:
    * the explicit floor-based rounding formula and exact integer
    * dots make the quantized cosine reproducible in DuckDB list
    * math. The query set is the FIXED deterministic sample
    * ([[Similarity.sampleQueryIds]], |Q| = 16, same recipe as
    * [[sAnnRecall]]) — so even this exact-scan baseline is
    * O(|Q|·|C|), linear in the corpus, not the quadratic
    * proportional-predicate shape. The production scale path is
    * [[sAnnIvfInt8]], which rides the IVF candidate pruning. */
  def sAnnInt8(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    Similarity.int8TopK(e,
        Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16), k = 5)
      .orderBy("query_id", "rank")
  }

  /** Shared oracle fragment: quantize CTE chain `base` →
    * (`qz0`, `qz`, `qn`) reproducing [[graft.functions.QuantizeOps]]
    * bit-for-bit — max-abs scale, round-half-away-from-zero spelled
    * with floor so both engines run the identical IEEE sequence. The
    * `qn > 0` predicate mirrors the Spark side's zero-norm and
    * NULL-element drops (a NULL element makes qn NULL; NULL > 0 is
    * not true). `extraCols` carries additional base columns (e.g.
    * `label`) through the chain. */
  private def quantizeSql(extraCols: String = ""): String =
    s"""qz0 AS (SELECT vec_id,$extraCols emb,
       |    list_aggregate(list_transform(emb, x -> abs(x)), 'max') AS s
       |  FROM base),
       |qz AS (SELECT vec_id,$extraCols
       |    list_transform(emb, e -> CASE WHEN s = 0 THEN 0.0
       |      WHEN e >= 0 THEN floor(e * 127.0 / s + 0.5)
       |      ELSE -floor(-(e * 127.0 / s) + 0.5) END) AS qv
       |  FROM qz0),
       |qn AS (SELECT * FROM (SELECT vec_id,$extraCols qv,
       |    sqrt(list_dot_product(qv, qv)) AS qn FROM qz)
       |  WHERE qn > 0)""".stripMargin

  // The inner `(x % m + m) % m` spells Spark's pmod in sign-preserving
  // SQL `%` — without it a negative BIGINT vec_id would order by a
  // negative residue here while Spark orders by the non-negative pmod,
  // silently selecting different query samples in the two engines.
  // `def`, not `val`: referenced from oracle-SQL builders that may sit
  // ABOVE this line in declaration order (a val would interpolate as
  // "null" there — object vals initialize strictly top-to-bottom)
  private def qidsSql =
    """qids AS (SELECT vec_id FROM base
      |  ORDER BY ((((vec_id % 2147483647) + 2147483647) % 2147483647) * 48271) % 2147483647, vec_id
      |  LIMIT 16)""".stripMargin

  private val sAnnInt8Sql =
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |${quantizeSql()},
       |$qidsSql,
       |q AS (SELECT n.vec_id AS query_id, n.qv AS q_qv, n.qn AS q_qn
       |  FROM qn n JOIN qids s ON n.vec_id = s.vec_id),
       |scored AS (SELECT query_id, vec_id AS neighbor_id,
       |    round(list_dot_product(q_qv, qv) / (q_qn * qn), 6) AS cos_sim
       |  FROM qn CROSS JOIN q WHERE vec_id <> query_id),
       |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** IVF × int8 ANN — the production composition
    * ([[Similarity.ivfTopKInt8]]): coarse label-centroid pruning to
    * `nprobe` partitions per query, int8 scoring everywhere
    * downstream of quantization. Hash-verified: centroids are the
    * same exact-decimal means as [[sAnnIvf]], quantized with the
    * same portable formula as the corpus codes. Fixed |Q| = 16. */
  def sAnnIvfInt8(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    Similarity.ivfTopKInt8(e,
        Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, nprobe = 3)
      .orderBy("query_id", "rank")
  }

  /** Shared oracle CTE chain of the two-level IVF×int8 index — ends at
    * `ranked` (all fine-ranked candidates, rank unfiltered) so both
    * [[sAnnIvfInt8Sql]] (top-5 directly) and [[sAnnRerankSql]]
    * (top-20 coarse candidates + exact rerank) read from the ONE
    * definition and cannot drift. */
  private val ivfInt8RankedCtes =
    s"""WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |dims AS (SELECT label, i,
       |    CAST(sum(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE)
       |      / count(*) AS cv
       |  FROM base CROSS JOIN range(1, 65) t(i)
       |  GROUP BY label, i),
       |cent AS (SELECT label, list(cv ORDER BY i) AS centroid
       |  FROM dims GROUP BY label),
       |cq0 AS (SELECT label, centroid,
       |    list_aggregate(list_transform(centroid, x -> abs(x)), 'max')
       |      AS cs
       |  FROM cent),
       |cq AS (SELECT * FROM (SELECT label,
       |    sqrt(list_dot_product(c_qv, c_qv)) AS c_qn, c_qv
       |  FROM (SELECT label,
       |      list_transform(centroid, e -> CASE WHEN cs = 0 THEN 0.0
       |        WHEN e >= 0 THEN floor(e * 127.0 / cs + 0.5)
       |        ELSE -floor(-(e * 127.0 / cs) + 0.5) END) AS c_qv
       |    FROM cq0)) WHERE c_qn > 0),
       |${quantizeSql(" label,")},
       |$qidsSql,
       |q AS (SELECT n.vec_id AS query_id, n.qv AS q_qv, n.qn AS q_qn
       |  FROM qn n JOIN qids s ON n.vec_id = s.vec_id),
       |probes AS (SELECT query_id, q_qv, q_qn, label,
       |    round(list_dot_product(q_qv, c_qv) / (q_qn * c_qn), 6)
       |      AS c_sim
       |  FROM q CROSS JOIN cq),
       |probed AS (SELECT query_id, q_qv, q_qn, label FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY c_sim DESC, label ASC) AS prn FROM probes)
       |  WHERE prn <= 3),
       |scored AS (SELECT p.query_id, n.vec_id AS neighbor_id,
       |    round(list_dot_product(p.q_qv, n.qv) / (p.q_qn * n.qn), 6)
       |      AS cos_sim
       |  FROM qn n JOIN probed p ON n.label = p.label
       |  WHERE n.vec_id <> p.query_id),
       |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM scored)""".stripMargin

  private val sAnnIvfInt8Sql =
    s"""$ivfInt8RankedCtes
       |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Two-stage retrieval: IVF×int8 coarse candidates (top-20 per
    * query on the quantized index) re-scored with the exact
    * double-precision cosine, true top-5 kept — the standard
    * recall-repair composition every production vector-search stack
    * runs (coarse ANN + exact rerank). See
    * [[Similarity.ivfInt8RerankTopK]] for the scale shape. */
  def sAnnRerank(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    Similarity.ivfInt8RerankTopK(e,
        Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, kCoarse = 20, nprobe = 3)
      .orderBy("query_id", "rank")
  }

  private val sAnnRerankSql =
    s"""$ivfInt8RankedCtes,
       |cand AS (SELECT query_id, neighbor_id FROM ranked
       |  WHERE rank <= 20),
       |ex AS (SELECT c.query_id, c.neighbor_id,
       |    ${sqlCosine("qb.emb", "nb.emb")} AS cos_sim
       |  FROM cand c
       |  JOIN base nb ON nb.vec_id = c.neighbor_id
       |  JOIN base qb ON qb.vec_id = c.query_id),
       |rr AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM ex)
       |SELECT query_id, neighbor_id, cos_sim, rank FROM rr
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** LSH-bucketed ANN. Oracle-verified: the seeded hyperplanes are
    * plan literals, so the oracle SQL inlines the same plane values
    * and reproduces bucket assignment + in-bucket ranking exactly.
    * Fixed |Q| = 16 ([[Similarity.sampleQueryIds]], r6): every
    * approximate entry now carries the scale-safe query shape — a
    * proportional predicate would grow the query set with the corpus
    * and re-introduce the quadratic total the index exists to avoid. */
  def sAnnLsh(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    Similarity.lshTopK(e,
        Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, numPlanes = 4, seed = 42L, dim = 64)
      .orderBy("query_id", "rank")
  }

  private def sqlCosine(a: String, b: String): String =
    s"round(list_dot_product($a, $b) / " +
    s"(sqrt(list_dot_product($a, $a)) * " +
    s"sqrt(list_dot_product($b, $b))), 6)"

  private val sAnnLshSql = {
    val planes = Similarity.hyperplanes(numPlanes = 4, dim = 64,
      seed = 42L)
    val bucket = planes.zipWithIndex.map { case (pl, i) =>
      val arr = "[" + pl.mkString(", ") + "]"
      s"CASE WHEN list_dot_product(emb, $arr) > 0 " +
      s"THEN ${1 << i} ELSE 0 END"
    }.mkString("\n    + ")
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |bk AS (SELECT vec_id, emb,
       |    $bucket AS bucket
       |  FROM base),
       |$qidsSql,
       |q AS (SELECT k.vec_id AS query_id, k.emb AS q_emb,
       |    k.bucket AS q_bucket
       |  FROM bk k JOIN qids s ON k.vec_id = s.vec_id),
       |scored AS (SELECT query_id, vec_id AS neighbor_id,
       |    ${sqlCosine("q_emb", "emb")} AS cos_sim
       |  FROM bk JOIN q ON bucket = q_bucket AND vec_id <> query_id),
       |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** Multi-probe LSH ANN ([[graft.ext.Similarity.lshMultiProbeTopK]],
    * Lv et al. 2007): 8 planes, 4 probes — the query's own bucket
    * plus the 3 buckets across its lowest-margin hyperplanes. The
    * oracle replays the probe selection with a rank over the same
    * IEEE margins and expands buckets with integer XOR, so the probe
    * SET (not just the final ranking) is hash-verified. */
  def sAnnLshMp(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    Similarity.lshMultiProbeTopK(e,
        Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, numPlanes = 8, nProbe = 4, seed = 42L, dim = 64)
      .orderBy("query_id", "rank")
  }

  private val sAnnLshMpSql = {
    val planes = Similarity.hyperplanes(numPlanes = 8, dim = 64,
      seed = 42L)
    def arr(pl: Seq[Double]) = "[" + pl.mkString(", ") + "]"
    val bucket = planes.zipWithIndex.map { case (pl, i) =>
      s"CASE WHEN list_dot_product(emb, ${arr(pl)}) > 0 " +
      s"THEN ${1 << i} ELSE 0 END"
    }.mkString("\n    + ")
    val marginStructs = planes.zipWithIndex.map { case (pl, i) =>
      s"{'m': abs(list_dot_product(q_emb, ${arr(pl)})), " +
      s"'bit': ${1 << i}}"
    }.mkString(",\n      ")
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |bk AS (SELECT vec_id, emb,
       |    $bucket AS bucket
       |  FROM base),
       |$qidsSql,
       |q AS (SELECT k.vec_id AS query_id, k.emb AS q_emb,
       |    k.bucket AS q_bucket
       |  FROM bk k JOIN qids s ON k.vec_id = s.vec_id),
       |mg AS (SELECT query_id, q_bucket, unnest([
       |      $marginStructs]) AS s
       |  FROM q),
       |fl AS (SELECT query_id, q_bucket, s.bit, row_number() OVER (
       |    PARTITION BY query_id ORDER BY s.m ASC, s.bit ASC) AS rn
       |  FROM mg),
       |pr AS (SELECT query_id, q_bucket AS p_bucket FROM q
       |  UNION ALL
       |  SELECT query_id, xor(q_bucket, bit) FROM fl WHERE rn <= 3),
       |scored AS (SELECT p.query_id, b.vec_id AS neighbor_id,
       |    ${sqlCosine("q.q_emb", "b.emb")} AS cos_sim
       |  FROM bk b JOIN pr p ON b.bucket = p.p_bucket
       |  JOIN q ON q.query_id = p.query_id
       |  WHERE b.vec_id <> p.query_id),
       |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** IVF-style ANN probing nearest label centroids. Oracle-verified:
    * centroid components are order-independent decimal sums
    * (QueryUtil strategy), so DuckDB reproduces the coarse quantizer
    * bit-for-bit. Fixed |Q| = 16 (r6, see [[sAnnLsh]]). */
  def sAnnIvf(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    Similarity.ivfTopK(e,
        Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, nprobe = 3)
      .orderBy("query_id", "rank")
  }

  /** Metadata-FILTERED ANN ([[Similarity.ivfTopKFiltered]]): top-k
    * among candidates satisfying `vec_id % 3 = 0` (the stand-in for
    * a metadata predicate — deterministic and SQL-mirrorable), over
    * the UNCHANGED full-corpus IVF index. nprobe widened 3 → 5 to
    * compensate ~1/3 selectivity inside the probed partitions (the
    * documented filtered-search recall lever); queries are the
    * standard 16-id sample and need not satisfy the predicate. */
  def sAnnFiltered(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    Similarity.ivfTopKFiltered(e,
        Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, nprobe = 5,
        candidateFilter = pmod(col("vec_id"), lit(3)) === 0)
      .orderBy("query_id", "rank")
  }

  /** [[sAnnFiltered]] with nprobe DERIVED from the predicate's
    * measured selectivity ([[Similarity.ivfTopKFilteredAuto]]):
    * `nprobe = min(n_labels, ⌈3·N/N_match⌉)`, exact integer
    * arithmetic, oracle-mirrored as a scalar subquery over the same
    * base CTE — the production form of the filtered-search recall
    * lever (the one knob the r11/r12 filtered entries left hand-set).
    * Predicate here is `vec_id % 2 = 0` (~1/2 selectivity → nprobe 6
    * of the fixture's 10 labels — non-degenerate on BOTH sides: wider
    * than the unfiltered 3, narrower than the exact filtered scan). */
  def sAnnFilteredAuto(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    Similarity.ivfTopKFilteredAuto(e,
        Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, baseNprobe = 3,
        candidateFilter = pmod(col("vec_id"), lit(2)) === 0)
      .orderBy("query_id", "rank")
  }

  private val sAnnFilteredAutoSql =
    s"""WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |np AS (SELECT least(count(DISTINCT label),
       |    (3 * count(*) + sum(CASE WHEN ((vec_id % 2) + 2) % 2 = 0
       |      THEN 1 ELSE 0 END) - 1)
       |    // sum(CASE WHEN ((vec_id % 2) + 2) % 2 = 0
       |      THEN 1 ELSE 0 END)) AS nprobe FROM base),
       |dims AS (SELECT label, i,
       |    CAST(sum(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE)
       |      / count(*) AS cv
       |  FROM base CROSS JOIN range(1, 65) t(i)
       |  GROUP BY label, i),
       |cent AS (SELECT label, list(cv ORDER BY i) AS centroid
       |  FROM dims GROUP BY label),
       |$qidsSql,
       |q AS (SELECT b.vec_id AS query_id, b.emb AS q_emb
       |  FROM base b JOIN qids s ON b.vec_id = s.vec_id),
       |probes AS (SELECT query_id, q_emb, label,
       |    ${sqlCosine("q_emb", "centroid")} AS c_sim
       |  FROM q CROSS JOIN cent),
       |probed AS (SELECT query_id, q_emb, label FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY c_sim DESC, label ASC) AS prn FROM probes)
       |  WHERE prn <= (SELECT nprobe FROM np)),
       |scored AS (SELECT p.query_id, b.vec_id AS neighbor_id,
       |    ${sqlCosine("p.q_emb", "b.emb")} AS cos_sim
       |  FROM base b JOIN probed p ON b.label = p.label
       |  WHERE b.vec_id <> p.query_id
       |    AND ((b.vec_id % 2) + 2) % 2 = 0),
       |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  private val sAnnFilteredSql =
    s"""WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |dims AS (SELECT label, i,
       |    CAST(sum(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE)
       |      / count(*) AS cv
       |  FROM base CROSS JOIN range(1, 65) t(i)
       |  GROUP BY label, i),
       |cent AS (SELECT label, list(cv ORDER BY i) AS centroid
       |  FROM dims GROUP BY label),
       |$qidsSql,
       |q AS (SELECT b.vec_id AS query_id, b.emb AS q_emb
       |  FROM base b JOIN qids s ON b.vec_id = s.vec_id),
       |probes AS (SELECT query_id, q_emb, label,
       |    ${sqlCosine("q_emb", "centroid")} AS c_sim
       |  FROM q CROSS JOIN cent),
       |probed AS (SELECT query_id, q_emb, label FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY c_sim DESC, label ASC) AS prn FROM probes)
       |  WHERE prn <= 5),
       |scored AS (SELECT p.query_id, b.vec_id AS neighbor_id,
       |    ${sqlCosine("p.q_emb", "b.emb")} AS cos_sim
       |  FROM base b JOIN probed p ON b.label = p.label
       |  WHERE b.vec_id <> p.query_id
       |    AND ((b.vec_id % 3) + 3) % 3 = 0),
       |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  private val sAnnIvfSql =
    s"""WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |dims AS (SELECT label, i,
       |    CAST(sum(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE)
       |      / count(*) AS cv
       |  FROM base CROSS JOIN range(1, 65) t(i)
       |  GROUP BY label, i),
       |cent AS (SELECT label, list(cv ORDER BY i) AS centroid
       |  FROM dims GROUP BY label),
       |$qidsSql,
       |q AS (SELECT b.vec_id AS query_id, b.emb AS q_emb
       |  FROM base b JOIN qids s ON b.vec_id = s.vec_id),
       |probes AS (SELECT query_id, q_emb, label,
       |    ${sqlCosine("q_emb", "centroid")} AS c_sim
       |  FROM q CROSS JOIN cent),
       |probed AS (SELECT query_id, q_emb, label FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY c_sim DESC, label ASC) AS prn FROM probes)
       |  WHERE prn <= 3),
       |scored AS (SELECT p.query_id, b.vec_id AS neighbor_id,
       |    ${sqlCosine("p.q_emb", "b.emb")} AS cos_sim
       |  FROM base b JOIN probed p ON b.label = p.label
       |  WHERE b.vec_id <> p.query_id),
       |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** ANN index MAINTENANCE ([[Similarity.ivfIncremental]]) — the
    * vector-side ingest gate, completing the incremental family
    * (`d_incremental_dedup`, `d_incremental_minhash`): the manifest
    * (vec_id % 10 ≠ 0) is the already-ingested corpus whose IVF
    * index exists; the batch (vec_id % 10 = 0) probes that index —
    * nprobe nearest MANIFEST centroids, fine-rank only inside those
    * partitions, top-3 attach points per new vector for downstream
    * dedup-or-link. No refit, no re-encode; per-batch work linear in
    * the batch (|Q| scales with the batch BY CONTRACT — the
    * documented ingest-gate exception to the fixed-|Q| rule).
    *
    * r9: the coarse quantizer's k scales with the manifest —
    * k = ⌈N/64⌉ deterministic k-means partitions instead of r8's
    * fixed 8 label partitions — so partition size, and with it
    * per-batch probe cost, stays FLAT as the corpus grows (the r8
    * shape was linear in N: 1.9 s → 15.4 s for 18k → 198k manifests
    * at the same 2k batch). The oracle derives the same k via a
    * scalar subquery over count(*) and unrolls the same 2-iteration
    * fit, so the k ∝ N index is hash-verified end to end. */
  def sAnnIncremental(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    Similarity.ivfIncremental(
        e.filter(col("vec_id") % 10 =!= 0),
        e.filter(col("vec_id") % 10 === 0),
        k = 3, nprobe = 3, targetPartitionSize = 64, iters = 2)
      .orderBy("new_id", "rank")
  }

  private val sAnnIncrementalSql = annGateOracleSql(10, 3, 3)

  /** [[sAnnIncremental]] on the √N-cluster coarse quantizer
    * ([[Similarity.ivfIncrementalSqrt]]) — the BOUNDED-k ingest gate
    * the k ∝ N entry's scale story points to beyond ~10M vectors.
    * k = ⌈√N⌉ is the classical IVF operating point (per-query probe
    * cost `k + nprobe·N/k` is minimized at k = √(nprobe·N); FAISS's
    * guideline is √N…16√N clusters): build drops from O(N²/target)
    * to O(N^1.5), probe grows as √N instead of flat — and at
    * measured corpus sizes the √N probe is cheaper outright because
    * k ∝ N already over-shoots the √-optimum (198k manifest: k=3094
    * vs 446). Oracle: the same unrolled 2-iteration fit with
    * k = ceil(sqrt(count(*))) as a scalar subquery — IEEE sqrt is
    * correctly rounded, so the k derivation is engine-portable. */
  def sAnnIncrementalSqrt(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    Similarity.ivfIncrementalSqrt(
        e.filter(col("vec_id") % 10 =!= 0),
        e.filter(col("vec_id") % 10 === 0),
        k = 3, nprobe = 3, iters = 2)
      .orderBy("new_id", "rank")
  }

  private val sAnnIncrementalSqrtSql =
    s"""WITH man AS (SELECT vec_id, embedding::DOUBLE[] AS emb
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND vec_id % 10 <> 0),
       |newb AS (SELECT vec_id, embedding::DOUBLE[] AS emb
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND vec_id % 10 = 0),
       |${kmUnrolledCoreSql("man",
          "SELECT CAST(ceil(sqrt(count(*))) AS INT) FROM man")},
       |probes AS (SELECT n.vec_id AS new_id, n.emb AS q_emb, c.cid,
       |    ${sqlCosine("n.emb", "c.centroid")} AS c_sim
       |  FROM newb n CROSS JOIN c2 c),
       |probed AS (SELECT new_id, q_emb, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY new_id
       |      ORDER BY c_sim DESC, cid ASC) AS prn FROM probes)
       |  WHERE prn <= 3),
       |scored AS (SELECT p.new_id, m.vec_id AS match_id,
       |    ${sqlCosine("p.q_emb", "m.emb")} AS cos_sim
       |  FROM members m JOIN probed p ON m.cid = p.cid
       |  WHERE m.vec_id <> p.new_id),
       |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY new_id
       |    ORDER BY cos_sim DESC, match_id ASC) AS INT) AS rank
       |  FROM scored)
       |SELECT new_id, match_id, cos_sim, rank
       |FROM ranked WHERE rank <= 3 ORDER BY new_id, rank""".stripMargin

  /** Oracle builder for the ANN ingest gate shared with the streaming
    * entry (`st_ann_gate`, queries/Streaming.scala): the same
    * unrolled k ∝ N fit + probe as [[sAnnIncremental]]'s oracle,
    * parameterized by the manifest/incoming modulus split and the
    * probe knobs, so the stream-side gate can never drift from the
    * batch family's hash-verified machinery. */
  private[queries] def annGateOracleSql(mod: Int, k: Int,
      nprobe: Int): String =
    s"""WITH man AS (SELECT vec_id, embedding::DOUBLE[] AS emb
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND vec_id % $mod <> 0),
       |newb AS (SELECT vec_id, embedding::DOUBLE[] AS emb
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND vec_id % $mod = 0),
       |${kmUnrolledCoreSql("man",
          "SELECT CAST(ceil(count(*) / 64.0) AS INT) FROM man")},
       |probes AS (SELECT n.vec_id AS new_id, n.emb AS q_emb, c.cid,
       |    ${sqlCosine("n.emb", "c.centroid")} AS c_sim
       |  FROM newb n CROSS JOIN c2 c),
       |probed AS (SELECT new_id, q_emb, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY new_id
       |      ORDER BY c_sim DESC, cid ASC) AS prn FROM probes)
       |  WHERE prn <= $nprobe),
       |scored AS (SELECT p.new_id, m.vec_id AS match_id,
       |    ${sqlCosine("p.q_emb", "m.emb")} AS cos_sim
       |  FROM members m JOIN probed p ON m.cid = p.cid
       |  WHERE m.vec_id <> p.new_id),
       |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY new_id
       |    ORDER BY cos_sim DESC, match_id ASC) AS INT) AS rank
       |  FROM scored)
       |SELECT new_id, match_id, cos_sim, rank
       |FROM ranked WHERE rank <= $k ORDER BY new_id, rank""".stripMargin

  /** IVF with a real deterministic k-means coarse quantizer (8
    * clusters, 2 Lloyd iterations, smallest-vec_id seeds). Every step
    * — seeding, rounded-cosine assignment, decimal-sum centroid
    * updates — is order-independent and engine-portable, so the whole
    * iterative fit is hash-verified against a DuckDB oracle that
    * unrolls the same two iterations. */
  def sAnnIvfKmeans(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    Similarity.ivfTopKKmeans(e,
        Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, nprobe = 3, kClusters = 8, iters = 2)
      .orderBy("query_id", "rank")
  }

  /** TWO-LEVEL quantizer ANN ([[Similarity.ivfTopKTwoLevel]]) — the
    * hierarchical production regime: level 1 = the exact per-label
    * centroids, level 2 = an independent deterministic k-means of 4
    * sub-clusters INSIDE each label (k1·k2 = 40 cells). Assignment
    * cost is N·(k1 + k2) instead of a flat quantizer's N·k1·k2 — the
    * scaling answer to the measured k ∝ N assignment wall (at 2M
    * vectors a 31k-cell flat grid costs 6×10¹⁰ candidate evals, the
    * hierarchy ~7×10⁸). Probe: nprobe1 labels, then nprobe2
    * sub-clusters per probed label, fine rank inside the
    * nprobe1·nprobe2 cells. The oracle unrolls the per-label fit —
    * the shared k-means machinery with `label` added to every GROUP
    * BY / PARTITION BY — so the grid is hash-verified end to end. */
  def sAnnIvfTwoLevel(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    Similarity.ivfTopKTwoLevel(e,
        Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, nprobe1 = 3, nprobe2 = 2, k2 = 4, iters = 2)
      .orderBy("query_id", "rank")
  }

  private val sAnnIvfTwoLevelSql = {
    def assign(src: String, cent: String, out: String) =
      s"""$out AS (SELECT vec_id, label, emb, scid FROM (
         |  SELECT b.vec_id, b.label, b.emb, c.scid,
         |    row_number() OVER (PARTITION BY b.vec_id
         |      ORDER BY ${sqlCosine("b.emb", "c.centroid")} DESC,
         |        c.scid) AS rn
         |  FROM base b JOIN $cent c ON b.label = c.label)
         |  WHERE rn = 1)""".stripMargin
    def update(assigned: String, out: String) =
      s"""${out}d AS (SELECT label, scid, i,
         |    CAST(sum(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE)
         |      / count(*) AS cv
         |  FROM $assigned CROSS JOIN range(1, 65) t(i)
         |  GROUP BY label, scid, i),
         |$out AS (SELECT label, scid, list(cv ORDER BY i) AS centroid
         |  FROM ${out}d GROUP BY label, scid)""".stripMargin
    s"""WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |dims AS (SELECT label, i,
       |    CAST(sum(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE)
       |      / count(*) AS cv
       |  FROM base CROSS JOIN range(1, 65) t(i)
       |  GROUP BY label, i),
       |cent AS (SELECT label, list(cv ORDER BY i) AS centroid
       |  FROM dims GROUP BY label),
       |init2 AS (SELECT label, CAST(rn - 1 AS INT) AS scid,
       |    emb AS centroid
       |  FROM (SELECT label, emb, row_number() OVER (
       |      PARTITION BY label ORDER BY vec_id) AS rn FROM base)
       |  WHERE rn <= 4),
       |${assign("base", "init2", "sa1")},
       |${update("sa1", "sc1")},
       |${assign("base", "sc1", "sa2")},
       |${update("sa2", "sc2")},
       |${assign("base", "sc2", "members")},
       |$qidsSql,
       |q AS (SELECT b.vec_id AS query_id, b.emb AS q_emb
       |  FROM base b JOIN qids s ON b.vec_id = s.vec_id),
       |p1 AS (SELECT query_id, q_emb, label,
       |    ${sqlCosine("q_emb", "centroid")} AS c_sim
       |  FROM q CROSS JOIN cent),
       |pr1 AS (SELECT query_id, q_emb, label FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY c_sim DESC, label ASC) AS prn FROM p1)
       |  WHERE prn <= 3),
       |p2 AS (SELECT p.query_id, p.q_emb, p.label, c.scid,
       |    ${sqlCosine("p.q_emb", "c.centroid")} AS s_sim
       |  FROM pr1 p JOIN sc2 c ON p.label = c.label),
       |pr2 AS (SELECT query_id, q_emb, label, scid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id, label
       |      ORDER BY s_sim DESC, scid ASC) AS srn FROM p2)
       |  WHERE srn <= 2),
       |scored AS (SELECT p.query_id, m.vec_id AS neighbor_id,
       |    ${sqlCosine("p.q_emb", "m.emb")} AS cos_sim
       |  FROM members m JOIN pr2 p
       |    ON m.label = p.label AND m.scid = p.scid
       |  WHERE m.vec_id <> p.query_id),
       |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** Shared oracle prefix: the unrolled deterministic k-means fit
    * (smallest-vec_id seeds → 2×(assign, update) → final membership)
    * as a WITH-clause body ending in CTEs `c2` (fitted centroids) and
    * `members` (vec_id, emb, cid). Used by both the IVF-k-means ANN
    * oracle and the SemDeDup oracle so the two can never drift. */
  /** [[kmUnrolledSql]]'s core over an arbitrary base CTE `b`
    * (vec_id, emb) with k given as a SQL expression — a literal for
    * the fixed-k entries, a scalar subquery for the k ∝ N ingest
    * gate. Emits CTEs init → a1/c1 → a2/c2 → members. */
  private def kmUnrolledCoreSql(b: String, kExpr: String): String =
    kmUnrolledCoreSplitSql(b, b, kExpr)

  /** [[kmUnrolledCoreSql]] with the FIT corpus split from the ASSIGN
    * corpus — seeds and both Lloyd passes run over `fitB` while the
    * final `members` assignment covers `assignB`: the oracle form of
    * the family's `fitSampleMod` sampled-fit lever (`fitB` = the
    * `vec_id % mod = 0` slice of `assignB`). With `fitB == assignB`
    * this IS the shared full-fit fragment. */
  private def kmUnrolledCoreSplitSql(fitB: String, assignB: String,
      kExpr: String): String = {
    def assignSql(src: String, cent: String, out: String): String =
      s"""$out AS (SELECT vec_id, emb, cid FROM (
         |  SELECT b.vec_id, b.emb, c.cid,
         |    row_number() OVER (PARTITION BY b.vec_id
         |      ORDER BY ${sqlCosine("b.emb", "c.centroid")} DESC, c.cid)
         |      AS rn
         |  FROM $src b CROSS JOIN $cent c) WHERE rn = 1)""".stripMargin
    def updateSql(assigned: String, out: String): String =
      s"""${out}d AS (SELECT cid, i,
         |    CAST(sum(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE)
         |      / count(*) AS cv
         |  FROM $assigned CROSS JOIN range(1, 65) t(i)
         |  GROUP BY cid, i),
         |$out AS (SELECT cid, list(cv ORDER BY i) AS centroid
         |  FROM ${out}d GROUP BY cid)""".stripMargin
    s"""init AS (SELECT CAST(rn - 1 AS INT) AS cid, emb AS centroid
       |  FROM (SELECT emb, row_number() OVER (ORDER BY vec_id) AS rn
       |    FROM $fitB) WHERE rn <= ($kExpr)),
       |${assignSql(fitB, "init", "a1")},
       |${updateSql("a1", "c1")},
       |${assignSql(fitB, "c1", "a2")},
       |${updateSql("a2", "c2")},
       |${assignSql(assignB, "c2", "members")}""".stripMargin
  }

  private def kmUnrolledSql(kClusters: Int): String =
    s"""base AS (SELECT vec_id, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |${kmUnrolledCoreSql("base", kClusters.toString)}""".stripMargin

  private val sAnnIvfKmeansSql =
    s"""WITH ${kmUnrolledSql(8)},
       |$qidsSql,
       |q AS (SELECT b.vec_id AS query_id, b.emb AS q_emb
       |  FROM base b JOIN qids s ON b.vec_id = s.vec_id),
       |probes AS (SELECT query_id, q_emb, cid,
       |    ${sqlCosine("q_emb", "centroid")} AS c_sim
       |  FROM q CROSS JOIN c2),
       |probed AS (SELECT query_id, q_emb, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY c_sim DESC, cid ASC) AS prn FROM probes)
       |  WHERE prn <= 3),
       |scored AS (SELECT p.query_id, m.vec_id AS neighbor_id,
       |    ${sqlCosine("p.q_emb", "m.emb")} AS cos_sim
       |  FROM members m JOIN probed p ON m.cid = p.cid
       |  WHERE m.vec_id <> p.query_id),
       |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Product-quantization ANN ([[Similarity.pqTopK]]): 64 dims → 16
    * subspaces × 4 dims, one deterministic L2 codebook (32 centroids,
    * 2 Lloyd iterations) per subspace, corpus encoded to 16 codes per
    * vector, asymmetric-distance scoring for the fixed |Q| = 16 query
    * sample. The whole index — sixteen k-means fits, the code
    * assignment, the per-query lookup tables, the summed ADC scores —
    * is hash-verified against an oracle that unrolls every subspace
    * fit. Complements the int8 entries: scalar quantization
    * compresses bandwidth ~7×; PQ compresses the scan state 32× (16
    * code bytes vs 512 raw bytes) and replaces per-pair arithmetic
    * with table lookups — the memory layout a 100-TB corpus scan
    * actually ships. Parameter sweep on this corpus (uniform-random
    * embeddings — PQ's worst case, no cluster structure to exploit):
    * recall@5 vs brute = 0.16 (m=4,k=8), 0.29 (8,16), 0.54 (16,32),
    * 0.65 (16,64); the catalog pins (16,32) as the cost/recall
    * balance and SimilaritySpec bounds both this corpus's recall and
    * exactness on a separable fixture. */
  def sAnnPq(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    Similarity.pqTopK(e,
        Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, m = 16, kSub = 32, iters = 2)
      .orderBy("query_id", "rank")
  }

  /** Shared oracle fragments for the PQ family (catalog
    * parameterization m=16, subDim=4, kSub=32). [[pqFitsSql]] unrolls
    * every subspace fit — per subspace s, CTEs `bs` (sliced corpus) →
    * `is` (seeds) → assign/update ×2 → `ms` (final assignment, the
    * codes) with `cs2` the fitted codebook; [[pqCodesUnionSql]] /
    * [[pqLutUnionSql]] splice the per-subspace frames into the
    * `codes` and `lut` bodies. Same fragment grammar as
    * [[kmUnrolledSql]] with L2 in place of cosine; shared by
    * `s_ann_pq` and `s_ann_ivf_pq` so the two fits can never
    * drift. */
  private val PqM = 16; private val PqSubDim = 4; private val PqKSub = 32
  private def pqLo(s: Int) = s * PqSubDim + 1
  private def pqHi(s: Int) = (s + 1) * PqSubDim
  private def pqFitsSql: String = pqFitsSqlWith(None)
  /** `sampleMod = Some(n)` fits every subspace codebook (seeds,
    * both Lloyd rounds) on the `vec_id % n = 0` sample while the
    * final code assignment `m$s` still covers the full corpus —
    * mirrors [[Similarity.pqTopK]]'s `fitSampleMod`. `src` is the
    * (vec_id, emb) CTE the subspaces slice — `base` for raw-vector
    * PQ, `rbase` for the residual variant. */
  private def pqFitsSqlWith(sampleMod: Option[Int],
      src: String = "base", encodeSrc: Option[String] = None): String = {
    // identical float expression tree to Similarity.l2sq
    def l2(a: String, b: String) =
      s"round(list_dot_product($a, $a) - 2 * list_dot_product($a, $b)" +
      s" + list_dot_product($b, $b), 6)"
    def assignSql(src: String, cent: String, out: String) =
      s"""$out AS (SELECT vec_id, emb, cid FROM (
         |  SELECT b.vec_id, b.emb, c.cid,
         |    row_number() OVER (PARTITION BY b.vec_id
         |      ORDER BY ${l2("b.emb", "c.centroid")} ASC, c.cid)
         |      AS rn
         |  FROM $src b CROSS JOIN $cent c) WHERE rn = 1)""".stripMargin
    def updateSql(assigned: String, out: String) =
      s"""${out}d AS (SELECT cid, i,
         |    CAST(sum(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE)
         |      / count(*) AS cv
         |  FROM $assigned CROSS JOIN range(1, ${PqSubDim + 1}) t(i)
         |  GROUP BY cid, i),
         |$out AS (SELECT cid, list(cv ORDER BY i) AS centroid
         |  FROM ${out}d GROUP BY cid)""".stripMargin
    (0 until PqM).map { s =>
      val fitSrc = if (sampleMod.isDefined) s"fb$s" else s"b$s"
      val fbCte = sampleMod.map(n =>
        s"fb$s AS (SELECT vec_id, emb FROM b$s WHERE vec_id % $n = 0),\n")
        .getOrElse("")
      // encodeSrc splits the FIT corpus from the ENCODE corpus (the
      // stored-index append path: codebooks fitted on the manifest,
      // membership codes for every row); default = encode what you fit
      val encCte = encodeSrc.map(es =>
        s"e$s AS (SELECT vec_id, emb[${pqLo(s)}:${pqHi(s)}] AS emb" +
          s" FROM $es),\n").getOrElse("")
      val encName = if (encodeSrc.isDefined) s"e$s" else s"b$s"
      s"""b$s AS (SELECT vec_id, emb[${pqLo(s)}:${pqHi(s)}] AS emb
         |  FROM $src),
         |$encCte${fbCte}i$s AS (SELECT CAST(rn - 1 AS INT) AS cid, emb AS centroid
         |  FROM (SELECT emb, row_number() OVER (ORDER BY vec_id) AS rn
         |    FROM $fitSrc) WHERE rn <= $PqKSub),
         |${assignSql(fitSrc, s"i$s", s"a${s}1")},
         |${updateSql(s"a${s}1", s"c${s}1")},
         |${assignSql(fitSrc, s"c${s}1", s"a${s}2")},
         |${updateSql(s"a${s}2", s"c${s}2")},
         |${assignSql(encName, s"c${s}2", s"m$s")}""".stripMargin
    }.mkString(",\n")
  }
  private def pqCodesUnionSql: String = (0 until PqM)
    .map(s => s"SELECT vec_id, $s AS sub, cid FROM m$s")
    .mkString("\n  UNION ALL ")
  // pdot raw (no per-term round) — see Similarity.pqTopK's note on
  // half-way rounding divergence; the sumDec decimal cast is the one
  // shared quantization point
  private def pqLutUnionSql: String = (0 until PqM)
    .map(s => s"SELECT query_id, $s AS sub, cid, " +
      s"list_dot_product(q_emb[${pqLo(s)}:${pqHi(s)}], centroid)" +
      s" AS pdot FROM q CROSS JOIN c${s}2")
    .mkString("\n  UNION ALL ")

  /** Everything downstream of the (vec_id, emb) `base` CTE in the
    * exhaustive-ADC PQ oracle — ONE definition shared by the raw,
    * sampled-fit, balanced-permutation and OPQ-rotation entries
    * (whose only difference is how `base` is derived and which fit
    * fragments run), so the four ADC chains can never drift. */
  private def pqAdcBodySql(fits: String): String =
    s"""$fits,
       |$qidsSql,
       |q AS (SELECT b.vec_id AS query_id, b.emb AS q_emb
       |  FROM base b JOIN qids s ON b.vec_id = s.vec_id),
       |codes AS ($pqCodesUnionSql),
       |lut AS ($pqLutUnionSql),
       |scored AS (SELECT query_id, k.vec_id AS neighbor_id,
       |    round(${sqlSumDec("pdot")}, 6) AS adc_dot
       |  FROM codes k JOIN lut l ON k.sub = l.sub AND k.cid = l.cid
       |  WHERE k.vec_id <> l.query_id
       |  GROUP BY query_id, k.vec_id),
       |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY adc_dot DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, adc_dot, rank FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  private val sAnnPqSql =
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |${pqAdcBodySql(pqFitsSql)}""".stripMargin

  /** PQ with the SAMPLED codebook fit ([[Similarity.pqTopK]] at
    * `fitSampleMod = 4`): quantizers trained on the deterministic
    * quarter-sample, full corpus encoded and scored — the production
    * fit shape (bounded-sample training makes fit cost
    * corpus-independent; the corpus pays exactly one encode pass).
    * Hash-verified because the modulus sample is SQL-mirrorable. */
  def sAnnPqSampled(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    Similarity.pqTopK(e,
        Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, m = 16, kSub = 32, iters = 2, fitSampleMod = 4L)
      .orderBy("query_id", "rank")
  }

  private val sAnnPqSampledSql =
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |${pqAdcBodySql(pqFitsSqlWith(Some(4)))}""".stripMargin

  /** Variance-balanced PQ ([[Similarity.pqTopKBalanced]]): dims
    * ranked by exact-decimal variance and dealt round-robin across
    * the 16 subspaces before the standard fit/encode/ADC — the
    * anisotropy fix (OPQ's initialization heuristic). The oracle
    * derives the SAME permutation in SQL (identical decimal sums,
    * identical (variance DESC, dim) rank) and feeds the permuted CTE
    * through the SHARED subspace-fit fragments (`pqFitsSqlWith`), so
    * permutation + fit + codes + ADC are all hash-verified end to
    * end. On this corpus (uniform embeddings, near-equal variances)
    * the permutation is near-identity by design — the anisotropic
    * case where balancing wins recall is pinned in SimilaritySpec. */
  def sAnnPqBalanced(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    Similarity.pqTopKBalanced(e,
        Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, m = 16, kSub = 32, iters = 2)
      .orderBy("query_id", "rank")
  }

  private val sAnnPqBalancedSql =
    s"""WITH rawb AS (SELECT vec_id, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |vstat AS (SELECT i,
       |    CAST(sum(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE) AS s1,
       |    CAST(sum(CAST(emb[i] * emb[i] AS DECIMAL(18,6))) AS DOUBLE)
       |      AS s2,
       |    count(*) AS n
       |  FROM rawb CROSS JOIN range(1, 65) t(i) GROUP BY i),
       |vr AS (SELECT i, round((s2 - s1 * s1 / n) / n, 6) AS variance
       |  FROM vstat),
       |-- rank r (0-based) deals dim to subspace r % 16, slot r // 16
       |rk AS (SELECT i AS olddim, CAST(row_number() OVER (
       |      ORDER BY variance DESC, i) - 1 AS INT) AS r FROM vr),
       |dm AS (SELECT (r % 16) * 4 + (r // 16) AS newpos, olddim
       |  FROM rk),
       |pm AS (SELECT list(olddim ORDER BY newpos) AS pm FROM dm),
       |base AS (SELECT vec_id,
       |    list_transform(range(1, 65), p -> emb[pm[p]]) AS emb
       |  FROM rawb CROSS JOIN pm),
       |${pqAdcBodySql(pqFitsSql)}""".stripMargin

  /** The exact integer-micro covariance matrix of the embedding
    * corpus — [[graft.ext.Pca.covMeans]]' fused-kernel aggregate
    * surfaced as its own hash-verified entry. This is the
    * verification anchor for every LOCAL eigensolve built on it
    * (power iteration, Hotelling deflation, and the OPQ Jacobi
    * rotation of [[sAnnPqOpq]]): DuckDB independently reproduces the
    * 4096 BIGINT cells, and the rotation is a pure deterministic
    * function of exactly these integers (PcaSpec pins the function's
    * invariants), so the chain covariance → rotation → rotated-ADC
    * is verified end to end even though no SQL engine can replay a
    * Jacobi sweep. One corpus pass; the shuffle is matrix-sized. */
  def dEmbedCov(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (_, c) = graft.ext.Pca.covMeans(embs(s, d), 64)
    (for (i <- 0 until 64; j <- 0 until 64)
      yield (i.toLong, j.toLong, c(i)(j)))
      .toDF("i", "j", "ci").orderBy("i", "j")
  }

  /** PQ over the TRAINED OPQ rotation ([[graft.ext.Pca.opqRotation]]
    * — Ge et al. 2013's parametric form: full Jacobi eigenbasis +
    * greedy eigenvalue allocation across the 16 subspaces). The
    * rotation is derived from the SAME covariance integers the
    * hash-verified [[dEmbedCov]] entry dumps, applied as a
    * plan-literal 64×64 projection (left-fold sums — identical IEEE
    * order in both engines), and everything downstream is the
    * unmodified [[Similarity.pqTopK]] machinery. Verification chain:
    * the covariance is hash-verified by `d_embed_cov`; the rotation
    * is a pure deterministic local function of it (orthogonality,
    * eigen-residuals and allocation pinned in PcaSpec); the oracle
    * embeds the derived rotation as literals (the
    * hyperplane-literal pattern of `s_ann_lsh`) and replays
    * rotation-application + fit + codes + ADC in full — dumped AFTER
    * the query runs (Verify's contract), via [[dynamicOracle]]. */
  def sAnnPqOpq(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    val (_, c) = graft.ext.Pca.covMeans(e, 64)
    val rot = graft.ext.Pca.opqRotation(c, 64, m = PqM)
    opqRotationUsed.put(d, rot)
    // r15: the rotation is ONE mat_vec_lit kernel node (MatVecLit),
    // so the checkpoint that severed the old 4096-literal tree from
    // the PQ chain's Catalyst transforms is gone — the lazy rotated
    // frame feeds pqTopK, whose internal base persist is the single
    // corpus materialization (the checkpoint was a SECOND corpus-
    // sized copy plus an extra eager pass)
    val rotated = graft.ext.Pca.applyRotation(e, rot)
    Similarity.pqTopK(rotated,
        Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, m = PqM, kSub = PqKSub, iters = 2)
      .orderBy("query_id", "rank")
  }

  /** Rotations derived at query time, KEYED BY DATASET DIR (r11
    * advice: a bare global would yield a plausible-but-wrong oracle
    * if one JVM ever ran queries on one dataset and dumped for
    * another). [[rotationSqlNow]] only emits literals when exactly
    * one dataset has run; zero or several → a marker statement that
    * fails the compare loudly instead of passing wrongly. */
  private val opqRotationUsed =
    new java.util.concurrent.ConcurrentHashMap[String,
      Array[Array[Double]]]()
  private val opqResRotationUsed =
    new java.util.concurrent.ConcurrentHashMap[String,
      Array[Array[Double]]]()

  /** Plan-literal rotation oracle builder, shared by the OPQ entries:
    * built at DUMP time from the rotation the query actually derived
    * (Verify runs every query before dumping oracle_sql.json, so the
    * driver's correctness gate always sees the real literals; a
    * restricted dev dump that skipped the query — or a JVM that ran
    * several datasets — gets a marker statement instead). The rotated
    * base reproduces the plan's left-fold double sums term by term;
    * `mkBody` supplies everything downstream of the rotated base. */
  private def rotationSqlNow(name: String,
      cache: java.util.concurrent.ConcurrentHashMap[String,
        Array[Array[Double]]],
      keep: String, mkBody: String => String): String = {
    import scala.jdk.CollectionConverters._
    cache.asScala.toSeq match {
      case Seq() =>
        s"SELECT 'run $name before dumping its oracle' AS err"
      case Seq((_, rot)) =>
        val rows = (0 until 64).map { i =>
          (0 until 64).map(j => s"(${rot(i)(j)}) * emb[${j + 1}]")
            .mkString(" + ")
        }.mkString(",\n      ")
        // MATERIALIZED: the rotated frame is a 64×64 = 4096-term
        // expression per row and the residual body references `base`
        // ~20 times (16 subspace slices, dims, q, codesl). DuckDB
        // inlines plain CTEs per reference, which re-plans and
        // re-evaluates the rotation everywhere — measured 232 s for
        // s_ann_pq_opq and ~620 s for each OPQ×residual oracle at
        // sf0.01; forcing one materialization cuts them to seconds
        // (4.5 s measured) without touching semantics.
        mkBody(s"""rawb AS (SELECT vec_id,$keep
           |    embedding::DOUBLE[] AS emb
           |  FROM embeddings WHERE embedding IS NOT NULL),
           |base AS MATERIALIZED (SELECT vec_id,$keep list_value(
           |      $rows) AS emb
           |  FROM rawb)""".stripMargin)
      case many =>
        s"SELECT '$name ran against ${many.size} datasets in this " +
          "JVM - rotation ambiguous, rerun a single-dataset dump' AS err"
    }
  }

  private def sAnnPqOpqSqlNow: String =
    rotationSqlNow("s_ann_pq_opq", opqRotationUsed, keep = "",
      rotated => s"""WITH $rotated,
         |${pqAdcBodySql(pqFitsSql)}""".stripMargin)

  /** Oracle statements that depend on state a query derives at run
    * time (plan-literal rotations). [[graft.SparkEntry.oracleSql]]
    * splices these in at dump time. */
  def dynamicOracle: Map[String, String] =
    Map("s_ann_pq_opq" -> sAnnPqOpqSqlNow,
      "s_ann_ivf_pq_opq_res" -> sAnnIvfPqOpqResSqlNow,
      "s_ann_ivf_pq_opq_res_sampled" -> sAnnIvfPqOpqResSampledSqlNow)

  private val dEmbedCovSql = graft.ext.Pca.covSql(64)

  /** IVF × PQ ([[Similarity.ivfTopKPq]]) — the canonical production
    * composition (what FAISS-class systems deploy): per-label coarse
    * pruning to nprobe=3 partitions per query + PQ-coded ADC fine
    * ranking inside them. Both levels hash-verified in one oracle:
    * the per-label decimal-mean centroids AND all 16 unrolled
    * subspace fits (shared fragments with `s_ann_pq`, so the two
    * indexes can never drift). */
  def sAnnIvfPq(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    Similarity.ivfTopKPq(e,
        Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, nprobe = 3, m = 16, kSub = 32, iters = 2)
      .orderBy("query_id", "rank")
  }

  private def ivfPqSqlWith(fits: String, nprobe: String = "3",
      candWhere: String = "") =
    s"""WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |dims AS (SELECT label, i,
       |    CAST(sum(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE)
       |      / count(*) AS cv
       |  FROM base CROSS JOIN range(1, 65) t(i)
       |  GROUP BY label, i),
       |cent AS (SELECT label, list(cv ORDER BY i) AS centroid
       |  FROM dims GROUP BY label),
       |$fits,
       |$qidsSql,
       |q AS (SELECT b.vec_id AS query_id, b.emb AS q_emb
       |  FROM base b JOIN qids s ON b.vec_id = s.vec_id),
       |probes AS (SELECT query_id, label,
       |    ${sqlCosine("q_emb", "centroid")} AS c_sim
       |  FROM q CROSS JOIN cent),
       |probed AS (SELECT query_id, label FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY c_sim DESC, label ASC) AS prn FROM probes)
       |  WHERE prn <= $nprobe),
       |codes AS ($pqCodesUnionSql),
       |codesl AS (SELECT c.vec_id, b.label, c.sub, c.cid
       |  FROM codes c JOIN base b ON c.vec_id = b.vec_id),
       |lut AS ($pqLutUnionSql),
       |scored AS (SELECT l.query_id, k.vec_id AS neighbor_id,
       |    round(${sqlSumDec("pdot")}, 6) AS adc_dot
       |  FROM codesl k
       |  JOIN probed p ON k.label = p.label
       |  JOIN lut l ON l.query_id = p.query_id
       |    AND l.sub = k.sub AND l.cid = k.cid
       |  WHERE k.vec_id <> l.query_id$candWhere
       |  GROUP BY l.query_id, k.vec_id),
       |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY adc_dot DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, adc_dot, rank FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  private val sAnnIvfPqSql = ivfPqSqlWith(pqFitsSql)

  /** IVF-PQ with the SAMPLED codebook fit
    * ([[Similarity.ivfTopKPq]] at `fitSampleMod = 4`) — the
    * production parameterization of the composition, shipped after
    * the 1000× probe named the full-fit cost: three subspace-assign
    * passes over the persisted corpus-sized subspace frame (two
    * Lloyd iterations + encode) round-trip to disk at 2M vectors
    * (444.7s; shuffle sizing ruled out — 1024 partitions measured
    * the same). Training the quantizers on the deterministic
    * quarter-sample bounds the fit; the corpus pays exactly one
    * encode pass. Hash-verified via the modulus-mirrored fit
    * fragments (the `s_ann_pq_sampled` pattern, spliced into the
    * shared IVF body). */
  def sAnnIvfPqSampled(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    Similarity.ivfTopKPq(e,
        Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, nprobe = 3, m = 16, kSub = 32, iters = 2,
        fitSampleMod = 4L)
      .orderBy("query_id", "rank")
  }

  private val sAnnIvfPqSampledSql = ivfPqSqlWith(pqFitsSqlWith(Some(4)))

  /** The STORED ANN index served end to end
    * ([[Similarity.buildPqIndex]] / [[Similarity.pqIndexProbe]]) —
    * the IVF-PQ sibling of `d_phrase_index_scan`, completing the
    * persisted-layout family: codes (m bytes + a label per vector)
    * are materialized ONCE partitioned by the coarse label, the
    * codebooks and coarse centroids beside them, and the probe is a
    * planning-time partition-pruned read of the probed labels' codes
    * + the broadcast-LUT ADC sum — no raw corpus vectors, no fit, no
    * corpus-proportional probe state. Fit is the production sampled
    * parameterization (`fitSampleMod = 4`); parquet round-trips the
    * fit's doubles bit-exactly, so the layout can never change
    * results — the oracle IS the inline sampled composition's
    * (hash-equality against it is the correctness claim), and
    * SimilaritySpec pins probe ≡ [[Similarity.ivfTopKPq]] plus the
    * pruned numFiles. The temp layout is reclaimed after the probe
    * (the zorderScan treatment); in production the build amortizes
    * across every probe on the snapshot. */
  /** Stored-index MAINTENANCE ([[Similarity.appendToPqIndex]]) — the
    * FAISS `add` path on the [[Similarity.buildPqIndex]] layout,
    * completing the no-refit family (`s_ann_incremental` for the raw
    * IVF gate, this for the coded index): the index is built from the
    * MANIFEST only (vec_id % 10 ≠ 0, sampled fit), the batch
    * (vec_id % 10 = 0) is encoded with the STORED codebooks and
    * APPENDED into the label-partitioned codes — no refit, no
    * re-encode, no rewrite of existing code files — then a probe
    * serves old and new vectors through the identical partition-
    * pruned ADC machinery. The oracle mirrors the split exactly:
    * coarse centroids + codebook fits derive from the manifest CTE
    * while membership codes cover every row (`pqFitsSqlWith`'s
    * encodeSrc split), so fit-freeze semantics are hash-verified end
    * to end. AppendSpec pins the layout claims (manifest codes
    * bit-identical pre/post append; split-appends ≡ one-shot). */
  def sAnnIndexAppend(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pqidx_app").toString
    try {
      Similarity.buildPqIndex(e.filter(col("vec_id") % 10 =!= 0), dir,
        m = 16, kSub = 32, iters = 2, fitSampleMod = 4L)
      Similarity.appendToPqIndex(s, dir,
        e.filter(col("vec_id") % 10 === 0))
      Similarity.pqIndexProbe(s, dir, e,
          Similarity.sampleQueryIds(
            e.filter(col("embedding").isNotNull), n = 16),
          k = 5, nprobe = 3)
        .orderBy("query_id", "rank").localCheckpoint()
    } finally QueryUtil.deleteRecursively(dir)
  }

  private val sAnnIndexAppendSql =
    s"""WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |man AS (SELECT vec_id, label, emb FROM base
       |  WHERE vec_id % 10 <> 0),
       |dims AS (SELECT label, i,
       |    CAST(sum(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE)
       |      / count(*) AS cv
       |  FROM man CROSS JOIN range(1, 65) t(i)
       |  GROUP BY label, i),
       |cent AS (SELECT label, list(cv ORDER BY i) AS centroid
       |  FROM dims GROUP BY label),
       |${pqFitsSqlWith(Some(4), src = "man",
          encodeSrc = Some("base"))},
       |$qidsSql,
       |q AS (SELECT b.vec_id AS query_id, b.emb AS q_emb
       |  FROM base b JOIN qids s ON b.vec_id = s.vec_id),
       |probes AS (SELECT query_id, label,
       |    ${sqlCosine("q_emb", "centroid")} AS c_sim
       |  FROM q CROSS JOIN cent),
       |probed AS (SELECT query_id, label FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY c_sim DESC, label ASC) AS prn FROM probes)
       |  WHERE prn <= 3),
       |codes AS ($pqCodesUnionSql),
       |codesl AS (SELECT c.vec_id, b.label, c.sub, c.cid
       |  FROM codes c JOIN base b ON c.vec_id = b.vec_id),
       |lut AS ($pqLutUnionSql),
       |scored AS (SELECT l.query_id, k.vec_id AS neighbor_id,
       |    round(${sqlSumDec("pdot")}, 6) AS adc_dot
       |  FROM codesl k
       |  JOIN probed p ON k.label = p.label
       |  JOIN lut l ON l.query_id = p.query_id
       |    AND l.sub = k.sub AND l.cid = k.cid
       |  WHERE k.vec_id <> l.query_id
       |  GROUP BY l.query_id, k.vec_id),
       |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY adc_dot DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, adc_dot, rank FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  def sAnnIndexScan(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pqidx").toString
    try {
      Similarity.buildPqIndex(e, dir, m = 16, kSub = 32, iters = 2,
        fitSampleMod = 4L)
      Similarity.pqIndexProbe(s, dir, e,
          Similarity.sampleQueryIds(
            e.filter(col("embedding").isNotNull), n = 16),
          k = 5, nprobe = 3)
        .orderBy("query_id", "rank").localCheckpoint()
    } finally QueryUtil.deleteRecursively(dir)
  }

  /** Metadata-FILTERED IVF-PQ ([[Similarity.ivfTopKPq]] with
    * `candidateFilter`) — [[sAnnFiltered]]'s pre-filter semantics
    * composed with the CODED index: at 100 TB a filtered vector query
    * runs on the stored PQ codes, not raw-vector partitions, so the
    * predicate must restrict the ADC fine-rank scan (a pushed column
    * predicate on the partition-pruned index read), never the index
    * or the fits. Same stand-in predicate (`vec_id % 3 = 0`) and the
    * same nprobe 3 → 5 selectivity widening as the raw-vector
    * filtered entry; SimilaritySpec proves the all-probes form ≡ the
    * exhaustive filtered ADC ranking and that every result satisfies
    * the predicate. Hash-verified via the shared IVF-PQ oracle body
    * with the candidate WHERE in the scored fragment. */
  def sAnnFilteredPq(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    Similarity.ivfTopKPq(e,
        Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, nprobe = 5, m = 16, kSub = 32, iters = 2,
        candidateFilter = Some(pmod(col("vec_id"), lit(3)) === 0))
      .orderBy("query_id", "rank")
  }

  private val sAnnFilteredPqSql = ivfPqSqlWith(pqFitsSql, nprobe = "5",
    candWhere = " AND ((k.vec_id % 3) + 3) % 3 = 0")

  /** [[sAnnFilteredPq]] with nprobe DERIVED from the predicate's
    * measured selectivity — the `_auto` composition on the CODED
    * index ([[Similarity.autoNprobe]] feeding
    * [[Similarity.ivfTopKPq]]'s pre-filter): the same
    * `min(n_labels, ⌈3·N/N_match⌉)` rule as `s_ann_filtered_auto`,
    * oracle-mirrored as a scalar subquery feeding the shared IVF-PQ
    * body. Predicate `vec_id % 2 = 0` → nprobe 6 of 10 on the
    * fixture (non-degenerate both sides). */
  def sAnnFilteredPqAuto(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    val nn = e.filter(col("embedding").isNotNull)
    val pred = pmod(col("vec_id"), lit(2)) === 0
    Similarity.ivfTopKPq(e,
        Similarity.sampleQueryIds(nn, n = 16),
        k = 5, nprobe = Similarity.autoNprobe(nn, 3, pred),
        m = 16, kSub = 32, iters = 2,
        candidateFilter = Some(pred))
      .orderBy("query_id", "rank")
  }

  private val sAnnFilteredPqAutoSql = ivfPqSqlWith(pqFitsSql,
    nprobe = ("(SELECT least(count(DISTINCT label), " +
      "(3 * count(*) + sum(CASE WHEN ((vec_id % 2) + 2) % 2 = 0 " +
      "THEN 1 ELSE 0 END) - 1) " +
      "// sum(CASE WHEN ((vec_id % 2) + 2) % 2 = 0 " +
      "THEN 1 ELSE 0 END)) FROM base)"),
    candWhere = " AND ((k.vec_id % 2) + 2) % 2 = 0")

  /** RESIDUAL IVF-PQ ([[Similarity.ivfTopKPqResidual]]) — the FAISS
    * production form: codebooks fitted on `v − c(v)` residuals
    * against the coarse per-label centroids, ADC score
    * `⟨q,c(v)⟩ + Σ LUT` with the coarse term computed at probe time.
    * The oracle derives the residual frame with the same IEEE-exact
    * element-wise subtraction (`emb[i] − centroid[i]`) and reuses the
    * shared unrolled-fit fragments over it, so the coupled two-level
    * fit is hash-verified end to end; SimilaritySpec compares recall
    * against the non-residual composition at the identical code
    * budget. */
  def sAnnIvfPqRes(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    Similarity.ivfTopKPqResidual(e,
        Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, nprobe = 3, m = 16, kSub = 32, iters = 2)
      .orderBy("query_id", "rank")
  }

  /** Everything downstream of the (vec_id, label, emb) `base` CTE in
    * the residual IVF-PQ oracle — shared verbatim by the raw-layout
    * entry and the variance-balanced composition (whose only
    * difference is the permuted `base`), so the two residual fits can
    * never drift. */
  private def ivfPqResBodySql: String =
    ivfPqResBodySqlWith(pqFitsSqlWith(None, src = "rbase"))

  /** [[ivfPqResBodySql]] with the subspace-fit fragment injectable —
    * the sampled-fit OPQ×residual entry swaps in
    * `pqFitsSqlWith(Some(4), src = "rbase")` (fits on the sampled
    * residuals, codes for every row) and everything else stays the
    * one shared body. */
  private def ivfPqResBodySqlWith(fits: String) =
    s"""dims AS (SELECT label, i,
       |    CAST(sum(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE)
       |      / count(*) AS cv
       |  FROM base CROSS JOIN range(1, 65) t(i)
       |  GROUP BY label, i),
       |cent AS (SELECT label, list(cv ORDER BY i) AS centroid
       |  FROM dims GROUP BY label),
       |rbase AS (SELECT b.vec_id,
       |    list_transform(range(1, 65),
       |      i -> b.emb[i] - c.centroid[i]) AS emb
       |  FROM base b JOIN cent c ON b.label = c.label),
       |$fits,
       |$qidsSql,
       |q AS (SELECT b.vec_id AS query_id, b.emb AS q_emb
       |  FROM base b JOIN qids s ON b.vec_id = s.vec_id),
       |probes AS (SELECT query_id, label,
       |    ${sqlCosine("q_emb", "centroid")} AS c_sim,
       |    list_dot_product(q_emb, centroid) AS qc_dot
       |  FROM q CROSS JOIN cent),
       |probed AS (SELECT query_id, label, qc_dot FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY c_sim DESC, label ASC) AS prn FROM probes)
       |  WHERE prn <= 3),
       |codes AS ($pqCodesUnionSql),
       |codesl AS (SELECT c.vec_id, b.label, c.sub, c.cid
       |  FROM codes c JOIN base b ON c.vec_id = b.vec_id),
       |lut AS ($pqLutUnionSql),
       |scored AS (SELECT l.query_id, k.vec_id AS neighbor_id,
       |    round(p.qc_dot + ${sqlSumDec("pdot")}, 6) AS adc_dot
       |  FROM codesl k
       |  JOIN probed p ON k.label = p.label
       |  JOIN lut l ON l.query_id = p.query_id
       |    AND l.sub = k.sub AND l.cid = k.cid
       |  WHERE k.vec_id <> l.query_id
       |  GROUP BY l.query_id, k.vec_id, p.qc_dot),
       |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY adc_dot DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, adc_dot, rank FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  private val sAnnIvfPqResSql =
    s"""WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |$ivfPqResBodySql""".stripMargin

  /** Residual IVF-PQ × variance-balanced allocation
    * ([[Similarity.ivfTopKPqResidualBalanced]]): the two orthogonal
    * quantization-error levers composed — the balanced permutation
    * decides WHICH dimensions share a codebook, residual encoding
    * decides WHAT the codebook must represent. The oracle derives
    * the identical permutation in SQL (the `s_ann_pq_balanced`
    * fragments, label carried through) and feeds the permuted base
    * into the SHARED residual body ([[ivfPqResBodySql]]), so
    * permutation + coarse fit + residuals + all 16 subspace fits +
    * ADC verify end to end; SimilaritySpec pins recall ≥ each parent
    * on the fixture where each lever matters. */
  def sAnnIvfPqResBal(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    Similarity.ivfTopKPqResidualBalanced(e,
        Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, nprobe = 3, m = 16, kSub = 32, iters = 2)
      .orderBy("query_id", "rank")
  }

  private val sAnnIvfPqResBalSql =
    s"""WITH rawb AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |vstat AS (SELECT i,
       |    CAST(sum(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE) AS s1,
       |    CAST(sum(CAST(emb[i] * emb[i] AS DECIMAL(18,6))) AS DOUBLE)
       |      AS s2,
       |    count(*) AS n
       |  FROM rawb CROSS JOIN range(1, 65) t(i) GROUP BY i),
       |vr AS (SELECT i, round((s2 - s1 * s1 / n) / n, 6) AS variance
       |  FROM vstat),
       |-- rank r (0-based) deals dim to subspace r % 16, slot r // 16
       |rk AS (SELECT i AS olddim, CAST(row_number() OVER (
       |      ORDER BY variance DESC, i) - 1 AS INT) AS r FROM vr),
       |dm AS (SELECT (r % 16) * 4 + (r // 16) AS newpos, olddim
       |  FROM rk),
       |pm AS (SELECT list(olddim ORDER BY newpos) AS pm FROM dm),
       |base AS (SELECT vec_id, label,
       |    list_transform(range(1, 65), p -> emb[pm[p]]) AS emb
       |  FROM rawb CROSS JOIN pm),
       |$ivfPqResBodySql""".stripMargin

  /** OPQ × RESIDUAL IVF-PQ ([[graft.ext.Pca.opqRotation]] before
    * [[Similarity.ivfTopKPqResidual]]) — the actual FAISS production
    * string (`OPQ16,IVF…,PQ16`): the trained rotation is applied
    * FIRST as a plan-literal 64×64 projection (so the coarse
    * quantizer, the residuals, and all 16 codebook fits run in the
    * rotated frame — rotation-before-residual-fit, Ge et al. 2013
    * composed with Jégou et al. 2011), then the unmodified coupled
    * two-level residual machinery runs on the rotated corpus. The
    * true inner product is rotation-invariant up to summation order,
    * so ground truth is unchanged — only the quantization error
    * moves; SimilaritySpec pins recall ≥ the unrotated residual form
    * AND ≥ the exhaustive rotated form on the fixtures where each
    * lever binds. Verification chain = [[sAnnPqOpq]]'s (covariance
    * hash-verified by `d_embed_cov`, rotation a pure local function
    * of it, oracle embeds the derived literals at dump time) feeding
    * the SHARED residual body ([[ivfPqResBodySql]]), so rotation +
    * coarse fit + residuals + 16 fits + ADC verify end to end. */
  def sAnnIvfPqOpqRes(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    val (_, c) = graft.ext.Pca.covMeans(e, 64)
    val rot = graft.ext.Pca.opqRotation(c, 64, m = PqM)
    opqResRotationUsed.put(d, rot)
    // lazy rotated frame — one mat_vec_lit node; the residual stack's
    // own base persist is the single materialization (see sAnnPqOpq)
    val rotated = graft.ext.Pca.applyRotation(e, rot,
      keep = Seq("vec_id", "label"))
    Similarity.ivfTopKPqResidual(rotated,
        Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, nprobe = 3, m = PqM, kSub = PqKSub, iters = 2)
      .orderBy("query_id", "rank")
  }

  private def sAnnIvfPqOpqResSqlNow: String =
    rotationSqlNow("s_ann_ivf_pq_opq_res", opqResRotationUsed,
      keep = " label,",
      rotated => s"""WITH $rotated,
         |$ivfPqResBodySql""".stripMargin)

  /** [[sAnnIvfPqOpqRes]] at the PRODUCTION fit bound
    * (`fitSampleMod = 4`) — the catalog's most expensive entry
    * (10 s full-fit) recomposed the way `s_ann_ivf_pq_sampled`
    * recomposed the plain stack: the trained rotation still applies
    * first and the coarse means stay full-corpus, but seeds + both
    * Lloyd rounds of every residual codebook run on the
    * `vec_id % 4 = 0` slice while the full corpus pays exactly one
    * encode. Oracle = the rotation-literal CTE feeding the SHARED
    * residual body with the split-fit fragments
    * ([[ivfPqResBodySqlWith]] × `pqFitsSqlWith(Some(4))`), so
    * rotation + coarse fit + sampled residual fits + full-corpus
    * codes + ADC hash-verify end to end; SimilaritySpec pins recall
    * within the full-fit band on the blob fixture. */
  def sAnnIvfPqOpqResSampled(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    val (_, c) = graft.ext.Pca.covMeans(e, 64)
    val rot = graft.ext.Pca.opqRotation(c, 64, m = PqM)
    opqResSampledRotationUsed.put(d, rot)
    // lazy — see sAnnPqOpq's r15 note
    val rotated = graft.ext.Pca.applyRotation(e, rot,
      keep = Seq("vec_id", "label"))
    Similarity.ivfTopKPqResidual(rotated,
        Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, nprobe = 3, m = PqM, kSub = PqKSub, iters = 2,
        fitSampleMod = 4L)
      .orderBy("query_id", "rank")
  }

  private val opqResSampledRotationUsed =
    new java.util.concurrent.ConcurrentHashMap[String,
      Array[Array[Double]]]()

  private def sAnnIvfPqOpqResSampledSqlNow: String =
    rotationSqlNow("s_ann_ivf_pq_opq_res_sampled",
      opqResSampledRotationUsed, keep = " label,",
      rotated => s"""WITH $rotated,
         |${ivfPqResBodySqlWith(pqFitsSqlWith(Some(4), src = "rbase"))}"""
        .stripMargin)

  /** ANN quality evaluation: recall@k of the LSH path against the
    * brute-force ground truth — the number that decides whether an
    * approximate index may replace the exact scan. Per query: how
    * many of the true top-k neighbors the LSH probe recovered.
    *
    * Scale shape: the query set is a FIXED-size deterministic sample
    * ([[Similarity.sampleQueryIds]], |Q| = 16 here) — NOT a
    * proportional predicate — so total work is O(|Q|·|C|): linear in
    * the corpus no matter how big it grows (a `vec_id % 40` predicate
    * would make the brute-force truth leg quadratic). The comparison
    * itself joins two k-rows-per-query frames on (query_id,
    * neighbor_id) and aggregates — negligible. NULL embeddings are
    * dropped up front so BOTH legs see the identical corpus (lshTopK
    * drops NULLs internally; the truth leg must match or a NULL
    * vector could pad truth rows that approx can never hit). */
  def sAnnRecall(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d).filter(col("embedding").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qids = Similarity.sampleQueryIds(e, n = 16)
    val truth = Similarity.bruteForceTopK(e, qids, k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val approx = Similarity.lshTopK(e, qids, k = 5,
        numPlanes = 4, seed = 42L, dim = 64)
      .select(col("query_id").as("aq"), col("neighbor_id").as("an"))
    val out = truth.join(approx,
        truth("query_id") === approx("aq") &&
          truth("neighbor_id") === approx("an"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_truth"), count(col("an")).as("n_hits"))
      .withColumn("recall",
        round(col("n_hits").cast("double") / col("n_truth"), 6))
      .orderBy("query_id")
      .localCheckpoint()
    e.unpersist()
    out
  }

  private val sAnnRecallSql = {
    // same plan-literal hyperplanes as sAnnLshSql — both inline
    // Similarity.hyperplanes(4, 64, 42L), so they cannot drift
    val planes = Similarity.hyperplanes(numPlanes = 4, dim = 64,
      seed = 42L)
    val bucket = planes.zipWithIndex.map { case (pl, i) =>
      val arr = "[" + pl.mkString(", ") + "]"
      s"CASE WHEN list_dot_product(emb, $arr) > 0 " +
      s"THEN ${1 << i} ELSE 0 END"
    }.mkString("\n    + ")
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |$qidsSql,
       |q AS (SELECT b.vec_id AS query_id, b.emb AS q_emb
       |  FROM base b JOIN qids s ON b.vec_id = s.vec_id),
       |bscored AS (SELECT query_id, vec_id AS neighbor_id,
       |    ${sqlCosine("q_emb", "emb")} AS cos_sim
       |  FROM base CROSS JOIN q WHERE vec_id <> query_id),
       |truth AS (SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
       |    FROM bscored) WHERE rank <= 5),
       |bk AS (SELECT vec_id, emb,
       |    $bucket AS bucket
       |  FROM base),
       |qb AS (SELECT k.vec_id AS query_id, k.emb AS q_emb,
       |    k.bucket AS q_bucket
       |  FROM bk k JOIN qids s ON k.vec_id = s.vec_id),
       |ascored AS (SELECT query_id, vec_id AS neighbor_id,
       |    ${sqlCosine("q_emb", "emb")} AS cos_sim
       |  FROM bk JOIN qb ON bucket = q_bucket AND vec_id <> query_id),
       |approx AS (SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
       |    FROM ascored) WHERE rank <= 5)
       |SELECT t.query_id, count(*) AS n_truth,
       |  count(a.neighbor_id) AS n_hits,
       |  round(count(a.neighbor_id)::DOUBLE / count(*), 6) AS recall
       |FROM truth t LEFT JOIN approx a
       |  ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
       |GROUP BY t.query_id ORDER BY t.query_id""".stripMargin
  }

  /** Hard-negative mining (contrastive-training data prep): per
    * anchor, the top-k nearest vectors of a different label. This is
    * the exact-scan BASELINE with the fixed deterministic anchor
    * sample (|Q| = 16, [[Similarity.sampleQueryIds]] — same r6
    * treatment as `s_ann_int8`): O(|Q|·|C|) work, a bounded broadcast
    * anchor frame, linear in the corpus. The production scale path is
    * [[sHardNegativesIvf]]. */
  def sHardNegatives(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    Similarity.hardNegatives(e,
        Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16), k = 5)
      .orderBy("query_id", "rank")
  }

  private val sHardNegativesSql =
    s"""WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |$qidsSql,
       |q AS (SELECT b.vec_id AS query_id, b.label AS q_label,
       |    b.emb AS q_emb
       |  FROM base b JOIN qids s ON b.vec_id = s.vec_id),
       |scored AS (SELECT query_id, vec_id AS neighbor_id,
       |    label AS neg_label,
       |    ${sqlCosine("q_emb", "emb")} AS cos_sim
       |  FROM base CROSS JOIN q
       |  WHERE vec_id <> query_id AND label <> q_label),
       |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, neg_label, cos_sim, rank
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Hard-negative mining on the IVF × int8 production path
    * ([[Similarity.hardNegativesIvfInt8]]): label exclusion composed
    * with the pruned candidate stream of [[sAnnIvfInt8]] instead of a
    * per-anchor full corpus scan — the anchor's own label partition
    * is dropped at probe selection, the `label <> q_label`
    * post-filter guards the candidate stream, and every pair score
    * runs on int8 codes. Fixed |Q| = 16; total work corpus-linear;
    * hash-verified (both quantization levels reproduced in the
    * oracle). */
  def sHardNegativesIvf(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    Similarity.hardNegativesIvfInt8(e,
        Similarity.sampleQueryIds(
          e.filter(col("embedding").isNotNull), n = 16),
        k = 5, nprobe = 3)
      .orderBy("query_id", "rank")
  }

  private val sHardNegativesIvfSql =
    s"""WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |dims AS (SELECT label, i,
       |    CAST(sum(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE)
       |      / count(*) AS cv
       |  FROM base CROSS JOIN range(1, 65) t(i)
       |  GROUP BY label, i),
       |cent AS (SELECT label, list(cv ORDER BY i) AS centroid
       |  FROM dims GROUP BY label),
       |cq0 AS (SELECT label, centroid,
       |    list_aggregate(list_transform(centroid, x -> abs(x)), 'max')
       |      AS cs
       |  FROM cent),
       |cq AS (SELECT * FROM (SELECT label,
       |    sqrt(list_dot_product(c_qv, c_qv)) AS c_qn, c_qv
       |  FROM (SELECT label,
       |      list_transform(centroid, e -> CASE WHEN cs = 0 THEN 0.0
       |        WHEN e >= 0 THEN floor(e * 127.0 / cs + 0.5)
       |        ELSE -floor(-(e * 127.0 / cs) + 0.5) END) AS c_qv
       |    FROM cq0)) WHERE c_qn > 0),
       |${quantizeSql(" label,")},
       |$qidsSql,
       |q AS (SELECT n.vec_id AS query_id, n.label AS q_label,
       |    n.qv AS q_qv, n.qn AS q_qn
       |  FROM qn n JOIN qids s ON n.vec_id = s.vec_id),
       |probes AS (SELECT query_id, q_label, q_qv, q_qn, cq.label,
       |    round(list_dot_product(q_qv, c_qv) / (q_qn * c_qn), 6)
       |      AS c_sim
       |  FROM q CROSS JOIN cq WHERE cq.label <> q.q_label),
       |probed AS (SELECT query_id, q_label, q_qv, q_qn, label FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY c_sim DESC, label ASC) AS prn FROM probes)
       |  WHERE prn <= 3),
       |scored AS (SELECT p.query_id, n.vec_id AS neighbor_id,
       |    n.label AS neg_label,
       |    round(list_dot_product(p.q_qv, n.qv) / (p.q_qn * n.qn), 6)
       |      AS cos_sim
       |  FROM qn n JOIN probed p ON n.label = p.label
       |  WHERE n.vec_id <> p.query_id AND n.label <> p.q_label),
       |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, neg_label, cos_sim, rank
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Semantic deduplication (SemDeDup, Abbas et al. 2023): k-means
    * clustering (same deterministic fit as [[sAnnIvfKmeans]], shared
    * oracle fragment) + exact within-cluster cosine pruning with a
    * greedy keep-smallest-id rule. One row per vector: cluster id and
    * whether the vector survives at threshold 0.45. The quadratic
    * step is confined to clusters (Σ|cluster|²), so at corpus scale
    * `kClusters` grows with N — see [[Similarity.semDedup]]. */
  def dSemdedup(s: SparkSession, d: String): DataFrame =
    Similarity.semDedup(embs(s, d), kClusters = 8, iters = 2,
      threshold = 0.45)
      .orderBy("vec_id")

  private val dSemdedupSql =
    s"""WITH ${kmUnrolledSql(8)},
       |p AS (SELECT b.vec_id AS vid
       |  FROM members a JOIN members b
       |  ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE ${sqlCosine("a.emb", "b.emb")} >= 0.45),
       |d AS (SELECT DISTINCT vid FROM p)
       |SELECT m.vec_id, m.cid, (d.vid IS NULL) AS kept
       |FROM members m LEFT JOIN d ON m.vec_id = d.vid
       |ORDER BY vec_id""".stripMargin

  /** [[dSemdedup]] in its SCALE-SAFE parameterization: the cluster
    * count is derived from the corpus (k = ⌈n/64⌉, min 2) instead of
    * fixed, which keeps mean cluster size — and therefore the
    * within-cluster quadratic pair work Σ|c|² ≈ n·64 — LINEAR in the
    * corpus. The 10× probe measured fixed-k at ~56× cost for 10× data
    * vs ~linear for scaled-k (BASELINE.md); this entry ships that
    * production recipe as a first-class catalog shape.
    *
    * Hash-verified since r9: the oracle derives the same
    * k = max(2, ⌈n/64⌉) via an integer scalar subquery over count(*)
    * (n counts the RAW frame, pre-null-filter — exactly what
    * `semDedupAuto`'s `embeddings.count()` counts) and feeds it to
    * the shared unrolled k-means fragment ([[kmUnrolledCoreSql]]),
    * the same machinery that hash-verifies the k ∝ N ANN ingest
    * gate. */
  def dSemdedupAuto(s: SparkSession, d: String): DataFrame =
    Similarity.semDedupAuto(embs(s, d), targetClusterSize = 64L,
      iters = 2, threshold = 0.45)
      .orderBy("vec_id")

  private val dSemdedupAutoSql =
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |${kmUnrolledCoreSql("base",
          "SELECT GREATEST(2, (count(*) + 63) // 64) FROM embeddings")},
       |p AS (SELECT b.vec_id AS vid
       |  FROM members a JOIN members b
       |  ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE ${sqlCosine("a.emb", "b.emb")} >= 0.45),
       |d AS (SELECT DISTINCT vid FROM p)
       |SELECT m.vec_id, m.cid, (d.vid IS NULL) AS kept
       |FROM members m LEFT JOIN d ON m.vec_id = d.vid
       |ORDER BY vec_id""".stripMargin

  /** [[dSemdedupAuto]] with the k-means trained on the deterministic
    * `vec_id % 4 = 0` sample while the FULL corpus is still assigned
    * and pair-pruned — the `fitSampleMod` production bound ported
    * from the ANN family ([[sAnnIvfPqSampled]]'s recipe; FAISS trains
    * quantizers on a sample). With k ∝ N the FULL fit pays O(N²/64)
    * per Lloyd pass — the measured assignment wall — and the sampled
    * fit divides every fit pass by the modulus while dedup SEMANTICS
    * are unchanged (clusters are only blocking structure; every
    * vector still competes within its cell). Hash-verified: the
    * oracle runs the same split — seeds + both Lloyd passes over the
    * sample CTE, final membership over the full base
    * ([[kmUnrolledCoreSplitSql]]). */
  def dSemdedupSampled(s: SparkSession, d: String): DataFrame =
    Similarity.semDedupAuto(embs(s, d), targetClusterSize = 64L,
      iters = 2, threshold = 0.45, fitSampleMod = 4L)
      .orderBy("vec_id")

  private val dSemdedupSampledSql =
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |fitb AS (SELECT vec_id, emb FROM base WHERE vec_id % 4 = 0),
       |${kmUnrolledCoreSplitSql("fitb", "base",
          "SELECT GREATEST(2, (count(*) + 63) // 64) FROM embeddings")},
       |p AS (SELECT b.vec_id AS vid
       |  FROM members a JOIN members b
       |  ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE ${sqlCosine("a.emb", "b.emb")} >= 0.45),
       |d AS (SELECT DISTINCT vid FROM p)
       |SELECT m.vec_id, m.cid, (d.vid IS NULL) AS kept
       |FROM members m LEFT JOIN d ON m.vec_id = d.vid
       |ORDER BY vec_id""".stripMargin

  /** HIERARCHICAL SemDeDup ([[Similarity.semDedupHier]]) — the
    * structural retirement of the flat k ∝ N assignment wall, the
    * [[sAnnIvfTwoLevel]] argument applied to dedup blocking: level 1
    * is a √-sized k-means (k₁ = ⌈√⌈N/64⌉⌉ clusters), level 2 an
    * independent per-cluster k-means of k₂ = k₁ sub-clusters, so the
    * k₁·k₂ ≥ N/64 cells keep mean cell size ≤ ~64 (pair work stays
    * linear) while every assignment pass costs N·(k₁+k₂) =
    * O(N^1.5/8) candidate evaluations instead of the flat grid's
    * O(N²/64) — at 2M vectors, ~7×10⁸ vs 6×10¹⁰. Same dedup
    * semantics: exact within-cell cosine, greedy keep-smallest-id.
    * The oracle derives k via one scalar subquery (integer-exact:
    * /64 is a binary shift, IEEE sqrt/ceil are correctly rounded —
    * engine-portable), unrolls the level-1 fit with the shared
    * fragment and the level-2 fit with `cid` added to every GROUP BY
    * / PARTITION BY — the [[sAnnIvfTwoLevelSql]] pattern with a
    * derived grid. */
  def dSemdedupHier(s: SparkSession, d: String): DataFrame =
    Similarity.semDedupHier(embs(s, d), targetCellSize = 64L,
      iters = 2, threshold = 0.45)
      .orderBy("vec_id")

  /** [[dSemdedupHier]] at the PRODUCTION fit bound (`fitSampleMod =
    * 4`) — both k-means levels trained on deterministic samples
    * (level 1 on the `vec_id % 4 = 0` corpus slice, level 2 per cell
    * on its sampled members plus the cell's min-id fallback row that
    * keeps sample-free cells seeded), full-corpus assignments and the
    * pair prune unchanged. The grid k still derives from the FULL
    * count (the cell layout is a corpus property). Hash-verified via
    * [[dSemdedupHierSqlWith]]'s split fit CTEs. */
  def dSemdedupHierSampled(s: SparkSession, d: String): DataFrame =
    Similarity.semDedupHier(embs(s, d), targetCellSize = 64L,
      iters = 2, threshold = 0.45, fitSampleMod = 4L)
      .orderBy("vec_id")

  private val dSemdedupHierSql = dSemdedupHierSqlWith(None)
  private val dSemdedupHierSampledSql = dSemdedupHierSqlWith(Some(4))

  /** Level-2 (per-cell) assignment CTE of the hier SemDeDup oracles —
    * rank sub-centroids within the row's own `cid` by rounded cosine,
    * smallest scid on ties (the [[Similarity]] assignSubClusters
    * rule). Shared by `d_semdedup_hier(_sampled)` and the two-level
    * ingest-gate oracle so the fragments can never drift. */
  private def hierAssign2Sql(src: String, cent: String,
      out: String): String =
    s"""$out AS (SELECT vec_id, cid, emb, scid FROM (
       |  SELECT b.vec_id, b.cid, b.emb, c.scid,
       |    row_number() OVER (PARTITION BY b.vec_id
       |      ORDER BY ${sqlCosine("b.emb", "c.centroid")} DESC, c.scid)
       |      AS srn
       |  FROM $src b JOIN $cent c ON b.cid = c.cid) WHERE srn = 1)"""
      .stripMargin

  /** Level-2 Lloyd update CTE (per-(cid, scid) decimal-sum means). */
  private def hierUpdate2Sql(assigned: String, out: String): String =
    s"""${out}d AS (SELECT cid, scid, i,
       |    CAST(sum(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE)
       |      / count(*) AS cv
       |  FROM $assigned CROSS JOIN range(1, 65) t(i)
       |  GROUP BY cid, scid, i),
       |$out AS (SELECT cid, scid, list(cv ORDER BY i) AS centroid
       |  FROM ${out}d GROUP BY cid, scid)""".stripMargin

  private def dSemdedupHierSqlWith(mod: Option[Int]): String = {
    def assign2(src: String, cent: String, out: String): String =
      hierAssign2Sql(src, cent, out)
    def update2(assigned: String, out: String): String =
      hierUpdate2Sql(assigned, out)
    // fit CTEs: full form fits both levels on the whole corpus; the
    // sampled form fits level 1 on the mod-slice (fitb) and level 2
    // per cell on sampled members + the cell's min-id fallback (fmem)
    val fit1 = mod.map(n =>
      s"""fitb AS (SELECT vec_id, emb FROM base WHERE vec_id % $n = 0),
         |${kmUnrolledCoreSplitSql("fitb", "base", "SELECT k FROM kk")}"""
        .stripMargin)
      .getOrElse(kmUnrolledCoreSql("base", "SELECT k FROM kk"))
    val fit2Src = mod.map { n =>
      s"""mn AS (SELECT cid, min(vec_id) AS mn FROM members
         |  GROUP BY cid),
         |fmem AS (SELECT m.vec_id, m.cid, m.emb FROM members m
         |  JOIN mn ON m.cid = mn.cid
         |  WHERE m.vec_id % $n = 0 OR m.vec_id = mn.mn),
         |""".stripMargin
    }.getOrElse("")
    val f2 = if (mod.isDefined) "fmem" else "members"
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |kk AS (SELECT GREATEST(2,
       |    CAST(ceil(sqrt(ceil(count(*) / 64.0))) AS INT)) AS k
       |  FROM base),
       |$fit1,
       |${fit2Src}init2 AS (SELECT cid, CAST(rn - 1 AS INT) AS scid,
       |    emb AS centroid
       |  FROM (SELECT cid, emb, row_number() OVER (
       |      PARTITION BY cid ORDER BY vec_id) AS rn FROM $f2)
       |  WHERE rn <= (SELECT k FROM kk)),
       |${assign2(f2, "init2", "sb1")},
       |${update2("sb1", "sd1")},
       |${assign2(f2, "sd1", "sb2")},
       |${update2("sb2", "sd2")},
       |${assign2("members", "sd2", "cells")},
       |p AS (SELECT b.vec_id AS vid
       |  FROM cells a JOIN cells b
       |  ON a.cid = b.cid AND a.scid = b.scid AND a.vec_id < b.vec_id
       |  WHERE ${sqlCosine("a.emb", "b.emb")} >= 0.45),
       |dr AS (SELECT DISTINCT vid FROM p)
       |SELECT m.vec_id, m.cid, m.scid, (dr.vid IS NULL) AS kept
       |FROM cells m LEFT JOIN dr ON m.vec_id = dr.vid
       |ORDER BY vec_id""".stripMargin
  }

  /** INCREMENTAL SemDeDup ([[Similarity.semDedupIncremental]]) — the
    * ingest gate of the semantic-dedup family, completing the
    * manifest-gate trio (MinHash `d_incremental_minhash`, ANN
    * `s_ann_incremental`): the cluster structure is fitted on the
    * MANIFEST only with the HIERARCHICAL two-level grid (k₁ = k₂ =
    * ⌈√⌈N_man/64⌉⌉ — r14; the r13 flat k ∝ N_man fit was the
    * family's measured refit wall), each incoming vector (`vec_id %
    * 10 = 0`, the family's batch split) is assigned to its manifest
    * (cell, sub-cell) and dropped iff ≥0.45-similar to any manifest
    * vector there or to a smaller-id batch vector (one-pass greedy,
    * so an internally duplicated batch keeps exactly its smallest
    * id). Per-batch work is bounded by the batch — |B|·2k₁
    * assignment + within-sub-cell pairs against ~64 manifest vectors
    * per sub-cell, never corpus × corpus. Hash-verified: the oracle
    * fits level 1 on the manifest CTE ([[kmUnrolledCoreSplitSql]]),
    * unrolls the per-cell level-2 fit over manifest members
    * ([[hierAssign2Sql]]/[[hierUpdate2Sql]] — the d_semdedup_hier
    * fragments), assigns the batch over OCCUPIED cells only (the
    * engine's restricted assignment), then applies the same
    * asymmetric pair rule on (cid, scid) with modulus predicates. */
  def dSemdedupIncremental(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    Similarity.semDedupIncremental(
        e.filter(col("vec_id") % 10 =!= 0),
        e.filter(col("vec_id") % 10 === 0),
        targetClusterSize = 64L, iters = 2, threshold = 0.45)
      .orderBy("vec_id")
  }

  /** Oracle for the semantic ingest gate at a `vec_id % splitMod`
    * manifest/batch split — shared by `d_semdedup_incremental`
    * (mod 10) and the streaming `st_semdedup_gate` (mod 5, the
    * st_ann_gate split), so the batch core and the streaming entry
    * can never drift. */
  def semdedupGateOracleSql(splitMod: Int): String =
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS emb
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |man AS (SELECT vec_id, emb FROM base
       |  WHERE vec_id % $splitMod <> 0),
       |bat AS (SELECT vec_id, emb FROM base
       |  WHERE vec_id % $splitMod = 0),
       |kk AS (SELECT GREATEST(2,
       |    CAST(ceil(sqrt(ceil(count(*) / 64.0))) AS INT)) AS k
       |  FROM man),
       |${kmUnrolledCoreSplitSql("man", "man", "SELECT k FROM kk")},
       |occ AS (SELECT DISTINCT cid FROM members),
       |c2o AS (SELECT c.cid, c.centroid FROM c2 c
       |  JOIN occ o ON c.cid = o.cid),
       |bm AS (SELECT vec_id, emb, cid FROM (
       |  SELECT b.vec_id, b.emb, c.cid,
       |    row_number() OVER (PARTITION BY b.vec_id
       |      ORDER BY ${sqlCosine("b.emb", "c.centroid")} DESC, c.cid)
       |      AS rn
       |  FROM bat b CROSS JOIN c2o c) WHERE rn = 1),
       |init2 AS (SELECT cid, CAST(rn - 1 AS INT) AS scid,
       |    emb AS centroid
       |  FROM (SELECT cid, emb, row_number() OVER (
       |      PARTITION BY cid ORDER BY vec_id) AS rn FROM members)
       |  WHERE rn <= (SELECT k FROM kk)),
       |${hierAssign2Sql("members", "init2", "sb1")},
       |${hierUpdate2Sql("sb1", "sd1")},
       |${hierAssign2Sql("members", "sd1", "sb2")},
       |${hierUpdate2Sql("sb2", "sd2")},
       |allm AS (SELECT vec_id, cid, emb FROM members
       |  UNION ALL SELECT vec_id, cid, emb FROM bm),
       |${hierAssign2Sql("allm", "sd2", "cells")},
       |p AS (SELECT b.vec_id AS vid
       |  FROM cells a JOIN cells b
       |  ON a.cid = b.cid AND a.scid = b.scid
       |  WHERE b.vec_id % $splitMod = 0
       |    AND (a.vec_id % $splitMod <> 0 OR a.vec_id < b.vec_id)
       |    AND ${sqlCosine("a.emb", "b.emb")} >= 0.45),
       |dr AS (SELECT DISTINCT vid FROM p)
       |SELECT m.vec_id, m.cid, m.scid, (dr.vid IS NULL) AS kept
       |FROM cells m LEFT JOIN dr ON m.vec_id = dr.vid
       |WHERE m.vec_id % $splitMod = 0
       |ORDER BY vec_id""".stripMargin

  private val dSemdedupIncrementalSql = semdedupGateOracleSql(10)

  /** Embedding-cosine near-dup pairs (the vector-space dedup variant):
    * multi-table hyperplane LSH blocking + exact cosine verification.
    * Oracle-verified — plane literals are inlined into the SQL. */
  def dEmbedDups(s: SparkSession, d: String): DataFrame =
    Similarity.cosineDupPairs(embs(s, d), threshold = 0.45,
      tables = 8, planesPerTable = 2, seed = 7L)
      .orderBy("vec_a", "vec_b")

  /** [[dEmbedDups]] in its SCALE-SAFE parameterization: hyperplanes
    * per table derived from the corpus (2^p ≈ n/64), keeping bucket
    * population — and the per-bucket self-join — bounded as n grows.
    * The fixed-plane catalog shape above is quadratic past ~10×
    * (4 buckets per table regardless of n; the 100× deep probe
    * measured it unrunnable at 200k vectors), so THIS is the shape a
    * production corpus runs.
    *
    * Hash-verified since r9: `hyperplanes` draws planes SEQUENTIALLY
    * from one seeded PRNG, so plane i is the same for every p ≥ i+1
    * (prefix-stable) — the oracle inlines the first 12 plane literals
    * per table and masks bit i with `i < p`, deriving
    * p = clamp(1, 24, bitlength(max(2, ⌈n/64⌉) − 1)) from a scalar
    * subquery over the non-null count, exactly
    * [[Similarity.cosineDupPairsAuto]]'s integer arithmetic. p > 12
    * (a > 262k-vector corpus at target 64) raises a SQL error rather
    * than silently diverging; SimilaritySpec additionally pins
    * auto ≡ explicit-p. */
  def dEmbedDupsAuto(s: SparkSession, d: String): DataFrame =
    Similarity.cosineDupPairsAuto(embs(s, d), threshold = 0.45,
      tables = 8, targetBucketSize = 64L, seed = 7L)
      .orderBy("vec_a", "vec_b")

  private val dEmbedDupsAutoSql = {
    val tables = 8
    val pMax = 12 // covers corpora to 64·2^12 ≈ 262k vectors; guarded
    val buckets = (0 until tables).map { t =>
      val planes = Similarity.hyperplanes(pMax, 64, 7L + t)
      val bucket = planes.zipWithIndex.map { case (pl, i) =>
        val arr = "[" + pl.mkString(", ") + "]"
        s"CASE WHEN $i < (SELECT p FROM params) AND " +
        s"list_dot_product(emb, $arr) > 0 THEN ${1 << i} ELSE 0 END"
      }.mkString(" + ")
      s"SELECT vec_id, $t AS tbl, $bucket AS bucket FROM base"
    }.mkString("\n  UNION ALL ")
    s"""WITH praw AS (SELECT LEAST(24, GREATEST(1,
       |    length(bin(GREATEST(2, (count(*) + 63) // 64) - 1)))) AS p
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |params AS (SELECT CASE WHEN p > $pMax THEN CAST(error(
       |    'd_embed_dups_auto oracle: derived p exceeds inlined $pMax '
       |    || 'planes') AS INT) ELSE p END AS p FROM praw),
       |base AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
       |    sqrt(list_dot_product(embedding::DOUBLE[],
       |      embedding::DOUBLE[])) AS norm
       |  FROM embeddings),
       |keyed AS ($buckets),
       |cand AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM keyed a JOIN keyed b
       |  ON a.tbl = b.tbl AND a.bucket = b.bucket
       |    AND a.vec_id < b.vec_id),
       |v AS (SELECT vec_a, vec_b,
       |    round(list_dot_product(ea.emb, eb.emb) /
       |      (ea.norm * eb.norm), 6) AS cos_sim
       |  FROM cand JOIN base ea ON ea.vec_id = cand.vec_a
       |    JOIN base eb ON eb.vec_id = cand.vec_b)
       |SELECT DISTINCT vec_a, vec_b, cos_sim FROM v
       |WHERE cos_sim >= 0.45 ORDER BY vec_a, vec_b""".stripMargin
  }

  private val dEmbedDupsSql = {
    val tables = 8
    val planesPerTable = 2
    val buckets = (0 until tables).map { t =>
      val planes = Similarity.hyperplanes(planesPerTable, 64, 7L + t)
      val bucket = planes.zipWithIndex.map { case (pl, i) =>
        val arr = "[" + pl.mkString(", ") + "]"
        s"CASE WHEN list_dot_product(emb, $arr) > 0 " +
        s"THEN ${1 << i} ELSE 0 END"
      }.mkString(" + ")
      s"SELECT vec_id, $t AS tbl, $bucket AS bucket FROM base"
    }.mkString("\n  UNION ALL ")
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
       |    sqrt(list_dot_product(embedding::DOUBLE[],
       |      embedding::DOUBLE[])) AS norm
       |  FROM embeddings),
       |keyed AS ($buckets),
       |cand AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM keyed a JOIN keyed b
       |  ON a.tbl = b.tbl AND a.bucket = b.bucket
       |    AND a.vec_id < b.vec_id),
       |v AS (SELECT vec_a, vec_b,
       |    round(list_dot_product(ea.emb, eb.emb) /
       |      (ea.norm * eb.norm), 6) AS cos_sim
       |  FROM cand JOIN base ea ON ea.vec_id = cand.vec_a
       |    JOIN base eb ON eb.vec_id = cand.vec_b)
       |SELECT DISTINCT vec_a, vec_b, cos_sim FROM v
       |WHERE cos_sim >= 0.45 ORDER BY vec_a, vec_b""".stripMargin
  }

  /** Semantic benchmark decontamination
    * ([[Similarity.embedDecontaminate]]): the embedding-space
    * complement of the lexical `d_decontaminate` gate — eval items
    * whose wording changed but whose meaning (embedding) still
    * matches a training document. Eval split = `vec_id % 20 = 0`
    * (≈5%), same hyperplane-bucket family and 0.45 threshold as
    * `d_embed_dups`; one verdict row per eval vector, hash-verified
    * with inlined plane literals. */
  def dEmbedDecontaminate(s: SparkSession, d: String): DataFrame =
    Similarity.embedDecontaminate(embs(s, d),
        col("vec_id") % 20 === 0, threshold = 0.45,
        tables = 8, planesPerTable = 2, seed = 7L)
      .orderBy("eval_id")

  private val dEmbedDecontaminateSql = {
    val tables = 8
    val planesPerTable = 2
    val buckets = (0 until tables).map { t =>
      val planes = Similarity.hyperplanes(planesPerTable, 64, 7L + t)
      val bucket = planes.zipWithIndex.map { case (pl, i) =>
        val arr = "[" + pl.mkString(", ") + "]"
        s"CASE WHEN list_dot_product(emb, $arr) > 0 " +
        s"THEN ${1 << i} ELSE 0 END"
      }.mkString(" + ")
      s"SELECT vec_id, is_eval, $t AS tbl, $bucket AS bucket FROM base"
    }.mkString("\n  UNION ALL ")
    s"""WITH base AS (SELECT vec_id, vec_id % 20 = 0 AS is_eval,
       |    embedding::DOUBLE[] AS emb,
       |    sqrt(list_dot_product(embedding::DOUBLE[],
       |      embedding::DOUBLE[])) AS norm
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |keyed AS ($buckets),
       |cand AS (SELECT DISTINCT a.vec_id AS eval_id,
       |    b.vec_id AS corpus_id
       |  FROM keyed a JOIN keyed b
       |  ON a.tbl = b.tbl AND a.bucket = b.bucket
       |  WHERE a.is_eval AND NOT b.is_eval),
       |hits AS (SELECT * FROM (SELECT eval_id, corpus_id,
       |    round(list_dot_product(ea.emb, eb.emb) /
       |      (ea.norm * eb.norm), 6) AS cos_sim
       |  FROM cand JOIN base ea ON ea.vec_id = cand.eval_id
       |    JOIN base eb ON eb.vec_id = cand.corpus_id)
       |  WHERE cos_sim >= 0.45),
       |per AS (SELECT eval_id, count(*) AS n_matches,
       |    max(cos_sim) AS best_sim
       |  FROM hits GROUP BY eval_id)
       |SELECT b.vec_id AS eval_id,
       |  coalesce(p.n_matches, 0) AS n_matches, p.best_sim,
       |  p.n_matches IS NOT NULL AS contaminated
       |FROM base b LEFT JOIN per p ON b.vec_id = p.eval_id
       |WHERE b.is_eval ORDER BY eval_id""".stripMargin
  }

  // ---- multimodal plumbing ------------------------------------------
  /** Binary-column metadata pass: treat text bytes as an opaque media
    * blob (the container has no image/audio codecs — see
    * ext/Multimodal for the typed decode plumbing + stub). */
  def mBinaryMeta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      col("text").cast("binary").as("media"))
      .select(col("doc_id"),
        length(col("media")).as("n_bytes"))
      .orderBy("doc_id")

  private val mBinaryMetaSql =
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Typed mapPartitions decode pipeline. PNG, WAV, JPEG and MP4
    * payloads get a REAL header/container parse
    * ([[graft.ext.Multimodal.decode]] — true width/height/format,
    * spec'd against genuine fixtures); unclaimed bytes fall back to
    * a deterministic stub (byte-wise polynomial checksum + derived
    * dimensions). This corpus is pure ASCII text — no magic bytes
    * can match (an MP4 sniff needs a plausible big-endian box size;
    * printable ASCII reads as ≥ 0x20202020) — so every row takes the
    * stub path and the SQL below derives the identical MediaMeta
    * from the text, keeping the query hash-verified. */
  def mMediaDecode(s: SparkSession, d: String): DataFrame =
    graft.ext.Multimodal.decodePipeline(s, d)

  private val mMediaDecodeSql =
    s"""WITH h AS (SELECT doc_id, text,
       |    ${sqlPolyHash("text")} AS crc,
       |    octet_length(encode(text)) AS n_bytes
       |  FROM documents)
       |SELECT doc_id, CAST(n_bytes AS INTEGER) AS n_bytes,
       |  CAST(1 + crc % 640 AS INTEGER) AS width,
       |  CAST(1 + (crc >> 8) % 480 AS INTEGER) AS height,
       |  CASE WHEN n_bytes = 0 THEN 'empty'
       |       ELSE ['jpeg', 'png', 'wav', 'mp4'][(ord(text[1]) % 4) + 1]
       |  END AS format,
       |  crc AS checksum
       |FROM h ORDER BY doc_id""".stripMargin

  /** Frame sampling over the binary payload: up to 4 × 256-byte
    * evenly-spaced slices per blob, emitted as (frame_idx, length,
    * checksum) rows. Oracle-verified via the same substring
    * arithmetic (ASCII corpus: char == byte). */
  def mFrameSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("media"))
      .select(col("doc_id"), posexplode(
        graft.ext.Multimodal.sampleFrames(col("media"), 4, 256)))
      .select(col("doc_id"), col("pos").as("frame_idx"),
        length(col("col")).as("frame_len"),
        graft.functions.RollingHash.rolling_hash(
          col("col").cast("string")).as("frame_crc"))
      .orderBy("doc_id", "frame_idx")

  private val mFrameSampleSql =
    s"""WITH m AS (SELECT doc_id, text, length(text) AS len
       |  FROM documents),
       |fr AS (SELECT doc_id, i,
       |    substring(text,
       |      CAST(trunc(i * greatest((len - 256) / 3.0, 1.0)) AS INT)
       |        + 1, 256) AS frame
       |  FROM m CROSS JOIN range(0, 4) t(i))
       |SELECT doc_id, CAST(i AS INT) AS frame_idx,
       |  length(frame) AS frame_len,
       |  ${sqlPolyHash("frame")} AS frame_crc
       |FROM fr WHERE length(frame) > 0
       |ORDER BY doc_id, frame_idx""".stripMargin

  /** MP4 demux round-trip over the corpus — the real ISO-BMFF path
    * ([[graft.ext.Multimodal.mp4Wrap]] builder +
    * [[graft.ext.Multimodal.mp4Samples]] stsz×stsc×stco parser) run
    * distributed over every document: text bytes are wrapped into a
    * genuine container and demuxed back; recovered samples must
    * equal consecutive 256-byte slices, which the SQL oracle
    * reproduces with substring arithmetic (ASCII corpus: char ==
    * byte). A parser defect surfaces as a hash mismatch, not a
    * silently different checksum. */
  def mMp4Demux(s: SparkSession, d: String): DataFrame =
    graft.ext.Multimodal.mp4RoundTrip(
        graft.ext.Multimodal.mediaFromDocuments(s, d),
        maxSamples = 4, sampleBytes = 256)
      .toDF()
      .select(col("doc_id"), col("sample_idx"),
        length(col("frame")).as("sample_len"),
        graft.functions.RollingHash.rolling_hash(
          col("frame").cast("string")).as("sample_crc"))
      .orderBy("doc_id", "sample_idx")

  private val mMp4DemuxSql =
    s"""WITH m AS (SELECT doc_id, text FROM documents
       |  WHERE length(text) > 0),
       |fr AS (SELECT doc_id, i,
       |    substring(text, CAST(i * 256 AS INT) + 1, 256) AS frame
       |  FROM m CROSS JOIN range(0, 4) t(i))
       |SELECT doc_id, CAST(i AS INT) AS sample_idx,
       |  length(frame) AS sample_len,
       |  ${sqlPolyHash("frame")} AS sample_crc
       |FROM fr WHERE length(frame) > 0
       |ORDER BY doc_id, sample_idx""".stripMargin

  /** Video-frame feature extraction ([[graft.ext.Multimodal
    * .frameDecodePipeline]]): real ISO-BMFF build + demux, then the
    * per-sample codec dispatch — MJPEG/PNG samples decode to REAL
    * raster statistics, codec-less payloads (this ASCII corpus) take
    * the labeled stub, which the oracle reproduces exactly; the real
    * branch is spec-verified on JDK-encoder JPEG fixtures
    * (MultimodalSpec). */
  def mFrameDecode(s: SparkSession, d: String): DataFrame =
    graft.ext.Multimodal.frameDecodePipeline(
        graft.ext.Multimodal.mediaFromDocuments(s, d),
        maxSamples = 4, sampleBytes = 256).toDF()
      .select(col("doc_id"), col("sample_idx"),
        posexplode(col("features")).as(Seq("dim", "value")))
      .orderBy("doc_id", "sample_idx", "dim")

  private val mFrameDecodeSql = {
    val mults = graft.ext.Multimodal.FeatureMults
    val hashes = mults.zipWithIndex.map { case (m, i) =>
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split(frame, ''), c -> ord(c)::BIGINT)), " +
      s"(a, b) -> (a * $m + b) % 2147483647) AS h_$i"
    }.mkString(",\n    ")
    val dims = mults.indices.map { i =>
      s"SELECT doc_id, i, $i AS dim, " +
      s"(h_$i % 2000 - 1000) / 1000.0 AS value FROM h"
    }.mkString("\n  UNION ALL ")
    s"""WITH m AS (SELECT doc_id, text FROM documents
       |  WHERE length(text) > 0),
       |fr AS (SELECT doc_id, i,
       |    substring(text, CAST(i * 256 AS INT) + 1, 256) AS frame
       |  FROM m CROSS JOIN range(0, 4) t(i)),
       |f AS (SELECT doc_id, i, frame FROM fr WHERE length(frame) > 0),
       |h AS (SELECT doc_id, i, $hashes FROM f)
       |SELECT doc_id, CAST(i AS INT) AS sample_idx,
       |  CAST(dim AS INT) AS dim, value
       |FROM ($dims) ORDER BY doc_id, sample_idx, dim""".stripMargin
  }

  /** Feature extraction (stub embedding model) via batched
    * mapPartitions, exploded to (dim, value) rows. The stub is a
    * per-dimension polynomial byte hash scaled to [−1, 1) — SQL-
    * derivable on this ASCII corpus, so even the stub path is
    * hash-verified end-to-end (typed Dataset → mapPartitions →
    * explode). */
  def mFeatures(s: SparkSession, d: String): DataFrame =
    graft.ext.Multimodal.extractFeatures(
        graft.ext.Multimodal.mediaFromDocuments(s, d)).toDF()
      .select(col("doc_id"), posexplode(col("features"))
        .as(Seq("dim", "value")))
      .orderBy("doc_id", "dim")

  private val mFeaturesSql = {
    val mults = graft.ext.Multimodal.FeatureMults
    val hashes = mults.zipWithIndex.map { case (m, i) =>
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split(text, ''), c -> ord(c)::BIGINT)), " +
      s"(a, b) -> (a * $m + b) % 2147483647) AS h_$i"
    }.mkString(",\n    ")
    val dims = mults.indices.map { i =>
      s"SELECT doc_id, $i AS dim, (h_$i % 2000 - 1000) / 1000.0 AS value" +
      " FROM h"
    }.mkString("\n  UNION ALL ")
    s"""WITH h AS (SELECT doc_id,
       |    $hashes
       |  FROM documents)
       |SELECT doc_id, CAST(dim AS INT) AS dim, value
       |FROM ($dims) ORDER BY doc_id, dim""".stripMargin
  }

  /** Fit-within-box resize over the decoded dimensions (320×240,
    * never upscaling) — the metadata half of a media resize chained
    * onto the decode pipeline. */
  /** Media near-dup pairs via the 64-cell block-hash perceptual
    * fingerprint ([[graft.ext.Multimodal.phashDupPairs]]): band-join
    * candidates, exact-Hamming verify, threshold 6 bits. */
  def mPhashDups(s: SparkSession, d: String): DataFrame =
    graft.ext.Multimodal.phashDupPairs(docs(s, d), maxHamming = 6)

  private val mPhashDupsSql = {
    val blockLen = "greatest(len // 64, 1)"
    val cellHash = sqlPolyHash(
      s"substring(text, CAST(i * $blockLen AS INT) + 1, " +
        s"CAST($blockLen AS INT))")
    s"""WITH m AS (SELECT doc_id, text, length(text) AS len
       |  FROM documents WHERE length(text) >= 64),
       |cells AS (SELECT doc_id, i,
       |    $cellHash AS h
       |  FROM m CROSS JOIN range(0, 64) t(i)),
       |mu AS (SELECT doc_id,
       |    CAST(floor(sum(h) / 64.0) AS BIGINT) AS mean
       |  FROM cells GROUP BY 1),
       |fp AS (SELECT c.doc_id, CAST(c.i // 16 AS INT) AS band,
       |    CAST(sum(CASE WHEN c.h > mu.mean
       |      THEN (1 << CAST(c.i % 16 AS INT)) ELSE 0 END)
       |      AS BIGINT) AS bkey
       |  FROM cells c JOIN mu ON c.doc_id = mu.doc_id GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM fp a JOIN fp b ON a.band = b.band AND a.bkey = b.bkey
       |    AND a.doc_id < b.doc_id),
       |ham AS (SELECT c.doc_a, c.doc_b,
       |    CAST(sum(bit_count(xor(x.bkey, y.bkey))) AS BIGINT)
       |      AS hamming
       |  FROM cand c JOIN fp x ON x.doc_id = c.doc_a
       |    JOIN fp y ON y.doc_id = c.doc_b AND x.band = y.band
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, hamming FROM ham
       |WHERE hamming <= 6 ORDER BY doc_a, doc_b""".stripMargin
  }

  def mResize(s: SparkSession, d: String): DataFrame = {
    val meta = graft.ext.Multimodal.decodePipeline(s, d)
    val (w2, h2) = graft.ext.Multimodal.resizeDims(
      col("width"), col("height"), 320, 240)
    meta.select(col("doc_id"), col("width"), col("height"),
      w2.as("out_w"), h2.as("out_h"))
      .orderBy("doc_id")
  }

  private val mResizeSql =
    s"""WITH h AS (SELECT doc_id, ${sqlPolyHash("text")} AS crc
       |  FROM documents),
       |wh AS (SELECT doc_id,
       |    CAST(1 + crc % 640 AS INTEGER) AS width,
       |    CAST(1 + (crc >> 8) % 480 AS INTEGER) AS height
       |  FROM h),
       |sc AS (SELECT doc_id, width, height,
       |    least(320.0 / width, 240.0 / height, 1.0) AS scale
       |  FROM wh)
       |SELECT doc_id, width, height,
       |  greatest(CAST(trunc(width * scale) AS INTEGER), 1) AS out_w,
       |  greatest(CAST(trunc(height * scale) AS INTEGER), 1) AS out_h
       |FROM sc ORDER BY doc_id""".stripMargin

  /** Gopher-style repetition/shape rules (Rae et al. 2021, public):
    * per-doc token count, mean token length, duplicate-token fraction,
    * duplicate-2-gram fraction, and the keep verdict. A pure
    * projection — no shuffle, embarrassingly parallel at any scale;
    * the 2-gram distinct count reuses the codegen'd ShingleSet
    * kernel. Thresholds were chosen against this corpus's metric
    * distribution so the verdict actually discriminates. */
  /** Robust per-source length-outlier filter: median / MAD (median
    * absolute deviation), the estimator that survives the exact heavy
    * tails that break mean/stddev cuts — one boilerplate-spam source
    * can shift a mean arbitrarily but moves the median by one rank.
    * Both statistics are the LOWER MEDIAN by (value, doc_id) rank —
    * pure integer arithmetic, so the filter is hash-exact with no
    * float tolerance anywhere. Verdict: keep iff
    * |len − med| ≤ 3·max(MAD, 1) (the MAD floor guards the
    * all-identical-lengths source, where MAD = 0 would reject every
    * non-median doc).
    *
    * Scale shape: two windowed passes partitioned on source (rank +
    * group count share one exchange each) and two broadcast joins of
    * GROUP-COUNT-sized frames (one row per source — a bounded
    * taxonomy, not corpus-scaled). No self-join of the corpus, no
    * global sort; the per-source sort is the unavoidable cost of an
    * exact median and parallelizes across sources. */
  def dMadFilter(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs(s, d).select(col("doc_id"), col("source"),
      col("n_chars"))
    val srcW = Window.partitionBy("source")
    val rankW = srcW.orderBy(asc("n_chars"), asc("doc_id"))
    // the rank filter leaves exactly one row per source; the trailing
    // per-source Aggregate makes that bound STRUCTURAL (one row per
    // group key, visible to the plan audit), so the broadcast hint on
    // this source-taxonomy-sized frame is provably safe, not asserted
    val meds = base
      .withColumn("rn", row_number().over(rankW))
      .withColumn("cnt", count(lit(1)).over(srcW))
      .filter(col("rn") === ((col("cnt") + 1) / 2).cast("long"))
      .groupBy(col("source")).agg(min(col("n_chars")).as("med"))
    val withDev = base.join(broadcast(meds), Seq("source"))
      .withColumn("dev", abs(col("n_chars") - col("med")))
    val devW = srcW.orderBy(asc("dev"), asc("doc_id"))
    val mads = withDev
      .withColumn("rn", row_number().over(devW))
      .withColumn("cnt", count(lit(1)).over(srcW))
      .filter(col("rn") === ((col("cnt") + 1) / 2).cast("long"))
      .groupBy(col("source")).agg(min(col("dev")).as("mad"))
    withDev.join(broadcast(mads), Seq("source"))
      .withColumn("keep", col("dev") <= lit(3) * greatest(col("mad"), lit(1L)))
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("med"), col("mad"), col("dev"), col("keep"))
      .orderBy("doc_id")
  }

  private val dMadFilterSql =
    """WITH base AS (SELECT doc_id, source, n_chars FROM documents),
      |r1 AS (SELECT source, n_chars,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY source) AS cnt
      |  FROM base),
      |meds AS (SELECT source, n_chars AS med FROM r1
      |  WHERE rn = (cnt + 1) // 2),
      |dv AS (SELECT b.doc_id, b.source, b.n_chars, m.med,
      |    abs(b.n_chars - m.med) AS dev
      |  FROM base b JOIN meds m ON b.source = m.source),
      |r2 AS (SELECT source, dev,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY dev, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY source) AS cnt
      |  FROM dv),
      |mads AS (SELECT source, dev AS mad FROM r2
      |  WHERE rn = (cnt + 1) // 2)
      |SELECT d.doc_id, d.source, d.n_chars, d.med, d.mad, d.dev,
      |  d.dev <= 3 * greatest(d.mad, 1) AS keep
      |FROM (SELECT dv.*, mads.mad FROM dv
      |  JOIN mads ON dv.source = mads.source) d
      |ORDER BY d.doc_id""".stripMargin

  def dGopherRules(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d)
      .withColumn("_toks", TextStats.tokens(col("text")))
    val n = size(col("_toks")).cast("double")
    val nSafe = greatest(n, lit(1.0))
    val meanLen = round(
      length(regexp_replace(col("text"), " ", "")).cast("double") /
        nSafe, 6)
    val dupTok = round(lit(1.0) -
      size(array_distinct(col("_toks"))).cast("double") / nSafe, 6)
    val dup2 = round(lit(1.0) -
      size(graft.functions.ArrayOps.shingle_set(col("_toks"), 2))
        .cast("double") / greatest(n - 1.0, lit(1.0)), 6)
    base.select(col("doc_id"), n.cast("long").as("n_tok"),
        meanLen.as("mean_tok_len"), dupTok.as("dup_tok_frac"),
        dup2.as("dup_2gram_frac"))
      .withColumn("keep", col("n_tok") >= 20 &&
        col("mean_tok_len").between(3.0, 10.0) &&
        col("dup_tok_frac") <= 0.6 && col("dup_2gram_frac") <= 0.05)
      .orderBy("doc_id")
  }

  private val dGopherRulesSql =
    """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
      |  FROM documents),
      |m AS (SELECT doc_id,
      |    len(toks) AS n_tok,
      |    round(len(replace(text, ' ', ''))::DOUBLE /
      |      greatest(len(toks), 1), 6) AS mean_tok_len,
      |    round(1 - len(list_distinct(toks))::DOUBLE /
      |      greatest(len(toks), 1), 6) AS dup_tok_frac,
      |    round(1 - len(list_distinct(list_transform(
      |        range(1, greatest(len(toks) - 1, 1) + 1),
      |        i -> array_to_string(toks[i:i+1], ' '))))::DOUBLE /
      |      greatest(len(toks) - 1, 1), 6) AS dup_2gram_frac
      |  FROM t)
      |SELECT doc_id, n_tok, mean_tok_len, dup_tok_frac, dup_2gram_frac,
      |  n_tok >= 20 AND mean_tok_len BETWEEN 3 AND 10
      |    AND dup_tok_frac <= 0.6 AND dup_2gram_frac <= 0.05 AS keep
      |FROM m ORDER BY doc_id""".stripMargin

  /** Sequential filter-stack attrition report — the "data recipe
    * funnel" every published curation pipeline reports (how many docs
    * each rule removed, applied in order): too-short → token-shape →
    * repetition → unknown-language → low-quality-score. Each rule's
    * metric is the SAME formulation as its standalone query
    * ([[dGopherRules]] shapes, [[dLangId]]'s stopword vote,
    * [[dQualityLr]]'s integer score), so the report provably accounts
    * for the catalog's own filters. A doc is charged to the FIRST
    * rule it fails; n_in/n_out chain by construction.
    *
    * Scale shape: one projection computes every metric + the
    * first-fail verdict in a single pass (whole-stage codegen, no
    * shuffle), then a 6-group partial-combined count; everything
    * after operates on the 5-row rule frame (the global window runs
    * on 5 rows post-aggregation, not on data). */
  def dFilterStack(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val base = docs(s, d).withColumn("_toks",
      TextStats.tokens(col("text")))
    val n = size(col("_toks")).cast("double")
    val nSafe = greatest(n, lit(1.0))
    val meanLen = round(
      length(regexp_replace(col("text"), " ", "")).cast("double") /
        nSafe, 6)
    val dupTok = round(lit(1.0) -
      size(array_distinct(col("_toks"))).cast("double") / nSafe, 6)
    val dup2 = round(lit(1.0) -
      size(graft.functions.ArrayOps.shingle_set(col("_toks"), 2))
        .cast("double") / greatest(n - 1.0, lit(1.0)), 6)
    val score = aggregate(
      transform(graft.functions.ArrayOps.array_poly_hash(col("_toks")),
        h => (h % 256L) * 2654435761L % 2147483647L % 2001L - 1000L),
      lit(0L), (a, x) => a + x)
    val firstFail = when(n.cast("long") < 20, 1)
      .when(!meanLen.between(3.0, 10.0), 2)
      .when(dupTok > 0.6 || dup2 > 0.05, 3)
      .when(TextStats.predictedLang(col("_toks")) === "und", 4)
      .when(score <= 0, 5)
      .otherwise(0)
    val perDoc = base.select(firstFail.as("first_fail"))
    val counts = perDoc.groupBy(col("first_fail"))
      .agg(count(lit(1)).as("n"))
    val tot = perDoc.agg(count(lit(1)).as("total"))
    val rules = Seq((1, "too_short"), (2, "bad_tok_shape"),
      (3, "repetitive"), (4, "lang_unknown"), (5, "low_quality"))
      .toDF("rule_idx", "rule")
    val w = Window.orderBy(col("rule_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    rules.join(counts.withColumnRenamed("first_fail", "rule_idx"),
        Seq("rule_idx"), "left")
      .withColumn("n_dropped", coalesce(col("n"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("n_in", col("total") -
        coalesce(sum(col("n_dropped")).over(w), lit(0L)))
      .withColumn("n_out", col("n_in") - col("n_dropped"))
      .select(col("rule_idx"), col("rule"), col("n_in"),
        col("n_dropped"), col("n_out"))
      .orderBy("rule_idx")
  }

  private val dFilterStackSql = {
    val (scoreCols, best, pred) = langIdSqlFragments
    s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
       |  FROM documents),
       |m AS (SELECT doc_id,
       |    len(toks) AS n_tok,
       |    round(len(replace(text, ' ', ''))::DOUBLE /
       |      greatest(len(toks), 1), 6) AS mean_tok_len,
       |    round(1 - len(list_distinct(toks))::DOUBLE /
       |      greatest(len(toks), 1), 6) AS dup_tok_frac,
       |    round(1 - len(list_distinct(list_transform(
       |        range(1, greatest(len(toks) - 1, 1) + 1),
       |        i -> array_to_string(toks[i:i+1], ' '))))::DOUBLE /
       |      greatest(len(toks) - 1, 1), 6) AS dup_2gram_frac,
       |    CAST(list_sum(list_transform(toks, tok ->
       |      (${sqlPolyHash("tok")} % 256) * 2654435761
       |        % 2147483647 % 2001 - 1000)) AS BIGINT) AS score_milli,
       |    $scoreCols
       |  FROM t),
       |p AS (SELECT *, $best AS best FROM m),
       |f AS (SELECT doc_id,
       |    CASE WHEN n_tok < 20 THEN 1
       |      WHEN NOT (mean_tok_len BETWEEN 3 AND 10) THEN 2
       |      WHEN dup_tok_frac > 0.6 OR dup_2gram_frac > 0.05 THEN 3
       |      WHEN (CASE $pred ELSE 'und' END) = 'und' THEN 4
       |      WHEN score_milli <= 0 THEN 5
       |      ELSE 0 END AS first_fail
       |  FROM p),
       |c AS (SELECT first_fail, count(*) AS n FROM f GROUP BY 1),
       |tot AS (SELECT count(*) AS total FROM f),
       |r(rule_idx, rule) AS (VALUES (1, 'too_short'),
       |  (2, 'bad_tok_shape'), (3, 'repetitive'),
       |  (4, 'lang_unknown'), (5, 'low_quality')),
       |dr AS (SELECT r.rule_idx, r.rule,
       |    CAST(coalesce(c.n, 0) AS BIGINT) AS n_dropped
       |  FROM r LEFT JOIN c ON r.rule_idx = c.first_fail),
       |cm AS (SELECT rule_idx, rule, n_dropped,
       |    CAST(total - coalesce(sum(n_dropped) OVER (ORDER BY rule_idx
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS n_in
       |  FROM dr, tot)
       |SELECT rule_idx, rule, n_in, n_dropped,
       |  n_in - n_dropped AS n_out
       |FROM cm ORDER BY rule_idx""".stripMargin
  }

  /** Hashing-trick linear quality classifier — the fastText-style
    * scorer every large pipeline runs for quality filtering (CCNet,
    * LLaMA's Wikipedia-reference classifier; all public). Each token
    * hashes into one of 256 buckets via the portable polynomial hash;
    * the bucket's weight comes from a deterministic integer mix
    * (golden-ratio multiply, public folklore constant) standing in for
    * trained weights — a real training run replaces the weight
    * expression and nothing else. All arithmetic is exact BIGINT milli
    * units end-to-end (no derived float mean: a rounded per-token
    * mean would sit on engine-specific tie-breaking at the 6th
    * decimal), so engine and oracle agree bit-for-bit. Pure projection: no shuffle, whole-stage codegen
    * end-to-end, embarrassingly parallel at 100 TB. */
  def dQualityLr(s: SparkSession, d: String): DataFrame =
    lrScoreMilli(docs(s, d))
      .withColumn("keep", col("score_milli") > 0)
      .orderBy("doc_id")

  /** Exact integer milli-unit score of a hashed token array — THE
    * definition of the hashing-trick classifier, shared by every
    * consumer so the weight expression can never drift. */
  private def lrWeightSum(hs: Column): Column =
    aggregate(transform(hs, h =>
      (h % 256L) * 2654435761L % 2147483647L % 2001L - 1000L),
      lit(0L), (a, x) => a + x)

  /** (doc_id, n_tok, score_milli) of the hashing-trick scorer — the
    * shared body of [[dQualityLr]] and the cluster-resolution quality
    * key of [[dDedupKeepBest]]. */
  private def lrScoreMilli(dd: DataFrame): DataFrame = {
    val base = dd
      .withColumn("_hs", graft.functions.ArrayOps.array_poly_hash(
        TextStats.tokens(col("text"))))
    base.select(col("doc_id"), size(col("_hs")).cast("long").as("n_tok"),
      lrWeightSum(col("_hs")).as("score_milli"))
  }

  /** Oracle CTE chain of [[lrScoreMilli]] (`t`, `w`) — ONE SQL
    * definition of the hashing-trick score, shared by
    * [[dQualityLrSql]] and [[dDedupKeepBestSql]]. */
  private def lrScoreCtes =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks
       |  FROM documents),
       |w AS (SELECT doc_id, len(toks) AS n_tok,
       |    CAST(list_sum(list_transform(toks, tok ->
       |      (${sqlPolyHash("tok")} % 256) * 2654435761
       |        % 2147483647 % 2001 - 1000)) AS BIGINT) AS score_milli
       |  FROM t)""".stripMargin

  private val dQualityLrSql =
    s"""WITH $lrScoreCtes
       |SELECT doc_id, n_tok, score_milli,
       |  score_milli > 0 AS keep
       |FROM w ORDER BY doc_id""".stripMargin

  /** Reliability (calibration) bins for the [[dQualityLr]] scorer —
    * the table a curation pass needs BEFORE thresholding on a
    * classifier score: per score decile, how often the "high quality"
    * outcome actually occurs. A well-calibrated scorer shows a
    * monotone observed rate across bins; a flat or jagged table says
    * the score ranks but its magnitude means nothing (threshold by
    * rank, not value). The observed label is a deterministic,
    * score-independent quality proxy: type-token ratio ≥ 1/2
    * (2·|distinct tokens| ≥ |tokens| — repetitious docs fail), so
    * both columns are reproducible engine-side and oracle-side.
    *
    * Deciles are NOT a global per-doc sort (single-task at corpus
    * scale): the [[dCcnetBuckets]] histogram-cutoff construction —
    * exact integer scores aggregate to a (score, count) histogram
    * bounded by DISTINCT scores, a cumulative count over that
    * histogram yields the nine cutoffs (c_k = smallest score with
    * cum·10 ≥ k·n), the tiny cutoff frame broadcasts back, and a
    * doc's bin is the smallest k with score ≤ c_k (ties share a bin
    * by construction — deterministic, engine-identical). Per-bin
    * stats are exact BIGINT sums; the two rates do one rounded
    * double division each. At 100 TB the histogram bound is the
    * lever: quantize the score coarser if distinct values grow. */
  def dQualityCalibration(s: SparkSession, d: String): DataFrame =
    qualityCalibration(docs(s, d))

  /** The shared (doc_id, score_milli, label, bin) frame — histogram
    * deciles of the hashing-trick score with the TTR label; ONE
    * definition feeding both the reliability table and the
    * threshold-selection decision, so the two can never bin-drift. */
  private def qualityBinned(dd: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toksCol = TextStats.tokens(col("text"))
    val base = dd.select(col("doc_id"),
      lrWeightSum(graft.functions.ArrayOps.array_poly_hash(toksCol))
        .as("score_milli"),
      (size(array_distinct(toksCol)) * 2 >= size(toksCol)).as("label"))
    val hist = base.groupBy(col("score_milli"))
      .agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum(col("c")).over(Window.orderBy(col("score_milli"))))
    val tot = hist.agg(sum(col("c")).as("n"))
    val cuts = cum.crossJoin(broadcast(tot))
      .select(col("score_milli"), col("cum"), col("n"),
        explode(sequence(lit(1), lit(9))).as("k"))
      .filter(col("cum") * 10 >= col("n") * col("k"))
      .groupBy(col("k")).agg(min(col("score_milli")).as("cut"))
    base
      .join(broadcast(cuts), col("score_milli") <= col("cut"), "left")
      .groupBy(col("doc_id"), col("score_milli"), col("label"))
      .agg(coalesce(min(col("k")), lit(10)).cast("long").as("bin"))
  }

  private[queries] def qualityCalibration(dd: DataFrame): DataFrame = {
    qualityBinned(dd).groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("label"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("score_milli")).as("_sum_score"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n"), 6)
          .as("obs_pos_rate"),
        round(col("_sum_score").cast("double") / col("n"), 6)
          .as("avg_score_milli"))
      .orderBy("bin")
  }

  /** Oracle CTE chain of [[qualityBinned]] (`t`,`w`,`b`,`h`,`cum`,
    * `n`,`cuts`,`bn`) — ONE SQL definition of the decile binning,
    * shared by the reliability table and the threshold decision. */
  private def qualityBinCtes =
    s"""$lrScoreCtes,
       |b AS (SELECT doc_id, score_milli,
       |    len(list_distinct(toks)) * 2 >= len(toks) AS label
       |  FROM t JOIN w USING (doc_id)),
       |h AS (SELECT score_milli, count(*) AS c FROM b GROUP BY 1),
       |cum AS (SELECT score_milli, c,
       |    CAST(sum(c) OVER (ORDER BY score_milli) AS BIGINT) AS cum
       |  FROM h),
       |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
       |cuts AS (SELECT k, min(score_milli) AS cut
       |  FROM cum CROSS JOIN n
       |  CROSS JOIN (SELECT unnest(range(1, 10)) AS k)
       |  WHERE cum * 10 >= n * k GROUP BY k),
       |bn AS (SELECT b.doc_id, b.score_milli, b.label,
       |    CAST(coalesce(min(c.k), 10) AS BIGINT) AS bin
       |  FROM b LEFT JOIN cuts c ON b.score_milli <= c.cut
       |  GROUP BY 1, 2, 3)""".stripMargin

  private val dQualityCalibrationSql =
    s"""WITH $qualityBinCtes
       |SELECT bin, count(*) AS n,
       |  CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_pos,
       |  round(CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*), 6) AS obs_pos_rate,
       |  round(CAST(sum(score_milli) AS DOUBLE) / count(*), 6)
       |    AS avg_score_milli
       |FROM bn GROUP BY bin ORDER BY bin""".stripMargin

  /** The DECISION step on [[dQualityCalibration]]'s reliability bins
    * — what a curation pass actually runs after reading the table:
    * pick the operating point as the SMALLEST decile whose observed
    * positive rate meets the target (1/2 here — integer-exact as
    * `n_pos·2 ≥ n`, no doubles in the decision), keep every document
    * at or above that bin, and emit the kept/dropped accounting
    * (docs, positives, observed rate per side, plus the chosen bin)
    * that goes in the run report. Thresholding on the CALIBRATED bin
    * rather than a raw score magnitude is the point of the
    * reliability table: the decision stays valid even when the score
    * ranks but its magnitude means nothing. Shares [[qualityBinned]]
    * / [[qualityBinCtes]] with the reliability entry, so the decision
    * can never bin-drift from the table it reads; everything through
    * the decision is exact BIGINT arithmetic (hash-verified), the two
    * observed rates are one rounded division each. No new corpus
    * pass: same scan/shuffle shape as the calibration entry plus a
    * 10-row aggregate and a broadcast of one scalar. */
  def dQualityThreshold(s: SparkSession, d: String): DataFrame =
    qualityThreshold(docs(s, d))

  private[queries] def qualityThreshold(dd: DataFrame): DataFrame = {
    val binned = qualityBinned(dd)
    val binStats = binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("label"), 1L).otherwise(0L)).as("n_pos"))
    // smallest qualifying decile; 11 = "no bin qualifies" → keep none
    val thr = binStats.filter(col("n_pos") * 2 >= col("n"))
      .agg(coalesce(min(col("bin")), lit(11L)).as("thr_bin"))
    binned.crossJoin(broadcast(thr))
      .groupBy((col("bin") >= col("thr_bin")).as("kept"),
        col("thr_bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("label"), 1L).otherwise(0L)).as("n_pos"))
      .select(col("kept"), col("thr_bin"), col("n_docs"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n_docs"), 6)
          .as("obs_pos_rate"))
      .orderBy("kept")
  }

  private val dQualityThresholdSql =
    s"""WITH $qualityBinCtes,
       |bs AS (SELECT bin, count(*) AS n,
       |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_pos
       |  FROM bn GROUP BY bin),
       |thr AS (SELECT CAST(coalesce(min(bin), 11) AS BIGINT)
       |    AS thr_bin
       |  FROM bs WHERE n_pos * 2 >= n)
       |SELECT bn.bin >= thr.thr_bin AS kept, thr.thr_bin,
       |  count(*) AS n_docs,
       |  CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_pos,
       |  round(CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*), 6) AS obs_pos_rate
       |FROM bn CROSS JOIN thr
       |GROUP BY 1, 2 ORDER BY kept""".stripMargin

  /** Repetition breaking: the longest run of consecutively repeated
    * tokens per document (the "aaaa…" / looped-generation failure mode
    * the Gopher repetition rules don't see when the repeats are
    * adjacent but globally rare). Sequential semantics, distributed:
    * positions explode once, a per-doc window marks run starts
    * (token ≠ its predecessor), a running sum turns marks into run
    * ids, and two hash aggregations reduce runs to a per-doc max —
    * ONE exchange on doc_id reused by both windows and both
    * aggregations (partial combines locally). At 100 TB the window is
    * per-doc-bounded: no global sort, skew bounded by max doc
    * length. */
  def dRepetitionBreak(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val toks = docs(s, d).select(col("doc_id"),
      posexplode(TextStats.tokens(col("text"))).as(Seq("pos", "tok")))
    val runs = toks
      .withColumn("_new", when(lag(col("tok"), 1).over(w).isNull ||
        lag(col("tok"), 1).over(w) =!= col("tok"), 1L).otherwise(0L))
      .withColumn("_run", sum(col("_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    runs.groupBy(col("doc_id"), col("_run"))
      .agg(count(lit(1)).as("_len"))
      .groupBy(col("doc_id"))
      .agg(sum(col("_len")).cast("long").as("n_tok"),
        max(col("_len")).cast("long").as("max_run"),
        count(lit(1)).cast("long").as("n_runs"))
      .withColumn("keep", col("max_run") <= 8)
      .orderBy("doc_id")
  }

  private val dRepetitionBreakSql =
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
      |    generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM documents),
      |m AS (SELECT doc_id, pos, tok,
      |    CASE WHEN lag(tok) OVER (PARTITION BY doc_id ORDER BY pos)
      |      IS DISTINCT FROM tok THEN 1 ELSE 0 END AS new_run
      |  FROM t),
      |r AS (SELECT doc_id, tok,
      |    sum(new_run) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS UNBOUNDED PRECEDING) AS run_id
      |  FROM m),
      |l AS (SELECT doc_id, run_id, count(*) AS len
      |  FROM r GROUP BY 1, 2)
      |SELECT doc_id, CAST(sum(len) AS BIGINT) AS n_tok,
      |  CAST(max(len) AS BIGINT) AS max_run,
      |  CAST(count(*) AS BIGINT) AS n_runs,
      |  max(len) <= 8 AS keep
      |FROM l GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Deterministic stratified sampling: per-source rate (10/25/40%,
    * keyed off the portable source hash) applied via the portable
    * doc-id hash — reproducible across runs AND engines, no RNG
    * state. A pure filter: no shuffle, no driver involvement; the
    * standard way to downsample a 100 TB corpus per stratum without a
    * sort or a global count. */
  def dStratifiedSample(s: SparkSession, d: String): DataFrame = {
    val docHash = graft.functions.RollingHash.rolling_hash(
      col("doc_id").cast("string"))
    val srcHash = graft.functions.RollingHash.rolling_hash(col("source"))
    docs(s, d)
      .withColumn("rate_pct",
        (lit(10) + pmod(srcHash, lit(3)) * 15).cast("long"))
      .filter(pmod(docHash, lit(100)) < col("rate_pct"))
      .select(col("doc_id"), col("source"), col("rate_pct"))
      .orderBy("doc_id")
  }

  private val dStratifiedSampleSql =
    s"""WITH t AS (SELECT doc_id, source,
       |    ${sqlPolyHash("CAST(doc_id AS VARCHAR)")} AS dh,
       |    ${sqlPolyHash("source")} AS sh
       |  FROM documents)
       |SELECT doc_id, source,
       |  CAST(10 + (sh % 3) * 15 AS BIGINT) AS rate_pct
       |FROM t WHERE dh % 100 < 10 + (sh % 3) * 15
       |ORDER BY doc_id""".stripMargin

  /** Weighted priority sampling (Duffield–Lund–Thorup 2007): a
    * weight-proportional sample of k=100 documents with the
    * unbiased-estimator threshold. Each doc gets priority
    * q = w / u where w = n_chars + 1 and u ∈ (0,1] is the portable
    * doc-id poly-hash scaled by 2⁻³¹ — an exact dyadic rational, so
    * q is ONE double division on bit-identical inputs in both
    * engines (this is why priority sampling and not A-ES reservoir:
    * the u^(1/w) key needs pow/exp, which are only ulp-accurate and
    * can flip a rank at the boundary; w/u is exactly rounded). The
    * top-(k+1) priorities come via TakeOrderedAndProject (no global
    * sort); τ = the (k+1)-th, and every sampled doc carries the DLT
    * weight estimator max(w, τ) — Σ estimates over the sample is an
    * unbiased estimate of Σw over the corpus, the property that
    * makes a 100-TB weighted subsample auditable. */
  def dPrioritySample(s: SparkSession, d: String): DataFrame = {
    val k = 100
    val h = graft.functions.RollingHash.rolling_hash(
      col("doc_id").cast("string"))
    // two MINSTD multiplicative steps (the sampleQueryIds mixing
    // precedent): a short doc-id string poly-hashes to a SMALL
    // value, so raw h/2^31 concentrates u near 0 and priorities
    // explode; g spreads h across the full modulus range
    val m = lit(2147483647L)
    val g = pmod(pmod(h * lit(48271L), m) * lit(48271L), m)
    val sc = docs(s, d).select(col("doc_id"), col("source"),
        (col("n_chars") + 1L).as("w"),
        ((g + lit(1L)).cast("double") / lit(2147483648.0)).as("u"))
      .select(col("doc_id"), col("source"), col("w"),
        (col("w").cast("double") / col("u")).as("q"))
    val top = sc.orderBy(desc("q"), asc("doc_id")).limit(k + 1)
      .localCheckpoint()
    val tau = top.agg(min(col("q")).as("tau"))
    top.orderBy(desc("q"), asc("doc_id")).limit(k)
      .crossJoin(broadcast(tau))
      // priority/est_w ship UNROUNDED: q ≈ 1e9 at 6 decimals is 15
      // significant digits — the engines' round() implementations
      // disagree at that precision edge (measured), while the raw
      // division is exactly rounded and bit-identical (the same
      // lesson as the k-means centroid means)
      .select(col("doc_id"), col("source"), col("w"),
        col("q").as("priority"),
        greatest(col("w").cast("double"), col("tau")).as("est_w"))
      .orderBy("doc_id")
  }

  private val dPrioritySampleSql =
    s"""WITH sc AS (SELECT doc_id, source, n_chars + 1 AS w,
       |    (n_chars + 1) / ((((${sqlPolyHash("CAST(doc_id AS VARCHAR)")}
       |      * 48271) % 2147483647 * 48271) % 2147483647
       |      + 1) / 2147483648.0) AS q
       |  FROM documents),
       |top AS MATERIALIZED (SELECT * FROM sc
       |  ORDER BY q DESC, doc_id LIMIT 101),
       |tau AS (SELECT min(q) AS tau FROM top)
       |SELECT doc_id, source, CAST(w AS BIGINT) AS w,
       |  q AS priority,
       |  CASE WHEN CAST(w AS DOUBLE) > (SELECT tau FROM tau)
       |    THEN CAST(w AS DOUBLE) ELSE (SELECT tau FROM tau) END
       |    AS est_w
       |FROM (SELECT * FROM top ORDER BY q DESC, doc_id LIMIT 100)
       |ORDER BY doc_id""".stripMargin

  /** Token-budget subsampling — the "give me N tokens per source"
    * mixture op (how pretraining mixes are actually specified: token
    * budgets per source, not document rates — cf. the per-source
    * token accounting in `d_corpus_card`/`d_mix_sources`). Documents
    * are visited in deterministic epoch-shuffle order (the portable
    * doc-id hash, ties by doc_id — reproducible across runs AND
    * engines, no RNG state) and taken until the source's budget is
    * reached; the boundary document is kept (standard take-until
    * overshoot ≤ one doc). Per-source budgets here are keyed off the
    * portable source hash (400/700/1000 tokens) the same way
    * `d_stratified_sample` keys its rates.
    *
    * Scale shape: one narrow projection + ONE running-sum window
    * partitioned by source — the cumsum parallelizes across strata
    * exactly like `d_pack`'s, with only (doc_id, source, n_tok, ord)
    * ever shuffling (never text). No global sort, no driver state; at
    * 100 TB the per-stratum windows are independent tasks, and a
    * skewed giant source can be sub-stratified by a hash-derived salt
    * without changing take-until semantics (budget split across
    * salts pro rata). */
  def dTokenBudget(s: SparkSession, d: String): DataFrame = {
    val docHash = graft.functions.RollingHash.rolling_hash(
      col("doc_id").cast("string"))
    val srcHash = graft.functions.RollingHash.rolling_hash(col("source"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("ord"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    docs(s, d)
      .select(col("doc_id"), col("source"),
        size(TextStats.tokens(col("text"))).cast("long").as("n_tok"),
        docHash.as("ord"),
        (lit(400) + pmod(srcHash, lit(3)) * 300).cast("long")
          .as("budget_tok"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("kept", col("cum_before") < col("budget_tok"))
      .select(col("doc_id"), col("source"), col("n_tok"),
        col("budget_tok"), col("cum_before"), col("kept"))
      .orderBy("doc_id")
  }

  private val dTokenBudgetSql =
    s"""WITH t AS (SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |    ${sqlPolyHash("CAST(doc_id AS VARCHAR)")} AS ord,
       |    CAST(400 + (${sqlPolyHash("source")} % 3) * 300 AS BIGINT)
       |      AS budget_tok
       |  FROM documents),
       |c AS (SELECT *, CAST(coalesce(sum(n_tok) OVER (
       |      PARTITION BY source ORDER BY ord, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    AS BIGINT) AS cum_before
       |  FROM t)
       |SELECT doc_id, source, n_tok, budget_tok, cum_before,
       |  cum_before < budget_tok AS kept
       |FROM c ORDER BY doc_id""".stripMargin

  /** Context-window chunking: each document split into 32-token
    * chunks on a 24-token stride (8-token overlap) — the packing
    * precursor for LLM training. One narrow explode per doc (chunk
    * count ≈ n/24), no shuffle; emitting indexes/counts rather than
    * chunk text keeps the verified output compact (the text slice is
    * `slice(_toks, start+1, 32)` when materializing for real). */
  def dChunking(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d)
      .withColumn("_n", size(TextStats.tokens(col("text"))))
    base.select(col("doc_id"), col("_n"),
        explode(sequence(lit(0), greatest(col("_n") - 1, lit(0)),
          lit(24))).as("start"))
      .select(col("doc_id"),
        (col("start") / 24).cast("long").as("chunk_idx"),
        col("start").cast("long").as("start_tok"),
        least(lit(32), col("_n") - col("start")).cast("long")
          .as("n_chunk_toks"))
      .orderBy("doc_id", "chunk_idx")
  }

  private val dChunkingSql =
    """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n
      |  FROM documents),
      |c AS (SELECT doc_id, n, unnest(range(0, greatest(n, 1), 24))
      |    AS start
      |  FROM t)
      |SELECT doc_id, start // 24 AS chunk_idx, start AS start_tok,
      |  least(32, n - start) AS n_chunk_toks
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  /** Sample packing for LLM pretraining: the token streams of each
    * source's documents (doc_id order) are conceptually concatenated
    * and cut into fixed 128-token training sequences; documents span
    * cuts. Emitted per doc: its first/last sequence index — a running
    * token-count window partitioned BY SOURCE, so the cumsum
    * parallelizes across strata (a corpus-global pack would be one
    * serial window; per-stratum is both the scalable shape and what a
    * curriculum-by-source loader wants). */
  def dPack(s: SparkSession, d: String): DataFrame = {
    val cap = 128
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    docs(s, d)
      .select(col("doc_id"), col("source"),
        size(TextStats.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w),
        lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tok"),
        floor(col("cum_before") / cap).as("pack_start"),
        floor((col("cum_before") + col("n_tok") - 1) / cap)
          .as("pack_end"))
      .orderBy("doc_id")
  }

  private val dPackSql =
    """WITH t AS (SELECT doc_id, source,
      |    len(string_split(text, ' ')) AS n_tok
      |  FROM documents),
      |c AS (SELECT doc_id, source, n_tok,
      |    CAST(coalesce(sum(n_tok) OVER (PARTITION BY source
      |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
      |  FROM t)
      |SELECT doc_id, source, n_tok,
      |  CAST(cum_before // 128 AS BIGINT) AS pack_start,
      |  CAST((cum_before + n_tok - 1) // 128 AS BIGINT) AS pack_end
      |FROM c ORDER BY doc_id""".stripMargin

  /** Per-source top-5 token frequencies (vocabulary analysis): one
    * explode, a (source, token) hash aggregate with map-side partial
    * combine, and a per-source rank window over the (tiny) aggregated
    * frame — the counts shuffle carries (source, token, n), never
    * text. */
  def dTopTokens(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(desc("n"), asc("token"))
    docs(s, d)
      .select(col("source"),
        explode(TextStats.tokens(col("text"))).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .orderBy("source", "rk")
  }

  private val dTopTokensSql =
    """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |c AS (SELECT source, token, count(*) AS n FROM t GROUP BY 1, 2),
      |r AS (SELECT source, token, n, row_number() OVER (
      |    PARTITION BY source ORDER BY n DESC, token) AS rk
      |  FROM c)
      |SELECT source, token, n, CAST(rk AS BIGINT) AS rk
      |FROM r WHERE rk <= 5 ORDER BY source, rk""".stripMargin

  /** PMI collocation mining (Church & Hanks 1990): adjacent token
    * pairs whose corpus frequency exceeds what unigram independence
    * predicts. Ranked by the lift RATIO `n_xy·N²/(B·n_x·n_y)` — the
    * exact monotone transform of PMI — so the ranking path carries no
    * transcendental: integer counts enter one fixed double
    * multiply/divide tree (bit-identical cross-engine), rounded
    * before the order-by.
    *
    * Scale shape: bigram generation is a narrow per-row `transform`
    * (no self-join, no corpus window); both count legs are map-side-
    * combined hash aggregations (linear in corpus tokens); the
    * unigram attach joins broadcast a VOCABULARY-sized frame; the
    * totals are two 1-row broadcast frames; the top-50 compiles to
    * TakeOrderedAndProject over the vocabulary²-bounded scored frame
    * (per-partition top-n — no global sort shuffle), and the final
    * rank window runs over 50 rows. */
  def dCollocations(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).select(TextStats.tokens(col("text")).as("toks"))
    val uni = base.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n_w"))
    val bi = base.filter(size(col("toks")) >= 2)
      .select(explode(transform(
        sequence(lit(0), size(col("toks")) - 2),
        i => struct(element_at(col("toks"), i + 1).as("w1"),
          element_at(col("toks"), i + 2).as("w2")))).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("n_xy"))
    val nTok = uni.agg(sum(col("n_w")).as("n_tok"))
    val nBig = bi.agg(sum(col("n_xy")).as("n_big"))
    val scored = bi
      .join(broadcast(uni.select(col("w").as("w1"), col("n_w").as("n_x"))),
        Seq("w1"))
      .join(broadcast(uni.select(col("w").as("w2"), col("n_w").as("n_y"))),
        Seq("w2"))
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBig))
      .filter(col("n_xy") >= 5)
      .withColumn("lift",
        round(col("n_xy").cast("double") * col("n_tok") * col("n_tok") /
          (col("n_big").cast("double") * col("n_x") * col("n_y")), 6))
    scored.orderBy(desc("lift"), asc("w1"), asc("w2")).limit(50)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(desc("lift"), asc("w1"), asc("w2"))).cast("long"))
      .select(col("rk"), col("w1"), col("w2"), col("n_xy"), col("lift"))
      .orderBy("rk")
  }

  private val dCollocationsSql =
    """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
      |u AS (SELECT unnest(toks) AS w FROM t),
      |uni AS (SELECT w, count(*) AS n_w FROM u GROUP BY 1),
      |b0 AS (SELECT unnest(list_transform(range(0, len(toks) - 1),
      |    i -> struct_pack(w1 := toks[i+1], w2 := toks[i+2]))) AS bg
      |  FROM t WHERE len(toks) >= 2),
      |big AS (SELECT bg.w1 AS w1, bg.w2 AS w2, count(*) AS n_xy
      |  FROM b0 GROUP BY 1, 2),
      |tot AS (SELECT
      |    (SELECT CAST(sum(n_w) AS BIGINT) FROM uni) AS n_tok,
      |    (SELECT CAST(sum(n_xy) AS BIGINT) FROM big) AS n_big),
      |sc AS (SELECT w1, w2, n_xy,
      |    round(((CAST(n_xy AS DOUBLE) * n_tok) * n_tok) /
      |      ((CAST(n_big AS DOUBLE) * x.n_w) * y.n_w), 6) AS lift
      |  FROM big JOIN uni x ON big.w1 = x.w
      |    JOIN uni y ON big.w2 = y.w
      |    CROSS JOIN tot
      |  WHERE n_xy >= 5),
      |top AS (SELECT * FROM sc ORDER BY lift DESC, w1, w2 LIMIT 50)
      |SELECT CAST(row_number() OVER (ORDER BY lift DESC, w1, w2)
      |    AS BIGINT) AS rk,
      |  w1, w2, n_xy, lift
      |FROM top ORDER BY rk""".stripMargin

  /** TF-IDF top-3 terms per document. Shapes: term-frequency hash agg
    * on (doc_id, token); document-frequency derived from the tf frame
    * (token-partitioned agg — never re-reads the corpus); the 1-row
    * doc count broadcast; rank window per doc over the aggregated
    * frame. Ranking uses the ROUNDED score (then token) so a 1-ulp
    * `ln` difference between engines cannot flip an ordering. */
  def dTfidf(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d)
    val tf = base
      .select(col("doc_id"),
        explode(TextStats.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nDocs = base.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(col("tf") *
        log((col("n_docs") + 1.0) / (col("df") + 1.0)), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(desc("tfidf"), asc("token"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("token"), col("tfidf"), col("rk"))
      .orderBy("doc_id", "rk")
  }

  private val dTfidfSql =
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1, 2),
      |dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |sc AS (SELECT doc_id, tf.token,
      |    round(tf * ln((n_docs + 1.0) / (df + 1.0)), 6) AS tfidf
      |  FROM tf JOIN dfq ON tf.token = dfq.token, n),
      |r AS (SELECT doc_id, token, tfidf, row_number() OVER (
      |    PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rk
      |  FROM sc)
      |SELECT doc_id, token, tfidf, CAST(rk AS BIGINT) AS rk
      |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  /** BM25 ranked retrieval ([[graft.ext.Retrieval.bm25TopK]]): top-10
    * documents per query for a fixed literal query set over the
    * corpus vocabulary — the sparse-retrieval complement of the dense
    * ANN family (corpus search, eval-set mining, retrieval-augmented
    * curation). k1=1.5 and b=0.75 are exactly binary-representable so
    * every folded constant is bit-identical across engines; per-term
    * scores are rounded before the exact decimal sum (see the
    * operator's determinism note). */
  def dBm25(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val queries = Seq(
      (0L, "sort"), (0L, "merge"), (0L, "join"),
      (1L, "fast"), (1L, "query"),
      (2L, "vector"), (2L, "stream"), (2L, "data"))
      .toDF("qid", "term")
    graft.ext.Retrieval.bm25TopK(docs(s, d), queries, k = 10,
        k1 = 1.5, b = 0.75)
      .orderBy("qid", "rk")
  }

  private val dBm25Sql =
    """WITH q(qid, term) AS (VALUES
      |    (CAST(0 AS BIGINT), 'sort'), (0, 'merge'), (0, 'join'),
      |    (1, 'fast'), (1, 'query'),
      |    (2, 'vector'), (2, 'stream'), (2, 'data')),
      |t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs,
      |    CAST(sum(CAST(dl AS DECIMAL(18,6))) AS DOUBLE) AS sum_dl
      |  FROM dl),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM t
      |  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1, 2),
      |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |sc AS (SELECT q.qid, tf.doc_id,
      |    round(ln(1.0 + (n.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)) *
      |      (tf.tf * 2.5) /
      |      (tf.tf + 1.5 * (0.25 + 0.75 * dl.dl /
      |        (n.sum_dl / n.n_docs))), 6) AS t_score
      |  FROM tf JOIN q USING (term) JOIN dfq USING (term)
      |  JOIN dl USING (doc_id), n),
      |agg AS (SELECT qid, doc_id,
      |    round(CAST(sum(CAST(t_score AS DECIMAL(18,6))) AS DOUBLE), 6)
      |      AS score
      |  FROM sc GROUP BY 1, 2),
      |r AS (SELECT qid, doc_id, score, row_number() OVER (
      |    PARTITION BY qid ORDER BY score DESC, doc_id) AS rk
      |  FROM agg)
      |SELECT qid, doc_id, score, CAST(rk AS BIGINT) AS rk
      |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin

  /** Exact phrase search ([[graft.ext.Retrieval.phraseSearch]]): the
    * phrase set is CORPUS-DERIVED — the 5 most frequent bigrams
    * (count desc, then lexicographic) — so the entry exercises both
    * the derivation aggregate and the positional-adjacency probe on
    * real data at any SF. The oracle takes a DIFFERENT derivation
    * path on purpose: it counts bigram occurrences directly (for a
    * two-term phrase, adjacency matches ≡ bigram occurrences), so the
    * postings posexplode + (w2, doc_id, pos) equi-join is verified
    * against independent arithmetic, not replayed. */
  def dPhraseSearch(s: SparkSession, d: String): DataFrame =
    phraseSearchImpl(s, d, deriveSampleMod = 1L)

  /** [[dPhraseSearch]] with the phrase DERIVATION on the
    * deterministic quarter-sample (`doc_id % 4 = 0`) while the
    * positional search still covers the FULL corpus — the production
    * parameterization (the [[sAnnPqSampled]] pattern): top bigrams
    * are a corpus statistic, so a fixed-rate sample finds the same
    * heavy phrases at scale while the derivation's bigram shuffle —
    * the measured 1000×-probe cost center (corpus-cardinality STRING
    * keys with no combine benefit on the replica-disjoint worst-case
    * vocabulary) — shrinks by the sample rate. The modulus predicate
    * is SQL-mirrorable, so the sampled derivation stays
    * hash-verified. */
  def dPhraseSearchSampled(s: SparkSession, d: String): DataFrame =
    phraseSearchImpl(s, d, deriveSampleMod = 4L)

  private def phraseSearchImpl(s: SparkSession, d: String,
      deriveSampleMod: Long): DataFrame = {
    val base = docs(s, d).select(col("doc_id"), col("text"))
    val top = topBigrams(base, deriveSampleMod)
    graft.ext.Retrieval.phraseSearch(base, top).orderBy("pid")
  }

  /** The 5 hottest bigrams as a (pid, w1, w2) phrase frame —
    * derivation shared by every phrase-search physical shape
    * (build-per-query, sampled, and the persisted-index probe, which
    * must all answer the same question on the same phrase set). */
  private[graft] def topBigrams(base: DataFrame,
      deriveSampleMod: Long): DataFrame = {
    val deriveSrc =
      if (deriveSampleMod > 1L)
        base.filter(pmod(col("doc_id"), lit(deriveSampleMod)) === 0)
      else base
    val toks = TextStats.tokens(col("text"))
    // ranking/pid assignment is the shared rankTopBigrams — ONE
    // definition with the index-served derivation, so the two
    // physical shapes can never order-drift
    graft.ext.Retrieval.rankTopBigrams(
      deriveSrc.filter(size(toks) >= 2)
        .select(explode(transform(
          sequence(lit(0), size(toks) - 2),
          i => struct(element_at(toks, i + 1).as("w1"),
            element_at(toks, i + 2).as("w2")))).as("bg"))
        .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .agg(count(lit(1)).as("n_bg")))
  }

  /** SCALE-PROPORTIONAL derivation sample rate (the production lever
    * BASELINE.md's probe policy names for the one measured
    * super-linear phrase step — the bigram-derivation aggregate over
    * corpus-cardinality string keys, ~18.7× for 10× data at the 1000×
    * tier): mod = max(1, N/1250), exact integer arithmetic, so the
    * SAMPLED doc count stays ~1250 as the corpus grows and the
    * derivation aggregate's shuffle is corpus-independent. 1250 is
    * calibrated to the proven fixed-rate entry: at the sf0.1 bench
    * corpus (5000 docs) the rule yields exactly the mod-4
    * quarter-sample `d_phrase_search_sampled` pins, and top-5 bigrams
    * are heavy hitters (corpus-constant frequencies), which a
    * ~1250-doc uniform sample identifies stably. SQL-mirrorable as a
    * scalar subquery (`greatest(1, count(*) // 1250)` — the
    * `d_containment_auto` pattern), so the auto entry stays
    * hash-verified. */
  private[graft] def autoSampleMod(nDocs: Long): Long =
    math.max(1L, nDocs / 1250L)

  /** The PRODUCTION phrase-search shape ([[graft.ext.Retrieval
    * .buildPhraseIndex]] / [[graft.ext.Retrieval.phraseIndexProbe]]):
    * the positional postings index is materialized ONCE, partitioned
    * by term-hash bucket, and the phrase probe is served from
    * partition-pruned postings without touching text — the layout the
    * build-per-query entries' doc comment specifies for 100 TB (their
    * per-query corpus-proportional postings persist was the measured
    * 1000×-probe memory cliff; here the probe carries no
    * corpus-proportional state at all). Derivation is the sampled
    * variant's (top bigrams are a corpus statistic; the quarter
    * sample finds the same heavy phrases); the layout must never
    * change results, so the oracle is the sampled entry's —
    * hash-equality against it IS the correctness claim. The temp
    * layout is reclaimed after the probe (the zorderScan treatment:
    * repeated runs must not accumulate layouts); in production the
    * build amortizes across every probe on the snapshot. */
  def dPhraseIndexScan(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).select(col("doc_id"), col("text"))
    val top = topBigrams(base, deriveSampleMod = 4L)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_phraseidx").toString
    try {
      graft.ext.Retrieval.buildPhraseIndex(base, dir)
      graft.ext.Retrieval.phraseIndexProbe(s, dir, top)
        .orderBy("pid").localCheckpoint()
    } finally QueryUtil.deleteRecursively(dir)
  }

  /** The phrase pipeline at the SCALE-PROPORTIONAL sample rate — the
    * production composition that retires the one measured
    * super-linear phrase step (r11 weak #1): top-bigram derivation at
    * `mod = autoSampleMod(N)` (its aggregate shuffle bounded by the
    * ~1250-doc sample, never the corpus — 1000× measured 1.41 s vs
    * 265.9 s for the fixed mod-4 full-rate step in the same session),
    * the postings index built once, and the partition-pruned
    * [[graft.ext.Retrieval.phraseIndexProbe]]. The derivation leg is
    * the TEXT-sample aggregate, not
    * [[graft.ext.Retrieval.topBigramsFromIndex]]: both shapes were
    * measured at 1000× (1.41 s vs 2.72 s — the index shape pays the
    * full postings columnar read, a modulus residual cannot prune
    * parquet row groups) and the catalog keeps the cheaper; the
    * index-served shape stays as the spec-pinned alternative for
    * corpora whose raw text is cold or archived. The oracle mirrors
    * the corpus-derived mod as a scalar subquery (the
    * `d_containment_auto` pattern) over the shared phrase-search
    * SQL — the layout must never change results. */
  def dPhraseIndexAuto(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).select(col("doc_id"), col("text"))
    val mod = autoSampleMod(base.count())
    val top = topBigrams(base, mod)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_phraseidx_auto").toString
    try {
      // bucket count derived from the postings count (floored at the
      // proven 64 — bench-SF layouts unchanged); physical only, the
      // probe result is bucket-count-invariant
      val nBkts = graft.ext.Retrieval.buildPhraseIndexAuto(base, dir)
      graft.ext.Retrieval.phraseIndexProbe(s, dir, top, nBkts)
        .orderBy("pid").localCheckpoint()
    } finally QueryUtil.deleteRecursively(dir)
  }

  /** Shared phrase-search oracle: `sampleWhere` restricts the
    * DERIVATION's bigram frame (the sampled variant) while the
    * hit-count join always runs on the full-corpus bigrams. */
  private def dPhraseSearchSqlWith(sampleWhere: String) =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |  FROM documents),
      |b0 AS (SELECT doc_id, unnest(list_transform(range(0, len(toks)-1),
      |    i -> struct_pack(w1 := toks[i+1], w2 := toks[i+2]))) AS bg
      |  FROM t WHERE len(toks) >= 2),
      |bg AS (SELECT bg.w1 AS w1, bg.w2 AS w2, doc_id FROM b0),
      |cnt AS (SELECT w1, w2, count(*) AS n_bg FROM bg
      |  $sampleWhere GROUP BY 1, 2),
      |top AS (SELECT CAST(row_number() OVER (
      |      ORDER BY n_bg DESC, w1, w2) AS BIGINT) AS pid, w1, w2
      |  FROM cnt ORDER BY n_bg DESC, w1, w2 LIMIT 5)
      |SELECT pid, w1, w2,
      |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |  CAST(count(*) AS BIGINT) AS n_hits
      |FROM top JOIN bg USING (w1, w2)
      |GROUP BY pid, w1, w2 ORDER BY pid""".stripMargin

  private val dPhraseSearchSql = dPhraseSearchSqlWith("")
  private val dPhraseSearchSampledSql =
    dPhraseSearchSqlWith("WHERE ((doc_id % 4) + 4) % 4 = 0")
  // the corpus-derived mod as a scalar subquery — mirrors
  // autoSampleMod's exact integer arithmetic (doc_id ≥ 0 by schema,
  // so the plain % needs no sign normalization)
  private val dPhraseIndexAutoSql = dPhraseSearchSqlWith(
    "WHERE doc_id % (SELECT greatest(1, count(*) // 1250) " +
      "FROM documents) = 0")

  /** Hybrid sparse+dense retrieval via reciprocal-rank fusion
    * ([[graft.ext.Retrieval.rrfFuse]], Cormack et al. 2009): each
    * query carries BOTH a term set (the [[dBm25]] literals) and a
    * query vector (testdata aligns `vec_id` with `doc_id`, so qid i's
    * vector is embedding 10·(i+1)); the BM25 leg and the brute-force
    * cosine leg each return top-10, and RRF fuses them in rank space
    * — integer micro-unit contributions floor(1e9/(60+rk)+0.5), so
    * the fused ordering is exact cross-engine. The dense leg here is
    * the fixed-|Q| brute form; at scale it swaps for
    * [[graft.ext.Similarity.pqTopK]] without touching the fusion
    * (rank-space legs are interchangeable by construction). */
  def sHybridRrf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val terms = Seq(
      (0L, "sort"), (0L, "merge"), (0L, "join"),
      (1L, "fast"), (1L, "query"),
      (2L, "vector"), (2L, "stream"), (2L, "data"))
      .toDF("qid", "term")
    val qmap = Seq((0L, 10L), (1L, 20L), (2L, 30L))
      .toDF("qid", "qvec_id")
    val sparse = graft.ext.Retrieval.bm25TopK(docs(s, d), terms,
        k = 10, k1 = 1.5, b = 0.75)
      .select(col("qid"), col("doc_id"), col("rk"))
    val dense = Similarity.bruteForceTopK(embs(s, d),
        qmap.select(col("qvec_id").as("vec_id")), k = 10)
      .join(broadcast(qmap), col("query_id") === col("qvec_id"))
      .select(col("qid"), col("neighbor_id").as("doc_id"),
        col("rank").cast("long").as("rk"))
    graft.ext.Retrieval.rrfFuse(Seq(sparse, dense), k = 10)
      .orderBy("qid", "rk")
  }

  /** [[sHybridRrf]] with the dense leg swapped brute → IVF
    * ([[graft.ext.Similarity.ivfTopK]], nprobe 3) — the
    * leg-interchangeability claim made CONCRETE and hash-verified:
    * same query set, same fusion, only `dr` changes. This is the
    * production composition at scale (the coarse index eats the
    * corpus-proportional work; fusion cost is unchanged). */
  def sHybridRrfIvf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val terms = Seq(
      (0L, "sort"), (0L, "merge"), (0L, "join"),
      (1L, "fast"), (1L, "query"),
      (2L, "vector"), (2L, "stream"), (2L, "data"))
      .toDF("qid", "term")
    val qmap = Seq((0L, 10L), (1L, 20L), (2L, 30L))
      .toDF("qid", "qvec_id")
    val sparse = graft.ext.Retrieval.bm25TopK(docs(s, d), terms,
        k = 10, k1 = 1.5, b = 0.75)
      .select(col("qid"), col("doc_id"), col("rk"))
    val dense = Similarity.ivfTopK(embs(s, d),
        qmap.select(col("qvec_id").as("vec_id")), k = 10, nprobe = 3)
      .join(broadcast(qmap), col("query_id") === col("qvec_id"))
      .select(col("qid"), col("neighbor_id").as("doc_id"),
        col("rank").cast("long").as("rk"))
    graft.ext.Retrieval.rrfFuse(Seq(sparse, dense), k = 10)
      .orderBy("qid", "rk")
  }

  private val sHybridRrfIvfSql = hybridRrfSqlWith(
    """ibase AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb
      |  FROM embeddings WHERE embedding IS NOT NULL),
      |dims AS (SELECT label, i,
      |    CAST(sum(CAST(emb[i] AS DECIMAL(18,6))) AS DOUBLE)
      |      / count(*) AS cv
      |  FROM ibase CROSS JOIN range(1, 65) t(i)
      |  GROUP BY label, i),
      |cent AS (SELECT label, list(cv ORDER BY i) AS centroid
      |  FROM dims GROUP BY label),
      |cprobes AS (SELECT qd.qid, qd.qvec_id, qd.q_emb, cent.label,
      |    round(list_dot_product(q_emb, centroid) /
      |      (sqrt(list_dot_product(q_emb, q_emb)) *
      |       sqrt(list_dot_product(centroid, centroid))), 6) AS c_sim
      |  FROM qd CROSS JOIN cent),
      |probed AS (SELECT qid, qvec_id, q_emb, label FROM (
      |    SELECT *, row_number() OVER (PARTITION BY qid
      |      ORDER BY c_sim DESC, label ASC) AS prn FROM cprobes)
      |  WHERE prn <= 3),
      |dscored AS (SELECT p.qid, b.vec_id AS doc_id,
      |    round(list_dot_product(p.q_emb, b.emb) /
      |      (sqrt(list_dot_product(p.q_emb, p.q_emb)) *
      |       sqrt(list_dot_product(b.emb, b.emb))), 6) AS cos_sim
      |  FROM ibase b JOIN probed p ON b.label = p.label
      |  WHERE b.vec_id <> p.qvec_id),
      |dr AS (SELECT qid, doc_id, row_number() OVER (
      |    PARTITION BY qid ORDER BY cos_sim DESC, doc_id) AS rk
      |  FROM dscored)""".stripMargin)

  /** Shared oracle builder for the RRF hybrids: the BM25 chain and
    * the fusion are identical across variants; `denseCtes` supplies
    * the dense leg ending in a CTE `dr` with (qid, doc_id, rk) —
    * exactly the leg-interchangeability contract the Spark operator
    * makes ([[graft.ext.Retrieval.rrfFuse]] takes any ranked frame). */
  private def hybridRrfSqlWith(denseCtes: String): String =
    s"""WITH q(qid, term) AS (VALUES
       |    (CAST(0 AS BIGINT), 'sort'), (0, 'merge'), (0, 'join'),
       |    (1, 'fast'), (1, 'query'),
       |    (2, 'vector'), (2, 'stream'), (2, 'data')),
       |qv(qid, qvec_id) AS (VALUES
       |    (CAST(0 AS BIGINT), CAST(10 AS BIGINT)), (1, 20), (2, 30)),
       |t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents),
       |dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs,
       |    CAST(sum(CAST(dl AS DECIMAL(18,6))) AS DOUBLE) AS sum_dl
       |  FROM dl),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM t
       |  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1, 2),
       |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |sc AS (SELECT q.qid, tf.doc_id,
       |    round(ln(1.0 + (n.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)) *
       |      (tf.tf * 2.5) /
       |      (tf.tf + 1.5 * (0.25 + 0.75 * dl.dl /
       |        (n.sum_dl / n.n_docs))), 6) AS t_score
       |  FROM tf JOIN q USING (term) JOIN dfq USING (term)
       |  JOIN dl USING (doc_id), n),
       |bagg AS (SELECT qid, doc_id,
       |    round(CAST(sum(CAST(t_score AS DECIMAL(18,6))) AS DOUBLE), 6)
       |      AS score
       |  FROM sc GROUP BY 1, 2),
       |sr AS (SELECT qid, doc_id, row_number() OVER (
       |    PARTITION BY qid ORDER BY score DESC, doc_id) AS rk
       |  FROM bagg),
       |base AS (SELECT vec_id, embedding::DOUBLE[] AS emb
       |  FROM embeddings),
       |qd AS (SELECT qv.qid, qv.qvec_id, b.emb AS q_emb
       |  FROM base b JOIN qv ON b.vec_id = qv.qvec_id),
       |$denseCtes,
       |legs AS (
       |  SELECT qid, doc_id,
       |    CAST(floor(1e9 / (60 + rk) + 0.5) AS BIGINT) AS contrib
       |  FROM sr WHERE rk <= 10
       |  UNION ALL
       |  SELECT qid, doc_id,
       |    CAST(floor(1e9 / (60 + rk) + 0.5) AS BIGINT) AS contrib
       |  FROM dr WHERE rk <= 10),
       |fused AS (SELECT qid, doc_id,
       |    CAST(sum(contrib) AS BIGINT) AS rrf,
       |    count(*) AS n_legs
       |  FROM legs GROUP BY 1, 2),
       |r AS (SELECT qid, doc_id, rrf, n_legs, row_number() OVER (
       |    PARTITION BY qid ORDER BY rrf DESC, doc_id) AS rk
       |  FROM fused)
       |SELECT qid, doc_id, rrf, CAST(n_legs AS BIGINT) AS n_legs,
       |  CAST(rk AS BIGINT) AS rk
       |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin

  private val sHybridRrfSql = hybridRrfSqlWith(
    """dscored AS (SELECT qd.qid, b.vec_id AS doc_id,
      |    round(list_dot_product(q_emb, emb) /
      |      (sqrt(list_dot_product(q_emb, q_emb)) *
      |       sqrt(list_dot_product(emb, emb))), 6) AS cos_sim
      |  FROM base b CROSS JOIN qd WHERE b.vec_id <> qd.qvec_id),
      |dr AS (SELECT qid, doc_id, row_number() OVER (
      |    PARTITION BY qid ORDER BY cos_sim DESC, doc_id) AS rk
      |  FROM dscored)""".stripMargin)

  /** Benchmark decontamination: find corpus documents sharing any
    * 5-gram with a held-out eval set (doc_id % 10 == 0 stands in for
    * the benchmark), reporting the shared-gram count per (eval,
    * corpus) pair — the GPT-3-style n-gram overlap scrub. Scale
    * shape: both sides explode to (doc_id, gram-HASH) — the join key
    * is an 8-byte long from the portable poly-hash family, never the
    * gram text — and the equi-join hash-partitions on it; shingle
    * sets are per-doc distinct so the per-pair count needs no
    * distinct. A hash collision could only add a phantom shared gram
    * (flag-for-review semantics, not deletion). */
  def dDecontaminate(s: SparkSession, d: String): DataFrame = {
    // the gram frame feeds both join sides — persist so the
    // tokenize→shingle→hash work runs once, then eager-release (the
    // repo's standard persist/localCheckpoint/unpersist hygiene)
    val grams = docs(s, d).select(col("doc_id"),
        explode(graft.functions.ArrayOps.array_poly_hash(
          graft.functions.ArrayOps.shingle_set(
            TextStats.tokens(col("text")), 5))).as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val eval = grams.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("eval_doc"), col("g"))
    val corpus = grams.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id").as("corpus_doc"), col("g"))
    val pairs = eval.join(corpus, "g")
      .groupBy(col("eval_doc"), col("corpus_doc"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("eval_doc", "corpus_doc")
    val out = pairs.localCheckpoint()
    grams.unpersist()
    out
  }

  private val dDecontaminateSql =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
       |  FROM documents),
       |sh AS (SELECT doc_id, unnest(list_transform(
       |    ${sqlShingleList("toks", 5)},
       |    s -> ${sqlPolyHash("s")})) AS g
       |  FROM t),
       |e AS (SELECT doc_id AS eval_doc, g FROM sh WHERE doc_id % 10 = 0),
       |c AS (SELECT doc_id AS corpus_doc, g FROM sh
       |  WHERE doc_id % 10 <> 0)
       |SELECT eval_doc, corpus_doc, count(*) AS n_shared
       |FROM e JOIN c USING (g) GROUP BY 1, 2
       |ORDER BY eval_doc, corpus_doc""".stripMargin

  /** Exact substring-span duplication stats (the corpus-internal
    * signal behind exact-substring dedup, Lee et al. 2022,
    * arXiv:2107.06499 — "Deduplicating Training Data Makes Language
    * Models Better"): for each document, the fraction of its distinct
    * 8-token spans that also occur in at least one OTHER document.
    * Downstream policy (cut the spans / drop the doc above a
    * threshold) consumes (doc_id, n_grams, n_dup_grams, dup_frac).
    *
    * Scale shape mirrors [[dDecontaminate]]: spans travel as 8-byte
    * poly-hash longs (never text); span doc-frequency is one hash
    * aggregation; the join back to per-doc grams re-partitions on the
    * same key, so the df exchange is reused. A span shared by k docs
    * contributes k join rows (not k²) — no quadratic blow-up on
    * boilerplate, unlike pair-forming ops. A hash collision can only
    * over-count a dup span (flag-for-review semantics). */
  def dSpanDedup(s: SparkSession, d: String): DataFrame = {
    val grams = docs(s, d).select(col("doc_id"),
        explode(graft.functions.ArrayOps.array_poly_hash(
          graft.functions.ArrayOps.shingle_set(
            TextStats.tokens(col("text")), 8))).as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // shingle_set is per-doc distinct → count(*) = span doc-frequency
    val docFreq = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val out = grams.join(docFreq, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("df") >= 2, 1)).as("n_dup_grams"))
      .withColumn("dup_frac", round(
        col("n_dup_grams").cast("double") / col("n_grams"), 6))
      .orderBy("doc_id")
      .localCheckpoint()
    grams.unpersist()
    out
  }

  private val dSpanDedupSql =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
       |  FROM documents),
       |sh AS (SELECT doc_id, unnest(list_transform(
       |    ${sqlShingleList("toks", 8)},
       |    s -> ${sqlPolyHash("s")})) AS g
       |  FROM t),
       |df AS (SELECT g, count(*) AS df FROM sh GROUP BY 1)
       |SELECT doc_id, count(*) AS n_grams,
       |  count(CASE WHEN df >= 2 THEN 1 END) AS n_dup_grams,
       |  round(count(CASE WHEN df >= 2 THEN 1 END)::DOUBLE / count(*), 6)
       |    AS dup_frac
       |FROM sh JOIN df USING (g)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Exact-substring CUT — the rewrite step of exact-substring dedup
    * (Lee et al. 2022, arXiv:2107.06499): [[dSpanDedup]] reports span
    * duplication; this entry actually EMITS the deduplicated corpus.
    * Every positional 8-token gram occurrence whose hash occurs
    * anywhere else in the corpus keeps only its globally-first
    * occurrence (min (doc_id, pos)); tokens covered by any
    * non-canonical duplicated occurrence are dropped and the
    * remaining tokens reassembled in order. Output per doc: token
    * counts, cut fraction, and the rewritten text.
    *
    * Scale shape: positional gram hashes come from the codegen
    * [[graft.functions.GramHashes]] kernel (one compiled pass — the
    * HOF spelling allocates a slice + gram string per position, the
    * winnowing lesson); the canonical election is ONE partial-
    * combined hash aggregate keyed by the 8-byte gram hash (min
    * (doc_id, pos) struct + count — skew-safe, unlike a window
    * partitioned by a hot boilerplate gram); cut positions explode at
    * most 8× the duplicated-occurrence count; reassembly is a
    * doc_id-keyed aggregate whose partitions are doc-sized by
    * construction. Only (id, pos, hash) rows shuffle — never text;
    * the rewritten text materializes once, partition-local, in the
    * final doc-keyed aggregate. */
  def dSpanCut(s: SparkSession, d: String): DataFrame =
    spanCut(docs(s, d))

  /** [[dSpanCut]] over an arbitrary (doc_id, text) frame — the
    * spec-testable core. */
  def spanCut(docsDf: DataFrame): DataFrame = {
    val base = docsDf.select(col("doc_id"),
        TextStats.tokens(col("text")).as("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pg = base.select(col("doc_id"),
      posexplode(graft.functions.GramHashes.gram_hashes(col("toks"), 8))
        .as(Seq("pos", "g")))
    // canonical occurrence per gram: min (doc_id, pos) struct + count
    // in one map-side-combined aggregate — same argmin-by-struct
    // semantics as `row_number() OVER (PARTITION BY g ORDER BY
    // doc_id, pos) = 1`, without a skewable window
    val canon = pg.groupBy(col("g"))
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("pos"))).as("first"))
    val cut = pg.join(canon, Seq("g"))
      .filter(col("cnt") > 1 &&
        !(col("doc_id") === col("first.doc_id") &&
          col("pos") === col("first.pos")))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + 7)).as("tp"))
      .distinct()
    val tok = base.select(col("doc_id"),
      posexplode(col("toks")).as(Seq("tp", "token")))
    val kept = tok.join(cut, Seq("doc_id", "tp"), "left_anti")
    val agg = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("tp"), col("token")))),
          x => x("token")), " ").as("text_dedup"))
    val out = base
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        round((col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .cast("double") / col("n_tokens"), 6).as("cut_frac"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
      .orderBy("doc_id")
      .localCheckpoint()
    base.unpersist()
    out
  }

  private val dSpanCutSql =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
       |  FROM documents),
       |gh AS (SELECT doc_id, toks,
       |    CASE WHEN len(toks) >= 8 THEN
       |      list_transform(range(1, len(toks) - 7 + 1),
       |        i -> ${sqlPolyHash("array_to_string(toks[i:i+7], ' ')")})
       |    ELSE [] END AS gh
       |  FROM t),
       |pg AS (SELECT doc_id,
       |    unnest(range(1, len(gh) + 1)) - 1 AS pos,
       |    unnest(gh) AS g
       |  FROM gh),
       |rk AS (SELECT doc_id, pos,
       |    row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn,
       |    count(*) OVER (PARTITION BY g) AS cnt
       |  FROM pg),
       |cutpos AS (SELECT doc_id, unnest(range(pos, pos + 8)) AS tp
       |  FROM rk WHERE cnt > 1 AND rn > 1),
       |cut AS (SELECT DISTINCT doc_id, tp FROM cutpos),
       |tok AS (SELECT doc_id,
       |    unnest(range(1, len(toks) + 1)) - 1 AS tp,
       |    unnest(toks) AS token
       |  FROM t),
       |kept AS (SELECT k.doc_id, k.tp, k.token
       |  FROM tok k LEFT JOIN cut c
       |    ON k.doc_id = c.doc_id AND k.tp = c.tp
       |  WHERE c.doc_id IS NULL),
       |agg AS (SELECT doc_id, count(*) AS n_kept,
       |    array_to_string(list(token ORDER BY tp), ' ') AS text_dedup
       |  FROM kept GROUP BY 1)
       |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
       |  round((len(t.toks) - coalesce(a.n_kept, 0))::DOUBLE /
       |    len(t.toks), 6) AS cut_frac,
       |  coalesce(a.text_dedup, '') AS text_dedup
       |FROM t LEFT JOIN agg a USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Unigram-LM quality score (the perplexity-filter family, CCNet /
    * Wenzek et al. 2020 shape, with the LM trained on the corpus
    * itself): per-token negative log-probability −ln(cnt/total) under
    * the corpus unigram distribution, averaged per document. Junk and
    * off-distribution documents score high; fluent in-distribution
    * text scores low — the standard cheap quality gate before an
    * expensive model-based filter.
    *
    * Scale shape: the vocabulary frame (token, cnt) is tiny relative
    * to the corpus (Heaps' law) and aggregates with partial combine;
    * the corpus total attaches as a broadcast 1-row cross join; the
    * score join back to token positions is an equi-join on the token.
    * Hot tokens ("the") skew that key, and LmSkewSpec PROVED that AQE
    * does NOT rescue this shape when the vocab side outgrows the
    * broadcast threshold (the SMJ's vocab child is an aggregate, not
    * a raw shuffle read, so OptimizeSkewedJoin's pattern cannot
    * match) — so the skew handling is deterministic instead: tokens
    * with count ≥ `hotThreshold` take a broadcast-join branch (the
    * hot set is tiny by definition — ≤ total/hotThreshold keys), the
    * shuffled branch sees only sub-threshold keys, and the union of
    * the two disjoint inner joins is exactly the original join.
    * Cross-engine parity: the per-token score is rounded to 6
    * decimals BEFORE the per-doc decimal-sum average
    * (order-independent; ln parity with DuckDB is already exercised
    * by [[dTfidf]]). */
  def dLmScore(s: SparkSession, d: String): DataFrame =
    lmScore(docs(s, d))

  /** Operator body of [[dLmScore]] over any (doc_id, text) frame —
    * separate so specs can assert the ordering property on a
    * constructed corpus. `materialize = false` (dev/spec only) skips
    * the persist + localCheckpoint so the returned frame carries the
    * full logical plan — LmSkewSpec uses it to audit the hot-token
    * join strategy that the checkpoint would otherwise truncate. */
  def lmScore(documents: DataFrame, materialize: Boolean = true,
      hotThreshold: Long = 1L << 20): DataFrame = {
    val toksRaw = documents.select(col("doc_id"),
      explode(TextStats.tokens(col("text"))).as("tok"))
    val toks = if (materialize)
      toksRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else toksRaw
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("total"))
    val scored = vocab.crossJoin(broadcast(total))
      .select(col("tok"), col("cnt"), round(
        log(col("total").cast("double") / col("cnt")), 6).as("nll_tok"))
    // deterministic hot-key bypass (see scaladoc): hot scores
    // broadcast — at most total/hotThreshold rows, and every one of
    // them would otherwise pin its whole occurrence mass on a single
    // shuffle partition; the anti-join keeps hot occurrences out of
    // the shuffled branch so the skew never ships
    val hotScores = scored.filter(col("cnt") >= hotThreshold).drop("cnt")
    val coldScores = scored.filter(col("cnt") < hotThreshold).drop("cnt")
    val coldToks = toks.join(broadcast(hotScores.select(col("tok"))),
      Seq("tok"), "left_anti")
    val perTok = toks.join(broadcast(hotScores), "tok")
      .unionByName(coldToks.join(coldScores, "tok"))
    val joined = perTok
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), avgDec(col("nll_tok")).as("nll"))
      .orderBy("doc_id")
    if (!materialize) joined
    else {
      val out = joined.localCheckpoint()
      toks.unpersist()
      out
    }
  }

  /** Oracle CTE chain of the unigram LM (`tk`, `v`, `tot`, `sc`) —
    * ONE SQL definition of the per-token NLL model, shared by
    * [[dLmScoreSql]] and [[dCcnetBucketsSql]]. */
  private val lmScoreCtes =
    """tk AS (SELECT doc_id, unnest(string_split(text, ' '))
      |    AS tok FROM documents),
      |v AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY 1),
      |tot AS (SELECT sum(cnt) AS total FROM v),
      |sc AS (SELECT tok, round(ln(total::DOUBLE / cnt), 6) AS nll_tok
      |  FROM v, tot)""".stripMargin

  private val dLmScoreSql =
    s"""WITH $lmScoreCtes
       |SELECT doc_id, count(*) AS n_tok,
       |  ${sqlAvgDec("nll_tok")} AS nll
       |FROM tk JOIN sc USING (tok)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020,
    * arXiv:1911.00359, public): per-language tercile split of the
    * unigram LM score — the head/middle/tail partition CCNet uses to
    * gate training data by LM fit. The tercile is NOT a per-doc
    * ntile (a global per-language sort — single-task at corpus
    * scale); instead the rounded score is binned to exact integer
    * micro units and the two cutoffs come from a cumulative count
    * over the (lang, score)-DISTINCT histogram: t1 = smallest score
    * with cum·3 ≥ n, t2 = smallest with cum·3 ≥ 2n. The histogram is
    * bounded by distinct rounded scores (≪ corpus), the cutoff frame
    * is per-language tiny and broadcast back, and every per-doc step
    * is a projection — no global sort anywhere. Boundary ties share a
    * bucket by construction, so the result is deterministic and
    * engine-identical. */
  def dCcnetBuckets(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dd = docs(s, d)
    val withLang = lmScore(dd)
      .join(dd.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .withColumn("micro", round(col("nll") * 1e6).cast("long"))
    val hist = withLang.groupBy(col("lang"), col("micro"))
      .agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum", sum(col("c")).over(
      Window.partitionBy(col("lang")).orderBy(col("micro"))))
    val tot = hist.groupBy(col("lang")).agg(sum(col("c")).as("n"))
    val cj = cum.join(tot, Seq("lang"))
    val t1 = cj.filter(col("cum") * 3 >= col("n"))
      .groupBy(col("lang")).agg(min(col("micro")).as("t1"))
    val t2 = cj.filter(col("cum") * 3 >= col("n") * 2)
      .groupBy(col("lang")).agg(min(col("micro")).as("t2"))
    withLang.join(broadcast(t1.join(t2, Seq("lang"))), Seq("lang"))
      .withColumn("bucket",
        when(col("micro") <= col("t1"), "head")
          .when(col("micro") <= col("t2"), "middle")
          .otherwise("tail"))
      .select(col("doc_id"), col("lang"), col("nll"), col("bucket"))
      .orderBy("doc_id")
  }

  private val dCcnetBucketsSql =
    s"""WITH $lmScoreCtes,
       |s AS (SELECT doc_id, ${sqlAvgDec("nll_tok")} AS nll
       |  FROM tk JOIN sc USING (tok) GROUP BY doc_id),
       |wl AS (SELECT s.doc_id, d.lang, s.nll,
       |    CAST(round(s.nll * 1000000) AS BIGINT) AS micro
       |  FROM s JOIN documents d ON s.doc_id = d.doc_id),
       |h AS (SELECT lang, micro, count(*) AS c FROM wl GROUP BY 1, 2),
       |cum AS (SELECT lang, micro, c,
       |    CAST(sum(c) OVER (PARTITION BY lang ORDER BY micro)
       |      AS BIGINT) AS cum
       |  FROM h),
       |n AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM h
       |  GROUP BY 1),
       |t1 AS (SELECT lang, min(micro) AS t1 FROM cum JOIN n USING (lang)
       |  WHERE cum * 3 >= n GROUP BY lang),
       |t2 AS (SELECT lang, min(micro) AS t2 FROM cum JOIN n USING (lang)
       |  WHERE cum * 3 >= n * 2 GROUP BY lang)
       |SELECT wl.doc_id, wl.lang, wl.nll,
       |  CASE WHEN wl.micro <= t1.t1 THEN 'head'
       |    WHEN wl.micro <= t2.t2 THEN 'middle'
       |    ELSE 'tail' END AS bucket
       |FROM wl JOIN t1 USING (lang) JOIN t2 USING (lang)
       |ORDER BY doc_id""".stripMargin

  /** DSIR-style importance weight (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): per-document
    * log importance weight ln(p_target(x)/p_raw(x)) under hashed
    * bag-of-unigram models — the target model trained on the
    * designated high-quality slice (`source = 'src1'` here), the raw
    * model on the whole corpus, both Laplace-smoothed over a FIXED
    * `buckets`-wide hashed vocabulary. Documents whose token
    * distribution resembles the target slice score high; resampling
    * by this weight is DSIR's selection step.
    *
    * Scale shape: hashing the vocabulary into a fixed bucket count is
    * what makes this a 100-TB operator — both models are exactly
    * `buckets` rows regardless of corpus size, so the per-bucket
    * score frame BROADCASTS by construction and the per-token join
    * back is shuffle-free (hot buckets are irrelevant under a
    * broadcast join — contrast the shuffled-join skew machinery
    * [[lmScore]] needs for its unbounded exact vocabulary). One
    * corpus scan, one fixed-width aggregate, one per-doc aggregate.
    * Parity: per-bucket score rounded to 6 decimals before the
    * order-independent decimal sum, as everywhere in this family. */
  def dDsir(s: SparkSession, d: String): DataFrame =
    dsirWeights(docs(s, d), col("source") === "src1")

  /** Operator body of [[dDsir]] over any (doc_id, text, …) frame,
    * `isTarget` marking the target-distribution rows. */
  def dsirWeights(documents: DataFrame, isTarget: Column,
      buckets: Int = 4096, materialize: Boolean = true): DataFrame = {
    val toksRaw = documents.select(col("doc_id"),
        isTarget.as("is_t"),
        explode(graft.functions.ArrayOps.array_poly_hash(
          TextStats.tokens(col("text")))).as("th"))
      .withColumn("b", col("th") % buckets).drop("th")
    val toks = if (materialize)
      toksRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else toksRaw
    val model = toks.groupBy(col("b"))
      .agg(count(lit(1)).as("cnt_r"),
        count(when(col("is_t"), 1)).as("cnt_t"))
    val tot = model.agg(sum(col("cnt_r")).as("tot_r"),
      sum(col("cnt_t")).as("tot_t"))
    val score = model.crossJoin(broadcast(tot))
      .select(col("b"), round(
        log((col("cnt_t") + lit(1)).cast("double") /
          (col("tot_t") + lit(buckets))) -
        log((col("cnt_r") + lit(1)).cast("double") /
          (col("tot_r") + lit(buckets))), 6).as("w"))
    val out = toks.join(broadcast(score), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sumDec(col("w")).as("logw"))
      .orderBy("doc_id")
    if (!materialize) out
    else {
      val res = out.localCheckpoint()
      toks.unpersist()
      res
    }
  }

  private val dDsirSql =
    s"""WITH tk0 AS (SELECT doc_id, source = 'src1' AS is_t,
       |    unnest(list_transform(string_split(text, ' '),
       |      t -> ${sqlPolyHash("t")})) AS th
       |  FROM documents),
       |tk AS (SELECT doc_id, is_t, th % 4096 AS b FROM tk0),
       |m AS (SELECT b, count(*) AS cnt_r,
       |    count(CASE WHEN is_t THEN 1 END) AS cnt_t
       |  FROM tk GROUP BY 1),
       |tot AS (SELECT sum(cnt_r) AS tot_r, sum(cnt_t) AS tot_t FROM m),
       |sc AS (SELECT b,
       |    round(ln((cnt_t + 1)::DOUBLE / (tot_t + 4096)) -
       |          ln((cnt_r + 1)::DOUBLE / (tot_r + 4096)), 6) AS w
       |  FROM m, tot)
       |SELECT doc_id, count(*) AS n_tok, ${sqlSumDec("w")} AS logw
       |FROM tk JOIN sc USING (b)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Chunk-level exact dedup-and-rewrite (the paragraph-dedup stage
    * of CCNet, Wenzek et al. 2020 — over fixed 8-token chunks here,
    * since the corpus carries no paragraph breaks): every chunk whose
    * hash already occurred at a smaller (doc_id, position) anywhere
    * in the corpus is cut, and each document is recomposed from its
    * surviving chunks. Unlike [[dSpanDedup]] (stats only) this is the
    * rewriting form: output is per-doc chunk accounting plus the
    * deduplicated text.
    *
    * Scale shape: first-occurrence election is one hash aggregation
    * on the chunk hash (`min(struct(doc_id, idx))` — no sort, partial
    * combine applies); winners join back on the same key, so the
    * exchange is reused and a chunk shared by k docs costs k join
    * rows, never k². Chunk text rides along only for recomposition
    * (it must reach the output anyway); recomposition sorts ≤
    * n_chunks elements inside a per-doc hash aggregate — no global
    * sort. A hash collision can only cut a unique chunk —
    * conservative for training data. */
  def dChunkDedup(s: SparkSession, d: String): DataFrame =
    chunkDedup(docs(s, d), c = 8)

  /** Operator body of [[dChunkDedup]] over any (doc_id, text) frame —
    * separate so specs can assert the rewrite semantics on a
    * constructed corpus. */
  def chunkDedup(documents: DataFrame, c: Int): DataFrame = {
    val toks = TextStats.tokens(col("text"))
    val nChunks = ceil(size(toks).cast("double") / c).cast("int")
    val chunks = transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(toks, i * c + 1, lit(c)), " "))
    val ch = documents
      .select(col("doc_id"), posexplode(chunks).as(Seq("idx", "chunk")))
      .withColumn("g", TextStats.fingerprint(col("chunk")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val first = ch.groupBy(col("g"))
      .agg(min(struct(col("doc_id"), col("idx"))).as("first"))
    val out = ch.join(first, "g")
      .withColumn("kept", col("doc_id") === col("first.doc_id") &&
        col("idx") === col("first.idx"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("kept"), 1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(
          when(col("kept"), struct(col("idx"), col("chunk"))))),
          x => x.getField("chunk")), " ").as("dedup_text"))
      .orderBy("doc_id")
      .localCheckpoint()
    ch.unpersist()
    out
  }

  private val dChunkDedupSql =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
       |  FROM documents),
       |ch0 AS (SELECT doc_id, list_transform(
       |    range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)),
       |    i -> array_to_string(toks[i*8+1:i*8+8], ' ')) AS chunks
       |  FROM t),
       |ch AS (SELECT doc_id,
       |    CAST(unnest(range(0, len(chunks))) AS INT) AS idx,
       |    unnest(chunks) AS chunk FROM ch0),
       |h AS (SELECT doc_id, idx, chunk, ${sqlPolyHash("chunk")} AS g
       |  FROM ch),
       |f AS (SELECT doc_id, idx, chunk,
       |    row_number() OVER (PARTITION BY g ORDER BY doc_id, idx)
       |      AS rn
       |  FROM h)
       |SELECT doc_id, count(*) AS n_chunks,
       |  count(CASE WHEN rn = 1 THEN 1 END) AS n_kept,
       |  coalesce(string_agg(chunk, ' ' ORDER BY idx)
       |    FILTER (WHERE rn = 1), '') AS dedup_text
       |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Per-source distribution shift: KL divergence of each source's
    * unigram token distribution from the whole-corpus distribution —
    * the standard data-mixing diagnostic (which sources sit off the
    * corpus distribution, and how far a mixture reweight would move
    * it). KL(P_s ‖ P) = Σ_t p_s(t)·ln(p_s(t)/p(t)); every source
    * token is by construction in the corpus, so p(t) > 0 and every
    * term is finite.
    *
    * Scale shape: one partial-combined (source, token) count is the
    * only pass over corpus-sized data; everything downstream is
    * vocabulary-sized (Heaps' law). The corpus distribution is
    * derived FROM the per-source counts — a second aggregation of the
    * counted frame, not a re-scan — the corpus total attaches as a
    * broadcast 1-row cross join, and the per-term join is an
    * equi-join on the token (AQE splits the hot-token skew, as in
    * [[dLmScore]]). Per-term rounding before the decimal sum keeps
    * the result order-independent and engine-portable. */
  def dKlSources(s: SparkSession, d: String): DataFrame =
    klSources(docs(s, d))

  /** Operator body of [[dKlSources]] over any (source, text) frame —
    * separate so specs can assert KL's defining properties
    * (non-negativity, zero iff the source matches the corpus). */
  def klSources(documents: DataFrame): DataFrame = {
    val srcCnt = documents
      .select(col("source"),
        explode(TextStats.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c_s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val srcTot = srcCnt.groupBy(col("source"))
      .agg(sum(col("c_s")).as("t_s"))
    val corpCnt = srcCnt.groupBy(col("tok")).agg(sum(col("c_s")).as("c"))
    val corpTot = corpCnt.agg(sum(col("c")).as("t"))
    val out = srcCnt.join(corpCnt, "tok").join(srcTot, "source")
      .crossJoin(broadcast(corpTot))
      .select(col("source"), col("t_s"), round(
        (col("c_s").cast("double") / col("t_s")) *
          log((col("c_s").cast("double") / col("t_s")) /
            (col("c").cast("double") / col("t"))), 6).as("term"))
      .groupBy(col("source"))
      .agg(max(col("t_s")).as("n_tok"),
        round(sumDec(col("term")), 6).as("kl"))
      .orderBy("source")
      .localCheckpoint()
    srcCnt.unpersist()
    out
  }

  private val dKlSourcesSql =
    s"""WITH tk AS (SELECT source, unnest(string_split(text, ' '))
       |    AS tok FROM documents),
       |sc AS (SELECT source, tok, count(*) AS c_s FROM tk
       |  GROUP BY 1, 2),
       |st AS (SELECT source, CAST(sum(c_s) AS BIGINT) AS t_s FROM sc
       |  GROUP BY 1),
       |cc AS (SELECT tok, CAST(sum(c_s) AS BIGINT) AS c FROM sc
       |  GROUP BY 1),
       |ct AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM cc),
       |terms AS (SELECT source, t_s,
       |    round((c_s::DOUBLE / t_s) *
       |      ln((c_s::DOUBLE / t_s) / (c::DOUBLE / t)), 6) AS term
       |  FROM sc JOIN cc USING (tok) JOIN st USING (source), ct)
       |SELECT source, max(t_s) AS n_tok,
       |  round(${sqlSumDec("term")}, 6) AS kl
       |FROM terms GROUP BY source ORDER BY source""".stripMargin

  /** Bigram-LM quality score — the conditional-probability upgrade of
    * [[dLmScore]] (the real CCNet filter is a 5-gram Kneser-Ney LM;
    * add-one-smoothed bigrams are the SQL-reproducible stand-in with
    * the same shape): per position, −ln P(tᵢ | tᵢ₋₁) with
    * P = (c₂(tᵢ₋₁ tᵢ) + 1) / (c₁(tᵢ₋₁) + V), averaged per document.
    * Catches locally-incoherent text (right words, wrong order) that
    * a unigram score cannot.
    *
    * Scale shape mirrors [[dLmScore]]: the bigram vocabulary is
    * larger but still corpus-sublinear (Zipf); counts aggregate with
    * partial combine, V and the totals broadcast. The per-bigram
    * score table is assembled vocabulary-side (prefix re-derived from
    * the bigram text, c1 attached by a vocab⋈vocab equi-join), so the
    * corpus-sized frame passes through ONE join-back instead of two —
    * and that join gets the same deterministic hot-key broadcast
    * bypass as [[lmScore]] (LmSkewSpec: AQE does not split this
    * shape's skew). Docs under 2 tokens have no bigrams and are
    * excluded (documented). */
  def dLmBigram(s: SparkSession, d: String): DataFrame =
    lmBigram(docs(s, d))

  /** Operator body of [[dLmBigram]] over any (doc_id, text) frame.
    * `materialize = false` is the plan-inspection mode (see
    * [[lmScore]]). */
  def lmBigram(documents: DataFrame, materialize: Boolean = true,
      hotThreshold: Long = 1L << 20): DataFrame = {
    def cached(df: DataFrame): DataFrame = if (materialize)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else df
    val toksF = documents.select(col("doc_id"),
      TextStats.tokens(col("text")).as("toks"))
    val uni = toksF.select(explode(col("toks")).as("tok"))
    // c1 feeds both the score table and the vocabulary count — persist
    // the (vocabulary-sized) frame so the corpus-wide tokenize +
    // unigram aggregation runs once, not twice
    val c1 = cached(uni.groupBy(col("tok")).agg(count(lit(1)).as("c1")))
    val vocab = c1.agg(count(lit(1)).as("v"))
    val bi = cached(toksF.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("toks")) - 1),
        i => concat(element_at(col("toks"), i), lit(" "),
          element_at(col("toks"), i + 1)))).as("big")))
    val c2 = bi.groupBy(col("big")).agg(count(lit(1)).as("c2"))
    // vocabulary-side score assembly: the prefix IS the bigram's first
    // token (tokens are space-split, so the first space delimits it) —
    // re-deriving it here keeps the prefix join off the corpus-sized
    // frame entirely (bigram-vocab ⋈ unigram-vocab)
    val scoreT = c2
      .withColumn("prefix", substring_index(col("big"), " ", 1))
      .join(c1, col("prefix") === col("tok"))
      .crossJoin(broadcast(vocab))
      .select(col("big"), col("c2"), round(log(
        (col("c1") + col("v")).cast("double") / (col("c2") + lit(1L))),
        6).as("nll_tok"))
    // hot-key bypass, keyed on bigram occurrence count (c2)
    val hotScores = scoreT.filter(col("c2") >= hotThreshold).drop("c2")
    val coldScores = scoreT.filter(col("c2") < hotThreshold).drop("c2")
    val coldBi = bi.join(broadcast(hotScores.select(col("big"))),
      Seq("big"), "left_anti")
    val perBig = bi.join(broadcast(hotScores), "big")
      .unionByName(coldBi.join(coldScores, "big"))
    val joined = perBig
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_big"), avgDec(col("nll_tok")).as("nll2"))
      .orderBy("doc_id")
    if (!materialize) joined
    else {
      val out = joined.localCheckpoint()
      bi.unpersist()
      c1.unpersist()
      out
    }
  }

  private val dLmBigramSql =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
       |  FROM documents),
       |uni AS (SELECT unnest(toks) AS tok FROM t),
       |c1 AS (SELECT tok, count(*) AS c1 FROM uni GROUP BY 1),
       |vv AS (SELECT count(*) AS v FROM c1),
       |b AS (SELECT doc_id,
       |    unnest(list_transform(range(1, len(toks)),
       |      i -> toks[i])) AS prefix,
       |    unnest(list_transform(range(1, len(toks)),
       |      i -> toks[i] || ' ' || toks[i+1])) AS big
       |  FROM t WHERE len(toks) >= 2),
       |c2 AS (SELECT big, count(*) AS c2 FROM b GROUP BY 1)
       |SELECT doc_id, count(*) AS n_big,
       |  ${sqlAvgDec("round(ln((c1 + v)::DOUBLE / (c2 + 1)), 6)")}
       |    AS nll2
       |FROM b JOIN c2 USING (big) JOIN c1 ON b.prefix = c1.tok, vv
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Interpolated Kneser-Ney bigram negative log-likelihood (Kneser &
    * Ney 1995; the smoothing production n-gram LMs actually use, vs
    * [[lmBigram]]'s add-one):
    * `P(w2|w1) = max(c(w1w2)−D, 0)/c(w1·) + D·N1+(w1·)/c(w1·) ·
    * N1+(·w2)/N1+(··)` with discount D = 0.75 (exactly
    * binary-representable). The continuation term scores a word by
    * how many CONTEXTS it follows, not how often it occurs — the
    * "San Francisco" correction: "Francisco" is frequent but occurs
    * after almost nothing else, so its continuation probability is
    * tiny.
    *
    * Scale shape = [[lmBigram]] exactly: every KN component (prefix
    * context counts c(w1·), prefix/suffix type counts N1+, the type
    * total) aggregates over the BIGRAM-TYPE table, which is
    * vocabulary-sized, never corpus-sized; the corpus is touched
    * twice (bigram explode, final per-occurrence score attach keyed
    * by the bigram string) and the same hot-token broadcast bypass
    * splits score rows at `hotThreshold` occurrences so a Zipf-head
    * bigram joins map-side. Per-term NLLs round to 6 before the
    * exact-decimal per-doc average. */
  def dLmKneserNey(s: SparkSession, d: String): DataFrame =
    lmKneserNey(docs(s, d))

  /** Operator body of [[dLmKneserNey]] over any (doc_id, text)
    * frame. */
  def lmKneserNey(documents: DataFrame,
      hotThreshold: Long = 1L << 20): DataFrame = {
    val bi = documents.select(col("doc_id"),
        TextStats.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("toks")) - 1),
        i => concat(element_at(col("toks"), i), lit(" "),
          element_at(col("toks"), i + 1)))).as("big"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the bigram-TYPE table feeds all four component aggregations
    val typ = bi.groupBy(col("big")).agg(count(lit(1)).as("c2"))
      .withColumn("prefix", substring_index(col("big"), " ", 1))
      .withColumn("suffix", substring_index(col("big"), " ", -1))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cp = typ.groupBy(col("prefix"))
      .agg(sum(col("c2")).as("cp"), count(lit(1)).as("n1p"))
    val cs = typ.groupBy(col("suffix")).agg(count(lit(1)).as("n1s"))
    val tt = typ.agg(count(lit(1)).as("t"))
    val scoreT = typ.join(cp, "prefix").join(cs, "suffix")
      .crossJoin(broadcast(tt))
      .select(col("big"), col("c2"), round(-log(
        (col("c2") - lit(0.75)) / col("cp") +
        lit(0.75) * col("n1p") / col("cp") * col("n1s") / col("t")),
        6).as("nll_tok"))
    val hotScores = scoreT.filter(col("c2") >= hotThreshold).drop("c2")
    val coldScores = scoreT.filter(col("c2") < hotThreshold).drop("c2")
    val coldBi = bi.join(broadcast(hotScores.select(col("big"))),
      Seq("big"), "left_anti")
    val perBig = bi.join(broadcast(hotScores), "big")
      .unionByName(coldBi.join(coldScores, "big"))
    val out = perBig
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_big"),
        avgDec(col("nll_tok")).as("nll_kn"))
      .orderBy("doc_id")
      .localCheckpoint()
    typ.unpersist()
    bi.unpersist()
    out
  }

  private val dLmKneserNeySql =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
       |  FROM documents),
       |b AS (SELECT doc_id,
       |    unnest(list_transform(range(1, len(toks)),
       |      i -> toks[i] || ' ' || toks[i+1])) AS big
       |  FROM t WHERE len(toks) >= 2),
       |ty AS (SELECT big, count(*) AS c2,
       |    string_split(big, ' ')[1] AS prefix,
       |    string_split(big, ' ')[2] AS suffix
       |  FROM b GROUP BY 1),
       |cp AS (SELECT prefix, CAST(sum(c2) AS BIGINT) AS cp,
       |    count(*) AS n1p
       |  FROM ty GROUP BY 1),
       |cs AS (SELECT suffix, count(*) AS n1s FROM ty GROUP BY 1),
       |tt AS (SELECT count(*) AS t FROM ty),
       |sc AS (SELECT big, round(-ln(
       |    (c2 - 0.75) / cp + 0.75 * n1p / cp * n1s / t), 6)
       |    AS nll_tok
       |  FROM ty JOIN cp USING (prefix) JOIN cs USING (suffix), tt)
       |SELECT doc_id, count(*) AS n_big,
       |  ${sqlAvgDec("nll_tok")} AS nll_kn
       |FROM b JOIN sc USING (big)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Catalog BPE merge budget — 8 rounds keeps the unrolled oracle
    * CTE chain tractable; production training runs the same per-round
    * cost thousands of times (each round is one vocabulary-sized
    * aggregate + one argmax row, independent of corpus size). */
  private val BpeRounds = 8

  /** Distributed BPE tokenizer training (Sennrich et al. 2016): the
    * 8-round merge table learned from the documents corpus — see
    * [[graft.ext.Bpe]] for the algorithm and the engine-portable
    * string-replace merge formulation. */
  def dBpeTrain(s: SparkSession, d: String): DataFrame =
    graft.ext.Bpe.mergeTable(docs(s, d), BpeRounds)

  /** Per-document BPE tokenization under the merges learned from the
    * same corpus: whitespace word count + post-merge token count.
    * Applying the merges is a literal-replace expression chain — a
    * map-only corpus pass. */
  def dBpeTokens(s: SparkSession, d: String): DataFrame =
    graft.ext.Bpe.tokenStats(docs(s, d), BpeRounds)

  /** [[dBpeTokens]] through the production-merge-count apply path
    * ([[graft.ext.Bpe.tokenStatsFast]]: per-partition memoized
    * compiled local apply instead of a rounds-deep replace chain) —
    * registered against the SAME unrolled-CTE oracle, so the kernel
    * is hash-verified, not just spec-verified. */
  def dBpeTokensFast(s: SparkSession, d: String): DataFrame = {
    val dd = docs(s, d)
    graft.ext.Bpe.tokenStatsFast(dd,
      graft.ext.Bpe.trainMerges(dd, BpeRounds))
  }

  /** Greedy longest-match subword tokenization
    * ([[graft.ext.Wordpiece]]) — the WordPiece-family single-pass
    * apply, a deliberately DIFFERENT tokenizer family from the BPE
    * pair (BPE replays ranked merges; this maximizes the current
    * piece). Vocab = top-512 corpus substrings (len 2..8) by summed
    * word-type frequency; single-char fallback, no UNK. The oracle
    * replays the greedy walk as a recursive CTE with a correlated
    * longest-prefix subquery — per-word piece counts then fold back
    * per doc through a LEFT join so empty docs keep (0, 0). */
  def dSubwordGreedy(s: SparkSession, d: String): DataFrame =
    graft.ext.Wordpiece.tokenStats(docs(s, d))

  private val dSubwordGreedySql =
    """WITH RECURSIVE wt AS (SELECT w, count(*) AS cnt FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE len(w) > 0 GROUP BY w),
      |sub AS (SELECT cnt, unnest(list_distinct(flatten(
      |    list_transform(range(1, len(w) + 1), i ->
      |      list_filter(list_transform(range(2, 9), l ->
      |        CASE WHEN i + l - 1 <= len(w)
      |          THEN substr(w, i, l) END),
      |        p -> p IS NOT NULL))))) AS piece
      |  FROM wt),
      |voc AS (SELECT piece FROM (
      |    SELECT piece, sum(cnt) AS total FROM sub GROUP BY piece
      |    ORDER BY total DESC, piece ASC LIMIT 512)),
      |g(w, pos, n) AS (
      |  SELECT w, 1, 0 FROM wt
      |  UNION ALL
      |  SELECT g.w,
      |    g.pos + coalesce((SELECT max(len(v.piece)) FROM voc v
      |      WHERE len(v.piece) <= len(g.w) - g.pos + 1
      |        AND v.piece = substr(g.w, g.pos, len(v.piece))), 1),
      |    g.n + 1
      |  FROM g WHERE g.pos <= len(g.w)),
      |pieces AS (SELECT w, max(n) AS n_p FROM g GROUP BY w),
      |dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |per_doc AS (SELECT doc_id,
      |    CAST(count(*) AS BIGINT) AS n_words,
      |    CAST(sum(p.n_p) AS BIGINT) AS n_pieces
      |  FROM (SELECT doc_id, w FROM dw WHERE len(w) > 0) d
      |  JOIN pieces p ON d.w = p.w
      |  GROUP BY doc_id)
      |SELECT doc.doc_id,
      |  coalesce(x.n_words, 0) AS n_words,
      |  coalesce(x.n_pieces, 0) AS n_pieces
      |FROM documents doc LEFT JOIN per_doc x ON doc.doc_id = x.doc_id
      |ORDER BY doc.doc_id""".stripMargin

  /** Unigram-LM subword tokenizer ([[graft.ext.Unigram]], Kudo 2018 —
    * the SentencePiece estimator), completing the tokenizer family
    * alongside BPE (ranked-merge replay) and WordPiece-style greedy
    * longest-match: substring-seeded piece log-probs, one hard-EM
    * re-estimation (Viterbi-segment every word type, recount by
    * usage, add-one re-score), canonical Viterbi under integer
    * MICRO-UNIT scores — one floating rounding per piece, then every
    * DP comparison is exact integer arithmetic, so Spark's
    * right-to-left Viterbi and the oracle's brute-force path
    * enumeration (ORDER BY score DESC, n ASC, lens DESC — the same
    * canonical tie-break) provably select identical segmentations.
    * `d_unigram_train` is the trained tokenizer AS A TABLE (per-type
    * segmentation + score); `d_unigram_tokens` the per-doc apply. */
  def dUnigramTrain(s: SparkSession, d: String): DataFrame =
    graft.ext.Unigram.train(docs(s, d))

  def dUnigramTokens(s: SparkSession, d: String): DataFrame =
    graft.ext.Unigram.tokenStats(docs(s, d))

  /** Shared oracle body for the unigram tokenizer (catalog
    * parameterization: vocab 256, piece len ≤ 8, word len ≤ 16, one
    * EM round). Ends with CTEs `types` and `best1` (per-type
    * canonical segmentation under the EM-refined scores). Scores
    * mirror `Unigram.microScores` exactly: floor(ln(c/total)·1e6 +
    * 0.5) — Java's Math.round, NOT SQL round (they differ on
    * negative halves). `v1` is DISTINCT-over-UNION-ALL rather than
    * UNION: DuckDB 1.0.0 fails to dedup unnest(string_split(...))-
    * derived strings against plain strings across UNION sides
    * (reproduced minimally; the miscount silently shifted the
    * add-one total by |usage ∩ chars|). */
  private def unigramViterbiSql(vposCte: String, scoresCte: String,
      rCte: String, bestCte: String): String =
    s"""$vposCte AS (SELECT t.w, CAST(i.range AS INT) AS pos, s.piece,
       |    CAST(len(s.piece) AS INT) AS l, s.iscore
       |  FROM types t CROSS JOIN range(0, 16) i
       |  JOIN $scoresCte s ON i.range < len(t.w)
       |    AND s.piece = substr(t.w, CAST(i.range AS INT) + 1,
       |      len(s.piece))),
       |$rCte AS (
       |  SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS score, 0 AS n,
       |    '' AS lens, '' AS toks FROM types
       |  UNION ALL
       |  SELECT r.w, r.pos + v.l, r.score + v.iscore, r.n + 1,
       |    r.lens || chr(CAST(48 + v.l AS INT)),
       |    CASE WHEN r.n = 0 THEN v.piece
       |         ELSE r.toks || ' ' || v.piece END
       |  FROM $rCte r JOIN $vposCte v ON v.w = r.w AND v.pos = r.pos),
       |$bestCte AS (SELECT w, toks, n, score FROM (
       |    SELECT r.*, row_number() OVER (PARTITION BY w
       |      ORDER BY score DESC, n ASC, lens DESC) AS rn
       |    FROM $rCte r WHERE pos = len(w)) WHERE rn = 1)""".stripMargin

  private val unigramCoreSql =
    s"""types AS (SELECT w, count(*) AS cnt FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) > 0 AND len(w) <= 16 GROUP BY w),
       |occ AS (SELECT piece, sum(cnt) AS pcnt FROM (
       |    SELECT cnt, unnest(flatten(
       |      list_transform(range(1, len(w) + 1), i ->
       |        list_filter(list_transform(range(1, 9), l ->
       |          CASE WHEN i + l - 1 <= len(w)
       |            THEN substr(w, i, l) END),
       |          p -> p IS NOT NULL)))) AS piece
       |    FROM types)
       |  GROUP BY piece),
       |chars AS (SELECT piece, pcnt FROM occ WHERE len(piece) = 1),
       |multi AS (SELECT piece, pcnt FROM occ WHERE len(piece) > 1
       |  ORDER BY pcnt DESC, piece ASC
       |  LIMIT (256 - (SELECT count(*) FROM chars))),
       |v0 AS (SELECT * FROM chars UNION ALL SELECT * FROM multi),
       |s0 AS (SELECT piece, CAST(floor(
       |    ln(CAST(pcnt AS DOUBLE) /
       |      (SELECT CAST(sum(pcnt) AS DOUBLE) FROM v0)) * 1e6 + 0.5)
       |    AS BIGINT) AS iscore FROM v0),
       |${unigramViterbiSql("vpos0", "s0", "r0", "best0")},
       |usage AS (SELECT piece, sum(cnt) AS u FROM (
       |    SELECT t.cnt, unnest(string_split(b.toks, ' ')) AS piece
       |    FROM best0 b JOIN types t ON t.w = b.w)
       |  GROUP BY piece),
       |v1 AS (SELECT DISTINCT piece FROM (
       |  SELECT piece FROM usage
       |  UNION ALL SELECT piece FROM chars)),
       |s1 AS (SELECT v1.piece, CAST(floor(
       |    ln(CAST(coalesce(u.u, 0) + 1 AS DOUBLE) /
       |      ((SELECT CAST(sum(u) AS DOUBLE) FROM usage) +
       |       (SELECT count(*) FROM v1))) * 1e6 + 0.5)
       |    AS BIGINT) AS iscore
       |  FROM v1 LEFT JOIN usage u ON v1.piece = u.piece),
       |${unigramViterbiSql("vpos1", "s1", "r1", "best1")}""".stripMargin

  private val dUnigramTrainSql =
    s"""WITH RECURSIVE $unigramCoreSql
       |SELECT t.w, t.cnt, b.n AS n_pieces, b.toks AS pieces,
       |  b.score AS iscore
       |FROM best1 b JOIN types t ON t.w = b.w ORDER BY t.w""".stripMargin

  private val dUnigramTokensSql =
    s"""WITH RECURSIVE $unigramCoreSql,
       |dw AS (SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |    FROM documents) WHERE len(w) > 0),
       |per_doc AS (SELECT doc_id,
       |    CAST(count(*) AS BIGINT) AS n_words,
       |    CAST(coalesce(sum(CASE WHEN len(dw.w) <= 16
       |      THEN b.n ELSE 0 END), 0) AS BIGINT) AS n_pieces,
       |    CAST(count(*) FILTER (len(dw.w) > 16) AS BIGINT) AS n_long,
       |    CAST(coalesce(sum(CASE WHEN len(dw.w) <= 16
       |      THEN b.score ELSE 0 END), 0) AS BIGINT) AS iscore
       |  FROM dw LEFT JOIN best1 b ON b.w = dw.w
       |  GROUP BY doc_id)
       |SELECT d.doc_id,
       |  coalesce(x.n_words, 0) AS n_words,
       |  coalesce(x.n_pieces, 0) AS n_pieces,
       |  coalesce(x.n_long, 0) AS n_long,
       |  coalesce(x.iscore, 0) AS iscore
       |FROM documents d LEFT JOIN per_doc x ON d.doc_id = x.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Cross-tokenizer fertility eval: the three trained tokenizer
    * families ([[graft.ext.Bpe]] ranked-merge replay,
    * [[graft.ext.Wordpiece]] greedy longest-match,
    * [[graft.ext.Unigram]] Viterbi max-likelihood) applied to the SAME
    * corpus, aggregated per source — fertility (pieces/word) per
    * (tokenizer, source) is the standard "which tokenizer fits this
    * corpus mix" table a data-curation pass produces before committing
    * a vocabulary (per-source because that is the mixing decision's
    * grain). Each leg reuses its production fit+apply unchanged; the
    * per-doc join to `source` keys on doc_id and the final aggregate
    * is bounded by sources × tokenizers. The oracle embeds all three
    * families' full SQL derivations as derived tables — the combined
    * entry hash-verifies the CROSS-family comparison, not just each
    * family alone. */
  def dTokenizerEval(s: SparkSession, d: String): DataFrame = {
    val dd = docs(s, d)
    val src = dd.select(col("doc_id"), col("source"))
    def leg(name: String, stats: DataFrame, pieces: Column): DataFrame =
      stats.join(src, "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("n_words"),
          sum(pieces).as("n_pieces"))
        .select(lit(name).as("tokenizer"), col("source"),
          col("n_docs"), col("n_words"), col("n_pieces"),
          round(col("n_pieces").cast("double") / col("n_words"), 6)
            .as("fertility"))
    // all three fits start from the SAME (w, cnt) corpus word-count
    // aggregate (the legs share the word-counting rule by contract —
    // TokenizerSpec asserts it); compute it once and feed the
    // `...FromCounts` fit forms (r16; guide §5). The fits all finish
    // eagerly inside the leg constructors (merge collect / vocab
    // collect / EM collects) and the apply passes never touch the
    // frame, so it releases right here.
    val wc = graft.ext.Bpe.wordCounts(dd)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out =
      leg("bpe", graft.ext.Bpe.tokenStatsFromCounts(dd, Some(wc),
          BpeRounds), col("n_bpe"))
        .unionByName(
          leg("greedy", graft.ext.Wordpiece.tokenStatsFromCounts(dd,
            Some(wc)), col("n_pieces")))
        .unionByName(
          leg("unigram", graft.ext.Unigram.tokenStatsFromCounts(dd,
            Some(wc)), col("n_pieces")))
        .orderBy("tokenizer", "source")
    wc.unpersist()
    out
  }

  private def dTokenizerEvalSql: String = {
    def leg(name: String, stmt: String, pieces: String): String =
      s"""SELECT '$name' AS tokenizer, d.source,
         |  count(*) AS n_docs,
         |  CAST(sum(x.n_words) AS BIGINT) AS n_words,
         |  CAST(sum(x.$pieces) AS BIGINT) AS n_pieces,
         |  round(CAST(sum(x.$pieces) AS DOUBLE) / sum(x.n_words), 6)
         |    AS fertility
         |FROM ($stmt) x JOIN documents d USING (doc_id)
         |GROUP BY 2""".stripMargin
    leg("bpe", graft.ext.Bpe.tokenStatsSql(BpeRounds), "n_bpe") +
      "\nUNION ALL\n" +
      leg("greedy", dSubwordGreedySql, "n_pieces") +
      "\nUNION ALL\n" +
      leg("unigram", dUnigramTokensSql, "n_pieces") +
      "\nORDER BY tokenizer, source"
  }

  /** Top principal component of the embedding corpus by distributed
    * power iteration — the anisotropy diagnostic; see
    * [[graft.ext.Pca]] for the matrix-sized-shuffle scale shape. */
  def dEmbedPca(s: SparkSession, d: String): DataFrame =
    graft.ext.Pca.topComponent(embs(s, d))

  /** All-but-the-Top correction: per-vector pc1 coefficient and
    * norm before/after removing mean + dominant direction. */
  def dEmbedAbtt(s: SparkSession, d: String): DataFrame =
    graft.ext.Pca.allButTop(embs(s, d))

  /** Top-2 principal components by Hotelling deflation, with the
    * cumulative subspace explained-variance ratio. */
  def dEmbedPca2(s: SparkSession, d: String): DataFrame =
    graft.ext.Pca.topComponents2(embs(s, d))

  /** Greedy (next-fit) sample packing: per source, documents in
    * doc_id order are placed whole into 128-token bins — a document
    * that would overflow the current bin starts a new one (an
    * oversized document gets a bin to itself). Unlike [[dPack]]'s
    * concatenate-and-cut, no document spans a bin boundary, which is
    * what instruction-tuning loaders want. The running-fill state is
    * inherently sequential WITHIN a source, so the scalable unit is
    * the stratum: `groupByKey(source).flatMapSortedGroups` shuffles
    * only (source, doc_id, n_tok) — never text — and each source
    * packs independently in one pass over its sorted group. The
    * DuckDB oracle is a recursive CTE carrying the same
    * (bin, fill) state. */
  def dPackGreedy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cap = 128L
    val toks = docs(s, d)
      .select(col("source"), col("doc_id"),
        size(TextStats.tokens(col("text"))).cast("long").as("n_tok"))
      .as[(String, Long, Long)]
    toks.groupByKey(_._1)
      .flatMapSortedGroups(col("doc_id")) { (src, it) =>
        var bin = 0L
        var fill = 0L
        it.map { case (_, id, n) =>
          if (fill > 0L && fill + n > cap) { bin += 1L; fill = 0L }
          fill += n
          (id, src, n, bin)
        }
      }
      .toDF("doc_id", "source", "n_tok", "bin_idx")
      .orderBy("doc_id")
  }

  private val dPackGreedySql =
    """WITH RECURSIVE t AS (SELECT source, doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |    row_number() OVER (PARTITION BY source ORDER BY doc_id)
      |      AS rn
      |  FROM documents),
      |r AS (
      |  SELECT source, doc_id, n_tok, rn,
      |    CAST(0 AS BIGINT) AS bin_idx, n_tok AS fill
      |  FROM t WHERE rn = 1
      |  UNION ALL
      |  SELECT t.source, t.doc_id, t.n_tok, t.rn,
      |    CASE WHEN r.fill + t.n_tok > 128 THEN r.bin_idx + 1
      |         ELSE r.bin_idx END,
      |    CASE WHEN r.fill + t.n_tok > 128 THEN t.n_tok
      |         ELSE r.fill + t.n_tok END
      |  FROM r JOIN t ON t.source = r.source AND t.rn = r.rn + 1)
      |SELECT doc_id, source, n_tok, bin_idx
      |FROM r ORDER BY doc_id""".stripMargin

  /** PII redaction: the corpus text is deterministically augmented
    * with synthetic contact strings (the testdata itself carries no
    * PII — injection makes the scrub observable and the oracle able
    * to reproduce it), then emails / IPv4s / phone numbers are
    * counted and replaced with typed placeholder tags. A pure
    * projection: no shuffle, no UDF — `regexp_extract_all` +
    * `regexp_replace` are codegen'd built-ins, and the patterns stay
    * inside the RE2 ∩ java.util.regex common subset (character
    * classes, bounded repeats, `\b`; no lookaround) so both engines
    * match identically. Redaction order (email → ip → phone) is part
    * of the contract. */
  def dPiiRedact(s: SparkSession, d: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    val phone = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
    val id = col("doc_id")
    val aug = concat(col("text"),
      when(pmod(id, lit(2)) === 0,
        concat(lit(" reach user"), id.cast("string"),
          lit("@example.com"))).otherwise(lit("")),
      when(pmod(id, lit(3)) === 0,
        concat(lit(" call 555-"),
          lpad(pmod(id, lit(1000)).cast("string"), 3, "0"), lit("-"),
          lpad(pmod(id, lit(10000)).cast("string"), 4, "0")))
        .otherwise(lit("")),
      lit(" from 10."), pmod(id, lit(200)).cast("string"), lit(".0.7"))
    docs(s, d)
      .withColumn("_aug", aug)
      .select(col("doc_id"),
        size(regexp_extract_all(col("_aug"), lit(email), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("_aug"), lit(phone), lit(0)))
          .cast("long").as("n_phones"),
        size(regexp_extract_all(col("_aug"), lit(ip), lit(0)))
          .cast("long").as("n_ips"),
        regexp_replace(regexp_replace(regexp_replace(col("_aug"),
          lit(email), lit("<EMAIL>")),
          lit(ip), lit("<IP>")),
          lit(phone), lit("<PHONE>")).as("redacted"))
      .orderBy("doc_id")
  }

  private val dPiiRedactSql =
    """WITH t AS (SELECT doc_id, text ||
      |    CASE WHEN doc_id % 2 = 0 THEN ' reach user' || doc_id ||
      |      '@example.com' ELSE '' END ||
      |    CASE WHEN doc_id % 3 = 0 THEN ' call 555-' ||
      |      lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
      |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |      ELSE '' END ||
      |    ' from 10.' || (doc_id % 200) || '.0.7' AS aug
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(aug,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
      |    AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(aug,
      |    '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS BIGINT) AS n_phones,
      |  CAST(len(regexp_extract_all(aug,
      |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
      |    AS BIGINT) AS n_ips,
      |  regexp_replace(regexp_replace(regexp_replace(aug,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
      |    '<EMAIL>', 'g'),
      |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
      |    '<IP>', 'g'),
      |    '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g')
      |    AS redacted
      |FROM t ORDER BY doc_id""".stripMargin

  /** Weighted source mixing (epoch upsampling): each source gets a
    * deterministic weight in eighths (1.0×–2.875×, keyed off the
    * portable source hash); every document is repeated floor(w)
    * times plus one more for the hash-selected fraction — the
    * standard way to over-represent high-quality sources in a
    * training mix without RNG state (reproducible across runs,
    * engines, and retries). A narrow explode: no shuffle, output
    * rows ≈ Σ weights, and the copy decision is per-row arithmetic
    * on the already-computed hashes. */
  def dMixSources(s: SparkSession, d: String): DataFrame = {
    val srcHash = graft.functions.RollingHash.rolling_hash(col("source"))
    val docHash = graft.functions.RollingHash.rolling_hash(
      col("doc_id").cast("string"))
    docs(s, d)
      .withColumn("w8", (lit(8) + pmod(srcHash, lit(16))).cast("long"))
      .withColumn("n_copies", floor(col("w8") / 8) +
        when(pmod(docHash, lit(8)) < pmod(col("w8"), lit(8)), 1L)
          .otherwise(0L))
      .select(col("doc_id"), col("source"), col("n_copies"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy_idx"))
      .orderBy("doc_id", "copy_idx")
  }

  private val dMixSourcesSql =
    s"""WITH t AS (SELECT doc_id, source,
       |    ${sqlPolyHash("CAST(doc_id AS VARCHAR)")} AS dh,
       |    ${sqlPolyHash("source")} AS sh
       |  FROM documents),
       |c AS (SELECT doc_id, source,
       |    CAST(8 + sh % 16 AS BIGINT) AS w8, dh FROM t),
       |n AS (SELECT doc_id, source,
       |    CAST(w8 // 8 +
       |      CASE WHEN dh % 8 < w8 % 8 THEN 1 ELSE 0 END
       |      AS BIGINT) AS n_copies
       |  FROM c)
       |SELECT doc_id, source, n_copies,
       |  CAST(unnest(range(1, n_copies + 1)) AS BIGINT) AS copy_idx
       |FROM n ORDER BY doc_id, copy_idx""".stripMargin

  // -------------------------------------------------------------------
  val queries: Map[String, Q] = Map(
    "d_dedup_exact" -> (dDedupExact _),
    "d_incremental_dedup" -> (dIncrementalDedup _),
    "d_snapshot_diff" -> (dSnapshotDiff _),
    "d_incremental_minhash" -> (dIncrementalMinhash _),
    "d_jaccard_pairs" -> (dJaccardPairs _),
    "d_jaccard_prefix" -> (dJaccardPrefix _),
    "d_containment" -> (dContainment _),
    "d_containment_auto" -> (dContainmentAuto _),
    "d_minhash_lsh" -> (dMinhashLsh _),
    "d_bm25" -> (dBm25 _),
    "d_phrase_search" -> (dPhraseSearch _),
    "d_phrase_search_sampled" -> (dPhraseSearchSampled _),
    "d_phrase_index_scan" -> (dPhraseIndexScan _),
    "d_phrase_index_auto" -> (dPhraseIndexAuto _),
    "s_hybrid_rrf" -> (sHybridRrf _),
    "s_hybrid_rrf_ivf" -> (sHybridRrfIvf _),
    "d_dedup_recall" -> (dDedupRecall _),
    "d_neardup_pipeline" -> (dNeardupPipeline _),
    "d_corpus_card" -> (dCorpusCard _),
    "g_doc_centrality" -> (gDocCentrality _),
    "g_triangles" -> (gTriangles _),
    "d_simhash" -> (dSimhash _),
    "d_text_stats" -> (dTextStats _),
    "d_langid" -> (dLangId _),
    "d_fingerprint" -> (dFingerprint _),
    "d_winnowing" -> (dWinnowing _),
    "s_ann_brute" -> (sAnnBrute _),
    "s_kcenter" -> (sKcenter _),
    "s_ann_mips" -> (sAnnMips _),
    "s_ann_int8" -> (sAnnInt8 _),
    "s_ann_lsh" -> (sAnnLsh _),
    "s_ann_lsh_mp" -> (sAnnLshMp _),
    "s_ann_ivf" -> (sAnnIvf _),
    "s_ann_filtered" -> (sAnnFiltered _),
    "s_ann_filtered_auto" -> (sAnnFilteredAuto _),
    "s_ann_incremental" -> (sAnnIncremental _),
    "s_ann_incremental_sqrt" -> (sAnnIncrementalSqrt _),
    "s_ann_ivf_int8" -> (sAnnIvfInt8 _),
    "s_ann_rerank" -> (sAnnRerank _),
    "s_ann_ivf_kmeans" -> (sAnnIvfKmeans _),
    "s_ann_ivf_two_level" -> (sAnnIvfTwoLevel _),
    "s_ann_pq" -> (sAnnPq _),
    "s_ann_pq_sampled" -> (sAnnPqSampled _),
    "s_ann_pq_balanced" -> (sAnnPqBalanced _),
    "s_ann_pq_opq" -> (sAnnPqOpq _),
    "d_embed_cov" -> (dEmbedCov _),
    "s_ann_ivf_pq" -> (sAnnIvfPq _),
    "s_ann_ivf_pq_sampled" -> (sAnnIvfPqSampled _),
    "s_ann_ivf_pq_res" -> (sAnnIvfPqRes _),
    "s_ann_ivf_pq_resbal" -> (sAnnIvfPqResBal _),
    "s_ann_ivf_pq_opq_res" -> (sAnnIvfPqOpqRes _),
    "s_ann_ivf_pq_opq_res_sampled" -> (sAnnIvfPqOpqResSampled _),
    "s_ann_filtered_pq" -> (sAnnFilteredPq _),
    "s_ann_filtered_pq_auto" -> (sAnnFilteredPqAuto _),
    "s_ann_index_scan" -> (sAnnIndexScan _),
    "s_ann_index_append" -> (sAnnIndexAppend _),
    "d_embed_dups" -> (dEmbedDups _),
    "d_embed_decontaminate" -> (dEmbedDecontaminate _),
    "d_embed_dups_auto" -> (dEmbedDupsAuto _),
    "d_curation_pipeline" -> (dCurationPipeline _),
    "d_dup_clusters" -> (dDupClusters _),
    "d_dedup_keep_best" -> (dDedupKeepBest _),
    "d_ccnet_buckets" -> (dCcnetBuckets _),
    "d_gopher_rules" -> (dGopherRules _),
    "d_mad_filter" -> (dMadFilter _),
    "d_filter_stack" -> (dFilterStack _),
    "d_quality_lr" -> (dQualityLr _),
    "d_quality_calibration" -> (dQualityCalibration _),
    "d_quality_threshold" -> (dQualityThreshold _),
    "d_repetition_break" -> (dRepetitionBreak _),
    "d_stratified_sample" -> (dStratifiedSample _),
    "d_priority_sample" -> (dPrioritySample _),
    "d_token_budget" -> (dTokenBudget _),
    "d_chunking" -> (dChunking _),
    "d_pack" -> (dPack _),
    "d_top_tokens" -> (dTopTokens _),
    "d_collocations" -> (dCollocations _),
    "d_tfidf" -> (dTfidf _),
    "d_decontaminate" -> (dDecontaminate _),
    "d_span_dedup" -> (dSpanDedup _),
    "d_span_cut" -> (dSpanCut _),
    "d_lm_score" -> (dLmScore _),
    "d_lm_bigram" -> (dLmBigram _),
    "d_lm_kn" -> (dLmKneserNey _),
    "d_bpe_train" -> (dBpeTrain _),
    "d_bpe_tokens" -> (dBpeTokens _),
    "d_bpe_tokens_fast" -> (dBpeTokensFast _),
    "d_subword_greedy" -> (dSubwordGreedy _),
    "d_unigram_train" -> (dUnigramTrain _),
    "d_unigram_tokens" -> (dUnigramTokens _),
    "d_tokenizer_eval" -> (dTokenizerEval _),
    "d_embed_pca" -> (dEmbedPca _),
    "d_embed_abtt" -> (dEmbedAbtt _),
    "d_embed_pca2" -> (dEmbedPca2 _),
    "d_dsir" -> (dDsir _),
    "d_semdedup" -> (dSemdedup _),
    "d_semdedup_auto" -> (dSemdedupAuto _),
    "d_semdedup_sampled" -> (dSemdedupSampled _),
    "d_semdedup_hier" -> (dSemdedupHier _),
    "d_semdedup_hier_sampled" -> (dSemdedupHierSampled _),
    "d_semdedup_incremental" -> (dSemdedupIncremental _),
    "d_chunk_dedup" -> (dChunkDedup _),
    "d_kl_sources" -> (dKlSources _),
    "s_ann_recall" -> (sAnnRecall _),
    "s_hard_negatives" -> (sHardNegatives _),
    "s_hard_negatives_ivf" -> (sHardNegativesIvf _),
    "d_pack_greedy" -> (dPackGreedy _),
    "d_pii_redact" -> (dPiiRedact _),
    "d_mix_sources" -> (dMixSources _),
    "m_binary_meta" -> (mBinaryMeta _),
    "m_media_decode" -> (mMediaDecode _),
    "m_frame_sample" -> (mFrameSample _),
    "m_mp4_demux" -> (mMp4Demux _),
    "m_frame_decode" -> (mFrameDecode _),
    "m_features" -> (mFeatures _),
    "m_resize" -> (mResize _),
    "m_phash_dups" -> (mPhashDups _),
  )

  val oracle: Map[String, String] = Map(
    "d_dedup_exact" -> dDedupExactSql,
    "d_incremental_dedup" -> dIncrementalDedupSql,
    "d_snapshot_diff" -> dSnapshotDiffSql,
    "d_incremental_minhash" -> dIncrementalMinhashSql,
    "d_jaccard_pairs" -> dJaccardPairsSql,
    "d_jaccard_prefix" -> dJaccardPrefixSql,
    "d_containment" -> dContainmentSql,
    "d_containment_auto" -> dContainmentAutoSql,
    "d_minhash_lsh" -> dMinhashLshSql,
    "d_bm25" -> dBm25Sql,
    "d_phrase_search" -> dPhraseSearchSql,
    "d_phrase_search_sampled" -> dPhraseSearchSampledSql,
    // the persisted-index probe answers the sampled entry's question
    // from a different physical layout — same oracle by design
    "d_phrase_index_scan" -> dPhraseSearchSampledSql,
    "d_phrase_index_auto" -> dPhraseIndexAutoSql,
    "s_hybrid_rrf" -> sHybridRrfSql,
    "s_hybrid_rrf_ivf" -> sHybridRrfIvfSql,
    "d_dedup_recall" -> dDedupRecallSql,
    "d_neardup_pipeline" -> dNeardupPipelineSql,
    "d_corpus_card" -> dCorpusCardSql,
    "g_doc_centrality" -> gDocCentralitySql,
    "g_triangles" -> gTrianglesSql,
    "d_simhash" -> dSimhashSql,
    "d_text_stats" -> dTextStatsSql,
    "d_langid" -> dLangIdSql,
    "d_fingerprint" -> dFingerprintSql,
    "d_winnowing" -> dWinnowingSql,
    "d_curation_pipeline" -> dCurationPipelineSql,
    "d_dup_clusters" -> dDupClustersSql,
    "d_dedup_keep_best" -> dDedupKeepBestSql,
    "d_ccnet_buckets" -> dCcnetBucketsSql,
    "d_gopher_rules" -> dGopherRulesSql,
    "d_mad_filter" -> dMadFilterSql,
    "d_filter_stack" -> dFilterStackSql,
    "d_quality_lr" -> dQualityLrSql,
    "d_quality_calibration" -> dQualityCalibrationSql,
    "d_quality_threshold" -> dQualityThresholdSql,
    "d_repetition_break" -> dRepetitionBreakSql,
    "d_stratified_sample" -> dStratifiedSampleSql,
    "d_priority_sample" -> dPrioritySampleSql,
    "d_token_budget" -> dTokenBudgetSql,
    "d_chunking" -> dChunkingSql,
    "d_pack" -> dPackSql,
    "d_top_tokens" -> dTopTokensSql,
    "d_collocations" -> dCollocationsSql,
    "d_tfidf" -> dTfidfSql,
    "d_decontaminate" -> dDecontaminateSql,
    "d_span_dedup" -> dSpanDedupSql,
    "d_span_cut" -> dSpanCutSql,
    "d_lm_score" -> dLmScoreSql,
    "d_lm_bigram" -> dLmBigramSql,
    "d_lm_kn" -> dLmKneserNeySql,
    "d_bpe_train" -> graft.ext.Bpe.mergeTableSql(BpeRounds),
    "d_bpe_tokens" -> graft.ext.Bpe.tokenStatsSql(BpeRounds),
    "d_bpe_tokens_fast" -> graft.ext.Bpe.tokenStatsSql(BpeRounds),
    "d_subword_greedy" -> dSubwordGreedySql,
    "d_unigram_train" -> dUnigramTrainSql,
    "d_unigram_tokens" -> dUnigramTokensSql,
    "d_tokenizer_eval" -> dTokenizerEvalSql,
    "d_embed_pca" -> graft.ext.Pca.topComponentSql(),
    "d_embed_abtt" -> graft.ext.Pca.allButTopSql(),
    "d_embed_pca2" -> graft.ext.Pca.topComponents2Sql(),
    "d_dsir" -> dDsirSql,
    "d_semdedup" -> dSemdedupSql,
    "d_semdedup_auto" -> dSemdedupAutoSql,
    "d_semdedup_sampled" -> dSemdedupSampledSql,
    "d_semdedup_hier" -> dSemdedupHierSql,
    "d_semdedup_hier_sampled" -> dSemdedupHierSampledSql,
    "d_semdedup_incremental" -> dSemdedupIncrementalSql,
    "d_chunk_dedup" -> dChunkDedupSql,
    "d_kl_sources" -> dKlSourcesSql,
    "s_ann_recall" -> sAnnRecallSql,
    "s_hard_negatives" -> sHardNegativesSql,
    "s_hard_negatives_ivf" -> sHardNegativesIvfSql,
    "d_pack_greedy" -> dPackGreedySql,
    "d_pii_redact" -> dPiiRedactSql,
    "d_mix_sources" -> dMixSourcesSql,
    "s_ann_brute" -> sAnnBruteSql,
    "s_kcenter" -> sKcenterSql(8),
    "s_ann_mips" -> sAnnMipsSql,
    "s_ann_int8" -> sAnnInt8Sql,
    "s_ann_lsh" -> sAnnLshSql,
    "s_ann_lsh_mp" -> sAnnLshMpSql,
    "s_ann_ivf" -> sAnnIvfSql,
    "s_ann_filtered" -> sAnnFilteredSql,
    "s_ann_filtered_auto" -> sAnnFilteredAutoSql,
    "s_ann_incremental" -> sAnnIncrementalSql,
    "s_ann_incremental_sqrt" -> sAnnIncrementalSqrtSql,
    "s_ann_ivf_int8" -> sAnnIvfInt8Sql,
    "s_ann_rerank" -> sAnnRerankSql,
    "s_ann_ivf_kmeans" -> sAnnIvfKmeansSql,
    "s_ann_ivf_two_level" -> sAnnIvfTwoLevelSql,
    "s_ann_pq" -> sAnnPqSql,
    "s_ann_pq_sampled" -> sAnnPqSampledSql,
    "s_ann_pq_balanced" -> sAnnPqBalancedSql,
    // s_ann_pq_opq's oracle lives in dynamicOracle (plan-literal
    // rotation, built at dump time)
    "d_embed_cov" -> dEmbedCovSql,
    "s_ann_ivf_pq" -> sAnnIvfPqSql,
    "s_ann_ivf_pq_sampled" -> sAnnIvfPqSampledSql,
    "s_ann_ivf_pq_res" -> sAnnIvfPqResSql,
    "s_ann_ivf_pq_resbal" -> sAnnIvfPqResBalSql,
    // s_ann_ivf_pq_opq_res's oracle lives in dynamicOracle
    // (plan-literal rotation, dumped after the query runs)
    "s_ann_filtered_pq" -> sAnnFilteredPqSql,
    "s_ann_filtered_pq_auto" -> sAnnFilteredPqAutoSql,
    // the stored-index probe must equal the inline sampled
    // composition — the layout can never change results
    "s_ann_index_scan" -> sAnnIvfPqSampledSql,
    "s_ann_index_append" -> sAnnIndexAppendSql,
    "d_embed_dups" -> dEmbedDupsSql,
    "d_embed_dups_auto" -> dEmbedDupsAutoSql,
    "d_embed_decontaminate" -> dEmbedDecontaminateSql,
    "m_binary_meta" -> mBinaryMetaSql,
    "m_media_decode" -> mMediaDecodeSql,
    "m_frame_sample" -> mFrameSampleSql,
    "m_mp4_demux" -> mMp4DemuxSql,
    "m_frame_decode" -> mFrameDecodeSql,
    "m_features" -> mFeaturesSql,
    "m_resize" -> mResizeSql,
    "m_phash_dups" -> mPhashDupsSql,
  )
}
