package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed byte-pair-encoding tokenizer training + application
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
  * with Subword Units") — the tokenizer-fitting step of a training-
  * data pipeline, formulated the way the original algorithm is:
  * merge statistics come from the WORD-TYPE table (word → corpus
  * frequency), which is vocabulary-sized, never corpus-sized, so
  * each merge round is a small aggregate no matter how large the
  * corpus. The corpus itself is scanned exactly once (word
  * counting); applying the learned merges back to documents is a
  * pure per-row expression chain (zero shuffle).
  *
  * Symbol-sequence representation: a word's working state is a
  * string of symbols separated by TWO spaces, with one leading and
  * one trailing space (`" h  e  y  </w> "`). A merge of pair (l, r)
  * is then EXACTLY `replace(sym, " l  r ", " lr ")`: literal
  * `replace` scans left-to-right, resumes after each replacement,
  * and never matches across symbol boundaries (symbols contain no
  * spaces; the pattern's border spaces can only align with separator
  * space). That is precisely BPE's greedy non-overlapping left-to-
  * right merge — and Spark's `StringReplace`, DuckDB's `replace`,
  * and the reference implementation's `re.sub` all share it, which
  * is what makes the whole training loop hash-verifiable against a
  * SQL oracle (unrolled CTE rounds, the k-means-oracle technique).
  * The end-of-word marker `</w>` is a separate initial symbol (the
  * common variant; merges absorb it into final tokens).
  *
  * Driver involvement per round is ONE collected row (the argmax
  * pair — loop control, like a Lloyd convergence check); everything
  * else is distributed. Ties break deterministically: highest count,
  * then lexicographic (left, right).
  */
object Bpe {

  val EndMark = "</w>"

  /** One learned merge: `left`+`right` → `left+right`, with the pair
    * count that elected it. */
  final case class Merge(round: Int, left: String, right: String,
      cnt: Long) {
    def pattern: String = s" $left  $right "
    def replacement: String = s" $left$right "
  }

  /** Initial symbol string of a word: characters double-space-joined,
    * `</w>` appended as its own symbol, single-space borders. */
  def symInit(word: Column): Column =
    concat(lit(" "),
      array_join(regexp_extract_all(word, lit("(?s)."), lit(0)),
        "  "),
      lit("  " + EndMark + " "))

  /** The (w, cnt) corpus word-count table — the ONE corpus-sized
    * aggregate every tokenizer family's fit starts from (BPE merge
    * stats, the WordPiece frequency vocab, the Unigram type table).
    * Exposed (round 16) so a composed entry that fits several
    * tokenizers on the SAME corpus (`d_tokenizer_eval`) can compute
    * and persist it once and hand it to the `...FromCounts` fit forms
    * (guide §5: cache exactly what ≥2 consumers re-read). */
  def wordCounts(documents: DataFrame): DataFrame =
    documents
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** The word-type table: one row per distinct non-empty whitespace
    * token with its corpus frequency and initial symbol string. */
  def wordTypes(documents: DataFrame): DataFrame =
    wordTypesFromCounts(wordCounts(documents))

  /** [[wordTypes]] over a caller-built [[wordCounts]] frame. */
  private def wordTypesFromCounts(wc: DataFrame): DataFrame =
    wc.select(col("cnt"), symInit(col("w")).as("sym"))

  /** Adjacent symbol pairs of the current working table, weighted by
    * word frequency. `size >= 2` guards Spark's inclusive `sequence`
    * (a fully-merged single-symbol word would otherwise index 0). */
  private def pairCounts(w: DataFrame): DataFrame =
    w.select(col("cnt"), split(trim(col("sym")), "  ").as("syms"))
      .filter(size(col("syms")) >= 2)
      .select(col("cnt"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("l"),
          element_at(col("syms"), i + 1).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("pc"))

  /** Word-type count below which the merge loop finishes ON THE
    * DRIVER: the corpus pays its one scan (the word-count aggregate),
    * the vocabulary-sized (cnt, syms) table collects once, and all
    * `rounds` argmax+merge steps run locally — the Pca covariance
    * precedent (collect the scalar-sized state, never loop jobs over
    * tiny frames). Production tokenizers train THOUSANDS of merges;
    * at ~1 µs-scale local rounds vs ~100 ms-scale distributed rounds
    * (per-round count()+persist churn), the local finish is what
    * makes that count reachable. ~2M types ≈ a few hundred MB of
    * driver heap — comfortably under the driver budget; a corpus
    * with more types takes the distributed loop unchanged. */
  val LocalTypeLimit: Long = 1L << 21

  /** Learn up to `rounds` merges; stops early if the vocabulary is
    * fully merged. Vocabularies within `localTypeLimit` collect once
    * and finish locally (see [[LocalTypeLimit]]); larger ones run
    * the distributed loop (one vocabulary-sized pair aggregate + one
    * argmax row to the driver + one literal replace per round). The
    * two paths are merge-for-merge identical (BpeSpec proves
    * distributed ≡ local on the same corpus; ties break on UTF-8
    * byte order in both — see [[utf8Compare]]). */
  def trainMerges(documents: DataFrame, rounds: Int,
      localTypeLimit: Long = LocalTypeLimit): Seq[Merge] = {
    val wc = wordCounts(documents)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val out = trainMergesFromCounts(wc, rounds, localTypeLimit)
    wc.unpersist()
    out
  }

  /** [[trainMerges]] over a caller-built [[wordCounts]] frame (the
    * composed-entry form — the caller owns `wc`'s persist lifecycle;
    * both type-table passes below read through it, and the fit
    * finishes eagerly, so the caller may release `wc` as soon as this
    * returns). */
  def trainMergesFromCounts(wc: DataFrame, rounds: Int,
      localTypeLimit: Long = LocalTypeLimit): Seq[Merge] = {
    val w0 = wordTypesFromCounts(wc)
    if (wc.count() <= localTypeLimit) {
      val types = w0
        .select(col("cnt"), split(trim(col("sym")), "  ").as("syms"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[String](1).toArray))
      trainLocal(types, rounds)
    } else trainDistributed(
      w0.persist(StorageLevel.MEMORY_AND_DISK), rounds)
  }

  /** The distributed merge loop (vocabularies past the driver
    * budget). Takes ownership of the persisted `w0`. */
  private def trainDistributed(w0: DataFrame, rounds: Int)
      : Seq[Merge] = {
    var w = w0
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val best = pairCounts(w)
        .orderBy(desc("pc"), asc("l"), asc("r"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val m = Merge(r, best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += m
        val next = w.withColumn("sym", call_function("replace",
            col("sym"), lit(m.pattern), lit(m.replacement)))
          .persist(StorageLevel.MEMORY_AND_DISK)
        // materialize next before releasing the parent (next round's
        // collect would otherwise recompute the whole chain)
        next.count()
        w.unpersist()
        w = next
        r += 1
      }
    }
    w.unpersist()
    merges.result()
  }

  /** Spark/DuckDB string ordering — unsigned UTF-8 byte comparison
    * (UTF8String binary order / DuckDB default collation). Java's
    * `String.compareTo` orders UTF-16 code units instead, which
    * disagrees for supplementary-plane characters; the local loop
    * must break argmax ties exactly as the distributed `orderBy`
    * does. */
  private[ext] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Greedy left-to-right non-overlapping pair merge on a symbol
    * array — the list formulation BpeSpec property-proves ≡ the
    * engine's literal string replace. */
  private def mergePairGreedy(s: Array[String], l: String,
      r: String): Array[String] = {
    if (s.length < 2) return s
    val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += s(i); i += 1 }
    }
    out.toArray
  }

  /** The driver-local merge loop over the collected (cnt, syms)
    * word-type table. Order-independent by construction: pair counts
    * sum over all types, and the argmax comparison (count desc, then
    * left/right UTF-8-ascending) is total over distinct pairs, so
    * the nondeterministic partition order of the collect cannot
    * change the result. */
  private[ext] def trainLocal(types: Array[(Long, Array[String])],
      rounds: Int): Seq[Merge] = {
    var syms = types.map(_._2)
    val cnts = types.map(_._1)
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val pc = new scala.collection.mutable.HashMap[(String, String), Long]
      var k = 0
      while (k < syms.length) {
        val s = syms(k); val c = cnts(k)
        var i = 0
        while (i < s.length - 1) {
          val key = (s(i), s(i + 1))
          pc.update(key, pc.getOrElse(key, 0L) + c)
          i += 1
        }
        k += 1
      }
      if (pc.isEmpty) done = true
      else {
        var best: ((String, String), Long) = null
        for (e <- pc) {
          if (best == null) best = e
          else {
            val dc = java.lang.Long.compare(e._2, best._2)
            if (dc > 0 || (dc == 0 && {
              val dl = utf8Compare(e._1._1, best._1._1)
              dl < 0 || (dl == 0 && utf8Compare(e._1._2, best._1._2) < 0)
            })) best = e
          }
        }
        val ((l, rt), c) = best
        merges += Merge(r, l, rt, c)
        syms = syms.map(s => mergePairGreedy(s, l, rt))
        r += 1
      }
    }
    merges.result()
  }

  /** The learned merge table as a DataFrame (the `d_bpe_train`
    * catalog result): round, left/right symbols, merged symbol, and
    * the electing pair count. */
  def mergeTable(documents: DataFrame, rounds: Int): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    trainMerges(documents, rounds)
      .map(m => (m.round.toLong, m.left, m.right, m.left + m.right,
        m.cnt))
      .toDF("round", "left_sym", "right_sym", "merged", "pair_cnt")
      .orderBy("round")
  }

  /** Apply a learned merge list (in round order) to a symbol-string
    * column — a chain of literal replaces, fully codegen'd. */
  def applyMerges(sym: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(sym)((c, m) => call_function("replace",
      c, lit(m.pattern), lit(m.replacement)))

  /** Local apply: one greedy left-to-right pass per merge in rank
    * order — EXACTLY the literal-replace chain semantics (a single
    * pass leaves no instance of its own pair: the replacement product
    * `lr` can equal neither `l` nor `r`, so adjacencies it creates
    * never re-match the same pair). Deliberately NOT the
    * rank-priority-queue algorithm production tokenizers use: on
    * corpora where the same symbol string is derivable by two
    * different merges (e.g. "aab" via both (a,ab) and (aa,b)),
    * rank-first merging can re-create and consume a LOWER-ranked pair
    * that the sequential chain — and both engines' `replace` — leave
    * unmerged, silently breaking oracle parity. Sequential passes
    * cost O(merges × |word|) per word TYPE, which
    * [[tokenStatsFast]]'s memoization pays once per distinct word
    * per partition. */
  private[ext] def applyLocal(word: String,
      merges: Array[(String, String)]): Int = {
    var syms: Array[String] =
      word.map(_.toString).toArray[String] :+ EndMark
    var i = 0
    while (i < merges.length && syms.length >= 2) {
      val m = merges(i)
      syms = mergePairGreedy(syms, m._1, m._2)
      i += 1
    }
    syms.length
  }

  /** PRODUCTION-merge-count tokenization stats: same output contract
    * as [[tokenStats]] (per-doc whitespace word count + BPE token
    * count) but via a per-partition MEMOIZED compiled local apply
    * instead of a `rounds`-deep Catalyst replace chain — at thousands
    * of merges the expression chain's analysis/codegen cost and
    * method size grow with rounds, while this path is one
    * `mapPartitions` whose per-word cost is paid once per distinct
    * word per partition (the memo is vocabulary-bounded, the same
    * budget [[LocalTypeLimit]] already assumes). Map-only, zero
    * shuffle; hash-verified at 8 rounds through the SAME
    * [[tokenStatsSql]] oracle as `d_bpe_tokens`, and spec-proven ≡
    * the replace chain merge-list-for-merge-list. */
  def tokenStatsFast(documents: DataFrame, merges: Seq[Merge])
      : DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val ms = merges.map(m => (m.left, m.right)).toArray
    documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, Long]
        it.map { case (id, text) =>
          val words = text.split(" ")
          var nWords = 0L
          var nBpe = 0L
          var i = 0
          while (i < words.length) {
            val w = words(i)
            if (w.nonEmpty) {
              nWords += 1
              nBpe += memo.getOrElseUpdate(w, applyLocal(w, ms).toLong)
            }
            i += 1
          }
          (id, nWords, nBpe)
        }
      }
      .toDF("doc_id", "n_words", "n_bpe")
      .orderBy("doc_id")
  }

  /** Per-document BPE tokenization stats under the merges learned
    * from the SAME corpus: whitespace word count and the BPE token
    * count after `rounds` merges. The merge list is a per-row
    * literal expression chain inside one whole-stage-codegen'd
    * projection — tokenizing is a map-only pass, no shuffle beyond
    * the per-doc aggregate's none (all HOFs are per-row). For
    * production merge counts use [[tokenStatsFast]]. */
  def tokenStats(documents: DataFrame, rounds: Int): DataFrame =
    tokenStatsFromCounts(documents, None, rounds)

  /** [[tokenStats]] with the fit fed by a caller-built (persisted)
    * [[wordCounts]] frame when given — the `d_tokenizer_eval`
    * composition. The apply side never touches `wc` (merges ride the
    * projection as literals), so the caller may release it as soon as
    * every leg's fit has run. */
  def tokenStatsFromCounts(documents: DataFrame, wc: Option[DataFrame],
      rounds: Int): DataFrame = {
    val merges = wc match {
      case Some(c) => trainMergesFromCounts(c, rounds)
      case None => trainMerges(documents, rounds)
    }
    val words = filter(split(col("text"), " "),
      t => length(t) > 0)
    val nBpe = aggregate(words, lit(0L), (acc, t) => acc +
      size(split(trim(applyMerges(symInit(t), merges)), "  "))
        .cast("long"))
    documents.select(col("doc_id"),
      size(words).cast("long").as("n_words"),
      nBpe.as("n_bpe"))
      .orderBy("doc_id")
  }

  // ---- DuckDB oracle (unrolled rounds, same technique as the
  // k-means oracle: each round is a CTE pair — argmax + rewritten
  // working table) ----

  private def w0Sql: String =
    s"""wt AS MATERIALIZED (SELECT w, count(*) AS cnt FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) > 0 GROUP BY 1),
       |w0 AS MATERIALIZED (SELECT cnt, ' ' || array_to_string(
       |    list_transform(range(1, len(w) + 1),
       |      i -> substr(w, i, 1)), '  ') || '  $EndMark ' AS sym
       |  FROM wt)""".stripMargin

  private def roundSql(r: Int): String = {
    val prev = s"w${r - 1}"
    s"""pc$r AS MATERIALIZED (SELECT p.l AS l, p.r AS r, CAST(sum(cnt) AS BIGINT) AS pc
       |  FROM (SELECT cnt, unnest(list_transform(
       |      range(1, len(syms)),
       |      i -> {'l': syms[i], 'r': syms[i + 1]})) AS p
       |    FROM (SELECT cnt, string_split(trim(sym), '  ') AS syms
       |      FROM $prev))
       |  GROUP BY 1, 2),
       |b$r AS MATERIALIZED (SELECT l, r, pc FROM pc$r
       |  ORDER BY pc DESC, l ASC, r ASC LIMIT 1),
       |w$r AS MATERIALIZED (SELECT cnt, replace(sym,
       |    ' ' || coalesce((SELECT l FROM b$r), chr(1)) || '  ' ||
       |      coalesce((SELECT r FROM b$r), chr(1)) || ' ',
       |    ' ' || coalesce((SELECT l FROM b$r), chr(1)) ||
       |      coalesce((SELECT r FROM b$r), chr(1)) || ' ') AS sym
       |  FROM $prev)""".stripMargin
  }
  // ^ the coalesce sentinels make an EXHAUSTED round (empty b$r —
  // vocabulary fully merged before `rounds`) a no-op replace, matching
  // the Scala loop's early stop: bare scalar subqueries over an empty
  // CTE are NULL, so replace() would NULL every sym and silently
  // collapse downstream counts. chr(1) cannot match: exhaustion means
  // every sym is single-symbol (no '  ' separator anywhere), so ANY
  // non-NULL pattern containing '  ' misses.

  /** Oracle SQL for [[mergeTable]] at `rounds` merges. */
  def mergeTableSql(rounds: Int): String = {
    val ctes = (w0Sql +: (1 to rounds).map(roundSql)).mkString(",\n")
    val rows = (1 to rounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, l AS left_sym, " +
        s"r AS right_sym, l || r AS merged, pc AS pair_cnt FROM b$r")
      .mkString("\nUNION ALL ")
    s"WITH $ctes\nSELECT * FROM (\n$rows)\nORDER BY round"
  }

  /** Oracle SQL for [[tokenStats]] at `rounds` merges: the same CTE
    * chain learns the merges; the document side re-applies them as
    * nested replaces via scalar subqueries. */
  def tokenStatsSql(rounds: Int): String = {
    val ctes = (w0Sql +: (1 to rounds).map(roundSql)).mkString(",\n")
    // same coalesce-sentinel treatment as roundSql: an exhausted
    // round must be a no-op replace on the document side too (NULL
    // patterns would NULL n_sym and coalesce n_bpe to 0)
    val applied = (1 to rounds).foldLeft("' ' || array_to_string(" +
      s"list_transform(range(1, len(w) + 1), i -> substr(w, i, 1)), " +
      s"'  ') || '  $EndMark '") { (acc, r) =>
      s"replace($acc,\n    ' ' || coalesce((SELECT l FROM b$r), chr(1))" +
        s" || '  ' || coalesce((SELECT r FROM b$r), chr(1)) || ' ',\n" +
        s"    ' ' || coalesce((SELECT l FROM b$r), chr(1))" +
        s" || coalesce((SELECT r FROM b$r), chr(1)) || ' ')"
    }
    s"""WITH $ctes,
       |dw AS MATERIALIZED (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |per_word AS (SELECT doc_id,
       |    CAST(len(string_split(trim($applied), '  ')) AS BIGINT)
       |      AS n_sym
       |  FROM dw WHERE len(w) > 0)
       |SELECT d.doc_id,
       |  CAST(coalesce(t.n_words, 0) AS BIGINT) AS n_words,
       |  CAST(coalesce(t.n_bpe, 0) AS BIGINT) AS n_bpe
       |FROM documents d LEFT JOIN (
       |  SELECT doc_id, count(*) AS n_words, sum(n_sym) AS n_bpe
       |  FROM per_word GROUP BY 1) t USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }
}
