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

  /** The word-type table: one row per distinct non-empty whitespace
    * token with its corpus frequency and initial symbol string. */
  def wordTypes(documents: DataFrame): DataFrame =
    documents
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), symInit(col("w")).as("sym"))

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

  /** Learn up to `rounds` merges. Per round: one vocabulary-sized
    * pair aggregate, one argmax row to the driver, one literal
    * replace over the persisted working table. Stops early if the
    * vocabulary is fully merged. */
  def trainMerges(documents: DataFrame, rounds: Int): Seq[Merge] = {
    var w = wordTypes(documents)
      .persist(StorageLevel.MEMORY_AND_DISK)
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

  /** Per-document BPE tokenization stats under the merges learned
    * from the SAME corpus: whitespace word count and the BPE token
    * count after `rounds` merges. The merge list is a per-row
    * literal expression chain inside one whole-stage-codegen'd
    * projection — tokenizing is a map-only pass, no shuffle beyond
    * the per-doc aggregate's none (all HOFs are per-row). */
  def tokenStats(documents: DataFrame, rounds: Int): DataFrame = {
    val merges = trainMerges(documents, rounds)
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
       |    ' ' || (SELECT l FROM b$r) || '  ' || (SELECT r FROM b$r) || ' ',
       |    ' ' || (SELECT l FROM b$r) || (SELECT r FROM b$r) || ' ') AS sym
       |  FROM $prev)""".stripMargin
  }

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
    val applied = (1 to rounds).foldLeft("' ' || array_to_string(" +
      s"list_transform(range(1, len(w) + 1), i -> substr(w, i, 1)), " +
      s"'  ') || '  $EndMark '") { (acc, r) =>
      s"replace($acc,\n    ' ' || (SELECT l FROM b$r) || '  ' || " +
        s"(SELECT r FROM b$r) || ' ',\n    ' ' || (SELECT l FROM b$r)" +
        s" || (SELECT r FROM b$r) || ' ')"
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
