package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Greedy longest-match subword tokenization — the WordPiece-FAMILY
  * inference algorithm (Schuster & Nakajima 2012; the
  * `tokenizers`-style "fast tokenizer" apply path): at each position
  * consume the LONGEST vocabulary piece that prefixes the remaining
  * word, falling back to a single character when none matches. This
  * is the left-to-right single-pass production apply — deliberately a
  * DIFFERENT family from [[Bpe]]'s merge-order apply (BPE replays
  * ranked merges; longest-match maximizes the current piece), shipped
  * alongside it the way HF ships both backends.
  *
  * The vocabulary here is the top-`vocabSize` corpus substrings of
  * length 2..`maxPieceLen` ranked by summed word-type frequency (each
  * distinct substring counted once per word TYPE, weighted by the
  * type's corpus count), ties by piece text — a deterministic
  * frequency vocab, NOT the likelihood-trained WordPiece vocab (that
  * training is a different estimator; the apply semantics are what
  * this operator ships). Single characters are implicitly in-vocab
  * (the fallback), so there is no UNK.
  *
  * Scale shape: the vocab fit is one corpus scan to the word-TYPE
  * table (the [[Bpe.wordTypes]] aggregate), one vocabulary-sized
  * substring aggregate (per-type distinct substrings via nested
  * higher-order functions — codegen'd, no UDF), and one
  * TakeOrdered top-V (never a global sort). The apply is map-only:
  * the V-piece vocab broadcasts via the task closure and each
  * partition memoizes per distinct word (the [[Bpe.tokenStatsFast]]
  * treatment). Nothing shuffles but the word-type aggregate.
  */
object Wordpiece {

  /** Distinct substrings of lengths 2..`maxLen` per word, as a
    * sorted array column (nested HOFs, codegen'd). */
  private def subPieces(w: org.apache.spark.sql.Column, maxLen: Int) =
    array_sort(array_distinct(flatten(transform(
      sequence(lit(1), length(w)),
      i => filter(transform(
        sequence(lit(2), lit(maxLen)),
        l => when(i + l - 1 <= length(w), substring(w, i, l))),
        p => p.isNotNull)))))

  /** Top-`vocabSize` frequency-substring vocabulary: (piece, total)
    * ranked by (total desc, piece asc). */
  def vocab(documents: DataFrame, vocabSize: Int,
      maxPieceLen: Int): DataFrame =
    vocabFromCounts(Bpe.wordCounts(documents), vocabSize, maxPieceLen)

  /** [[vocab]] over a caller-built [[Bpe.wordCounts]] frame — the
    * shared-fit form `d_tokenizer_eval` composes. */
  def vocabFromCounts(wc: DataFrame, vocabSize: Int,
      maxPieceLen: Int): DataFrame =
    wc.select(col("cnt"),
        explode(subPieces(col("w"), maxPieceLen)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("total"))
      .orderBy(desc("total"), asc("piece"))
      .limit(vocabSize)

  /** Greedy longest-match piece count for one word — the reference
    * scalar implementation the distributed apply memoizes (also used
    * directly by the spec as the independent check). */
  private[ext] def greedyCount(word: String, pieces: Set[String],
      maxPieceLen: Int): Int = {
    var pos = 0
    var n = 0
    while (pos < word.length) {
      var l = math.min(maxPieceLen, word.length - pos)
      var step = 1
      while (l >= 2 && step == 1) {
        if (pieces.contains(word.substring(pos, pos + l))) step = l
        else l -= 1
      }
      pos += step
      n += 1
    }
    n
  }

  /** Per-document tokenization stats under the corpus-fitted
    * frequency vocab: whitespace word count and greedy piece count.
    * Output (doc_id, n_words, n_pieces), one row per doc. */
  def tokenStats(documents: DataFrame, vocabSize: Int = 512,
      maxPieceLen: Int = 8): DataFrame =
    tokenStatsFromCounts(documents, None, vocabSize, maxPieceLen)

  /** [[tokenStats]] with the vocab fit fed by a caller-built
    * (persisted) [[Bpe.wordCounts]] frame when given — the
    * `d_tokenizer_eval` composition. The apply side never touches
    * `wc` (the vocab rides the task closure), so the caller may
    * release it as soon as every leg's fit has run. */
  def tokenStatsFromCounts(documents: DataFrame, wc: Option[DataFrame],
      vocabSize: Int = 512, maxPieceLen: Int = 8): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val vsrc = wc match {
      case Some(c) => vocabFromCounts(c, vocabSize, maxPieceLen)
      case None => vocab(documents, vocabSize, maxPieceLen)
    }
    val v = vsrc.select(col("piece")).as[String].collect().toSet
    val maxL = maxPieceLen
    documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, Long]
        it.map { case (id, text) =>
          val words = text.split(" ")
          var nWords = 0L
          var nPieces = 0L
          var i = 0
          while (i < words.length) {
            val w = words(i)
            if (w.nonEmpty) {
              nWords += 1
              nPieces += memo.getOrElseUpdate(w,
                greedyCount(w, v, maxL).toLong)
            }
            i += 1
          }
          (id, nWords, nPieces)
        }
      }
      .toDF("doc_id", "n_words", "n_pieces")
      .orderBy("doc_id")
  }
}
