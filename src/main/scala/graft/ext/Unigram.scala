package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018 — the SentencePiece
  * estimator), completing the tokenizer family: [[Bpe]] replays
  * ranked merges, [[Wordpiece]] greedy-longest-matches a frequency
  * vocab, and THIS trains piece log-probabilities and segments by
  * Viterbi max-likelihood — the algorithm behind Llama/T5-class
  * tokenizers.
  *
  * Training (deterministic, hard-EM):
  *  1. SEED: candidate pieces = every substring of length
  *     1..`maxPieceLen` of every word type, counted per OCCURRENCE
  *     and weighted by the type's corpus count. The vocabulary is all
  *     single characters (coverage — no UNK) plus the top
  *     `vocabSize − #chars` multi-character candidates by
  *     (count DESC, piece ASC). Seed score(p) = round(ln(cnt_p/Σcnt)
  *     · 1e6) in integer MICRO-UNITS — one floating rounding per
  *     piece, after which every Viterbi comparison is EXACT integer
  *     arithmetic (the integer-PageRank trick: summation order can
  *     never flip an argmax, so Spark's right-to-left DP and the
  *     oracle's path enumeration agree bit-for-bit).
  *  2. EM round (×`emIters`): segment every word TYPE by Viterbi
  *     under the current scores, recount pieces by ACTUAL USAGE
  *     (weighted by type count), re-score with add-one smoothing over
  *     the surviving vocab (used pieces ∪ all chars — chars never
  *     prune, the SentencePiece rule).
  *  3. Segment under the final scores.
  *
  * Viterbi ties resolve canonically: highest score, then FEWEST
  * pieces, then the LONGEST first piece recursively (= lexicographic
  * max on the piece-length sequence) — a total order both engines
  * can express, so the oracle's brute-force enumeration (ORDER BY
  * score DESC, n ASC, lens DESC) picks the identical segmentation.
  *
  * Scale shape: one corpus scan builds the word-TYPE table (the
  * [[Wordpiece.vocab]] treatment); every EM segmentation pass is a
  * map-only pass over the TYPE table with the vocab-sized score map
  * broadcast in the closure (types never collect — at web scale the
  * type table is itself corpus-sized); usage recounts are type-table
  * aggregates; only VOCAB-sized frames (≤ vocabSize + chars rows)
  * ever reach the driver, the same local-finish budget as [[Bpe]].
  * The per-document apply is map-only with per-partition type
  * memoization ([[Bpe]]'s tokenStatsFast pattern). Word types longer
  * than `maxWordLen` are excluded from the fit and counted separately
  * in the apply (`n_long`) — the bound exists for the ORACLE's path
  * enumeration (2^(len−1) paths); production Viterbi is
  * O(len·maxPieceLen) and would simply raise it.
  */
object Unigram {

  /** All substring OCCURRENCES of lengths 1..`maxLen` per word (with
    * duplicates — occurrence counting, unlike [[Wordpiece.subPieces]]'
    * distinct-per-type). Codegen'd nested HOFs, no UDF. */
  private def subOccurrences(w: Column, maxLen: Int): Column =
    flatten(transform(
      sequence(lit(1), length(w)),
      i => filter(transform(
        sequence(lit(1), lit(maxLen)),
        l => when(i + l - 1 <= length(w), substring(w, i, l))),
        p => p.isNotNull)))

  /** (w, cnt) word-type table — same tokenization as the rest of the
    * tokenizer family (whitespace split, empties dropped), types
    * longer than `maxWordLen` excluded from the FIT (see class doc). */
  def wordTypes(documents: DataFrame, maxWordLen: Int): DataFrame =
    documents
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0 && length(col("w")) <= maxWordLen)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** [[wordTypes]] over a caller-built [[Bpe.wordCounts]] frame — the
    * length cap is a predicate on the GROUP KEY, so filtering the
    * aggregated counts is exactly the pre-aggregation filter (same
    * rows, same counts). */
  private def wordTypesFromCounts(wc: DataFrame,
      maxWordLen: Int): DataFrame =
    wc.filter(length(col("w")) <= maxWordLen)

  /** Seed vocabulary counts: (piece, pcnt) — all single chars + top
    * `vocabSize − #chars` multi-char substrings by occurrence count.
    * Both legs are TakeOrdered/limit over an aggregate, vocab-sized
    * output. */
  def seedCounts(types: DataFrame, vocabSize: Int, maxPieceLen: Int)
      : DataFrame = {
    val occ = types
      .select(col("cnt"),
        explode(subOccurrences(col("w"), maxPieceLen)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("pcnt"))
    val chars = occ.filter(length(col("piece")) === 1)
    val charN = chars.count().toInt
    val keepMulti = occ.filter(length(col("piece")) > 1)
      .orderBy(desc("pcnt"), asc("piece"))
      .limit(math.max(0, vocabSize - charN))
    chars.unionByName(keepMulti)
  }

  /** round(ln(cnt/total)·1e6) per piece over a driver-local
    * vocab-sized count map — the one floating rounding; all
    * downstream sums are exact integers. */
  private def microScores(counts: Map[String, Long]): Map[String, Long] = {
    val total = counts.valuesIterator.sum.toDouble
    counts.map { case (p, c) =>
      p -> math.round(math.log(c.toDouble / total) * 1e6)
    }
  }

  /** Canonical Viterbi for one word under micro-unit scores: returns
    * (pieces, total iscore). Maximizes (Σ iscore, −n, piece-length
    * sequence lex) by right-to-left DP — single chars are always
    * scored, so every word segments. The reference scalar
    * implementation; the distributed passes memoize it per type. */
  private[ext] def viterbi(word: String, scores: Map[String, Long],
      maxPieceLen: Int): (List[String], Long) = {
    val n = word.length
    val dpScore = new Array[Long](n + 1)
    val dpN = new Array[Int](n + 1)
    val dpCut = new Array[Int](n + 1) // first-piece length at i
    dpScore(n) = 0L; dpN(n) = 0; dpCut(n) = 0
    var i = n - 1
    while (i >= 0) {
      var best = Long.MinValue; var bestN = Int.MaxValue; var bestL = 0
      var l = math.min(maxPieceLen, n - i)
      while (l >= 1) {
        scores.get(word.substring(i, i + l)) match {
          case Some(s) =>
            val sc = s + dpScore(i + l)
            val cn = 1 + dpN(i + l)
            // scan l downward, replace only on strict improvement →
            // ties keep the LONGEST first piece (lens-seq lex max)
            if (sc > best || (sc == best && cn < bestN)) {
              best = sc; bestN = cn; bestL = l
            }
          case None => ()
        }
        l -= 1
      }
      dpScore(i) = best; dpN(i) = bestN; dpCut(i) = bestL
      i -= 1
    }
    val out = List.newBuilder[String]
    var p = 0
    while (p < n) { out += word.substring(p, p + dpCut(p)); p += dpCut(p) }
    (out.result(), dpScore(0))
  }

  /** Distributed Viterbi over the TYPE table: map-only, scores in the
    * task closure. Output (w, cnt, pieces array, iscore). */
  private def segmentTypes(types: DataFrame, scores: Map[String, Long],
      maxPieceLen: Int): DataFrame = {
    val spark = types.sparkSession
    import spark.implicits._
    val mp = maxPieceLen
    types.select(col("w"), col("cnt")).as[(String, Long)]
      .mapPartitions { it =>
        it.map { case (w, cnt) =>
          val (pieces, sc) = viterbi(w, scores, mp)
          (w, cnt, pieces, sc)
        }
      }
      .toDF("w", "cnt", "pieces", "iscore")
  }

  /** Fit the scores: seed + `emIters` hard-EM rounds. Each round is
    * one distributed segmentation pass + one usage aggregate; only
    * the vocab-sized (piece, usage) frame collects. */
  def fitScores(types: DataFrame, vocabSize: Int, maxPieceLen: Int,
      emIters: Int): Map[String, Long] = {
    val spark = types.sparkSession
    import spark.implicits._
    val seed = seedCounts(types, vocabSize, maxPieceLen)
      .as[(String, Long)].collect().toMap
    val chars = seed.keysIterator.filter(_.length == 1).toSeq.sorted
    var scores = microScores(seed)
    for (_ <- 0 until emIters) {
      val usage = segmentTypes(types, scores, maxPieceLen)
        .select(col("cnt"), explode(col("pieces")).as("piece"))
        .groupBy(col("piece")).agg(sum(col("cnt")).as("u"))
        .as[(String, Long)].collect().toMap
      // add-one smoothing over (used ∪ chars); chars never prune
      val vocab2 = (usage.keySet ++ chars).toSeq.sorted
      val counts2 = vocab2.map(p => p -> (usage.getOrElse(p, 0L) + 1L))
      scores = microScores(counts2.toMap)
    }
    scores
  }

  /** The trained tokenizer as a table: per-word-type canonical
    * segmentation under the EM-refined scores — (w, cnt, n_pieces,
    * pieces [space-joined], iscore), the hash-verified artifact. */
  def train(documents: DataFrame, vocabSize: Int = 256,
      maxPieceLen: Int = 8, maxWordLen: Int = 16, emIters: Int = 1)
      : DataFrame = {
    val types = wordTypes(documents, maxWordLen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val scores = fitScores(types, vocabSize, maxPieceLen, emIters)
    val out = segmentTypes(types, scores, maxPieceLen)
      .select(col("w"), col("cnt"), size(col("pieces")).as("n_pieces"),
        array_join(col("pieces"), " ").as("pieces"), col("iscore"))
      .orderBy("w")
      .localCheckpoint()
    types.unpersist()
    out
  }

  /** Per-document apply: (doc_id, n_words, n_pieces, n_long, iscore)
    * under the fitted scores — map-only, the vocab-sized score map in
    * the closure, per-partition Viterbi memoization per word type.
    * Words longer than `maxWordLen` count in `n_long` and are
    * excluded from piece stats (the fit never saw them). */
  def tokenStats(documents: DataFrame, vocabSize: Int = 256,
      maxPieceLen: Int = 8, maxWordLen: Int = 16, emIters: Int = 1)
      : DataFrame =
    tokenStatsFromCounts(documents, None, vocabSize, maxPieceLen,
      maxWordLen, emIters)

  /** [[tokenStats]] with the fit fed by a caller-built (persisted)
    * [[Bpe.wordCounts]] frame when given — the `d_tokenizer_eval`
    * composition. Every fit pass (seed + each EM segmentation) reads
    * the type table through the caller's cache plus a cheap key
    * filter, so no second persist is taken; the apply side never
    * touches `wc` (scores ride the task closure), so the caller may
    * release it as soon as every leg's fit has run. */
  def tokenStatsFromCounts(documents: DataFrame, wc: Option[DataFrame],
      vocabSize: Int = 256, maxPieceLen: Int = 8, maxWordLen: Int = 16,
      emIters: Int = 1): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val scores = wc match {
      case Some(c) =>
        fitScores(wordTypesFromCounts(c, maxWordLen), vocabSize,
          maxPieceLen, emIters)
      case None =>
        val types = wordTypes(documents, maxWordLen)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val s = fitScores(types, vocabSize, maxPieceLen, emIters)
        types.unpersist()
        s
    }
    val mp = maxPieceLen; val maxW = maxWordLen
    documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo =
          scala.collection.mutable.HashMap.empty[String, (Long, Long)]
        it.map { case (id, text) =>
          val words = text.split(" ")
          var nWords = 0L; var nPieces = 0L; var nLong = 0L
          var iscore = 0L
          var i = 0
          while (i < words.length) {
            val w = words(i)
            if (w.nonEmpty) {
              nWords += 1
              if (w.length > maxW) nLong += 1
              else {
                val (np, s) = memo.getOrElseUpdate(w, {
                  val (ps, sc) = viterbi(w, scores, mp)
                  (ps.length.toLong, sc)
                })
                nPieces += np; iscore += s
              }
            }
            i += 1
          }
          (id, nWords, nPieces, nLong, iscore)
        }
      }
      .toDF("doc_id", "n_words", "n_pieces", "n_long", "iscore")
      .orderBy("doc_id")
  }
}
