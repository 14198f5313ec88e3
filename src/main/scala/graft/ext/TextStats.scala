package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language ID, document fingerprinting. All pure
  * Column expressions over the `documents` table — embarrassingly
  * parallel narrow transforms at any scale.
  */
object TextStats {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword token count: letter runs, digit runs, and single
    * punctuation each count as one token (the standard pre-tokenizer
    * split, minus the unicode categories this corpus doesn't have). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))

  /** Small multilingual stopword table for language ID / quality. */
  val StopwordsByLang: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it"),
    "es" -> Seq("el", "la", "de", "los", "las", "y", "que", "en"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  val AllStopwords: Seq[String] =
    StopwordsByLang.flatMap(_._2).distinct.sorted

  /** Count of tokens contained in `words` — one compiled pass with a
    * hash-set probe per token ([[graft.functions.TokenSetCounts]]);
    * see [[hofTokenHits]] for the HOF reference formulation. */
  def tokenHits(toks: Column, words: Seq[String]): Column =
    element_at(graft.functions.ArrayOps.token_set_counts(
      toks, Seq(words)), 1)

  /** HOF reference formulation of [[tokenHits]] (interpreted lambda +
    * linear `isin` scan per token) — equivalence-tested only. */
  def hofTokenHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  /** Heuristic quality score ∈ [0,1]: blends length saturation,
    * type-token ratio, and stopword presence (the classic cheap
    * pre-filter for web-scale corpora). Deterministic double math —
    * mirrors 1:1 into the oracle SQL. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val lenScore = least(nTok / 20.0, lit(1.0))
    val ttr = size(array_distinct(toks)).cast("double") /
      greatest(nTok, lit(1.0))
    val stopRatio = tokenHits(toks, AllStopwords).cast("double") /
      greatest(nTok, lit(1.0))
    val stopScore = least(stopRatio * 4.0, lit(1.0))
    round(lenScore * 0.4 + ttr * 0.4 + stopScore * 0.2, 6)
  }

  /** Language ID by stopword voting: argmax of per-language stopword
    * hit counts, ties broken by language code order (deterministic).
    * All languages share ONE [[graft.functions.TokenSetCounts]] pass
    * (identical subtrees — common-subexpression-eliminated in
    * codegen), not one filter scan per language. */
  def langScores(toks: Column): Seq[(String, Column)] = {
    val counts = graft.functions.ArrayOps.token_set_counts(
      toks, StopwordsByLang.map(_._2))
    StopwordsByLang.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(counts, i + 1)
    }
  }

  def predictedLang(toks: Column): Column = {
    val scores = langScores(toks)
    val best = greatest(scores.map(_._2): _*)
    // first language (alphabetical order of StopwordsByLang) reaching
    // the max wins; no stopword hits at all → "und"(etermined)
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Quality score and predicted language from ONE fused
    * [[graft.functions.TokenSetCounts]] pass (all-stopwords set +
    * the per-language sets in a single kernel) — observationally
    * identical to `(qualityScore(text), predictedLang(tokens(text)))`
    * but with one token scan instead of two; used by the curation
    * pipeline, which needs both. */
  def qualityAndLang(text: Column): (Column, Column) =
    qualityAndLangFrom(tokens(text))

  /** [[qualityAndLang]] over an already-tokenized column. Callers that
    * project the token array once (`withColumn("_toks", tokens(...))`)
    * and pass the attribute here get a guaranteed single tokenize in
    * the plan, independent of codegen subexpression elimination. */
  def qualityAndLangFrom(toks: Column): (Column, Column) = {
    val counts = graft.functions.ArrayOps.token_set_counts(
      toks, AllStopwords +: StopwordsByLang.map(_._2))
    val nTok = size(toks).cast("double")
    val lenScore = least(nTok / 20.0, lit(1.0))
    val ttr = size(array_distinct(toks)).cast("double") /
      greatest(nTok, lit(1.0))
    val stopRatio = element_at(counts, 1).cast("double") /
      greatest(nTok, lit(1.0))
    val quality = round(lenScore * 0.4 + ttr * 0.4 +
      least(stopRatio * 4.0, lit(1.0)) * 0.2, 6)
    val scores = StopwordsByLang.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(counts, i + 2)
    }
    val best = greatest(scores.map(_._2): _*)
    val pred = scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    (quality, pred)
  }

  /** Rolling polynomial fingerprint over the document's code points:
    * h = (h * 31 + code(ch)) mod (2^31 - 1). Order-sensitive content
    * fingerprint (unlike the hash-set ops above), verified against a
    * DuckDB `list_reduce`/`ord` oracle. Implemented as a custom
    * codegen'd Catalyst Expression — the HOF char-fold equivalent is
    * ~10^4× slower per character (interpreted lambda per step). */
  def fingerprint(text: Column): Column =
    graft.functions.RollingHash.rolling_hash(text)
}
