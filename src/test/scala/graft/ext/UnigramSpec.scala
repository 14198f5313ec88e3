package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force enumeration of every segmentation under the same
    * canonical order the oracle uses (score DESC, n ASC, length-seq
    * lex DESC) — the independent reference for the Viterbi DP. */
  private def bruteBest(word: String, scores: Map[String, Long],
      maxPieceLen: Int): (List[String], Long) = {
    def segs(s: String): List[List[String]] =
      if (s.isEmpty) List(Nil)
      else (1 to math.min(maxPieceLen, s.length)).toList.flatMap { l =>
        val h = s.substring(0, l)
        if (scores.contains(h)) segs(s.substring(l)).map(h :: _)
        else Nil
      }
    val all = segs(word).map { ps =>
      (ps, ps.map(scores).sum, ps.length, ps.map(_.length))
    }
    // score desc, n asc, piece-length sequence lex DESC
    val best = all.max(Ordering.by[(List[String], Long, Int, List[Int]),
      (Long, Int, List[Int])] { case (_, sc, n, lens) =>
        (sc, -n, lens)
      }(Ordering.Tuple3(Ordering.Long, Ordering.Int,
        math.Ordering.Implicits.seqOrdering[List, Int])))
    (best._1, best._2)
  }

  test("viterbi equals brute-force canonical enumeration, including " +
      "score and piece-count ties") {
    // crafted ties: 'ab'+'cd' vs 'abcd' same score (2-piece loses to
    // 1-piece); 'ab'+'c' vs 'a'+'bc' same score same n (longest first
    // piece wins)
    val scores = Map("a" -> -10L, "b" -> -10L, "c" -> -10L,
      "d" -> -10L, "ab" -> -15L, "cd" -> -15L, "abcd" -> -30L,
      "bc" -> -15L)
    for (w <- Seq("abcd", "abc", "a", "ab", "abcabc", "dcba", "abcd" * 3)) {
      val got = Unigram.viterbi(w, scores, 8)
      val want = bruteBest(w, scores, 8)
      assert(got == want, s"$w: viterbi $got != brute $want")
    }
    assert(Unigram.viterbi("abcd", scores, 8)._1 == List("abcd"),
      "1-piece must beat 2-piece at equal score")
    assert(Unigram.viterbi("abc", scores, 8)._1 == List("ab", "c"),
      "longest first piece must win the full tie")
  }

  test("viterbi equals brute force on seeded random vocab/words") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    def randWord(n: Int) =
      (0 until n).map(_ => alphabet(rnd.nextInt(3))).mkString
    for (trial <- 0 until 50) {
      val chars = alphabet.map(_.toString -> (-(5 + rnd.nextInt(20))).toLong)
      val multi = (0 until 6).map(_ => randWord(2 + rnd.nextInt(3)))
        .map(p => p -> (-(3 + rnd.nextInt(30))).toLong)
      val scores = (chars ++ multi).toMap
      val w = randWord(1 + rnd.nextInt(9))
      val got = Unigram.viterbi(w, scores, 8)
      val want = bruteBest(w, scores, 8)
      assert(got == want, s"trial $trial $w: $got != $want " +
        s"(scores $scores)")
    }
  }

  test("EM promotes a dominant substring to a single piece and the " +
      "trained table is deterministic") {
    // 'hello' dominates; 'xq' is rare and has no frequent substrings
    val docs = ((1 to 50).map(i => (i.toLong, "hello world")) ++
        Seq((51L, "xq hello")))
      .toDF("doc_id", "text")
    val t = Unigram.train(docs, vocabSize = 64, maxPieceLen = 8,
      maxWordLen = 16, emIters = 1)
    val rows = t.collect().map(r => (r.getString(0), r.getInt(2),
      r.getString(3))).toSeq
    val hello = rows.find(_._1 == "hello").get
    assert(hello._2 == 1 && hello._3 == "hello",
      s"dominant word must be one piece: $hello")
    // determinism: second run bit-identical
    val t2 = Unigram.train(docs, vocabSize = 64, maxPieceLen = 8,
      maxWordLen = 16, emIters = 1)
    assert(t.collect().toSeq == t2.collect().toSeq)
  }

  test("train is partition-invariant: 1-partition and 7-partition " +
      "corpora fit bit-identical tokenizers") {
    val docs = graft.Tables.documents(spark, sf0001)
    val a = Unigram.train(docs.repartition(1)).collect().toSeq
    val b = Unigram.train(docs.repartition(7)).collect().toSeq
    assert(a == b, "EM fit must not depend on the physical layout")
  }

  test("tokenStats is consistent with train (Σ doc pieces = Σ type " +
      "cnt × pieces) and long words route to n_long") {
    val docs = graft.Tables.documents(spark, sf0001)
    val t = Unigram.train(docs)
      .select(col("cnt") * col("n_pieces"), col("cnt") * col("iscore"))
      .as[(Long, Long)].collect()
    val s = Unigram.tokenStats(docs)
      .agg(sum("n_pieces"), sum("iscore"), sum("n_long"), sum("n_words"))
      .as[(Long, Long, Long, Long)].head()
    assert(s._1 == t.map(_._1).sum, "piece totals diverge")
    assert(s._2 == t.map(_._2).sum, "score totals diverge")
    assert(s._3 == 0L) // corpus has no >16-char words
    assert(s._4 > 0L)
    // planted long word: counted in words + n_long, not pieces
    val docs2 = Seq((1L, "hello " + "z" * 20)).toDF("doc_id", "text")
    val r = Unigram.tokenStats(docs2).collect().head
    assert(r.getLong(1) == 2 && r.getLong(3) == 1,
      s"long word must count in n_words and n_long: $r")
  }
}
