package graft.ext

import graft.SparkSpec

/** BPE training/application vs an independent collections-only
  * reference that merges SYMBOL LISTS directly (the true Sennrich
  * semantics) — proving the engine's string-replace formulation is
  * the same algorithm, including the greedy-left overlap rule. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: list-based BPE. Greedy left-to-right merge: on a
    * match, consume both symbols (never re-match into the result). */
  private def refMergeWord(syms: List[String],
      pair: (String, String)): List[String] = syms match {
    case a :: b :: rest if (a, b) == pair =>
      (a + b) :: refMergeWord(rest, pair)
    case a :: rest => a :: refMergeWord(rest, pair)
    case Nil => Nil
  }

  private def refTrain(wordCnt: Map[String, Long], rounds: Int)
      : (Seq[(String, String, Long)], Map[List[String], Long]) = {
    var vocab: Map[List[String], Long] = wordCnt.map { case (w, c) =>
      (w.toList.map(_.toString) :+ Bpe.EndMark) -> c
    }
    var merges = Vector.empty[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val pairs = vocab.toSeq.flatMap { case (syms, c) =>
        syms.zip(syms.tail).map(_ -> c)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      if (pairs.nonEmpty) {
        val ((l, r), c) = pairs.minBy { case ((l, r), c) => (-c, l, r) }
        merges :+= ((l, r, c))
        vocab = vocab.toSeq.map { case (syms, cnt) =>
          refMergeWord(syms, (l, r)) -> cnt
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
    (merges, vocab)
  }

  test("trainMerges == list-based reference BPE, merge by merge, " +
      "including the greedy-left overlap rule (aaa -> [aa, a])") {
    val docsSeq = Seq(
      1L -> "low low low lower lower newest newest newest newest",
      2L -> "wider wider new newest low",
      3L -> "aaa aaa aaa aaa aaa aaa b",   // overlap: (a,a) merges left
      4L -> "ab ab ba")                    // junction safety
    val df = docsSeq.toDF("doc_id", "text")
    val rounds = 10
    val got = Bpe.trainMerges(df, rounds)
      .map(m => (m.left, m.right, m.cnt))
    val wordCnt = docsSeq.flatMap(_._2.split(" "))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (want, refVocab) = refTrain(wordCnt, rounds)
    assert(got == want, s"merges diverged:\n got=$got\nwant=$want")

    // per-word final symbol counts agree too (the full working state,
    // not just the argmax trace)
    val merges = Bpe.trainMerges(df, rounds)
    val perWord = wordCnt.keys.toSeq.sorted.map { w =>
      val syms = refVocab.keys.find(_.mkString == w + Bpe.EndMark)
      w -> syms.map(_.length)
    }
    import org.apache.spark.sql.functions._
    val sparkCounts = df
      .select(explode(split(col("text"), " ")).as("w")).distinct()
      .select(col("w"), size(split(trim(
        Bpe.applyMerges(Bpe.symInit(col("w")), merges)), "  "))
        .as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    for ((w, refN) <- perWord)
      assert(refN.contains(sparkCounts(w)),
        s"word '$w': spark ${sparkCounts(w)} vs ref $refN")
  }

  test("256 rounds (production-scale merge count) == list-based " +
      "reference, merge by merge, on a 600-type corpus") {
    // seeded pseudo-random corpus: ~600 distinct words, zipf-ish
    // counts — enough pair material to sustain 256 merges (total
    // available merges ≈ Σ(len+1) − types ≈ 4.5k)
    val rnd = new scala.util.Random(271828)
    val alpha = "abcdefghij"
    val vocabWords = (0 until 600).map { _ =>
      val n = 3 + rnd.nextInt(10)
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }.distinct
    val wordCnt = vocabWords.zipWithIndex
      .map { case (w, i) => w -> (1L + (600 - i) / 7) }.toMap
    val docs = wordCnt.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((w, c), i) =>
        (i.toLong, Seq.fill(c.toInt)(w).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val rounds = 256
    val got = Bpe.trainMerges(df, rounds).map(m => (m.left, m.right, m.cnt))
    assert(got.size == rounds, s"expected $rounds merges, got ${got.size}")
    val (want, _) = refTrain(wordCnt, rounds)
    assert(got == want,
      s"diverged at merge ${got.zip(want).indexWhere(p => p._1 != p._2)}")
  }

  test("distributed loop ≡ local finish, merge for merge (the " +
      "localTypeLimit switch must be invisible)") {
    val df = Seq(
      1L -> "low low low lower lower newest newest newest newest",
      2L -> "wider wider new newest low aaa aaa ab ba")
      .toDF("doc_id", "text")
    val local = Bpe.trainMerges(df, 12)
    val dist = Bpe.trainMerges(df, 12, localTypeLimit = 0L)
    assert(local == dist,
      s"local=$local\ndist=$dist")
  }

  test("property: applyMerges (string replace) ≡ list-semantics " +
      "merge for 300 pseudo-random words over an alphabet with " +
      "regex-special characters, under a stacked merge list") {
    // deterministic pseudo-random corpus; alphabet deliberately
    // includes regex/replacement metacharacters — the literal
    // `replace` formulation must be immune to them
    val alpha = "ab.$\\c*"
    val rnd = new scala.util.Random(42)
    val words = (0 until 300).map { _ =>
      val n = 1 + rnd.nextInt(10)
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }.distinct
    // a stacked merge list, including merges of merged symbols
    val merges = Seq(
      Bpe.Merge(1, "a", "b", 0), Bpe.Merge(2, "ab", "ab", 0),
      Bpe.Merge(3, ".", "$", 0), Bpe.Merge(4, "\\", "c", 0),
      Bpe.Merge(5, ".$", "\\c", 0), Bpe.Merge(6, "*", "*", 0),
      Bpe.Merge(7, "a", Bpe.EndMark, 0))
    def refApply(w: String): List[String] =
      merges.foldLeft(w.map(_.toString).toList :+ Bpe.EndMark) {
        (syms, m) =>
          val out = scala.collection.mutable.ListBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == m.left &&
                syms(i + 1) == m.right) {
              out += m.left + m.right; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.toList
      }
    import org.apache.spark.sql.functions._
    val got = words.toDF("w")
      .select(col("w"), split(trim(
        Bpe.applyMerges(Bpe.symInit(col("w")), merges)), "  ")
        .as("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList)
      .toMap
    for (w <- words)
      assert(got(w) == refApply(w),
        s"word '$w': spark ${got(w)} vs ref ${refApply(w)}")
  }

  test("tokenStatsFast (memoized local apply) ≡ tokenStats (replace " +
      "chain), row for row, on the real sf0.001 corpus at 8 rounds") {
    val dd = graft.Tables.documents(spark, sf0001)
    val chain = Bpe.tokenStats(dd, 8).collect().toSeq
    val fast = Bpe.tokenStatsFast(dd, Bpe.trainMerges(dd, 8))
      .collect().toSeq
    assert(fast.nonEmpty && fast == chain,
      s"fast=${fast.size} chain=${chain.size}")
  }

  test("tokenStatsFast ≡ the replace-chain apply under a 256-merge " +
      "production list (per-word, incl. memo correctness across docs)") {
    val rnd = new scala.util.Random(314159)
    val alpha = "abcdefghij"
    val vocabWords = (0 until 600).map { _ =>
      val n = 3 + rnd.nextInt(10)
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }.distinct
    val docs = vocabWords.grouped(40).zipWithIndex
      .map { case (ws, i) => (i.toLong, (ws ++ ws.take(7)).mkString(" ")) }
      .toSeq
    val df = docs.toDF("doc_id", "text")
    val merges = Bpe.trainMerges(df, 256)
    assert(merges.size == 256)
    val fast = Bpe.tokenStatsFast(df, merges).collect().toSeq
    // reference: the Spark literal-replace expression chain itself
    import org.apache.spark.sql.functions._
    val words = filter(split(col("text"), " "), t => length(t) > 0)
    val nBpe = aggregate(words, lit(0L), (acc, t) => acc +
      size(split(trim(Bpe.applyMerges(Bpe.symInit(t), merges)), "  "))
        .cast("long"))
    val chain = df.select(col("doc_id"),
        size(words).cast("long").as("n_words"), nBpe.as("n_bpe"))
      .orderBy("doc_id").collect().toSeq
    assert(fast == chain, s"fast=${fast.take(3)} chain=${chain.take(3)}")
  }

  test("tokenStats: n_bpe sums per-word symbol counts; merging can " +
      "only shrink counts; zero-merge count = chars + words") {
    val df = Seq(1L -> "low low lower", 2L -> "newest new")
      .toDF("doc_id", "text")
    val out = Bpe.tokenStats(df, 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L)._1 == 3 && out(2L)._1 == 2)
    // upper bound: unmerged = sum(chars) + n_words (</w> each)
    assert(out(1L)._2 <= "lowlowlower".length + 3)
    assert(out(2L)._2 <= "newestnew".length + 2)
    // and with 0 rounds it's exactly that
    val raw = Bpe.tokenStats(df, 0).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(raw(1L) == "lowlowlower".length + 3)
    assert(raw(2L) == "newestnew".length + 2)
  }
}
