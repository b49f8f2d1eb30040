package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM tokenizer training: the Viterbi DP against brute-force
  * enumeration, the deterministic tie order, planted-piece recovery
  * through EM shrinking, the single-char closure, and seed-vocab
  * integrity.
  */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def bruteForceBest(word: String, vocab: Map[String, Long],
                             total: Double, maxLen: Int): Seq[String] = {
    // enumerate all segmentations, score like the DP, apply the SAME
    // total tie order: score desc, fewer pieces, then the longest LAST
    // piece recursively leftward (compare reversed length sequences,
    // longer-first)
    def segs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(maxLen, w.length)).flatMap { l =>
        val h = w.substring(0, l)
        val ok = vocab.contains(h) || l == 1
        if (ok) segs(w.substring(l)).map(h +: _) else Seq.empty
      }
    def score(s: Seq[String]): Double =
      s.map(p => vocab.get(p).map(c => math.log(c.toDouble / total))
        .getOrElse(math.log(0.5 / total))).foldLeft(0.0)(_ + _)
    def beats(a: Seq[String], b: Seq[String]): Boolean = {
      val (sa, sb) = (score(a), score(b))
      if (sa != sb) sa > sb
      else if (a.size != b.size) a.size < b.size
      else {
        val (la, lb) = (a.map(_.length).reverse, b.map(_.length).reverse)
        la.zip(lb).find { case (x, y) => x != y }
          .forall { case (x, y) => x > y }
      }
    }
    segs(word).reduceLeft((a, b) => if (beats(b, a)) b else a)
  }

  test("viterbi equals brute-force enumeration on planted vocabs") {
    val vocab = Map("a" -> 10L, "b" -> 8L, "ab" -> 30L, "ba" -> 5L,
      "aba" -> 25L, "bab" -> 2L, "c" -> 1L)
    val total = vocab.values.sum.toDouble
    for (w <- Seq("ababab", "abab", "ba", "aabba", "cab", "abacab", "a")) {
      val dp = Unigram.viterbi(w, vocab, total, 3)
      val bf = bruteForceBest(w, vocab, total, 3)
      assert(dp.mkString("|") == bf.mkString("|"),
        s"word $w: dp=$dp bf=$bf")
      assert(dp.mkString == w, s"segmentation must concatenate to $w")
    }
  }

  test("exact score ties resolve to the longest last piece") {
    // all counts equal → ab|cd and abc|d score identically (2 pieces,
    // identical log terms); the total order picks the longer LAST piece
    val vocab = Map("a" -> 2L, "b" -> 2L, "c" -> 2L, "d" -> 2L,
      "ab" -> 2L, "cd" -> 2L, "abc" -> 2L)
    val total = vocab.values.sum.toDouble
    val dp = Unigram.viterbi("abcd", vocab, total, 3)
    assert(dp == Seq("ab", "cd"), s"got $dp")
    assert(dp == bruteForceBest("abcd", vocab, total, 3))
  }

  test("out-of-model characters fall back to floor-prob singles") {
    val vocab = Map("a" -> 5L, "ab" -> 3L)
    val out = Unigram.viterbi("axb", vocab, 8.0, 2)
    assert(out.mkString == "axb" && out.contains("x"), s"got $out")
  }

  test("EM training recovers a planted high-frequency piece") {
    // corpus dominated by the word "spark": after shrinking, "spark"
    // itself (length <= maxPieceLen) must survive as a piece and the
    // trained segmentation of "spark" must be the single piece
    val docs = (Seq.fill(200)("spark") ++ Seq.fill(5)("park") ++
      Seq.fill(5)("spa")).mkString(" ")
    val df = Seq(docs).toDF("text")
    val vocabDf = Unigram.train(df, "text", vocabSize = 8, rounds = 3,
      maxPieceLen = 5, seedSize = 50, maxWords = 100)
    val vocab = vocabDf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab.contains("spark"), s"planted piece lost: ${vocab.keys}")
    val seg = Unigram.segmentWords(df, "text", vocab, maxPieceLen = 5)
      .filter($"word" === "spark").select("segmentation")
      .as[String].collect().head
    assert(seg == "spark", s"got $seg")
  }

  test("single-char closure survives pruning — every word segments") {
    val df = Seq("zz qq zz xyzzy").toDF("text")
    val vocab = Unigram.train(df, "text", vocabSize = 2, rounds = 2,
        maxPieceLen = 3, seedSize = 10, maxWords = 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val chars = Set("z", "q", "x", "y")
    assert(chars.subsetOf(vocab.keySet),
      s"single chars must never prune: ${vocab.keySet}")
    val segs = Unigram.segmentWords(df, "text", vocab, maxPieceLen = 3)
      .select("word", "segmentation").as[(String, String)].collect()
    segs.foreach { case (w, s) =>
      assert(s.replace("|", "") == w, s"$w segmented to $s")
    }
  }

  test("seed vocab weights substrings by occurrence x word frequency") {
    val df = Seq("aba aba ab").toDF("text")
    val seed = Unigram.seedVocab(df, "text", seedSize = 100,
        maxPieceLen = 3, maxWords = 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "a" occurs 2x in each "aba" (freq 2) + 1x in "ab" (freq 1) = 5
    assert(seed("a") == 5L, s"got ${seed.get("a")}")
    assert(seed("b") == 3L)
    assert(seed("ab") == 3L)   // once per word occurrence
    assert(seed("aba") == 2L)
    assert(seed("ba") == 2L)
  }
}
