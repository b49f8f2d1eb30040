package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The integer-exact unigram trainer: the DP against brute-force
  * enumeration under the (fewest pieces, max Σcnt, longest-last) order,
  * the out-of-model floor, and the trained model's contracts (exact
  * final size, counts = usage under the SHIPPED vocab).
  */
class UnigramExactSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def bruteForceBest(word: String, vocab: Map[String, Long],
                             maxLen: Int): Seq[String] = {
    def segs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(maxLen, w.length)).flatMap { l =>
        val h = w.substring(0, l)
        val ok = vocab.contains(h) || l == 1
        if (ok) segs(w.substring(l)).map(h +: _) else Seq.empty
      }
    def sum(s: Seq[String]): Long = s.map(vocab.getOrElse(_, 0L)).sum
    def beats(a: Seq[String], b: Seq[String]): Boolean = {
      if (a.size != b.size) a.size < b.size
      else if (sum(a) != sum(b)) sum(a) > sum(b)
      else {
        val (la, lb) = (a.map(_.length).reverse, b.map(_.length).reverse)
        la.zip(lb).find { case (x, y) => x != y }
          .forall { case (x, y) => x > y }
      }
    }
    segs(word).reduceLeft((a, b) => if (beats(b, a)) b else a)
  }

  test("exact DP equals brute-force enumeration on planted vocabs") {
    val vocab = Map("ab" -> 10L, "bc" -> 8L, "abc" -> 3L, "c" -> 5L,
      "a" -> 4L, "b" -> 2L, "d" -> 1L, "cd" -> 6L, "abcd" -> 2L)
    for (w <- Seq("abc", "abcd", "abcabc", "dabcd", "bcd", "aabbcc",
        "abcdabcd", "dddd"))
      assert(Unigram.viterbiExact(w, vocab, 4) ==
        bruteForceBest(w, vocab, 4), s"word $w")
  }

  test("fewest pieces dominates total frequency") {
    // "abc" as one 3-piece (cnt 1) beats ab+c (cnt 10+5=15) — piece
    // count is the primary key of the objective
    val vocab = Map("abc" -> 1L, "ab" -> 10L, "c" -> 5L,
      "a" -> 1L, "b" -> 1L)
    assert(Unigram.viterbiExact("abc", vocab, 4) == Seq("abc"))
  }

  test("equal piece counts: higher total frequency wins") {
    // two 2-splits of "abcd": ab+cd (3+6=9) vs abc+d — not equal length
    // pieces but both 2 pieces; a+bcd missing; ab|cd=9 vs abc|d=3+1=4
    val vocab = Map("ab" -> 3L, "cd" -> 6L, "abc" -> 3L, "d" -> 1L,
      "a" -> 1L, "b" -> 1L, "c" -> 1L)
    assert(Unigram.viterbiExact("abcd", vocab, 4) == Seq("ab", "cd"))
  }

  test("full tie resolves to the longest LAST piece") {
    // "abcd" → a+bcd vs abc+d, both 2 pieces, equal sums: longest last
    val vocab = Map("a" -> 2L, "bcd" -> 3L, "abc" -> 3L, "d" -> 2L,
      "b" -> 1L, "c" -> 1L)
    assert(Unigram.viterbiExact("abcd", vocab, 4) == Seq("a", "bcd"))
  }

  test("out-of-model chars segment as cnt-0 singles") {
    val vocab = Map("ab" -> 5L, "a" -> 1L, "b" -> 1L)
    assert(Unigram.viterbiExact("axb", vocab, 4) == Seq("a", "x", "b"))
  }

  test("trainExact: exact vocab size, counts are shipped-model usage") {
    val docs = Seq.fill(30)("hello world") ++ Seq.fill(10)("help held")
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = Unigram.trainExact(df, "text", vocabSize = 12, rounds = 2,
        maxPieceLen = 4, seedSize = 50, maxWords = 100, maxWordLen = 20,
        wordPattern = Some("[a-z]+"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.length == 12, s"got ${out.length} pieces")
    // counts must equal re-segmentation usage under the final vocab
    val vocab = out.map(t => t._1 -> math.max(t._2, 1L)).toMap
    val words = Map("hello" -> 30L, "world" -> 30L, "help" -> 10L,
      "held" -> 10L)
    val usage = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
    words.foreach { case (w, f) =>
      Unigram.viterbiExact(w, vocab, 4).foreach(p => usage(p) += f)
    }
    out.foreach { case (p, c, _) =>
      assert(c == usage(p), s"piece $p: reported $c, usage ${usage(p)}")
    }
  }

  test("words longer than maxWordLen are excluded from training") {
    val df = Seq((1L, "aa " * 50 + "abcdefghijklmnopqrstuvwxyz"))
      .toDF("doc_id", "text")
    val out = Unigram.trainExact(df, "text", vocabSize = 5, rounds = 1,
        maxPieceLen = 4, seedSize = 20, maxWords = 100, maxWordLen = 10,
        wordPattern = Some("[a-z]+"))
      .collect().map(_.getString(0)).toSet
    // the 26-char word contributes nothing: no piece beyond aa's chars
    assert(out.forall(p => p.forall(_ == 'a')))
  }
}
