package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the BPE training loop: merge order on a hand-computed corpus,
  * greedy left-to-right overlap semantics for self-pairs (the rule the
  * DuckDB oracle replays relationally), deterministic tie-breaks, and
  * loud exhaustion.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def corpus(docs: String*) = docs.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("merge order on the classic low/lower/newest corpus") {
    // freqs: low ×3, lower ×2, newest ×2, widest ×1
    val docs = corpus("low low low lower lower newest newest widest")
    val m = Bpe.train(docs, "text", 4, wordPattern = Some("[a-z]+"))
      .orderBy("merge_rank")
      .as[(Int, String, String, Long)].collect().toSeq
    // round 1: (e,s) and (s,t) and (l,o) and (o,w) all appear; counts:
    //   l+o: low 3 + lower 2 = 5; o+w: 5; e+s 3; others <5
    //   tie 5/5 between (l,o) and (o,w) -> lexicographic: (l,o)
    assert(m(0) == ((1, "l", "o", 5L)))
    // round 2: (lo,w): 5 — the merged symbol chains immediately
    assert(m(1) == ((2, "lo", "w", 5L)))
    // round 3: (e,s): newest 2 + widest 1 = 3; (s,t): 3; (low,e)+(e,r) 2...
    //   tie 3/3 between (e,s) and (s,t) -> (e,s)
    assert(m(2) == ((3, "e", "s", 3L)))
    // round 4: (es,t): 3
    assert(m(3) == ((4, "es", "t", 3L)))
  }

  test("self-pair runs merge greedily left-to-right") {
    // 'aaaa' has three (a,a) adjacencies but only TWO merges happen:
    // [aa, aa], never a(aa)a. Round 2 must then see exactly one (aa,aa).
    val docs = corpus("aaaa aaaa b")
    val m = Bpe.train(docs, "text", 2, wordPattern = Some("[a-z]+"))
      .orderBy("merge_rank")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(m(0) == ((1, "a", "a", 6L))) // 3 adjacencies × freq 2
    assert(m(1) == ((2, "aa", "aa", 2L))) // one per word — proves [aa,aa]
  }

  test("mergeFold: non-overlapping substitution, odd-run leftover") {
    val df = Seq(Seq("a", "a", "a"), Seq("a", "b", "a", "b"),
        Seq("x"), Seq[String]())
      .toDF("syms")
    val out = df.select(Bpe.mergeFold(col("syms"), "a", "a").as("f"))
      .as[Seq[String]].collect().toSeq
    assert(out(0) == Seq("aa", "a")) // odd run: leftover single survives
    assert(out(1) == Seq("a", "b", "a", "b")) // no (a,a) adjacency
    assert(out(2) == Seq("x"))
    assert(out(3) == Seq.empty)
  }

  test("trained vocab carries each word's final segmentation") {
    val docs = corpus("low low low lower lower newest newest widest")
    val (_, vocab) = Bpe.trainWithVocab(docs, "text", 4,
      wordPattern = Some("[a-z]+"))
    val seg = vocab.select(col("word"), array_join(col("syms"), "|").as("s"))
      .as[(String, String)].collect().toMap
    // merges: (l,o), (lo,w), (e,s), (es,t)
    assert(seg("low") == "low")
    assert(seg("lower") == "low|e|r")
    assert(seg("newest") == "n|e|w|est")
    assert(seg("widest") == "w|i|d|est")
  }

  test("applyMerges reproduces trained segmentation for in-vocab words") {
    val docs = corpus("low low low lower lower newest newest widest")
    val (mergesDf, vocab) = Bpe.trainWithVocab(docs, "text", 4,
      wordPattern = Some("[a-z]+"))
    val merges = mergesDf.orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val applied = Bpe.applyMerges(vocab.select("word"), "word", merges)
      .select(col("word"), array_join(col("syms"), "|").as("a"))
      .as[(String, String)].collect().toMap
    val trained = vocab
      .select(col("word"), array_join(col("syms"), "|").as("t"))
      .as[(String, String)].collect().toMap
    assert(applied == trained)
  }

  test("applyMerges segments unseen words with learned merges") {
    val docs = corpus("low low low lower lower newest newest widest")
    val (mergesDf, _) = Bpe.trainWithVocab(docs, "text", 4,
      wordPattern = Some("[a-z]+"))
    // merges: (l,o), (lo,w), (e,s), (es,t)
    val merges = mergesDf.orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val out = Bpe.applyMerges(
        Seq("lowest", "slowest", "ow").toDF("word"), "word", merges)
      .select(col("word"), array_join(col("syms"), "|").as("s"))
      .as[(String, String)].collect().toMap
    assert(out("lowest") == "low|est")
    // 's' prefix blocks (l,o)? no — fold scans the whole array: s,l,o,...
    assert(out("slowest") == "s|low|est")
    // 'ow' alone: (l,o) and (lo,w) never fire without the 'l'
    assert(out("ow") == "o|w")
  }

  test("exhaustion throws instead of returning a short model") {
    val docs = corpus("ab ab cd")
    val e = intercept[IllegalStateException](
      Bpe.train(docs, "text", 5, wordPattern = Some("[a-z]+")).collect())
    assert(e.getMessage.contains("exhausted"))
  }

  test("vocab cap keeps the most frequent words deterministically") {
    // cap at 1 word: only 'zz' (freq 2) survives; its single merge is (z,z)
    val docs = corpus("zz zz ay by cy")
    val m = Bpe.train(docs, "text", 1, maxWords = 1,
        wordPattern = Some("[a-z]+"))
      .as[(Int, String, String, Long)].collect().toSeq
    assert(m == Seq((1, "z", "z", 2L)))
  }

  test("WordPiece objective diverges from raw-count BPE where it should") {
    // pair (a,b) is the most FREQUENT (10) but sits between very common
    // symbols (a: 100, b: 100 → score 10/10000); pair (x,y) is rare (3)
    // but exclusive (x: 3, y: 3 → score 3/9). Count-scored BPE merges
    // (a,b); likelihood-scored WordPiece must merge (x,y).
    val text = (Seq.fill(10)("ab") ++ Seq.fill(90)("a") ++
      Seq.fill(90)("b") ++ Seq.fill(3)("xy")).mkString(" ")
    val docs = corpus(text)
    val bpe = Bpe.train(docs, "text", 1, wordPattern = Some("[a-z]+"))
      .as[(Int, String, String, Long)].collect().toSeq
    assert(bpe == Seq((1, "a", "b", 10L)))
    val (wp, seg) = Bpe.trainWordPiece(docs, "text", 1,
      wordPattern = Some("[a-z]+"))
    val wpm = wp.as[(Int, String, String, Long, Long, Long)].collect().toSeq
    assert(wpm == Seq((1, "x", "y", 3L, 3L, 3L)))
    // and the substitution actually applied to the vocab table
    val xy = seg.filter(col("word") === "xy")
      .select(array_join(col("syms"), "|")).as[String].head()
    assert(xy == "xy")
  }
}
