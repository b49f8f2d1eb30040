package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the byte-level (GPT-2-style) BPE trainer: pre-tokenization
  * semantics (space-attached tokens, contraction suffixes, no-lookahead
  * whitespace runs), hex-pair byte symbols, hand-computed merge order,
  * and the no-OOV property on multi-byte UTF-8 input.
  */
class BpeBytesSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def corpus(docs: String*) = docs.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("GPT-2-style pre-tokenization: space attachment and contractions") {
    val docs = corpus("the cat's hat isn't here")
    val words = Bpe.byteWordCounts(docs, "text")
      .select("word").as[String].collect().toSet
    // leading spaces attach to the FOLLOWING token; contraction suffixes
    // split off as their own tokens ('s, 't)
    assert(words == Set("the", " cat", "'s", " hat", " isn", "'t", " here"))
  }

  test("trainBytes merge order on a hand-computed byte corpus") {
    // pre-tokens of "aaaa aaaa b": "aaaa", " aaaa", " b" (freq 1 each).
    // Byte symbols (hex): aaaa=[61×4]; " aaaa"=[20,61×4]; " b"=[20,62].
    // Round 1: (61,61) has 3+3=6 adjacencies — wins.
    // After greedy L→R merge: [6161,6161] and [20,6161,6161].
    // Round 2: (6161,6161) = 2 — wins.
    val docs = corpus("aaaa aaaa b")
    val m = Bpe.trainBytes(docs, "text", 2)._1
      .orderBy("merge_rank")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(m(0) == ((1, "61", "61", 6L)))
    assert(m(1) == ((2, "6161", "6161", 2L)))
  }

  test("multi-byte UTF-8 input has no OOV: every byte is a symbol") {
    // "éé" is UTF-8 C3 A9 C3 A9 — four byte symbols, and the dominant
    // pair (C3,A9) merges first: the char-level trainer's astral/BMP
    // caveat does not exist at the byte level.
    val docs = corpus("éé éé éé")
    val (m, vocab) = Bpe.trainBytes(docs, "text", 1)
    val first = m.orderBy("merge_rank")
      .as[(Int, String, String, Long)].collect().head
    assert(first._2 == "C3" && first._3 == "A9")
    val segs = vocab.select(array_join(col("syms"), "|").as("s"))
      .as[String].collect().toSet
    // both pre-tokens ("éé" and " éé") segment into merged C3A9 pieces
    assert(segs == Set("C3A9|C3A9", "20|C3A9|C3A9"))
  }

  test("whitespace runs stay single pre-tokens (no-lookahead variant)") {
    // Under GPT-2's exact pattern, "\s+(?!\S)" would yield "a", " ", " b";
    // the RE2-compatible variant has no lookahead, so the greedy "\s+"
    // takes the whole run: "a", "  ", "b". What matters is that BOTH
    // engines apply identical leftmost-first alternation and that the
    // pre-tokens cover the input losslessly.
    val docs = corpus("a  b")
    val all = Bpe.byteWordCounts(docs, "text")
      .select("word").as[String].collect().toSet
    assert(all == Set("a", "  ", "b"))
  }
}
