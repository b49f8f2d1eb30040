package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016) — the
  * iterative merge-learning loop that produces the merge table a
  * tokenizer like [[graft.functions]]' `subword_encode` consumes. The
  * reference engine has no tokenizer trainer; this is part of the
  * LLM-pipeline extension surface (pair COUNTING for one round already
  * exists as `TextAnalysis.bpePairCounts` — this runs the full loop).
  *
  * Algorithm: words are counted once over the corpus, each distinct word
  * becomes its character-symbol sequence, then `numMerges` rounds of
  * (count adjacent symbol pairs weighted by word frequency → take the
  * argmax pair, ties broken by (lhs, rhs) ascending → merge every
  * non-overlapping occurrence left-to-right). The ordered merge list IS
  * the trained tokenizer model.
  *
  * Scale posture: the ONLY corpus-scale work is the word-count
  * aggregation (map-side combined, one shuffle). The merge loop runs on
  * the distinct-word table capped at `maxWords` rows — model fitting on
  * a vocabulary-sized working set, same policy as the sampled-Lloyd PQ
  * trainer. Per round: one vocab-sized aggregation plus a ONE-ROW
  * collect (the argmax pair — bounded model metadata, not row data).
  * Lineage is truncated per round (`localCheckpoint`) so the plan stays
  * O(1)-deep instead of O(numMerges).
  *
  * Determinism: counts are integer-exact; the argmax tie-break is total
  * ((cnt desc, lhs asc, rhs asc) — binary string order, which matches
  * the DuckDB oracle's default collation on ASCII symbols). Merging is
  * greedy left-to-right within a word, so an overlapping self-pair run
  * like `aaaa` merges to `[aa, aa]`, never `a(aa)a` — the oracle
  * replays the same rule relationally as even-rank-in-run marking.
  *
  * Unicode caveat: initial symbols come from `split(word, '')`, which is
  * UTF-16-unit based in Spark but codepoint-based in DuckDB — constrain
  * `wordPattern` to BMP characters (e.g. `[a-z]+`) when oracle parity
  * matters; astral input stays self-consistent within Spark but would
  * split surrogate pairs.
  */
object Bpe {

  /** Corpus word frequencies: whitespace pre-tokenization, optionally
    * keeping only words fully matching `wordPattern` (anchored). The one
    * corpus-scale pass of BPE training.
    */
  def wordCounts(docs: DataFrame, textCol: String,
                 wordPattern: Option[String] = None): DataFrame = {
    val words = docs.select(explode(split(col(textCol), " ")).as("word"))
    val kept = wordPattern match {
      // \A..\z, not ^..$: Java's $ matches BEFORE a trailing newline, so
      // a token like "foo\n" would pass the Spark filter but fail the
      // oracle's regexp_full_match and diverge every downstream merge
      case Some(p) => words.filter(col("word").rlike(s"\\A(?:$p)\\z"))
      case None    => words.filter(length(col("word")) > 0)
    }
    kept.groupBy("word").agg(count(lit(1)).as("freq"))
  }

  /** One merge round's substitution as a pure projection: fold the
    * symbol array left-to-right, replacing each non-overlapping
    * (lhs, rhs) adjacency with the concatenated token. Codegen'd HOF —
    * no shuffle, no UDF.
    */
  def mergeFold(syms: Column, lhs: String, rhs: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(lhs) && x === lit(rhs),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(lhs + rhs))))
          .otherwise(concat(acc, array(x))))

  /** Train `numMerges` BPE merges over the corpus. Returns the merge
    * table (merge_rank, lhs, rhs, cnt) in learned order — `cnt` is the
    * weighted adjacency count that won the round. Throws if the corpus
    * runs out of adjacent pairs before `numMerges` rounds (a silent
    * short model would corrupt any tokenizer built from it).
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 10000,
            wordPattern: Option[String] = None): DataFrame =
    trainWithVocab(docs, textCol, numMerges, maxWords, wordPattern)._1

  /** GPT-2-STYLE pre-tokenization pattern: contraction suffixes, then
    * space-attached letter / digit / punctuation runs, then whitespace
    * runs. Deliberately DIFFERS from GPT-2's exact pattern in one place:
    * the `\s+(?!\S)` lookahead is dropped (RE2 — DuckDB's regex engine —
    * has no lookahead, and cross-engine replayability is a design
    * invariant of every trainer here). Alternation is leftmost-first in
    * BOTH Java regex and RE2, so the two engines tokenize identically.
    */
  val Gpt2Pattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Corpus PRE-TOKEN frequencies under a GPT-2-style regex — the
    * byte-level trainer's corpus pass. Unlike [[wordCounts]]' whitespace
    * split, pre-tokens keep their leading space (the GPT-2 convention
    * that makes detokenization lossless).
    */
  def byteWordCounts(docs: DataFrame, textCol: String,
                     pattern: String = Gpt2Pattern): DataFrame =
    docs.select(explode(
        regexp_extract_all(col(textCol), lit(pattern), lit(0))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** BYTE-LEVEL BPE training (the GPT-2 / tiktoken family): pre-tokenize
    * with [[Gpt2Pattern]], expand every pre-token to its UTF-8 BYTES, and
    * run the merge loop over byte symbols — the alphabet is 256 symbols,
    * every string is representable, and there is no out-of-vocabulary
    * input by construction. This is the production-tokenizer shape;
    * word-level [[train]] remains the classic Sennrich form.
    *
    * Symbols are 2-hex-digit strings per byte ("74", "68", merged
    * "7468") rather than remapped printable codepoints (GPT-2's
    * bytes_to_unicode): hex is pure ASCII, so symbol sort order — the
    * argmax tie-break — is identical in Spark and DuckDB, and
    * `hex(encode(word))` computes the same symbol stream in both
    * engines, making the whole trainer oracle-replayable. A trailing
    * benefit: UTF-8 bytes sidestep the UTF-16-vs-codepoint split caveat
    * of the char-level trainer — astral input is just more bytes.
    *
    * Same scale posture as [[train]]: one corpus-scale pre-token count
    * (map-side combined), then vocab-capped merge rounds with a one-row
    * argmax collect each.
    */
  def trainBytes(docs: DataFrame, textCol: String, numMerges: Int,
                 maxWords: Int = 10000,
                 pattern: String = Gpt2Pattern): (DataFrame, DataFrame) = {
    require(numMerges >= 1, "bpeTrainBytes: numMerges must be >= 1")
    val vocab0 = byteWordCounts(docs, textCol, pattern)
      .orderBy(desc("freq"), col("word"))
      .limit(maxWords)
      .withColumn("__hex", hex(encode(col("word"), "UTF-8")))
      .select(col("word"), col("freq"),
        expr("transform(sequence(1, length(__hex) DIV 2)," +
          " i -> substring(__hex, 2*i-1, 2))").as("syms"))
      .localCheckpoint(true) // cut lineage to the corpus scan
    runMergeLoop(vocab0, numMerges)
  }

  /** [[train]] plus the trained segmentation: the vocab table's final
    * symbol sequences after all merges — BPE INFERENCE for every
    * in-vocabulary word (applying the merge list in rank order to a
    * known word reproduces exactly its training-time segmentation, so
    * the vocab table doubles as the tokenizer's fast path: broadcast it
    * and tokenization of in-vocab words is a lookup, with the merge
    * loop needed only for unseen words).
    */
  def trainWithVocab(docs: DataFrame, textCol: String, numMerges: Int,
                     maxWords: Int = 10000,
                     wordPattern: Option[String] = None)
      : (DataFrame, DataFrame) = {
    require(numMerges >= 1, "bpeTrain: numMerges must be >= 1")
    // Vocab cap: top-maxWords by (freq desc, word asc) — deterministic.
    // At real scale prefer a min-frequency threshold (no global sort of
    // the distinct-word table); the capped sort here is TakeOrdered-
    // sized, bounded by maxWords.
    val vocab0 = wordCounts(docs, textCol, wordPattern)
      .orderBy(desc("freq"), col("word"))
      .limit(maxWords)
      // array_remove: Spark's split('') keeps a trailing empty string
      // (Pattern.split with limit -1); symbols are never empty
      .select(col("word"), col("freq"),
        array_remove(split(col("word"), ""), "").as("syms"))
      .localCheckpoint(true) // cut lineage to the corpus scan
    runMergeLoop(vocab0, numMerges)
  }

  /** WORDPIECE-scored training (Wu et al. 2016 / BERT): the same merge
    * loop as BPE, but each round picks the pair maximizing
    * `count(pair) / (count(lhs) · count(rhs))` — likelihood gain of the
    * merge under a unigram factorization — instead of raw pair count.
    * Same corpus pass, same vocab-capped rounds, same greedy
    * left-to-right substitution; with [[train]] (count-scored),
    * [[trainBytes]] (byte-level) and [[Unigram]] (prune-based) this
    * completes the classic subword-trainer families.
    *
    * Score comparison is CROSS-ENGINE DETERMINISTIC despite being a
    * ratio: each factor (cnt, lhs_cnt, rhs_cnt) is an integer ≤ 2⁵³,
    * exactly representable as a double; the product and division are
    * single correctly-rounded IEEE ops — Spark and DuckDB compute
    * bit-identical scores, and the (score desc, lhs, rhs) argmax picks
    * the same pair. (Each factor is cast to double BEFORE multiplying —
    * the integer product lc·rc could exceed 2⁶³ at corpus scale, where
    * Spark would wrap and DuckDB would raise. Two genuinely different
    * rationals closer than one ulp tie on the double and break by
    * symbol order — identically in both engines.)
    *
    * Returns (merge table with the score's integer factors, final
    * segmentation) — the emitted columns are all BIGINT/STRING so the
    * oracle hash-gates the whole run.
    */
  def trainWordPiece(docs: DataFrame, textCol: String, numMerges: Int,
                     maxWords: Int = 10000,
                     wordPattern: Option[String] = None)
      : (DataFrame, DataFrame) = {
    require(numMerges >= 1, "trainWordPiece: numMerges must be >= 1")
    val vocab0 = wordCounts(docs, textCol, wordPattern)
      .orderBy(desc("freq"), col("word"))
      .limit(maxWords)
      .select(col("word"), col("freq"),
        array_remove(split(col("word"), ""), "").as("syms"))
      .localCheckpoint(true)
    runMergeLoop(vocab0, numMerges, wordPiece = true)
  }

  /** The shared merge loop over an initialized (word, freq, syms) vocab
    * table — per round: pair counts, one-row argmax collect, HOF
    * substitution, lineage cut. Char-level [[trainWithVocab]] and
    * byte-level [[trainBytes]] differ only in how `syms` is seeded;
    * `wordPiece = true` swaps the round objective for the
    * likelihood-gain score (see [[trainWordPiece]]) and adds the score's
    * integer factors to the merge table.
    */
  private def runMergeLoop(vocab0: DataFrame, numMerges: Int,
                           wordPiece: Boolean = false)
      : (DataFrame, DataFrame) = {
    val spark = vocab0.sparkSession
    var vocab = vocab0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Long, Long)]
    var r = 0
    while (r < numMerges) {
      val pairs = vocab.select(col("freq"),
          explode(zip_with(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (a, b) => struct(a.as("lhs"), b.as("rhs")))).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum("freq").as("cnt"))
      val best =
        if (!wordPiece)
          pairs.orderBy(desc("cnt"), col("lhs"), col("rhs"))
            .withColumn("lc", lit(0L)).withColumn("rc", lit(0L))
            .select("lhs", "rhs", "cnt", "lc", "rc")
            .limit(1).collect()
        else {
          // per-symbol weighted counts (vocab-sized aggregation, like the
          // pair counts); both factors ≤ Σfreq·len ≪ 2⁵³
          val symCnt = vocab
            .select(explode(col("syms")).as("sym"), col("freq"))
            .groupBy(col("sym")).agg(sum("freq").as("scnt"))
          pairs
            .join(symCnt.select(col("sym").as("lhs"), col("scnt").as("lc")),
              Seq("lhs"))
            .join(symCnt.select(col("sym").as("rhs"), col("scnt").as("rc")),
              Seq("rhs"))
            // each FACTOR is cast to double before multiplying: the long
            // product lc·rc can exceed 2⁶³ on a web-scale corpus (Spark
            // would wrap silently, DuckDB would raise); double×double
            // cannot overflow and both engines round the product
            // identically from exactly-represented ≤2⁵³ factors
            .withColumn("__score",
              col("cnt").cast("double") /
                (col("lc").cast("double") * col("rc").cast("double")))
            .orderBy(desc("__score"), col("lhs"), col("rhs"))
            .select("lhs", "rhs", "cnt", "lc", "rc")
            .limit(1).collect()
        }
      if (best.isEmpty)
        throw new IllegalStateException(
          s"bpeTrain: corpus exhausted after ${merges.size} merges " +
            s"($numMerges requested) — every word is a single symbol")
      val Row(l: String, rh: String, c: Long, lc: Long, rc: Long) = best(0)
      merges += ((r + 1, l, rh, c, lc, rc))
      vocab = vocab.withColumn("syms", mergeFold(col("syms"), l, rh))
        .localCheckpoint(true)
      r += 1
    }
    import spark.implicits._
    val mergeDf =
      if (wordPiece)
        merges.toSeq.toDF("merge_rank", "lhs", "rhs", "cnt", "lhs_cnt", "rhs_cnt")
      else
        merges.toSeq.map(m => (m._1, m._2, m._3, m._4))
          .toDF("merge_rank", "lhs", "rhs", "cnt")
    (mergeDf, vocab)
  }

  /** The DuckDB oracle: the IDENTICAL training loop as one generated
    * `numMerges`-round CTE chain. Greedy left-to-right merging is
    * replayed relationally — a position merges iff it starts the pair
    * and sits at an EVEN rank within its run of consecutive matched
    * positions (for lhs ≠ rhs runs are singletons, so the rules agree
    * trivially; for self-pairs the even-rank rule IS left-to-right
    * greedy). CTEs referenced more than once are MATERIALIZED — without
    * it DuckDB re-inlines the round chain per reference, exponentially.
    */
  def oracleSql(table: String, textCol: String, numMerges: Int,
                maxWords: Int, wordPattern: String): String = {
    val union = (1 to numMerges)
      .map(r => s"SELECT $r AS merge_rank, lhs, rhs, cnt FROM best$r")
      .mkString("\nUNION ALL\n")
    oracleChain(table, textCol, numMerges, maxWords, wordPattern) +
      s"""
         |SELECT merge_rank, lhs, rhs, cnt FROM (
         |$union
         |) ORDER BY merge_rank""".stripMargin
  }

  /** Oracle for the trained segmentation ([[trainWithVocab]]._2): the
    * final symbol table after all merges, tokens joined with '|' so the
    * hashed output is a plain string column.
    */
  def segmentOracleSql(table: String, textCol: String, numMerges: Int,
                       maxWords: Int, wordPattern: String): String =
    oracleChain(table, textCol, numMerges, maxWords, wordPattern) +
      s"""
         |SELECT word, freq, array_to_string(syms, '|') AS segmentation
         |FROM syms$numMerges ORDER BY word""".stripMargin

  /** Oracle for the corpus fertility/compression report: integer
    * aggregates over the final segmentation table.
    */
  def fertilityOracleSql(table: String, textCol: String, numMerges: Int,
                         maxWords: Int, wordPattern: String): String =
    oracleChain(table, textCol, numMerges, maxWords, wordPattern) +
      s"""
         |SELECT CAST((SELECT count(*) FROM syms$numMerges) AS BIGINT) AS n_words,
         |  CAST((SELECT sum(freq) FROM syms$numMerges) AS BIGINT) AS corpus_tokens,
         |  CAST((SELECT sum(freq * len(syms)) FROM syms$numMerges) AS BIGINT)
         |    AS weighted_pieces,
         |  CAST((SELECT count(DISTINCT piece) FROM
         |        (SELECT unnest(syms) AS piece FROM syms$numMerges)) AS BIGINT)
         |    AS distinct_pieces""".stripMargin

  /** Apply an ordered merge list to arbitrary words — BPE inference for
    * words the training corpus never saw (the vocab-lookup fast path of
    * [[trainWithVocab]] only covers known words). Rank-order folds are
    * EXACTLY the training-time substitution, so in-vocab words reproduce
    * their trained segmentation by construction. Each merge adds one HOF
    * projection; lineage is checkpoint-truncated every 4 merges so plan
    * depth and codegen size stay bounded. For production-sized merge
    * lists (32k+) this chain is the wrong shape — use the codegen'd
    * greedy `subword_encode` over the trained vocab instead and accept
    * the greedy/BPE segmentation difference, or run the per-word
    * min-rank loop in a typed mapPartitions.
    */
  def applyMerges(words: DataFrame, wordCol: String,
                  merges: Seq[(String, String)]): DataFrame =
    applyLoop(words.withColumn("syms",
      array_remove(split(col(wordCol), ""), "")), merges)

  /** [[applyMerges]] for a BYTE-LEVEL merge list ([[trainBytes]]):
    * identical rank-order fold, but the seed symbols are the word's
    * UTF-8 bytes as hex pairs — so any string, OOV or astral, is
    * representable (the no-OOV property of byte-level BPE).
    */
  def applyMergesBytes(words: DataFrame, wordCol: String,
                       merges: Seq[(String, String)]): DataFrame =
    applyLoop(words
      .withColumn("__hex", hex(encode(col(wordCol), "UTF-8")))
      .withColumn("syms",
        expr("transform(sequence(1, length(__hex) DIV 2)," +
          " i -> substring(__hex, 2*i-1, 2))"))
      .drop("__hex"), merges)

  private def applyLoop(seeded: DataFrame,
                        merges: Seq[(String, String)]): DataFrame = {
    var df = seeded
    merges.zipWithIndex.foreach { case ((l, rh), i) =>
      df = df.withColumn("syms", mergeFold(col("syms"), l, rh))
      if ((i + 1) % 4 == 0 && i + 1 < merges.size) df = df.localCheckpoint(true)
    }
    df
  }

  /** Oracle for [[applyMerges]] over OOV words derived from the vocab
    * (`word || suffix`): the training chain's best1..bestK pairs replay
    * over the suffixed words with the same relational merge rounds.
    */
  def applyOracleSql(table: String, textCol: String, numMerges: Int,
                     maxWords: Int, wordPattern: String,
                     suffix: String): String =
    oracleChain(table, textCol, numMerges, maxWords, wordPattern) +
      s""",
         |aov0 AS (SELECT word || '$suffix' AS word,
         |         string_split(word || '$suffix', '') AS syms FROM vocab),
         |${applyRoundsSql(numMerges)}
         |SELECT word, array_to_string(syms, '|') AS segmentation
         |FROM aov$numMerges ORDER BY word""".stripMargin

  /** [[applyMergesBytes]] oracle: the byte-level training chain's
    * best1..bestK merges replay over the suffixed pre-tokens' hex-pair
    * byte symbols — same relational apply rounds as the char-level form.
    */
  def bytesApplyOracleSql(table: String, textCol: String, numMerges: Int,
                          maxWords: Int, suffix: String,
                          pattern: String = Gpt2Pattern): String =
    bytesOracleChain(table, textCol, numMerges, maxWords, pattern) +
      s""",
         |aov0 AS (
         |  SELECT word || '$suffix' AS word,
         |         [substring(hex(encode(word || '$suffix')), 2*i-1, 2)
         |          for i in range(1, length(hex(encode(word || '$suffix')))//2 + 1)] AS syms
         |  FROM vocab),
         |${applyRoundsSql(numMerges)}
         |SELECT word, array_to_string(syms, '|') AS segmentation
         |FROM aov$numMerges ORDER BY word""".stripMargin

  /** Oracle for the PERSISTED-tokenizer apply (`x_bpe_persisted`): the
    * merge rounds read their (lhs, rhs) from the saved merge-table
    * parquet instead of re-deriving them from the corpus — proving the
    * on-disk artifact alone reproduces the trained segmentation. The
    * probe words are derived from the merges themselves (`lhs‖rhs‖qq`,
    * guaranteed OOV), so serve time touches NO corpus table at all.
    */
  def persistedApplyOracleSql(mergesGlob: String, numMerges: Int): String = {
    val bests = (1 to numMerges)
      .map(r => s"best$r AS (SELECT lhs, rhs FROM m WHERE merge_rank = $r)")
      .mkString(",\n")
    s"""WITH m AS (SELECT merge_rank, lhs, rhs
       |           FROM read_parquet('$mergesGlob')),
       |$bests,
       |vocab AS (SELECT DISTINCT lhs || rhs || 'qq' AS word FROM m),
       |aov0 AS (SELECT word, string_split(word, '') AS syms FROM vocab),
       |${applyRoundsSql(numMerges)}
       |SELECT word, array_to_string(syms, '|') AS segmentation
       |FROM aov$numMerges ORDER BY word""".stripMargin
  }

  /** The shared OOV-apply rounds: one relational greedy-merge round per
    * trained rank, reading each round's (lhs, rhs) from the training
    * chain's `best$r` CTEs.
    */
  private def applyRoundsSql(numMerges: Int): String = {
    val rounds = (1 to numMerges).map { r =>
      val prev = if (r == 1) "aov0" else s"aov${r - 1}"
      s"""apos$r AS (
         |  SELECT word, i, syms[i] AS sym,
         |         lead(syms[i]) OVER (PARTITION BY word ORDER BY i) AS nxt
         |  FROM $prev, UNNEST(range(1, len(syms)+1)) AS u(i)
         |),
         |aov$r AS MATERIALIZED (
         |  SELECT word, list(sym ORDER BY i) AS syms
         |  FROM (
         |    SELECT word, i,
         |           CASE WHEN mrg = 1 THEN sym || (SELECT rhs FROM best$r) ELSE sym END AS sym,
         |           lag(mrg) OVER (PARTITION BY word ORDER BY i) AS consumed
         |    FROM (
         |      SELECT word, i, sym, mt,
         |             CASE WHEN mt = 1 AND (ROW_NUMBER() OVER (PARTITION BY word, grp ORDER BY i) - 1) % 2 = 0
         |                  THEN 1 ELSE 0 END AS mrg
         |      FROM (
         |        SELECT word, i, sym, mt,
         |               CASE WHEN mt = 1 THEN i - ROW_NUMBER() OVER (PARTITION BY word, mt ORDER BY i) END AS grp
         |        FROM (
         |          SELECT word, i, sym,
         |               CASE WHEN sym = (SELECT lhs FROM best$r) AND nxt = (SELECT rhs FROM best$r)
         |                    THEN 1 ELSE 0 END AS mt
         |          FROM apos$r))))
         |  WHERE consumed IS NULL OR consumed = 0
         |  GROUP BY word
         |)""".stripMargin
    }
    rounds.mkString(",\n")
  }

  /** Oracle for the train→apply composite: per-document word and
    * subtoken counts under the freshly trained tokenizer — the corpus
    * words join the final segmentation table and sum its lengths.
    */
  def tokenCountOracleSql(table: String, textCol: String, numMerges: Int,
                          maxWords: Int, wordPattern: String): String =
    oracleChain(table, textCol, numMerges, maxWords, wordPattern) +
      s"""
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |       CAST(SUM(len(syms)) AS BIGINT) AS n_subtokens
         |FROM (SELECT doc_id, unnest(string_split($textCol, ' ')) AS word
         |      FROM $table) w
         |JOIN syms$numMerges USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** DuckDB replay of [[trainBytes]]: the byte-level prelude (GPT-2-style
    * regexp pre-tokenization, hex-pair byte symbols — `hex(encode(w))`
    * computes the identical symbol stream in both engines) feeding the
    * same relational merge rounds as the char-level oracle.
    */
  def bytesOracleSql(table: String, textCol: String, numMerges: Int,
                     maxWords: Int, pattern: String = Gpt2Pattern): String = {
    val union = (1 to numMerges)
      .map(r => s"SELECT $r AS merge_rank, lhs, rhs, cnt FROM best$r")
      .mkString("\nUNION ALL\n")
    bytesOracleChain(table, textCol, numMerges, maxWords, pattern) +
      s"""
         |SELECT merge_rank, lhs, rhs, cnt FROM (
         |$union
         |) ORDER BY merge_rank""".stripMargin
  }

  /** Oracle for the byte-level trained segmentation ([[trainBytes]]._2):
    * the final hex-pair symbol table after all merges.
    */
  def bytesSegmentOracleSql(table: String, textCol: String, numMerges: Int,
                            maxWords: Int,
                            pattern: String = Gpt2Pattern): String =
    bytesOracleChain(table, textCol, numMerges, maxWords, pattern) +
      s"""
         |SELECT word, freq, array_to_string(syms, '|') AS segmentation
         |FROM syms$numMerges ORDER BY word""".stripMargin

  /** Oracle for the byte-level fertility report — same integer
    * aggregates as [[fertilityOracleSql]] over the byte chain.
    */
  def bytesFertilityOracleSql(table: String, textCol: String, numMerges: Int,
                              maxWords: Int,
                              pattern: String = Gpt2Pattern): String =
    bytesOracleChain(table, textCol, numMerges, maxWords, pattern) +
      s"""
         |SELECT CAST((SELECT count(*) FROM syms$numMerges) AS BIGINT) AS n_words,
         |  CAST((SELECT sum(freq) FROM syms$numMerges) AS BIGINT) AS corpus_tokens,
         |  CAST((SELECT sum(freq * len(syms)) FROM syms$numMerges) AS BIGINT)
         |    AS weighted_pieces,
         |  CAST((SELECT count(DISTINCT piece) FROM
         |        (SELECT unnest(syms) AS piece FROM syms$numMerges)) AS BIGINT)
         |    AS distinct_pieces""".stripMargin

  private def bytesOracleChain(table: String, textCol: String, numMerges: Int,
                               maxWords: Int, pattern: String): String = {
    val p = pattern.replace("'", "''")
    s"""WITH wc AS MATERIALIZED (
       |  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(regexp_extract_all($textCol, '$p')) AS w FROM $table)
       |  WHERE length(w) > 0
       |  GROUP BY w
       |),
       |vocab AS MATERIALIZED (SELECT word, freq FROM wc ORDER BY freq DESC, word LIMIT $maxWords),
       |syms0 AS (
       |  SELECT word, freq,
       |         [substring(hex(encode(word)), 2*i-1, 2)
       |          for i in range(1, length(hex(encode(word)))//2 + 1)] AS syms
       |  FROM vocab
       |),
       |${oracleRounds(numMerges)}""".stripMargin
  }

  private def oracleChain(table: String, textCol: String, numMerges: Int,
                          maxWords: Int, wordPattern: String,
                          wordPiece: Boolean = false): String =
    s"""WITH wc AS MATERIALIZED (
       |  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split($textCol, ' ')) AS w FROM $table)
       |  WHERE regexp_full_match(w, '$wordPattern')
       |  GROUP BY w
       |),
       |vocab AS MATERIALIZED (SELECT word, freq FROM wc ORDER BY freq DESC, word LIMIT $maxWords),
       |syms0 AS (SELECT word, freq, string_split(word, '') AS syms FROM vocab),
       |${oracleRounds(numMerges, wordPiece)}""".stripMargin

  /** Oracle for [[trainWordPiece]]'s merge table: the scored round chain,
    * emitting the score's integer factors alongside each merge.
    */
  def wordPieceOracleSql(table: String, textCol: String, numMerges: Int,
                         maxWords: Int, wordPattern: String): String = {
    val union = (1 to numMerges)
      .map(r => s"SELECT $r AS merge_rank, lhs, rhs, cnt, lc AS lhs_cnt, rc AS rhs_cnt FROM best$r")
      .mkString("\nUNION ALL\n")
    oracleChain(table, textCol, numMerges, maxWords, wordPattern,
      wordPiece = true) +
      s"""
         |SELECT merge_rank, lhs, rhs, cnt, lhs_cnt, rhs_cnt FROM (
         |$union
         |) ORDER BY merge_rank""".stripMargin
  }

  /** Oracle for [[trainWordPiece]]'s final segmentation table. */
  def wordPieceSegmentOracleSql(table: String, textCol: String,
                                numMerges: Int, maxWords: Int,
                                wordPattern: String): String =
    oracleChain(table, textCol, numMerges, maxWords, wordPattern,
      wordPiece = true) +
      s"""
         |SELECT word, freq, array_to_string(syms, '|') AS segmentation
         |FROM syms$numMerges ORDER BY word""".stripMargin

  /** The shared per-round relational merge replay (see [[oracleChain]]'s
    * callers for the even-rank-in-run greedy argument).
    */
  private def oracleRounds(numMerges: Int,
                           wordPiece: Boolean = false): String = {
    val rounds = (1 to numMerges).map { r =>
      val prev = if (r == 1) "syms0" else s"syms${r - 1}"
      val bestCte =
        if (!wordPiece)
          s"""best$r AS MATERIALIZED (
             |  SELECT sym AS lhs, nxt AS rhs, CAST(SUM(freq) AS BIGINT) AS cnt
             |  FROM pos$r WHERE nxt IS NOT NULL
             |  GROUP BY sym, nxt ORDER BY cnt DESC, lhs, rhs LIMIT 1
             |)""".stripMargin
        else
          // WordPiece round objective: cnt/(lc·rc), compared as the IEEE
          // double division of exact integers — bit-identical to Spark
          s"""sc$r AS MATERIALIZED (
             |  SELECT sym, CAST(SUM(freq) AS BIGINT) AS scnt
             |  FROM pos$r GROUP BY sym
             |),
             |best$r AS MATERIALIZED (
             |  SELECT lhs, rhs, cnt, l.scnt AS lc, rr.scnt AS rc
             |  FROM (SELECT sym AS lhs, nxt AS rhs,
             |          CAST(SUM(freq) AS BIGINT) AS cnt
             |        FROM pos$r WHERE nxt IS NOT NULL GROUP BY sym, nxt) p
             |  JOIN sc$r l ON l.sym = p.lhs
             |  JOIN sc$r rr ON rr.sym = p.rhs
             |  ORDER BY CAST(cnt AS DOUBLE)
             |             / (CAST(lc AS DOUBLE) * CAST(rc AS DOUBLE)) DESC,
             |           lhs, rhs LIMIT 1
             |)""".stripMargin
      s"""pos$r AS MATERIALIZED (
         |  SELECT word, freq, i, syms[i] AS sym,
         |         lead(syms[i]) OVER (PARTITION BY word ORDER BY i) AS nxt
         |  FROM $prev, UNNEST(range(1, len(syms)+1)) AS u(i)
         |),
         |$bestCte,
         |mg$r AS (
         |  SELECT word, freq, i, sym, mt,
         |         CASE WHEN mt = 1 AND (ROW_NUMBER() OVER (PARTITION BY word, grp ORDER BY i) - 1) % 2 = 0
         |              THEN 1 ELSE 0 END AS mrg
         |  FROM (
         |    SELECT word, freq, i, sym, mt,
         |           CASE WHEN mt = 1 THEN i - ROW_NUMBER() OVER (PARTITION BY word, mt ORDER BY i) END AS grp
         |    FROM (
         |      SELECT word, freq, i, sym,
         |             CASE WHEN sym = (SELECT lhs FROM best$r) AND nxt = (SELECT rhs FROM best$r)
         |                  THEN 1 ELSE 0 END AS mt
         |      FROM pos$r))
         |),
         |syms$r AS MATERIALIZED (
         |  SELECT word, freq, list(sym ORDER BY i) AS syms
         |  FROM (
         |    SELECT word, freq, i,
         |           CASE WHEN mrg = 1 THEN sym || (SELECT rhs FROM best$r) ELSE sym END AS sym,
         |           lag(mrg) OVER (PARTITION BY word ORDER BY i) AS consumed
         |    FROM mg$r)
         |  WHERE consumed IS NULL OR consumed = 0
         |  GROUP BY word, freq
         |)""".stripMargin
    }
    rounds.mkString(",\n")
  }
}
