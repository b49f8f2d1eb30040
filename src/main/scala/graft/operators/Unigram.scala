package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer TRAINING (Kudo 2018, the SentencePiece unigram
  * algorithm) — the other dominant subword algorithm next to BPE
  * ([[Bpe]]): instead of growing a vocab by merges, START from a large
  * seed of candidate substrings and SHRINK it with EM rounds — segment
  * every word by Viterbi under the current piece distribution, re-count
  * piece usage, re-normalize, prune the least-used pieces — until the
  * target vocab size is reached. The reference engine has no tokenizer
  * surface; this is LLM-pipeline extension surface.
  *
  * This is Viterbi-EM (hard assignment — the standard deterministic
  * simplification of SentencePiece's E-step; forward–backward expected
  * counts change third-decimal piece probabilities, not the shape of
  * the algorithm) with strictly deterministic tie handling, so the
  * trained model is a pure function of the corpus.
  *
  * Scale posture (same policy as [[Bpe.train]] and the sampled-Lloyd PQ
  * trainer): the ONLY corpus-scale work is the word-count aggregation —
  * one map-side-combined shuffle. Seeding and every EM round run on the
  * distinct-word table capped at `maxWords` rows, with the model
  * (piece → count) BROADCAST to the word partitions: per round, one
  * vocab-sized aggregation plus a model-sized collect (tokenizer vocabs
  * are policy-sized — 32k/64k — not data-sized). Viterbi is a pure
  * per-word O(len·maxPieceLen) DP in a typed mapPartitions — no
  * shuffle, no state.
  *
  * Determinism: seed counts and EM piece counts are integer-exact
  * (frequency-weighted BIGINT sums); every prune/cap orders by
  * (count desc, piece asc). Viterbi scores are IEEE doubles folded in
  * one fixed order per word (position-ascending DP, each state's score
  * = predecessor + log(cnt/total) in that parenthesization), with ties
  * resolved (score, then FEWER pieces, then the LONGEST LAST piece,
  * applied recursively at each split going leftward) — a total order,
  * so segmentation is deterministic for any partitioning. Log-probabilities make the EM rounds
  * rows-only for the cross-engine oracle (`Math.log` is not
  * correctly-rounded-portable — the same reason `x_text_surprisal` is
  * rows-only); the SEED phase is pure integer arithmetic and IS
  * oracle-replayable ([[seedOracleSql]]).
  */
object Unigram {

  /** Candidate seed vocabulary: every substring of length 1..`maxPieceLen`
    * of the capped word table, weighted by (occurrences within the word) ×
    * (word frequency) — kept are ALL single characters (the closure that
    * makes every word segmentable, never pruned) plus the top
    * `seedSize` multi-character pieces by (weight desc, piece asc).
    * Output: (piece, cnt). Integer-exact, oracle-replayable.
    */
  def seedVocab(docs: DataFrame, textCol: String, seedSize: Int,
                maxPieceLen: Int = 6, maxWords: Int = 10000,
                wordPattern: Option[String] = None): DataFrame =
    seedFromWords(cappedWords(docs, textCol, maxWords, wordPattern),
      seedSize, maxPieceLen)

  /** [[seedVocab]] over an already-capped word table — lets [[train]]
    * reuse its materialized word count so the corpus is scanned and
    * shuffled exactly once per training run.
    */
  private def seedFromWords(words: DataFrame, seedSize: Int,
                            maxPieceLen: Int): DataFrame = {
    val subs = words.select(col("freq"),
        explode(expr(
          s"""flatten(transform(sequence(1, ${maxPieceLen}),
             |  l -> CASE WHEN length(word) >= l THEN
             |         transform(sequence(1, length(word) - l + 1),
             |                   i -> substring(word, i, l))
             |       ELSE array() END))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
    val single = subs.filter(length(col("piece")) === 1)
    val multi = subs.filter(length(col("piece")) > 1)
      .orderBy(desc("cnt"), col("piece")).limit(seedSize)
    single.unionByName(multi)
  }

  /** Train a unigram-LM vocab of at most `max(vocabSize, #singleChars)`
    * pieces with `rounds` Viterbi-EM rounds over the seed, shrinking
    * toward the target as `max(vocabSize, ceil(0.75·current))` TOTAL
    * pieces per round. Single characters count INSIDE the target (the
    * SentencePiece convention — a caller sizing a token-id space to
    * `vocabSize` must get at most that many ids) but always survive
    * pruning, so a target below the alphabet size yields the alphabet.
    * Output: (piece, cnt, rank) — `cnt` is the TRUE frequency-weighted
    * usage count of the piece when the capped word table is
    * Viterbi-segmented under the FINAL (post-prune) vocab: after the
    * last prune, one extra E-step runs under the shipped model, so the
    * reported counts are exactly what a user segmenting with this model
    * would observe (an unused single-char closure survivor reports 0).
    * Rank by (cnt desc, piece asc).
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
            rounds: Int = 4, maxPieceLen: Int = 6, seedSize: Int = 2000,
            maxWords: Int = 10000,
            wordPattern: Option[String] = None): DataFrame = {
    require(vocabSize > 0 && rounds >= 1,
      "unigramTrain: need vocabSize > 0 and rounds >= 1")
    val spark = docs.sparkSession
    // the ONE corpus-scale pass: capped words materialize once and feed
    // both the seed and every EM round
    val words = cappedWords(docs, textCol, maxWords, wordPattern)
      .localCheckpoint(true)
    var vocab: Map[String, Long] =
      collectVocab(seedFromWords(words, seedSize, maxPieceLen))
    var r = 0
    while (r < rounds) {
      // E-step: Viterbi-segment every word under the current model;
      // M-step: frequency-weighted piece usage counts. The counts table
      // is MODEL-sized (≤ |vocab| rows), so collecting it per round is
      // the same budget as the vocab broadcast itself — pruning then
      // runs driver-side on model metadata, never on row data.
      val countsMap = segmented(words, vocab, maxPieceLen)
        .select(col("freq"), explode(col("pieces")).as("piece"))
        .groupBy("piece").agg(sum("freq").as("cnt"))
        .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
      // prune toward the target TOTAL size: single chars ALWAYS survive
      // (the segmentability closure) at a floor count of 1 when unused
      // and count against the target; multi-char pieces fill the rest by
      // usage. The LAST round prunes straight to vocabSize so the
      // documented contract holds for ANY rounds/seedSize combination —
      // intermediate rounds shrink gradually (the SentencePiece
      // schedule) for EM quality, the final one is exact.
      val target =
        if (r == rounds - 1) vocabSize
        else math.max(vocabSize, math.ceil(vocab.size * 0.75).toInt)
      val singles = vocab.keysIterator.filter(_.length == 1)
        .map(s => s -> math.max(countsMap.getOrElse(s, 0L), 1L)).toSeq
      val multis = countsMap.iterator.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, target - singles.size))
      vocab = (singles ++ multis).toMap
      r += 1
    }
    // final E-step under the SHIPPED vocab: EM-round counts above are
    // measured under the round-START (pre-prune) model, so without this
    // pass the reported cnt would describe a vocab that no longer exists
    val finalCounts = segmented(words, vocab, maxPieceLen)
      .select(col("freq"), explode(col("pieces")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
    vocab = vocab.keysIterator.map(p => p -> finalCounts.getOrElse(p, 0L)).toMap
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("cnt"), col("piece"))
    vocab.toSeq.toDF("piece", "cnt")
      .withColumn("rank", row_number().over(w))
  }

  /** Viterbi segmentation of the capped corpus words under a trained
    * vocab: (word, freq, segmentation) with pieces '|'-joined — the
    * inference surface (broadcast the table; in-vocab words are a
    * lookup, like [[Bpe.trainWithVocab]]'s vocab fast path).
    */
  def segmentWords(docs: DataFrame, textCol: String,
                   vocab: Map[String, Long], maxPieceLen: Int = 6,
                   maxWords: Int = 10000,
                   wordPattern: Option[String] = None): DataFrame =
    segmented(cappedWords(docs, textCol, maxWords, wordPattern),
        vocab, maxPieceLen)
      .select(col("word"), col("freq"),
        array_join(col("pieces"), "|").as("segmentation"))

  /** INTEGER-EXACT unigram trainer — the oracle-hashable counterpart of
    * [[train]]: same seed, same prune schedule, same post-prune usage
    * recount, but the E-step segments under an MDL-flavored HARD-EM
    * objective instead of log-probabilities: minimize the number of
    * pieces, then maximize the total piece frequency Σcnt, then the
    * longest-LAST-piece structural order. Every comparison is BIGINT, so
    * the whole training run — seed, EM rounds, prune, final counts — is
    * a pure integer function of the corpus that a generated DuckDB DP
    * chain replays bit-for-bit ([[trainExactOracleSql]]).
    *
    * Relationship to [[train]]: log-prob Viterbi IS the canonical
    * SentencePiece E-step, and stays the default; this variant trades
    * the probabilistic objective for exact replayability (fewest-pieces
    * is what a longest-match tokenizer optimizes, and Σcnt prefers the
    * frequent pieces the log model would). `maxWordLen` additionally
    * caps the trainable word length — the oracle unrolls one DP CTE per
    * character position, so the bound must be static; longer words are
    * excluded from the capped word table in BOTH engines.
    *
    * Scale posture identical to [[train]]: one corpus word-count
    * shuffle, then vocab-sized per-round aggregations and model-sized
    * collects.
    */
  def trainExact(docs: DataFrame, textCol: String, vocabSize: Int,
                 rounds: Int = 1, maxPieceLen: Int = 4, seedSize: Int = 500,
                 maxWords: Int = 5000, maxWordLen: Int = 20,
                 wordPattern: Option[String] = None): DataFrame = {
    val (words, vocab) = trainExactCore(docs, textCol, vocabSize, rounds,
      maxPieceLen, seedSize, maxWords, maxWordLen, wordPattern)
    // final E-step under the SHIPPED vocab (same contract as train())
    val finalCounts = exactUsageCounts(words, vocab, maxPieceLen)
    val spark = docs.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("cnt"), col("piece"))
    vocab.keysIterator.map(p => p -> finalCounts.getOrElse(p, 0L)).toSeq
      .toDF("piece", "cnt")
      .withColumn("rank", row_number().over(w))
  }

  /** The trained-model SEGMENTATION surface of [[trainExact]]: every
    * capped word's segmentation under the shipped exact model
    * ('|'-joined pieces) — the inference table a caller broadcasts, and
    * the same table the post-prune count pass folds. Oracle:
    * [[segmentExactOracleSql]].
    */
  def trainExactSegments(docs: DataFrame, textCol: String, vocabSize: Int,
                         rounds: Int = 1, maxPieceLen: Int = 4,
                         seedSize: Int = 500, maxWords: Int = 5000,
                         maxWordLen: Int = 20,
                         wordPattern: Option[String] = None): DataFrame = {
    val (words, vocab) = trainExactCore(docs, textCol, vocabSize, rounds,
      maxPieceLen, seedSize, maxWords, maxWordLen, wordPattern)
    segmentExactWithModel(words, vocab, maxPieceLen)
  }

  /** Segment arbitrary (word, freq) rows under a LOADED exact model —
    * the persisted-tokenizer serve path: [[trainExact]]'s output table
    * read back as (piece → cnt) and broadcast; no corpus, no training
    * tables. Same integer-objective DP as training-time segmentation.
    */
  def segmentExactWithModel(words: DataFrame, vocab: Map[String, Long],
                            maxPieceLen: Int = 4): DataFrame =
    segmentedExact(words, vocab, maxPieceLen)
      .select(col("word"), col("freq"),
        array_join(col("pieces"), "|").as("segmentation"))

  /** Shared EM loop of the exact trainer: capped+length-filtered words
    * plus the final (post-prune) model with its TRAINING weights.
    */
  private def trainExactCore(docs: DataFrame, textCol: String,
                             vocabSize: Int, rounds: Int, maxPieceLen: Int,
                             seedSize: Int, maxWords: Int, maxWordLen: Int,
                             wordPattern: Option[String])
      : (DataFrame, Map[String, Long]) = {
    require(vocabSize > 0 && rounds >= 1,
      "unigramTrainExact: need vocabSize > 0 and rounds >= 1")
    val words = cappedWords(docs, textCol, maxWords, wordPattern)
      .filter(length(col("word")) <= maxWordLen)
      .localCheckpoint(true)
    var vocab: Map[String, Long] =
      collectVocab(seedFromWords(words, seedSize, maxPieceLen))
    var r = 0
    while (r < rounds) {
      val countsMap = exactUsageCounts(words, vocab, maxPieceLen)
      val target =
        if (r == rounds - 1) vocabSize
        else math.max(vocabSize, math.ceil(vocab.size * 0.75).toInt)
      val singles = vocab.keysIterator.filter(_.length == 1)
        .map(s => s -> math.max(countsMap.getOrElse(s, 0L), 1L)).toSeq
      val multis = countsMap.iterator.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, target - singles.size))
      vocab = (singles ++ multis).toMap
      r += 1
    }
    (words, vocab)
  }

  private def exactUsageCounts(words: DataFrame, v: Map[String, Long],
                               maxPieceLen: Int): Map[String, Long] =
    segmentedExact(words, v, maxPieceLen)
      .select(col("freq"), explode(col("pieces")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap

  // ------------------------------------------------------------ internals

  private def cappedWords(docs: DataFrame, textCol: String, maxWords: Int,
                          wordPattern: Option[String]): DataFrame =
    Bpe.wordCounts(docs, textCol, wordPattern)
      .orderBy(desc("freq"), col("word"))
      .limit(maxWords)

  private def collectVocab(df: DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Per-word Viterbi DP under a broadcast model — pure function of
    * (word, vocab), O(len·maxPieceLen) per word, no shuffle. A word
    * containing a character absent from the vocab keeps that character
    * as an out-of-model piece at floor probability (seed closure makes
    * this unreachable for trained corpora; it guards external input).
    */
  private[operators] def segmented(words: DataFrame, vocab: Map[String, Long],
                                   maxPieceLen: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    require(vocab.nonEmpty, "unigram: empty vocab")
    val bc = spark.sparkContext.broadcast(vocab)
    val total = vocab.values.sum.toDouble
    words.select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val v = bc.value
        it.map { case (word, freq) =>
          (word, freq, viterbi(word, v, total, maxPieceLen))
        }
      }
      .toDF("word", "freq", "pieces")
  }

  /** [[segmented]] under the INTEGER objective of [[trainExact]] — same
    * broadcast-model mapPartitions shape, DP per word is
    * O(len·maxPieceLen) with BIGINT comparisons only.
    */
  private[operators] def segmentedExact(words: DataFrame,
                                        vocab: Map[String, Long],
                                        maxPieceLen: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    require(vocab.nonEmpty, "unigram: empty vocab")
    val bc = spark.sparkContext.broadcast(vocab)
    words.select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val v = bc.value
        it.map { case (word, freq) =>
          (word, freq, viterbiExact(word, v, maxPieceLen))
        }
      }
      .toDF("word", "freq", "pieces")
  }

  /** Position-ascending DP under the integer objective: fewest pieces,
    * then max Σcnt, then longest LAST piece (j ascending + strict
    * improvement ⇒ the smallest qualifying j — the longest last piece —
    * wins every state, recursively leftward; the same structural order
    * as [[viterbi]]). Out-of-model single chars are admitted with cnt 0,
    * ranked below every real piece by the Σcnt key.
    */
  private[operators] def viterbiExact(word: String, vocab: Map[String, Long],
                                      maxPieceLen: Int): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val INF = Int.MaxValue
    val nPieces = new Array[Int](n + 1)
    val sumCnt = new Array[Long](n + 1)
    val backJ = new Array[Int](n + 1)
    java.util.Arrays.fill(nPieces, INF)
    nPieces(0) = 0; sumCnt(0) = 0L; backJ(0) = -1
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (nPieces(j) != INF) {
          val piece = word.substring(j, i)
          val cntOpt: Option[Long] =
            vocab.get(piece) match {
              case Some(c)            => Some(c)
              case None if i - j == 1 => Some(0L) // single-char floor
              case None               => None
            }
          cntOpt.foreach { c =>
            val np = nPieces(j) + 1
            val s = sumCnt(j) + c
            val better = nPieces(i) == INF ||
              np < nPieces(i) || (np == nPieces(i) && s > sumCnt(i))
            if (better) { nPieces(i) = np; sumCnt(i) = s; backJ(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var p = n
    while (p > 0) {
      val j = backJ(p)
      out.prepend(word.substring(j, p))
      p = j
    }
    out.toSeq
  }

  /** Position-ascending Viterbi with a TOTAL tie order: maximize score;
    * equal scores prefer fewer pieces; still equal prefer the longest
    * LAST piece, recursively at each split going leftward. The j loop
    * ascends (longest candidate piece first) and a tie never replaces
    * the stored value, so the smallest qualifying j wins at every state
    * — which IS the recursive longest-last-piece order. Deterministic
    * for any input.
    */
  private[operators] def viterbi(word: String, vocab: Map[String, Long],
                                 total: Double, maxPieceLen: Int): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    // floor probability for out-of-model single chars: below any real
    // piece (cnt >= 1 implies log(cnt/total) >= log(1/total))
    val floorLp = math.log(0.5 / total)
    val score = new Array[Double](n + 1)
    val nPieces = new Array[Int](n + 1)
    val backJ = new Array[Int](n + 1)
    java.util.Arrays.fill(score, Double.NegativeInfinity)
    score(0) = 0.0; nPieces(0) = 0; backJ(0) = -1
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (score(j) != Double.NegativeInfinity) {
          val piece = word.substring(j, i)
          val lpOpt =
            vocab.get(piece) match {
              case Some(c) => Some(math.log(c.toDouble / total))
              case None if i - j == 1 => Some(floorLp)
              case None => None
            }
          lpOpt.foreach { lp =>
            val s = score(j) + lp
            val k = nPieces(j) + 1
            val unset = score(i) == Double.NegativeInfinity
            // strict improvement only: on a full (score, pieces) tie the
            // earlier (smaller) j stays — the longest-last-piece order
            val better = !unset &&
              (s > score(i) || (s == score(i) && k < nPieces(i)))
            if (unset || better) {
              score(i) = s; nPieces(i) = k; backJ(i) = j
            }
          }
        }
        j += 1
      }
      i += 1
    }
    // reconstruct
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var p = n
    while (p > 0) {
      val j = backJ(p)
      out.prepend(word.substring(j, p))
      p = j
    }
    out.toSeq
  }

  /** DuckDB replay of [[trainExact]] — the ENTIRE training run in exact
    * integer SQL. Per E-step the word-level DP unrolls positionally: one
    * MATERIALIZED CTE per character position 1..maxWordLen carries the
    * best (piece-count, Σcnt, backpointer) per (word, prefix), ranked by
    * `ROW_NUMBER() OVER (... ORDER BY np, s DESC, bj)` — the same
    * (fewest pieces, max Σcnt, longest-last/smallest-j) total order the
    * Scala DP applies; a second chain of CTEs walks the backpointers to
    * emit the argmin segmentation's pieces, which aggregate into the
    * round's usage counts. Prune replays as GREATEST/QUALIFY arithmetic
    * (ceil(3n/4) as `(3n+3)//4` — exact, no float), and the final
    * recount pass mirrors the shipped-vocab E-step.
    */
  def trainExactOracleSql(table: String, textCol: String, vocabSize: Int,
                          rounds: Int, maxPieceLen: Int, seedSize: Int,
                          maxWords: Int, maxWordLen: Int,
                          wordPattern: String): String = {
    val fin = rounds + 1
    exactOracleChain(table, textCol, vocabSize, rounds, maxPieceLen,
      seedSize, maxWords, maxWordLen, wordPattern) +
      s"""
         |SELECT v.piece, COALESCE(c.cnt, 0) AS cnt,
         |       CAST(ROW_NUMBER() OVER (ORDER BY COALESCE(c.cnt, 0) DESC, v.piece)
         |            AS INT) AS rank
         |FROM vocab$rounds v LEFT JOIN cnt$fin c USING (piece)
         |ORDER BY rank""".stripMargin
  }

  /** DuckDB replay of [[trainExactSegments]]: the final segmentation
    * pass's ordered piece table, '|'-joined per word.
    */
  def segmentExactOracleSql(table: String, textCol: String, vocabSize: Int,
                            rounds: Int, maxPieceLen: Int, seedSize: Int,
                            maxWords: Int, maxWordLen: Int,
                            wordPattern: String): String = {
    val fin = rounds + 1
    exactOracleChain(table, textCol, vocabSize, rounds, maxPieceLen,
      seedSize, maxWords, maxWordLen, wordPattern) +
      s"""
         |SELECT word, freq,
         |       string_agg(piece, '|' ORDER BY i) AS segmentation
         |FROM pieces$fin GROUP BY word, freq ORDER BY word""".stripMargin
  }

  /** The shared WITH-chain of the exact-trainer oracles: seed, `rounds`
    * EM blocks, and the final segmentation pass under the shipped vocab
    * (exposing `pieces{rounds+1}` / `cnt{rounds+1}` / `vocab{rounds}`).
    */
  /** Oracle for the PERSISTED-model serve path
    * (`x_unigram_persisted`): probe words derived from the saved vocab
    * itself (`piece‖qq` for every multi-char piece — serve time touches
    * NO corpus table) segment under the vocab read DIRECTLY from the
    * persisted parquet, through the same unrolled positional DP the
    * training oracles use.
    */
  def persistedSegmentOracleSql(vocabGlob: String,
                                maxPieceLen: Int): String = {
    val mwl = maxPieceLen + 2 // probe word = piece (≤ maxPieceLen) + "qq"
    s"""WITH pv AS MATERIALIZED (
       |  SELECT piece, cnt FROM read_parquet('$vocabGlob')),
       |wcap AS (SELECT DISTINCT piece || 'qq' AS word,
       |           CAST(1 AS BIGINT) AS freq
       |         FROM pv WHERE length(piece) > 1),
       |${segmentPassSql(1, "pv", maxPieceLen, mwl)}
       |SELECT word, freq,
       |       string_agg(piece, '|' ORDER BY i) AS segmentation
       |FROM pieces1 GROUP BY word, freq ORDER BY word""".stripMargin
  }

  /** One exact-DP segment+count pass as SQL CTEs: segments `wcap`'s
    * words under vocab relation `vin`, exposing `pieces$p` / `cnt$p`.
    * Shared by the training-oracle chain and the persisted-model serve
    * oracle — the DP must be textually ONE definition.
    */
  private def segmentPassSql(p: Int, vin: String, maxPieceLen: Int,
                             maxWordLen: Int): String = {
      val dp0 =
        s"""dp${p}_0 AS (
           |  SELECT word, freq, 0 AS i, 0 AS np, CAST(0 AS BIGINT) AS s, -1 AS bj
           |  FROM wcap)""".stripMargin
      val dps = (1 to maxWordLen).map { i =>
        val jlo = math.max(0, i - maxPieceLen)
        s"""dp${p}_$i AS MATERIALIZED (
           |  SELECT word, freq, i, np, s, bj FROM dp${p}_${i - 1}
           |  UNION ALL
           |  SELECT word, freq, i, np, s, bj FROM (
           |    SELECT d.word, d.freq, $i AS i, d.np + 1 AS np,
           |           d.s + COALESCE(v.cnt, 0) AS s, d.i AS bj,
           |           ROW_NUMBER() OVER (PARTITION BY d.word
           |             ORDER BY d.np + 1 ASC, d.s + COALESCE(v.cnt, 0) DESC,
           |                      d.i ASC) AS rn
           |    FROM dp${p}_${i - 1} d
           |    LEFT JOIN $vin v ON v.piece = substring(d.word, d.i + 1, $i - d.i)
           |    WHERE d.i BETWEEN $jlo AND ${i - 1} AND length(d.word) >= $i
           |      AND (v.piece IS NOT NULL OR $i - d.i = 1)
           |  ) WHERE rn = 1)""".stripMargin
      }
      val wk0 =
        s"""wk${p}_0 AS (
           |  SELECT word, freq, i, bj FROM dp${p}_$maxWordLen
           |  WHERE i = length(word) AND i > 0)""".stripMargin
      val wks = (1 to maxWordLen - 1).map { t =>
        s"""wk${p}_$t AS (
           |  SELECT d.word, d.freq, d.i, d.bj
           |  FROM wk${p}_${t - 1} w
           |  JOIN dp${p}_$maxWordLen d ON d.word = w.word AND d.i = w.bj
           |  WHERE w.bj > 0)""".stripMargin
      }
      val pieceUnion = (0 until maxWordLen)
        .map(t => s"SELECT word, freq, i, substring(word, bj + 1, i - bj) AS piece FROM wk${p}_$t")
        .mkString("\n  UNION ALL\n  ")
      val pieces =
        s"""pieces$p AS MATERIALIZED (
           |  $pieceUnion
           |)""".stripMargin
      val cnt =
        s"""cnt$p AS MATERIALIZED (
           |  SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
           |  FROM pieces$p GROUP BY piece)""".stripMargin
      (Seq(dp0) ++ dps ++ Seq(wk0) ++ wks ++ Seq(pieces, cnt)).mkString(",\n")
  }

  private def exactOracleChain(table: String, textCol: String, vocabSize: Int,
                               rounds: Int, maxPieceLen: Int, seedSize: Int,
                               maxWords: Int, maxWordLen: Int,
                               wordPattern: String): String = {
    // one E-step (segment + count) under vocab `vin`, producing cnt`p`
    def segmentPass(p: Int, vin: String): String =
      segmentPassSql(p, vin, maxPieceLen, maxWordLen)
    // prune cnt`p` under previous vocab `vin` → vocab`p`
    def prunePass(p: Int, vin: String, isLast: Boolean): String = {
      val target =
        if (isLast) s"$vocabSize"
        else s"GREATEST($vocabSize, (3 * (SELECT COUNT(*) FROM $vin) + 3) // 4)"
      s"""sing$p AS (
         |  SELECT v.piece, GREATEST(COALESCE(c.cnt, 0), 1) AS cnt
         |  FROM $vin v LEFT JOIN cnt$p c USING (piece)
         |  WHERE length(v.piece) = 1),
         |vocab$p AS MATERIALIZED (
         |  SELECT piece, cnt FROM sing$p
         |  UNION ALL
         |  SELECT piece, cnt FROM (
         |    SELECT piece, cnt FROM cnt$p WHERE length(piece) > 1
         |    QUALIFY ROW_NUMBER() OVER (ORDER BY cnt DESC, piece)
         |      <= GREATEST($target - (SELECT COUNT(*) FROM sing$p), 0)))""".stripMargin
    }
    val emBlocks = (1 to rounds).map { p =>
      segmentPass(p, s"vocab${p - 1}") + ",\n" +
        prunePass(p, s"vocab${p - 1}", p == rounds)
    }
    val fin = rounds + 1
    s"""WITH wc AS (
       |  SELECT word, count(*) AS freq FROM (
       |    SELECT unnest(string_split($textCol, ' ')) AS word FROM $table)
       |  WHERE regexp_full_match(word, '$wordPattern')
       |  GROUP BY word ORDER BY freq DESC, word LIMIT $maxWords),
       |wcap AS MATERIALIZED (SELECT word, freq FROM wc WHERE length(word) <= $maxWordLen),
       |subs AS (
       |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
       |    SELECT freq, unnest(flatten([
       |      CASE WHEN length(word) >= l THEN
       |        [substring(word, i, l) for i in range(1, length(word) - l + 2)]
       |      ELSE [] END
       |      for l in range(1, ${maxPieceLen + 1})])) AS piece
       |    FROM wcap)
       |  GROUP BY piece),
       |vocab0 AS MATERIALIZED (
       |  SELECT piece, cnt FROM subs WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt FROM subs WHERE length(piece) > 1
       |    ORDER BY cnt DESC, piece LIMIT $seedSize)),
       |${emBlocks.mkString(",\n")},
       |${segmentPass(fin, s"vocab$rounds")}""".stripMargin
  }

  /** DuckDB replay of [[seedVocab]] — substring generation, weighting,
    * single-char closure and the capped multi-char top-N are all
    * integer-exact SQL.
    */
  def seedOracleSql(table: String, textCol: String, seedSize: Int,
                    maxPieceLen: Int, maxWords: Int,
                    wordPattern: String): String =
    s"""WITH wc AS (
       |  SELECT word, count(*) AS freq FROM (
       |    SELECT unnest(string_split($textCol, ' ')) AS word FROM $table)
       |  WHERE regexp_full_match(word, '$wordPattern')
       |  GROUP BY word ORDER BY freq DESC, word LIMIT $maxWords),
       |subs AS (
       |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
       |    SELECT freq, unnest(flatten([
       |      CASE WHEN length(word) >= l THEN
       |        [substring(word, i, l) for i in range(1, length(word) - l + 2)]
       |      ELSE [] END
       |      for l in range(1, ${maxPieceLen + 1})])) AS piece
       |    FROM wc)
       |  GROUP BY piece),
       |single AS (SELECT piece, cnt FROM subs WHERE length(piece) = 1),
       |multi AS (SELECT piece, cnt FROM subs WHERE length(piece) > 1
       |          ORDER BY cnt DESC, piece LIMIT $seedSize)
       |SELECT piece, cnt FROM single UNION ALL SELECT piece, cnt FROM multi""".stripMargin
}
