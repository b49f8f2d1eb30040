package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: token statistics, quality
  * scoring, marker-based language identification, and content
  * fingerprinting.
  *
  * All pure projections/aggregations over built-in string functions —
  * embarrassingly parallel, no shuffles except the explicit corpus-level
  * aggregates, and every computation is replayable in the DuckDB oracle
  * (the marker-count trick uses only `length`/`replace`; the fingerprint
  * uses `md5` over a canonical token ordering).
  */
object TextAnalysis {

  /** Occurrences of `marker` in `' ' || text || ' '` via the length/replace
    * identity — O(n) scan, no regex engine, identical semantics in any SQL
    * engine (non-overlapping left-to-right replacement).
    */
  def markerCount(text: Column, marker: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    (length(padded) - length(regexp_replace(padded, java.util.regex.Pattern.quote(marker), ""))) / marker.length
  }

  /** Per-document token/length statistics. */
  def stats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      length(col(textCol)).as("len_chars"),
      size(split(col(textCol), " ")).as("n_tokens"),
      length(regexp_replace(col(textCol), " ", "")).as("n_nonspace"))

  /** Quality signals: token count, mean token length, punctuation count and
    * ratio, stopword ratio — the usual cheap pre-training filters.
    */
  def quality(docs: DataFrame, idCol: String, textCol: String,
              stopwords: Seq[String] = Seq("the", "a", "of", "and")): DataFrame = {
    val t = col(textCol)
    val nTok = size(split(t, " "))
    val nPunct = length(t) - length(regexp_replace(t, "[.,!?;:]", ""))
    val nStop = stopwords.map(w => markerCount(t, s" $w ")).reduce(_ + _)
    docs.select(col(idCol),
      nTok.as("n_tokens"),
      ((length(regexp_replace(t, " ", "")).cast("double")) / nTok).as("mean_tok_len"),
      nPunct.as("n_punct"),
      (nPunct.cast("double") / length(t)).as("punct_ratio"),
      (nStop.cast("double") / nTok).as("stopword_ratio"))
  }

  /** Marker-word language ID: count language-specific function words,
    * argmax with deterministic tie-break by language code order.
    */
  val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "nicht", "ist"),
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "los", "es", "y"),
    "fr" -> Seq("le", "la", "et", "est"))

  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scored = docs.select(col(idCol) +: markers.map { case (lang, ws) =>
      ws.map(w => markerCount(col(textCol), s" $w ")).reduce(_ + _).as(s"score_$lang")
    }: _*)
    val best = markers.map(_._1).foldLeft(
      (lit("und"), lit(-1).cast("double"))) { case ((bl, bs), lang) =>
        val s = col(s"score_$lang")
        (when(s > bs, lit(lang)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    scored.select(col(idCol), best._1.as("lang_pred"), best._2.cast("long").as("lang_score"))
  }

  /** Language-ID with a CONFIDENCE signal: the winner's marker score, the
    * margin to the runner-up, and a `mixed` flag when the margin is ≤
    * `mixedMargin` — the "route to a better classifier / drop ambiguous"
    * gate downstream of cheap marker counting. Scores are integer marker
    * counts, so the margin arithmetic is exact in any engine; the margin
    * needs only the two top SCORES (sorted descending), so winner
    * tie-breaks can't affect it.
    */
  def languageConfidence(docs: DataFrame, idCol: String, textCol: String,
                         mixedMargin: Long = 1L): DataFrame = {
    val base = languageId(docs, idCol, textCol)
      .join(docs.select(col(idCol), col(textCol)), Seq(idCol))
    val scoreArr = array(markers.map { case (_, ws) =>
      ws.map(w => markerCount(col(textCol), s" $w ")).reduce(_ + _).cast("long")
    }: _*)
    base
      .withColumn("__sorted", reverse(array_sort(scoreArr)))
      .select(col(idCol), col("lang_pred"), col("lang_score"),
        (element_at(col("__sorted"), 1) - element_at(col("__sorted"), 2))
          .as("margin"))
      .withColumn("mixed", col("margin") <= mixedMargin)
  }

  /** Content-defined fingerprint: md5 over the sorted distinct lowercase
    * token set — invariant to word order and duplication, the
    * canonical-form dedup key.
    */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      md5(concat_ws(" ",
        array_sort(array_distinct(split(lower(col(textCol)), " "))))).as("fingerprint"))

  /** Character-level polynomial rolling hash:
    * `h = fold(chars, 0, (acc, c) -> (acc * 31 + code(c)) mod 1e9+7)` —
    * pure integer arithmetic via higher-order functions, codegen'd, and
    * bit-replayable in any engine with a list fold. Order-sensitive
    * (unlike [[fingerprint]]), the classic content-chunking hash.
    */
  def rollingHash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val codes = transform(split(col(textCol), ""), c => ascii(c).cast("long"))
    docs.select(col(idCol),
      aggregate(codes, lit(0L),
        (acc, x) => (acc * 31 + x) % 1000000007L).as("roll_hash"))
  }

  /** GPT-2-style pre-tokenizer pattern (ASCII classes for exact Java ↔ RE2
    * parity): contractions, space-prefixed letter runs, digit runs, and
    * punctuation runs. A cheap, deterministic stand-in for a real BPE
    * vocabulary — the count tracks BPE token counts closely enough for
    * length filtering and batch budgeting.
    */
  val bpeIshPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  /** Token counting both ways the mandate asks for: whitespace tokens and
    * BPE-ish regex tokens, plus their ratio (a quality signal — prose sits
    * near 1.3 BPE tokens per word; code and noise run higher).
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val nWs = size(split(col(textCol), " "))
    val nBpe = size(regexp_extract_all(col(textCol), lit(bpeIshPattern), lit(0)))
    docs.select(col(idCol),
      nWs.as("n_ws_tokens"),
      nBpe.as("n_bpe_tokens"),
      (nBpe.cast("double") / nWs).as("bpe_per_ws"))
  }

  /** Repetition signals — the Gopher-style quality filters that catch
    * boilerplate and degenerate generations:
    *
    *  - `dup_token_ratio`: 1 − distinct/total tokens (high = repetitive);
    *  - `top_token_ratio`: share of the single most frequent token;
    *  - `dup_bigram_ratio`: fraction of word-bigram occurrences whose
    *    bigram appears more than once.
    *
    * Explode + two-level aggregation: partial aggregation collapses
    * per-(doc, token) counts map-side, so the shuffle carries one row per
    * distinct token per doc, never the raw token stream. Ratios are
    * long/long → double divisions, bit-identical across engines.
    */
  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(split(col(textCol), " ")).as("tok"))
    val tokAgg = toks.groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_distinct"),
        max("c").as("top_c"))
    val biAgg = Dedup.shingleRows(docs, idCol, textCol, n = 2)
      .groupBy(col(idCol), col("shingle"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum("c").as("n_bi"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_bi_rep"))
    tokAgg.join(biAgg, Seq(idCol), "left")
      .select(col(idCol),
        (lit(1.0) - col("n_distinct") / col("n_tokens")).as("dup_token_ratio"),
        (col("top_c") / col("n_tokens")).as("top_token_ratio"),
        // docs shorter than two words have no bigrams at all
        coalesce(col("n_bi_rep") / col("n_bi"), lit(0.0)).as("dup_bigram_ratio"))
  }

  /** Gopher/C4-style rule-bundle quality filter: per-rule boolean flags
    * plus the conjunction `keep`, so a pipeline can both FILTER and
    * ATTRIBUTE removals (which rule fired, per doc — the audit column
    * real curation runs need). Signals reuse [[quality]] and
    * [[repetition]]; every decision is a deterministic IEEE comparison
    * (small-integer divisions vs plain literals), so the DuckDB oracle
    * replays the flags bit-for-bit.
    */
  def qualityFlags(docs: DataFrame, idCol: String, textCol: String,
                   minTokens: Int = 25,
                   minMeanTokLen: Double = 4.0, maxMeanTokLen: Double = 10.0,
                   maxTopTokenRatio: Double = 0.2,
                   minStopwordRatio: Double = 0.01): DataFrame = {
    val q = quality(docs, idCol, textCol)
    val r = repetition(docs, idCol, textCol)
    q.join(r, Seq(idCol))
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") < minTokens).as("flag_short"),
        (col("mean_tok_len") < minMeanTokLen ||
          col("mean_tok_len") > maxMeanTokLen).as("flag_word_len"),
        (col("top_token_ratio") > maxTopTokenRatio).as("flag_repetitive"),
        (col("stopword_ratio") < minStopwordRatio).as("flag_low_stopword"))
      .withColumn("keep",
        !col("flag_short") && !col("flag_word_len") &&
          !col("flag_repetitive") && !col("flag_low_stopword"))
  }

  /** Corpus vocabulary statistics: global term frequency (`tf`) and
    * document frequency (`df`) for the top `k` tokens by frequency —
    * the stop-list-construction / vocab-pruning primitive. One explode
    * feeding a partial-aggregated groupBy on compact token keys (the
    * distinct-doc count shuffles (token, id) pairs, never documents);
    * top-k plans as TakeOrdered, not a global sort.
    */
  def vocab(docs: DataFrame, idCol: String, textCol: String,
            k: Int = 1000): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("tf"), countDistinct(col(idCol)).as("df"))
      .orderBy(col("tf").desc, col("tok"))
      .limit(k)

  /** Top-`k` most distinctive terms per document by tf·idf.
    *
    * Two idf variants:
    *  - default (`logIdf = false`): rational idf — weight = tf/df. IEEE
    *    division of two small integers is correctly rounded and therefore
    *    BIT-IDENTICAL across engines, so the ranking is oracle-hashable
    *    (log is not bit-reproducible cross-engine).
    *  - `logIdf = true`: the classic tf·ln(N/df) weighting — spec-pinned,
    *    not oracle-hashed.
    *
    * Scale shape: tf is a partial-aggregated groupBy on (doc, token); df
    * is a token-keyed aggregate joined back on the token (high
    * cardinality — well distributed); the rank window partitions by doc
    * (per-doc vocabulary is bounded by document length, never hot).
    */
  def tfidfTop(docs: DataFrame, idCol: String, textCol: String,
               k: Int = 5, logIdf: Boolean = false): DataFrame = {
    val toks = docs.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
    val tf = toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    val df = toks.select(col(idCol), col("tok")).distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val weight =
      if (logIdf) {
        // corpus size only matters for the log variant — don't spend a
        // count job on the default path
        val n = docs.select(col(idCol)).distinct().count()
        col("tf") * log(lit(n.toDouble) / col("df"))
      } else col("tf").cast("double") / col("df")
    val w = Window.partitionBy(col(idCol))
      .orderBy(weight.desc, col("tok"))
    tf.join(df, Seq("tok"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("tok"), col("tf"), col("df"), col("rk"))
  }

  /** Bigram-LM surprisal — the CCNet-style perplexity-proxy quality
    * signal: train bigram/unigram counts on a reference corpus, then
    * score each document by its per-bigram average negative log2
    * probability under add-k smoothing. Low surprisal = looks like the
    * reference distribution; high = out-of-domain or gibberish; documents
    * with no bigrams (single-token) are absent.
    *
    * Scale shape: the model is two count tables on compact token keys.
    * With `broadcastModel` (an LM trained on a sample corpus is small)
    * the document side never shuffles; otherwise both joins shuffle on
    * the high-cardinality bigram/unigram keys. Probabilities are floats,
    * so this is spec-pinned rather than oracle-hashed (log is not
    * bit-reproducible across engines).
    */
  def bigramSurprisal(docs: DataFrame, ref: DataFrame, idCol: String,
                      textCol: String, k: Double = 0.5,
                      broadcastModel: Boolean = true): DataFrame = {
    require(k > 0, "add-k smoothing needs k > 0")
    def maybeB(df: DataFrame): DataFrame =
      if (broadcastModel) broadcast(df) else df
    def bigramRows(df: DataFrame, cols: Seq[org.apache.spark.sql.Column]) =
      df.select(cols :+ split(col(textCol), " ").as("w"): _*)
        .filter(size(col("w")) >= 2)
        .select(cols :+ posexplode(expr(
          "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS w1, w[i] AS w2))"))
          .as(Seq("i", "bg")): _*)
        .select(cols :+ col("bg.w1").as("w1") :+ col("bg.w2").as("w2"): _*)
    // model: c(w1, w2), c(w1), |V| from the reference corpus
    val refBi = bigramRows(ref, Seq.empty)
    val biCounts = refBi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val uniCounts = refBi.groupBy("w1").agg(count(lit(1)).as("c1"))
    // one-row driver probe (like the Similarity dimension probe): |V| is
    // a scalar baked into the smoothing denominator
    val vocab = ref.select(explode(split(col(textCol), " ")).as("tok"))
      .agg(countDistinct(col("tok"))).first().getLong(0).toDouble
    require(vocab > 0,
      "bigramSurprisal needs a non-empty reference corpus to train on")
    // score: P(w2|w1) = (c12 + k) / (c1 + k·|V|); unseen w1 → c1 = 0
    val scored = bigramRows(docs, Seq(col(idCol)))
      .join(maybeB(biCounts), Seq("w1", "w2"), "left")
      .join(maybeB(uniCounts), Seq("w1"), "left")
      .withColumn("p",
        (coalesce(col("c12"), lit(0L)) + k) /
        (coalesce(col("c1"), lit(0L)) + k * vocab))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (-avg(log2(col("p")))).as("avg_surprisal"))
  }

  /** Corpus-level rollup by a grouping column (e.g. source or lang). */
  def corpusStats(docs: DataFrame, groupCol: String, textCol: String): DataFrame =
    docs.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(length(col(textCol))).as("total_chars"),
      sum(size(split(col(textCol), " "))).as("total_tokens"),
      min(length(col(textCol))).as("min_chars"),
      max(length(col(textCol))).as("max_chars"))
}
