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
  /** (…cols, w1, w2) — one row per adjacent word pair of `textCol`. */
  private def bigramRows(df: DataFrame, textCol: String,
                         cols: Seq[org.apache.spark.sql.Column]): DataFrame =
    df.select(cols :+ split(col(textCol), " ").as("w"): _*)
      .filter(size(col("w")) >= 2)
      .select(cols :+ posexplode(expr(
        "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS w1, w[i] AS w2))"))
        .as(Seq("i", "bg")): _*)
      .select(cols :+ col("bg.w1").as("w1") :+ col("bg.w2").as("w2"): _*)

  def bigramSurprisal(docs: DataFrame, ref: DataFrame, idCol: String,
                      textCol: String, k: Double = 0.5,
                      broadcastModel: Boolean = true): DataFrame = {
    require(k > 0, "add-k smoothing needs k > 0")
    def maybeB(df: DataFrame): DataFrame =
      if (broadcastModel) broadcast(df) else df
    // model: c(w1, w2), c(w1), |V| from the reference corpus
    val refBi = bigramRows(ref, textCol, Seq.empty)
    val biCounts = refBi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val uniCounts = refBi.groupBy("w1").agg(count(lit(1)).as("c1"))
    // one-row driver probe (like the Similarity dimension probe): |V| is
    // a scalar baked into the smoothing denominator
    val vocab = ref.select(explode(split(col(textCol), " ")).as("tok"))
      .agg(countDistinct(col("tok"))).first().getLong(0).toDouble
    require(vocab > 0,
      "bigramSurprisal needs a non-empty reference corpus to train on")
    // score: P(w2|w1) = (c12 + k) / (c1 + k·|V|); unseen w1 → c1 = 0
    val scored = bigramRows(docs, textCol, Seq(col(idCol)))
      .join(maybeB(biCounts), Seq("w1", "w2"), "left")
      .join(maybeB(uniCounts), Seq("w1"), "left")
      .withColumn("p",
        (coalesce(col("c12"), lit(0L)) + k) /
        (coalesce(col("c1"), lit(0L)) + k * vocab))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (-avg(log2(col("p")))).as("avg_surprisal"))
  }

  /** INTEGER-EXACT twin of [[bigramSurprisal]] at k = 1/2 — the
    * hash-verifiable configuration (the `x_unigram_train_exact`
    * pattern: rational scores, unchanged production plan). With
    * k = 1/2, P(w2|w1) = (2·c12 + 1) / (2·c1 + |V|) exactly in
    * integers, so the per-bigram surprisal −log₂P is scored as the
    * BIT-LENGTH difference
    *   `length(bin(2·c1 + |V|)) − length(bin(2·c12 + 1))`
    * (= ⌊log₂ den⌋ − ⌊log₂ num⌋, within ±1 bit of the float surprisal
    * per term) — pure integer string length in BOTH engines, the same
    * no-floating-log trick as the token frequency spectrum. Identical
    * model tables, identical broadcast-join plan; only the projection
    * arithmetic changes.
    *
    * Output: (id, n_bigrams, sum_surprisal_bits).
    */
  def bigramSurprisalExact(docs: DataFrame, ref: DataFrame, idCol: String,
                           textCol: String,
                           broadcastModel: Boolean = true): DataFrame = {
    def maybeB(df: DataFrame): DataFrame =
      if (broadcastModel) broadcast(df) else df
    val refBi = bigramRows(ref, textCol, Seq.empty)
    val biCounts = refBi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val uniCounts = refBi.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = ref.select(explode(split(col(textCol), " ")).as("tok"))
      .agg(countDistinct(col("tok"))).first().getLong(0)
    require(vocab > 0,
      "bigramSurprisalExact needs a non-empty reference corpus to train on")
    bigramRows(docs, textCol, Seq(col(idCol)))
      .join(maybeB(biCounts), Seq("w1", "w2"), "left")
      .join(maybeB(uniCounts), Seq("w1"), "left")
      .withColumn("sbits",
        (length(bin(coalesce(col("c1"), lit(0L)) * 2 + lit(vocab))) -
         length(bin(coalesce(col("c12"), lit(0L)) * 2 + lit(1L)))).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("sbits")).as("sum_surprisal_bits"))
  }

  /** Linear Naive-Bayes-margin quality classifier — the integer-exact
    * cousin of the fastText-style quality filters used to gate
    * pre-training corpora (GPT-3/CCNet-style "looks like the curated
    * set" scoring): train per-token rate differences on a labeled
    * good/bad split, then score every document by its summed margin.
    *
    * weight(t) = (c_good(t)·10⁶ div N_good) − (c_bad(t)·10⁶ div N_bad)
    * — per-million token rates under integer floor-division, so every
    * weight (and therefore every document score) is exactly replayable
    * in any SQL engine; the classic log-odds weighting needs ln and is
    * not bit-reproducible cross-engine.
    * score(d) = Σ_{tokens of d, with multiplicity} weight(t); tokens
    * unseen in training weigh 0; label = score > 0.
    *
    * Scale shape: the model is a vocab-sized (token, weight) table —
    * broadcast. Documents explode once to (id, token), join the
    * broadcast model, and partial-aggregate the Long sum per document;
    * the corpus never shuffles. Weights are bounded by ±10⁶ so a doc
    * score is bounded by 10⁶·n_tokens — no overflow this side of a
    * 10¹²-token document.
    */
  /** The trained (token, weight) margin table behind [[nbQualityScore]]
    * — exposed so other appliers (the stateless streaming classifier)
    * score with EXACTLY the same model.
    */
  def nbTokenWeights(good: DataFrame, bad: DataFrame,
                     textCol: String): DataFrame = {
    def counts(df: DataFrame, cName: String): DataFrame =
      df.select(explode(split(col(textCol), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as(cName))
    // one-row driver probes: the two training-corpus token totals are
    // scalars baked into the rate denominators (same pattern as the
    // surprisal vocab probe)
    def total(df: DataFrame): Long =
      df.select(sum(size(split(col(textCol), " ")))) // sum over 0 rows: NULL
        .first() match { case r => if (r.isNullAt(0)) 0L else r.getLong(0) }
    val nGood = total(good)
    val nBad = total(bad)
    require(nGood > 0 && nBad > 0,
      "nbQualityScore needs non-empty good and bad training corpora")
    counts(good, "c_good")
      .join(counts(bad, "c_bad"), Seq("tok"), "full_outer")
      .select(col("tok"),
        (expr(s"coalesce(c_good, 0L) * 1000000L div ${nGood}L") -
         expr(s"coalesce(c_bad, 0L) * 1000000L div ${nBad}L")).as("weight"))
  }

  def nbQualityScore(docs: DataFrame, good: DataFrame, bad: DataFrame,
                     idCol: String, textCol: String,
                     broadcastModel: Boolean = true): DataFrame = {
    def toks(df: DataFrame, cols: Seq[Column]): DataFrame =
      df.select(cols :+ explode(split(col(textCol), " ")).as("tok"): _*)
    val model = nbTokenWeights(good, bad, textCol)
    val m = if (broadcastModel) broadcast(model) else model
    toks(docs, Seq(col(idCol)))
      .join(m, Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("weight"), lit(0L))).as("score"))
      .withColumn("label", (col("score") > 0).cast("int"))
  }

  /** BM25 top-`k` retrieval — score a small query set against the corpus
    * with Okapi BM25 (k1, b defaults per Robertson/Spärck Jones), using
    * the rational idf variant idf(t) = (N − df + ½)/(df + ½) (no log:
    * the division of small exact values is correctly rounded and
    * therefore bit-identical across engines, same trade the tf·idf
    * operator makes).
    *
    * Float-sum determinism: the per-term BM25 contributions are folded
    * in TOKEN order via `aggregate(sort_array(...), 0.0, +)` — a plain
    * SUM has no defined order and float addition is order-sensitive.
    * The oracle replays the identical left fold with `list_reduce(list(
    * ... ORDER BY tok))`.
    *
    * Scale shape: queries are a broadcast-sized term list; df and avgdl
    * are token-keyed corpus aggregates computed once; the (doc, token)
    * tf table is the big side and joins the query terms on the token key
    * (high cardinality, well distributed); the per-(query, doc) group is
    * bounded by |query terms|. Ranking partitions by query — never hot.
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame,
               idCol: String, textCol: String,
               qidCol: String, qtextCol: String, k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Rank(docs, idCol, textCol,
      bm25QueryTerms(queries, qidCol, qtextCol), k, k1, b)

  /** The distinct (qid, tok) term frame of a (qid, qtext) query table —
    * the shared front of [[bm25TopK]] and [[bm25Prf]].
    */
  private def bm25QueryTerms(queries: DataFrame, qidCol: String,
                             qtextCol: String): DataFrame =
    queries.select(col(qidCol).as("qid"),
        explode(split(col(qtextCol), " ")).as("tok"))
      .distinct()

  /** BM25 ranking against an explicit (qid, tok) term frame — the core
    * both public entry points share. Each call derives the corpus
    * statistics (tf/df/dl/avgdl) afresh; a two-pass caller like
    * [[bm25Prf]] pays that twice, which is the price of keeping every
    * pass a self-contained one-shot plan.
    */
  private def bm25Rank(docs: DataFrame, idCol: String, textCol: String,
                       qTerms: DataFrame, k: Int,
                       k1: Double, b: Double): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("tok"))
    val tf = toks.groupBy("id", "tok").agg(count(lit(1)).as("tf"))
    val dfT = toks.select("id", "tok").distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val dl = toks.groupBy("id").agg(count(lit(1)).as("dl"))
    // one-row driver probe: N docs and total tokens → avgdl, one exact
    // Long-to-Double division baked as a literal
    val probe = docs.agg(count(lit(1)),
      sum(size(split(col(textCol), " ")))).first()
    val nDocs = probe.getLong(0)
    require(nDocs > 0, "bm25TopK needs a non-empty corpus")
    val avgdl = probe.getLong(1).toDouble / nDocs.toDouble
    // per-(query, doc, term) BM25 contribution — parenthesization is the
    // cross-engine contract, mirrored exactly in the oracle SQL
    val term =
      ((lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / lit(avgdl))))
    val contrib = broadcast(qTerms)
      .join(tf, Seq("tok"))
      .join(dfT, Seq("tok"))
      .join(dl, Seq("id"))
      .select(col("qid"), col("id"), struct(col("tok"), term.as("t")).as("c"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id"))
    contrib.groupBy("qid", "id")
      .agg(expr("aggregate(sort_array(collect_list(c)), 0.0D, (a, x) -> a + x.t)")
        .as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "id", "rank")
  }

  /** Pseudo-relevance-feedback retrieval (RM3-lite, Lavrenko & Croft's
    * relevance models by way of Jaleel et al.'s RM3): run BM25, treat
    * the top `fbDocs` documents per query as relevant, mine the
    * `fbTerms` most frequent NEW terms from them (original query terms
    * anti-joined away — expansion must expand), append them to the
    * query term set, and re-run BM25. The classic recall-boosting
    * second pass every lexical retrieval stack ships.
    *
    * Determinism: expansion-term selection is integer counts with
    * term-alphabetical tie-break; both BM25 passes are the ordered
    * float fold of [[bm25TopK]] — the whole two-pass composite
    * hash-verifies cross-engine.
    *
    * Scale shape: both passes are broadcast-query-term plans; the
    * feedback mining joins the (k·|queries|)-row feedback set to the
    * token table on doc id and ranks per query — bounded by feedback
    * size, never corpus².
    */
  def bm25Prf(docs: DataFrame, queries: DataFrame,
              idCol: String, textCol: String,
              qidCol: String, qtextCol: String, k: Int = 10,
              fbDocs: Int = 5, fbTerms: Int = 10,
              k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(fbDocs >= 1 && fbTerms >= 1,
      s"bm25Prf: fbDocs/fbTerms must be >= 1, got $fbDocs/$fbTerms")
    val qorig = bm25QueryTerms(queries, qidCol, qtextCol)
    val fb = bm25Rank(docs, idCol, textCol, qorig, fbDocs, k1, b)
    val toks = docs.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("tok"))
    val fcnt = fb.select("qid", "id").join(toks, Seq("id"))
      .join(qorig, Seq("qid", "tok"), "left_anti")
      .groupBy("qid", "tok").agg(count(lit(1)).as("c"))
    val wq = Window.partitionBy("qid").orderBy(col("c").desc, col("tok"))
    val fsel = fcnt.withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= fbTerms).select("qid", "tok")
    bm25Rank(docs, idCol, textCol, qorig.union(fsel), k, k1, b)
  }

  /** Reciprocal-rank fusion of two retrieval rankings (Cormack et al.'s
    * RRF, the standard hybrid lexical+dense fusion): score(q, d) =
    * Σ_systems 1/(kk + rank) over the systems that returned d, re-ranked
    * descending. Both inputs are (qid, id, rank) frames — e.g.
    * [[bm25TopK]] and `Similarity.bruteForceTopK`.
    *
    * Bit-exact across engines by construction: 1/(kk+rank) is a
    * correctly-rounded small-integer division, and the two-term sum has
    * a fixed evaluation order (a-side + b-side).
    *
    * Scale shape: a full outer join on (qid, id) between two already-
    * top-k'd (i.e. tiny) rankings, then a per-query rank window — both
    * sides are k·|queries| rows regardless of corpus size.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int = 10,
              kk: Int = 60): DataFrame = {
    require(kk > 0, "rrf constant must be positive")
    def side(df: DataFrame, r: String) =
      df.select(col("qid"), col("id"), col("rank").as(r))
    val score =
      coalesce(lit(1.0) / (lit(kk) + col("ra")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(kk) + col("rb")), lit(0.0))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id"))
    side(a, "ra").join(side(b, "rb"), Seq("qid", "id"), "full_outer")
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "id", "rank")
  }

  /** Truncated rank-biased overlap RBO@k (Webber, Moffat & Zobel, TOIS
    * 2010) between two top-k rankings — the ranking-similarity measure
    * retrieval evaluation actually uses (top-weighted, defined on
    * non-conjoint lists), e.g. "how much did PRF expansion move the
    * ranking" or pre/post-index-rebuild drift audits.
    *
    * `RBO@k = (1−p) Σ_{d=1..k} p^{d−1} · |A_{1..d} ∩ T_{1..d}| / d`
    * with persistence `p = pNum/pDen`. Computed EXACTLY in integers: a
    * joined id with ranks (ra, rb) contributes to every depth
    * d ≥ m = max(ra, rb), so RBO's double sum collapses to one
    * suffix-weight lookup per common id —
    * `Σ_common W_m` with `W_m = Σ_{d=m..k} pNum^{d−1}·pDen^{k−d}·(L/d)`
    * (L = lcm(1..k)) precomputed as exact BigInt literals; the final
    * score is the positive integer division
    * `rbo_e5 = 10⁵·(pDen−pNum)·Σ W_m div (pDen^k·L·pDen^0…)` — every
    * step replayable to the bit. Truncation means the maximum is
    * `(1−p^k)·10⁵` (65132 at p=0.9, k=10), reached by identical lists.
    *
    * Output: one row per qid of ranking `a` — (qid, n_common, rbo_e5);
    * queries with zero overlap score 0. Scale shape: both inputs are
    * already top-k'd (k·|queries| rows); one equi-join + one keyed agg.
    */
  /** The exact-integer RBO lattice: (suffix weights W_1..W_k, the 10⁵
    * numerator, the denominator) — package-private so the oracle inlines
    * the identical literals.
    */
  private[graft] def rboWeights(k: Int, pNum: Int,
                                pDen: Int): (Seq[Long], Long, Long) = {
    require(k >= 1 && pNum > 0 && pDen > pNum,
      s"rboAtK: need k >= 1 and 0 < pNum < pDen, got k=$k p=$pNum/$pDen")
    val lcm = (1 to k).map(BigInt(_)).reduce((x, y) => x * y / x.gcd(y))
    val wd = (1 to k).map(d =>
      BigInt(pNum).pow(d - 1) * BigInt(pDen).pow(k - d) * (lcm / d))
    val suffix = (1 to k).map(m => wd.drop(m - 1).sum)
    val den = BigInt(pDen).pow(k) * lcm
    val num = BigInt(100000) * (pDen - pNum)
    // exact worst case: identical lists → Σ_m W_m = Σ_d d·w_d
    val maxSw = (1 to k).map(d => wd(d - 1) * d).sum
    require((num * maxSw).isValidLong && maxSw.isValidLong,
      s"rboAtK: k=$k p=$pNum/$pDen overflows the exact integer lattice")
    (suffix.map(_.toLong), num.toLong, den.toLong)
  }

  def rboAtK(a: DataFrame, b: DataFrame, k: Int = 10,
             pNum: Int = 9, pDen: Int = 10): DataFrame = {
    val (suffix, numL, denL) = rboWeights(k, pNum, pDen)
    val wLit = array(suffix.map(lit(_)): _*)
    val joined = a.select(col("qid"), col("id"), col("rank").as("ra"))
      .join(b.select(col("qid"), col("id"), col("rank").as("rb")),
        Seq("qid", "id"))
      .select(col("qid"),
        element_at(wLit, greatest(col("ra"), col("rb")).cast("int")).as("w"))
      .groupBy("qid")
      .agg(count(lit(1)).as("n_common"), sum("w").as("sw"))
    a.select("qid").distinct()
      .join(joined, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        expr(s"CAST(coalesce(sw, 0L) * ${numL}L DIV ${denL}L AS BIGINT)")
          .as("rbo_e5"))
  }

  /** One round of byte-pair-encoding vocabulary induction: the
    * adjacent-symbol-pair frequency table over the corpus, weighted by
    * word frequency — the top row is the first BPE merge; iterating this
    * transform is exactly the classic tokenizer-training loop
    * (Sennrich et al.'s algorithm, public knowledge).
    *
    * Scale shape: words aggregate to a vocab-sized (word, freq) table
    * first, so pair extraction runs once per DISTINCT word, not once per
    * occurrence; the pair aggregate is over the tiny symbol-pair space
    * and plans as a partial-aggregated groupBy + TakeOrdered top-k.
    */
  def bpePairCounts(docs: DataFrame, textCol: String, k: Int = 50): DataFrame = {
    val words = docs.select(explode(split(col(textCol), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      // sequence(1, len-1) is DESCENDING for len < 2 — filter first
      .filter(length(col("w")) >= 2)
    words
      .select(col("freq"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
  }

  /** Top drifting tokens between two corpora by the 2×2 chi-square
    * statistic — the distribution-shift monitor for corpus refreshes
    * (which tokens most distinguish snapshot A from snapshot B):
    * χ²(t) = N·(a·N_B − b·N_A)² / (N_A·N_B·(a+b)·(N−a−b)), the standard
    * contingency identity over (token-in-A, token-in-B) counts.
    *
    * Exactness: a·N_B − b·N_A is exact in Long (≤ ~10¹⁴ at 10⁷-token
    * corpora) and converts to double exactly below 2⁵³; every subsequent
    * multiply/divide is a correctly-rounded double op in a FIXED
    * parenthesization mirrored by the oracle — bit-identical ranking.
    *
    * Scale shape: two vocab-keyed count aggregates, a full-outer join on
    * the token, a projection, and a TakeOrdered top-k. No corpus rows
    * move — only (token, count) pairs.
    */
  def driftTopTokens(a: DataFrame, b: DataFrame, textCol: String,
                     k: Int = 50): DataFrame = {
    def counts(df: DataFrame, cName: String): DataFrame =
      df.select(explode(split(col(textCol), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as(cName))
    def total(df: DataFrame): Long = {
      val r = df.select(sum(size(split(col(textCol), " ")))).first()
      if (r.isNullAt(0)) 0L else r.getLong(0) // sum over zero rows is NULL
    }
    val na = total(a)
    val nb = total(b)
    require(na > 0 && nb > 0, "driftTopTokens needs two non-empty corpora")
    val n = na + nb
    val ca = coalesce(col("c_a"), lit(0L))
    val cb = coalesce(col("c_b"), lit(0L))
    val d = (ca * lit(nb) - cb * lit(na)).cast("double")
    val chi = (lit(n.toDouble) * (d * d)) /
      (((lit(na.toDouble) * lit(nb.toDouble)) * (ca + cb).cast("double")) *
        (lit(n) - ca - cb).cast("double"))
    counts(a, "c_a").join(counts(b, "c_b"), Seq("tok"), "full_outer")
      .filter(ca + cb < n) // a token that is BOTH corpora entirely: χ² undefined
      .select(col("tok"), ca.as("c_a"), cb.as("c_b"), chi.as("chi2"))
      .orderBy(col("chi2").desc, col("tok"))
      .limit(k)
  }

  /** Per-document subword token counts under a trained subword vocab —
    * the "how many tokens is this corpus under MY tokenizer" step that
    * token-budget selection and packing actually need (whitespace counts
    * under-estimate; a real BPE vocab is the unit that matters). Words
    * segment via [[graft.functions.SubwordEncode]] — greedy longest-match
    * with single-char fallback, so counts are exact and lossless.
    *
    * Scale shape: the vocab rides the plan as a shared constant (one
    * HashSet per executor, not per row), segmentation is a shuffle-free
    * projection, and the only shuffle is the per-doc count aggregate.
    */
  def subwordTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                         vocab: Seq[String]): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .select(col(idCol),
        size(graft.functions.TextFunctions.subword_encode(col("w"),
          vocab.toArray)).as("k"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("k")).as("n_subwords"))

  /** Corpus-level rollup by a grouping column (e.g. source or lang). */
  def corpusStats(docs: DataFrame, groupCol: String, textCol: String): DataFrame =
    docs.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(length(col(textCol))).as("total_chars"),
      sum(size(split(col(textCol), " "))).as("total_tokens"),
      min(length(col(textCol))).as("min_chars"),
      max(length(col(textCol))).as("max_chars"))

  /** Per-group corpus diversity: distinct-n ratio (distinct n-grams over
    * total n-gram occurrences — the "distinct-n" diversity metric of
    * Li et al. 2016, the standard mode-collapse check on synthetic /
    * model-generated corpora). Ratio reported in exact integer per-mille
    * (`1000·distinct div total`) — no float division to disagree on.
    *
    * Scale shape: one explode + one two-level agg; the per-group distinct
    * goes through a (group, ngram) pre-aggregation, so the wide shuffle
    * carries each distinct n-gram once per group, not once per occurrence.
    */
  def distinctNgramRatio(docs: DataFrame, groupCol: String, textCol: String,
                         n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // CASE, not greatest(…, 0): Spark's sequence(1, 0) DESCENDS ([1, 0])
    // instead of returning empty — a short doc must contribute nothing
    val grams = docs.select(col(groupCol),
        explode(expr(
          s"""CASE WHEN size(split($textCol, ' ')) >= $n
             |THEN transform(sequence(1, size(split($textCol, ' ')) - ${n - 1}),
             |  i -> array_join(slice(split($textCol, ' '), i, $n), ' '))
             |ELSE array() END""".stripMargin)).as("ngram"))
    grams.groupBy(col(groupCol), col("ngram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(groupCol))
      .agg(sum(col("c")).as("total_ngrams"),
        count(lit(1)).as("distinct_ngrams"))
      .withColumn("permille_distinct",
        expr("1000L * distinct_ngrams div total_ngrams"))
  }

  /** Token frequency spectrum ("frequency of frequencies"): how many
    * distinct tokens occur c times, bucketed by ⌊log₂ c⌋ — the Zipf
    * profile vocab-pruning and tokenizer-budget decisions read. The
    * bucket is computed as `length(bin(c)) - 1`: pure integer string
    * length in BOTH engines, no floating log to round differently at
    * exact powers of two.
    */
  def tokenFrequencySpectrum(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .groupBy((length(bin(col("c"))) - 1).as("log2_freq"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("c")).as("n_occurrences"))

  /** Compression-ratio quality signal: deflate each document (zlib,
    * fixed level) and report bytes-out per mille of bytes-in — the
    * Gopher/RefinedWeb-family heuristic where extreme compressibility
    * flags boilerplate/repetition and extreme incompressibility flags
    * binary junk or gibberish. Pure per-partition projection: one
    * `Deflater` per task, payloads never shuffle. Deterministic for a
    * fixed JDK zlib (spec-pinned monotonicity, not bit-pinned across
    * JDKs — hence rows-only in the catalog).
    *
    * Output: (id, raw_len, deflate_len, compress_permille) — permille is
    * exact integer arithmetic, floor(1000·out/in).
    */
  def compressibility(docs: DataFrame, idCol: String, textCol: String,
                      level: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val buf = new Array[Byte](1 << 16)
        val d = new java.util.zip.Deflater(level)
        // release the native zlib stream deterministically when the
        // partition iterator is exhausted — end() on finalization only
        // would pin native memory until GC on long-lived executors
        new Iterator[(Long, Long, Long)] {
          private var ended = false
          def hasNext: Boolean = {
            val h = it.hasNext
            if (!h && !ended) { d.end(); ended = true }
            h
          }
          def next(): (Long, Long, Long) = {
            val (id, text) = it.next()
            val raw = text.getBytes("UTF-8")
            d.reset()
            d.setInput(raw); d.finish()
            var n = 0L
            while (!d.finished()) n += d.deflate(buf)
            (id, raw.length.toLong, n)
          }
        }
      }
      .toDF(idCol, "raw_len", "deflate_len")
      .withColumn("compress_permille",
        when(col("raw_len") === 0, 0L)
          .otherwise(expr("(deflate_len * 1000) div raw_len")))
  }

  /** Corpus-level line deduplication (CCNet / RefinedWeb practice,
    * public knowledge): a line occurring in ≥ `minDocs` DISTINCT
    * documents is boilerplate — navigation chrome, cookie banners,
    * license headers — and is removed from every document while the
    * rest of each document survives verbatim, in order. The
    * within-document complement of the whole-document dedup family:
    * exact/minhash dedup drops copies of a page; this strips the
    * template the pages share.
    *
    * Scale shape: one posexplode (line rows carry (id, pos, line) —
    * no document ever shuffles whole), one distinct-count aggregation
    * keyed by line (partial-aggregable), one anti-join of line rows
    * against the boilerplate set (small by construction — only lines
    * crossing the threshold), and a per-document reassembly whose
    * collect_list is bounded by document size. Documents whose EVERY
    * line is boilerplate still row out (empty text, full counts) — the
    * silent-absence guard.
    *
    * Output per document: `text_clean`, `n_lines`, `n_removed`.
    */
  /** The mined template set behind [[dedupLines]] — (line, df) for
    * every non-blank line occurring in ≥ `minDocs` distinct documents.
    * Exposed separately because the set is a deployable MODEL: the
    * streaming twin ships it as a plan constant and cleans documents
    * with a zero-state projection.
    */
  def boilerplateLines(docs: DataFrame, idCol: String, textCol: String,
                       minDocs: Long, sep: String = "\n"): DataFrame = {
    require(minDocs >= 2L,
      s"boilerplateLines: minDocs must be >= 2, got $minDocs")
    docs.select(col(idCol).as("__id"),
        explode(split(col(textCol),
          java.util.regex.Pattern.quote(sep))).as("line"))
      .filter(length(trim(col("line"))) > 0)
      .groupBy("line").agg(countDistinct("__id").as("df"))
      .filter(col("df") >= minDocs)
  }

  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
                 minDocs: Long, sep: String = "\n"): DataFrame = {
    require(minDocs >= 2L, s"dedupLines: minDocs must be >= 2, got $minDocs")
    val lines = docs.select(col(idCol).as("__id"),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(sep))))
      .toDF("__id", "pos", "line")
    val boiler = boilerplateLines(docs, idCol, textCol, minDocs, sep)
      .select("line")
    val kept = lines.join(boiler, Seq("line"), "left_anti")
    val totals = lines.groupBy("__id")
      .agg(count(lit(1)).as("n_lines"))
    val assembled = kept.groupBy("__id")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              struct(col("pos").as("p"), col("line").as("l")))),
            x => x.getField("l")),
          sep).as("text_clean"),
        count(lit(1)).as("n_kept"))
    totals.join(assembled, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        col("n_lines").cast("long").as("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L)))
          .cast("long").as("n_removed"))
  }
}
