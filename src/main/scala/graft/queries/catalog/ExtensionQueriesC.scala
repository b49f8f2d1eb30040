package graft.queries


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.{HostedTables, Tables}
import graft.core.{Chunker, ServiceName, WriteMode}
import graft.operators.{Calibration, Cdc, Curation, Dedup, Embeddings, GraphOps, HtmlText, Multimodal, Profiling, Regression, Scale, Similarity, Sketches, TextAnalysis}
import graft.sinks.HostedStore
import graft.streaming.EventStreams

/** LLM-pipeline extension queries, part C (tokenizers, packing, multimodal, export tail of the catalog).
  *
  * Part of the QueryCatalog split (r12): entries are verbatim from the
  * pre-split catalog; shared fixtures/SQL builders live in
  * [[CatalogHelpers]]; [[QueryCatalog]] assembles the public maps.
  */
private[queries] object ExtensionQueriesC {
  import CatalogHelpers._

  val entries: Map[String, Q] = Map(

    "x_sim_pq_deleted" -> ((s, dir) => { // oracle: sidecar-path ADC+rerank replay
      val emb = t(s, dir, "embeddings")
      val path = stageIndex(pqDelIdxDir, dir) {
        graft.operators.AnnIndex.pqBuild(emb, "vec_id", "embedding",
          pqDelIdxDir)
        graft.operators.AnnIndex.pqDelete(s, pqDelIdxDir,
          emb.filter(col("vec_id") % 2 =!= 0).select("vec_id"), "vec_id")
      }
      graft.operators.AnnIndex.pqServe(s, path, emb,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
        .orderBy("qid", "rank")
    }),

    "x_pq_report" -> ((s, dir) => { // oracle: census recomputed from the artifact
      // describeIvf's PQ sibling over the SAME pending-takedown index
      // as x_sim_pq_deleted: codebook shape (model identity), stored
      // codes, tombstone debt awaiting the fold, serving membership,
      // and the append history's file count — the figures a PQ index
      // operator alarms on.
      val emb = t(s, dir, "embeddings")
      val path = stageIndex(pqDelIdxDir, dir) {
        graft.operators.AnnIndex.pqBuild(emb, "vec_id", "embedding",
          pqDelIdxDir)
        graft.operators.AnnIndex.pqDelete(s, pqDelIdxDir,
          emb.filter(col("vec_id") % 2 =!= 0).select("vec_id"), "vec_id")
      }
      graft.operators.AnnIndex.describePq(s, path)
    }),

    "x_sim_pq_del_compacted" -> ((s, dir) => { // oracle: PLAIN ADC replay post-fold
      val emb = t(s, dir, "embeddings")
      val path = stageIndex(pqDelCmpIdxDir, dir) {
        graft.operators.AnnIndex.pqBuild(emb, "vec_id", "embedding",
          pqDelCmpIdxDir)
        graft.operators.AnnIndex.pqDelete(s, pqDelCmpIdxDir,
          emb.filter(col("vec_id") % 2 =!= 0).select("vec_id"), "vec_id")
        graft.operators.AnnIndex.pqCompact(s, pqDelCmpIdxDir)
      }
      graft.operators.AnnIndex.pqServe(s, path, emb,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
        .orderBy("qid", "rank")
    }),

    "x_stream_ann_serve" -> ((s, dir) => { // LIVE stream, shares the persisted replay
      // Streaming retrieval serving: query vectors ARRIVE as a stream
      // and each micro-batch serves against the persisted IVF index via
      // foreachBatch (a per-query rank is not a streaming aggregation).
      // Per-query results are batch-invariant — a query's top-k depends
      // only on its row + the static index — so the live path shares
      // x_sim_ivf_persisted's oracle replay verbatim.
      val emb = t(s, dir, "embeddings")
      val path = stageIndex(ivfIdxDir, dir)(
        graft.operators.AnnIndex.ivfBuild(emb, "vec_id", "embedding",
          ivfIdxDir, nlist = 16))
      // emb.schema IS the file schema (Tables.load only normalizes
      // timestamp columns, and embeddings has none) — no second footer
      // read just for the stream-reader schema
      graft.streaming.StreamAnnServe.runOnce(s, dir, "embeddings.parquet",
          emb.schema, col("vec_id") < 5, path, "vec_id", "embedding", 10,
          nprobe = 4)
        .orderBy("qid", "rank")
    }),

    "x_stream_bq_serve" -> ((s, dir) => { // LIVE stream, shares the persisted-BQ replay
      // Streaming serving at the scan floor: query vectors arrive as a
      // stream and each micro-batch Hamming-serves against the
      // persisted BQ codes via foreachBatch, exact re-rank per trigger.
      // Per-query results are batch-invariant, so the live path shares
      // x_sim_bq_persisted's oracle replay verbatim.
      val emb = t(s, dir, "embeddings")
      val path = stageIndex(bqIdxDir, dir)(
        graft.operators.AnnIndex.bqBuild(emb, "vec_id", "embedding",
          bqIdxDir))
      graft.streaming.StreamAnnServe.runOnceBq(s, dir,
          "embeddings.parquet", emb.schema, col("vec_id") < 5,
          path, emb, "vec_id", "embedding", 10)
        .orderBy("qid", "rank")
    }),

    "x_sim_pq_appended" -> ((s, dir) => { // oracle: ADC+rerank replay over the APPENDED index
      // PQ twin of the incremental lifecycle: codebooks trained on the
      // even-id half, the odd-id batch encoded later with the PERSISTED
      // codebooks and appended. The oracle reads only the final on-disk
      // codebooks + codes, so the hash proves encode-and-append composed
      // to one consistent index.
      val emb = t(s, dir, "embeddings")
      val path = stageIndex(pqAppIdxDir, dir) {
        graft.operators.AnnIndex.pqBuild(
          emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
          pqAppIdxDir)
        graft.operators.AnnIndex.pqAppend(
          emb.filter(col("vec_id") % 2 =!= 0), "vec_id", "embedding",
          pqAppIdxDir)
      }
      graft.operators.AnnIndex.pqServe(s, path, emb,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
        .orderBy("qid", "rank")
    }),

    "x_text_surprisal" -> ((s, dir) => { // float log-probs: rows-only oracle
      // CCNet-style quality signal: score every doc under a bigram LM
      // trained on the even-id half of the corpus.
      val docs = t(s, dir, "documents")
      TextAnalysis.bigramSurprisal(docs,
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
        .orderBy("doc_id")
    }),

    "x_text_surprisal_exact" -> ((s, dir) => { // hash-gated integer twin
      // Same bigram LM and broadcast-join plan as x_text_surprisal, at
      // the k = 1/2 rational configuration: per-bigram surprisal scored
      // as the bit-length difference of the exact integer ratio —
      // no floating log anywhere, so the report hash-verifies.
      val docs = t(s, dir, "documents")
      TextAnalysis.bigramSurprisalExact(docs,
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
        .orderBy("doc_id")
    }),

    "x_text_vocab" -> ((s, dir) =>
      TextAnalysis.vocab(t(s, dir, "documents"), "doc_id", "text", 50)
        .orderBy(col("tf").desc, col("tok"))),

    "x_text_tfidf" -> ((s, dir) =>
      // rational-idf variant (weight = tf/df): small-integer IEEE division
      // is bit-identical across engines, so the per-doc ranking hashes
      // green; the classic log-idf variant is spec-pinned instead
      TextAnalysis.tfidfTop(t(s, dir, "documents").filter(col("doc_id") < 100),
          "doc_id", "text", 3)
        .orderBy("doc_id", "rk")),

    "x_quality_classifier" -> ((s, dir) => { // integer-exact NB-margin filter
      // fastText-style corpus quality gate: train per-token rate margins
      // on a labeled split (src0 = curated, rest = raw), score every doc
      val docs = t(s, dir, "documents")
      TextAnalysis.nbQualityScore(docs,
          docs.filter(col("source") === "src0"),
          docs.filter(col("source") =!= "src0"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    "x_quality_calibrate" -> ((s, dir) => {
      // ISOTONIC CALIBRATION of the NB quality margin: the raw score
      // ranks docs, but threshold/mixing decisions need P(curated) —
      // fit the monotone step function against the src0 truth label
      // on 24 equal-width score buckets. One corpus pass; the PAVA
      // fit runs max-min on the model-sized bucket table.
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis.nbQualityScore(docs,
          docs.filter(col("source") === "src0"),
          docs.filter(col("source") =!= "src0"), "doc_id", "text")
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
        .withColumn("y", (col("source") === "src0").cast("long"))
      Calibration.isotonicCalibrate(scored, "score", "y", 24)
        .orderBy("bucket")
    }),

    "x_quality_calibrate_serve" -> ((s, dir) => {
      // PERSISTED-CALIBRATION SERVE: both model artifacts (NB token
      // weights, isotonic calibration table) staged as parquet once,
      // then every document scored and calibrated FROM the artifacts
      // alone — the deployment shape of the quality gate. The oracle
      // replays from the same parquet files.
      val path = stagedCalibration(s, dir)
      val weights = s.read.parquet(s"$path/weights")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val calib = s.read.parquet(s"$path/calib")
      val scored = graft.streaming.StreamClassify.score(
        t(s, dir, "documents"), weights, "doc_id", "text")
      Calibration.applyCalibration(scored, "doc_id", "score", calib)
        .orderBy("doc_id")
    }),

    "x_eval_auc" -> ((s, dir) => {
      // DISCRIMINATION: exact ROC AUC (Mann–Whitney with midrank ties)
      // of the raw NB margin against the src0 truth — the companion
      // number to x_eval_calibration's Brier: a gate can rank perfectly
      // yet be miscalibrated, and vice versa.
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis.nbQualityScore(docs,
          docs.filter(col("source") === "src0"),
          docs.filter(col("source") =!= "src0"), "doc_id", "text")
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
        .withColumn("y", (col("source") === "src0").cast("long"))
      Calibration.aucEval(scored, "score", "y")
    }),

    "x_eval_calibration" -> ((s, dir) => {
      // CALIBRATION QUALITY: Brier score of the served calibrated
      // probabilities vs the src0 truth, and the skill over the
      // constant base-rate predictor — "did calibrating buy predictive
      // value", one exact aggregation pass (the baseline sum is
      // algebraic in (n, pos, p0), no second scan).
      val path = stagedCalibration(s, dir)
      val weights = s.read.parquet(s"$path/weights")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val calib = s.read.parquet(s"$path/calib")
      val docs = t(s, dir, "documents")
      val scored = graft.streaming.StreamClassify.score(
        docs, weights, "doc_id", "text")
      val withY = Calibration.applyCalibration(scored, "doc_id", "score", calib)
        .join(docs.select(col("doc_id"),
          (col("source") === "src0").cast("long").as("y")), Seq("doc_id"))
      Calibration.calibrationEval(withY, "calibrated_permille", "y")
    }),

    "x_stream_calibrate" -> ((s, dir) => {
      // Streaming twin of the calibrated serve: NB fold + the isotonic
      // step function as plan constants over arriving rows — zero
      // streaming state, shares x_quality_calibrate_serve's oracle
      // verbatim (convergence to the identical table IS the gate).
      try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () }
      val path = stagedCalibration(s, dir)
      val weights = s.read.parquet(s"$path/weights")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val steps = s.read.parquet(s"$path/calib")
        .select("lo", "fitted_permille")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      graft.streaming.StreamCalibrate.runOnce(s, dir, "documents.parquet",
          schema, weights, steps, "doc_id", "text")
        .orderBy("doc_id")
    }),

    "x_quality_regress" -> ((s, dir) => {
      // LENGTH-BIAS AUDIT of the quality classifier: per-domain OLS of
      // NB margin score against doc length (tokens) by the normal
      // equations — one sufficient-statistics pass, exact Cramer solve
      // in DECIMAL(38,0). A large |slope| with high R² means the gate
      // is pricing length, not quality, in that domain.
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis.nbQualityScore(docs,
          docs.filter(col("source") === "src0"),
          docs.filter(col("source") =!= "src0"), "doc_id", "text")
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
      Regression.groupedLinearFit(scored, "source", "n_tokens", "score")
        .orderBy("source")
    }),

    "x_classifier_drift" -> ((s, dir) => {
      // SCORE-DISTRIBUTION DRIFT: total-variation distance between the
      // NB margin distributions of the curated slice and the rest, on
      // 16 shared equal-width buckets — the alarm that tells you the
      // gate's threshold has rotted (here it doubles as a separation
      // diagnostic: high TV = the classifier actually splits the two).
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis.nbQualityScore(docs,
          docs.filter(col("source") === "src0"),
          docs.filter(col("source") =!= "src0"), "doc_id", "text")
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
      Profiling.distributionDrift(
          scored.filter(col("source") === "src0"),
          scored.filter(col("source") =!= "src0"), "score", 16)
        .orderBy("bucket")
    }),

    "x_classifier_persisted" -> ((s, dir) => {
      // The model-registry lifecycle for the quality gate: train the
      // NB token-weight table ONCE, persist it as parquet, reload, and
      // score every document from the artifact alone (the codegen'd
      // O(1) weight probe — no training tables touched at serve time).
      // The oracle scores FROM the same parquet via read_parquet, so
      // the hash proves the persisted model reproduces the gate.
      val path = stageIndex(nbIdxDir, dir) {
        val docs = t(s, dir, "documents")
        TextAnalysis.nbTokenWeights(
            docs.filter(col("source") === "src0"),
            docs.filter(col("source") =!= "src0"), "text")
          .coalesce(1).write.mode("overwrite").parquet(s"$nbIdxDir/weights")
      }
      val weights = s.read.parquet(s"$path/weights")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      graft.streaming.StreamClassify.score(
          t(s, dir, "documents"), weights, "doc_id", "text")
        .orderBy("doc_id")
    }),

    "x_text_bm25" -> ((s, dir) => { // BM25 retrieval, rational idf
      // 3 query docs (first-5-token prefixes) ranked against the corpus;
      // per-term float contributions folded in token order for the oracle
      val docs = t(s, dir, "documents")
      val qs = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 5), " ").as("qtext"))
      TextAnalysis.bm25TopK(docs, qs, "doc_id", "text", "qid", "qtext", 10)
        .orderBy("qid", "rank")
    }),

    "x_eval_rbo" -> ((s, dir) => {
      // RANKING-DRIFT MEASUREMENT: truncated RBO@10 (p=0.9) between the
      // plain BM25 ranking and its PRF-expanded re-ranking, per query —
      // top-weighted overlap on the exact integer lattice, so the drift
      // score itself hash-verifies. The eval companion to
      // x_retrieval_prf (how much did feedback move the list?).
      val docs = t(s, dir, "documents")
      val qs = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 5), " ").as("qtext"))
      val bm = TextAnalysis.bm25TopK(docs, qs, "doc_id", "text",
        "qid", "qtext", 10)
      val prf = TextAnalysis.bm25Prf(docs, qs, "doc_id", "text",
        "qid", "qtext", 10)
      TextAnalysis.rboAtK(bm, prf, 10).orderBy("qid")
    }),

    "x_retrieval_prf" -> ((s, dir) => {
      // PSEUDO-RELEVANCE FEEDBACK (RM3-lite): BM25 top-5 per query →
      // mine the 10 most frequent NEW terms from the feedback docs →
      // expand → re-run BM25. Same prefix queries as x_text_bm25, so
      // the rank drift between the two entries IS the feedback effect.
      val docs = t(s, dir, "documents")
      val qs = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 5), " ").as("qtext"))
      TextAnalysis.bm25Prf(docs, qs, "doc_id", "text", "qid", "qtext", 10)
        .orderBy("qid", "rank")
    }),

    "x_bpe_pairs" -> ((s, dir) =>
      // round 1 of BPE tokenizer training: top adjacent-symbol pairs
      TextAnalysis.bpePairCounts(t(s, dir, "documents"), "text", 50)),

    "x_unigram_seed" -> ((s, dir) =>
      // Unigram-LM seed vocabulary (the SentencePiece start state):
      // substring candidates 1..4 chars, frequency-weighted, single-char
      // closure + capped multi-char top — integer-exact, oracle-hashed.
      graft.operators.Unigram.seedVocab(t(s, dir, "documents"), "text",
          seedSize = 500, maxPieceLen = 4, maxWords = 5000,
          wordPattern = Some("[a-z]+"))
        .orderBy("piece")),

    "x_unigram_train" -> ((s, dir) =>
      // FULL unigram-LM training (Kudo 2018, Viterbi-EM): 3 EM rounds
      // shrinking the seed toward 300 pieces. Rows-only by design —
      // Viterbi scores are log-doubles (same reason x_text_surprisal is
      // rows-only); UnigramSpec pins the DP against brute-force
      // enumeration and the planted-piece recovery.
      graft.operators.Unigram.train(t(s, dir, "documents"), "text",
          vocabSize = 300, rounds = 3, maxPieceLen = 4, seedSize = 500,
          maxWords = 5000, wordPattern = Some("[a-z]+"))
        .orderBy("rank")),

    "x_unigram_persisted" -> ((s, dir) => {
      // The third persisted tokenizer: the exact unigram model (piece,
      // cnt) trains once, persists as parquet, and serve time segments
      // guaranteed-OOV probe words (piece‖qq for every multi-char
      // piece) under the LOADED model only. The oracle reads the same
      // parquet via read_parquet and replays the positional DP — the
      // hash proves the on-disk model alone reproduces segmentation.
      val path = stageIndex(unigramIdxDir, dir) {
        graft.operators.Unigram.trainExact(t(s, dir, "documents"), "text",
            vocabSize = 300, rounds = 1, maxPieceLen = 4, seedSize = 500,
            maxWords = 5000, maxWordLen = 20, wordPattern = Some("[a-z]+"))
          .select("piece", "cnt")
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$unigramIdxDir/vocab")
      }
      val pv = s.read.parquet(s"$path/vocab")
      val vocab = pv.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val words = pv.filter(length(col("piece")) > 1)
        .select(concat(col("piece"), lit("qq")).as("word"),
          lit(1L).as("freq"))
        .distinct()
      graft.operators.Unigram.segmentExactWithModel(words, vocab,
          maxPieceLen = 4)
        .orderBy("word")
    }),

    "x_unigram_train_exact" -> ((s, dir) =>
      // INTEGER-EXACT unigram training — the hash-verifiable twin of
      // x_unigram_train: hard-EM under (fewest pieces, max Σcnt,
      // longest-last) so seed, EM round, prune and the final
      // shipped-vocab recount are all BIGINT arithmetic; the oracle
      // replays the per-word DP as an unrolled positional CTE chain.
      graft.operators.Unigram.trainExact(t(s, dir, "documents"), "text",
          vocabSize = 300, rounds = 1, maxPieceLen = 4, seedSize = 500,
          maxWords = 5000, maxWordLen = 20, wordPattern = Some("[a-z]+"))
        .orderBy("rank")),

    "x_unigram_segment_exact" -> ((s, dir) =>
      // Segmentation under the exact-trained unigram model — the
      // inference table of x_unigram_train_exact, hash-verified: the
      // oracle replays the final DP pass and string_aggs the ordered
      // backpointer-walk pieces.
      graft.operators.Unigram.trainExactSegments(t(s, dir, "documents"),
          "text", vocabSize = 300, rounds = 1, maxPieceLen = 4,
          seedSize = 500, maxWords = 5000, maxWordLen = 20,
          wordPattern = Some("[a-z]+"))
        .orderBy("word")),

    "x_unigram_segment" -> ((s, dir) => {
      // Unigram INFERENCE: Viterbi segmentation of the corpus vocabulary
      // under the trained model ('|'-joined pieces). Rows-only (float
      // scores), spec-pinned.
      val docs = t(s, dir, "documents")
      val vocab = graft.operators.Unigram.train(docs, "text",
          vocabSize = 300, rounds = 3, maxPieceLen = 4, seedSize = 500,
          maxWords = 5000, wordPattern = Some("[a-z]+"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      graft.operators.Unigram.segmentWords(docs, "text", vocab,
          maxPieceLen = 4, maxWords = 5000, wordPattern = Some("[a-z]+"))
        .orderBy("word")
    }),

    "x_bpe_train" -> ((s, dir) =>
      // FULL BPE training loop (Sennrich et al. 2016): 12 learned merges
      // over the corpus vocabulary. One corpus-scale word count; the
      // merge rounds run on the capped distinct-word table with a 1-row
      // argmax collect per round. Oracle = the identical loop as a
      // generated 12-round MATERIALIZED-CTE chain (greedy left-to-right
      // merging replayed as even-rank-in-run relational marking).
      graft.operators.Bpe.train(t(s, dir, "documents"), "text",
          numMerges = 12, maxWords = 5000, wordPattern = Some("[a-z]+"))
        .orderBy("merge_rank")),

    "x_wordpiece_train" -> ((s, dir) =>
      // WORDPIECE training (Wu et al. / BERT): the BPE loop with the
      // likelihood-gain objective cnt/(cnt_lhs·cnt_rhs) per round —
      // scores compared as IEEE double divisions of exact integers, so
      // the argmax is bit-identical cross-engine and the whole 12-round
      // run hash-verifies. Emits the score's integer factors per merge.
      graft.operators.Bpe.trainWordPiece(t(s, dir, "documents"), "text",
          numMerges = 12, maxWords = 5000, wordPattern = Some("[a-z]+"))._1
        .orderBy("merge_rank")),

    "x_wordpiece_persisted" -> ((s, dir) => {
      // WordPiece joins the persisted-tokenizer registry: the trained
      // merge table (with its likelihood-score factors) persists, and
      // serve segments merge-derived OOV words from the artifact alone
      // — same contract and oracle machinery as x_bpe_persisted (the
      // apply rounds only consume lhs/rhs in rank order).
      persistedTokenizerApply(s, wordpieceIdxDir, dir)(
        graft.operators.Bpe.trainWordPiece(t(s, dir, "documents"), "text",
          numMerges = 12, maxWords = 5000, wordPattern = Some("[a-z]+"))._1)
    }),

    "x_wordpiece_segment" -> ((s, dir) =>
      // The WordPiece-trained segmentation of the vocab table (tokens
      // joined with '|'): the trainer's second output surface, replayed
      // by the same scored CTE chain.
      graft.operators.Bpe.trainWordPiece(t(s, dir, "documents"), "text",
          numMerges = 12, maxWords = 5000, wordPattern = Some("[a-z]+"))._2
        .select(col("word"), col("freq"),
          array_join(col("syms"), "|").as("segmentation"))
        .orderBy("word")),

    "x_bpe_bytes" -> ((s, dir) =>
      // BYTE-LEVEL BPE (the GPT-2/tiktoken family): GPT-2-style regex
      // pre-tokenization (space-attached pre-tokens, contraction
      // suffixes), UTF-8-byte alphabet as hex-pair symbols, 12 learned
      // merges. No OOV by construction — the production-tokenizer shape
      // next to the classic word-level x_bpe_train. Oracle = the same
      // relational merge rounds over hex(encode(word)) symbols.
      graft.operators.Bpe.trainBytes(t(s, dir, "documents"), "text",
          numMerges = 12, maxWords = 5000)._1
        .orderBy("merge_rank")),

    "x_bpe_bytes_segment" -> ((s, dir) =>
      // Byte-level BPE inference: the trained hex-pair segmentation of
      // every pre-token after the 12 merges — the GPT-2-family
      // counterpart of x_bpe_segment, hash-verified.
      graft.operators.Bpe.trainBytes(t(s, dir, "documents"), "text",
          numMerges = 12, maxWords = 5000)._2
        .select(col("word"), col("freq"),
          array_join(col("syms"), "|").as("segmentation"))
        .orderBy("word")),

    "x_bpe_bytes_fertility" -> ((s, dir) => {
      // Byte-level fertility/compression report: bytes-per-token is THE
      // comparison metric between byte-level tokenizers; integer-exact
      // over the trained byte segmentation.
      val (_, vocab) = graft.operators.Bpe.trainBytes(
        t(s, dir, "documents"), "text", numMerges = 12, maxWords = 5000)
      vocab.agg(
        count(lit(1)).as("n_words"),
        sum(col("freq")).as("corpus_tokens"),
        sum(col("freq") * size(col("syms"))).as("weighted_pieces"),
        size(array_distinct(flatten(collect_list(col("syms")))))
          .cast("long").as("distinct_pieces"))
    }),

    "x_pipeline_tokenizer" -> ((s, dir) => {
      // Train → apply in ONE DataFrame program: learn 12 merges, then
      // tokenize the corpus through the trained vocab (broadcast — model
      // metadata) and report per-doc word/subtoken counts. In-vocab words
      // take the segmentation-lookup fast path; the inner join drops
      // out-of-vocab words by construction (maxWords covers the corpus
      // here — production would fall back to merge-rank application).
      val docs = t(s, dir, "documents")
      val (_, vocab) = graft.operators.Bpe.trainWithVocab(docs, "text",
        numMerges = 12, maxWords = 5000, wordPattern = Some("[a-z]+"))
      val words = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("word"))
      words.join(
          broadcast(vocab.select(col("word"), size(col("syms")).as("n_sub"))),
          Seq("word"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum("n_sub").cast("long").as("n_subtokens"))
        .orderBy("doc_id")
    }),

    "x_bpe_bytes_apply" -> ((s, dir) => {
      // Byte-level BPE inference on UNSEEN input: every pre-token gets a
      // 'q7' suffix, and the trained byte merges apply in rank order
      // over the hex-pair byte symbols — no OOV is possible at the byte
      // level, which is the property this entry exercises end to end.
      val (mergesDf, vocab) = graft.operators.Bpe.trainBytes(
        t(s, dir, "documents"), "text", numMerges = 12, maxWords = 5000)
      val merges = mergesDf.orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val oov = vocab.select(concat(col("word"), lit("q7")).as("word"))
      graft.operators.Bpe.applyMergesBytes(oov, "word", merges)
        .select(col("word"), array_join(col("syms"), "|").as("segmentation"))
        .orderBy("word")
    }),

    "x_bpe_apply" -> ((s, dir) => {
      // BPE inference on OUT-of-vocab words: every vocab word gets a
      // 'qq' suffix (guaranteed unseen — no corpus word survives the
      // [a-z]+ filter with that tail at this fixture), and the trained
      // merge list applies in rank order. The collect is the 12-row
      // merge table — model metadata, the same bounded collect train
      // itself performs.
      val (mergesDf, vocab) = graft.operators.Bpe.trainWithVocab(
        t(s, dir, "documents"), "text",
        numMerges = 12, maxWords = 5000, wordPattern = Some("[a-z]+"))
      val merges = mergesDf.orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val oov = vocab.select(concat(col("word"), lit("qq")).as("word"))
      graft.operators.Bpe.applyMerges(oov, "word", merges)
        .select(col("word"), array_join(col("syms"), "|").as("segmentation"))
        .orderBy("word")
    }),

    "x_bpe_persisted" -> ((s, dir) => {
      // The tokenizer lifecycle the ANN index already has: train ONCE,
      // persist the merge table as parquet, reload, and segment
      // guaranteed-OOV probe words (lhs‖rhs‖qq, derived from the merges
      // themselves) from the persisted artifact ONLY — serve time never
      // touches the corpus. The oracle reads the SAME parquet via
      // read_parquet and replays the apply rounds, so the hash proves
      // the on-disk bytes alone reproduce the trained segmentation.
      persistedTokenizerApply(s, bpeIdxDir, dir)(
        graft.operators.Bpe.train(t(s, dir, "documents"), "text",
          numMerges = 12, maxWords = 5000, wordPattern = Some("[a-z]+")))
    }),

    "x_bpe_segment" -> ((s, dir) => {
      // BPE INFERENCE via the trained vocab table: every in-vocabulary
      // word's final segmentation after the 12 merges (broadcast this
      // table and in-vocab tokenization is a lookup). Tokens joined with
      // '|' so the hashed output is a plain string.
      val (_, vocab) = graft.operators.Bpe.trainWithVocab(
        t(s, dir, "documents"), "text",
        numMerges = 12, maxWords = 5000, wordPattern = Some("[a-z]+"))
      vocab.select(col("word"), col("freq"),
          array_join(col("syms"), "|").as("segmentation"))
        .orderBy("word")
    }),

    "x_bpe_fertility" -> ((s, dir) => {
      // Tokenizer evaluation under the trained BPE model: corpus
      // fertility/compression as pure integers — distinct vocab words,
      // corpus word occurrences, occurrence-weighted subword count
      // (weighted_pieces / corpus_tokens = tokens-per-word fertility),
      // and the emitted piece inventory. The metric a tokenizer choice
      // is actually judged by, integer-exact so the full train+segment
      // +aggregate pipeline hash-matches.
      val (_, vocab) = graft.operators.Bpe.trainWithVocab(
        t(s, dir, "documents"), "text",
        numMerges = 12, maxWords = 5000, wordPattern = Some("[a-z]+"))
      vocab.agg(
        count(lit(1)).as("n_words"),
        sum(col("freq")).as("corpus_tokens"),
        sum(col("freq") * size(col("syms"))).as("weighted_pieces"),
        size(array_distinct(flatten(collect_list(col("syms")))))
          .cast("long").as("distinct_pieces"))
    }),

    "x_hybrid_retrieval" -> ((s, dir) => { // RRF lexical+dense hybrid
      // Cormack-style reciprocal-rank fusion of BM25 and exact cosine
      // top-20 lists (doc_id ≡ vec_id in the fixtures), re-ranked to 10
      val docs = t(s, dir, "documents")
      val qs = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), " "), 1, 5), " ").as("qtext"))
      val lex = TextAnalysis.bm25TopK(docs, qs, "doc_id", "text", "qid", "qtext", 20)
      val emb = t(s, dir, "embeddings")
      val dense = Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") < 3), "vec_id", "embedding", 20)
      TextAnalysis.rrfFuse(lex, dense, 10).orderBy("qid", "rank")
    }),

    "x_chunk_tokens" -> ((s, dir) =>
      // RAG corpus prep: 32-token windows advancing by 24 (8-token overlap)
      Curation.chunkTokens(t(s, dir, "documents"), "doc_id", "text", 32, 24)
        .orderBy("doc_id", "chunk_id")),

    "x_split_leakfree" -> ((s, dir) => {
      // Leakage-free eval split: near-dup clusters split as a UNIT —
      // no near-duplicate pair ever straddles train/test.
      val docs = t(s, dir, "documents")
      val clusters = Dedup.duplicateClusters(
        Dedup.jaccardPairs(docs, "doc_id", "text", 0.6,
          maxShingleFreq = Some(jaccardFreqCap)))
      graft.operators.AsOfJoin.leakFreeSplit(
          docs.select("doc_id"), clusters, "doc_id", 80)
        .orderBy("doc_id")
    }),

    "x_text_heavyhitters" -> ((s, dir) => {
      // Rows-only by design: the CMS counters hash with murmur inside
      // Spark's sketch — DuckDB can't replay them. The exact top-k twin
      // is x_text_vocab (oracle-hashed); SketchesSpec pins approx ≡ exact
      // on fixture tokens and the one-sided error bound.
      val toks = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
      Sketches.heavyHittersCms(toks, "tok", k = 20)
        .orderBy("rank")
    }),

    "x_distinct_ngrams" -> ((s, dir) =>
      // Per-source diversity (distinct-3 ratio): the mode-collapse check
      // run on synthetic/model-generated corpora; exact per-mille ints.
      TextAnalysis.distinctNgramRatio(t(s, dir, "documents"),
          "source", "text", n = 3)
        .orderBy("source")),

    "x_token_spectrum" -> ((s, dir) =>
      // Zipf profile: tokens per ⌊log2 freq⌋ bucket via integer
      // bin-length — vocab-pruning / tokenizer-budget input.
      TextAnalysis.tokenFrequencySpectrum(t(s, dir, "documents"), "text")
        .orderBy("log2_freq")),

    "x_pack_corpus" -> ((s, dir) =>
      // Pretraining packing: md5-shuffled corpus concatenated into one
      // token stream, each doc assigned its global offset and the
      // 512-token training sequences its first/last tokens land in.
      Curation.packCorpus(
          t(s, dir, "documents").select(col("doc_id"),
            md5(col("doc_id").cast("string")).as("__hx"),
            size(split(col("text"), " ")).cast("long").as("n_tokens")),
          Seq("__hx", "doc_id"), "n_tokens", seqLen = 512L)
        .select("doc_id", "n_tokens", "cum_before", "seq_first", "seq_last")
        .orderBy("doc_id")),

    "x_pipeline_pretrain" -> ((s, dir) => {
      // Pretraining-mix composite: NB quality gate → DSIR target-domain
      // weighting of the survivors → exact top-quartile curriculum cut →
      // deterministic export shards — ONE DataFrame program, replayed by
      // ONE DuckDB CTE chain (every stage individually hash-proven).
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis.nbQualityScore(docs,
        docs.filter(col("source") === "src0"),
        docs.filter(col("source") =!= "src0"), "doc_id", "text")
      val survivors = docs.join(
        scored.filter(col("score") > 0).select("doc_id"), Seq("doc_id"))
      val dsir = Curation.dsirWeights(survivors,
        docs.filter(col("source") === "src0"), "doc_id", "text")
      val top = Curation.curriculumBuckets(dsir, "doc_id", "dsir_score",
          nBuckets = 4, easyFirst = false)
        .filter(col("bucket") === 0)
      Curation.shuffleShards(top.select("doc_id", "rank"), "doc_id", 4)
        .orderBy("doc_id")
    }),

    "x_curriculum" -> ((s, dir) =>
      // Length curriculum (short = easy first): exact global rank +
      // exact decile bucket via the distributed two-pass ranker — no
      // single-partition ntile window anywhere in the plan.
      Curation.curriculumBuckets(t(s, dir, "documents"), "doc_id", "n_chars",
          nBuckets = 10)
        .orderBy("doc_id")),

    "x_dsir_weights" -> ((s, dir) => {
      // DSIR importance weighting: target domain = source 'src0'; every
      // doc scored by its summed smoothed target/source token ratios —
      // sorted-fold doubles, bit-replayable like bm25.
      val docs = t(s, dir, "documents")
      Curation.dsirWeights(docs, docs.filter(col("source") === "src0"),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    "x_stream_dsir" -> ((s, dir) => { // streaming importance-resampling gate
      // Ingest-time DSIR: the ratio table is precomputed from the static
      // corpora with the SAME division expression as the batch operator
      // (identical bits), then the live stream folds it per row in sorted
      // token order — stream scores ≡ batch scores, same oracle SQL as
      // x_dsir_weights.
      try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () }
      val docs = t(s, dir, "documents")
      val ratios = Curation.dsirRatioTable(docs,
          docs.filter(col("source") === "src0"), "text")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      graft.streaming.StreamDsir.runOnce(s, dir, "documents.parquet",
          schema, ratios, "doc_id", "text")
        .orderBy("doc_id")
    }),

    "x_stream_route" -> ((s, dir) => {
      // Streaming dead-letter ROUTING: every micro-batch splits across
      // two hosted tables (accepted → main corpus, rejected →
      // quarantine) inside one foreachBatch; both sinks write UPSERT
      // keyed on doc_id, so replayed batches re-apply idempotently —
      // exactly-once by merge semantics, no manual batch-id tracking.
      // The union of both tables is a pure function of each row, so the
      // full multi-sink streaming run hash-verifies.
      try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () }
      val docs = t(s, dir, "documents")
      val weights = TextAnalysis.nbTokenWeights(
          docs.filter(col("source") === "src0"),
          docs.filter(col("source") =!= "src0"), "text")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      graft.streaming.StreamRouter.runOnce(s, dir, "documents.parquet",
          schema, weights, "doc_id", "text")
        .orderBy("doc_id")
    }),

    "x_stream_classify" -> ((s, dir) => { // streaming NB quality gate
      // The REAL streaming path (readStream → stateless fold → memory
      // sink, AvailableNow): integer scores make even the stream
      // oracle-hashable — same model, same SQL as x_quality_classifier.
      try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () }
      val docs = t(s, dir, "documents")
      val weights = TextAnalysis.nbTokenWeights(
          docs.filter(col("source") === "src0"),
          docs.filter(col("source") =!= "src0"), "text")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      graft.streaming.StreamClassify.runOnce(s, dir, "documents.parquet",
          schema, weights, "doc_id", "text")
        .orderBy("doc_id")
    }),

    "x_corpus_drift" -> ((s, dir) => { // chi-square distribution-shift monitor
      val docs = t(s, dir, "documents")
      TextAnalysis.driftTopTokens(docs.filter(col("source") === "src0"),
        docs.filter(col("source") === "src1"), "text", 50)
    }),

    "x_emb_norm_outliers" -> ((s, dir) =>
      // corrupt-vector gate: extreme 2% norm tails, rank-based cutoffs
      Embeddings.normOutliers(t(s, dir, "embeddings"), "vec_id", "embedding",
          0.02)
        .orderBy("vec_id")),

    "x_subword_tokenize" -> ((s, dir) => { // tokenizer-apply under BPE vocab
      val docs = t(s, dir, "documents")
      // model metadata: the induced 50-pair vocab is policy-sized — the
      // driver collect is bounded like the domain-mix weight list; the
      // corpus itself never collects
      val vocab = TextAnalysis.bpePairCounts(docs, "text", 50)
        .collect().map(_.getString(0)).toSeq
      TextAnalysis.subwordTokenCounts(docs, "doc_id", "text", vocab)
        .orderBy("doc_id")
    }),

    "x_tokenizer_domains" -> ((s, dir) => {
      // TOKENIZER EVAL BY DOMAIN: fertility (subwords per word,
      // permille) per source under the induced vocab — the per-domain
      // gate a tokenizer choice is actually judged by: a tokenizer fine
      // for web prose can be terrible for code or tables, and the
      // corpus-global x_bpe_fertility average hides exactly that.
      // Composition of existing kernels; the same recursive-CTE
      // segmentation replays the rollup.
      val docs = t(s, dir, "documents")
      val vocab = TextAnalysis.bpePairCounts(docs, "text", 50)
        .collect().map(_.getString(0)).toSeq
      TextAnalysis.subwordTokenCounts(docs, "doc_id", "text", vocab)
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
        .groupBy("source")
        .agg(countDistinct("doc_id").cast("long").as("n_docs"),
          sum("n_words").cast("long").as("n_words"),
          sum("n_subwords").cast("long").as("n_subwords"))
        .withColumn("fertility_permille",
          expr("CAST(n_subwords * 1000 DIV n_words AS BIGINT)"))
        .orderBy("source")
    }),

    "x_stream_tokenize" -> ((s, dir) => {
      // Streaming tokenizer-apply: the codegen'd greedy subword encoder
      // (plan-constant vocab) folded WITHIN each arriving row — zero
      // streaming state, bit-identical to the batch segmentation, so
      // the live stream hash-verifies against the SAME recursive-CTE
      // oracle as x_subword_tokenize.
      val docs = t(s, dir, "documents")
      val vocab = TextAnalysis.bpePairCounts(docs, "text", 50)
        .collect().map(_.getString(0))
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      graft.streaming.StreamTokenize.runOnce(s, dir, "documents.parquet",
          schema, vocab, "doc_id", "text")
        .orderBy("doc_id")
    }),

    "x_corpus_heaps" -> ((s, dir) => {
      // Heaps'-law vocabulary growth: distinct-token counts at nested
      // corpus prefixes (20%..100% by doc id) — the curve tokenizer
      // vocab budgets and "is more data still adding words" decisions
      // are read from. One token scan, five conditional distinct aggs;
      // prefix cuts are exact integer comparisons (doc_id·100 ≤ max·f).
      // At 100 TB the same report runs on KMV sketches (one pass,
      // capacity longs per prefix) instead of exact count(DISTINCT).
      val docs = t(s, dir, "documents")
      val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
      val toks = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      val aggs = Seq(20, 40, 60, 80, 100).map(f =>
        countDistinct(when(col("doc_id") * 100 <= lit(mx) * f, col("tok")))
          .as(s"v$f"))
      toks.agg(aggs.head, aggs.tail: _*)
    }),

    "x_corpus_heaps_kmv" -> ((s, dir) =>
      // The 100 TB Heaps curve: same nested-prefix report as
      // x_corpus_heaps but on per-prefix KMV sketches — one token pass,
      // capacity longs per prefix cross the exchange instead of the
      // exact variant's per-prefix distinct sets. Capacity 16 < the
      // fixture's ~31 distinct tokens, so every prefix runs in the
      // ESTIMATOR regime — which still hash-verifies: the k-th minimum
      // of md5-prefix hashes is a rank selection DuckDB replays exactly
      // (same trust as x_kmv_distinct). Production capacity (~4k) is a
      // knob, not a code path: both regimes are one Aggregator.
      graft.operators.Sketches.heapsKmv(t(s, dir, "documents"),
          "doc_id", "text", capacity = 16)
        .orderBy("pct")),

    "x_corpus_stats" -> ((s, dir) =>
      TextAnalysis.corpusStats(t(s, dir, "documents"), "source", "text")
        .orderBy("source")),

    "x_stratified_sample" -> ((s, dir) =>
      Curation.stratifiedSample(
          t(s, dir, "documents").select("doc_id", "lang", "n_chars"),
          "lang", "doc_id", 10)
        .orderBy("lang", "doc_id")),

    "x_pack_sequences" -> ((s, dir) =>
      Curation.packSequences(
          t(s, dir, "documents")
            .select(col("doc_id"), col("source"),
              size(split(col("text"), " ")).as("n_tokens")),
          "source", "doc_id", "n_tokens", 512)
        .select("doc_id", "source", "n_tokens", "bin")
        .orderBy("source", "doc_id")),

    "x_multimodal_meta" -> ((s, dir) =>
      Multimodal.metadata(
          Multimodal.withPayload(t(s, dir, "documents"), "doc_id", "text"),
          "doc_id")
        .orderBy("doc_id")),

    "x_approx_distinct" -> ((s, dir) => // HLL sketch: rows-only (approximate)
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),

    "x_multimodal_frames" -> ((s, dir) => // real BMP decode: rows-only oracle
      // payloads are genuine 24-bit BMP streams; width/height come from
      // parsed headers, mean intensity from decoded pixels (Bmp.scala)
      Multimodal.decodeFrames(
          Multimodal.withBmpPayload(t(s, dir, "documents"), "doc_id", "text"),
          "doc_id")
        .orderBy("id", "frame_no")),

    "x_multimodal_jpeg" -> ((s, dir) => { // real JPEG codec: rows-only oracle
      // Full baseline-JPEG path: deterministic frames DCT-compressed as
      // true 4:2:0 JFIF (Annex-K tables, Huffman entropy coding), then
      // decode → resize → re-encode-as-JPEG → decode again. Lossy by
      // nature, deterministic by construction; round-trip error bounds
      // and the marker/Huffman/upsample machinery are spec-pinned
      // (JpegSpec) — emitted surface is dims + decoded intensities of the
      // resized frames, like the PNG twin below.
      val jpegs = Multimodal.withJpegPayload(
        t(s, dir, "documents").filter(col("doc_id") < 100), "doc_id", "text")
      Multimodal.decodeFrames(
          Multimodal.resizeImages(jpegs, "doc_id", 6, 4), "doc_id")
        .orderBy("id", "frame_no")
    }),

    "x_multimodal_png" -> ((s, dir) => { // real PNG codec: rows-only oracle
      // Full PNG path: deterministic frames zlib-encoded as true PNGs
      // (chunk layout + CRCs + deflate), then decode → resize →
      // re-encode-as-PNG → decode again. The round-trip equality with
      // the BMP pipeline's decoded frames is spec-pinned (PngSpec);
      // here the decoded dimensions and intensities of resized PNG
      // payloads are the emitted surface.
      val pngs = Multimodal.withPngPayload(
        t(s, dir, "documents"), "doc_id", "text")
      Multimodal.decodeFrames(
          Multimodal.resizeImages(pngs, "doc_id", 6, 4), "doc_id")
        .orderBy("id", "frame_no")
    }),

    "x_multimodal_audio" -> ((s, dir) => // real WAV decode: rows-only oracle
      // payloads are genuine RIFF/PCM16 files; stats come from decoded
      // samples (Wav.scala), spec-pinned against a driver-side decode
      Multimodal.decodeAudio(
          Multimodal.withWavPayload(t(s, dir, "documents"), "doc_id", "text"),
          "doc_id")
        .orderBy("id")),

    "x_multimodal_features" -> ((s, dir) => { // decoded-pixel features: rows-only oracle
      // media → REAL BMP decode → feature vector → exact ANN top-k, all
      // inside the engine: the multimodal-to-similarity bridge end-to-end
      val feats = Multimodal.extractFeatures(
        Multimodal.withBmpPayload(t(s, dir, "documents"), "doc_id", "text"),
        "doc_id", dim = 16)
      Similarity.bruteForceTopK(feats, feats.filter(col("doc_id") < 3),
          "doc_id", "feature", 10)
        .orderBy("qid", "rank")
    }),

    "x_exact_quantiles" -> ((s, dir) =>
      // Distributed-EXACT order statistics: token-length quantiles per
      // language from the value-count compaction (the window runs over
      // distinct VALUES per group, never rows — the scale form of
      // q_percentiles' window-over-rows).
      Profiling.exactQuantiles(
          t(s, dir, "documents").select(col("lang"),
            size(split(col("text"), " ")).cast("long").as("n_tokens")),
          "lang", "n_tokens",
          Seq(("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p95", 19, 20)))
        .select(col("grp").as("lang"), col("q_label"), col("q_value"),
          col("n_rows"))
        .orderBy("lang", "q_label")),

    "x_weighted_sample" -> ((s, dir) =>
      // Probability-proportional-to-size sampling with NO RNG: systematic
      // selection over the cumulative char-weight line (picks every
      // 5000th char position's owner; multiplicity = interval hits).
      Curation.systematicSample(
          t(s, dir, "documents").select("doc_id", "n_chars"),
          Seq("doc_id"), "n_chars", step = 5000L)
        .select("doc_id", "n_chars", "cum_before", "n_picks")
        .orderBy("doc_id")),

    "x_profile_columns" -> ((s, dir) =>
      // Batch ingest audit: one aggregation pass over the corpus — row /
      // null / exact-distinct counts + lexicographic min/max rendering
      // per column.
      Profiling.columnProfile(t(s, dir, "documents"),
          Seq("doc_id", "lang", "n_chars", "source", "text"))
        .orderBy("col_name")),

    "x_graph_labelprop" -> ((s, dir) => {
      // Community detection over the kNN similarity graph: synchronous
      // plurality label propagation, deterministic ties — the topic-ish
      // corpus sharding CC is too coarse for (one bridge edge merges
      // two CC components; LPA keeps dense neighborhoods apart).
      val edges = Similarity.knnGraph(t(s, dir, "embeddings"),
        "vec_id", "embedding", 5, nlist = 64, nprobe = 8)
      GraphOps.labelPropagation(edges, "qid", "id", rounds = 4)
        .select(col("node").as("vec_id"), col("label").as("community"))
        .orderBy("vec_id")
    }),

    "x_spatial_neighbors" -> ((s, dir) => {
      // Spatial self-join on the connector's point-geometry convention:
      // all feature pairs within planar eps=50, grid-bucketed (home cell
      // vs 3x3 neighborhood — every qualifying pair meets on exactly one
      // key, no distinct) with the exact dx²+dy² filter in the join
      // projection. The oracle brute-forces the same IEEE arithmetic:
      // candidate pruning must never change the answer.
      // CAP NOTE: this oracle does NOT model maxCellSize — sound
      // because SpatialSpec gates 8x home-cell headroom under the default
      // cap on every judged fixture (a near-cap fixture fails there first).
      val back = customerPointLayer(s, dir, "q_layer_spatial")
      graft.operators.Spatial.neighborPairs(
          back.select(col("c_custkey"), col("geometry")), "c_custkey", 50.0)
        .orderBy("a", "b")
    }),

    "x_spatial_dbscan" -> ((s, dir) => {
      // DBSCAN over the point layer: density screen (core = >= 3
      // points within eps incl. self) -> min-id components over the
      // core-core eps-graph -> min-label border attach -> NULL noise.
      // Every step past the grid-bucketed neighbor join is integer/
      // min-label arithmetic, so DuckDB replays the whole clustering
      // (brute-force pairs + recursive min-label CC) hash-exactly.
      // CAP NOTE: this oracle does NOT model maxCellSize — sound
      // because SpatialSpec gates 8x home-cell headroom under the default
      // cap on every judged fixture (a near-cap fixture fails there first).
      val back = customerPointLayer(s, dir, "q_layer_spatial")
      graft.operators.Spatial.dbscanClusters(
          back.select(col("c_custkey"), col("geometry")), "c_custkey",
          eps = 50.0, minPts = 3)
        .orderBy("c_custkey")
    }),

    "x_spatial_join" -> ((s, dir) => {
      // TWO-TABLE spatial eps-join: customer layer × supplier layer,
      // all cross-layer pairs within planar eps=50. Same grid shape as
      // x_spatial_neighbors (left home cell vs right 3×3 — every
      // qualifying pair meets on exactly one key), per-side cell caps.
      // The oracle brute-forces the same IEEE arithmetic: candidate
      // pruning must never change the answer.
      // CAP NOTE: this oracle does NOT model maxCellSize — sound
      // because SpatialSpec gates 8x home-cell headroom under the default
      // cap on every judged fixture (a near-cap fixture fails there first).
      val c = customerPointLayer(s, dir, "q_layer_spatial_l")
      val sup = supplierPointLayer(s, dir, "q_layer_spatial_r")
      graft.operators.Spatial.epsJoin(
          c.select(col("c_custkey"), col("geometry")), "c_custkey",
          sup.select(col("s_suppkey"), col("geometry")), "s_suppkey", 50.0)
        .orderBy("a", "b")
    }),

    "x_spatial_nearest" -> ((s, dir) => {
      // Nearest supplier within eps per customer (left-join semantics:
      // NULL when none) — deterministic ties by (dist2, min right id),
      // picked with ONE min(struct) hash agg, never a per-id window
      // over the pair set. dist2 compares as IEEE doubles, so DuckDB's
      // row_number replay picks the identical row.
      // CAP NOTE: this oracle does NOT model maxCellSize — sound
      // because SpatialSpec gates 8x home-cell headroom under the default
      // cap on every judged fixture (a near-cap fixture fails there first).
      val c = customerPointLayer(s, dir, "q_layer_spatial_l")
      val sup = supplierPointLayer(s, dir, "q_layer_spatial_r")
      graft.operators.Spatial.nearestWithinEps(
          c.select(col("c_custkey"), col("geometry")), "c_custkey",
          sup.select(col("s_suppkey"), col("geometry")), "s_suppkey", 50.0)
        .orderBy("a")
    }),

    "x_spatial_nn" -> ((s, dir) => {
      // NEAREST, FULL STOP (no eps bound) — the follow-up when
      // nearestWithinEps answers null: ring-expanding grid search by
      // cell-size doubling (round k searches the 3×3 neighborhood at
      // 50·2^k; a best below the scale is the global nearest since
      // every closer point was a candidate; the rest escalate).
      // log(span) rounds, never a cross join. On the judged fixture
      // most customers sit far above the supplier band (y = key·0.5
      // spans 10× the supplier range), so the multi-round escalation
      // path executes HERE, not just in the spec. Oracle: brute-force
      // rank-1 replay over the full cross product — candidate search
      // must never change the answer.
      val c = customerPointLayer(s, dir, "q_layer_spatial_l")
      val sup = supplierPointLayer(s, dir, "q_layer_spatial_r")
      graft.operators.Spatial.nearestNeighbor(
          c.select(col("c_custkey"), col("geometry")), "c_custkey",
          sup.select(col("s_suppkey"), col("geometry")), "s_suppkey", 50.0)
        .orderBy("a")
    }),

    "x_spatial_knn" -> ((s, dir) => {
      // k-NEAREST JOIN (k = 3) — [[x_spatial_nn]]'s k > 1 twin, the
      // layer consumer's next question after "nearest": the same
      // doubling ladder, but a point resolves when its k-th best
      // distance clears the scale (an exact k-th tie escalates a
      // round; ties within the candidate set pin to the smaller id).
      // Oracle: brute-force rank-≤3 replay over the cross product.
      val c = customerPointLayer(s, dir, "q_layer_spatial_knn_l")
      val sup = supplierPointLayer(s, dir, "q_layer_spatial_knn_r")
      graft.operators.Spatial.kNearestNeighbors(
          c.select(col("c_custkey"), col("geometry")), "c_custkey",
          sup.select(col("s_suppkey"), col("geometry")), "s_suppkey",
          3, 50.0)
        .orderBy("a", "rank")
    }),

    "x_spatial_dropped" -> ((s, dir) => {
      // THE NO-SILENT-CAPS CENSUS for the spatial grid miners: the cells
      // a maxCellSize gate would exclude, with their occupancy — the
      // blockedFuzzyMatchDropped discipline applied to the eps-join
      // family. eps=500 coarsens the grid until natural cells exceed the
      // deliberately small cap, so the census is NON-EMPTY on the judged
      // fixture (an always-empty census would test nothing).
      val back = customerPointLayer(s, dir, "q_layer_spatial")
      graft.operators.Spatial.neighborPairsDroppedCells(
          back.select(col("c_custkey"), col("geometry")), "c_custkey",
          eps = 500.0, maxCellSize = 25)
        .orderBy("cellx", "celly")
    }),

    "x_spatial_prunestats" -> ((s, dir) => { // oracle: census replay over the staged layout
      // BBOX FILE SKIPPING ON A POINT LAYER, MEASURED — Scale.zorderBy's
      // pruning wired to the spatial read surface (ap.py:246-249 reads
      // layers; the connector pushes bbox filters): the layer is
      // persisted in Spatial.zorderLayout order (geometry-derived Morton
      // buckets as the hive unit footer stats attach to), then the
      // zone-map census flags every unit a stats-aware bbox scan never
      // opens. Hash-verifies because the bucketized layout is a pure
      // function of the data (bounds agg + fixed-order IEEE affine).
      val staged = stageIndex(spatialLayoutDir, dir) {
        val back = customerPointLayer(s, dir, "q_layer_spatial")
        val laid = graft.operators.Spatial.zorderLayout(
          back.select(col("c_custkey"), col("geometry")))
        laid.select(col("c_custkey"),
            graft.api.Geometry.x(laid).as("x"),
            graft.api.Geometry.y(laid).as("y"), col("zb"))
          .repartition(col("zb"))
          .write.mode("overwrite").partitionBy("zb")
          .parquet(spatialLayoutDir)
      }
      graft.operators.Scale.pruneStats(s.read.parquet(staged),
          Seq("x", "y"), Seq(("x", 0L, 2000L), ("y", 100L, 400L)),
          fileLabel = col("zb").cast("long"))
        .orderBy("file")
    }),

    "x_spatial_zorder_scan" -> ((s, dir) => {
      // THE READ-SIDE CLOSURE of x_spatial_prunestats: the same bbox
      // EXECUTED through the production z-order read path —
      // Spatial.zorderWrite persists the layer hive-partitioned by
      // Morton unit with its bounds metadata, and zorderBboxRead maps
      // the bbox to its overlapping unit SET at planning time (a
      // partition filter that prunes whole directories, never a corpus
      // sweep), with the exact x/y predicates pushed to the touched
      // units' footers on top. Content-neutral: DuckDB replays the bbox
      // over the recomputed x/y from the base table — a layout pass
      // must never change the answer (the x_layout_compact discipline).
      // ZorderSkipSpec gates the part a hash cannot: the scan's own
      // numFiles/numOutputRows metrics show directories pruned and row
      // groups skipped (census said 52/64 prunable; the spec proves the
      // reader obeys).
      val staged = stageIndex(spatialZreadDir, dir) {
        val back = customerPointLayer(s, dir, "q_layer_spatial")
        graft.operators.Spatial.zorderWrite(
          back.select(col("c_custkey"), col("geometry")), spatialZreadDir)
      }
      graft.operators.Spatial.zorderBboxRead(s, staged,
          0.0, 2000.0, 100.0, 400.0)
        .select("c_custkey", "x", "y")
        .orderBy("c_custkey")
    }),

    "x_multimodal_imagehash" -> ((s, dir) => { // real BMP decode: rows-only oracle
      // Perceptual image dedup: REAL BMP decode → 8×8 aHash → byte-band
      // candidate join → exact Hamming verify (recall is pigeonhole-exact
      // at ≤7 bits). The corpus is doubled with id-shifted copies, the
      // same fixture convention as x_dedup_exact, so exact-duplicate
      // images (hamming 0) are guaranteed present alongside any natural
      // near-dups.
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val doubled = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + lit(100000L)))
      val hashes = Multimodal.imageHashes(
          Multimodal.withBmpPayload(doubled, "doc_id", "text"), "doc_id")
        .filter(col("frame_no") === 0)
        .select(col("id"), col("ahash"))
      Multimodal.imageNearDupPairs(hashes, maxHamming = 6)
        .orderBy("a", "b")
    }),

    "x_dedup_audio" -> ((s, dir) => {
      // The AUDIO member of the dedup family: one 64-bit energy-delta
      // fingerprint per clip (Haitsma–Kalker family, integer-exact in
      // the payload bytes), persisted as a signature table, then the
      // SAME modality-agnostic hamming-LSH miner as x_dedup_images —
      // one miner, two modalities, one oracle replay shape. DuckDB
      // replays band + verify over the staged parquet.
      val staged = stageAudioPrints(s, dir)
      Multimodal.audioNearDupPairs(s.read.parquet(staged), maxHamming = 6)
        .orderBy("a", "b")
    }),

    "x_dedup_images" -> ((s, dir) => {
      // The image member of the dedup family as an ORACLE-HASHED miner:
      // web-crawl multimodal dedup is hash-then-bucket, never pairwise —
      // the input is a persisted SIGNATURE table (one 64-bit aHash per
      // image; the decode chain that produces it stays rows-only as a
      // JDK artifact, pinned by ImageHashSpec), and the miner is
      // hamming-LSH: 8 byte-bands (pigeonhole-exact recall at ≤7 bits,
      // the minhash banding logic made lossless), capped buckets,
      // bit_count(xor) verify. DuckDB replays band+verify over the SAME
      // staged parquet, so candidate pruning is hash-gated end to end.
      val staged = stageImageHashes(s, dir)
      Multimodal.imageNearDupPairs(s.read.parquet(staged), maxHamming = 6)
        .orderBy("a", "b")
    }),

    "x_pipeline_multimodal" -> ((s, dir) => {
      // THE MULTIMODAL COMPOSITE — completes the per-pillar composite
      // pattern (curate/rag/semantic/pretrain/web/tokenizer): decode →
      // signature table (staged like the ANN index — the decode chain is
      // pinned by ImageHashSpec, the artifact is the replay root) →
      // hamming-LSH near-dup mining → connected components → keep each
      // cluster's canonical (min-id) copy → shard manifest of exactly
      // what ships. ONE DataFrame program, ONE replay chain: every step
      // past the staged signatures is pure 64-bit integer arithmetic,
      // so the end-to-end pipeline is hash-gated, not step-by-step.
      val staged = stageImageHashes(s, dir)
      val h = s.read.parquet(staged)
      val clusters = Dedup.duplicateClusters(
        Multimodal.imageNearDupPairs(h, maxHamming = 6))
      // kept set = cluster canonicals + every unpaired image (absent
      // from the cluster table by definition) — one broadcast anti-join
      // of the small non-canonical id set against the signature table
      val gone = clusters.filter(!col("keep")).select(col("doc_id").as("id"))
      val kept = h.join(broadcast(gone), Seq("id"), "left_anti")
      // manifest: deterministic md5 shards + order-independent modular
      // checksum over (id|ahash) — the x_export_manifest convention, so
      // a trainer can validate the delivered shards without re-mining
      val P = 1000000007L
      kept
        .withColumn("shard",
          conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10)
            .cast("long") % 8)
        .withColumn("__h", conv(substring(md5(concat(
            col("id").cast("string"), lit("|"), col("ahash").cast("string"))),
          1, 15), 16, 10).cast("long") % P)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_images"),
          (sum(col("__h")) % P).as("checksum"),
          min("id").as("min_id"),
          max("id").as("max_id"))
        .orderBy("shard")
    }),

    "x_eval_image_dedup" -> ((s, dir) => {
      // The image member of the EVAL pillar: banding recall vs exact
      // hamming truth. At ≤7 bits over 8 byte-bands the pigeonhole
      // bound says recall MUST be 100% with uncapped buckets — this
      // entry measures it instead of asserting it (the all-pairs truth
      // is eval-only, bounded to fixture scale like x_eval_dedup's).
      val staged = stageImageHashes(s, dir)
      val h = s.read.parquet(staged)
      val found = Multimodal
        .imageNearDupPairs(h, maxHamming = 6, maxBandSize = None)
        .select("a", "b")
      val truth = h.select(col("id").as("a"), col("ahash").as("ha"))
        .crossJoin(h.select(col("id").as("b"), col("ahash").as("hb")))
        .filter(col("a") < col("b"))
        .filter(expr("bit_count(ha ^ hb) <= 6"))
        .select("a", "b")
      val nTruth = truth.count()
      val nFound = found.count()
      val nHit = truth.join(found, Seq("a", "b")).count()
      import s.implicits._
      Seq((nTruth, nFound, nHit,
        if (nTruth == 0) 100L else nHit * 100L / nTruth))
        .toDF("n_truth", "n_found", "n_hit", "recall_pct")
    }),

    "x_eval_image_dedup_sampled" -> ((s, dir) => {
      // Sampled-truth twin of x_eval_image_dedup (the 100 TB form, like
      // x_eval_dedup_sampled): the exact-hamming truth crossJoin runs
      // over the md5-sampled signature subset only — (n/S)² work — while
      // the found side is the full production band mining filtered to
      // sampled pairs. Same recall arithmetic.
      val staged = stageImageHashes(s, dir)
      val h = s.read.parquet(staged)
      def inSample(c: org.apache.spark.sql.Column) =
        conv(substring(md5(c.cast("string")), 1, 15), 16, 10)
          .cast("long") % evalSampleMod === 0
      val hs = h.filter(inSample(col("id")))
      val found = Multimodal
        .imageNearDupPairs(h, maxHamming = 6, maxBandSize = None)
        .filter(inSample(col("a")) && inSample(col("b")))
        .select("a", "b")
      val truth = hs.select(col("id").as("a"), col("ahash").as("ha"))
        .crossJoin(hs.select(col("id").as("b"), col("ahash").as("hb")))
        .filter(col("a") < col("b"))
        .filter(expr("bit_count(ha ^ hb) <= 6"))
        .select("a", "b")
      val nTruth = truth.count()
      val nFound = found.count()
      val nHit = truth.join(found, Seq("a", "b")).count()
      import s.implicits._
      Seq((nTruth, nFound, nHit,
        if (nTruth == 0) 100L else nHit * 100L / nTruth))
        .toDF("n_truth", "n_found", "n_hit", "recall_pct")
    }),

    "x_stream_imagehash" -> ((s, dir) => { // LIVE stream, oracle-hashed
      // Streaming multimodal dedup: the id-shifted copy half of the
      // signature table ARRIVES as a stream (readStream → stateless
      // 28-band-pair explode → stream-static join vs the cached corpus
      // band index → hamming verify → memory sink). Pure 64-bit integer
      // arithmetic end to end, so the REAL streaming path hash-verifies
      // like x_stream_classify; one row per colliding band pair (the
      // vsCorpusHits convention — consumers dropDuplicates for a flag).
      val staged = stageImageHashes(s, dir)
      val sigs = s.read.parquet(staged)
      val index = graft.streaming.StreamImageDedup.indexBands(
        sigs.filter(col("id") < 100000L)).cache()
      val hits = graft.streaming.StreamImageDedup.runOnce(s, imgHashStageDir,
        "hashes.parquet", sigs.schema, col("id") >= 100000L, index)
      // the stream has terminated (AvailableNow) and the hits are
      // checkpointed off the sink — release the per-invocation index
      index.unpersist(false)
      hits.orderBy("id", "corpus_id", "band")
    }))
}
