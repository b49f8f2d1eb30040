package graft.queries


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.{HostedTables, Tables}
import graft.core.{Chunker, ServiceName, WriteMode}
import graft.operators.{Calibration, Cdc, Curation, Dedup, Embeddings, GraphOps, HtmlText, Multimodal, Profiling, Regression, Scale, Similarity, Sketches, TextAnalysis}
import graft.sinks.HostedStore
import graft.streaming.EventStreams

/** DuckDB oracles for the extension queries, part C.
  *
  * Part of the QueryCatalog split (r12): entries are verbatim from the
  * pre-split catalog; shared fixtures/SQL builders live in
  * [[CatalogHelpers]]; [[QueryCatalog]] assembles the public maps.
  */
private[queries] object ExtensionOraclesC {
  import CatalogHelpers._

  val entries: Map[String, String] = Map(

      "x_eval_clusters" ->
        s"""WITH qv AS (
           |  SELECT vec_id,
           |         [CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS DOUBLE)
           |          for x in embedding] AS q
           |  FROM embeddings),
           |qn AS (SELECT vec_id, q, list_dot_product(q, q) AS nq2 FROM qv),
           |cents AS (SELECT vec_id AS cid, q AS cq, nq2 AS nc2 FROM qn
           |          WHERE nq2 > 0 ORDER BY vec_id LIMIT 16),
           |scored AS (SELECT v.vec_id, c.cid,
           |             list_dot_product(v.q, c.cq) / sqrt(c.nc2) AS score
           |           FROM qn v CROSS JOIN cents c),
           |assigned AS (SELECT vec_id, cid AS cell FROM (
           |  SELECT vec_id, cid,
           |         row_number() OVER (PARTITION BY vec_id
           |                            ORDER BY score DESC, cid) AS rn
           |  FROM scored) WHERE rn = 1),
           |counts AS (SELECT cell, label, count(*) AS n
           |           FROM assigned JOIN embeddings USING (vec_id)
           |           GROUP BY 1, 2),
           |ranked AS (SELECT cell, label, n,
           |             row_number() OVER (PARTITION BY cell
           |                                ORDER BY n DESC, label) AS rn
           |           FROM counts),
           |agg AS (SELECT cell, CAST(sum(n) AS BIGINT) AS n_members,
           |          CAST(count(DISTINCT label) AS BIGINT) AS n_labels
           |        FROM counts GROUP BY cell)
           |SELECT a.cell, a.n_members, CAST(r.n AS BIGINT) AS n_majority,
           |  CAST(r.label AS BIGINT) AS majority_label, a.n_labels
           |FROM agg a JOIN ranked r ON r.cell = a.cell AND r.rn = 1
           |ORDER BY a.cell""".stripMargin,

      "x_curate_lengthclip" ->
        // exact-regime sketch replay: the p05/p95 bounds are the elements
        // at rank max(1, ceil(q·n)) of the per-language sorted lengths
        """WITH b AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
          |r AS (SELECT lang, n_chars,
          |        row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rk
          |      FROM documents),
          |lo AS (SELECT r.lang, CAST(n_chars AS BIGINT) AS lo_chars
          |       FROM r JOIN b USING (lang)
          |       -- CAST AS DOUBLE: the sketch computes ceil(q·n) in IEEE
          |       -- doubles (0.05·100 = 5.000000000000001 → rank 6); a
          |       -- DECIMAL 0.05 would give the exact 5 and pick the
          |       -- wrong boundary element
          |       WHERE rk = greatest(1, CAST(ceil(CAST(0.05 AS DOUBLE) * n) AS BIGINT))),
          |hi AS (SELECT r.lang, CAST(n_chars AS BIGINT) AS hi_chars
          |       FROM r JOIN b USING (lang)
          |       WHERE rk = greatest(1, CAST(ceil(CAST(0.95 AS DOUBLE) * n) AS BIGINT)))
          |SELECT d.lang, max(lo_chars) AS lo_chars, max(hi_chars) AS hi_chars,
          |       CAST(count(*) AS BIGINT) AS n_kept,
          |       CAST(max(b.n) - count(*) AS BIGINT) AS n_dropped
          |FROM documents d
          |JOIN b ON b.lang = d.lang
          |JOIN lo ON lo.lang = d.lang
          |JOIN hi ON hi.lang = d.lang
          |WHERE d.n_chars >= lo_chars AND d.n_chars <= hi_chars
          |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

      "x_ingest_evolution" ->
        s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(sum(CASE WHEN score IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_with_score,
           |  CAST(sum(coalesce(score, 0)) AS BIGINT) AS sum_score
           |FROM read_parquet(['$evoDir/v1.parquet', '$evoDir/v2.parquet'],
           |                  union_by_name=true)
           |GROUP BY lang ORDER BY lang""".stripMargin,

      "x_dedup_canonical" ->
        """SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_copies
          |FROM (SELECT doc_id,
          |        lower(strip_accents(nfc_normalize(text))) AS k
          |      FROM documents)
          |GROUP BY k ORDER BY doc_id""".stripMargin,

      "x_text_normalize" ->
        """SELECT doc_id,
          |  md5(lower(strip_accents(nfc_normalize(text)))) AS canon_md5,
          |  CAST(CASE WHEN lower(strip_accents(nfc_normalize(text))) = text
          |       THEN 0 ELSE 1 END AS BIGINT) AS changed
          |FROM documents ORDER BY doc_id""".stripMargin,

      "x_pipeline_observe" ->
        """SELECT
          |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_in,
          |  (SELECT CAST(sum(length(text)) AS BIGINT) FROM documents) AS chars_in,
          |  CAST(count(*) AS BIGINT) AS n_kept,
          |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens_kept
          |FROM documents WHERE n_chars >= 100""".stripMargin,

      "x_event_funnel" ->
        """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
           |       WHERE event_type = 'view' GROUP BY 1),
           |c AS (SELECT v.user_id, min(e.ts) AS t_click
           |      FROM v JOIN events e ON e.user_id = v.user_id
           |        AND e.event_type = 'click' AND e.ts > v.t_view
           |      GROUP BY 1),
           |p AS (SELECT c.user_id, min(e.ts) AS t_buy
           |      FROM c JOIN events e ON e.user_id = c.user_id
           |        AND e.event_type = 'purchase' AND e.ts > c.t_click
           |      GROUP BY 1)
           |SELECT
           |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events) AS n_users,
           |  (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
           |  (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_view_click,
           |  (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_full_funnel""".stripMargin,

      "x_cohort_retention" ->
        """WITH cohort AS (
           |  SELECT user_id,
           |         epoch_ms(date_trunc('week', min(ts))) AS cohort_ms
           |  FROM events GROUP BY user_id),
           |activity AS (
           |  SELECT DISTINCT user_id,
           |         epoch_ms(date_trunc('week', ts)) AS week_ms
           |  FROM events)
           |SELECT cohort_ms, (week_ms - cohort_ms) // 604800000 AS week_offset,
           |       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
           |FROM cohort c JOIN activity a ON c.user_id = a.user_id
           |GROUP BY 1, 2 ORDER BY cohort_ms, week_offset""".stripMargin,

      "x_ingest_jsonl" ->
        // line-wise re-read of the SAME staged file: json_valid replays
        // the PERMISSIVE quarantine split (extraction only AFTER the
        // validity filter — DuckDB's json_extract errors on malformed
        // input even in dead CASE branches of the same projection)
        s"""WITH raw AS (SELECT column0 AS line
           |  FROM read_csv('$jsonlStagePath', header=false, delim=chr(1),
           |                quote='', columns={'column0': 'VARCHAR'})),
           |good AS (SELECT line FROM raw WHERE json_valid(line))
           |SELECT CAST(json_extract(line, '$$.doc_id') AS BIGINT) AS doc_id,
           |  json_extract_string(line, '$$.lang') AS lang,
           |  json_extract_string(line, '$$.source') AS source,
           |  CAST(json_extract(line, '$$.n_chars') AS BIGINT) AS n_chars
           |FROM good ORDER BY doc_id""".stripMargin,

      "x_ingest_jsonl_report" ->
        s"""WITH raw AS (SELECT column0 AS line
           |  FROM read_csv('$jsonlStagePath', header=false, delim=chr(1),
           |                quote='', columns={'column0': 'VARCHAR'})),
           |g AS (SELECT json_extract_string(line, '$$.lang') AS lang_bucket,
           |        CAST(json_extract(line, '$$.n_chars') AS BIGINT) AS nc,
           |        0 AS corrupt
           |      FROM (SELECT line FROM raw WHERE json_valid(line))),
           |b AS (SELECT '__quarantine' AS lang_bucket, 0 AS nc, 1 AS corrupt
           |      FROM raw WHERE NOT json_valid(line)),
           |u AS (SELECT * FROM g UNION ALL SELECT * FROM b)
           |SELECT lang_bucket, CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(sum(nc) AS BIGINT) AS sum_chars,
           |  CAST(sum(corrupt) AS BIGINT) AS n_corrupt
           |FROM u GROUP BY lang_bucket ORDER BY lang_bucket""".stripMargin,

      "x_ingest_binary" ->
        s"""SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname,
           |  CAST(octet_length(content) AS BIGINT) AS n_bytes,
           |  md5(lower(hex(content))) AS content_md5
           |FROM read_blob('$binIngestDir/*.bmp')
           |ORDER BY fname""".stripMargin,

      "x_ingest_orc" ->
        """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
          |  CAST(sum(length(text)) AS BIGINT) AS sum_text_len
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

      "x_kmv_distinct" ->
        // KMV replay: per-source md5-prefix hashes of the distinct texts;
        // under capacity (16) the estimate is the distinct count itself,
        // at/over capacity it is (15 · 2⁶⁰) // h₁₆ with h₁₆ the 16th
        // smallest hash — HUGEINT intermediate, BIGINT result.
        """WITH d AS (SELECT DISTINCT source, text FROM documents),
          |h AS (SELECT source,
          |        ('0x' || substr(md5(text), 1, 15))::BIGINT AS hv FROM d),
          |r AS (SELECT source, hv,
          |        row_number() OVER (PARTITION BY source ORDER BY hv) AS rk,
          |        count(*) OVER (PARTITION BY source) AS nd FROM h),
          |kth AS (SELECT source, max(nd) AS nd,
          |          max(CASE WHEN rk = 16 THEN hv END) AS hk
          |        FROM r GROUP BY source)
          |SELECT source, CAST(nd AS BIGINT) AS n_distinct,
          |  CAST(CASE WHEN nd < 16 THEN nd
          |       ELSE (15::HUGEINT * 1152921504606846976::HUGEINT)
          |            // greatest(hk, 1) END AS BIGINT) AS n_distinct_est
          |FROM kth ORDER BY source""".stripMargin,

      "x_text_linededup" -> lineDedupReplay,

      "x_stream_linededup" ->
        // the LIVE run converges to the identical table — shared replay
        lineDedupReplay,

      "x_corpus_overlap_kmv" ->
        // full sketch-algebra replay: per-source k-min buffers (rank
        // selection over md5-prefix hashes), pair union buffers = k-min
        // of the two buffers' union, matched = union-buffer rows present
        // in BOTH inputs, estimates in HUGEINT (Spark computes the same
        // floors via the exact-decimal (N - N % h) / h identity)
        """WITH d AS (SELECT DISTINCT source AS g, text
          |           FROM documents WHERE text IS NOT NULL),
          |hd AS (SELECT DISTINCT g,
          |         ('0x' || substr(md5(text), 1, 15))::BIGINT AS h FROM d),
          |buf AS (SELECT g, h FROM (
          |    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rk
          |    FROM hd) WHERE rk <= 16),
          |gs AS (SELECT DISTINCT g AS g2 FROM buf),
          |comb AS (SELECT DISTINCT least(b.g, g2.g2) AS ga,
          |                greatest(b.g, g2.g2) AS gb, b.h
          |         FROM buf b JOIN gs g2 ON g2.g2 <> b.g),
          |ubuf AS (SELECT ga, gb, h FROM (
          |    SELECT ga, gb, h,
          |           row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rk
          |    FROM comb) WHERE rk <= 16),
          |fl AS (SELECT u.ga, u.gb, u.h,
          |         CASE WHEN a.h IS NOT NULL THEN 1 ELSE 0 END AS in_a,
          |         CASE WHEN bb.h IS NOT NULL THEN 1 ELSE 0 END AS in_b
          |       FROM ubuf u
          |       LEFT JOIN buf a ON a.g = u.ga AND a.h = u.h
          |       LEFT JOIN buf bb ON bb.g = u.gb AND bb.h = u.h),
          |pstats AS (SELECT ga, gb, count(*) AS k_union, max(h) AS hk,
          |             sum(in_a * in_b) AS n_matched
          |           FROM fl GROUP BY ga, gb),
          |gstats AS (SELECT g, count(*) AS sz, max(h) AS hk
          |           FROM buf GROUP BY g),
          |gest AS (SELECT g, CAST(CASE WHEN sz < 16 THEN sz
          |           ELSE (15::HUGEINT * 1152921504606846976::HUGEINT)
          |                // greatest(hk, 1) END AS BIGINT) AS est
          |         FROM gstats),
          |pest AS (SELECT ga, gb, n_matched, k_union,
          |           CAST(CASE WHEN k_union < 16 THEN k_union
          |             ELSE (15::HUGEINT * 1152921504606846976::HUGEINT)
          |                  // greatest(hk, 1) END AS BIGINT) AS n_union_est
          |         FROM pstats)
          |SELECT p.ga, p.gb, a.est AS n_a_est, b.est AS n_b_est,
          |  p.n_union_est,
          |  CAST((p.n_matched::HUGEINT * p.n_union_est::HUGEINT)
          |       // p.k_union AS BIGINT) AS n_inter_est,
          |  CAST(p.n_matched AS BIGINT) AS n_matched,
          |  CAST(p.k_union AS BIGINT) AS k_union,
          |  CAST(p.n_matched * 10000 // p.k_union AS BIGINT) AS jaccard_pctx100
          |FROM pest p
          |JOIN gest a ON a.g = p.ga
          |JOIN gest b ON b.g = p.gb
          |ORDER BY p.ga, p.gb""".stripMargin,

      "x_corpus_heaps_kmv" ->
        // Per-prefix KMV replay: distinct qualifying tokens per prefix,
        // md5-prefix 60-bit hashes, k-th-minimum rank selection —
        // (15 · 2⁶⁰) // h₁₆ in the estimator regime, the distinct
        // count itself under capacity. HUGEINT intermediate, BIGINT out.
        """WITH m AS (SELECT max(doc_id) AS mx FROM documents),
          |t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          |      FROM documents),
          |pf AS (SELECT f.pct, t.tok
          |       FROM t CROSS JOIN m
          |       CROSS JOIN (SELECT unnest([20, 40, 60, 80, 100]) AS pct) f
          |       WHERE t.doc_id * 100 <= m.mx * f.pct),
          |d AS (SELECT DISTINCT pct, tok FROM pf),
          |h AS (SELECT pct,
          |        ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv FROM d),
          |r AS (SELECT pct, hv,
          |        row_number() OVER (PARTITION BY pct ORDER BY hv) AS rk,
          |        count(*) OVER (PARTITION BY pct) AS nd FROM h),
          |kth AS (SELECT pct, max(nd) AS nd,
          |          max(CASE WHEN rk = 16 THEN hv END) AS hk
          |        FROM r GROUP BY pct)
          |SELECT pct, CAST(CASE WHEN nd < 16 THEN nd
          |     ELSE (15::HUGEINT * 1152921504606846976::HUGEINT)
          |          // greatest(hk, 1) END AS BIGINT) AS n_distinct_est
          |FROM kth ORDER BY pct""".stripMargin,

      "x_stream_distinct" ->
        // exact-regime replay (capacity > distinct users per window):
        // per-window count(DISTINCT), append-mode cutoff from max(ts)
        """WITH wc AS (
          |  SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
          |         CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_est
          |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
          |mx AS (SELECT epoch_ms(max(ts)) AS mts FROM events)
          |SELECT window_start_ms, n_distinct_est
          |FROM wc CROSS JOIN mx
          |WHERE window_start_ms + 3600000 <= mts
          |ORDER BY window_start_ms""".stripMargin,

      "x_stream_quantiles" ->
        // sorted-rank selection per window (ties share the value, so
        // rank nondeterminism among equals is harmless); append cutoff
        // from max(ts) like every streaming oracle here
        """WITH wv AS (
          |  SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms, value,
          |         row_number() OVER (PARTITION BY date_trunc('hour', ts)
          |                            ORDER BY value) AS rn,
          |         count(*) OVER (PARTITION BY date_trunc('hour', ts)) AS n
          |  FROM events),
          |mx AS (SELECT epoch_ms(max(ts)) AS mts FROM events),
          |agg AS (
          |  SELECT window_start_ms, CAST(max(n) AS BIGINT) AS n_events,
          |    max(CASE WHEN rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT)) THEN value END) AS q50,
          |    max(CASE WHEN rn = greatest(1, CAST(ceil(0.9 * n) AS BIGINT)) THEN value END) AS q90,
          |    max(CASE WHEN rn = greatest(1, CAST(ceil(0.99 * n) AS BIGINT)) THEN value END) AS q99
          |  FROM wv GROUP BY window_start_ms)
          |SELECT a.window_start_ms, a.n_events, a.q50, a.q90, a.q99
          |FROM agg a CROSS JOIN mx
          |WHERE a.window_start_ms + 3600000 <= mx.mts
          |ORDER BY a.window_start_ms""".stripMargin,

      "x_quantile_sketch" ->
        """WITH wv AS (
          |  SELECT l_returnflag, l_extendedprice AS value,
          |         row_number() OVER (PARTITION BY l_returnflag
          |                            ORDER BY l_extendedprice) AS rn,
          |         count(*) OVER (PARTITION BY l_returnflag) AS n
          |  FROM lineitem)
          |SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n_rows,
          |  max(CASE WHEN rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT)) THEN value END) AS q50,
          |  max(CASE WHEN rn = greatest(1, CAST(ceil(0.9 * n) AS BIGINT)) THEN value END) AS q90,
          |  max(CASE WHEN rn = greatest(1, CAST(ceil(0.99 * n) AS BIGINT)) THEN value END) AS q99
          |FROM wv GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

      "x_corpus_datacard" ->
        """SELECT CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts,
          |  CAST(count(*) - count(DISTINCT text) AS BIGINT) AS exact_dup_docs,
          |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
          |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
          |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
          |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
          |  CAST(min(n_chars) AS BIGINT) AS min_chars,
          |  CAST(max(n_chars) AS BIGINT) AS max_chars
          |FROM documents""".stripMargin,

      "x_corpus_heaps" ->
        """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          |           FROM documents),
          |m AS (SELECT max(doc_id) AS mx FROM documents)
          |SELECT
          |  CAST(count(DISTINCT CASE WHEN doc_id * 100 <= mx * 20 THEN tok END) AS BIGINT) AS v20,
          |  CAST(count(DISTINCT CASE WHEN doc_id * 100 <= mx * 40 THEN tok END) AS BIGINT) AS v40,
          |  CAST(count(DISTINCT CASE WHEN doc_id * 100 <= mx * 60 THEN tok END) AS BIGINT) AS v60,
          |  CAST(count(DISTINCT CASE WHEN doc_id * 100 <= mx * 80 THEN tok END) AS BIGINT) AS v80,
          |  CAST(count(DISTINCT tok) AS BIGINT) AS v100
          |FROM t CROSS JOIN m""".stripMargin,

      "x_text_surprisal_exact" ->
        // Bigram-LM replay in pure integers: reference counts c(w1,w2),
        // c(w1), |V|; each doc bigram scores
        // length(bin(2·c1 + V)) − length(bin(2·c12 + 1)) — integer
        // string lengths, no log (the frequency-spectrum trick).
        """WITH refw AS (SELECT string_split(text, ' ') AS w
          |             FROM documents WHERE doc_id % 2 = 0),
          |rb AS (SELECT bg['w1'] AS w1, bg['w2'] AS w2 FROM (
          |  SELECT unnest([{'w1': w[i], 'w2': w[i + 1]}
          |                 for i in range(1, len(w))]) AS bg
          |  FROM refw WHERE len(w) >= 2)),
          |c12 AS (SELECT w1, w2, count(*) AS c12 FROM rb GROUP BY w1, w2),
          |c1 AS (SELECT w1, count(*) AS c1 FROM rb GROUP BY w1),
          |v AS (SELECT count(DISTINCT tok) AS v FROM (
          |  SELECT unnest(string_split(text, ' ')) AS tok
          |  FROM documents WHERE doc_id % 2 = 0)),
          |db AS (SELECT doc_id, bg['w1'] AS w1, bg['w2'] AS w2 FROM (
          |  SELECT doc_id, unnest([{'w1': w[i], 'w2': w[i + 1]}
          |                         for i in range(1, len(w))]) AS bg
          |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
          |  WHERE len(w) >= 2)),
          |sc AS (SELECT d.doc_id,
          |         length(bin(2 * coalesce(u.c1, 0) + (SELECT v FROM v))) -
          |         length(bin(2 * coalesce(b.c12, 0) + 1)) AS sbits
          |       FROM db d
          |       LEFT JOIN c12 b ON b.w1 = d.w1 AND b.w2 = d.w2
          |       LEFT JOIN c1 u ON u.w1 = d.w1)
          |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
          |  CAST(sum(sbits) AS BIGINT) AS sum_surprisal_bits
          |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "x_text_vocab" ->
        """WITH toks AS (
          |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
          |SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df
          |FROM toks GROUP BY tok ORDER BY tf DESC, tok LIMIT 50""".stripMargin,

      "x_text_tfidf" ->
        """WITH sub AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
          |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM sub),
          |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
          |df AS (SELECT tok, count(*) AS df FROM
          |         (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok),
          |ranked AS (SELECT tf.doc_id, tf.tok,
          |             CAST(tf.tf AS BIGINT) AS tf, CAST(df.df AS BIGINT) AS df,
          |             row_number() OVER (PARTITION BY tf.doc_id
          |               ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.tok) AS rk
          |           FROM tf JOIN df USING (tok))
          |SELECT doc_id, tok, tf, df, CAST(rk AS INTEGER) AS rk
          |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

      "x_quality_classifier" ->
        s"""WITH ${nbCtes()}
           |SELECT doc_id, n_tokens, score,
           |  CAST(score > 0 AS INTEGER) AS label
           |FROM nbscore ORDER BY doc_id""".stripMargin,

      "x_quality_calibrate" ->
        // same NB score chain, then the identical bucket → prefix-sum →
        // max-min isotonic fit; every rate is the same correctly-rounded
        // double quotient in both engines, so min/max/floor agree
        s"""WITH ${nbCtes()},
           |lab AS (SELECT s.doc_id, s.score,
           |    CAST(d.source = 'src0' AS BIGINT) AS y
           |  FROM nbscore s JOIN documents d USING (doc_id)),
           |bounds AS (SELECT min(score) AS mn, max(score) AS mx FROM lab),
           |bk AS (SELECT
           |    ((score - (SELECT mn FROM bounds)) * 24)
           |      // ((SELECT mx FROM bounds) - (SELECT mn FROM bounds) + 1)
           |      AS bucket,
           |    score, y FROM lab),
           |cagg AS (SELECT bucket, min(score) AS lo, max(score) AS hi,
           |    count(*) AS n, sum(y) AS pos FROM bk GROUP BY bucket),
           |cidx AS (SELECT *, row_number() OVER (ORDER BY bucket) AS i,
           |    sum(n) OVER (ORDER BY bucket) AS cn,
           |    sum(pos) OVER (ORDER BY bucket) AS cy FROM cagg),
           |civ AS (SELECT j.i AS ji, k.i AS ki,
           |    CAST(k.cy - (j.cy - j.pos) AS DOUBLE)
           |      / CAST(k.cn - (j.cn - j.n) AS DOUBLE) AS rate
           |  FROM cidx j JOIN cidx k ON k.i >= j.i),
           |cmm AS (SELECT b.i, civ.ji, min(civ.rate) AS minr
           |  FROM cidx b JOIN civ ON civ.ji <= b.i AND civ.ki >= b.i
           |  GROUP BY b.i, civ.ji),
           |cft AS (SELECT i, max(minr) AS fit FROM cmm GROUP BY i)
           |SELECT cidx.bucket, cidx.lo, cidx.hi,
           |  CAST(cidx.n AS BIGINT) AS n, CAST(cidx.pos AS BIGINT) AS pos,
           |  CAST(1000 * cidx.pos // cidx.n AS BIGINT) AS rate_permille,
           |  CAST(floor(fit * CAST(1000 AS DOUBLE)) AS BIGINT) AS fitted_permille
           |FROM cidx JOIN cft USING (i) ORDER BY cidx.bucket""".stripMargin,

      "x_quality_calibrate_serve" -> calibrateServeOracle,

      "x_eval_auc" ->
        // same NB chain; U on the ×2 midrank lattice, quotient via the
        // exact-divisible identity (operands non-negative)
        s"""WITH ${nbCtes()},
           |al AS (SELECT s.score,
           |    CAST(d.source = 'src0' AS HUGEINT) AS y
           |  FROM nbscore s JOIN documents d USING (doc_id)),
           |ab AS (SELECT score AS s, sum(y) AS np,
           |    count(*) - sum(y) AS nn FROM al GROUP BY score),
           |ac AS (SELECT s, np, nn,
           |    coalesce(sum(nn) OVER (ORDER BY s
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnb
           |  FROM ab),
           |ag AS (SELECT sum(CAST(np AS HUGEINT) *
           |      (2 * CAST(cnb AS HUGEINT) + CAST(nn AS HUGEINT))) AS u2,
           |    CAST(sum(np) AS HUGEINT) AS pos,
           |    CAST(sum(nn) AS HUGEINT) AS neg FROM ac)
           |SELECT CAST(pos + neg AS BIGINT) AS n, CAST(pos AS BIGINT) AS pos,
           |  CAST(neg AS BIGINT) AS neg, CAST(u2 AS BIGINT) AS u2,
           |  CASE WHEN pos > 0 AND neg > 0 THEN CAST(
           |    (u2 * 1000000 - (u2 * 1000000) % (2 * pos * neg))
           |      // (2 * pos * neg) AS BIGINT) END AS auc_e6
           |FROM ag""".stripMargin,

      "x_eval_calibration" ->
        // the serve chain + truth join; baseline sum algebraic in
        // (n, pos, p0); skill via the sign-safe exact-divisible identity
        s"""WITH m AS (SELECT tok, weight
           |    FROM read_parquet('$calIdxDir/weights/*.parquet')),
           |ct AS (SELECT doc_id,
           |    unnest(string_split(text, ' ')) AS tok FROM documents),
           |sc AS (SELECT t.doc_id,
           |    CAST(sum(coalesce(m.weight, 0)) AS BIGINT) AS score
           |  FROM ct t LEFT JOIN m ON m.tok = t.tok GROUP BY t.doc_id),
           |cal AS (SELECT lo, fitted_permille
           |    FROM read_parquet('$calIdxDir/calib/*.parquet')),
           |j AS (SELECT s.doc_id, s.score, max(c.lo) AS blo
           |  FROM sc s LEFT JOIN cal c ON s.score >= c.lo
           |  GROUP BY s.doc_id, s.score),
           |served AS (SELECT j.doc_id,
           |    coalesce(c2.fitted_permille,
           |      (SELECT fitted_permille FROM cal ORDER BY lo LIMIT 1)) AS p
           |  FROM j LEFT JOIN cal c2 ON c2.lo = j.blo),
           |ey AS (SELECT CAST(s.p AS HUGEINT) AS p,
           |    CAST(d.source = 'src0' AS HUGEINT) AS y
           |  FROM served s JOIN documents d USING (doc_id)),
           |eg AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(y) AS pos,
           |    sum((p - 1000 * y) * (p - 1000 * y)) AS cal_sum FROM ey),
           |e0 AS (SELECT n, pos, 1000 * pos // n AS p0, cal_sum FROM eg),
           |eb AS (SELECT *,
           |    n * p0 * p0 - 2000 * p0 * pos + 1000000 * pos AS base_sum
           |  FROM e0)
           |SELECT CAST(n AS BIGINT) AS n, CAST(pos AS BIGINT) AS pos,
           |  CAST(p0 AS BIGINT) AS base_rate_permille,
           |  CAST(cal_sum AS BIGINT) AS brier_cal_sum,
           |  CAST(base_sum AS BIGINT) AS brier_base_sum,
           |  CASE WHEN base_sum > 0 THEN CAST(
           |    ((base_sum - cal_sum) * 1000
           |      - ((base_sum - cal_sum) * 1000) % base_sum) // base_sum
           |    AS BIGINT) END AS skill_permille
           |FROM eb""".stripMargin,

      "x_stream_calibrate" -> calibrateServeOracle,

      "x_quality_regress" ->
        // same NB chain; sufficient statistics in HUGEINT, Cramer
        // quotients via the exact-divisible identity (N − N % det) //
        // det — truncated-remainder % matches Spark, and // on an
        // exactly-divisible numerator equals truncation for either sign
        s"""WITH ${nbCtes()},
           |rl AS (SELECT s.doc_id, CAST(s.n_tokens AS HUGEINT) AS x,
           |    CAST(s.score AS HUGEINT) AS y, d.source
           |  FROM nbscore s JOIN documents d USING (doc_id)),
           |rs AS (SELECT source, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
           |    sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
           |  FROM rl GROUP BY source),
           |rc AS (SELECT source, n,
           |    n * sxx - sx * sx AS det,
           |    n * sxy - sx * sy AS covn,
           |    n * syy - sy * sy AS vary,
           |    sxx * sy - sx * sxy AS icn
           |  FROM rs)
           |SELECT source, CAST(n AS BIGINT) AS n,
           |  CASE WHEN det > 0 THEN CAST(
           |    (1000000 * covn - (1000000 * covn) % det) // det AS BIGINT)
           |  END AS slope_ppm,
           |  CASE WHEN det > 0 THEN CAST(
           |    (1000000 * icn - (1000000 * icn) % det) // det AS BIGINT)
           |  END AS intercept_ppm,
           |  CASE WHEN det > 0 AND vary > 0 THEN CAST(
           |    (1000 * covn * covn - (1000 * covn * covn) % (det * vary))
           |      // (det * vary) AS BIGINT)
           |  END AS r2_permille
           |FROM rc ORDER BY source""".stripMargin,

      "x_classifier_drift" ->
        // same NB chain; common-denominator gaps in HUGEINT, all
        // operands non-negative so // replays the decimal floor
        s"""WITH ${nbCtes()},
           |dl AS (SELECT s.doc_id, s.score,
           |    CAST(d.source = 'src0' AS BIGINT) AS sa
           |  FROM nbscore s JOIN documents d USING (doc_id)),
           |db AS (SELECT min(score) AS mn, max(score) AS mx,
           |    CAST(sum(sa) AS HUGEINT) AS na,
           |    CAST(count(*) - sum(sa) AS HUGEINT) AS nb FROM dl),
           |dk AS (SELECT ((score - (SELECT mn FROM db)) * 16)
           |    // ((SELECT mx FROM db) - (SELECT mn FROM db) + 1) AS bucket,
           |    sa FROM dl),
           |dg AS (SELECT bucket, sum(sa) AS n_a,
           |    count(*) - sum(sa) AS n_b FROM dk GROUP BY bucket),
           |dc AS (SELECT bucket, n_a, n_b,
           |    abs(CAST(n_a AS HUGEINT) * (SELECT nb FROM db)
           |      - CAST(n_b AS HUGEINT) * (SELECT na FROM db)) AS gap
           |  FROM dg)
           |SELECT bucket, CAST(n_a AS BIGINT) AS n_a,
           |  CAST(n_b AS BIGINT) AS n_b,
           |  CAST(gap * 1000000
           |    // (2 * (SELECT na FROM db) * (SELECT nb FROM db)) AS BIGINT)
           |    AS gap_ppm,
           |  CAST(sum(gap) OVER () * 1000000
           |    // (2 * (SELECT na FROM db) * (SELECT nb FROM db)) AS BIGINT)
           |    AS tv_ppm
           |FROM dc ORDER BY bucket""".stripMargin,

      "x_classifier_persisted" ->
        // scoring replays FROM the persisted weight table — the serve
        // path's only model input is the artifact
        s"""WITH nbtoks AS (SELECT doc_id,
           |         unnest(string_split(text, ' ')) AS tok FROM documents),
           |m AS (SELECT tok, weight
           |      FROM read_parquet('$nbIdxDir/weights/*.parquet'))
           |SELECT t.doc_id, count(*) AS n_tokens,
           |  CAST(sum(coalesce(m.weight, 0)) AS BIGINT) AS score,
           |  CAST(CAST(sum(coalesce(m.weight, 0)) AS BIGINT) > 0 AS INTEGER) AS label
           |FROM nbtoks t LEFT JOIN m ON m.tok = t.tok
           |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

      "x_stream_route" ->
        s"""WITH ${nbCtes()}
           |SELECT doc_id, n_tokens, score,
           |  CASE WHEN score > 0 THEN 'main' ELSE 'quarantine' END AS route
           |FROM nbscore ORDER BY doc_id""".stripMargin,

      "x_text_bm25" ->
        s"""WITH ${bm25Ctes(10)}
           |SELECT qid, id, CAST(rank AS INTEGER) AS rank
           |FROM lex ORDER BY qid, rank""".stripMargin,

      "x_eval_rbo" -> {
        // the identical suffix-weight lattice the operator bakes
        val (suffix, numL, denL) =
          graft.operators.TextAnalysis.rboWeights(10, 9, 10)
        val wlist = suffix.mkString("[", ", ", "]")
        s"""WITH $bm25CorpusCtes,
           |${bm25Chain("bq", "c1", "s1", "fblex", 5)},
           |pft AS (SELECT f.qid, bt.tok
           |  FROM fblex f JOIN btoks bt ON bt.id = f.id),
           |pfc AS (SELECT t.qid, t.tok, count(*) AS c
           |  FROM pft t LEFT JOIN bq qo ON qo.qid = t.qid AND qo.tok = t.tok
           |  WHERE qo.tok IS NULL GROUP BY t.qid, t.tok),
           |pfs AS (SELECT qid, tok FROM (SELECT qid, tok,
           |    row_number() OVER (PARTITION BY qid ORDER BY c DESC, tok) AS rk
           |  FROM pfc) WHERE rk <= 10),
           |pq AS (SELECT qid, tok FROM bq
           |       UNION ALL SELECT qid, tok FROM pfs),
           |${bm25Chain("pq", "c2", "s2", "plex", 10)},
           |${bm25Chain("bq", "c3", "s3", "blex", 10)},
           |wj AS (SELECT a.qid,
           |    ($wlist)[greatest(a.rank, b.rank)] AS w
           |  FROM blex a JOIN plex b ON a.qid = b.qid AND a.id = b.id),
           |ag AS (SELECT qid, count(*) AS n_common, sum(w) AS sw
           |       FROM wj GROUP BY qid)
           |SELECT q.qid,
           |  CAST(coalesce(ag.n_common, 0) AS BIGINT) AS n_common,
           |  CAST(coalesce(ag.sw, 0) * $numL // $denL AS BIGINT) AS rbo_e5
           |FROM (SELECT DISTINCT qid FROM blex) q
           |LEFT JOIN ag ON ag.qid = q.qid ORDER BY q.qid""".stripMargin
      },

      "x_retrieval_prf" ->
        // feedback pass (k=5) shares the corpus CTEs; expansion terms =
        // top-10 new terms by count (alphabetical tie-break), anti-joined
        // against the original query terms; second chain re-ranks
        s"""WITH $bm25CorpusCtes,
           |${bm25Chain("bq", "bcontrib", "bscored", "lex", 5)},
           |pft AS (SELECT f.qid, bt.tok
           |  FROM lex f JOIN btoks bt ON bt.id = f.id),
           |pfc AS (SELECT t.qid, t.tok, count(*) AS c
           |  FROM pft t LEFT JOIN bq qo ON qo.qid = t.qid AND qo.tok = t.tok
           |  WHERE qo.tok IS NULL GROUP BY t.qid, t.tok),
           |pfs AS (SELECT qid, tok FROM (SELECT qid, tok,
           |    row_number() OVER (PARTITION BY qid ORDER BY c DESC, tok) AS rk
           |  FROM pfc) WHERE rk <= 10),
           |pq AS (SELECT qid, tok FROM bq
           |       UNION ALL SELECT qid, tok FROM pfs),
           |${bm25Chain("pq", "pcontrib", "pscored", "plex", 10)}
           |SELECT qid, id, CAST(rank AS INTEGER) AS rank
           |FROM plex ORDER BY qid, rank""".stripMargin,

      "x_hybrid_retrieval" ->
        // RRF = Σ 1/(60+rank): 1.0 must be cast to DOUBLE (a bare 1.0
        // literal is DECIMAL in DuckDB and decimal division rounds
        // differently); the two-term sum order (lex + dense) matches the
        // Spark side exactly
        s"""WITH ${bm25Ctes(20)},
           |dq AS (SELECT vec_id AS qid, embedding AS qv
           |       FROM embeddings WHERE vec_id < 3),
           |dsc AS (SELECT dq.qid, e.vec_id AS id,
           |          list_cosine_similarity(e.embedding, dq.qv) AS cos
           |        FROM embeddings e, dq WHERE e.vec_id <> dq.qid),
           |dense AS (SELECT qid, id, rank FROM
           |          (SELECT qid, id,
           |             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
           |           FROM dsc) WHERE rank <= 20),
           |fused AS (SELECT coalesce(l.qid, d.qid) AS qid,
           |            coalesce(l.id, d.id) AS id,
           |            coalesce(CAST(1.0 AS DOUBLE) / (60 + l.rank), CAST(0.0 AS DOUBLE))
           |              + coalesce(CAST(1.0 AS DOUBLE) / (60 + d.rank), CAST(0.0 AS DOUBLE)) AS score
           |          FROM lex l FULL OUTER JOIN dense d
           |            ON l.qid = d.qid AND l.id = d.id)
           |SELECT qid, id, CAST(rank AS INTEGER) AS rank FROM
           |  (SELECT qid, id,
           |     row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rank
           |   FROM fused)
           |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,

      "x_chunk_tokens" ->
        // chunk count = ⌈max(n−w, 0)/s⌉ + 1; // ≡ Spark div on
        // non-negative ints; list_slice end-inclusive ≡ Spark slice(len)
        """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          |c AS (SELECT doc_id, toks,
          |        unnest(range(0, (greatest(len(toks) - 32, 0) + 23) // 24 + 1)) AS i
          |      FROM d)
          |SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
          |  i * 24 AS start_tok,
          |  CAST(len(list_slice(toks, i * 24 + 1, i * 24 + 32)) AS INTEGER) AS n_tokens,
          |  array_to_string(list_slice(toks, i * 24 + 1, i * 24 + 32), ' ') AS chunk
          |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

      "x_bpe_pairs" ->
        s"""WITH ${bpeCtes(50)}
           |SELECT pair, n FROM bpt ORDER BY n DESC, pair""".stripMargin,

      "x_unigram_seed" ->
        (graft.operators.Unigram.seedOracleSql("documents", "text",
          seedSize = 500, maxPieceLen = 4, maxWords = 5000,
          wordPattern = "[a-z]+") + "\nORDER BY piece"),

      "x_unigram_train_exact" ->
        graft.operators.Unigram.trainExactOracleSql("documents", "text",
          vocabSize = 300, rounds = 1, maxPieceLen = 4, seedSize = 500,
          maxWords = 5000, maxWordLen = 20, wordPattern = "[a-z]+"),

      "x_unigram_persisted" ->
        graft.operators.Unigram.persistedSegmentOracleSql(
          s"$unigramIdxDir/vocab/*.parquet", maxPieceLen = 4),

      "x_unigram_segment_exact" ->
        graft.operators.Unigram.segmentExactOracleSql("documents", "text",
          vocabSize = 300, rounds = 1, maxPieceLen = 4, seedSize = 500,
          maxWords = 5000, maxWordLen = 20, wordPattern = "[a-z]+"),

      "x_bpe_train" ->
        graft.operators.Bpe.oracleSql("documents", "text",
          numMerges = 12, maxWords = 5000, wordPattern = "[a-z]+"),

      "x_wordpiece_train" ->
        graft.operators.Bpe.wordPieceOracleSql("documents", "text",
          numMerges = 12, maxWords = 5000, wordPattern = "[a-z]+"),

      "x_wordpiece_segment" ->
        graft.operators.Bpe.wordPieceSegmentOracleSql("documents", "text",
          numMerges = 12, maxWords = 5000, wordPattern = "[a-z]+"),

      "x_bpe_bytes" ->
        graft.operators.Bpe.bytesOracleSql("documents", "text",
          numMerges = 12, maxWords = 5000),

      "x_bpe_bytes_segment" ->
        graft.operators.Bpe.bytesSegmentOracleSql("documents", "text",
          numMerges = 12, maxWords = 5000),

      "x_bpe_bytes_apply" ->
        graft.operators.Bpe.bytesApplyOracleSql("documents", "text",
          numMerges = 12, maxWords = 5000, suffix = "q7"),

      "x_bpe_bytes_fertility" ->
        graft.operators.Bpe.bytesFertilityOracleSql("documents", "text",
          numMerges = 12, maxWords = 5000),

      "x_bpe_fertility" ->
        graft.operators.Bpe.fertilityOracleSql("documents", "text",
          numMerges = 12, maxWords = 5000, wordPattern = "[a-z]+"),

      "x_bpe_segment" ->
        graft.operators.Bpe.segmentOracleSql("documents", "text",
          numMerges = 12, maxWords = 5000, wordPattern = "[a-z]+"),

      "x_pipeline_tokenizer" ->
        graft.operators.Bpe.tokenCountOracleSql("documents", "text",
          numMerges = 12, maxWords = 5000, wordPattern = "[a-z]+"),

      "x_bpe_apply" ->
        graft.operators.Bpe.applyOracleSql("documents", "text",
          numMerges = 12, maxWords = 5000, wordPattern = "[a-z]+",
          suffix = "qq"),

      "x_bpe_persisted" ->
        graft.operators.Bpe.persistedApplyOracleSql(
          s"$bpeIdxDir/merges/*.parquet", numMerges = 12),

      "x_wordpiece_persisted" ->
        graft.operators.Bpe.persistedApplyOracleSql(
          s"$wordpieceIdxDir/merges/*.parquet", numMerges = 12),

      "x_split_leakfree" ->
        // cluster replay (recursive CTE) + the q_train_test_split hash
        // formula applied to the cluster id
        s"""WITH RECURSIVE ${jaccardPairsSql(Some(jaccardFreqCap))},
           |pairs AS (SELECT a, b FROM jac WHERE jaccard >= 0.6),
           |edges AS (SELECT a AS src, b AS dst FROM pairs
           |          UNION SELECT b, a FROM pairs),
           |reach AS (
           |  SELECT DISTINCT src AS node, src AS label FROM edges
           |  UNION
           |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node),
           |lab AS (SELECT node AS doc_id, min(label) AS cluster_id
           |          FROM reach GROUP BY node),
           |alldocs AS (SELECT d.doc_id,
           |           coalesce(l.cluster_id, d.doc_id) AS cluster_id
           |         FROM documents d LEFT JOIN lab l ON l.doc_id = d.doc_id)
           |SELECT doc_id, cluster_id,
           |  CASE WHEN ((cluster_id % 1000003) * 2654435761) % 1000000007 % 100 < 80
           |       THEN 'train' ELSE 'test' END AS split
           |FROM alldocs ORDER BY doc_id""".stripMargin,

      "x_distinct_ngrams" ->
        // range(1, k+1) is empty for k <= 0 — short docs contribute
        // nothing, mirroring the Spark CASE guard
        """WITH d AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
          |e AS (SELECT source,
          |        array_to_string(list_slice(toks, i, i + 2), ' ') AS ngram
          |      FROM d, unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS t(i)),
          |pg AS (SELECT source, ngram, count(*) AS c FROM e GROUP BY 1, 2)
          |SELECT source, CAST(sum(c) AS BIGINT) AS total_ngrams,
          |       count(*) AS distinct_ngrams,
          |       CAST((1000 * count(*)) // sum(c) AS BIGINT) AS permille_distinct
          |FROM pg GROUP BY source ORDER BY source""".stripMargin,

      "x_token_spectrum" ->
        // length(bin(c)) - 1 = ⌊log2 c⌋ as pure integer string length in
        // both engines (no float log at exact powers of two)
        """WITH tc AS (SELECT tok, count(*) AS c FROM (
          |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
          |  GROUP BY tok)
          |SELECT CAST(length(bin(c)) - 1 AS INTEGER) AS log2_freq,
          |       count(*) AS n_tokens, CAST(sum(c) AS BIGINT) AS n_occurrences
          |FROM tc GROUP BY 1 ORDER BY 1""".stripMargin,

      "x_pack_corpus" ->
        // running-sum window replay of the distributed two-pass cumsum;
        // integer floor division on both sides
        """WITH p AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx,
          |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          |           FROM documents),
          |c AS (SELECT doc_id, n_tokens,
          |        CAST(coalesce(sum(n_tokens) OVER (ORDER BY hx, doc_id
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |          AS BIGINT) AS cum_before FROM p)
          |SELECT doc_id, n_tokens, cum_before,
          |       CAST(cum_before // 512 AS BIGINT) AS seq_first,
          |       CAST(greatest(cum_before + n_tokens - 1, cum_before) // 512
          |         AS BIGINT) AS seq_last
          |FROM c ORDER BY doc_id""".stripMargin,

      "x_pipeline_pretrain" ->
        // gate (integer NB margin) → DSIR fold (sorted double sum) →
        // hard-first exact quartile → md5 shards: each stage reuses its
        // proven single-query replay verbatim
        s"""WITH ${nbCtes()},
           |surv AS (SELECT d.doc_id, d.text FROM documents d
           |         JOIN nbscore q ON q.doc_id = d.doc_id WHERE q.score > 0),
           |ptoks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           |          FROM surv),
           |pscnt AS (SELECT tok, count(*) AS cs FROM ptoks GROUP BY tok),
           |ptcnt AS (SELECT tok, count(*) AS ct FROM (
           |            SELECT unnest(string_split(text, ' ')) AS tok
           |            FROM documents WHERE source = 'src0') GROUP BY tok),
           |pratio AS (SELECT s.tok,
           |             CAST(coalesce(t.ct, 0) + 1 AS DOUBLE) /
           |               CAST(s.cs + 1 AS DOUBLE) AS r
           |           FROM pscnt s LEFT JOIN ptcnt t ON t.tok = s.tok),
           |pdsir AS (SELECT k.doc_id,
           |            list_reduce(list(k.r ORDER BY k.tok), (a, b) -> a + b) AS ds
           |          FROM (SELECT ptoks.doc_id, ptoks.tok, pratio.r
           |                FROM ptoks JOIN pratio ON pratio.tok = ptoks.tok) k
           |          GROUP BY k.doc_id),
           |prank AS (SELECT doc_id, ds,
           |            row_number() OVER (ORDER BY ds DESC, doc_id ASC) - 1 AS rank,
           |            count(*) OVER () AS n FROM pdsir),
           |psel AS (SELECT doc_id, rank FROM prank WHERE (rank * 4) // n = 0),
           |psh AS (SELECT doc_id, rank, md5(CAST(doc_id AS VARCHAR)) AS hx
           |        FROM psel),
           |pshard AS (SELECT doc_id, rank, hx,
           |             ('0x' || substr(hx, 1, 15))::BIGINT % 4 AS shard FROM psh)
           |SELECT doc_id, rank, shard,
           |  CAST(row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id) - 1
           |    AS BIGINT) AS pos
           |FROM pshard ORDER BY doc_id""".stripMargin,

      "x_curriculum" ->
        // exact ntile: ⌊rank·nb/n⌋ on the 0-based global rank — integer
        // floor division in both engines
        """WITH r AS (SELECT doc_id, n_chars,
          |  row_number() OVER (ORDER BY n_chars ASC, doc_id ASC) - 1 AS rank,
          |  count(*) OVER () AS n FROM documents)
          |SELECT doc_id, n_chars, rank,
          |       CAST((rank * 10) // n AS INTEGER) AS bucket
          |FROM r ORDER BY doc_id""".stripMargin,

      "x_dsir_weights" -> dsirSql,

      // the stream folds the SAME ratio table in the SAME sorted order —
      // scores are bit-identical to the batch operator, one shared replay
      "x_stream_dsir" -> dsirSql,

      "x_stream_classify" ->
        // the streaming path is a stateless fold over the same model —
        // identical scores to the batch classifier, same replay
        s"""WITH ${nbCtes()}
           |SELECT doc_id, n_tokens, score,
           |  CAST(score > 0 AS INTEGER) AS label
           |FROM nbscore ORDER BY doc_id""".stripMargin,

      "x_corpus_drift" ->
        // χ² = N·d²/((N_A·N_B)·(a+b)·(N−a−b)), d = a·N_B − b·N_A exact in
        // BIGINT; every double op is correctly rounded in the SAME
        // parenthesization as the Spark expression → bit-identical chi2
        """WITH ta AS (SELECT unnest(string_split(text, ' ')) AS tok
          |            FROM documents WHERE source = 'src0'),
          |tb AS (SELECT unnest(string_split(text, ' ')) AS tok
          |       FROM documents WHERE source = 'src1'),
          |ca AS (SELECT tok, count(*) AS c FROM ta GROUP BY tok),
          |cb AS (SELECT tok, count(*) AS c FROM tb GROUP BY tok),
          |tot AS (SELECT (SELECT count(*) FROM ta) AS na,
          |               (SELECT count(*) FROM tb) AS nb),
          |j AS (SELECT coalesce(ca.tok, cb.tok) AS tok,
          |        coalesce(ca.c, 0) AS a, coalesce(cb.c, 0) AS b
          |      FROM ca FULL OUTER JOIN cb ON ca.tok = cb.tok),
          |x AS (SELECT tok, a AS c_a, b AS c_b,
          |        (CAST(na + nb AS DOUBLE)
          |          * (CAST(a * nb - b * na AS DOUBLE) * CAST(a * nb - b * na AS DOUBLE)))
          |        / (((CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) * CAST(a + b AS DOUBLE))
          |           * CAST(na + nb - a - b AS DOUBLE)) AS chi2
          |      FROM j, tot WHERE a + b < na + nb)
          |SELECT tok, c_a, c_b, chi2 FROM x
          |ORDER BY chi2 DESC, tok LIMIT 50""".stripMargin,

      "x_emb_norm_outliers" ->
        // rank-based cutoffs (no percentile interpolation semantics):
        // k = ⌈n·0.02⌉; ties at a cutoff flag identically in any engine;
        // CASE tests low first, mirroring the Spark `when` order
        """WITH norms AS (SELECT vec_id,
          |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
          |                          CAST(embedding AS DOUBLE[]))) AS norm
          |  FROM embeddings WHERE embedding IS NOT NULL),
          |k AS (SELECT CAST(ceil(count(*) * 0.02) AS BIGINT) AS k FROM norms),
          |low AS (SELECT max(norm) AS low_cut FROM
          |        (SELECT norm, row_number() OVER (ORDER BY norm ASC, vec_id ASC) AS r
          |         FROM norms) WHERE r <= (SELECT k FROM k)),
          |high AS (SELECT min(norm) AS high_cut FROM
          |         (SELECT norm, row_number() OVER (ORDER BY norm DESC, vec_id DESC) AS r
          |          FROM norms) WHERE r <= (SELECT k FROM k))
          |SELECT vec_id, norm,
          |  CASE WHEN norm <= low_cut THEN 'low' ELSE 'high' END AS side
          |FROM norms, low, high
          |WHERE norm <= low_cut OR norm >= high_cut
          |ORDER BY vec_id""".stripMargin,

      "x_pipeline_rag" ->
        // classifier → chunker → greedy subword tokenizer, one CTE chain;
        // seg/done run over ALL document words (chunk words are a subset
        // of document words, so the segmentation table is shared)
        s"""WITH RECURSIVE ${nbCtes()},
           |${bpeCtes(50)},
           |kept AS (SELECT d.doc_id, d.text FROM documents d
           |         JOIN nbscore s USING (doc_id) WHERE s.score > 0),
           |kd AS (SELECT doc_id, string_split(text, ' ') AS toks FROM kept),
           |ch AS (SELECT doc_id, toks,
           |         unnest(range(0, (greatest(len(toks) - 32, 0) + 23) // 24 + 1)) AS i
           |       FROM kd),
           |chunks AS (SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
           |    i * 24 AS start_tok,
           |    CAST(len(list_slice(toks, i * 24 + 1, i * 24 + 32)) AS INTEGER) AS n_tokens,
           |    list_slice(toks, i * 24 + 1, i * 24 + 32) AS cw
           |  FROM ch),
           |words0 AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
           |dw AS (SELECT DISTINCT w FROM words0),
           |seg AS (
           |  SELECT w, 1 AS pos, 0 AS k FROM dw
           |  UNION ALL
           |  SELECT s.w, s.pos + (CASE WHEN v.pair IS NULL THEN 1 ELSE 2 END),
           |         s.k + 1
           |  FROM seg s LEFT JOIN bpt v ON v.pair = substring(s.w, s.pos, 2)
           |  WHERE s.pos <= length(s.w)),
           |done AS (SELECT w, k FROM seg WHERE pos = length(w) + 1),
           |cwords AS (SELECT doc_id, chunk_id, start_tok, n_tokens,
           |             unnest(cw) AS w FROM chunks)
           |SELECT c.doc_id, c.chunk_id, c.start_tok, c.n_tokens,
           |  CAST(sum(d.k) AS BIGINT) AS n_subwords
           |FROM cwords c JOIN done d USING (w)
           |GROUP BY 1, 2, 3, 4 ORDER BY doc_id, chunk_id""".stripMargin,

      "x_subword_tokenize" ->
        // greedy longest-match segmentation replayed as a recursive CTE
        // over (word, position) states: a matched vocab pair advances 2,
        // otherwise 1 (the single-char fallback); k counts emitted
        // subwords. Runs over DISTINCT words, then joins back per doc.
        subwordTokenizeOracle,

      "x_stream_tokenize" -> subwordTokenizeOracle,

      "x_tokenizer_domains" ->
        // same segmentation CTEs, rolled up by source with the
        // integer-permille fertility
        s"""WITH RECURSIVE $subwordSegCtes
           |SELECT d.source,
           |  CAST(count(DISTINCT w0.doc_id) AS BIGINT) AS n_docs,
           |  CAST(count(*) AS BIGINT) AS n_words,
           |  CAST(sum(dn.k) AS BIGINT) AS n_subwords,
           |  CAST(sum(dn.k) * 1000 // count(*) AS BIGINT) AS fertility_permille
           |FROM words0 w0 JOIN done dn USING (w)
           |JOIN documents d ON d.doc_id = w0.doc_id
           |GROUP BY d.source ORDER BY d.source""".stripMargin,

      "x_text_stats" ->
        """SELECT doc_id, length(text) AS len_chars,
          |  len(string_split(text, ' ')) AS n_tokens,
          |  length(replace(text, ' ', '')) AS n_nonspace
          |FROM documents ORDER BY doc_id""".stripMargin,

      "x_text_quality" ->
        s"""SELECT doc_id,
           |  len(string_split(text, ' ')) AS n_tokens,
           |  CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS mean_tok_len,
           |  length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
           |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
           |  CAST($stopSql AS DOUBLE) / len(string_split(text, ' ')) AS stopword_ratio
           |FROM documents ORDER BY doc_id""".stripMargin,

      "x_text_langconf" ->
        s"""WITH scored AS (SELECT doc_id,
           |  $langScores
           |FROM documents),
           |srt AS (SELECT doc_id,
           |  list_reverse_sort([score_de, score_en, score_es, score_fr]) AS ss
           |FROM scored)
           |SELECT s.doc_id,
           |  CASE WHEN score_fr > greatest(score_de, score_en, score_es) THEN 'fr'
           |       WHEN score_es > greatest(score_de, score_en) THEN 'es'
           |       WHEN score_en > score_de THEN 'en'
           |       ELSE 'de' END AS lang_pred,
           |  CAST(greatest(score_de, score_en, score_es, score_fr) AS BIGINT) AS lang_score,
           |  CAST(ss[1] - ss[2] AS BIGINT) AS margin,
           |  ss[1] - ss[2] <= 1 AS mixed
           |FROM scored s JOIN srt USING (doc_id) ORDER BY s.doc_id""".stripMargin,

      "x_text_langid" ->
        s"""WITH scored AS (SELECT doc_id,
           |  $langScores
           |FROM documents)
           |SELECT doc_id,
           |  CASE WHEN score_fr > greatest(score_de, score_en, score_es) THEN 'fr'
           |       WHEN score_es > greatest(score_de, score_en) THEN 'es'
           |       WHEN score_en > score_de THEN 'en'
           |       ELSE 'de' END AS lang_pred,
           |  CAST(greatest(score_de, score_en, score_es, score_fr) AS BIGINT) AS lang_score
           |FROM scored ORDER BY doc_id""".stripMargin,

      "x_text_fingerprint" ->
        """SELECT doc_id,
          |  md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fingerprint
          |FROM documents ORDER BY doc_id""".stripMargin,

      "x_text_rollhash" ->
        // empty-text guard: DuckDB ord('') is -1 where Spark ascii('') is 0
        """SELECT doc_id,
          |  CASE WHEN length(text) = 0 THEN 0 ELSE
          |    list_reduce(list_prepend(CAST(0 AS BIGINT),
          |      [CAST(ord(c) AS BIGINT) for c in string_split_regex(text, '')]),
          |      (acc, x) -> (acc * 31 + x) % 1000000007)
          |  END AS roll_hash
          |FROM documents ORDER BY doc_id""".stripMargin,

      "x_text_repetition" ->
        """WITH toks AS (
          |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
          |pt AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
          |ta AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
          |         count(*) AS n_distinct, max(c) AS top_c
          |       FROM pt GROUP BY 1),
          |bi AS (SELECT doc_id,
          |         unnest([array_to_string(w[i:i+1], ' ')
          |                 for i in range(1, len(w))]) AS sh
          |       FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
          |pb AS (SELECT doc_id, sh, count(*) AS c FROM bi GROUP BY 1, 2),
          |ba AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bi,
          |         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_bi_rep
          |       FROM pb GROUP BY 1)
          |SELECT t.doc_id,
          |  CAST(1.0 AS DOUBLE) - t.n_distinct / t.n_tokens AS dup_token_ratio,
          |  t.top_c / t.n_tokens AS top_token_ratio,
          |  COALESCE(b.n_bi_rep / b.n_bi, CAST(0.0 AS DOUBLE)) AS dup_bigram_ratio
          |FROM ta t LEFT JOIN ba b USING (doc_id)
          |ORDER BY t.doc_id""".stripMargin,

      "x_text_tokens" -> {
        val pat = graft.operators.TextAnalysis.bpeIshPattern.replace("'", "''")
        s"""SELECT doc_id,
           |  len(string_split(text, ' ')) AS n_ws_tokens,
           |  len(regexp_extract_all(text, '$pat')) AS n_bpe_tokens,
           |  len(regexp_extract_all(text, '$pat')) / len(string_split(text, ' ')) AS bpe_per_ws
           |FROM documents ORDER BY doc_id""".stripMargin
      },

      "x_emb_pca" -> pcaOracle,

      "x_emb_kcenter" -> kcenterOracle,

      "x_emb_pool" ->
        """SELECT label, i - 1 AS pos, count(*) AS n_vecs,
          |  CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS sum_e6
          |FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "x_corpus_stats" ->
        """SELECT source, count(*) AS n_docs,
          |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
          |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
          |  min(length(text)) AS min_chars, max(length(text)) AS max_chars
          |FROM documents GROUP BY source ORDER BY source""".stripMargin,

      "x_stratified_sample" ->
        """WITH ranked AS (
          |  SELECT doc_id, lang, n_chars,
          |    row_number() OVER (PARTITION BY lang
          |      ORDER BY ((doc_id % 1000003) * 2654435761) % 1000000007, doc_id) AS rn
          |  FROM documents)
          |SELECT doc_id, lang, n_chars FROM ranked WHERE rn <= 10
          |ORDER BY lang, doc_id""".stripMargin,

      "x_pack_sequences" ->
        """WITH toks AS (
          |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
          |  FROM documents),
          |runs AS (
          |  SELECT doc_id, source, n_tokens,
          |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
          |                        ROWS UNBOUNDED PRECEDING) AS running
          |  FROM toks)
          |SELECT doc_id, source, n_tokens,
          |  CAST(floor((running - n_tokens) / 512) AS BIGINT) AS bin
          |FROM runs ORDER BY source, doc_id""".stripMargin,

      "x_multimodal_meta" ->
        """SELECT doc_id, 'text/plain;fake=image' AS media_type,
          |  octet_length(encode(text)) AS byte_len, sha256(text) AS sha256
          |FROM documents ORDER BY doc_id""".stripMargin)
}
