package graft.queries


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.{HostedTables, Tables}
import graft.core.{Chunker, ServiceName, WriteMode}
import graft.operators.{Calibration, Cdc, Curation, Dedup, Embeddings, GraphOps, HtmlText, Multimodal, Profiling, Regression, Scale, Similarity, Sketches, TextAnalysis}
import graft.sinks.HostedStore
import graft.streaming.EventStreams

/** DuckDB oracles for the extension queries, part B.
  *
  * Part of the QueryCatalog split (r12): entries are verbatim from the
  * pre-split catalog; shared fixtures/SQL builders live in
  * [[CatalogHelpers]]; [[QueryCatalog]] assembles the public maps.
  */
private[queries] object ExtensionOraclesB {
  import CatalogHelpers._

  /** DuckDB replay of [[graft.operators.Multimodal.pairBandRows]] —
    * the C(8,2)=28 byte-band-PAIR hamming-LSH bucketing (band = i·8+j,
    * bv = bv_i·256+bv_j, pigeonhole-exact recall at hamming ≤ 6).
    * Expects an `h(id, ahash)` CTE upstream; yields `bands`/`ok`/`cap`.
    * `cap = None` replays the uncapped (recall-eval) form.
    */
  private def pairBandCtes(cap: Option[Int] = Some(1000)): String = {
    val capSql = cap.map(c => s" AND count(*) <= $c").getOrElse("")
    s"""bands AS (SELECT id, ahash, p.band,
       |            ((ahash >> (p.i * 8)) & 255) * 256 +
       |            ((ahash >> (p.j * 8)) & 255) AS bv
       |          FROM h CROSS JOIN (
       |            SELECT a.i AS i, b.j AS j, a.i * 8 + b.j AS band
       |            FROM (SELECT unnest(range(0, 8)) AS i) a,
       |                 (SELECT unnest(range(0, 8)) AS j) b
       |            WHERE a.i < b.j) p),
       |ok AS (SELECT band, bv FROM bands GROUP BY band, bv
       |       HAVING count(*) >= 2$capSql),
       |cap AS (SELECT b.* FROM bands b JOIN ok USING (band, bv))""".stripMargin
  }

  val entries: Map[String, String] = Map(

      "x_layout_prunestats" ->
        // the same census from the staged artifact alone: hive bucket
        // as the unit label (CAST on both sides — Spark infers the
        // partition column INT, DuckDB may type it VARCHAR), min/max
        // zone maps, disjointness flags
        s"""WITH r AS (SELECT o_custkey, o_orderkey, CAST(zb AS BIGINT) AS file
           |  FROM read_parquet('$pruneStatsDir/*/*.parquet',
           |                    hive_partitioning = true))
           |SELECT file, CAST(count(*) AS BIGINT) AS n_rows,
           |  min(o_custkey) AS min_o_custkey,
           |  max(o_custkey) AS max_o_custkey,
           |  min(o_orderkey) AS min_o_orderkey,
           |  max(o_orderkey) AS max_o_orderkey,
           |  CAST(CASE WHEN max(o_custkey) < 100 OR min(o_custkey) > 199
           |       THEN 1 ELSE 0 END AS INTEGER) AS prune_o_custkey,
           |  CAST(CASE WHEN max(o_orderkey) < 10000 OR min(o_orderkey) > 19999
           |       THEN 1 ELSE 0 END AS INTEGER) AS prune_o_orderkey
           |FROM r GROUP BY file ORDER BY file""".stripMargin,

      "x_layout_zorder" -> {
        val zTerms = (0 until 10).map(i =>
          s"((((o_custkey % 1024) >> $i) & 1) << ${2 * i}) | " +
          s"((((o_orderkey % 1024) >> $i) & 1) << ${2 * i + 1})")
          .mkString(" | ")
        s"""SELECT o_orderkey, o_custkey, CAST($zTerms AS BIGINT) AS z
           |FROM orders ORDER BY o_orderkey""".stripMargin
      },

      "x_token_budget" ->
        """WITH toks AS (SELECT doc_id,
          |         len(string_split(text, ' ')) AS n_tokens,
          |         md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents),
          |c AS (SELECT doc_id, n_tokens,
          |        coalesce(sum(n_tokens) OVER (ORDER BY hx, doc_id
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
          |      FROM toks)
          |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
          |       CAST(cum_before AS BIGINT) AS cum_before
          |FROM c WHERE cum_before < 5000 ORDER BY doc_id""".stripMargin,

      "x_shards_rendezvous" ->
        // per-(key, shard) md5 60-bit scores, argmax via the ranked
        // window (h DESC, s DESC ties — matching array_max's
        // lexicographic struct order where the larger s wins equal h)
        """WITH g8 AS (SELECT unnest(range(8)) AS s),
          |g9 AS (SELECT unnest(range(9)) AS s),
          |h8 AS (SELECT d.doc_id, g8.s,
          |         ('0x' || substr(md5(d.doc_id::VARCHAR || ':' || g8.s::VARCHAR),
          |                         1, 15))::BIGINT AS h
          |       FROM documents d CROSS JOIN g8),
          |h9 AS (SELECT d.doc_id, g9.s,
          |         ('0x' || substr(md5(d.doc_id::VARCHAR || ':' || g9.s::VARCHAR),
          |                         1, 15))::BIGINT AS h
          |       FROM documents d CROSS JOIN g9),
          |s8 AS (SELECT doc_id, CAST(s AS INTEGER) AS shard_n8 FROM (
          |    SELECT doc_id, s,
          |           row_number() OVER (PARTITION BY doc_id
          |             ORDER BY h DESC, s DESC) AS rk
          |    FROM h8) WHERE rk = 1),
          |s9 AS (SELECT doc_id, CAST(s AS INTEGER) AS shard_n9 FROM (
          |    SELECT doc_id, s,
          |           row_number() OVER (PARTITION BY doc_id
          |             ORDER BY h DESC, s DESC) AS rk
          |    FROM h9) WHERE rk = 1)
          |SELECT s8.doc_id, s8.shard_n8, s9.shard_n9,
          |  CAST(CASE WHEN s8.shard_n8 <> s9.shard_n9 THEN 1 ELSE 0 END
          |       AS INTEGER) AS moved
          |FROM s8 JOIN s9 ON s9.doc_id = s8.doc_id
          |ORDER BY s8.doc_id""".stripMargin,

      "x_shuffle_shards" ->
        """WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents),
          |s AS (SELECT doc_id, hx,
          |        ('0x' || substr(hx, 1, 15))::BIGINT % 8 AS shard FROM h)
          |SELECT doc_id, shard,
          |  CAST(row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id) - 1 AS BIGINT) AS pos
          |FROM s ORDER BY doc_id""".stripMargin,

      "x_dedup_minhash_pairs" ->
        s"""WITH ${jaccardPairsSql(None)},
           |$lshBaseSql,
           |sig AS (SELECT doc_id, $lshSigSql FROM shh GROUP BY doc_id),
           |bands_all AS (
           |  $lshBandsSql),
           |bucket_ok AS (SELECT band, key FROM bands_all
           |              GROUP BY band, key HAVING count(*) <= $lshBucketCap),
           |bands AS (SELECT ba.doc_id, ba.band, ba.key
           |            FROM bands_all ba JOIN bucket_ok USING (band, key)),
           |cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
           |           FROM bands l JOIN bands r
           |             ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id)
           |SELECT c.a, c.b, j.jaccard
           |FROM cand c JOIN jac j ON j.a = c.a AND j.b = c.b
           |WHERE j.jaccard >= 0.7 ORDER BY c.a, c.b""".stripMargin,

      "x_eval_dedup" ->
        s"""WITH ${jaccardPairsSql(None)},
           |$lshBaseSql,
           |sig AS (SELECT doc_id, $lshSigSql FROM shh GROUP BY doc_id),
           |bands_all AS (
           |  $lshBandsSql),
           |bucket_ok AS (SELECT band, key FROM bands_all
           |              GROUP BY band, key HAVING count(*) <= $lshBucketCap),
           |bands AS (SELECT ba.doc_id, ba.band, ba.key
           |            FROM bands_all ba JOIN bucket_ok USING (band, key)),
           |cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
           |           FROM bands l JOIN bands r
           |             ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id),
           |truth AS (SELECT a, b FROM jac WHERE jaccard >= 0.7)
           |SELECT
           |  CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
           |  CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
           |  CAST((SELECT count(*) FROM cand c JOIN truth t
           |        ON t.a = c.a AND t.b = c.b) AS BIGINT) AS tp,
           |  CAST((SELECT count(*) FROM truth t LEFT JOIN cand c
           |        ON t.a = c.a AND t.b = c.b WHERE c.a IS NULL) AS BIGINT) AS fn""".stripMargin,

      "x_eval_dedup_sampled" ->
        // truth over the md5-sampled subset only (sjac); candidates =
        // the FULL production banding filtered to sampled pairs — the
        // sampled estimator of x_eval_dedup's exact measurement
        s"""WITH ${jaccardPairsSampledSql(evalSampleMod)},
           |$shinglesSql,
           |$lshBaseSql,
           |sig AS (SELECT doc_id, $lshSigSql FROM shh GROUP BY doc_id),
           |bands_all AS (
           |  $lshBandsSql),
           |bucket_ok AS (SELECT band, key FROM bands_all
           |              GROUP BY band, key HAVING count(*) <= $lshBucketCap),
           |bands AS (SELECT ba.doc_id, ba.band, ba.key
           |            FROM bands_all ba JOIN bucket_ok USING (band, key)),
           |cand0 AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
           |           FROM bands l JOIN bands r
           |             ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id),
           |cand AS (SELECT a, b FROM cand0
           |  WHERE ('0x' || substr(md5(CAST(a AS VARCHAR)), 1, 15))::BIGINT % $evalSampleMod = 0
           |    AND ('0x' || substr(md5(CAST(b AS VARCHAR)), 1, 15))::BIGINT % $evalSampleMod = 0),
           |truth AS (SELECT a, b FROM sjac WHERE jaccard >= 0.7)
           |SELECT
           |  CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
           |  CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
           |  CAST((SELECT count(*) FROM cand c JOIN truth t
           |        ON t.a = c.a AND t.b = c.b) AS BIGINT) AS tp,
           |  CAST((SELECT count(*) FROM truth t LEFT JOIN cand c
           |        ON t.a = c.a AND t.b = c.b WHERE c.a IS NULL) AS BIGINT) AS fn""".stripMargin,

      "x_dedup_simhash" ->
        s"""WITH toks AS (
           |  SELECT doc_id, md5(tok) AS h
           |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
           |votes AS (SELECT doc_id,
           |  ${(0 until 16).map(i =>
              s"sum(CASE WHEN substring(h, ${i + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS v$i")
              .mkString(",\n  ")}
           |  FROM toks GROUP BY doc_id)
           |SELECT doc_id,
           |  ${(0 until 16).map(i =>
              s"CASE WHEN v$i >= 0 THEN '1' ELSE '0' END").mkString(" || ")} AS simhash
           |FROM votes ORDER BY doc_id""".stripMargin,

      "x_entity_resolution" ->
        """WITH cust AS (SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name
          |              FROM customer),
          |vars AS (SELECT id + 1000000 AS id,
          |           substring(name, 1, 9) || 'X' || substring(name, 11) AS name
          |         FROM cust WHERE id % 10 = 0),
          |allr AS (SELECT * FROM cust UNION ALL SELECT * FROM vars),
          |k AS (SELECT id,
          |        regexp_replace(lower(name), '[^a-z0-9]', '', 'g') AS norm
          |      FROM allr),
          |kb AS (SELECT id, norm, right(norm, 5) AS blk FROM k),
          |sz AS (SELECT blk FROM kb GROUP BY blk HAVING count(*) <= 100),
          |c AS (SELECT kb.* FROM kb JOIN sz USING (blk))
          |SELECT l.id AS a, r.id AS b,
          |  CAST(levenshtein(l.norm, r.norm) AS BIGINT) AS dist
          |FROM c l JOIN c r ON l.blk = r.blk AND l.id < r.id
          |WHERE levenshtein(l.norm, r.norm) <= 2
          |ORDER BY a, b""".stripMargin,

      "x_entity_resolution_dropped" ->
        """WITH cust AS (SELECT CAST(c_custkey AS BIGINT) AS id,
          |         CASE WHEN c_custkey % 3 = 0
          |              THEN 'Customer#' || CAST(c_custkey AS VARCHAR) || ' MegaCorp'
          |              ELSE c_name END AS name
          |       FROM customer),
          |k AS (SELECT id,
          |        regexp_replace(lower(name), '[^a-z0-9]', '', 'g') AS norm
          |      FROM cust),
          |kb AS (SELECT right(norm, 5) AS blk FROM k)
          |SELECT blk, CAST(count(*) AS BIGINT) AS block_size
          |FROM kb GROUP BY blk HAVING count(*) > 100
          |ORDER BY blk""".stripMargin,

      "x_sim_ann_lsh" ->
        // Full LSH-ANN replay: quantized-hyperplane bucket assignment
        // (12 tables × 4 planes — exact integer dot signs, same literals
        // the operator plans with), shared-bucket candidates, exact
        // cosine re-rank. Same signature trust as x_dedup_embedding_pairs.
        (lshAnnOracleChain + "\n" +
          "SELECT qid, id, rank FROM r WHERE rank <= 10 ORDER BY qid, rank"),

      "x_retrieval_maxsim" ->
        // maxsim replay: same 4×16 token split on the fixed-point
        // lattice, 16 slice dot products per pair, greatest() per query
        // token, summed — exact integers, so ranks replay bit-for-bit
        maxsimReplaySql,

      "x_stream_maxsim" ->
        // the LIVE foreachBatch serving path shares the batch replay:
        // per-query maxsim ranks are batch-invariant
        maxsimReplaySql,

      "x_retrieval_maxsim_pruned" ->
        // two-stage replay: pooled token-SUM dot shortlist (integer-
        // exact 16-dim sums), then the same 16-slice maxsim arithmetic
        // over shortlist pairs only
        s"""WITH qv AS (SELECT vec_id,
           |         [CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS DOUBLE)
           |          for x in embedding] AS t
           |       FROM embeddings),
           |p AS (SELECT vec_id,
           |        [t[e] + t[e + 16] + t[e + 32] + t[e + 48]
           |         for e in range(1, 17)] AS pv
           |      FROM qv),
           |qp AS (SELECT vec_id AS qid, pv AS qpv FROM p WHERE vec_id < 5),
           |dp AS (SELECT vec_id AS id, pv AS dpv FROM p),
           |s1 AS (SELECT qid, id, list_dot_product(qpv, dpv) AS pd
           |       FROM qp CROSS JOIN dp WHERE id <> qid),
           |short AS (SELECT qid, id FROM (
           |    SELECT qid, id,
           |           row_number() OVER (PARTITION BY qid ORDER BY pd DESC, id) AS rk
           |    FROM s1) WHERE rk <= 40),
           |q AS (SELECT vec_id AS qid, t AS qt FROM qv WHERE vec_id < 5),
           |d AS (SELECT vec_id AS id, t AS dt FROM qv),
           |scored AS (SELECT sh.qid, sh.id,
           |    $maxsimScoreSql AS score
           |  FROM short sh JOIN q ON q.qid = sh.qid JOIN d ON d.id = sh.id)
           |SELECT qid, id, rank FROM (
           |  SELECT qid, id,
           |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rank
           |  FROM scored) WHERE rank <= 10
           |ORDER BY qid, rank""".stripMargin,

      "x_eval_maxsim" ->
        // maxsim top-10 joined against the exact dense-cosine top-10
        // (the x_eval_retrieval composite shape)
        s"""WITH qv AS (SELECT vec_id,
           |         [CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS DOUBLE)
           |          for x in embedding] AS t
           |       FROM embeddings),
           |q AS (SELECT vec_id AS qid, t AS qt FROM qv WHERE vec_id < 5),
           |d AS (SELECT vec_id AS id, t AS dt FROM qv),
           |scored AS (SELECT q.qid, d.id,
           |    $maxsimScoreSql AS score
           |  FROM q CROSS JOIN d WHERE d.id <> q.qid),
           |mr AS (SELECT qid, id,
           |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rank
           |       FROM scored),
           |m10 AS (SELECT qid, id, rank FROM mr WHERE rank <= 10),
           |eq0 AS (SELECT vec_id AS qid, embedding AS qv2 FROM embeddings WHERE vec_id < 5),
           |escored AS (
           |  SELECT eq0.qid, e.vec_id AS id,
           |    list_cosine_similarity(e.embedding, eq0.qv2) AS cos
           |  FROM embeddings e, eq0 WHERE e.vec_id <> eq0.qid),
           |er AS (SELECT qid, id,
           |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rk
           |       FROM escored),
           |truth AS (SELECT qid, id FROM er WHERE rk <= 10)
           |SELECT m.qid,
           |  CAST(sum(CASE WHEN t.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_10,
           |  CAST(max(CASE WHEN m.rank = 1 AND t.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS top1_in_truth
           |FROM m10 m LEFT JOIN truth t ON t.qid = m.qid AND t.id = m.id
           |GROUP BY m.qid ORDER BY m.qid""".stripMargin,

      "x_eval_retrieval" ->
        // ANN quality evaluation: the LSH chain's top-10 joined against
        // the exact brute-force top-10 (renamed CTEs) — hits@10 and a
        // top-1-in-truth flag per query, all integer.
        (lshAnnOracleChain + s""",
           |eq0 AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
           |escored AS (
           |  SELECT eq0.qid, e.vec_id AS id,
           |    list_cosine_similarity(e.embedding, eq0.qv) AS cos
           |  FROM embeddings e, eq0 WHERE e.vec_id <> eq0.qid),
           |er AS (SELECT qid, id,
           |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
           |       FROM escored),
           |truth AS (SELECT qid, id FROM er WHERE rank <= 10),
           |ann AS (SELECT qid, id, rank FROM r WHERE rank <= 10)
           |SELECT a.qid,
           |  CAST(sum(CASE WHEN t.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_10,
           |  CAST(max(CASE WHEN a.rank = 1 AND t.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS top1_in_truth
           |FROM ann a LEFT JOIN truth t ON t.qid = a.qid AND t.id = a.id
           |GROUP BY a.qid ORDER BY a.qid""".stripMargin),

      "x_eval_matryoshka" ->
        // both rankings replayed brute-force: the prefix side slices
        // the same float lists ([1:16] — DuckDB list slicing is
        // end-inclusive, matching Spark's slice(v, 1, 16)), cosine on
        // the slices, integer hits/agreement
        """WITH q AS (SELECT vec_id AS qid, embedding AS qv,
          |                 embedding[1:16] AS qp
          |          FROM embeddings WHERE vec_id < 5),
          |fs AS (SELECT q.qid, e.vec_id AS id,
          |         list_cosine_similarity(e.embedding, q.qv) AS cos
          |       FROM embeddings e, q WHERE e.vec_id <> q.qid),
          |truth AS (SELECT qid, id FROM (
          |    SELECT qid, id,
          |           row_number() OVER (PARTITION BY qid
          |             ORDER BY cos DESC, id) AS rank
          |    FROM fs) WHERE rank <= 10),
          |ps AS (SELECT q.qid, e.vec_id AS id,
          |         list_cosine_similarity(e.embedding[1:16], q.qp) AS cos
          |       FROM embeddings e, q WHERE e.vec_id <> q.qid),
          |pre AS (SELECT qid, id, rank FROM (
          |    SELECT qid, id,
          |           row_number() OVER (PARTITION BY qid
          |             ORDER BY cos DESC, id) AS rank
          |    FROM ps) WHERE rank <= 10)
          |SELECT p.qid,
          |  CAST(sum(CASE WHEN t.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          |    AS hits_at_10,
          |  CAST(max(CASE WHEN p.rank = 1 AND t.id IS NOT NULL
          |       THEN 1 ELSE 0 END) AS BIGINT) AS top1_in_truth
          |FROM pre p LEFT JOIN truth t ON t.qid = p.qid AND t.id = p.id
          |GROUP BY p.qid ORDER BY p.qid""".stripMargin,

      "x_sim_bq" ->
        // sign-bit packing (32 bits/word — a 1<<63 term would overflow
        // DuckDB's checked shift), per-word xor+bit_count hamming with
        // the id tiebreak, exact cosine re-rank of the 40-shortlist
        """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          |sig AS (SELECT vec_id,
          |         [CAST(list_sum([CASE WHEN v[(w - 1) * 32 + b] > 0
          |                         THEN (1::BIGINT << (b - 1)) ELSE 0::BIGINT END
          |                         for b in generate_series(1, 32)]) AS BIGINT)
          |          for w in generate_series(1, 2)] AS s
          |        FROM e),
          |q AS (SELECT vec_id AS qid, s AS qs FROM sig WHERE vec_id < 5),
          |ham AS (SELECT q.qid, c.vec_id AS id,
          |          CAST(list_sum([bit_count(xor(c.s[i], q.qs[i]))
          |                         for i in generate_series(1, 2)]) AS BIGINT) AS hd
          |        FROM sig c CROSS JOIN q
          |        WHERE c.vec_id <> q.qid),
          |short AS (SELECT qid, id FROM (
          |    SELECT qid, id,
          |           row_number() OVER (PARTITION BY qid ORDER BY hd, id) AS rk
          |    FROM ham) WHERE rk <= 40),
          |exact AS (SELECT sh.qid, sh.id,
          |            list_cosine_similarity(ec.embedding, eq.embedding) AS cos
          |          FROM short sh
          |          JOIN embeddings ec ON ec.vec_id = sh.id
          |          JOIN embeddings eq ON eq.vec_id = sh.qid)
          |SELECT qid, id, rank FROM (
          |  SELECT qid, id,
          |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
          |  FROM exact) WHERE rank <= 10
          |ORDER BY qid, rank""".stripMargin,

      "x_sim_ivfbq" ->
        // the composed replay: id-sampled centroids + argmax cell
        // assignment + top-nprobe probes (the x_sim_ivf formulation),
        // sign packing + probe-restricted hamming (the x_sim_bq
        // formulation), exact re-rank of the 40-shortlist
        """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
          |cents AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE nrm > 0
          |          ORDER BY vec_id LIMIT 16),
          |cell AS (
          |  SELECT vec_id, cid FROM (
          |    SELECT n.vec_id, c.cid,
          |           row_number() OVER (PARTITION BY n.vec_id
          |             ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cn) DESC,
          |                      c.cid) AS rn
          |    FROM n CROSS JOIN cents c) WHERE rn = 1),
          |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < 5),
          |probe AS (
          |  SELECT qid, cid FROM (
          |    SELECT q.qid, c.cid,
          |           row_number() OVER (PARTITION BY q.qid
          |             ORDER BY list_dot_product(q.qv, c.cv) / (q.qn * c.cn) DESC,
          |                      c.cid) AS rn
          |    FROM q CROSS JOIN cents c) WHERE rn <= 4),
          |sig AS (SELECT vec_id,
          |         [CAST(list_sum([CASE WHEN v[(w - 1) * 32 + b] > 0
          |                         THEN (1::BIGINT << (b - 1)) ELSE 0::BIGINT END
          |                         for b in generate_series(1, 32)]) AS BIGINT)
          |          for w in generate_series(1, 2)] AS s
          |        FROM e),
          |qs AS (SELECT q.qid, s.s AS qsig FROM q JOIN sig s ON s.vec_id = q.qid),
          |ham AS (SELECT p.qid, ce.vec_id AS id,
          |          CAST(list_sum([bit_count(xor(ms.s[i], k.qsig[i]))
          |                         for i in generate_series(1, 2)]) AS BIGINT) AS hd
          |        FROM probe p
          |        JOIN cell ce ON ce.cid = p.cid
          |        JOIN sig ms ON ms.vec_id = ce.vec_id
          |        JOIN qs k ON k.qid = p.qid
          |        WHERE ce.vec_id <> p.qid),
          |short AS (SELECT qid, id FROM (
          |    SELECT qid, id,
          |           row_number() OVER (PARTITION BY qid ORDER BY hd, id) AS rk
          |    FROM ham) WHERE rk <= 40),
          |exact AS (SELECT sh.qid, sh.id,
          |            list_cosine_similarity(ec.embedding, eq.embedding) AS cos
          |          FROM short sh
          |          JOIN embeddings ec ON ec.vec_id = sh.id
          |          JOIN embeddings eq ON eq.vec_id = sh.qid)
          |SELECT qid, id, rank FROM (
          |  SELECT qid, id,
          |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
          |  FROM exact) WHERE rank <= 10
          |ORDER BY qid, rank""".stripMargin,

      "x_sim_bq_persisted" ->
        // Replay DIRECTLY over the persisted code table (hoisted —
        // shared VERBATIM with the live foreachBatch twin).
        bqPersistedReplay,

      "x_stream_bq_serve" ->
        // the LIVE foreachBatch serving path shares the persisted-BQ
        // replay: per-query results are batch-invariant
        bqPersistedReplay,

      "x_cdc_bq_sync" ->
        // the synced scan-floor index ends folded (sidecar cleared), so
        // the replay reads the final on-disk signatures alone; exact
        // re-rank against the POST-TAIL corpus (rebuilt IEEE floats)
        bqPersistedReplaySql(bqSyncIdxDir,
          rerankCte = bqSyncPostCte, rerankTable = "post"),

      "x_sim_ivfbq_persisted" ->
        // Replay over the persisted composed artifact: centroids and the
        // cid-partitioned signatures come from the parquet on disk
        // (cid from the hive partition, CAST BIGINT both sides); probe
        // selection, probe-restricted hamming, shortlist, and exact
        // re-rank are the x_sim_ivfbq arithmetic (hoisted helper —
        // shared with the CDC-sync replay).
        ivfbqPersistedReplaySql(ivfbqIdxDir),

      "x_cdc_ivfbq_sync" ->
        // the synced composed index ends folded (sidecar cleared), so
        // the replay reads the final on-disk signatures alone; the
        // exact re-rank joins the POST-TAIL corpus (same rebuilt IEEE
        // floats as x_cdc_pq_sync's replay)
        ivfbqPersistedReplaySql(ivfbqSyncIdxDir,
          rerankCte = bqSyncPostCte, rerankTable = "post"),

      "x_sim_pq" ->
        // Full product-quantization replay: codebooks (unit-normalized
        // subvectors of the 16 smallest-id vectors), per-subspace argmax
        // coding (2·dot − ‖cb‖², ties to smallest j), per-query LUT, ADC
        // shortlist, exact cosine re-rank. The ADC sum is replayed as an
        // s-ORDERED list fold (0.0 + d1 + … + d8) — plain SQL sum() has
        // no defined order and a float sum is order-sensitive; Spark's
        // aggregate() folds ascending from 0.0.
        """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
          |u AS (SELECT vec_id,
          |        CASE WHEN nrm = 0 THEN v ELSE [x / nrm for x in v] END AS uv
          |      FROM n),
          |cbsrc AS (SELECT u.uv,
          |            row_number() OVER (ORDER BY u.vec_id) - 1 AS j
          |          FROM u JOIN (SELECT vec_id FROM n WHERE v IS NOT NULL
          |                       ORDER BY vec_id LIMIT 16) s USING (vec_id)),
          |cb AS (SELECT ss.s, c.j, c.uv[ss.s * 8 + 1 : ss.s * 8 + 8] AS cvec
          |       FROM (SELECT unnest(range(0, 8)) AS s) ss CROSS JOIN cbsrc c),
          |cbn AS (SELECT s, j, cvec, list_dot_product(cvec, cvec) AS n2 FROM cb),
          |subdots AS (SELECT u.vec_id, c.s, c.j,
          |    list_dot_product(u.uv[c.s * 8 + 1 : c.s * 8 + 8], c.cvec) * 2 - c.n2 AS score
          |  FROM u CROSS JOIN cbn c),
          |codes AS (SELECT vec_id, s, j AS code FROM (
          |    SELECT vec_id, s, j,
          |           row_number() OVER (PARTITION BY vec_id, s
          |                              ORDER BY score DESC, j) AS rn
          |    FROM subdots) WHERE rn = 1),
          |q0 AS (SELECT vec_id AS qid, uv AS quv FROM u WHERE vec_id < 5),
          |lut AS (SELECT q0.qid, c.s, c.j,
          |          list_dot_product(q0.quv[c.s * 8 + 1 : c.s * 8 + 8], c.cvec) AS d
          |        FROM q0 CROSS JOIN cbn c),
          |adc AS (SELECT l.qid, co.vec_id AS id, list(l.d ORDER BY l.s) AS ds
          |        FROM codes co JOIN lut l ON l.s = co.s AND l.j = co.code
          |        WHERE co.vec_id <> l.qid
          |        GROUP BY l.qid, co.vec_id),
          |scored AS (SELECT qid, id,
          |    0.0 + ds[1] + ds[2] + ds[3] + ds[4] + ds[5] + ds[6] + ds[7] + ds[8] AS score
          |  FROM adc),
          |short AS (SELECT qid, id FROM (
          |    SELECT qid, id,
          |           row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rk
          |    FROM scored) WHERE rk <= 40),
          |exact AS (SELECT sh.qid, sh.id,
          |            list_cosine_similarity(ec.embedding, eq.embedding) AS cos
          |          FROM short sh
          |          JOIN embeddings ec ON ec.vec_id = sh.id
          |          JOIN embeddings eq ON eq.vec_id = sh.qid)
          |SELECT qid, id, rank FROM (
          |  SELECT qid, id,
          |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
          |  FROM exact) WHERE rank <= 10
          |ORDER BY qid, rank""".stripMargin,

      "x_sim_ivf_persisted" ->
        // Replay DIRECTLY over the persisted index tables: centroids and
        // the cid-partitioned cells (including the STORED norms) are read
        // from the parquet the build wrote — probing, scoring, and
        // ranking replay the serve path; only the query vectors come
        // from the embeddings table. Same float parity as x_sim_ivf
        // (float→double element loads, mul-then-div cosine).
        ivfPersistedReplay(ivfIdxDir),

      "x_sim_ivf_appended" ->
        // Identical replay over the build-on-evens + append-odds index:
        // the on-disk parquet is the only input, so the hash proves the
        // incremental lifecycle composed to exactly the full index.
        ivfPersistedReplay(ivfAppIdxDir),

      "x_sim_ivf_compacted" ->
        // Identical replay over the build+append+COMPACT index: the
        // compaction rewrite must be content-neutral.
        ivfPersistedReplay(ivfCompactIdxDir),

      "x_stream_ann_serve" ->
        // the LIVE foreachBatch serving path shares the persisted-index
        // replay: per-query results are batch-invariant
        ivfPersistedReplay(ivfIdxDir),

      "x_export_npy" ->
        // shard assignment = the x_shuffle_shards md5 formula; byte_len
        // replays the NPY v1.0 header math: 6 magic + 2 version + 2 len
        // + dict + pad-to-64 + '\n' + n·64·4 payload
        """WITH sh AS (SELECT ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS shard
          |           FROM embeddings),
          |c AS (SELECT CAST(shard AS INTEGER) AS shard_no, count(*) AS n
          |      FROM sh GROUP BY shard),
          |d AS (SELECT shard_no, n,
          |        length(concat('{''descr'': ''<f4'', ''fortran_order'': False, ''shape'': (',
          |          CAST(n AS VARCHAR), ', 64), }')) AS dlen
          |      FROM c)
          |SELECT shard_no, CAST(n AS BIGINT) AS n_rows,
          |  CAST(64 AS BIGINT) AS n_dim,
          |  CAST(10 + dlen + ((64 - (11 + dlen) % 64) % 64) + 1 + n * 64 * 4
          |       AS BIGINT) AS byte_len
          |FROM d ORDER BY shard_no""".stripMargin,

      "x_export_npy_int8" ->
        // u8 twin: identical shard assignment and header arithmetic,
        // '|u1' descr (same 3-char length as '<f4'), payload n·64·1
        """WITH sh AS (SELECT ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS shard
          |           FROM embeddings),
          |c AS (SELECT CAST(shard AS INTEGER) AS shard_no, count(*) AS n
          |      FROM sh GROUP BY shard),
          |d AS (SELECT shard_no, n,
          |        length(concat('{''descr'': ''|u1'', ''fortran_order'': False, ''shape'': (',
          |          CAST(n AS VARCHAR), ', 64), }')) AS dlen
          |      FROM c)
          |SELECT shard_no, CAST(n AS BIGINT) AS n_rows,
          |  CAST(64 AS BIGINT) AS n_dim,
          |  CAST(10 + dlen + ((64 - (11 + dlen) % 64) % 64) + 1 + n * 64
          |       AS BIGINT) AS byte_len
          |FROM d ORDER BY shard_no""".stripMargin,

      "x_sim_ivf_deleted" ->
        // replay THROUGH the deletion-vector sidecar: the cells keep
        // the taken-down rows (delete is O(ids)); the oracle applies
        // the same tombstone anti-join as serve, so the hash proves
        // exactly the listed members are suppressed
        ivfPersistedReplay(ivfDelIdxDir, tombstoned = true),

      "x_sim_ivf_del_compacted" ->
        // after ivfCompact FOLDS the sidecar the rows are physically
        // gone and the sidecar is cleared — the PLAIN replay over the
        // cells alone must equal the sidecar-path result above
        ivfPersistedReplay(ivfDelCmpIdxDir),

      "x_takedown_pipeline" ->
        // same sidecar replay shape over the CDC-driven takedown index
        ivfPersistedReplay(takedownIdxDir, tombstoned = true),

      "x_stream_takedown" ->
        // the stream-fed sidecar replay: same shape as x_takedown_pipeline
        ivfPersistedReplay(streamTdIdxDir, tombstoned = true),

      "x_index_report" ->
        // every figure recomputed from the artifact alone; filename=
        // gives DuckDB the parquet file census for the small-files gauge
        s"""WITH cells AS (SELECT id, CAST(cid AS BIGINT) AS cid, filename
           |  FROM read_parquet('@@ANNDIR|$ivfDelIdxDir|cells@@/*/*.parquet',
           |                    hive_partitioning = true, filename = true)),
           |tomb AS (SELECT DISTINCT id
           |  FROM read_parquet('$ivfDelIdxDir/tombstones/*.parquet'))
           |SELECT
           |  CAST((SELECT count(*)
           |        FROM read_parquet('$ivfDelIdxDir/centroids/*.parquet')) AS BIGINT) AS nlist,
           |  CAST((SELECT count(*) FROM cells) AS BIGINT) AS n_members,
           |  CAST((SELECT count(*) FROM tomb) AS BIGINT) AS n_pending_tombstones,
           |  CAST((SELECT count(*) FROM cells
           |        WHERE id NOT IN (SELECT id FROM tomb)) AS BIGINT) AS n_serving,
           |  CAST((SELECT count(DISTINCT filename) FROM cells) * 100
           |       // (SELECT count(DISTINCT cid) FROM cells) AS BIGINT) AS files_per_cid_x100""".stripMargin,

      "x_pq_report" ->
        // every figure recomputed from the artifact alone (the
        // x_index_report convention); filename= gives the file census
        s"""WITH codes AS (SELECT id, filename
           |  FROM read_parquet('@@ANNDIR|$pqDelIdxDir|codes@@/*.parquet', filename = true)),
           |tomb AS (SELECT DISTINCT id
           |  FROM read_parquet('$pqDelIdxDir/tombstones/*.parquet'))
           |SELECT
           |  CAST((SELECT max(s) + 1
           |        FROM read_parquet('$pqDelIdxDir/codebooks/*.parquet')) AS BIGINT) AS m,
           |  CAST((SELECT max(j) + 1
           |        FROM read_parquet('$pqDelIdxDir/codebooks/*.parquet')) AS BIGINT) AS ks,
           |  CAST((SELECT count(*) FROM codes) AS BIGINT) AS n_codes,
           |  CAST((SELECT count(*) FROM tomb) AS BIGINT) AS n_pending_tombstones,
           |  CAST((SELECT count(*) FROM codes
           |        WHERE id NOT IN (SELECT id FROM tomb)) AS BIGINT) AS n_serving,
           |  CAST((SELECT count(DISTINCT filename) FROM codes) AS BIGINT) AS n_files""".stripMargin,

      "x_cdc_index_sync" ->
        // the synced index ends folded (sidecar cleared), so the PLAIN
        // replay reads the final cells alone: updated vectors serve,
        // tombstoned members are gone from the bytes
        ivfPersistedReplay(cdcSyncIdxDir),

      "x_ann_autotune" ->
        // the full sweep replayed from the artifact: probe ranks to
        // max(nprobe), one candidate CTE, per-nprobe re-rank, exact
        // truth, integer recall (// is floor ≡ Spark's / on BIGINTs
        // here — both operands non-negative), and the same
        // smallest-meeting-target-else-largest pick
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |nq AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
           |cents AS (SELECT CAST(cid AS BIGINT) AS cid, cvec AS cv, cnorm AS cn
           |          FROM read_parquet('$ivfIdxDir/centroids/*.parquet')),
           |cell AS (SELECT CAST(cid AS BIGINT) AS cid, id,
           |                CAST(vec AS DOUBLE[]) AS mv, norm AS mn
           |         FROM read_parquet('@@ANNDIR|$ivfIdxDir|cells@@/*/*.parquet',
           |                           hive_partitioning = true)),
           |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM nq
           |      WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
           |            % $annTuneSampleMod = 7),
           |probe AS (SELECT qid, cid, rn AS probe_rank FROM (
           |    SELECT q.qid, c.cid,
           |           row_number() OVER (PARTITION BY q.qid
           |             ORDER BY list_dot_product(q.qv, c.cv) / (q.qn * c.cn) DESC,
           |                      c.cid) AS rn
           |    FROM q CROSS JOIN cents c) WHERE rn <= 8),
           |cand AS (SELECT q.qid, m.id, p.probe_rank,
           |                list_dot_product(m.mv, q.qv) / (m.mn * q.qn) AS cos
           |         FROM probe p JOIN q ON q.qid = p.qid
           |         JOIN cell m ON m.cid = p.cid
           |         WHERE m.id <> q.qid),
           |ps AS (SELECT unnest([1, 2, 4, 8]) AS nprobe),
           |perp AS (SELECT nprobe, qid, id FROM (
           |    SELECT ps.nprobe, c.qid, c.id,
           |           row_number() OVER (PARTITION BY ps.nprobe, c.qid
           |             ORDER BY c.cos DESC, c.id) AS rk
           |    FROM ps JOIN cand c ON c.probe_rank <= ps.nprobe) WHERE rk <= 10),
           |truth AS (SELECT qid, id FROM (
           |    SELECT q.qid, m.id,
           |           row_number() OVER (PARTITION BY q.qid
           |             ORDER BY list_dot_product(m.mv, q.qv) / (m.mn * q.qn) DESC,
           |                      m.id) AS rk
           |    FROM q CROSS JOIN cell m WHERE m.id <> q.qid) WHERE rk <= 10),
           |hit AS (SELECT p.nprobe, count(*) AS hits
           |        FROM perp p JOIN truth t ON t.qid = p.qid AND t.id = p.id
           |        GROUP BY p.nprobe),
           |base AS (SELECT (SELECT count(*) FROM truth) AS possible,
           |                (SELECT count(DISTINCT qid) FROM q) AS n_queries),
           |rep AS (SELECT ps.nprobe,
           |               CAST(b.n_queries AS BIGINT) AS n_queries,
           |               CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
           |               CAST(b.possible AS BIGINT) AS possible,
           |               CAST(coalesce(h.hits, 0) * 10000 // b.possible AS BIGINT)
           |                 AS recall_pctx100
           |        FROM ps CROSS JOIN base b
           |        LEFT JOIN hit h ON h.nprobe = ps.nprobe),
           |pick AS (SELECT coalesce(
           |    min(nprobe) FILTER (WHERE recall_pctx100 >= 9500),
           |    (SELECT max(nprobe) FROM ps)) AS pn FROM rep)
           |SELECT CAST(r.nprobe AS INTEGER) AS nprobe, r.n_queries, r.hits,
           |       r.possible, r.recall_pctx100,
           |       CAST(CASE WHEN r.nprobe = (SELECT pn FROM pick)
           |            THEN 1 ELSE 0 END AS INTEGER) AS chosen
           |FROM rep r ORDER BY r.nprobe""".stripMargin,

      "x_ann_autotune_ivfbq" ->
        // the scan-floor sweep replay: probe ranks ride the one hamming
        // pass, per-point shortlist + exact re-rank, brute-force truth
        // over the serving membership, integer recall + pick
        ivfbqAutotuneReplay(ivfbqIdxDir),

      "x_cdc_pq_sync" ->
        // the synced PQ index ends folded (sidecar cleared), so the
        // plain replay reads the final on-disk codes alone; the exact
        // re-rank joins the POST-TAIL corpus, whose updated float
        // vectors are rebuilt with the identical IEEE float arithmetic
        // (x promoted to DOUBLE, the exact-in-binary delta added, the
        // sum rounded back to FLOAT). CASE order encodes the LWW fold:
        // revive (seq 4) over delete (seq 3) over update (seq 2).
        pqPersistedReplay(pqSyncIdxDir,
          rerankCte = """post AS (SELECT vec_id,
            |    CASE WHEN vec_id % 22 = 3
            |           THEN [CAST(CAST(x AS DOUBLE) - 0.25 AS FLOAT) for x in embedding]
            |         WHEN vec_id % 7 = 0
            |           THEN [CAST(CAST(x AS DOUBLE) + 0.125 AS FLOAT) for x in embedding]
            |         ELSE embedding END AS embedding
            |  FROM embeddings
            |  WHERE NOT (vec_id % 11 = 3 AND vec_id % 22 <> 3)),""".stripMargin,
          rerankTable = "post"),

      "x_sim_pq_deleted" ->
        pqPersistedReplay(pqDelIdxDir, tombstoned = true),

      "x_sim_ivfpq_persisted" ->
        ivfpqPersistedReplay(ivfpqIdxDir),

      "x_sim_ivfpq_residual" ->
        ivfpqResidualReplaySql,

      // the streaming twin shares the batch entry's oracle VERBATIM
      // (one hoisted string — the two can never drift)
      "x_stream_ivfpq_res_serve" ->
        ivfpqResidualReplaySql,

      "x_ann_autotune_residual" ->
        ivfpqAutotuneReplay(ivfpqResIdxDir, residual = true),

      "x_sim_ivfpq_deleted" ->
        ivfpqPersistedReplay(ivfpqDelIdxDir, tombstoned = true),

      "x_sim_ivfpq_appended" ->
        // the replay reads only the FINAL on-disk artifact — appended
        // partitions are indistinguishable from built ones by design
        ivfpqPersistedReplay(ivfpqAppIdxDir),

      "x_ann_autotune_ivfpq" ->
        // the composed sweep replayed from the artifact: ranked probes
        // to max(nprobe), ONE cell-restricted ADC with the probe rank
        // kept, per-nprobe shortlist (rk <= k·rerank) + exact re-rank,
        // truth over the serving ids' true vectors, integer recall and
        // the same smallest-meeting-target-else-largest pick
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
           |u AS (SELECT vec_id,
           |        CASE WHEN nrm = 0 THEN v ELSE [x / nrm for x in v] END AS uv
           |      FROM n),
           |cents AS (SELECT CAST(cid AS BIGINT) AS cid, cvec AS cv, cnorm AS cn
           |          FROM read_parquet('$ivfpqIdxDir/centroids/*.parquet')),
           |cb AS (SELECT s, j, cvec FROM read_parquet('$ivfpqIdxDir/codebooks/*.parquet')),
           |codes AS (SELECT CAST(cid AS BIGINT) AS cid, id, code
           |          FROM read_parquet('@@ANNDIR|$ivfpqIdxDir|codes@@/*/*.parquet',
           |                            hive_partitioning = true)),
           |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n
           |      WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
           |            % $annTuneSampleMod = 7),
           |qu AS (SELECT nq.vec_id AS qid, nq.uv AS quv FROM u nq
           |       JOIN q ON q.qid = nq.vec_id),
           |probe AS (SELECT qid, cid, rn AS probe_rank FROM (
           |    SELECT q.qid, c.cid,
           |           row_number() OVER (PARTITION BY q.qid
           |             ORDER BY list_dot_product(q.qv, c.cv) / (q.qn * c.cn) DESC,
           |                      c.cid) AS rn
           |    FROM q CROSS JOIN cents c) WHERE rn <= 8),
           |lut AS (SELECT qu.qid, c.s, c.j,
           |          list_dot_product(qu.quv[c.s * 8 + 1 : c.s * 8 + 8], c.cvec) AS d
           |        FROM qu CROSS JOIN cb c),
           |adc0 AS (SELECT l.qid, co.id, p.probe_rank,
           |           list(l.d ORDER BY l.s) AS ds
           |         FROM codes co
           |         JOIN probe p ON p.cid = co.cid
           |         JOIN lut l ON l.qid = p.qid AND l.j = co.code[l.s + 1]
           |         WHERE co.id <> l.qid
           |         GROUP BY l.qid, co.id, p.probe_rank),
           |scored AS (SELECT qid, id, probe_rank,
           |    0.0 + ds[1] + ds[2] + ds[3] + ds[4] + ds[5] + ds[6] + ds[7] + ds[8] AS score
           |  FROM adc0),
           |ps AS (SELECT unnest([1, 2, 4, 8]) AS nprobe),
           |short AS (SELECT nprobe, qid, id FROM (
           |    SELECT ps.nprobe, sc.qid, sc.id,
           |           row_number() OVER (PARTITION BY ps.nprobe, sc.qid
           |             ORDER BY sc.score DESC, sc.id) AS rk
           |    FROM ps JOIN scored sc ON sc.probe_rank <= ps.nprobe)
           |  WHERE rk <= 40),
           |exact AS (SELECT sh.nprobe, sh.qid, sh.id,
           |            list_cosine_similarity(ec.embedding, eq.embedding) AS cos
           |          FROM short sh
           |          JOIN embeddings ec ON ec.vec_id = sh.id
           |          JOIN embeddings eq ON eq.vec_id = sh.qid),
           |perp AS (SELECT nprobe, qid, id FROM (
           |    SELECT nprobe, qid, id,
           |           row_number() OVER (PARTITION BY nprobe, qid
           |             ORDER BY cos DESC, id) AS rank
           |    FROM exact) WHERE rank <= 10),
           |serving AS (SELECT DISTINCT id FROM codes),
           |tc AS (SELECT n.vec_id, n.v, n.nrm FROM n
           |       JOIN serving sv ON sv.id = n.vec_id),
           |truth AS (SELECT qid, id FROM (
           |    SELECT q.qid, m.vec_id AS id,
           |           row_number() OVER (PARTITION BY q.qid
           |             ORDER BY list_dot_product(m.v, q.qv) / (m.nrm * q.qn) DESC,
           |                      m.vec_id) AS rk
           |    FROM q CROSS JOIN tc m WHERE m.vec_id <> q.qid) WHERE rk <= 10),
           |hit AS (SELECT p.nprobe, count(*) AS hits
           |        FROM perp p JOIN truth t ON t.qid = p.qid AND t.id = p.id
           |        GROUP BY p.nprobe),
           |base AS (SELECT (SELECT count(*) FROM truth) AS possible,
           |                (SELECT count(DISTINCT qid) FROM q) AS n_queries),
           |rep AS (SELECT ps.nprobe,
           |               CAST(b.n_queries AS BIGINT) AS n_queries,
           |               CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
           |               CAST(b.possible AS BIGINT) AS possible,
           |               CAST(coalesce(h.hits, 0) * 10000 // b.possible AS BIGINT)
           |                 AS recall_pctx100
           |        FROM ps CROSS JOIN base b
           |        LEFT JOIN hit h ON h.nprobe = ps.nprobe),
           |pick AS (SELECT coalesce(
           |    min(nprobe) FILTER (WHERE recall_pctx100 >= 9500),
           |    (SELECT max(nprobe) FROM ps)) AS pn FROM rep)
           |SELECT CAST(r.nprobe AS INTEGER) AS nprobe, r.n_queries, r.hits,
           |       r.possible, r.recall_pctx100,
           |       CAST(CASE WHEN r.nprobe = (SELECT pn FROM pick)
           |            THEN 1 ELSE 0 END AS INTEGER) AS chosen
           |FROM rep r ORDER BY r.nprobe""".stripMargin,

      "x_cdc_ivfpq_sync" ->
        // synced index ends folded (sidecar cleared) → plain replay of
        // the final artifact; exact re-rank joins the POST-TAIL
        // snapshot, updated floats rebuilt with identical IEEE
        // arithmetic (the x_cdc_pq_sync convention; CASE order encodes
        // the LWW fold: revive seq 4 over delete seq 3 over update 2)
        ivfpqPersistedReplay(ivfpqSyncIdxDir,
          rerankCte = """post AS (SELECT vec_id,
            |    CASE WHEN vec_id % 22 = 3
            |           THEN [CAST(CAST(x AS DOUBLE) - 0.25 AS FLOAT) for x in embedding]
            |         WHEN vec_id % 7 = 0
            |           THEN [CAST(CAST(x AS DOUBLE) + 0.125 AS FLOAT) for x in embedding]
            |         ELSE embedding END AS embedding
            |  FROM embeddings
            |  WHERE NOT (vec_id % 11 = 3 AND vec_id % 22 <> 3)),""".stripMargin,
          rerankTable = "post"),

      // batch-invariant live serve shares the persisted oracle verbatim
      "x_stream_ivfpq_serve" ->
        ivfpqPersistedReplay(ivfpqIdxDir),

      "x_ivfpq_report" ->
        // every figure recomputed from the artifact alone; filename=
        // gives DuckDB the parquet file census (the report-family rule)
        s"""WITH codes AS (SELECT id, CAST(cid AS BIGINT) AS cid, filename
           |  FROM read_parquet('@@ANNDIR|$ivfpqDelIdxDir|codes@@/*/*.parquet',
           |                    hive_partitioning = true, filename = true)),
           |tomb AS (SELECT DISTINCT id
           |  FROM read_parquet('$ivfpqDelIdxDir/tombstones/*.parquet')),
           |cb AS (SELECT s, j
           |  FROM read_parquet('$ivfpqDelIdxDir/codebooks/*.parquet'))
           |SELECT
           |  CAST((SELECT count(*)
           |        FROM read_parquet('$ivfpqDelIdxDir/centroids/*.parquet')) AS BIGINT) AS nlist,
           |  CAST((SELECT max(s) + 1 FROM cb) AS BIGINT) AS m,
           |  CAST((SELECT max(j) + 1 FROM cb) AS BIGINT) AS ks,
           |  CAST((SELECT count(*) FROM codes) AS BIGINT) AS n_codes,
           |  CAST((SELECT count(*) FROM tomb) AS BIGINT) AS n_pending_tombstones,
           |  CAST((SELECT count(*) FROM codes
           |        WHERE id NOT IN (SELECT id FROM tomb)) AS BIGINT) AS n_serving,
           |  CAST((SELECT count(DISTINCT filename) FROM codes) * 100
           |       // (SELECT count(DISTINCT cid) FROM codes) AS BIGINT) AS files_per_cid_x100""".stripMargin,

      "x_sim_pq_del_compacted" ->
        pqPersistedReplay(pqDelCmpIdxDir),

      "x_layout_compact" ->
        // the compacted copy must aggregate identically to the ORIGINAL
        // table — content neutrality of the rewrite, hash-gated
        """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          |  CAST(sum(length(text)) AS BIGINT) AS sum_text_len
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

      "x_sim_pq_persisted" ->
        // ADC + exact re-rank replayed over the PERSISTED codebooks and
        // code table (no train/encode CTEs — the artifacts on disk are
        // the input). Each (qid, id) folds its m subvector-dot lookups
        // in s order from 0.0 (float sums are order-sensitive; Spark's
        // aggregate() folds ascending), exactly like x_sim_pq.
        pqPersistedReplay(pqIdxDir),

      "x_sim_pq_appended" ->
        // identical replay over the build-on-evens + append-odds PQ
        // index: on-disk codebooks + codes are the only inputs
        pqPersistedReplay(pqAppIdxDir),

      "x_dedup_audio" ->
        // the SAME hamming-LSH replay shape as x_dedup_images, over the
        // staged audio fingerprints — the miner is modality-agnostic
        s"""WITH h AS (SELECT id, afp AS ahash
           |  FROM read_parquet('$audioPrintStageDir/prints.parquet')),
           |${pairBandCtes()},
           |pairs AS (SELECT DISTINCT c1.id AS a, c2.id AS b,
           |            c1.ahash AS ha, c2.ahash AS hb
           |          FROM cap c1 JOIN cap c2 ON c1.band = c2.band
           |            AND c1.bv = c2.bv AND c1.id < c2.id)
           |SELECT a, b, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
           |FROM pairs WHERE bit_count(xor(ha, hb)) <= 6
           |ORDER BY a, b""".stripMargin,

      "x_dedup_images" ->
        // Hamming-LSH replay over the SAME staged signature parquet: the
        // 8 byte-bands ((h >> 8b) & 255 — arithmetic-vs-logical shift is
        // irrelevant under the low-8-bit mask for b ≤ 7), the capped
        // band-bucket candidate join, and the bit_count(xor) verify are
        // all 64-bit integer arithmetic both engines compute identically.
        s"""WITH h AS (SELECT id, ahash
           |  FROM read_parquet('$imgHashStageDir/hashes.parquet')),
           |${pairBandCtes()},
           |pairs AS (SELECT DISTINCT c1.id AS a, c2.id AS b,
           |            c1.ahash AS ha, c2.ahash AS hb
           |          FROM cap c1 JOIN cap c2 ON c1.band = c2.band
           |            AND c1.bv = c2.bv AND c1.id < c2.id)
           |SELECT a, b, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
           |FROM pairs WHERE bit_count(xor(ha, hb)) <= 6
           |ORDER BY a, b""".stripMargin,

      "x_pipeline_multimodal" ->
        // the whole composite replayed as one chain over the staged
        // signatures: band mining (the x_dedup_images CTEs) → recursive
        // min-label components → keep canonicals → md5 shards + modular
        // checksum (the x_export_manifest convention)
        s"""WITH RECURSIVE h AS (SELECT id, ahash
           |  FROM read_parquet('$imgHashStageDir/hashes.parquet')),
           |${pairBandCtes()},
           |pairs AS (SELECT DISTINCT c1.id AS a, c2.id AS b,
           |            c1.ahash AS ha, c2.ahash AS hb
           |          FROM cap c1 JOIN cap c2 ON c1.band = c2.band
           |            AND c1.bv = c2.bv AND c1.id < c2.id),
           |np AS (SELECT a, b FROM pairs WHERE bit_count(xor(ha, hb)) <= 6),
           |edges AS (SELECT a AS src, b AS dst FROM np
           |          UNION SELECT b, a FROM np),
           |reach AS (
           |  SELECT DISTINCT src AS node, src AS label FROM edges
           |  UNION
           |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node),
           |lab AS (SELECT node, min(label) AS cluster FROM reach GROUP BY node),
           |gone AS (SELECT node AS id FROM lab WHERE node <> cluster),
           |kept AS (SELECT h.id, h.ahash FROM h
           |         LEFT JOIN gone g ON g.id = h.id WHERE g.id IS NULL),
           |sh AS (SELECT id, ahash,
           |         ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT % 8
           |           AS shard,
           |         ('0x' || substr(md5(CAST(id AS VARCHAR) || '|' ||
           |                             CAST(ahash AS VARCHAR)), 1, 15))::BIGINT
           |           % 1000000007 AS hv
           |       FROM kept)
           |SELECT shard, CAST(count(*) AS BIGINT) AS n_images,
           |  CAST(sum(hv) % 1000000007 AS BIGINT) AS checksum,
           |  CAST(min(id) AS BIGINT) AS min_id,
           |  CAST(max(id) AS BIGINT) AS max_id
           |FROM sh GROUP BY shard ORDER BY shard""".stripMargin,

      "x_eval_image_dedup" ->
        // truth = exact all-pairs hamming; found = uncapped band mining;
        // the pigeonhole bound predicts recall_pct = 100 and the oracle
        // MEASURES it over the same staged signatures
        s"""WITH h AS (SELECT id, ahash
           |  FROM read_parquet('$imgHashStageDir/hashes.parquet')),
           |truth AS (SELECT h1.id AS a, h2.id AS b
           |          FROM h h1 JOIN h h2 ON h1.id < h2.id
           |          WHERE bit_count(xor(h1.ahash, h2.ahash)) <= 6),
           |${pairBandCtes(cap = None)},
           |found AS (SELECT DISTINCT c1.id AS a, c2.id AS b
           |          FROM cap c1 JOIN cap c2 ON c1.band = c2.band
           |            AND c1.bv = c2.bv AND c1.id < c2.id
           |          WHERE bit_count(xor(c1.ahash, c2.ahash)) <= 6),
           |agg AS (SELECT
           |    (SELECT count(*) FROM truth) AS n_truth,
           |    (SELECT count(*) FROM found) AS n_found,
           |    (SELECT count(*) FROM truth t JOIN found f
           |       ON t.a = f.a AND t.b = f.b) AS n_hit)
           |SELECT CAST(n_truth AS BIGINT) AS n_truth,
           |  CAST(n_found AS BIGINT) AS n_found,
           |  CAST(n_hit AS BIGINT) AS n_hit,
           |  CAST(CASE WHEN n_truth = 0 THEN 100
           |       ELSE n_hit * 100 // n_truth END AS BIGINT) AS recall_pct
           |FROM agg""".stripMargin,

      "x_eval_image_dedup_sampled" ->
        // sampled-truth twin: exact hamming truth over the md5-sampled
        // signature subset; found = full band mining filtered to
        // sampled pairs (same shape as x_eval_dedup_sampled)
        s"""WITH h AS (SELECT id, ahash
           |  FROM read_parquet('$imgHashStageDir/hashes.parquet')),
           |hs AS (SELECT id, ahash FROM h
           |  WHERE ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT % $evalSampleMod = 0),
           |truth AS (SELECT h1.id AS a, h2.id AS b
           |          FROM hs h1 JOIN hs h2 ON h1.id < h2.id
           |          WHERE bit_count(xor(h1.ahash, h2.ahash)) <= 6),
           |${pairBandCtes(cap = None)},
           |found0 AS (SELECT DISTINCT c1.id AS a, c2.id AS b
           |          FROM cap c1 JOIN cap c2 ON c1.band = c2.band
           |            AND c1.bv = c2.bv AND c1.id < c2.id
           |          WHERE bit_count(xor(c1.ahash, c2.ahash)) <= 6),
           |found AS (SELECT a, b FROM found0
           |  WHERE ('0x' || substr(md5(CAST(a AS VARCHAR)), 1, 15))::BIGINT % $evalSampleMod = 0
           |    AND ('0x' || substr(md5(CAST(b AS VARCHAR)), 1, 15))::BIGINT % $evalSampleMod = 0),
           |agg AS (SELECT
           |    (SELECT count(*) FROM truth) AS n_truth,
           |    (SELECT count(*) FROM found) AS n_found,
           |    (SELECT count(*) FROM truth t JOIN found f
           |       ON t.a = f.a AND t.b = f.b) AS n_hit)
           |SELECT CAST(n_truth AS BIGINT) AS n_truth,
           |  CAST(n_found AS BIGINT) AS n_found,
           |  CAST(n_hit AS BIGINT) AS n_hit,
           |  CAST(CASE WHEN n_truth = 0 THEN 100
           |       ELSE n_hit * 100 // n_truth END AS BIGINT) AS recall_pct
           |FROM agg""".stripMargin,

      "x_stream_imagehash" ->
        // Stream-vs-index replay over the SAME staged signature parquet:
        // corpus half (< 100000) band PAIRS with the BUILD-TIME bucket
        // cap, stream half (≥ 100000) band pairs uncapped, equi-join +
        // hamming — one row per colliding band pair, no distinct
        // (matching the stream's append-mode emission).
        s"""WITH h AS (SELECT id, ahash
           |  FROM read_parquet('$imgHashStageDir/hashes.parquet')),
           |bb AS (SELECT a.i AS i, b.j AS j, a.i * 8 + b.j AS band
           |       FROM (SELECT unnest(range(0, 8)) AS i) a,
           |            (SELECT unnest(range(0, 8)) AS j) b
           |       WHERE a.i < b.j),
           |cb AS (SELECT c.id AS corpus_id, c.ahash AS chash, bb.band,
           |         ((c.ahash >> (bb.i * 8)) & 255) * 256 +
           |         ((c.ahash >> (bb.j * 8)) & 255) AS bv
           |       FROM h c CROSS JOIN bb WHERE c.id < 100000),
           |ok AS (SELECT band, bv FROM cb GROUP BY band, bv
           |       HAVING count(*) <= 1000),
           |cbo AS (SELECT cb.* FROM cb JOIN ok USING (band, bv)),
           |sb AS (SELECT s.id, s.ahash, bb.band,
           |         ((s.ahash >> (bb.i * 8)) & 255) * 256 +
           |         ((s.ahash >> (bb.j * 8)) & 255) AS bv
           |       FROM h s CROSS JOIN bb WHERE s.id >= 100000)
           |SELECT sb.id, cbo.corpus_id, sb.band,
           |  CAST(bit_count(xor(sb.ahash, cbo.chash)) AS INTEGER) AS hamming
           |FROM sb JOIN cbo ON cbo.band = sb.band AND cbo.bv = sb.bv
           |WHERE bit_count(xor(sb.ahash, cbo.chash)) <= 6
           |ORDER BY 1, 2, 3""".stripMargin,

      "x_dedup_embedding_pairs" -> {
        val sigUnion = (0 until hpTables).map(tb =>
          s"SELECT vec_id, $tb AS t, ${hpSigSql(tb)} AS sig FROM qv")
          .mkString("\nUNION ALL\n")
        s"""WITH qv AS (SELECT vec_id,
           |         [CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS DOUBLE)
           |          for x in embedding] AS q
           |       FROM embeddings),
           |stacked AS (
           |$sigUnion),
           |ok AS (SELECT t, sig FROM stacked GROUP BY t, sig
           |       HAVING count(*) >= 2 AND count(*) <= $hpBucketCap),
           |cand AS (SELECT DISTINCT s1.vec_id AS a, s2.vec_id AS b
           |           FROM stacked s1
           |           JOIN stacked s2 ON s1.t = s2.t AND s1.sig = s2.sig
           |             AND s1.vec_id < s2.vec_id
           |           JOIN ok ON ok.t = s1.t AND ok.sig = s1.sig),
           |p AS (SELECT a, b,
           |        list_cosine_similarity(ea.embedding, eb.embedding) AS cos
           |        FROM cand JOIN embeddings ea ON ea.vec_id = cand.a
           |                  JOIN embeddings eb ON eb.vec_id = cand.b),
           |r AS (SELECT a, b, row_number() OVER (ORDER BY cos DESC, a, b) AS rank FROM p)
           |SELECT a, b, rank FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin
      },

      "x_decontam_embedding" -> {
        val sigC = (0 until hpTables).map(tb =>
          s"SELECT vec_id, $tb AS t, ${hpSigSql(tb)} AS sig FROM corp")
          .mkString("\nUNION ALL\n")
        val sigR = (0 until hpTables).map(tb =>
          s"SELECT vec_id, $tb AS t, ${hpSigSql(tb)} AS sig FROM ref")
          .mkString("\nUNION ALL\n")
        s"""WITH qv AS (SELECT vec_id,
           |         [CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS DOUBLE)
           |          for x in embedding] AS q
           |       FROM embeddings),
           |qn AS (SELECT vec_id, q, list_dot_product(q, q) AS nq2 FROM qv),
           |corp AS (SELECT * FROM qn WHERE vec_id % 17 <> 0),
           |ref AS (SELECT * FROM qn WHERE vec_id % 17 = 0),
           |sc AS (
           |$sigC),
           |sr0 AS (
           |$sigR),
           |srok AS (SELECT t, sig FROM sr0 GROUP BY t, sig
           |         HAVING count(*) <= $hpBucketCap),
           |sr AS (SELECT sr0.* FROM sr0 JOIN srok USING (t, sig)),
           |cand AS (SELECT DISTINCT c.vec_id AS id, r.vec_id AS rid
           |           FROM sc c JOIN sr r ON c.t = r.t AND c.sig = r.sig),
           |hit AS (SELECT cand.id, CAST(count(*) AS BIGINT) AS n_ref_hits
           |        FROM cand JOIN corp cq ON cq.vec_id = cand.id
           |                  JOIN ref rq ON rq.vec_id = cand.rid
           |        WHERE list_dot_product(cq.q, rq.q) >= 0
           |          AND CAST(list_dot_product(cq.q, rq.q) AS HUGEINT)
           |            * CAST(list_dot_product(cq.q, rq.q) AS HUGEINT) * 25
           |            >= 9 * CAST(cq.nq2 AS HUGEINT) * CAST(rq.nq2 AS HUGEINT)
           |        GROUP BY cand.id)
           |SELECT c.vec_id AS id, coalesce(h.n_ref_hits, 0) AS n_ref_hits,
           |       coalesce(h.n_ref_hits, 0) > 0 AS contaminated
           |FROM corp c LEFT JOIN hit h ON h.id = c.vec_id
           |ORDER BY id""".stripMargin
      },

      "x_dedup_semantic" -> {
        val n2 = semThreshNum * semThreshNum
        val d2 = semThreshDen * semThreshDen
        s"""WITH RECURSIVE qv AS (
           |  SELECT vec_id,
           |         [CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS DOUBLE)
           |          for x in embedding] AS q
           |  FROM embeddings),
           |qn AS (SELECT vec_id, q, list_dot_product(q, q) AS nq2 FROM qv),
           |cents AS (SELECT vec_id AS cid, q AS cq, nq2 AS nc2 FROM qn
           |          WHERE nq2 > 0 ORDER BY vec_id LIMIT $semNlist),
           |scored AS (SELECT v.vec_id, c.cid,
           |             list_dot_product(v.q, c.cq) / sqrt(c.nc2) AS score
           |           FROM qn v CROSS JOIN cents c),
           |asg AS (SELECT vec_id, cid AS cell FROM (
           |          SELECT vec_id, cid,
           |                 row_number() OVER (PARTITION BY vec_id
           |                                    ORDER BY score DESC, cid) AS rn
           |          FROM scored) WHERE rn = 1),
           |okc AS (SELECT cell FROM asg GROUP BY cell
           |        HAVING count(*) >= 2 AND count(*) <= $semCellCap),
           |mem AS (SELECT a.vec_id, a.cell, n.q, n.nq2
           |        FROM asg a JOIN okc USING (cell) JOIN qn n USING (vec_id)),
           |pairs AS (SELECT x.vec_id AS a, y.vec_id AS b
           |          FROM mem x JOIN mem y
           |            ON x.cell = y.cell AND x.vec_id < y.vec_id
           |          WHERE list_dot_product(x.q, y.q) >= 0
           |            AND CAST(list_dot_product(x.q, y.q) AS HUGEINT)
           |              * CAST(list_dot_product(x.q, y.q) AS HUGEINT) * $d2
           |              >= $n2 * CAST(x.nq2 AS HUGEINT) * CAST(y.nq2 AS HUGEINT)),
           |edges AS (SELECT a AS src, b AS dst FROM pairs
           |          UNION SELECT b, a FROM pairs),
           |reach AS (
           |  SELECT DISTINCT src AS node, src AS label FROM edges
           |  UNION
           |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node),
           |lab AS (SELECT node AS vec_id, min(label) AS cluster_id
           |          FROM reach GROUP BY node),
           |csizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
           |             FROM lab GROUP BY cluster_id)
           |SELECT l.vec_id, l.cluster_id, s.n_members,
           |       l.vec_id = l.cluster_id AS keep
           |FROM lab l JOIN csizes s USING (cluster_id)
           |ORDER BY l.vec_id""".stripMargin
      },

      "x_sim_topk" ->
        """WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
          |scored AS (
          |  SELECT q.qid, e.vec_id AS id,
          |    list_cosine_similarity(e.embedding, q.qv) AS cos
          |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
          |r AS (SELECT qid, id,
          |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
          |      FROM scored)
          |SELECT qid, id, rank FROM r WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,

      "x_bitext_margin" ->
        // full quantized-lattice replay: same floor(x·1e6) components,
        // same integer dots, same paired rank/top-k-sum windows, same
        // positive-operand integer division. The dot is an explicit
        // BIGINT product-sum comprehension — list_dot_product
        // accumulates in FLOAT and drifts at this magnitude, and a
        // bare `x * 1000000.0` lambda multiplies in FLOAT too (the
        // DECIMAL literal coerces down); CAST(x AS DOUBLE) first.
        """WITH s AS (SELECT vec_id AS sid,
          |    [CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
          |     for x in embedding] AS sv
          |  FROM embeddings WHERE vec_id % 2 = 0),
          |tg AS (SELECT vec_id AS tid,
          |    [CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
          |     for x in embedding] AS tv
          |  FROM embeddings WHERE vec_id % 2 = 1),
          |scored AS (SELECT sid, tid,
          |    CAST(list_sum([sv[i] * tv[i]
          |                   for i in range(1, len(sv) + 1)]) AS BIGINT) AS d
          |  FROM s, tg),
          |r AS (SELECT sid, tid, d,
          |    row_number() OVER (PARTITION BY sid ORDER BY d DESC, tid) AS frank,
          |    row_number() OVER (PARTITION BY tid ORDER BY d DESC, sid) AS brank
          |  FROM scored),
          |w AS (SELECT *,
          |    sum(CASE WHEN frank <= 8 THEN d END) OVER (PARTITION BY sid) AS fsum,
          |    sum(CASE WHEN brank <= 8 THEN d END) OVER (PARTITION BY tid) AS bsum
          |  FROM r)
          |SELECT sid, tid, d,
          |  CAST((2000 * 8 * d) // (fsum + bsum) AS BIGINT) AS margin_permille
          |FROM w
          |WHERE frank = 1 AND brank = 1 AND d > 0 AND fsum + bsum > 0
          |ORDER BY sid""".stripMargin,

      "x_stream_drift" -> {
        // per-category conditional counts replayed per window; χ² terms
        // in sorted category order (.sorted here = the operator's sorted
        // fold — the literal being alphabetical today must not be load-
        // bearing), 0.0-seeded left fold (0.0 + t is IEEE-exact) —
        // bit-identical to the streamed aggregate() fold. rn sums the
        // TAXONOMY counts, exactly like the operator's refN (count(*)
        // would silently diverge on a fixture with an extra event type).
        // Append-mode cutoff: a window emits only once the watermark
        // (max ts, zero delay) passes its end.
        val cats = driftTaxonomy.sorted
        val os = cats.zipWithIndex.map { case (c, i) =>
          s"CAST(sum(CASE WHEN event_type = '$c' THEN 1 ELSE 0 END) AS BIGINT) AS o_$i"
        }.mkString(",\n  ")
        val refs = cats.zipWithIndex.map { case (c, i) =>
          s"CAST(sum(CASE WHEN event_type = '$c' THEN 1 ELSE 0 END) AS BIGINT) AS r_$i"
        }.mkString(",\n  ")
        val terms = cats.indices.map { i =>
          val e = s"((CAST(w.n_events AS DOUBLE) * CAST(r.r_$i AS DOUBLE)) / CAST(r.rn AS DOUBLE))"
          s"(((CAST(w.o_$i AS DOUBLE) - $e) * (CAST(w.o_$i AS DOUBLE) - $e)) / $e)"
        }.mkString("0.0 + ", " + ", "")
        val rnSum = cats.indices.map(i => s"r_$i").mkString(" + ")
        s"""WITH ref0 AS (SELECT
           |  $refs
           |  FROM events),
           |ref AS (SELECT *, $rnSum AS rn FROM ref0),
           |wc AS (SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
           |  count(*) AS n_events,
           |  $os
           |  FROM events GROUP BY 1),
           |mx AS (SELECT epoch_ms(max(ts)) AS mts FROM events)
           |SELECT w.window_start_ms, w.n_events,
           |  $terms AS chi2
           |FROM wc w CROSS JOIN ref r CROSS JOIN mx
           |WHERE w.window_start_ms + 3600000 <= mx.mts
           |ORDER BY w.window_start_ms""".stripMargin
      },

      "x_stream_exactdedup" ->
        """SELECT DISTINCT sha256(text) AS text_hash FROM documents
          |WHERE text IS NOT NULL ORDER BY text_hash""".stripMargin,

      "x_stream_heavyhitters" ->
        // exact-regime replay (capacity > distinct items): per-window
        // exact counts, (count desc, item asc) rank, top 5; append-mode
        // cutoff from max(ts) exactly like the drift oracle
        """WITH wc AS (
          |  SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
          |         CAST(user_id AS VARCHAR) AS item,
          |         CAST(count(*) AS BIGINT) AS est_count
          |  FROM events GROUP BY 1, 2),
          |mx AS (SELECT epoch_ms(max(ts)) AS mts FROM events),
          |ranked AS (
          |  SELECT window_start_ms, item, est_count,
          |         CAST(row_number() OVER (PARTITION BY window_start_ms
          |           ORDER BY est_count DESC, item) AS INT) AS rank
          |  FROM wc)
          |SELECT window_start_ms, item, est_count, rank
          |FROM ranked CROSS JOIN mx
          |WHERE rank <= 5 AND window_start_ms + 3600000 <= mts
          |ORDER BY window_start_ms, rank""".stripMargin,

      "x_export_manifest" ->
        """WITH h AS (SELECT doc_id, text,
          |             md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents),
          |sh AS (SELECT doc_id, text,
          |         ('0x' || substr(hx, 1, 15))::BIGINT % 8 AS shard FROM h),
          |c AS (SELECT shard,
          |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || text), 1, 15))::BIGINT
          |          % 1000000007 AS hv,
          |        len(string_split(text, ' ')) AS ntok,
          |        length(text) AS nch
          |      FROM sh)
          |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
          |  CAST(sum(nch) AS BIGINT) AS n_chars,
          |  CAST(sum(hv) % 1000000007 AS BIGINT) AS checksum
          |FROM c GROUP BY shard ORDER BY shard""".stripMargin)
}
