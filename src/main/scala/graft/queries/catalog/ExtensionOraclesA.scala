package graft.queries


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.{HostedTables, Tables}
import graft.core.{Chunker, ServiceName, WriteMode}
import graft.operators.{Calibration, Cdc, Curation, Dedup, Embeddings, GraphOps, HtmlText, Multimodal, Profiling, Regression, Scale, Similarity, Sketches, TextAnalysis}
import graft.sinks.HostedStore
import graft.streaming.EventStreams

/** DuckDB oracles for the extension queries, part A.
  *
  * Part of the QueryCatalog split (r12): entries are verbatim from the
  * pre-split catalog; shared fixtures/SQL builders live in
  * [[CatalogHelpers]]; [[QueryCatalog]] assembles the public maps.
  */
private[queries] object ExtensionOraclesA {
  import CatalogHelpers._

  val entries: Map[String, String] = Map(
      "x_sim_ivf" -> ivfReplaySql(nlist = 16, nprobe = 4, k = 10,
        queryPred = "vec_id < 5"),

      "x_knn_graph" -> ivfReplaySql(nlist = 64, nprobe = 8, k = 5,
        queryPred = "TRUE"),

      "x_hard_negatives" ->
        // positive = rank-1 edge; hard negative = min-rank edge among
        // rank >= 2 with cos below the duplicate threshold — rank picks
        // are unique, so the window replay equals Spark's struct-min
        s"""WITH ${ivfKnnCtes(nlist = 64, nprobe = 8, k = 5,
             queryPred = "TRUE")},
           |p AS (SELECT qid, id AS positive, cos AS pos_cos
           |        FROM knn WHERE rank = 1),
           |neg AS (SELECT qid, id AS negative, cos AS neg_cos FROM (
           |  SELECT qid, id, cos,
           |         row_number() OVER (PARTITION BY qid ORDER BY rank) AS rn
           |  FROM knn WHERE rank >= 2 AND cos < 0.9) WHERE rn = 1)
           |SELECT p.qid AS anchor, p.positive, p.pos_cos,
           |       n.negative, n.neg_cos
           |FROM p JOIN neg n ON n.qid = p.qid ORDER BY anchor""".stripMargin,

      "x_graph_triangles" ->
        // compact-forward replay over the same kNN CTEs: canonical
        // undirected edges, (deg, id) orientation via the identical
        // CASE, wedge join ordered by (dd, dst), closing-edge lookup,
        // per-corner explode — all integer joins both engines compute
        // identically
        s"""WITH ${ivfKnnCtes(nlist = 64, nprobe = 8, k = 5,
             queryPred = "TRUE")},
           |und AS (SELECT DISTINCT least(qid, id) AS a,
           |               greatest(qid, id) AS b
           |        FROM knn WHERE qid <> id),
           |deg AS (SELECT node, count(*) AS deg FROM (
           |    SELECT a AS node FROM und
           |    UNION ALL SELECT b FROM und) GROUP BY node),
           |o AS (SELECT CASE WHEN db.deg < da.deg THEN u.b ELSE u.a END AS src,
           |             CASE WHEN db.deg < da.deg THEN u.a ELSE u.b END AS dst,
           |             CASE WHEN db.deg < da.deg THEN da.deg ELSE db.deg END AS dd
           |      FROM und u
           |      JOIN deg da ON da.node = u.a
           |      JOIN deg db ON db.node = u.b),
           |wedge AS (SELECT e1.src, e1.dst AS v, e2.dst AS wn
           |          FROM o e1 JOIN o e2 ON e2.src = e1.src
           |          WHERE e1.dd < e2.dd
           |             OR (e1.dd = e2.dd AND e1.dst < e2.dst)),
           |tri AS (SELECT wg.src AS u, wg.v, wg.wn
           |        FROM wedge wg JOIN o e3
           |          ON e3.src = wg.v AND e3.dst = wg.wn),
           |tcnt AS (SELECT node, count(*) AS t FROM (
           |    SELECT u AS node FROM tri
           |    UNION ALL SELECT v FROM tri
           |    UNION ALL SELECT wn FROM tri) GROUP BY node)
           |SELECT d.node, CAST(d.deg AS BIGINT) AS degree,
           |  CAST(coalesce(t.t, 0) AS BIGINT) AS n_triangles,
           |  CAST(CASE WHEN d.deg >= 2 THEN
           |      2 * coalesce(t.t, 0) * 10000 // (d.deg * (d.deg - 1))
           |    ELSE 0 END AS BIGINT) AS clustering_pctx100
           |FROM deg d LEFT JOIN tcnt t ON t.node = d.node
           |ORDER BY d.node""".stripMargin,

      "x_graph_pagerank" -> {
        // fixed-iteration power steps as chained CTEs; per-node in-flow
        // folded in source-id order (list_reduce ≡ aggregate/sort_array);
        // (1−d) and d interpolated from the SAME Scala doubles the
        // operator bakes (1.0 − 0.85 ≠ the literal 0.15 in IEEE!)
        val d = 0.85
        val iters = 3
        val prCtes = (1 to iters).map { i =>
          val prev = if (i == 1) "pr0" else s"pr${i - 1}"
          s"""pr$i AS (
             |  SELECT nd.node,
             |    CAST(${1.0 - d} AS DOUBLE) / (SELECT n FROM nn)
             |      + $d * coalesce(f.fold, CAST(0.0 AS DOUBLE)) AS pr
             |  FROM gnodes nd LEFT JOIN (
             |    SELECT e.dst,
             |      list_reduce(list(p.pr / o.odeg ORDER BY e.src), (a, b) -> a + b) AS fold
             |    FROM gedges e JOIN $prev p ON p.node = e.src
             |    JOIN godeg o ON o.src = e.src
             |    GROUP BY e.dst) f ON f.dst = nd.node)""".stripMargin
        }.mkString(",\n")
        s"""WITH ${ivfKnnCtes(nlist = 64, nprobe = 8, k = 5, queryPred = "TRUE")},
           |gedges AS (SELECT qid AS src, id AS dst FROM knn),
           |gnodes AS (SELECT src AS node FROM gedges
           |           UNION SELECT dst FROM gedges),
           |nn AS (SELECT count(*) AS n FROM gnodes),
           |godeg AS (SELECT src, count(*) AS odeg FROM gedges GROUP BY src),
           |pr0 AS (SELECT node,
           |          CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS pr FROM gnodes),
           |$prCtes
           |SELECT node AS vec_id, pr FROM pr$iters ORDER BY vec_id""".stripMargin
      },

      "x_knn_components" ->
        s"""WITH RECURSIVE ${ivfKnnCtes(nlist = 64, nprobe = 8, k = 5,
             queryPred = "TRUE")},
           |mutual AS (SELECT k1.qid AS a, k1.id AS b
           |             FROM knn k1 JOIN knn k2
           |               ON k2.qid = k1.id AND k2.id = k1.qid
           |            WHERE k1.qid < k1.id),
           |edges AS (SELECT a AS src, b AS dst FROM mutual
           |          UNION SELECT b, a FROM mutual),
           |reach AS (
           |  SELECT DISTINCT src AS node, src AS label FROM edges
           |  UNION
           |  SELECT e2.dst, r.label FROM reach r JOIN edges e2 ON e2.src = r.node),
           |lab AS (SELECT node AS vec_id, min(label) AS cluster_id
           |          FROM reach GROUP BY node),
           |csizes AS (SELECT cluster_id, count(*) AS n_members
           |             FROM lab GROUP BY cluster_id)
           |SELECT l.vec_id, l.cluster_id, s.n_members,
           |       l.vec_id = l.cluster_id AS keep
           |FROM lab l JOIN csizes s USING (cluster_id)
           |ORDER BY l.vec_id""".stripMargin,

      "x_dedup_exact" ->
        """WITH all_docs AS (
          |  SELECT doc_id, text FROM documents
          |  UNION ALL SELECT doc_id + 100000, text FROM documents)
          |SELECT min(doc_id) AS doc_id, count(*) AS n_copies
          |FROM all_docs GROUP BY text ORDER BY doc_id""".stripMargin,

      "x_exact_quantiles" ->
        """WITH v AS (SELECT lang, len(string_split(text, ' ')) AS v FROM documents),
          |c AS (SELECT lang, v, count(*) AS cnt FROM v GROUP BY 1, 2),
          |cum AS (SELECT lang, v,
          |          CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY v) AS BIGINT) AS cum,
          |          CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
          |        FROM c),
          |q AS (SELECT * FROM (VALUES ('p25', 1, 4), ('p50', 1, 2),
          |                            ('p75', 3, 4), ('p95', 19, 20)) t(label, num, den))
          |SELECT cum.lang, q.label AS q_label, min(cum.v) AS q_value,
          |       max(cum.n) AS n_rows
          |FROM cum CROSS JOIN q
          |WHERE cum.cum >= (q.num * cum.n + q.den - 1) // q.den
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "x_weighted_sample" ->
        """WITH c AS (
          |  SELECT doc_id, n_chars,
          |    CAST(coalesce(sum(n_chars) OVER (ORDER BY doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          |      AS cum_before
          |  FROM documents)
          |SELECT doc_id, n_chars, cum_before,
          |  ((cum_before + n_chars + 4999) // 5000)
          |    - ((cum_before + 4999) // 5000) AS n_picks
          |FROM c
          |WHERE ((cum_before + n_chars + 4999) // 5000)
          |    - ((cum_before + 4999) // 5000) >= 1
          |ORDER BY doc_id""".stripMargin,

      "x_profile_columns" -> {
        val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
        cols.map { c =>
          s"""SELECT '$c' AS col_name, count(*) AS n_rows,
             |  count(*) - count($c) AS n_null,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  min(CAST($c AS VARCHAR)) AS min_repr,
             |  max(CAST($c AS VARCHAR)) AS max_repr
             |FROM documents""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      },

      "x_graph_labelprop" -> {
        // symmetrize the kNN edges (+ one self-vote edge per node — the
        // oscillation damper), then 4 unrolled synchronous rounds; the
        // plurality pick is (count DESC, label ASC) — row_number here,
        // the lexicographic min(struct(-count, label)) on the Spark side
        val rounds = 4
        val lpCtes = (1 to rounds).map { i =>
          val prev = s"lp${i - 1}"
          s"""lp$i AS (
             |  SELECT p.node, coalesce(w.label, p.label) AS label
             |  FROM $prev p LEFT JOIN (
             |    SELECT dst, label FROM (
             |      SELECT e.dst, p2.label,
             |             row_number() OVER (PARTITION BY e.dst
             |               ORDER BY count(*) DESC, p2.label) AS rn
             |      FROM gvote e JOIN $prev p2 ON p2.node = e.src
             |      GROUP BY e.dst, p2.label) WHERE rn = 1) w
             |    ON w.dst = p.node)""".stripMargin
        }.mkString(",\n")
        s"""WITH ${ivfKnnCtes(nlist = 64, nprobe = 8, k = 5, queryPred = "TRUE")},
           |gdir AS (SELECT qid AS src, id AS dst FROM knn),
           |gsym AS (SELECT DISTINCT src, dst FROM (
           |  SELECT src, dst FROM gdir
           |  UNION ALL SELECT dst, src FROM gdir) WHERE src <> dst),
           |gnodes AS (SELECT DISTINCT src AS node FROM gsym),
           |gvote AS (SELECT src, dst FROM gsym
           |          UNION ALL SELECT node, node FROM gnodes),
           |lp0 AS (SELECT node, node AS label FROM gnodes),
           |$lpCtes
           |SELECT node AS vec_id, label AS community
           |FROM lp$rounds ORDER BY vec_id""".stripMargin
      },

      "x_spatial_neighbors" ->
        """WITH pts AS (
          |  SELECT c_custkey AS id, c_acctbal AS x,
          |         CAST(c_custkey AS DOUBLE) * CAST(0.5 AS DOUBLE) AS y
          |  FROM customer)
          |SELECT p.id AS a, r.id AS b,
          |       (p.x - r.x) * (p.x - r.x) + (p.y - r.y) * (p.y - r.y) AS dist2
          |FROM pts p JOIN pts r ON p.id < r.id
          |WHERE (p.x - r.x) * (p.x - r.x) + (p.y - r.y) * (p.y - r.y) <= 2500.0
          |ORDER BY a, b""".stripMargin,

      "x_spatial_dbscan" ->
        // the full DBSCAN replay: brute-force eps-pairs (same IEEE
        // arithmetic as x_spatial_neighbors), degree screen (>= minPts
        // incl. self), recursive min-label components over core-core
        // edges (the x_pipeline_multimodal CC shape), min-label border
        // attach, NULL-labeled noise
        """WITH RECURSIVE pts AS (
          |  SELECT c_custkey AS id, c_acctbal AS x,
          |         CAST(c_custkey AS DOUBLE) * CAST(0.5 AS DOUBLE) AS y
          |  FROM customer),
          |np AS (SELECT p.id AS a, r.id AS b
          |       FROM pts p JOIN pts r ON p.id < r.id
          |       WHERE (p.x - r.x) * (p.x - r.x) +
          |             (p.y - r.y) * (p.y - r.y) <= 2500.0),
          |deg AS (SELECT id, count(*) AS n FROM
          |          (SELECT a AS id FROM np UNION ALL SELECT b FROM np)
          |        GROUP BY id),
          |core AS (SELECT id FROM deg WHERE n + 1 >= 3),
          |ce AS (SELECT np.a, np.b FROM np
          |       JOIN core ca ON ca.id = np.a
          |       JOIN core cb ON cb.id = np.b),
          |edges AS (SELECT a AS src, b AS dst FROM ce
          |          UNION SELECT b, a FROM ce),
          |reach AS (
          |  SELECT DISTINCT src AS node, src AS label FROM edges
          |  UNION
          |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node),
          |lab AS (SELECT node, min(label) AS label FROM reach GROUP BY node),
          |corelab AS (SELECT c.id, coalesce(l.label, c.id) AS label
          |            FROM core c LEFT JOIN lab l ON l.node = c.id),
          |adj AS (SELECT a AS cid, b AS id FROM np
          |        UNION ALL SELECT b, a FROM np),
          |border AS (SELECT adj.id, min(cl.label) AS label
          |           FROM adj JOIN corelab cl ON cl.id = adj.cid
          |           WHERE adj.id NOT IN (SELECT id FROM core)
          |           GROUP BY adj.id)
          |SELECT p.id AS c_custkey,
          |  coalesce(cl.label, b.label) AS label,
          |  CASE WHEN cl.id IS NOT NULL THEN 'core'
          |       WHEN b.id IS NOT NULL THEN 'border'
          |       ELSE 'noise' END AS role
          |FROM pts p
          |LEFT JOIN corelab cl ON cl.id = p.id
          |LEFT JOIN border b ON b.id = p.id
          |ORDER BY c_custkey""".stripMargin,

      "x_spatial_join" ->
        """WITH cpts AS (
          |  SELECT c_custkey AS id, c_acctbal AS x,
          |         CAST(c_custkey AS DOUBLE) * CAST(0.5 AS DOUBLE) AS y
          |  FROM customer),
          |spts AS (
          |  SELECT s_suppkey AS id, s_acctbal AS x,
          |         CAST(s_suppkey AS DOUBLE) * CAST(0.5 AS DOUBLE) AS y
          |  FROM supplier)
          |SELECT c.id AS a, s.id AS b,
          |       (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) AS dist2
          |FROM cpts c JOIN spts s
          |  ON (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) <= 2500.0
          |ORDER BY a, b""".stripMargin,

      "x_spatial_nearest" ->
        // left-join nearest replay: rank candidate pairs by (dist2, b)
        // per customer — IEEE-double comparisons, both engines pick the
        // identical row — then attach rank-1 to EVERY customer id
        """WITH cpts AS (
          |  SELECT c_custkey AS id, c_acctbal AS x,
          |         CAST(c_custkey AS DOUBLE) * CAST(0.5 AS DOUBLE) AS y
          |  FROM customer),
          |spts AS (
          |  SELECT s_suppkey AS id, s_acctbal AS x,
          |         CAST(s_suppkey AS DOUBLE) * CAST(0.5 AS DOUBLE) AS y
          |  FROM supplier),
          |cand AS (
          |  SELECT c.id AS a, s.id AS b,
          |         (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) AS dist2
          |  FROM cpts c JOIN spts s
          |    ON (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) <= 2500.0),
          |best AS (SELECT a, b, dist2 FROM (
          |  SELECT a, b, dist2,
          |         row_number() OVER (PARTITION BY a ORDER BY dist2, b) AS rn
          |  FROM cand) WHERE rn = 1)
          |SELECT c.id AS a, best.b, best.dist2
          |FROM cpts c LEFT JOIN best ON best.a = c.id
          |ORDER BY a""".stripMargin,

      "x_spatial_nn" ->
        // unbounded-nearest replay: rank the FULL cross product by
        // (dist2, b) per customer — same fixed-order IEEE dist2 — and
        // attach rank-1 to every customer id (no eps filter; NULL only
        // if the supplier side were empty)
        """WITH cpts AS (
          |  SELECT c_custkey AS id, c_acctbal AS x,
          |         CAST(c_custkey AS DOUBLE) * CAST(0.5 AS DOUBLE) AS y
          |  FROM customer),
          |spts AS (
          |  SELECT s_suppkey AS id, s_acctbal AS x,
          |         CAST(s_suppkey AS DOUBLE) * CAST(0.5 AS DOUBLE) AS y
          |  FROM supplier),
          |cand AS (
          |  SELECT c.id AS a, s.id AS b,
          |         (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) AS dist2
          |  FROM cpts c CROSS JOIN spts s),
          |best AS (SELECT a, b, dist2 FROM (
          |  SELECT a, b, dist2,
          |         row_number() OVER (PARTITION BY a ORDER BY dist2, b) AS rn
          |  FROM cand) WHERE rn = 1)
          |SELECT c.id AS a, best.b, best.dist2
          |FROM cpts c LEFT JOIN best ON best.a = c.id
          |ORDER BY a""".stripMargin,

      "x_spatial_knn" ->
        // rank-≤3 replay over the full cross product, same fixed-order
        // IEEE dist2, ties by (dist2, b) — the ladder's candidate
        // search must never change the ranked answer
        """WITH cpts AS (
          |  SELECT c_custkey AS id, c_acctbal AS x,
          |         CAST(c_custkey AS DOUBLE) * CAST(0.5 AS DOUBLE) AS y
          |  FROM customer),
          |spts AS (
          |  SELECT s_suppkey AS id, s_acctbal AS x,
          |         CAST(s_suppkey AS DOUBLE) * CAST(0.5 AS DOUBLE) AS y
          |  FROM supplier),
          |cand AS (
          |  SELECT c.id AS a, s.id AS b,
          |         (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) AS dist2
          |  FROM cpts c CROSS JOIN spts s),
          |best AS (SELECT a, b, dist2, rn FROM (
          |  SELECT a, b, dist2,
          |         row_number() OVER (PARTITION BY a ORDER BY dist2, b) AS rn
          |  FROM cand) WHERE rn <= 3)
          |SELECT c.id AS a, best.b, best.dist2, best.rn AS rank
          |FROM cpts c LEFT JOIN best ON best.a = c.id
          |ORDER BY a, rank""".stripMargin,

      "x_spatial_prunestats" ->
        // the census replay from the staged spatial layout alone: hive
        // bucket as the unit label (CAST both sides — Spark infers the
        // partition column INT, DuckDB may type it VARCHAR), min/max
        // zone maps on x and y, bbox-disjointness flags
        s"""WITH r AS (SELECT x, y, CAST(zb AS BIGINT) AS file
           |  FROM read_parquet('$spatialLayoutDir/*/*.parquet',
           |                    hive_partitioning = true))
           |SELECT file, CAST(count(*) AS BIGINT) AS n_rows,
           |  min(x) AS min_x, max(x) AS max_x,
           |  min(y) AS min_y, max(y) AS max_y,
           |  CAST(CASE WHEN max(x) < 0 OR min(x) > 2000
           |       THEN 1 ELSE 0 END AS INTEGER) AS prune_x,
           |  CAST(CASE WHEN max(y) < 100 OR min(y) > 400
           |       THEN 1 ELSE 0 END AS INTEGER) AS prune_y
           |FROM r GROUP BY file ORDER BY file""".stripMargin,

      "x_spatial_zorder_scan" ->
        // layout-neutrality gate: the bbox selection recomputed from the
        // BASE table (x = acctbal, y = key·0.5 — the shared layer
        // formula) must hash-match the scan over the persisted z layout
        """WITH pts AS (
          |  SELECT c_custkey, c_acctbal AS x,
          |         CAST(c_custkey AS DOUBLE) * CAST(0.5 AS DOUBLE) AS y
          |  FROM customer)
          |SELECT c_custkey, x, y FROM pts
          |WHERE x >= 0 AND x <= 2000 AND y >= 100 AND y <= 400
          |ORDER BY c_custkey""".stripMargin,

      "x_spatial_dropped" ->
        // the census replay: home-cell occupancy over the SAME floor(x/eps)
        // grid arithmetic, cells over the cap only
        """WITH pts AS (
          |  SELECT c_custkey AS id, c_acctbal AS x,
          |         CAST(c_custkey AS DOUBLE) * CAST(0.5 AS DOUBLE) AS y
          |  FROM customer)
          |SELECT CAST(floor(x / 500.0) AS BIGINT) AS cellx,
          |       CAST(floor(y / 500.0) AS BIGINT) AS celly,
          |       CAST(count(*) AS BIGINT) AS cell_size
          |FROM pts
          |GROUP BY 1, 2
          |HAVING count(*) > 25
          |ORDER BY cellx, celly""".stripMargin,

      "x_dedup_jaccard" ->
        s"""WITH ${jaccardPairsSql(Some(jaccardFreqCap))}
           |SELECT a, b, n_common, n_a, n_b, jaccard FROM jac
           |WHERE jaccard >= 0.6 ORDER BY a, b""".stripMargin,

      "x_dedup_clip" ->
        """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          |pe AS (SELECT doc_id,
          |         unnest([{'pos': i, 'sh': array_to_string(w[i:i+7], ' ')}
          |                 for i in range(1, len(w) - 6)]) AS e
          |       FROM words WHERE len(w) >= 8),
          |ps AS (SELECT doc_id, e.pos AS pos, e.sh AS shingle FROM pe),
          |dup AS (SELECT shingle FROM ps GROUP BY shingle
          |        HAVING count(DISTINCT doc_id) >= 2),
          |m AS (SELECT p.doc_id, p.pos FROM ps p JOIN dup USING (shingle)),
          |s AS (SELECT doc_id, pos,
          |        CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) = 1
          |             THEN 0 ELSE 1 END AS brk FROM m),
          |g AS (SELECT doc_id, pos,
          |        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id FROM s),
          |sp0 AS (SELECT doc_id, min(pos) AS ss, max(pos) + 7 AS se
          |        FROM g GROUP BY doc_id, span_id),
          |sp AS (SELECT doc_id, list(struct_pack(s := ss, e := se)) AS spans
          |       FROM sp0 GROUP BY doc_id),
          |cl AS (SELECT w.doc_id,
          |         [w.w[i] for i in range(1, len(w.w) + 1)
          |          if len(list_filter(coalesce(sp.spans, []),
          |                             x -> i >= x.s AND i <= x.e)) = 0] AS kept,
          |         len(w.w) AS n
          |       FROM words w LEFT JOIN sp USING (doc_id))
          |SELECT doc_id,
          |       coalesce(array_to_string(kept, ' '), '') AS text_clipped,
          |       CAST(n - len(kept) AS BIGINT) AS n_tokens_removed
          |FROM cl ORDER BY doc_id""".stripMargin,

      "x_decontam_bloom" ->
        // full Bloom replay: rebuild the reference bitset's position set
        // from the same md5 double-hash family, then a candidate shingle
        // "might contain" iff ALL 7 of its positions are present —
        // false positives reproduce exactly, so the probabilistic filter
        // hash-verifies
        s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           |sh8 AS (SELECT doc_id,
           |          unnest(list_distinct([array_to_string(w[i:i+7], ' ')
           |                                for i in range(1, len(w) - 6)])) AS shingle
           |          FROM words),
           |refh AS (SELECT DISTINCT
           |    ('0x' || substr(md5(shingle), 1, 15))::BIGINT % $lshP AS h1m,
           |    ('0x' || substr(md5(shingle), 17, 15))::BIGINT % $lshP AS h2m
           |  FROM sh8 WHERE doc_id % 7 = 0),
           |refpos AS (SELECT DISTINCT (h1m + i * h2m) % $lshP % ${1 << 20} AS b
           |           FROM refh, UNNEST(range(1, 8)) AS u(i)),
           |candh AS (SELECT DISTINCT doc_id, shingle,
           |    ('0x' || substr(md5(shingle), 1, 15))::BIGINT % $lshP AS h1m,
           |    ('0x' || substr(md5(shingle), 17, 15))::BIGINT % $lshP AS h2m
           |  FROM sh8 WHERE doc_id % 7 <> 0),
           |cpos AS (SELECT doc_id, shingle,
           |           (h1m + i * h2m) % $lshP % ${1 << 20} AS b
           |         FROM candh, UNNEST(range(1, 8)) AS u(i)),
           |found AS (SELECT c.doc_id, c.shingle, count(r.b) AS nf
           |          FROM cpos c LEFT JOIN refpos r ON r.b = c.b
           |          GROUP BY 1, 2),
           |flagged AS (SELECT DISTINCT doc_id FROM found WHERE nf = 7)
           |SELECT d.doc_id, d.lang, d.source FROM documents d
           |WHERE d.doc_id % 7 <> 0
           |  AND d.doc_id NOT IN (SELECT doc_id FROM flagged)
           |ORDER BY d.doc_id""".stripMargin,

      "x_corpus_overlap" ->
        s"""WITH words AS (SELECT source, string_split(text, ' ') AS w FROM documents),
           |sh0 AS (SELECT source,
           |          unnest([array_to_string(w[i:i+2], ' ')
           |                  for i in range(1, len(w) - 1)]) AS shingle
           |          FROM words),
           |shd AS (SELECT DISTINCT source, shingle FROM sh0),
           |shh AS (SELECT source,
           |  ('0x' || substr(md5(shingle), 1, 15))::BIGINT % $lshP AS h1m,
           |  ('0x' || substr(md5(shingle), 17, 15))::BIGINT % $lshP AS h2m
           |  FROM shd),
           |srcs AS (SELECT DISTINCT source FROM documents),
           |sig AS (SELECT source, $lshSigSql FROM shh GROUP BY source),
           |sizes AS (SELECT source, count(*) AS n_sh FROM shd GROUP BY source),
           |common AS (SELECT a.source AS a, b.source AS b, count(*) AS n_common
           |             FROM shd a JOIN shd b
           |               ON a.shingle = b.shingle AND a.source < b.source
           |             GROUP BY 1, 2)
           |-- pairs enumerate from the full group list (LEFT JOINs): a
           |-- group whose docs are all too short to shingle still rows
           |-- out with n_sh 0 / 0 matches instead of vanishing
           |SELECT a.source AS a, b.source AS b,
           |  CAST($lshNumHashes AS BIGINT) AS n_hashes,
           |  CAST($overlapMatchSql AS BIGINT) AS n_matches,
           |  CAST(coalesce(za.n_sh, 0) AS BIGINT) AS n_sh_a,
           |  CAST(coalesce(zb.n_sh, 0) AS BIGINT) AS n_sh_b,
           |  CAST(coalesce(c.n_common, 0) AS BIGINT) AS n_common
           |FROM srcs a JOIN srcs b ON a.source < b.source
           |LEFT JOIN sig sa ON sa.source = a.source
           |LEFT JOIN sig sb ON sb.source = b.source
           |LEFT JOIN sizes za ON za.source = a.source
           |LEFT JOIN sizes zb ON zb.source = b.source
           |LEFT JOIN common c ON c.a = a.source AND c.b = b.source
           |ORDER BY a, b""".stripMargin,

      "x_dedup_editdist" ->
        s"""WITH $shinglesSql,
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
           |SELECT c.a, c.b,
           |       CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_distance
           |FROM cand c
           |JOIN documents da ON da.doc_id = c.a
           |JOIN documents db ON db.doc_id = c.b
           |WHERE levenshtein(da.text, db.text) * 1000
           |      <= 300 * greatest(length(da.text), length(db.text))
           |ORDER BY c.a, c.b""".stripMargin,

      "x_dedup_sig_persisted" -> sigPersistedOracle,

      "x_stream_sigdedup" -> sigPersistedOracle,

      "x_dedup_sig_report" ->
        s"""WITH sgf AS (SELECT doc_id, sig, filename
           |  FROM read_parquet('@@ANNDIR|$sigLifeDir|sigs@@/*/*.parquet', filename = true))
           |SELECT CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(count(DISTINCT filename) AS BIGINT) AS n_files,
           |  CAST(min(len(sig)) AS BIGINT) AS sig_width_min,
           |  CAST(max(len(sig)) AS BIGINT) AS sig_width_max,
           |  (SELECT CAST(count(*) AS BIGINT)
           |   FROM read_parquet('$sigLifeDir/tombstones/*.parquet'))
           |    AS n_tombstones
           |FROM sgf""".stripMargin,

      "x_dedup_sig_appended" -> sigServeOracle(
        s"""SELECT doc_id, sig
           |         FROM read_parquet('@@ANNDIR|$sigLifeDir|sigs@@/*/*.parquet')""".stripMargin),

      "x_dedup_sig_deleted" -> sigServeOracle(
        s"""SELECT doc_id, sig
           |         FROM read_parquet('@@ANNDIR|$sigLifeDir|sigs@@/*/*.parquet')
           |         WHERE doc_id NOT IN (SELECT doc_id
           |           FROM read_parquet('$sigLifeDir/tombstones/*.parquet'))""".stripMargin),

      "x_dedup_sig_compacted" -> sigServeOracle(
        // the compacted registry is read AS-IS through the version
        // POINTER (the compact publishes sigs__v<N>; the plain sigs/
        // path is the retained previous version) — the fold already
        // removed the tombstoned docs, so a bare scan of the published
        // parquet must serve exactly what the sidecar-suppressed
        // lifecycle serves
        s"""SELECT doc_id, sig
           |         FROM read_parquet('@@ANNDIR|$sigCmpDir|sigs@@/*/*.parquet')""".stripMargin),

      "x_dedup_incremental" ->
        s"""WITH ${jaccardPairsSql(None)},
           |$lshBaseSql,
           |sig AS (SELECT doc_id, $lshSigSql FROM shh GROUP BY doc_id),
           |bands_all AS (
           |  $lshBandsSql),
           |batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
           |corp AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
           |hitc_exact AS (SELECT DISTINCT b.doc_id FROM batch b
           |               JOIN corp c ON md5(b.text) = md5(c.text)),
           |bat_bands AS (SELECT ba.doc_id, ba.band, ba.key
           |                FROM bands_all ba JOIN batch USING (doc_id)),
           |bat_ok AS (SELECT band, key FROM bat_bands
           |           GROUP BY band, key HAVING count(*) <= $lshBucketCap),
           |bat_bands_ok AS (SELECT bb.doc_id, bb.band, bb.key
           |                   FROM bat_bands bb JOIN bat_ok USING (band, key)),
           |corp_bands AS (SELECT ba.doc_id, ba.band, ba.key
           |                 FROM bands_all ba JOIN corp USING (doc_id)),
           |cross_cand AS (SELECT DISTINCT cb.doc_id AS cand_id, rb.doc_id AS ref_id
           |                 FROM corp_bands cb JOIN bat_bands_ok rb
           |                   ON cb.band = rb.band AND cb.key = rb.key),
           |hitc_near AS (SELECT DISTINCT cc.ref_id AS doc_id
           |                FROM cross_cand cc
           |                JOIN jac j ON j.a = least(cc.cand_id, cc.ref_id)
           |                          AND j.b = greatest(cc.cand_id, cc.ref_id)
           |               WHERE j.jaccard >= 0.7),
           |hitc AS (SELECT doc_id FROM hitc_exact
           |         UNION SELECT doc_id FROM hitc_near),
           |intra_cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
           |                 FROM bat_bands_ok l JOIN bat_bands_ok r
           |                   ON l.band = r.band AND l.key = r.key
           |                  AND l.doc_id < r.doc_id),
           |intra_near AS (SELECT DISTINCT c.b AS doc_id
           |                 FROM intra_cand c JOIN jac j ON j.a = c.a AND j.b = c.b
           |                WHERE j.jaccard >= 0.7),
           |intra_exact AS (SELECT doc_id FROM (
           |                  SELECT doc_id,
           |                         min(doc_id) OVER (PARTITION BY md5(text)) AS lo
           |                  FROM batch) WHERE doc_id <> lo),
           |intra AS (SELECT doc_id FROM intra_near
           |          UNION SELECT doc_id FROM intra_exact)
           |SELECT b.doc_id,
           |       b.doc_id IN (SELECT doc_id FROM hitc) AS dup_of_corpus,
           |       b.doc_id IN (SELECT doc_id FROM intra) AS dup_in_batch,
           |       NOT (b.doc_id IN (SELECT doc_id FROM hitc)
           |            OR b.doc_id IN (SELECT doc_id FROM intra)) AS keep
           |FROM batch b ORDER BY b.doc_id""".stripMargin,

      "x_dedup_containment" ->
        s"""WITH ${jaccardPairsSql(Some(jaccardFreqCap))}
           |SELECT a, b, n_common, n_a, n_b,
           |       n_common / least(n_a, n_b) AS containment
           |FROM jac WHERE n_common / least(n_a, n_b) >= 0.8
           |ORDER BY a, b""".stripMargin,

      "x_cluster_assign" ->
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
           |           FROM qn v CROSS JOIN cents c)
           |SELECT vec_id, cid AS cell FROM (
           |  SELECT vec_id, cid,
           |         row_number() OVER (PARTITION BY vec_id
           |                            ORDER BY score DESC, cid) AS rn
           |  FROM scored) WHERE rn = 1
           |ORDER BY vec_id""".stripMargin,

      "x_cluster_cohesion" ->
        // the x_cluster_assign argmax chain, plus the EXACT own-dot via
        // the BIGINT comprehension (list_dot_product floats only rank)
        s"""WITH qv AS (
           |  SELECT vec_id,
           |         [CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS DOUBLE)
           |          for x in embedding] AS q
           |  FROM embeddings),
           |qn AS (SELECT vec_id, q, list_dot_product(q, q) AS nq2 FROM qv),
           |cents AS (SELECT vec_id AS cid, q AS cq, nq2 AS nc2 FROM qn
           |          WHERE nq2 > 0 ORDER BY vec_id LIMIT 16),
           |scored AS (SELECT v.vec_id, c.cid,
           |             list_dot_product(v.q, c.cq) / sqrt(c.nc2) AS score,
           |             CAST(list_sum([CAST(v.q[i] AS BIGINT) * CAST(c.cq[i] AS BIGINT)
           |                            for i in range(1, len(v.q) + 1)]) AS BIGINT) AS d
           |           FROM qn v CROSS JOIN cents c),
           |own AS (SELECT vec_id, cid AS cell, d FROM (
           |  SELECT vec_id, cid, d,
           |         row_number() OVER (PARTITION BY vec_id
           |                            ORDER BY score DESC, cid) AS rn
           |  FROM scored) WHERE rn = 1)
           |SELECT cell, CAST(count(*) AS BIGINT) AS n_members,
           |  CAST(sum(d) AS BIGINT) AS sum_dot,
           |  min(d) AS min_dot, max(d) AS max_dot,
           |  CAST(sum(CASE WHEN d <= 0 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_antialigned
           |FROM own GROUP BY cell ORDER BY cell""".stripMargin,

      "x_corpus_topics" ->
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
           |cells AS (
           |  SELECT vec_id AS doc_id, cid AS cell FROM (
           |    SELECT vec_id, cid,
           |           row_number() OVER (PARTITION BY vec_id
           |                              ORDER BY score DESC, cid) AS rn
           |    FROM scored) WHERE rn = 1)
           |SELECT cell, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           |  CAST(sum(n_chars) AS BIGINT) AS total_chars
           |FROM cells JOIN documents USING (doc_id)
           |GROUP BY cell ORDER BY cell""".stripMargin,

      "x_snapshot_diff" ->
        """WITH newsnap AS (
          |  SELECT doc_id,
          |         CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text,
          |         lang, source
          |  FROM documents WHERE doc_id % 11 <> 3
          |  UNION ALL
          |  SELECT doc_id + 1000000, text, lang, source
          |  FROM documents WHERE doc_id % 13 = 0),
          |ofp AS (SELECT doc_id, md5(
          |          md5(coalesce(CAST(text AS VARCHAR), chr(0) || 'null'))
          |          || md5(coalesce(lang, chr(0) || 'null'))
          |          || md5(coalesce(source, chr(0) || 'null'))) AS f
          |        FROM documents),
          |nfp AS (SELECT doc_id, md5(
          |          md5(coalesce(CAST(text AS VARCHAR), chr(0) || 'null'))
          |          || md5(coalesce(lang, chr(0) || 'null'))
          |          || md5(coalesce(source, chr(0) || 'null'))) AS f
          |        FROM newsnap)
          |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
          |       CASE WHEN o.doc_id IS NULL THEN 'added'
          |            WHEN n.doc_id IS NULL THEN 'removed'
          |            WHEN o.f <> n.f THEN 'changed' END AS change
          |FROM ofp o FULL OUTER JOIN nfp n ON o.doc_id = n.doc_id
          |WHERE (CASE WHEN o.doc_id IS NULL THEN 'added'
          |            WHEN n.doc_id IS NULL THEN 'removed'
          |            WHEN o.f <> n.f THEN 'changed' END) IS NOT NULL
          |ORDER BY doc_id""".stripMargin,

      "x_cdc_snapshot" -> cdcSnapshotSql,

      // the STREAMING applier must converge to the identical snapshot —
      // shared oracle is the whole point
      "x_stream_cdc" -> cdcSnapshotSql,

      "x_cdc_report" ->
        s"""WITH $cdcLogSql
           |SELECT seq, CAST(count(*) AS BIGINT) AS n_changes,
           |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_keys,
           |  CAST(sum(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT) AS n_insert,
           |  CAST(sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT) AS n_update,
           |  CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_delete,
           |  CAST(sum(CASE WHEN text IS NULL AND op <> 'D' THEN 1 ELSE 0 END)
           |       AS BIGINT) AS n_suspect_null_payload
           |FROM cdclog GROUP BY seq ORDER BY seq""".stripMargin,

      "x_cdc_asof" -> cdcAsofSql,

      // compaction is content-neutral: the compacted log's snapshot /
      // as-of view must hash-match the ORIGINAL log's — both entries
      // share the uncompacted oracles verbatim
      "x_cdc_checkpoint" -> cdcSnapshotSql,
      "x_cdc_checkpoint_asof" -> cdcAsofSql,

      "x_cdc_history" ->
        s"""WITH $cdcLogSql
           |SELECT doc_id, op, seq AS seq_from,
           |  lead(seq) OVER w AS seq_to,
           |  (lead(seq) OVER w IS NULL AND op <> 'D') AS is_current
           |FROM cdclog WINDOW w AS (PARTITION BY doc_id ORDER BY seq)
           |ORDER BY doc_id, seq_from""".stripMargin,

      "x_emb_sq8" ->
        """WITH fx AS (SELECT vec_id, i - 1 AS pos,
          |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT) AS xi
          |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
          |st AS (SELECT pos, min(xi) AS mn, max(xi) AS mx FROM fx GROUP BY pos),
          |cd AS (SELECT vec_id, pos, xi, mn, mx,
          |    CASE WHEN mx > mn THEN (xi - mn) * 255 // (mx - mn)
          |         ELSE CAST(0 AS BIGINT) END AS code
          |  FROM fx JOIN st USING (pos))
          |SELECT vec_id,
          |  md5(string_agg(CAST(code AS VARCHAR), ',' ORDER BY pos)) AS code_digest,
          |  CAST(sum(abs(xi * 255 - (mn * 255 + code * (mx - mn)))) AS BIGINT) AS err_scaled,
          |  CAST(count(*) AS BIGINT) AS n_dims
          |FROM cd GROUP BY vec_id ORDER BY vec_id""".stripMargin,

      "x_emb_rq8" ->
        // identical two-stage grid arithmetic; (r − mn2) is non-negative
        // so // matches div, and r·255 keeps sign symmetric in both
        """WITH fx AS (SELECT vec_id, i - 1 AS pos,
          |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT) AS xi
          |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
          |g1 AS (SELECT pos, min(xi) AS mn1, max(xi) AS mx1 FROM fx GROUP BY pos),
          |c1 AS (SELECT vec_id, pos, xi, mn1, mx1,
          |    CASE WHEN mx1 > mn1 THEN (xi - mn1) * 255 // (mx1 - mn1)
          |         ELSE CAST(0 AS BIGINT) END AS code1
          |  FROM fx JOIN g1 USING (pos)),
          |r1 AS (SELECT vec_id, pos, code1,
          |    xi * 255 - (mn1 * 255 + code1 * (mx1 - mn1)) AS r
          |  FROM c1),
          |g2 AS (SELECT pos, min(r) AS mn2, max(r) AS mx2 FROM r1 GROUP BY pos),
          |c2 AS (SELECT vec_id, pos, code1, r, mn2, mx2,
          |    CASE WHEN mx2 > mn2 THEN (r - mn2) * 255 // (mx2 - mn2)
          |         ELSE CAST(0 AS BIGINT) END AS code2
          |  FROM r1 JOIN g2 USING (pos)),
          |e2 AS (SELECT vec_id, pos, code1, code2, r,
          |    abs(r * 255 - (mn2 * 255 + code2 * (mx2 - mn2))) AS err2
          |  FROM c2),
          |ag AS (SELECT vec_id,
          |    md5(string_agg(CAST(code1 AS VARCHAR), ',' ORDER BY pos)) AS code1_digest,
          |    md5(string_agg(CAST(code2 AS VARCHAR), ',' ORDER BY pos)) AS code2_digest,
          |    CAST(sum(abs(r)) AS BIGINT) AS err1_scaled,
          |    CAST(sum(err2) AS BIGINT) AS err2_scaled
          |  FROM e2 GROUP BY vec_id)
          |SELECT vec_id, code1_digest, code2_digest, err1_scaled, err2_scaled,
          |  CASE WHEN err1_scaled > 0 THEN
          |    CAST(err2_scaled * 1000 // (err1_scaled * 255) AS BIGINT) END
          |    AS reduction_permille
          |FROM ag ORDER BY vec_id""".stripMargin,

      "x_text_extract_html" -> htmlExtractSql,

      // the live readStream run is a pure projection — identical chain,
      // identical oracle
      "x_stream_extract" -> htmlExtractSql,

      "x_stream_sq8" ->
        s"""WITH fx AS (SELECT vec_id, i - 1 AS pos,
           |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT) AS xi
           |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
           |g AS (SELECT CAST(pos AS BIGINT) AS pos, mn, mx
           |      FROM read_parquet('$sq8IdxDir/grid/*.parquet')),
           |cd AS (SELECT vec_id, pos,
           |    CASE WHEN mx > mn
           |      THEN GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT),
           |             (xi - mn) * 255 // (mx - mn)))
           |      ELSE CAST(0 AS BIGINT) END AS code
           |  FROM fx JOIN g USING (pos))
           |SELECT vec_id,
           |  md5(string_agg(CAST(code AS VARCHAR), ',' ORDER BY pos)) AS code_digest
           |FROM cd GROUP BY vec_id ORDER BY vec_id""".stripMargin,

      "x_pipeline_web" ->
        s"""WITH $htmlCoreCtes,
           |ex AS (SELECT doc_id, c AS text,
           |         len(regexp_extract_all(html, '(?i)<a[ >]')) AS n_links,
           |         length(c) AS text_chars
           |       FROM $htmlLast),
           |keep AS (SELECT doc_id, text FROM ex
           |         WHERE text_chars >= 50 AND n_links <= 5),
           |dd AS (SELECT md5(text) AS text_md5, min(doc_id) AS doc_id,
           |         CAST(count(*) AS BIGINT) AS n_copies
           |       FROM keep GROUP BY md5(text))
           |SELECT doc_id, text_md5, n_copies FROM dd ORDER BY doc_id""".stripMargin,

      "x_pref_pairs" ->
        """WITH ranked AS (SELECT source, doc_id, n_chars,
          |    row_number() OVER (PARTITION BY source
          |      ORDER BY n_chars DESC, doc_id) AS rk
          |  FROM documents),
          |best AS (SELECT source, doc_id AS chosen_id, n_chars AS cs
          |         FROM ranked WHERE rk = 1),
          |rest AS (SELECT source, doc_id AS rejected_id, n_chars AS rs
          |         FROM ranked WHERE rk > 1 AND rk <= 4)
          |SELECT b.source, b.chosen_id, r.rejected_id,
          |  CAST(b.cs - r.rs AS BIGINT) AS margin
          |FROM best b JOIN rest r ON r.source = b.source
          |WHERE r.rs < b.cs
          |ORDER BY b.source, r.rejected_id""".stripMargin,

      "x_privacy_kanon" ->
        """SELECT c_nationkey, c_mktsegment,
          |  CAST(count(*) AS BIGINT) AS n_rows,
          |  count(*) < 10 AS at_risk
          |FROM customer GROUP BY 1, 2
          |ORDER BY c_nationkey, c_mktsegment""".stripMargin,

      "x_privacy_suppress" ->
        """WITH g AS (SELECT c_nationkey, c_mktsegment FROM customer
          |           GROUP BY 1, 2 HAVING count(*) < 10)
          |SELECT c.c_custkey, c.c_nationkey, c.c_mktsegment
          |FROM customer c
          |LEFT JOIN g ON g.c_nationkey = c.c_nationkey
          |           AND g.c_mktsegment = c.c_mktsegment
          |WHERE g.c_nationkey IS NULL
          |ORDER BY c.c_custkey""".stripMargin,

      "x_export_jsonl" ->
        // full-report replay: same canonical lines, same md5 shard
        // assignment and (md5, id) order, sha256 over the identical
        // byte stream (strlen = UTF-8 bytes on VARCHAR)
        """WITH lines AS (SELECT doc_id,
          |    '{"doc_id":' || CAST(doc_id AS VARCHAR) || ',"lang":"' || lang ||
          |    '","source":"' || source || '","text":"' ||
          |    replace(replace(text, '\', '\\'), '"', '\"') || '"}' AS line
          |  FROM documents),
          |sh AS (SELECT doc_id, line,
          |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS shard,
          |    md5(CAST(doc_id AS VARCHAR)) AS hx
          |  FROM lines),
          |agg AS (SELECT CAST(shard AS INTEGER) AS shard_no,
          |    CAST(count(*) AS BIGINT) AS n_rows,
          |    string_agg(line, chr(10) ORDER BY hx, doc_id) || chr(10) AS blob
          |  FROM sh GROUP BY shard)
          |SELECT shard_no, n_rows,
          |  CAST(strlen(blob) AS BIGINT) AS byte_len,
          |  sha256(blob) AS sha256
          |FROM agg ORDER BY shard_no""".stripMargin,

      "x_mix_waterfill" ->
        // the same closed-form waterfill: saturated = affordable-level
        // prefix of the asc order, integer level + remainder to the
        // first r unsaturated domains (// and % agree with Spark's
        // div/% on the non-negative operands here)
        """WITH avail AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS available
          |               FROM documents GROUP BY source),
          |b AS (SELECT CAST(sum(n_chars) AS BIGINT) * 6 // 10 AS budget FROM documents),
          |ranked AS (SELECT source, available,
          |    row_number() OVER (ORDER BY available ASC, source ASC) AS k,
          |    sum(available) OVER (ORDER BY available ASC, source ASC
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
          |    count(*) OVER () AS n
          |  FROM avail),
          |flagged AS (SELECT r.*, b.budget,
          |    (p - available + available * (n - k + 1)) <= b.budget AS saturated
          |  FROM ranked r CROSS JOIN b),
          |st AS (SELECT CAST(sum(CASE WHEN saturated THEN 1 ELSE 0 END) AS BIGINT) AS i,
          |              CAST(sum(CASE WHEN saturated THEN available ELSE 0 END) AS BIGINT) AS pi
          |       FROM flagged)
          |SELECT f.source, f.available,
          |  CAST(CASE WHEN f.saturated THEN f.available
          |       ELSE (f.budget - st.pi) // (f.n - st.i) +
          |            (CASE WHEN f.k - st.i <= (f.budget - st.pi) % (f.n - st.i)
          |                  THEN 1 ELSE 0 END)
          |       END AS BIGINT) AS allocated,
          |  f.saturated
          |FROM flagged f CROSS JOIN st
          |ORDER BY f.source""".stripMargin,

      "x_mix_waterfill_take" ->
        // the same allocation CTEs, then a per-domain cumulative-sum
        // take (cum_before < allocated — one-doc overrun max)
        """WITH avail AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS available
          |               FROM documents GROUP BY source),
          |b AS (SELECT CAST(sum(n_chars) AS BIGINT) * 6 // 10 AS budget FROM documents),
          |ranked AS (SELECT source, available,
          |    row_number() OVER (ORDER BY available ASC, source ASC) AS k,
          |    sum(available) OVER (ORDER BY available ASC, source ASC
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
          |    count(*) OVER () AS n
          |  FROM avail),
          |flagged AS (SELECT r.*, b.budget,
          |    (p - available + available * (n - k + 1)) <= b.budget AS saturated
          |  FROM ranked r CROSS JOIN b),
          |st AS (SELECT CAST(sum(CASE WHEN saturated THEN 1 ELSE 0 END) AS BIGINT) AS i,
          |              CAST(sum(CASE WHEN saturated THEN available ELSE 0 END) AS BIGINT) AS pi
          |       FROM flagged),
          |alloc AS (SELECT f.source,
          |    CAST(CASE WHEN f.saturated THEN f.available
          |         ELSE (f.budget - st.pi) // (f.n - st.i) +
          |              (CASE WHEN f.k - st.i <= (f.budget - st.pi) % (f.n - st.i)
          |                    THEN 1 ELSE 0 END)
          |         END AS BIGINT) AS allocated
          |  FROM flagged f CROSS JOIN st),
          |cum AS (SELECT doc_id, source, n_chars,
          |    sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars AS cb
          |  FROM documents)
          |SELECT c.doc_id, c.source, c.n_chars
          |FROM cum c JOIN alloc a ON a.source = c.source
          |WHERE c.cb < a.allocated
          |ORDER BY c.doc_id""".stripMargin,

      "x_privacy_ldiv" ->
        """SELECT c_nationkey, c_mktsegment,
          |  CAST(count(*) AS BIGINT) AS n_rows,
          |  CAST(count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
          |                           ELSE 'pos' END) AS BIGINT) AS n_sensitive,
          |  count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
          |                      ELSE 'pos' END) < 2 AS at_risk
          |FROM customer GROUP BY 1, 2
          |ORDER BY c_nationkey, c_mktsegment""".stripMargin,

      "x_privacy_tclose" ->
        // common-denominator TV gaps in HUGEINT; absent values enter
        // via the groups × value-domain cross; all operands non-negative
        """WITH tr AS (SELECT c_nationkey, c_mktsegment,
          |    CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS s
          |  FROM customer),
          |tn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM tr),
          |tg AS (SELECT s, CAST(count(*) AS HUGEINT) AS nv FROM tr GROUP BY s),
          |tgv AS (SELECT c_nationkey, c_mktsegment, s, count(*) AS ngv
          |  FROM tr GROUP BY 1, 2, 3),
          |tgg AS (SELECT c_nationkey, c_mktsegment,
          |    CAST(sum(ngv) AS HUGEINT) AS ng FROM tgv GROUP BY 1, 2),
          |tx AS (SELECT g.c_nationkey, g.c_mktsegment, g.ng, v.nv,
          |    CAST(coalesce(x.ngv, 0) AS HUGEINT) AS ngv
          |  FROM tgg g CROSS JOIN tg v
          |  LEFT JOIN tgv x ON x.c_nationkey = g.c_nationkey
          |    AND x.c_mktsegment = g.c_mktsegment AND x.s = v.s),
          |ta AS (SELECT c_nationkey, c_mktsegment, ng,
          |    sum(abs(ngv * (SELECT n FROM tn) - nv * ng)) AS gap
          |  FROM tx GROUP BY 1, 2, 3)
          |SELECT c_nationkey, c_mktsegment, CAST(ng AS BIGINT) AS n_rows,
          |  CAST(gap * 1000 // (2 * ng * (SELECT n FROM tn)) AS BIGINT)
          |    AS tv_permille,
          |  CAST(gap * 1000 // (2 * ng * (SELECT n FROM tn)) AS BIGINT) > 300
          |    AS at_risk
          |FROM ta ORDER BY 1, 2""".stripMargin,

      "x_sft_format" ->
        """WITH turns AS (
          |  SELECT source, doc_id, text,
          |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
          |  FROM documents),
          |tagged AS (
          |  SELECT source, rn,
          |    (CASE WHEN rn % 2 = 1 THEN '<|user|>' ELSE '<|assistant|>' END)
          |      || chr(10) || text AS tg,
          |    CAST(len(string_split(text, ' ')) + 1 AS BIGINT) AS toks
          |  FROM turns)
          |SELECT source AS conv_id, CAST(count(*) AS BIGINT) AS n_turns,
          |  CAST(sum(toks) AS BIGINT) AS total_tokens,
          |  CAST(sum(CASE WHEN rn % 2 = 0 THEN toks ELSE 0 END) AS BIGINT) AS loss_tokens,
          |  md5(string_agg(tg, chr(10) ORDER BY rn)) AS sft_md5
          |FROM tagged GROUP BY source ORDER BY conv_id""".stripMargin,

      "x_sft_spans" ->
        """WITH turns AS (
          |  SELECT source, doc_id,
          |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
          |    CAST(len(string_split(text, ' ')) + 1 AS BIGINT) AS toks
          |  FROM documents),
          |run AS (
          |  SELECT source, rn, toks,
          |    CAST(sum(toks) OVER (PARTITION BY source ORDER BY rn
          |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tok_end
          |  FROM turns)
          |SELECT source AS conv_id, CAST(rn AS BIGINT) AS turn_idx,
          |  CASE WHEN rn % 2 = 1 THEN 'user' ELSE 'assistant' END AS role,
          |  toks AS turn_tokens, tok_end - toks AS tok_start, tok_end,
          |  (rn % 2 = 0) AS loss_turn
          |FROM run ORDER BY conv_id, turn_idx""".stripMargin,

      "x_sft_span_corrupt" -> spanCorruptOracle,

      "x_stream_spancorrupt" -> spanCorruptOracle,

      "x_contrastive_triplets" ->
        s"""WITH ${jaccardPairsSql(Some(jaccardFreqCap))},
           |h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents),
           |sp AS (SELECT doc_id, hx,
           |         ('0x' || substr(hx, 1, 15))::BIGINT % 8 AS shard FROM h),
           |pos AS (SELECT doc_id, shard,
           |          CAST(row_number() OVER (PARTITION BY shard
           |                                  ORDER BY hx, doc_id) - 1 AS BIGINT) AS pos,
           |          CAST(count(*) OVER (PARTITION BY shard) AS BIGINT) AS n
           |        FROM sp),
           |rot AS (SELECT shard, (pos + n // 2) % n AS pos,
           |               doc_id AS negative FROM pos),
           |neg AS (SELECT p.doc_id AS anchor, r.negative
           |          FROM pos p JOIN rot r ON p.shard = r.shard AND p.pos = r.pos
           |         WHERE p.doc_id <> r.negative),
           |pp AS (SELECT least(a, b) AS anchor, greatest(a, b) AS positive
           |         FROM jac WHERE jaccard >= 0.6)
           |SELECT pp.anchor, pp.positive, n.negative
           |FROM pp JOIN neg n USING (anchor)
           |WHERE n.negative <> pp.positive
           |ORDER BY pp.anchor, pp.positive""".stripMargin,

      "x_pipeline_semantic" -> {
        val n2 = semThreshNum * semThreshNum
        val d2 = semThreshDen * semThreshDen
        s"""WITH RECURSIVE fq AS (SELECT doc_id,
           |    len(string_split(text, ' ')) AS n_tokens,
           |    CAST(length(replace(text, ' ', '')) AS DOUBLE)
           |      / len(string_split(text, ' ')) AS mean_tok_len,
           |    CAST($stopSql AS DOUBLE) / len(string_split(text, ' ')) AS stopword_ratio
           |  FROM documents),
           |ftoks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
           |fpt AS (SELECT doc_id, tok, count(*) AS c FROM ftoks GROUP BY 1, 2),
           |fta AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, max(c) AS top_c
           |        FROM fpt GROUP BY 1),
           |fr AS (SELECT doc_id, top_c / n AS top_token_ratio FROM fta),
           |keep AS (SELECT fq.doc_id, fq.n_tokens
           |         FROM fq JOIN fr USING (doc_id)
           |         WHERE NOT (fq.n_tokens < 25 OR fq.mean_tok_len < 4.0
           |                    OR fq.mean_tok_len > 10.0 OR fr.top_token_ratio > 0.2
           |                    OR fq.stopword_ratio < 0.01)),
           |qv AS (SELECT e.vec_id,
           |         [CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS DOUBLE)
           |          for x in e.embedding] AS q
           |       FROM embeddings e JOIN keep k ON k.doc_id = e.vec_id),
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
           |          FROM reach GROUP BY node)
           |SELECT k.doc_id, k.n_tokens
           |FROM keep k LEFT JOIN lab l ON l.vec_id = k.doc_id
           |WHERE l.vec_id IS NULL OR l.vec_id = l.cluster_id
           |ORDER BY k.doc_id""".stripMargin
      },

      "x_quality_flags" ->
        s"""WITH q AS (SELECT doc_id,
           |    len(string_split(text, ' ')) AS n_tokens,
           |    CAST(length(replace(text, ' ', '')) AS DOUBLE)
           |      / len(string_split(text, ' ')) AS mean_tok_len,
           |    CAST($stopSql AS DOUBLE) / len(string_split(text, ' ')) AS stopword_ratio
           |  FROM documents),
           |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
           |pt AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
           |ta AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, max(c) AS top_c
           |       FROM pt GROUP BY 1),
           |r AS (SELECT doc_id, top_c / n AS top_token_ratio FROM ta)
           |SELECT q.doc_id, q.n_tokens,
           |  q.n_tokens < 25 AS flag_short,
           |  (q.mean_tok_len < 4.0 OR q.mean_tok_len > 10.0) AS flag_word_len,
           |  r.top_token_ratio > 0.2 AS flag_repetitive,
           |  q.stopword_ratio < 0.01 AS flag_low_stopword,
           |  NOT (q.n_tokens < 25 OR q.mean_tok_len < 4.0 OR q.mean_tok_len > 10.0
           |       OR r.top_token_ratio > 0.2 OR q.stopword_ratio < 0.01) AS keep
           |FROM q JOIN r USING (doc_id) ORDER BY q.doc_id""".stripMargin,

      "x_quality_topquartile" ->
        s"""WITH q AS (SELECT doc_id, lang,
           |    len(string_split(text, ' ')) AS n_tokens,
           |    CAST($stopSql AS DOUBLE) / len(string_split(text, ' ')) AS stopword_ratio
           |  FROM documents),
           |r AS (SELECT *,
           |    row_number() OVER (PARTITION BY lang
           |                       ORDER BY stopword_ratio DESC, doc_id) AS rn,
           |    count(*) OVER (PARTITION BY lang) AS n
           |  FROM q)
           |SELECT doc_id, lang, n_tokens, stopword_ratio
           |FROM r WHERE rn * 4 <= n ORDER BY doc_id""".stripMargin,

      "x_dedup_minhash_sig" ->
        s"""WITH $shinglesSql
           |SELECT doc_id, $minhashSigSql
           |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "x_dedup_cross" ->
        s"""WITH ${jaccardPairsSql(None)},
           |$lshBaseSql,
           |sig AS (SELECT doc_id, $lshSigSql FROM shh GROUP BY doc_id),
           |bands_all AS (
           |  $lshBandsSql),
           |refdocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0),
           |exact AS (SELECT c.doc_id AS cand_id, r.doc_id AS ref_id,
           |                 CAST(1.0 AS DOUBLE) AS jaccard
           |            FROM documents c JOIN refdocs r ON md5(c.text) = md5(r.text)),
           |ref_bands AS (SELECT b.doc_id, b.band, b.key
           |                FROM bands_all b JOIN refdocs r USING (doc_id)),
           |ref_ok AS (SELECT band, key FROM ref_bands
           |           GROUP BY band, key HAVING count(*) <= $lshBucketCap),
           |ref_bands_ok AS (SELECT rb.doc_id, rb.band, rb.key
           |                   FROM ref_bands rb JOIN ref_ok USING (band, key)),
           |cross_cand AS (SELECT DISTINCT cb.doc_id AS cand_id, rb.doc_id AS ref_id
           |                 FROM bands_all cb JOIN ref_bands_ok rb
           |                   ON cb.band = rb.band AND cb.key = rb.key
           |                  AND cb.doc_id <> rb.doc_id),
           |near AS (SELECT cc.cand_id, cc.ref_id, j.jaccard
           |           FROM cross_cand cc
           |           JOIN jac j ON j.a = least(cc.cand_id, cc.ref_id)
           |                     AND j.b = greatest(cc.cand_id, cc.ref_id)
           |          WHERE j.jaccard >= 0.7),
           |allp AS (SELECT cand_id, ref_id, max(jaccard) AS jaccard
           |           FROM (SELECT * FROM exact UNION ALL SELECT * FROM near)
           |          GROUP BY cand_id, ref_id),
           |ranked AS (SELECT cand_id, ref_id, jaccard,
           |             row_number() OVER (PARTITION BY cand_id
           |                                ORDER BY jaccard DESC, ref_id) AS rk
           |             FROM allp)
           |SELECT cand_id, ref_id, jaccard FROM ranked WHERE rk = 1
           |ORDER BY cand_id""".stripMargin,

      // Connected components as a recursive CTE: reach(node, label) grows
      // until no new (node, label) pair appears (UNION dedups), then the
      // min label per node is the component id — the same fixpoint the
      // Spark operator reaches by label propagation.
      "x_dedup_clusters" ->
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
           |csizes AS (SELECT cluster_id, count(*) AS n_members
           |             FROM lab GROUP BY cluster_id)
           |SELECT l.doc_id, l.cluster_id, s.n_members,
           |       l.doc_id = l.cluster_id AS keep
           |FROM lab l JOIN csizes s USING (cluster_id)
           |ORDER BY l.doc_id""".stripMargin,

      "x_pipeline_curate" ->
        s"""WITH $curatePipelineCtes
          |SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
          |       CAST(cum_before AS BIGINT) AS cum_before,
          |       ('0x' || substr(hx, 1, 15))::BIGINT % 4 AS shard,
          |       CAST(row_number() OVER (
          |         PARTITION BY ('0x' || substr(hx, 1, 15))::BIGINT % 4
          |         ORDER BY hx, doc_id) - 1 AS BIGINT) AS pos
          |FROM taken ORDER BY doc_id""".stripMargin,

      "x_pipeline_funnel" ->
        s"""WITH $curatePipelineCtes,
          |f AS (
          |  SELECT 1 AS stage_no, 'raw' AS stage,
          |         (SELECT count(*) FROM documents) AS n
          |  UNION ALL SELECT 2, 'quality', (SELECT count(*) FROM quality)
          |  UNION ALL SELECT 3, 'dedup', (SELECT count(*) FROM deduped)
          |  UNION ALL SELECT 4, 'decontam', (SELECT count(*) FROM clean)
          |  UNION ALL SELECT 5, 'domain_mix', (SELECT count(*) FROM mixed)
          |  UNION ALL SELECT 6, 'token_budget', (SELECT count(*) FROM taken))
          |SELECT CAST(stage_no AS BIGINT) AS stage_no, stage,
          |       CAST(n AS BIGINT) AS n_rows,
          |       CAST(coalesce(lag(n) OVER (ORDER BY stage_no) - n, 0) AS BIGINT)
          |         AS dropped
          |FROM f ORDER BY stage_no""".stripMargin,

      "x_dedup_spans" ->
        """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          |pe AS (SELECT doc_id,
          |         unnest([{'pos': i, 'sh': array_to_string(w[i:i+7], ' ')}
          |                 for i in range(1, len(w) - 6)]) AS e
          |       FROM words WHERE len(w) >= 8),
          |ps AS (SELECT doc_id, e.pos AS pos, e.sh AS shingle FROM pe),
          |dup AS (SELECT shingle FROM ps GROUP BY shingle
          |        HAVING count(DISTINCT doc_id) >= 2),
          |m AS (SELECT p.doc_id, p.pos FROM ps p JOIN dup USING (shingle)),
          |s AS (SELECT doc_id, pos,
          |        CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 7
          |             THEN 0 ELSE 1 END AS brk FROM m),
          |g AS (SELECT doc_id, pos,
          |        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id FROM s)
          |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
          |       CAST(max(pos) + 7 AS BIGINT) AS span_end,
          |       CAST(count(*) AS BIGINT) AS n_ngrams,
          |       CAST(max(pos) + 7 - min(pos) + 1 AS BIGINT) AS n_tokens
          |FROM g GROUP BY doc_id, span_id
          |ORDER BY doc_id, span_start""".stripMargin,

      "x_decontam_clip" ->
        """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          |cw AS (SELECT doc_id, w FROM words WHERE doc_id % 7 <> 0),
          |pe AS (SELECT doc_id,
          |         unnest([{'pos': i, 'sh': array_to_string(w[i:i+7], ' ')}
          |                 for i in range(1, len(w) - 6)]) AS e
          |       FROM cw WHERE len(w) >= 8),
          |ps AS (SELECT doc_id, e.pos AS pos, e.sh AS shingle FROM pe),
          |rw AS (SELECT doc_id, w FROM words WHERE doc_id % 7 = 0),
          |rsh AS (SELECT DISTINCT
          |         unnest(list_distinct([array_to_string(w[i:i+7], ' ')
          |                               for i in range(1, len(w) - 6)])) AS shingle
          |        FROM rw),
          |m AS (SELECT p.doc_id, p.pos FROM ps p JOIN rsh USING (shingle)),
          |s AS (SELECT doc_id, pos,
          |        CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) = 1
          |             THEN 0 ELSE 1 END AS brk FROM m),
          |g AS (SELECT doc_id, pos,
          |        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id FROM s),
          |sp0 AS (SELECT doc_id, min(pos) AS ss, max(pos) + 7 AS se
          |        FROM g GROUP BY doc_id, span_id),
          |sp AS (SELECT doc_id, list(struct_pack(s := ss, e := se)) AS spans
          |       FROM sp0 GROUP BY doc_id),
          |cl AS (SELECT c.doc_id,
          |         [c.w[i] for i in range(1, len(c.w) + 1)
          |          if len(list_filter(coalesce(sp.spans, []),
          |                             x -> i >= x.s AND i <= x.e)) = 0] AS kept,
          |         len(c.w) AS n
          |       FROM cw c LEFT JOIN sp USING (doc_id))
          |SELECT doc_id,
          |       coalesce(array_to_string(kept, ' '), '') AS text_clipped,
          |       CAST(n - len(kept) AS BIGINT) AS n_tokens_removed
          |FROM cl ORDER BY doc_id""".stripMargin,

      "x_decontam_ngram" ->
        """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          |sh8 AS (SELECT doc_id,
          |         unnest(list_distinct([array_to_string(w[i:i+7], ' ')
          |                               for i in range(1, len(w) - 6)])) AS shingle
          |        FROM words),
          |cand AS (SELECT doc_id, shingle FROM sh8 WHERE doc_id % 7 <> 0),
          |ref AS (SELECT DISTINCT shingle FROM sh8 WHERE doc_id % 7 = 0),
          |sizes AS (SELECT doc_id, count(*) AS n_ngrams FROM cand GROUP BY 1),
          |hits AS (SELECT c.doc_id, count(*) AS n_hits
          |           FROM cand c JOIN ref USING (shingle) GROUP BY 1)
          |SELECT h.doc_id AS cand_id, h.n_hits, s.n_ngrams
          |FROM hits h JOIN sizes s USING (doc_id) ORDER BY cand_id""".stripMargin,

      "x_domain_mix" ->
        """WITH ranked AS (SELECT doc_id, lang, source,
          |  row_number() OVER (PARTITION BY lang
          |                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          |  FROM documents)
          |SELECT doc_id, lang, source FROM ranked
          |WHERE rn <= CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 20 WHEN 'fr' THEN 15
          |                      WHEN 'es' THEN 10 WHEN 'zh' THEN 5 ELSE 0 END
          |ORDER BY doc_id""".stripMargin,

      "x_domain_temperature" ->
        """WITH cnt AS (SELECT source AS d, count(*) AS n FROM documents GROUP BY 1),
          |wts AS (SELECT d, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w
          |        FROM cnt),
          |tot AS (SELECT CAST(sum(w) AS BIGINT) AS s FROM wts),
          |tgt AS (SELECT d, (400 * w) // s AS t FROM wts, tot),
          |ranked AS (SELECT doc_id, source,
          |  row_number() OVER (PARTITION BY source
          |                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          |  FROM documents)
          |SELECT r.doc_id, r.source FROM ranked r JOIN tgt ON tgt.d = r.source
          |WHERE r.rn <= tgt.t
          |ORDER BY r.doc_id""".stripMargin,

      "x_skew_profile" ->
        """WITH c AS (SELECT CAST(l_orderkey AS VARCHAR) AS key, count(*) AS n
          |           FROM lineitem GROUP BY 1),
          |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
          |SELECT key, CAST(n AS BIGINT) AS n,
          |       CAST((n * 1000000) // total AS BIGINT) AS share_ppm
          |FROM c, t ORDER BY n DESC, key LIMIT 20""".stripMargin,

      "x_dedup_best" ->
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
           |csizes AS (SELECT cluster_id, count(*) AS n_members
           |             FROM lab GROUP BY cluster_id),
           |scored AS (SELECT l.doc_id, l.cluster_id, s.n_members, d.n_chars,
           |             row_number() OVER (PARTITION BY l.cluster_id
           |                                ORDER BY d.n_chars DESC, l.doc_id) AS rk
           |           FROM lab l JOIN csizes s USING (cluster_id)
           |           JOIN documents d USING (doc_id))
           |SELECT doc_id, cluster_id, n_members, n_chars, rk = 1 AS keep
           |FROM scored ORDER BY doc_id""".stripMargin)
}
