package graft.queries


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.{HostedTables, Tables}
import graft.core.{Chunker, ServiceName, WriteMode}
import graft.operators.{Calibration, Cdc, Curation, Dedup, Embeddings, GraphOps, HtmlText, Multimodal, Profiling, Regression, Scale, Similarity, Sketches, TextAnalysis}
import graft.sinks.HostedStore
import graft.streaming.EventStreams

/** The engine's declared operator surface: every entry is one operator from
  * SURVEY §2 (ref_ prefix) or a mandated extension (q_ and x_ prefixes),
  * paired — where ANSI SQL can express it — with a DuckDB oracle over the
  * same parquet tables.
  *
  * Oracle-parity ground rules (see tools/oracle_check.py):
  *  - Money-ish double aggregates are cast to DECIMAL *per row* before
  *    summing (exact + order-independent), then the FINAL output is scaled
  *    to integer units and cast BIGINT (`*_cents` = ×100 for 2-decimal,
  *    `*_e4` = ×10000 for 4-decimal). The driver's hash gate compares
  *    *rendered* values: DECIMAL trailing zeros ("123.40" vs "123.4") and
  *    DuckDB HUGEINT sums ("499.0" vs "499") render differently across
  *    engines even when values are identical — so oracle-facing outputs
  *    are only ever BIGINT, STRING, or deterministically-identical DOUBLE.
  *  - Every DuckDB integer sum() is wrapped in CAST(... AS BIGINT)
  *    (sum(BIGINT) returns HUGEINT otherwise).
  *  - Integral-valued doubles (quantities, counts) sum exactly in double.
  *  - Similarity outputs are *ranks*, never raw floats.
  *  - Hashes are md5/sha256 — bit-identical in DuckDB.
  *  - Every query ends in a deterministic ORDER BY.
  */
object QueryCatalog {

  type Q = (SparkSession, String) => DataFrame


  // ------------------------------------------------------------ helpers

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Shared serve path of the persisted merge-table tokenizers
    * (`x_bpe_persisted`, `x_wordpiece_persisted`): stage the trained
    * merges once, reload, and segment merge-derived OOV probe words
    * (`lhs‖rhs‖qq`) from the artifact alone. ONE definition — the two
    * entries must never drift in probe-word or column conventions,
    * and both share [[graft.operators.Bpe.persistedApplyOracleSql]].
    */
  private def persistedTokenizerApply(s: SparkSession, idxDir: String,
                                      dir: String)
                                     (train: => DataFrame): DataFrame = {
    val path = stageIndex(idxDir, dir) {
      train.coalesce(1).write.mode("overwrite").parquet(s"$idxDir/merges")
    }
    val mergesDf = s.read.parquet(s"$path/merges")
    val merges = mergesDf.orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val words = mergesDf
      .select(concat(col("lhs"), col("rhs"), lit("qq")).as("word"))
      .distinct()
    graft.operators.Bpe.applyMerges(words, "word", merges)
      .select(col("word"), array_join(col("syms"), "|").as("segmentation"))
      .orderBy("word")
  }

  /** The Debezium-shaped change log shared by the x_cdc_* queries:
    * synthesized from `documents` (no staging) — full initial insert,
    * then updates, deletes, and re-inserts at later sequence numbers.
    * Doc 14-style keys (≡0 mod 7 AND ≡3 mod 11) exercise the full
    * I→U→D→I lifecycle on one key. Both oracles rebuild this log with
    * the same UNION ALL arithmetic.
    */
  private def cdcLog(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text", "lang", "source")
    val nullStr = lit(null).cast("string")
    docs.withColumn("seq", lit(1L)).withColumn("op", lit("I"))
      .unionByName(docs.filter(col("doc_id") % 7 === 0)
        .withColumn("text", concat(col("text"), lit(" v2")))
        .withColumn("seq", lit(2L)).withColumn("op", lit("U")))
      .unionByName(docs.filter(col("doc_id") % 11 === 3)
        .select(col("doc_id"), nullStr.as("text"), nullStr.as("lang"),
          nullStr.as("source"))
        .withColumn("seq", lit(3L)).withColumn("op", lit("D")))
      .unionByName(docs
        .filter(col("doc_id") % 11 === 3 && col("doc_id") % 2 === 0)
        .withColumn("text", concat(col("text"), lit(" v3")))
        .withColumn("seq", lit(4L)).withColumn("op", lit("I")))
  }

  /** The synthesized web page shared by x_text_extract_html and its
    * streaming twin: title with an entity, style/script/comment
    * subtrees to drop, block tags, anchors injected around 'table'
    * tokens — every branch of the extraction chain exercised. The
    * oracle rebuilds the identical string with `||` concatenation.
    */
  private def syntheticHtml: org.apache.spark.sql.Column = {
    val body = regexp_replace(col("text"),
      " table ", " <a href=t>table</a> ")
    concat(
      lit("<html><head><title>Doc "), col("doc_id").cast("string"),
      lit(" &amp; "), col("source"),
      lit("</title><style>p { color: red }</style>"),
      lit("<script>if (1 &lt; 2) { go() }</script></head>"),
      lit("<body><!-- nav boilerplate --><h1>"), upper(col("lang")),
      lit("</h1><p>"), body,
      lit("</p><div>&nbsp;&quot;"), col("lang"),
      lit("&#39;s&quot; x &gt; y</div></body></html>"))
  }

  /** The point-layer fixture shared by the ref_layer_* queries: customer
    * attributes with geometry = (c_acctbal, c_custkey·0.5), written to a
    * fresh layer and read back through the connector. Both oracles replay
    * the same x/y recomputation, so the formula must stay in ONE place.
    */
  private def customerPointLayer(s: SparkSession, dir: String,
                                 title: String): DataFrame = {
    HostedStore.dropByTitle(title)
    val pts = graft.api.Geometry.withPointGeometry(
      t(s, dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .withColumn("y0", col("c_custkey") * lit(0.5)),
      "c_acctbal", "y0").drop("y0")
    val id = HostedStore.createLayer(title, pts.schema)
    HostedTables.write(pts, id, WriteMode.Append).fold(sys.error, identity)
    HostedTables.read(s, id)
  }

  /** The curation-pipeline CTE chain shared by the x_pipeline_curate and
    * x_pipeline_funnel oracles — ends in `taken` (the token-budget
    * survivors), mirroring [[curateStages]] stage for stage.
    */
  private val curatePipelineCtes: String =
    """quality AS (
      |  SELECT * FROM documents WHERE len(string_split(text, ' ')) >= 20),
      |keepers AS (SELECT min(doc_id) AS doc_id FROM quality GROUP BY text),
      |deduped AS (SELECT q.* FROM quality q JOIN keepers USING (doc_id)),
      |cw AS (SELECT doc_id, string_split(text, ' ') AS w FROM deduped
      |       WHERE doc_id % 7 <> 0),
      |csh AS (SELECT doc_id,
      |         unnest(list_distinct([array_to_string(w[i:i+7], ' ')
      |                               for i in range(1, len(w) - 6)])) AS shingle
      |        FROM cw),
      |rw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |       WHERE doc_id % 7 = 0),
      |rsh AS (SELECT DISTINCT
      |         unnest(list_distinct([array_to_string(w[i:i+7], ' ')
      |                               for i in range(1, len(w) - 6)])) AS shingle
      |        FROM rw),
      |contaminated AS (SELECT DISTINCT c.doc_id FROM csh c JOIN rsh USING (shingle)),
      |clean AS (SELECT * FROM deduped WHERE doc_id % 7 <> 0
      |          AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
      |mixr AS (SELECT *, row_number() OVER (PARTITION BY lang
      |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn FROM clean),
      |mixed AS (SELECT * FROM mixr WHERE rn <= CASE lang
      |            WHEN 'en' THEN 50 WHEN 'de' THEN 20 WHEN 'fr' THEN 15
      |            WHEN 'es' THEN 10 WHEN 'zh' THEN 5 ELSE 0 END),
      |toks AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
      |           md5(CAST(doc_id AS VARCHAR)) AS hx FROM mixed),
      |bud AS (SELECT doc_id, lang, n_tokens,
      |          coalesce(sum(n_tokens) OVER (ORDER BY hx, doc_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      |        FROM toks),
      |taken AS (SELECT doc_id, lang, n_tokens, cum_before,
      |            md5(CAST(doc_id AS VARCHAR)) AS hx FROM bud
      |          WHERE cum_before < 4000)""".stripMargin

  /** The curation pipeline's ordered stage frames (raw → quality gate →
    * exact dedup → decontamination → domain mix → token budget), shared
    * by the flagship composite and its funnel report so the two entries
    * can never disagree about what the stages are.
    */
  private def curateStages(s: SparkSession, dir: String): Seq[(String, DataFrame)] = {
    val docs = t(s, dir, "documents")
    val evalSet = docs.filter(col("doc_id") % 7 === 0)
    val quality = docs.filter(size(split(col("text"), " ")) >= 20)
    val deduped = quality.join(
      Dedup.exact(quality, "doc_id", "text").select("doc_id"), Seq("doc_id"))
    val clean = Dedup.decontaminateNgram(
      deduped.filter(col("doc_id") % 7 =!= 0), evalSet, "doc_id", "text", n = 8)
    val mixed = Curation.domainMix(clean, "lang", "doc_id",
      Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.15, "es" -> 0.1, "zh" -> 0.05),
      100L)
    val budgeted = Curation.takeByBudget(
      mixed.select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string")).as("__hx")),
      Seq("__hx", "doc_id"), "n_tokens", 4000L)
    Seq("raw" -> docs, "quality" -> quality, "dedup" -> deduped,
      "decontam" -> clean, "domain_mix" -> mixed, "token_budget" -> budgeted)
  }

  /** Fresh hosted copy of a fixture projection (drop + create + append). */
  private def hostedCopy(s: SparkSession, dir: String, table: String,
                         title: String, key: Option[String],
                         cols: Seq[String]): String = synchronized {
    HostedStore.dropByTitle(title)
    val df = t(s, dir, table).select(cols.map(col): _*)
    val id = HostedTables.createTable(df, title, key).fold(sys.error, identity)
    HostedTables.write(df, id, WriteMode.Append).fold(sys.error, identity)
    id
  }

  /** The shared write-mode scenario: updates = keys ≡ 0 (mod 3) with price
    * bumped by 1.0 (exact in double); inserts = keys ≡ 0 (mod 5) shifted by
    * 10^7.
    */
  private def writeScenario(s: SparkSession, dir: String, mode: WriteMode,
                            title: String): DataFrame = {
    val cols = Seq("o_orderkey", "o_orderstatus", "o_totalprice")
    val id = hostedCopy(s, dir, "orders", title, Some("o_orderkey"), cols)
    val orders = t(s, dir, "orders").select(cols.map(col): _*)
    val updates = orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
    val inserts = orders.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
    val src = updates.unionByName(inserts)
    val key = if (mode.requiresKey) Some("o_orderkey") else None
    HostedTables.write(src, id, mode, key).fold(sys.error, identity)
    HostedTables.read(s, id).orderBy("o_orderkey", "o_totalprice")
  }

  private val writeScenarioSourceSql =
    """s AS (SELECT o_orderkey, o_orderstatus, o_totalprice + 1.0 AS o_totalprice
      |        FROM orders WHERE o_orderkey % 3 = 0
      |      UNION ALL
      |      SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice
      |        FROM orders WHERE o_orderkey % 5 = 0),
      |t AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders)""".stripMargin

  /** DuckDB snippet: count of `marker` occurrences in ' '||text||' '. */
  private def markerCountSql(marker: String): String = {
    val esc = marker.replace("'", "''")
    s"(length(' ' || text || ' ') - length(replace(' ' || text || ' ', '$esc', ''))) / ${marker.length}"
  }

  private val shinglesSql =
    """words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id,
      |         unnest(list_distinct([array_to_string(w[i:i+2], ' ')
      |                               for i in range(1, len(w) - 1)])) AS shingle
      |         FROM words)""".stripMargin

  private val minhashSigSql =
    (0 until 8).map(i => s"min(md5(shingle || '#$i')) AS mh$i").mkString(", ")

  /** Jaccard pair CTEs (`... , jac AS (...)`), optionally dropping
    * stop-shingles appearing in more than `cap` docs — must mirror the
    * Spark operator's `maxShingleFreq` exactly for hash parity.
    */
  private def jaccardPairsSql(cap: Option[Int]): String = {
    val shf = cap match {
      case Some(c) =>
        s"""ok AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= $c),
           |shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN ok USING (shingle))""".stripMargin
      case None => "shf AS (SELECT doc_id, shingle FROM sh)"
    }
    s"""$shinglesSql,
       |$shf,
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shf GROUP BY doc_id),
       |common AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_common
       |             FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |             GROUP BY 1, 2),
       |jac AS (SELECT c.a, c.b, c.n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
       |               c.n_common / (sa.n_sh + sb.n_sh - c.n_common) AS jaccard
       |          FROM common c
       |          JOIN sizes sa ON sa.doc_id = c.a
       |          JOIN sizes sb ON sb.doc_id = c.b)""".stripMargin
  }

  /** Stop-shingle doc-frequency cap used by the oracle-facing jaccard
    * query (Spark and DuckDB sides both). */
  private val jaccardFreqCap = 20

  /** Sampling modulus for the sampled-truth eval twins: a doc is in the
    * truth sample iff its shuffleShards hash (15 md5 hex chars as a
    * non-negative long) ≡ 0 (mod this). 2 keeps the sf-fixture counts
    * non-trivial; a 100 TB deployment raises it to taste — the
    * estimator's shape is modulus-independent.
    */
  private val evalSampleMod = 2

  /** Query-sampling modulus for the IVF autotune sweep — the same
    * md5-residue convention as [[evalSampleMod]] (deterministic,
    * partition-independent, engine-replayable); at production scale
    * this grows with the corpus so the |sample|·|members| truth pass
    * stays flat (the BenchSf1 `ann_autotune` probe's regime).
    */
  private val annTuneSampleMod = 10

  /** The sampled exact-Jaccard truth CTEs (`samp …, sjac`): the
    * [[jaccardPairsSql]] chain restricted to the md5-sampled doc subset,
    * with CTE names disjoint from the LSH chain's so the eval oracle can
    * hold both in one WITH.
    */
  private def jaccardPairsSampledSql(mod: Int): String =
    s"""samp AS (SELECT doc_id, text FROM documents
       |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % $mod = 0),
       |swords AS (SELECT doc_id, string_split(text, ' ') AS w FROM samp),
       |ssh AS (SELECT doc_id,
       |          unnest(list_distinct([array_to_string(w[i:i+2], ' ')
       |                                for i in range(1, len(w) - 1)])) AS shingle
       |        FROM swords),
       |ssizes AS (SELECT doc_id, count(*) AS n_sh FROM ssh GROUP BY doc_id),
       |scommon AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_common
       |              FROM ssh a JOIN ssh b
       |                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |              GROUP BY 1, 2),
       |sjac AS (SELECT c.a, c.b,
       |                c.n_common / (sa.n_sh + sb.n_sh - c.n_common) AS jaccard
       |           FROM scommon c
       |           JOIN ssizes sa ON sa.doc_id = c.a
       |           JOIN ssizes sb ON sb.doc_id = c.b)""".stripMargin

  // LSH banding for the oracle-facing minhash-pairs query: the md5Base
  // double-hash family, so DuckDB can replay the exact signature/band/
  // bucket pipeline bit-for-bit (the operator's production default is the
  // cheaper xxhash64-based family). One md5 per shingle; family member i
  // is (h1 + (i+1)·h2) mod P with h1/h2 the two md5 halves — DuckDB's
  // ('0x'||hex)::BIGINT equals Spark's conv(hex, 16, 10) (verified).
  private val lshNumHashes = 128
  private val lshBandCount = 16
  private val lshBucketCap = 100
  private val lshP = graft.operators.Dedup.Hashers.P
  private val lshBaseSql =
    s"""shh AS (SELECT doc_id,
       |  ('0x' || substr(md5(shingle), 1, 15))::BIGINT % $lshP AS h1m,
       |  ('0x' || substr(md5(shingle), 17, 15))::BIGINT % $lshP AS h2m
       |  FROM sh)""".stripMargin
  private val lshSigSql =
    (0 until lshNumHashes)
      .map(i => s"min((h1m + ${i + 1} * h2m) % $lshP) AS mh$i").mkString(", ")
  /** 128-way signature-agreement count for the corpus-overlap oracle.
    * A list literal + list_filter, NOT a chained `+` — DuckDB's binder
    * recurses per binary op and overflows its 128-deep limit on a
    * 128-term sum; a 128-element list literal binds flat.
    */
  private val overlapMatchSql =
    (0 until lshNumHashes)
      .map(i => s"sa.mh$i = sb.mh$i")
      .mkString("len(list_filter([", ", ", "], x -> x))")

  private val lshBandsSql = {
    val r = lshNumHashes / lshBandCount
    (0 until lshBandCount).map { b =>
      val key = (b * r until (b + 1) * r).map(i => s"mh$i").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($key) AS key FROM sig"
    }.mkString("\n  UNION ALL ")
  }

  /** Persisted-signature dedup-serve oracle: batch signatures recomputed
    * from text (as the operator does), corpus signatures and band keys
    * read FROM the staged parquet registry; semi-join on the batch's
    * band keys, corpus-side bucket cap, 128-way agreement as a flat
    * list literal (binder-depth lesson), integer gate ⌈0.7·128⌉ = 90.
    */
  private def sigServeOracle(registryCte: String): String = {
    val r = lshNumHashes / lshBandCount
    val batchBands = (0 until lshBandCount).map { b =>
      val key = (b * r until (b + 1) * r).map(i => s"mh$i").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($key) AS key FROM bsig"
    }.mkString("\n  UNION ALL ")
    val corpBands = (0 until lshBandCount).map { b =>
      val key = (b * r + 1 to (b + 1) * r).map(i => s"sig[$i]").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($key) AS key FROM csig"
    }.mkString("\n  UNION ALL ")
    val agree = (0 until lshNumHashes).map(i => s"c.sig[${i + 1}] = b.mh$i")
      .mkString("len(list_filter([", ", ", "], x -> x))")
    s"""WITH $shinglesSql,
       |$lshBaseSql,
       |bsig AS (SELECT doc_id, $lshSigSql FROM shh
       |         WHERE doc_id % 5 = 0 GROUP BY doc_id),
       |csig AS ($registryCte),
       |bbands AS (
       |  $batchBands),
       |cbands AS (
       |  $corpBands),
       |hitk AS (SELECT DISTINCT band, key FROM bbands),
       |chit AS (SELECT c.doc_id, c.band, c.key
       |         FROM cbands c JOIN hitk USING (band, key)),
       |okk AS (SELECT band, key FROM chit
       |        GROUP BY band, key HAVING count(*) <= $lshBucketCap),
       |cand AS (SELECT DISTINCT ch.doc_id AS cid, bb.doc_id AS bid
       |         FROM chit ch JOIN okk USING (band, key)
       |         JOIN bbands bb USING (band, key)),
       |ver AS (SELECT cand.bid, cand.cid,
       |    CAST($agree AS BIGINT) AS n_agree
       |  FROM cand JOIN csig c ON c.doc_id = cand.cid
       |  JOIN bsig b ON b.doc_id = cand.bid)
       |SELECT bid AS doc_id, cid AS corpus_id, n_agree
       |FROM ver WHERE n_agree >= 90
       |ORDER BY doc_id, corpus_id""".stripMargin
  }

  private lazy val sigPersistedOracle: String = sigServeOracle(
    s"""SELECT doc_id, sig
       |         FROM read_parquet('$sigIdxDir/sigs/*.parquet')""".stripMargin)

  // Quantized-hyperplane LSH for the oracle-facing embedding-pairs query.
  // Embedding components are quantized to floor(x·10⁶) — every product
  // against the integer hyperplane weights and every dot-product sum is
  // exact in IEEE doubles (≪ 2⁵³), so Spark's VecDot and DuckDB's
  // list_dot_product produce identical signature bits. The weights below
  // are the same Similarity.hyperplane literals the operator plans with.
  private val hpTables = 16
  private val hpPlanes = 8

  // The events fixture's event-type taxonomy — a POLICY list shared by
  // the x_stream_drift query and its oracle so both sides fold the same
  // per-category χ² terms in the same order.
  private val driftTaxonomy = Seq("click", "error", "purchase", "signup", "view")
  private val hpDim = 64 // embeddings fixture dimension (both SFs)
  private val hpBucketCap = 100

  // SemDeDup (cluster-then-prune) parameters for the oracle-facing
  // semantic-dedup query: 16 deterministic cells, τ = 2/5 tested exactly
  // in integer space (dq²·d² vs n²·na2·nb2 — DECIMAL in Spark, HUGEINT in
  // DuckDB), over-cap cells skipped.
  private val semNlist = 16
  private val semCellCap = 250
  private val semThreshNum = 2L
  private val semThreshDen = 5L
  /** The LSH-ANN oracle WITH-chain (qv → stacked → qs → cand → p → r):
    * quantized-hyperplane bucket assignment, shared-bucket candidates,
    * exact cosine re-rank to top-10. Shared by x_sim_ann_lsh and the
    * retrieval-evaluation oracle (which joins it against the exact
    * brute-force chain).
    */
  private lazy val lshAnnOracleChain: String = {
    val sigUnion = (0 until 12).map(tb =>
      s"SELECT vec_id, $tb AS t, ${hpSigSql(tb, planes = 4)} AS sig FROM qv")
      .mkString("\nUNION ALL\n")
    s"""WITH qv AS (SELECT vec_id,
       |         [CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS DOUBLE)
       |          for x in embedding] AS q
       |       FROM embeddings),
       |stacked AS (
       |$sigUnion),
       |qs AS (SELECT vec_id AS qid, t, sig FROM stacked WHERE vec_id < 5),
       |cand AS (SELECT DISTINCT s.vec_id AS id, q2.qid
       |           FROM stacked s JOIN qs q2 ON s.t = q2.t AND s.sig = q2.sig
       |          WHERE s.vec_id <> q2.qid),
       |p AS (SELECT cand.qid, cand.id,
       |        list_cosine_similarity(ec.embedding, eq.embedding) AS cos
       |      FROM cand JOIN embeddings ec ON ec.vec_id = cand.id
       |                JOIN embeddings eq ON eq.vec_id = cand.qid),
       |r AS (SELECT qid, id,
       |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
       |      FROM p)""".stripMargin
  }

  private def hpSigSql(tbl: Int, planes: Int = hpPlanes): String =
    (0 until planes).map { p =>
      val w = Similarity.hyperplane(tbl, p, hpDim)
        .map(x => x.toLong.toString + ".0").mkString("[", ",", "]")
      s"(CASE WHEN list_dot_product(q, $w) >= 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")

  /** BPE pair-induction oracle CTEs (shared by x_bpe_pairs and the
    * subword tokenizer): ends in `bpt(pair, n)` — the top-`k` adjacent
    * symbol pairs by occurrence-weighted count, ties to the smaller pair.
    */
  private def bpeCtes(k: Int): String =
    s"""bpw AS (SELECT w, count(*) AS freq FROM
       |    (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  GROUP BY w),
       |bpp AS (SELECT freq,
       |    unnest([substring(w, i, 2) for i in range(1, length(w))]) AS pair
       |  FROM bpw WHERE length(w) >= 2),
       |bpt AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS n
       |        FROM bpp GROUP BY pair ORDER BY n DESC, pair LIMIT $k)""".stripMargin

  /** DSIR importance-weight replay (shared by x_dsir_weights and the
    * streaming gate x_stream_dsir — bit-identical scores): per-token
    * ratio (ct+1)/(cs+1) as one double division; per-doc fold in sorted
    * token order (list_reduce ≡ aggregate/sort_array; 0.0 seed +
    * positive ratios → identical IEEE sums).
    */
  private def dsirSql: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |              FROM documents),
      |scnt AS (SELECT tok, count(*) AS cs FROM toks GROUP BY tok),
      |tcnt AS (SELECT tok, count(*) AS ct FROM toks
      |         WHERE doc_id IN (SELECT doc_id FROM documents
      |                          WHERE source = 'src0')
      |         GROUP BY tok),
      |ratio AS (SELECT s.tok,
      |            CAST(coalesce(t.ct, 0) + 1 AS DOUBLE) /
      |              CAST(s.cs + 1 AS DOUBLE) AS r
      |          FROM scnt s LEFT JOIN tcnt t ON t.tok = s.tok)
      |SELECT k.doc_id, count(*) AS n_tokens,
      |       list_reduce(list(k.r ORDER BY k.tok), (a, b) -> a + b)
      |         AS dsir_score
      |FROM (SELECT toks.doc_id, toks.tok, ratio.r
      |      FROM toks JOIN ratio ON ratio.tok = toks.tok) k
      |GROUP BY k.doc_id ORDER BY k.doc_id""".stripMargin

  /** NB-margin quality-classifier oracle CTEs (shared by
    * x_quality_classifier and the RAG pipeline): ends in
    * `nbscore(doc_id, n_tokens, score)`. Integer floor-division rate
    * margins (`//` ≡ Spark's `div` on non-negative counts);
    * sum(BIGINT) is HUGEINT in DuckDB → cast back to BIGINT.
    */
  /** Span-corruption oracle — shared verbatim by x_sft_span_corrupt
    * (batch: explode + keyed windows) and x_stream_spancorrupt (the
    * row-local zero-state fold): same (doc, pos) hash mask, lag-run
    * starts, running sentinel numbering, ordered reassembly; empty
    * aggregates coalesce to '' to match array_join over an empty array.
    * Convergence to the identical table IS the twin gate.
    */
  private lazy val spanCorruptOracle: String =
    """WITH sctoks AS (SELECT doc_id, i - 1 AS pos,
      |    string_split(text, ' ')[i] AS tok
      |  FROM documents,
      |    unnest(range(1, len(string_split(text, ' ')) + 1)) t(i)),
      |scmk AS (SELECT doc_id, pos, tok,
      |    ((((doc_id % 1000003) * 31 + pos) % 1000003) * 2654435761)
      |      % 1000000007 % 1000 < 150 AS m
      |  FROM sctoks),
      |scst AS (SELECT *, m AND NOT coalesce(
      |    lag(m) OVER (PARTITION BY doc_id ORDER BY pos), false) AS start
      |  FROM scmk),
      |scks AS (SELECT *, CAST(sum(CASE WHEN start THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS k
      |  FROM scst),
      |scpc AS (SELECT doc_id, pos, m, start,
      |    CASE WHEN NOT m THEN tok
      |         WHEN start THEN '<extra_id_' || k || '>' END AS in_piece,
      |    CASE WHEN m AND start THEN '<extra_id_' || k || '> ' || tok
      |         WHEN m THEN tok END AS tgt_piece
      |  FROM scks)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
      |  CAST(sum(CASE WHEN start THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
      |  coalesce(string_agg(in_piece, ' ' ORDER BY pos), '') AS input_text,
      |  coalesce(string_agg(tgt_piece, ' ' ORDER BY pos), '') AS target_text
      |FROM scpc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Persisted-calibration serve oracle — shared verbatim by
    * x_quality_calibrate_serve (batch join serve) and x_stream_calibrate
    * (plan-constant streaming fold): both converge to the identical
    * table, and scoring + calibration replay FROM the staged parquet
    * artifacts alone (greatest-lo step semantics, below-range clamps to
    * the first bucket).
    */
  private lazy val calibrateServeOracle: String =
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
       |  GROUP BY s.doc_id, s.score)
       |SELECT j.doc_id, j.score,
       |  coalesce(c2.fitted_permille,
       |    (SELECT fitted_permille FROM cal ORDER BY lo LIMIT 1))
       |    AS calibrated_permille
       |FROM j LEFT JOIN cal c2 ON c2.lo = j.blo
       |ORDER BY j.doc_id""".stripMargin

  /** Greedy k-center oracle: the same 8 farthest-point rounds unrolled —
    * integer squared distances on the quantized lattice, max-min-dist
    * argmax with id tie-break. Every CTE that is read more than once is
    * MATERIALIZED (inlined, the selected-set chain re-expands
    * exponentially — the PCA-oracle lesson).
    */
  private lazy val kcenterOracle: String = {
    val rounds = (1 until 8).map { r =>
      s"""km$r AS MATERIALIZED (SELECT c.vec_id, c.q, c.n2,
         |    min(c.n2 + s.n2 - 2 * CAST(list_sum(
         |      [c.q[i] * s.q[i] for i in range(1, len(c.q) + 1)]) AS BIGINT))
         |      AS md
         |  FROM kn c, ksel${r - 1} s
         |  WHERE c.vec_id NOT IN (SELECT vec_id FROM ksel${r - 1})
         |  GROUP BY c.vec_id, c.q, c.n2),
         |kp$r AS MATERIALIZED (SELECT $r AS round, vec_id, q, n2, md AS score
         |  FROM km$r ORDER BY md DESC, vec_id LIMIT 1),
         |ksel$r AS MATERIALIZED (SELECT * FROM ksel${r - 1}
         |  UNION ALL SELECT * FROM kp$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH kq AS MATERIALIZED (SELECT vec_id,
       |    [CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
       |     for x in embedding] AS q
       |  FROM embeddings),
       |kn AS MATERIALIZED (SELECT vec_id, q,
       |    CAST(list_sum([q[i] * q[i]
       |                   for i in range(1, len(q) + 1)]) AS BIGINT) AS n2
       |  FROM kq),
       |ksel0 AS MATERIALIZED (SELECT 0 AS round, vec_id, q, n2, n2 AS score
       |  FROM kn ORDER BY n2 DESC, vec_id LIMIT 1),
       |$rounds
       |SELECT round, vec_id, score FROM ksel7 ORDER BY round""".stripMargin
  }

  /** Power-iteration PCA oracle: replays Embeddings.dominantDirectionReport
    * to the bit — quantized HUGEINT Gram + column sums in one pass over
    * the 64-dim fixture, scaled covariance M = n·G − ssᵀ, then the SAME
    * 12 iterations of v ← trunc((M·v)·10⁶ / max|M·v|) unrolled as CTE
    * pairs (matvec, then the exact-divisible truncation identity — `%`
    * is truncated-remainder in both engines, and `//` of an exactly
    * divisible numerator equals truncation for either sign).
    */
  private lazy val pcaOracle: String = {
    val iters = (1 to 12).map { k =>
      val prev = if (k == 1) "pcav0" else s"pcav${k - 1}"
      // MATERIALIZED: pcav_k reads pcaw_k twice (values + max-abs) —
      // inlined, the chain re-expands 2^k times and never finishes
      s"""pcaw$k AS MATERIALIZED (SELECT m.i, sum(m.val * v.val) AS raw
         |  FROM pcam m JOIN $prev v ON v.i = m.j GROUP BY m.i),
         |pcav$k AS MATERIALIZED (SELECT i,
         |    (raw * 1000000 - (raw * 1000000) % mx) // mx AS val
         |  FROM pcaw$k, (SELECT max(abs(raw)) AS mx FROM pcaw$k))""".stripMargin
    }.mkString(",\n")
    s"""WITH pcaq AS MATERIALIZED (SELECT vec_id, label,
       |    [CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS HUGEINT)
       |     for x in embedding] AS q
       |  FROM embeddings),
       |pcan AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM pcaq),
       |pcag AS (SELECT i, j, sum(q[i] * q[j]) AS g
       |  FROM pcaq, range(1, 65) r1(i), range(1, 65) r2(j) GROUP BY i, j),
       |pcas AS (SELECT i, sum(q[i]) AS s
       |  FROM pcaq, range(1, 65) r(i) GROUP BY i),
       |pcam AS (SELECT g.i, g.j,
       |    (SELECT n FROM pcan) * g.g - si.s * sj.s AS val
       |  FROM pcag g JOIN pcas si ON si.i = g.i JOIN pcas sj ON sj.i = g.j),
       |pcav0 AS (SELECT i, CAST(1 AS HUGEINT) AS val FROM range(1, 65) r(i)),
       |$iters,
       |pcap AS (SELECT vec_id, label, sum(q[v.i] * v.val) AS p
       |  FROM pcaq, pcav12 v GROUP BY vec_id, label)
       |SELECT label, count(*) AS n_vecs,
       |  CAST(sum(p) AS BIGINT) AS sum_proj,
       |  CAST(sum(abs(p)) AS BIGINT) AS sum_abs_proj
       |FROM pcap GROUP BY label ORDER BY label""".stripMargin
  }

  private def nbCtes(): String =
    """nbtoks AS (SELECT doc_id, source,
      |         unnest(string_split(text, ' ')) AS tok FROM documents),
      |nbg AS (SELECT tok, count(*) AS c FROM nbtoks WHERE source = 'src0' GROUP BY tok),
      |nbb AS (SELECT tok, count(*) AS c FROM nbtoks WHERE source <> 'src0' GROUP BY tok),
      |nbng AS (SELECT count(*) AS n FROM nbtoks WHERE source = 'src0'),
      |nbnb AS (SELECT count(*) AS n FROM nbtoks WHERE source <> 'src0'),
      |nbmodel AS (SELECT coalesce(nbg.tok, nbb.tok) AS tok,
      |    (coalesce(nbg.c, 0) * 1000000) // (SELECT n FROM nbng)
      |      - (coalesce(nbb.c, 0) * 1000000) // (SELECT n FROM nbnb) AS weight
      |  FROM nbg FULL OUTER JOIN nbb ON nbg.tok = nbb.tok),
      |nbscore AS (SELECT t.doc_id, count(*) AS n_tokens,
      |    CAST(sum(coalesce(m.weight, 0)) AS BIGINT) AS score
      |  FROM nbtoks t LEFT JOIN nbmodel m ON m.tok = t.tok
      |  GROUP BY t.doc_id)""".stripMargin

  /** BM25 oracle CTE chain (shared by x_text_bm25 and the RRF hybrid):
    * ends in a relation `lex(qid, id, rank)` ranked to `k` per query.
    * Constants are interpolated from the SAME Scala doubles the Spark
    * side bakes (shortest round-trip repr → identical bit patterns), and
    * the per-(query, doc) sum is a token-ordered left fold on both sides
    * (list_reduce ≡ aggregate(sort_array, 0.0, +); 0.0 + x is exact for
    * x > 0).
    */
  /** The corpus-statistics half of the BM25 oracle (tf/df/dl/avgdl) plus
    * the default prefix-query term set `bq`.
    */
  private def bm25CorpusCtes: String =
    """btoks AS (SELECT doc_id AS id,
      |         unnest(string_split(text, ' ')) AS tok FROM documents),
      |btf AS (SELECT id, tok, count(*) AS tf FROM btoks GROUP BY 1, 2),
      |bdf AS (SELECT tok, count(*) AS df FROM
      |         (SELECT DISTINCT id, tok FROM btoks) GROUP BY tok),
      |bdl AS (SELECT id, count(*) AS dl FROM btoks GROUP BY id),
      |bst AS (SELECT CAST(count(*) AS DOUBLE) AS n,
      |         CAST(sum(len(string_split(text, ' '))) AS DOUBLE)
      |           / CAST(count(*) AS DOUBLE) AS avgdl
      |       FROM documents),
      |bq AS (SELECT DISTINCT doc_id AS qid,
      |        unnest(list_slice(string_split(text, ' '), 1, 5)) AS tok
      |      FROM documents WHERE doc_id < 3)""".stripMargin

  /** One BM25 scoring chain against a (qid, tok) query CTE, ending in
    * `<lexName>(qid, id, rank ≤ k)` — reused for the plain ranking and
    * for each pass of the PRF composite.
    */
  private def bm25Chain(queryCte: String, contribName: String,
                        scoredName: String, lexName: String, k: Int,
                        k1: Double = 1.2, b: Double = 0.75): String =
    s"""$contribName AS (SELECT q.qid, btf.id, q.tok,
       |    ((bst.n - bdf.df + 0.5) / (bdf.df + 0.5))
       |      * (btf.tf * ${k1 + 1.0})
       |      / (btf.tf + $k1 * (${1.0 - b} + $b * (bdl.dl / bst.avgdl))) AS t
       |  FROM $queryCte q JOIN btf ON btf.tok = q.tok JOIN bdf ON bdf.tok = q.tok
       |  JOIN bdl ON bdl.id = btf.id, bst),
       |$scoredName AS (SELECT qid, id,
       |    list_reduce(list(t ORDER BY tok), (a, x) -> a + x) AS score
       |  FROM $contribName GROUP BY qid, id),
       |$lexName AS (SELECT qid, id, rank FROM
       |        (SELECT qid, id,
       |           row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rank
       |         FROM $scoredName) WHERE rank <= $k)""".stripMargin

  private def bm25Ctes(k: Int, k1: Double = 1.2, b: Double = 0.75): String =
    s"""$bm25CorpusCtes,
       |${bm25Chain("bq", "bcontrib", "bscored", "lex", k, k1, b)}""".stripMargin

  // ------------------------------------------------- reference surface

  val referenceQueries: Map[String, Q] = Map(
    "ref_scan_pushdown" -> ((s, dir) => {
      val id = hostedCopy(s, dir, "orders", "q_scan_src", None,
        Seq("o_orderkey", "o_custkey", "o_totalprice"))
      HostedTables.read(s, id)
        .filter(col("o_totalprice") > 150000.0)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    "ref_name_normalize" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"), ServiceName.normalizeCol(col("p_name")).as("svc_name"))
        .orderBy("p_partkey")),

    "ref_utc_normalize" -> ((s, dir) =>
      t(s, dir, "orders") // Tables.load applies TimestampNorm.toUtc
        .select(col("o_orderkey"), unix_millis(col("o_orderdate")).as("ts_ms"))
        .orderBy("o_orderkey")),

    "ref_chunk_ids" -> ((s, dir) =>
      Chunker.withChunkIds(
          t(s, dir, "orders").select("o_orderkey"), Seq("o_orderkey"), 500)
        .select("o_orderkey", "chunk_id")
        .orderBy("o_orderkey")),

    "ref_chunk_report" -> ((s, dir) =>
      Chunker.withChunkIds(
          t(s, dir, "orders").select("o_orderkey"), Seq("o_orderkey"), 500)
        .groupBy("chunk_id")
        .agg(count(lit(1)).as("n_rows"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
        .orderBy("chunk_id")),

    "ref_write_append" -> ((s, dir) => writeScenario(s, dir, WriteMode.Append, "q_wr_append")),
    "ref_write_overwrite" -> ((s, dir) => writeScenario(s, dir, WriteMode.Overwrite, "q_wr_overwrite")),
    "ref_write_upsert" -> ((s, dir) => writeScenario(s, dir, WriteMode.Upsert, "q_wr_upsert")),
    "ref_write_update" -> ((s, dir) => writeScenario(s, dir, WriteMode.Update, "q_wr_update")),
    "ref_write_insert" -> ((s, dir) => writeScenario(s, dir, WriteMode.Insert, "q_wr_insert")),

    "ref_create_table" -> ((s, dir) => {
      val id = hostedCopy(s, dir, "part", "q_create_part", Some("p_partkey"),
        Seq("p_partkey", "p_name", "p_brand", "p_retailprice"))
      HostedTables.read(s, id).orderBy("p_partkey")
    }),

    "ref_save_orchestrator" -> ((s, dir) => {
      HostedStore.dropByTitle("q_save_customer")
      val df = t(s, dir, "customer")
      val (id, _) = HostedTables.save(df, "q_save_customer",
        Some("c_custkey"), chunkSize = 500).fold(sys.error, identity)
      // Idempotent re-save (resolve existing + upsert) must be a no-op.
      HostedTables.save(df, "q_save_customer", Some("c_custkey"), chunkSize = 500)
        .fold(sys.error, identity)
      HostedTables.read(s, id).orderBy("c_custkey")
    }),

    "ref_layer_points" -> ((s, dir) => {
      // The spatial read surface (ap:246-249): a point feature LAYER —
      // attributes + the geometry: struct<x,y> convention column — served
      // through the same connector verbs as tables. The layer item is a
      // store fixture (portal layers pre-exist; the reference never
      // creates one), the READ path is the capability under test. The
      // oracle recomputes x/y from the parquet source: both engines do
      // one exact long→double scale, so the doubles replay bit-for-bit.
      val back = customerPointLayer(s, dir, "q_layer_points")
      back.select(col("c_custkey"), col("c_name"),
          graft.api.Geometry.x(back).as("x"), graft.api.Geometry.y(back).as("y"))
        .orderBy("c_custkey")
    }),

    "ref_layer_bbox" -> ((s, dir) => {
      // The envelope query on a point layer (`geometryEnvelope` on
      // `table.query`, ap:246-249): a bounding-box predicate over the
      // geometry convention column pushes down as nested-path filters, so
      // the service pages back only in-box features. Same fixture as
      // ref_layer_points; the oracle replays the box as a plain WHERE
      // over the recomputed doubles (both engines compare exact values).
      val back = customerPointLayer(s, dir, "q_layer_bbox")
      back.filter(graft.api.Geometry.inEnvelope(back, 0.0, 100.0, 4000.0, 10000.0))
        .select(col("c_custkey"),
          graft.api.Geometry.x(back).as("x"), graft.api.Geometry.y(back).as("y"))
        .orderBy("c_custkey")
    }),

    "ref_csv_stage" -> ((s, dir) => {
      // Reference parity for the analyze→publishParameters CSV round-trip
      // (src/agol_pandas.py:441-447, 515): an UNTYPED csv is staged —
      // schema inferred, then canonicalized to the hosted palette
      // (string/bigint/double/timestamp) — loaded through the save
      // orchestrator, and read back through the connector. The oracle
      // re-infers the same file with DuckDB's read_csv, so the check
      // covers type canonicalization, not just the data round-trip.
      val path = writeCsvStageFixture(s, dir)
      val staged = HostedTables.stageCsv(s, path).fold(sys.error, identity)
      HostedStore.dropByTitle("q_csv_stage")
      val (id, _) = HostedTables.save(staged, "q_csv_stage", Some("doc_id"),
        chunkSize = 1000).fold(sys.error, identity)
      HostedTables.read(s, id).orderBy("doc_id")
    }))

  /** Deterministic untyped-CSV staging fixture derived from the documents
    * table (driver-side file IO mirrors the reference's temp-file staging,
    * `src/agol_pandas.py:70-84`; the engine work under test is the
    * inference + canonicalization + hosted round-trip in `ref_csv_stage`).
    * `score` values are exact quarters and `created` is minute-granular, so
    * both engines parse identical doubles/timestamps from the text.
    */
  private val csvStagePath = "/tmp/graft_csv_stage.csv"
  private def writeCsvStageFixture(s: SparkSession, dir: String): String = synchronized {
    val rows = t(s, dir, "documents")
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id").collect()
    // driver-side fixture staging is fixture-scale BY DESIGN (mirrors the
    // reference's temp-file path); refuse corpus-scale inputs instead of
    // silently materializing them on the driver
    require(rows.length <= 200000,
      s"CSV staging fixture collects driver-side: ${rows.length} docs " +
        "is corpus-scale — point this at an sf<=0.1 fixture dir")
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    val base = java.time.LocalDateTime.of(2020, 1, 1, 0, 0, 0)
    val sb = new StringBuilder("doc_id,lang,source,n_chars,score,created\n")
    rows.foreach { r =>
      val id = r.getLong(0)
      val nc = r.getLong(3)
      sb.append(id).append(',').append(r.getString(1)).append(',')
        .append(r.getString(2)).append(',').append(nc).append(',')
        .append(nc / 4.0).append(',')
        .append(base.plusMinutes(id).format(fmt)).append('\n')
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(csvStagePath),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    csvStagePath
  }

  /** Deterministic JSONL staging fixture derived from the documents table:
    * one JSON object per line, with every `doc_id % 13 == 0` line
    * TRUNCATED (last two chars dropped — malformed JSON) to exercise the
    * PERMISSIVE quarantine path. Driver-side file IO mirrors the CSV
    * staging fixture above; the engine work under test is the
    * schema-driven distributed parse + corrupt-record routing.
    */
  private val jsonlStagePath = "/tmp/graft_jsonl_stage.jsonl"
  private def writeJsonlStageFixture(s: SparkSession, dir: String): String = synchronized {
    val rows = t(s, dir, "documents")
      .select("doc_id", "lang", "source", "n_chars", "text")
      .orderBy("doc_id").collect()
    // same fixture-scale guard as the CSV staging twin above
    require(rows.length <= 200000,
      s"JSONL staging fixture collects driver-side: ${rows.length} docs " +
        "is corpus-scale — point this at an sf<=0.1 fixture dir")
    val sb = new StringBuilder
    rows.foreach { r =>
      val id = r.getLong(0)
      val line = s"""{"doc_id": $id, "lang": ${graft.Verify.jsonEscape(r.getString(1))}, """ +
        s""""source": ${graft.Verify.jsonEscape(r.getString(2))}, """ +
        s""""n_chars": ${r.getLong(3)}, "text": ${graft.Verify.jsonEscape(r.getString(4))}}"""
      sb.append(if (id % 13 == 0) line.dropRight(2) else line).append('\n')
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(jsonlStagePath),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    jsonlStagePath
  }

  /** Schema-driven PERMISSIVE JSONL read with corrupt-record quarantine —
    * the 100 TB ingestion surface: JSONL is line-splittable, so the parse
    * distributes; an explicit schema (never inference, which would scan
    * the corpus twice) types the clean rows; malformed lines survive
    * whole in `_corrupt_record` for the quarantine sink instead of
    * failing the job (FAILFAST) or vanishing (DROPMALFORMED).
    */
  private def readJsonlStage(s: SparkSession, path: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_corrupt_record", org.apache.spark.sql.types.StringType)))
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
  }

  /** Persisted-ANN-index staging: build the IVF/PQ index ONCE per
    * (path, sf-dir) per JVM — the serve entries then price load+serve,
    * not a rebuild per invocation (the whole point of index
    * persistence). Keyed by dir so a JVM that switches scale factors
    * rebuilds; overwrite-mode writes make the rebuild safe.
    */
  private val ivfIdxDir = "/tmp/graft_ivf_idx"
  private val ivfAppIdxDir = "/tmp/graft_ivf_idx_app"
  private val ivfCompactIdxDir = "/tmp/graft_ivf_idx_compact"
  private val fragInDir = "/tmp/graft_frag_in"
  private val fragOutDir = "/tmp/graft_frag_out"
  private val ivfDelIdxDir = "/tmp/graft_ivf_idx_del"
  private val pqIdxDir = "/tmp/graft_pq_idx"
  private val ivfpqIdxDir = "/tmp/graft_ivfpq_idx"
  private val ivfpqDelIdxDir = "/tmp/graft_ivfpq_idx_del"
  private val ivfpqAppIdxDir = "/tmp/graft_ivfpq_idx_app"
  private val ivfpqSyncIdxDir = "/tmp/graft_ivfpq_idx_cdcsync"
  private val ivfpqResIdxDir = "/tmp/graft_ivfpq_idx_res"
  private val bpeIdxDir = "/tmp/graft_bpe_idx"
  private val nbIdxDir = "/tmp/graft_nb_idx"
  private val calIdxDir = "/tmp/graft_cal_idx"
  private val sigIdxDir = "/tmp/graft_sig_idx"
  private val sigLifeDir = "/tmp/graft_sig_life"

  /** Stage the signature-registry LIFECYCLE fixture: base registry
    * (corpus slices 1–2) overwritten, slices 3–4 APPENDED as new files
    * (no rewrite of the base — the O(batch) ingest path), plus a
    * tombstone sidecar (every 20th corpus doc) for the O(ids) takedown
    * path. Shared by the appended and deleted serve entries.
    */
  private def stagedSigLifecycle(s: SparkSession, dir: String): String =
    stageIndex(sigLifeDir, dir) {
      val docs = t(s, dir, "documents")
      def sigs(f: org.apache.spark.sql.Column) =
        Dedup.signaturesFromShingles(
          Dedup.shingles(docs.filter(f), "doc_id", "text", 3),
          "doc_id", 128, Dedup.Hashers.md5Base)
      sigs(col("doc_id") % 5 === 1 || col("doc_id") % 5 === 2)
        .coalesce(1).write.mode("overwrite").parquet(s"$sigLifeDir/sigs")
      sigs(col("doc_id") % 5 === 3 || col("doc_id") % 5 === 4)
        .coalesce(1).write.mode("append").parquet(s"$sigLifeDir/sigs")
      docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 20 === 1)
        .select("doc_id")
        .coalesce(1).write.mode("overwrite").parquet(s"$sigLifeDir/tombstones")
    }
  private val unigramIdxDir = "/tmp/graft_unigram_idx"
  private val wordpieceIdxDir = "/tmp/graft_wordpiece_idx"
  private val sq8IdxDir = "/tmp/graft_sq8_idx"
  private val binIngestDir = "/tmp/graft_bin_ingest"
  private val takedownIdxDir = "/tmp/graft_ivf_idx_cdc"
  private val pqAppIdxDir = "/tmp/graft_pq_idx_app"
  private val pqDelIdxDir = "/tmp/graft_pq_idx_del"
  private val ivfDelCmpIdxDir = "/tmp/graft_ivf_idx_delcmp"
  private val pqDelCmpIdxDir = "/tmp/graft_pq_idx_delcmp"
  private val cdcCheckpointDir = "/tmp/graft_cdc_checkpoint"
  private val cdcSyncIdxDir = "/tmp/graft_ivf_idx_cdcsync"
  private val pqSyncIdxDir = "/tmp/graft_pq_idx_cdcsync"
  private val pruneStatsDir = "/tmp/graft_zorder_layout"

  /** The 8-word re-lining shared by the line-dedup batch entry, its
    * streaming twin, and their common oracle (the fixture's documents
    * are single-line; real corpora arrive with newlines).
    */
  private def relinedText: org.apache.spark.sql.Column =
    expr("array_join(transform(" +
      "sequence(0, (size(split(text, ' ')) - 1) DIV 8)," +
      " i -> array_join(slice(split(text, ' '), i * 8 + 1, 8), ' '))," +
      " '\\n')")
  private val streamTdIdxDir = "/tmp/graft_ivf_idx_streamtd"
  private val streamTdStageDir = "/tmp/graft_streamtd_log"
  private val builtIndexes = scala.collection.mutable.Map[String, String]()
  /** Stage the quality-gate model artifacts (NB token weights + isotonic
    * calibration table) once per (JVM, sf-dir) — shared by the serve,
    * streaming, and evaluation entries of the calibration pillar.
    */
  private def stagedCalibration(s: SparkSession, dir: String): String =
    stageIndex(calIdxDir, dir) {
      val docs = t(s, dir, "documents")
      val good = docs.filter(col("source") === "src0")
      val bad = docs.filter(col("source") =!= "src0")
      TextAnalysis.nbTokenWeights(good, bad, "text")
        .coalesce(1).write.mode("overwrite").parquet(s"$calIdxDir/weights")
      val scored = TextAnalysis.nbQualityScore(docs, good, bad,
          "doc_id", "text")
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
        .withColumn("y", (col("source") === "src0").cast("long"))
      Calibration.isotonicCalibrate(scored, "score", "y", 24)
        .coalesce(1).write.mode("overwrite").parquet(s"$calIdxDir/calib")
    }

  private def stageIndex(path: String, dir: String)(build: => Unit): String =
    synchronized {
      if (!builtIndexes.get(path).contains(dir)) {
        build
        builtIndexes(path) = dir
      }
      path
    }

  /** Two-era parquet fixture for schema-evolution ingestion: era v1
    * (even doc ids) has the original column set, era v2 (odd ids) adds a
    * BIGINT `score` column. Each era lands as ONE plain parquet file so
    * the oracle can address the identical files by path.
    */
  private val evoDir = "/tmp/graft_evo"
  private def writeEvolutionFixture(s: SparkSession, dir: String): (String, String) = synchronized {
    val docs = t(s, dir, "documents").select("doc_id", "lang", "n_chars")
    val v1 = graft.core.ParquetStage.stageSingleFile(
      docs.filter(col("doc_id") % 2 === 0), evoDir, "v1")
    val v2 = graft.core.ParquetStage.stageSingleFile(
      docs.filter(col("doc_id") % 2 =!= 0)
        .withColumn("score", (col("n_chars") * 2).cast("long")),
      evoDir, "v2")
    (v1, v2)
  }

  val referenceOracles: Map[String, String] = Map(
    "ref_layer_points" ->
      """SELECT c_custkey, c_name, c_acctbal AS x,
        |       CAST(c_custkey AS DOUBLE) * CAST(0.5 AS DOUBLE) AS y
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "ref_layer_bbox" ->
      """SELECT c_custkey, x, y FROM (
        |  SELECT c_custkey, c_acctbal AS x,
        |         CAST(c_custkey AS DOUBLE) * CAST(0.5 AS DOUBLE) AS y
        |  FROM customer)
        |WHERE x >= 0.0 AND x <= 4000.0 AND y >= 100.0 AND y <= 10000.0
        |ORDER BY c_custkey""".stripMargin,

    "ref_scan_pushdown" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 150000.0 ORDER BY o_orderkey""".stripMargin,

    "ref_name_normalize" ->
      """SELECT p_partkey,
        |  substring(lower(regexp_replace(regexp_replace(
        |    CASE WHEN regexp_matches(substring(trim(p_name), 1, 1), '^[0-9]$')
        |         THEN '_' || trim(p_name) ELSE trim(p_name) END,
        |    '[^\w]', '_', 'g'), '_+', '_', 'g')), 1, 128) AS svc_name
        |FROM part ORDER BY p_partkey""".stripMargin,

    "ref_utc_normalize" ->
      "SELECT o_orderkey, epoch_ms(o_orderdate) AS ts_ms FROM orders ORDER BY o_orderkey",

    "ref_chunk_ids" ->
      """SELECT o_orderkey,
        |  CAST(floor((row_number() OVER (ORDER BY o_orderkey) - 1) / 500) AS BIGINT) AS chunk_id
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "ref_chunk_report" ->
      """WITH c AS (SELECT o_orderkey,
        |  CAST(floor((row_number() OVER (ORDER BY o_orderkey) - 1) / 500) AS BIGINT) AS chunk_id
        |  FROM orders)
        |SELECT chunk_id, count(*) AS n_rows, min(o_orderkey) AS min_key,
        |       max(o_orderkey) AS max_key
        |FROM c GROUP BY chunk_id ORDER BY chunk_id""".stripMargin,

    "ref_write_append" ->
      s"""WITH $writeScenarioSourceSql
         |SELECT * FROM t UNION ALL SELECT * FROM s
         |ORDER BY o_orderkey, o_totalprice""".stripMargin,

    "ref_write_overwrite" ->
      s"""WITH $writeScenarioSourceSql
         |SELECT * FROM s ORDER BY o_orderkey, o_totalprice""".stripMargin,

    "ref_write_upsert" ->
      s"""WITH $writeScenarioSourceSql
         |SELECT * FROM s
         |UNION ALL
         |SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM s)
         |ORDER BY o_orderkey, o_totalprice""".stripMargin,

    "ref_write_update" ->
      s"""WITH $writeScenarioSourceSql
         |SELECT * FROM s WHERE o_orderkey IN (SELECT o_orderkey FROM t)
         |UNION ALL
         |SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM s)
         |ORDER BY o_orderkey, o_totalprice""".stripMargin,

    "ref_write_insert" ->
      s"""WITH $writeScenarioSourceSql
         |SELECT * FROM t
         |UNION ALL
         |SELECT * FROM s WHERE o_orderkey NOT IN (SELECT o_orderkey FROM t)
         |ORDER BY o_orderkey, o_totalprice""".stripMargin,

    "ref_create_table" ->
      """SELECT p_partkey, p_name, p_brand, p_retailprice
        |FROM part ORDER BY p_partkey""".stripMargin,

    "ref_save_orchestrator" ->
      "SELECT * FROM customer ORDER BY c_custkey",

    "ref_csv_stage" ->
      s"""SELECT doc_id, lang, source, n_chars, score, created
         |FROM read_csv('$csvStagePath', header=true)
         |ORDER BY doc_id""".stripMargin)

  // ------------------------------------------------- relational breadth

  val relationalQueries: Map[String, Q] = Map(
    "q1_pricing_summary" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          (sum(col("l_extendedprice").cast("decimal(18,2)")) * 100)
            .cast("long").as("sum_base_price_cents"),
          (sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")) * 10000).cast("long").as("sum_disc_price_e4"),
          count(lit(1)).as("count_order"),
          (sum("l_quantity") / count(lit(1))).as("avg_qty"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q18_large_orders" -> ((s, dir) => {
      // TPC-H Q18 shape: orders whose total quantity clears a threshold —
      // a HAVING aggregate driving a semi-join back to the fact tables.
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum("l_quantity").cast("long").as("total_qty"))
        .filter(col("total_qty") > 150)
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(25)
    }),

    "q_grouping_sets" -> ((s, dir) =>
      // Explicit GROUPING SETS beyond rollup/cube: per-lang, per-source,
      // and grand-total document counts in one pass, with grouping flags.
      t(s, dir, "documents")
        .groupingSets(Seq(Seq(col("lang")), Seq(col("source")), Seq()),
          col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"),
          grouping(col("lang")).cast("long").as("g_lang"),
          grouping(col("source")).cast("long").as("g_source"))
        .orderBy("g_lang", "g_source", "lang", "source")),

    "q10_returned_items" -> ((s, dir) => {
      // TPC-H Q10 shape: who returned the most revenue — 4-table join,
      // partial agg on a compound group key, top-20 as TakeOrdered.
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                col("o_orderdate") < to_timestamp(lit("1996-07-01 00:00:00")))
      t(s, dir, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")) * 10000).cast("long").as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("c_custkey"))
        .limit(20)
    }),

    "q5_local_supplier_volume" -> ((s, dir) => {
      // TPC-H Q5 shape: 6-table join where the optimizer's work — dim
      // broadcasts, join reorder, partial agg — IS the query plan. The
      // customer-supplier same-nation equi-pair rides the supplier join.
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
      t(s, dir, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")) * 10000).cast("long").as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("n_name"))
    }),

    "q6_forecast_revenue" -> ((s, dir) =>
      // TPC-H Q6 shape: pure scan-side query — every predicate (date
      // range, discount band, quantity cap) must reach the parquet scan
      // as PushedFilters; the plan is one WholeStageCodegen scan+agg.
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")) &&
                col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
                col("l_quantity") < 24)
        .agg((sum((col("l_extendedprice") * col("l_discount"))
          .cast("decimal(18,4)")) * 10000).cast("long").as("revenue_e4"))),

    "q7_volume_shipping" -> ((s, dir) => {
      // TPC-H Q7 shape: the same dimension table joined TWICE under
      // different roles (supplier nation vs customer nation) with a
      // symmetric either-direction pair predicate, then a year rollup —
      // the join-aliasing decorrelation pattern.
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      t(s, dir, "supplier")
        .join(t(s, dir, "lineitem"), col("s_suppkey") === col("l_suppkey"))
        .join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(n1, col("s_nationkey") === col("n1_key"))
        .join(n2, col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
                (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01 00:00:00")) &&
                col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")) * 10000).cast("long").as("revenue_e4"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    "q8_market_share" -> ((s, dir) => {
      // TPC-H Q8 shape: national market share inside a region — the
      // conditional-aggregate-over-join pattern. The share is emitted as
      // exact integer (numerator_e4, denominator_e4) instead of a float
      // ratio so the cross-engine hash is bit-stable.
      val nc = t(s, dir, "nation")
        .select(col("n_nationkey").as("nc_key"), col("n_regionkey").as("nc_region"))
      val ns = t(s, dir, "nation")
        .select(col("n_nationkey").as("ns_key"), col("n_name").as("supp_nation"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("p_partkey") === col("l_partkey"))
        .filter(col("p_type") === "PROMO")
        .join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(nc, col("c_nationkey") === col("nc_key"))
        .join(t(s, dir, "region"), col("nc_region") === col("r_regionkey"))
        .filter(col("r_name") === "AMERICA")
        .join(t(s, dir, "supplier"), col("s_suppkey") === col("l_suppkey"))
        .join(ns, col("s_nationkey") === col("ns_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          (sum(when(col("supp_nation") === "NATION_1",
              (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                .cast("decimal(18,4)"))
            .otherwise(lit(0).cast("decimal(18,4)"))) * 10000)
            .cast("long").as("nation_volume_e4"),
          (sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")) * 10000).cast("long").as("total_volume_e4"))
        .orderBy("o_year")
    }),

    "q14_promo_revenue" -> ((s, dir) =>
      // TPC-H Q14 shape: promotional revenue share by ship month —
      // CASE-inside-aggregate over a fact-dim join; exact integer
      // numerator/denominator instead of the float percentage.
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("p_partkey") === col("l_partkey"))
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        .groupBy(month(col("l_shipdate")).as("ship_month"))
        .agg(
          (sum(when(col("p_type") === "PROMO",
              (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                .cast("decimal(18,4)"))
            .otherwise(lit(0).cast("decimal(18,4)"))) * 10000)
            .cast("long").as("promo_revenue_e4"),
          (sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")) * 10000).cast("long").as("total_revenue_e4"))
        .orderBy("ship_month")),

    "q19_disjunctive_revenue" -> ((s, dir) =>
      // TPC-H Q19 shape: a disjunction of brand/size/quantity conjunct
      // bundles over a fact-dim join — the predicate shape that tests
      // whether the optimizer pushes a common join key through an OR of
      // otherwise-unrelated filters.
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("p_partkey") === col("l_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#13" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#14" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 30)))
        .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")) * 10000).cast("long").as("revenue_e4"))),

    "q13_customer_distribution" -> ((s, dir) => {
      // TPC-H Q13 shape: LEFT outer join with an IN-JOIN predicate (the
      // filter belongs to the join, so customers whose only orders are
      // urgent still count as zero-order customers), then a distribution
      // over the per-customer counts — two aggregations, the second on a
      // tiny key space. count(o_orderkey) (not count(*)) makes the
      // unmatched-row count 0, the outer-join subtlety the shape exists
      // to exercise.
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    "q15_top_supplier" -> ((s, dir) => {
      // TPC-H Q15 shape: quarterly revenue per supplier, then the
      // argmax-by-scalar-subquery join (revenue = max(revenue)) — ties
      // all surface, exactly as the spec's view formulation does. The
      // 1-row max aggregate is broadcast; revenue is exact e4 integer so
      // the equality join has no float boundary.
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")))
        .groupBy(col("l_suppkey"))
        .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")) * 10000).cast("long").as("total_revenue_e4"))
      val mx = rev.agg(max(col("total_revenue_e4")).as("__mx"))
      rev.join(broadcast(mx), col("total_revenue_e4") === col("__mx"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue_e4"))
        .orderBy("s_suppkey")
    }),

    "q17_small_quantity_revenue" -> ((s, dir) => {
      // TPC-H Q17 shape: per-part average-quantity gate re-joined against
      // the fact table — the correlated-aggregate decorrelation pattern.
      // The 0.2·avg threshold runs in EXACT integer space:
      // qty < 0.2·(sum/n) ⟺ 5·qty·n < sum (quantities are integral
      // doubles), so no boundary row flips between engines. Both the
      // stats aggregation and the probe shuffle on l_partkey — at scale
      // they co-partition, one exchange feeds both.
      val li = t(s, dir, "lineitem")
      val brandParts = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#23")
        .select(col("p_partkey"))
      val fact = li.join(broadcast(brandParts),
        col("l_partkey") === col("p_partkey"))
      val stats = fact.groupBy(col("l_partkey").as("__pk"))
        .agg(count(lit(1)).as("__n"),
          sum(col("l_quantity").cast("long")).as("__sum_qty"))
      fact.join(stats, col("l_partkey") === col("__pk"))
        .filter(col("l_quantity").cast("long") * 5 * col("__n") <
          col("__sum_qty"))
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("revenue_cents"),
          count(lit(1)).as("n_rows"))
    }),

    "q22_dormant_customers" -> ((s, dir) => {
      // TPC-H Q22 shape (adapted: every fixture customer has SOME order,
      // so "no orders at all" is degenerate — the anti-join runs against
      // the last year instead): above-average-balance customers with no
      // RECENT orders, per market segment. Anti-join + a scalar global
      // aggregate subquery, the classic decorrelation pair.
      val cust = t(s, dir, "customer")
      // the "above average" gate runs in EXACT integer space:
      // bal > avg ⟺ bal_cents · n > sum_cents (a float avg threshold
      // could flip boundary customers between engines by one ulp)
      val Array(sumCents, nPos) = cust.filter(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast("decimal(18,2)")) * 100).cast("long"),
          count(lit(1)))
        .head.toSeq.map(_.asInstanceOf[Long]).toArray
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("2001-01-01 00:00:00")))
        .select(col("o_custkey"))
      cust.filter(
          (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long") * nPos
            > sumCents)
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          (sum(col("c_acctbal").cast("decimal(18,2)")) * 100)
            .cast("long").as("total_bal_cents"))
        .orderBy("c_mktsegment")
    }),

    "q3_shipping_priority" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < to_timestamp(lit("1998-06-30 00:00:00")))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > to_timestamp(lit("1998-06-30 00:00:00")))
      cust.join(ord, cust("c_custkey") === ord("o_custkey"))
        .join(li, ord("o_orderkey") === li("l_orderkey"))
        .groupBy(col("l_orderkey"))
        // ×10000 BIGINT preserves ordering (positive scale factor) and
        // renders identically across engines.
        .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")) * 10000).cast("long").as("revenue_e4"))
        .orderBy(col("revenue_e4").desc, col("l_orderkey"))
        .limit(10)
    }),

    "q_window_topn" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
        .orderBy("o_custkey", "rn")
    }),

    "q_topk_orders" -> ((s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)),

    "q_join_agg_nation" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      // Dimension joins: both sides tiny — explicitly broadcast.
      cust.join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_customers"),
          (sum(col("c_acctbal").cast("decimal(18,2)")) * 100)
            .cast("long").as("sum_acctbal_cents"))
        .orderBy("r_name", "n_name")
    }),

    "q_events_densified" -> ((s, dir) =>
      // Gap-filled hourly grid per event type: explicit zeros for silent
      // hours — the feature-store prep step models need.
      graft.operators.TimeSeries.densifyHourly(
          t(s, dir, "events"), "event_type", "ts")
        .orderBy("hour_ms", "event_type")),

    "q_events_hourly" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          (sum(col("value").cast("decimal(18,2)")) * 100)
            .cast("long").as("total_value_cents"))
        .select(unix_millis(col("hour")).as("hour_ms"), col("event_type"),
          col("n"), col("total_value_cents"))
        .orderBy("hour_ms", "event_type")),

    "q21_late_suppliers" -> ((s, dir) => {
      // TPC-H Q21 shape: correlated EXISTS + NOT EXISTS (multi-supplier
      // orders where ONLY this supplier shipped late) — written as SQL
      // subqueries so Catalyst's decorrelation plans them as one semi
      // and one anti join; lateness = shipped > 60 days after order
      // (this schema carries no commit/receipt dates).
      Seq("supplier", "lineitem", "orders", "nation").foreach(n =>
        t(s, dir, n).createOrReplaceTempView(s"__q21_$n"))
      s.sql("""
        SELECT s_name, count(*) AS numwait
        FROM __q21_supplier
        JOIN __q21_lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN __q21_orders ON o_orderkey = l1.l_orderkey
        JOIN __q21_nation ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM __q21_lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM __q21_lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 25""")
    }),

    "q16_supplier_variety" -> ((s, dir) => {
      // TPC-H Q16 shape: null-aware NOT IN anti join + count(DISTINCT)
      // over a grouped join — the distinct agg plans as a two-phase
      // partial/merge expand, the NOT IN as an anti join.
      Seq("part", "lineitem", "supplier").foreach(n =>
        t(s, dir, n).createOrReplaceTempView(s"__q16_$n"))
      s.sql("""
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM __q16_part JOIN __q16_lineitem ON p_partkey = l_partkey
        WHERE p_size IN (1, 2, 3, 4, 5)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM __q16_supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        LIMIT 20""")
    }),

    "q_interval_join" -> ((s, dir) => {
      // click → purchase attribution within 30 minutes, via the same
      // intervalJoin used for the watermarked stream-stream path (batch
      // frames: the watermark is eliminated, the plan family is the same).
      val ev = t(s, dir, "events")
      EventStreams.intervalJoin(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"),
          "user_id", "30 minutes")
        .select(col("user_id"), unix_millis(col("l_ts")).as("click_ms"),
          unix_millis(col("r_ts")).as("purchase_ms"))
        .orderBy("user_id", "click_ms", "purchase_ms")
    }),

    "x_range_join_binned" -> ((s, dir) => {
      // KEYLESS range containment at scale: no user_id to hash on —
      // Spark's native plan for the bare inequality join is a
      // BroadcastNestedLoopJoin (quadratic, driver-bound broadcast).
      // Bin-and-refine restores an equi-join: the 5 busiest hours (by
      // event count) become incident windows, every event lands in its
      // epoch-hour bin, windows explode across their bins (~1 each),
      // and the exact containment predicate refines. PlanSpec gates the
      // no-BNL shape; the oracle replays with DuckDB's native
      // inequality join — same rows, different plan.
      val ev = t(s, dir, "events")
      val windows = ev
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("h")).limit(5)
        .select(unix_millis(col("h")).as("w_start"),
          (unix_millis(col("h")) + lit(3599999L)).as("w_end"))
      val points = ev.select(unix_millis(col("ts")).as("ev_ms"),
        col("event_id"), col("event_type"))
      graft.operators.AsOfJoin.binnedRangeJoin(points, windows, "ev_ms",
          "w_start", "w_end", binWidth = 3600000L)
        .select("w_start", "event_id", "ev_ms", "event_type")
        .orderBy("w_start", "event_id")
    }),

    "q_events_json" -> ((s, dir) =>
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type")),

    "q_pivot_status" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o", "P" -> "n_p"))
        .orderBy("o_orderpriority")),

    "q_exists_urgent" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "q_percentiles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // Discrete order statistics (value at rank ceil(p·n)), not
      // interpolated quantiles: the result IS a data value, so both engines
      // emit the identical float64 — no interpolation-arithmetic drift —
      // and ×100 BIGINT cents renders identically. The per-priority window
      // has ~5 partitions of n/5 rows; for a true 100 TB percentile use
      // approx_percentile (sketch-mergeable) instead — this is the exact
      // oracle-checkable form.
      val w = Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
      t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(
          Window.partitionBy("o_orderpriority")))
        .groupBy("o_orderpriority")
        .agg(
          (round(max(when(col("rn") === ceil(col("cnt") * 0.5),
            col("o_totalprice"))) * 100)).cast("long").as("median_price_cents"),
          (round(max(when(col("rn") === ceil(col("cnt") * 0.95),
            col("o_totalprice"))) * 100)).cast("long").as("p95_price_cents"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    "q_distinct_parts" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("n_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),

    "q_cube_orders" -> ((s, dir) => {
      // CUBE over (status, priority): all four grouping combinations in
      // one partial-aggregated pass (same SQL-surface idiom as ROLLUP).
      t(s, dir, "orders").createOrReplaceTempView("v_orders")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_cents
          |FROM v_orders
          |GROUP BY CUBE(o_orderstatus, o_orderpriority)
          |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    }),

    "q_rollup_nation" -> ((s, dir) => {
      // SQL surface: rollup + null-first ordering (the Dataset API's
      // ambiguity detector misfires on rollup-key sorts; the SQL path is
      // the same Catalyst plan without the Dataset-id bookkeeping).
      t(s, dir, "customer").createOrReplaceTempView("v_customer")
      t(s, dir, "nation").createOrReplaceTempView("v_nation")
      t(s, dir, "region").createOrReplaceTempView("v_region")
      s.sql(
        """SELECT /*+ BROADCAST(n, r) */
          |  r_name AS region_name, n_name AS nation_name,
          |  count(*) AS n_customers,
          |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_acctbal_cents
          |FROM v_customer c
          |JOIN v_nation n ON c.c_nationkey = n.n_nationkey
          |JOIN v_region r ON n.n_regionkey = r.r_regionkey
          |GROUP BY ROLLUP(r_name, n_name)
          |ORDER BY region_name ASC NULLS FIRST, nation_name ASC NULLS FIRST
          |""".stripMargin)
    }),

    "q_setops_customers" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val building = cust.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val wealthy = cust.filter(col("c_acctbal") > 5000.0).select("c_custkey")
      val bigSpenders = t(s, dir, "orders")
        .filter(col("o_totalprice") > 300000.0)
        .select(col("o_custkey").as("c_custkey"))
      building.intersect(wealthy).except(bigSpenders).orderBy("c_custkey")
    }),

    "q_asof_join" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      // one signup row per (user, ts): deterministic dedup for tie-safety
      val signups = events.filter(col("event_type") === "signup")
        .groupBy("user_id", "ts").agg(max("value").as("signup_value"))
      graft.operators.AsOfJoin.joinAsOf(purchases, signups,
          Seq("user_id"), "ts", "ts", Seq("signup_value"))
        .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ts_ms"),
          unix_millis(col("asof_ts")).as("signup_ts_ms"),
          (col("asof_signup_value").cast("decimal(18,2)") * 100)
            .cast("long").as("signup_value_cents"))
        .orderBy("event_id")
    }),

    "q_asof_forward" -> ((s, dir) => {
      // forward as-of: each purchase matched to the user's EARLIEST
      // click at-or-after it (post-purchase engagement) — the same
      // union-merge pass traversed in descending time.
      val events = t(s, dir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = events.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("value").as("click_value"))
      graft.operators.AsOfJoin.joinAsOf(purchases, clicks,
          Seq("user_id"), "ts", "ts", Seq("click_value"),
          direction = "forward")
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"),
          unix_millis(col("asof_ts")).as("click_ts_ms"),
          (col("asof_click_value").cast("decimal(18,2)") * 100)
            .cast("long").as("click_value_cents"))
        .orderBy("event_id")
    }),

    "q_asof_nearest" -> ((s, dir) => {
      // nearest as-of (attribution): each purchase matched to the
      // user's CLOSEST click either side, ties to the earlier one —
      // exact interval comparison, never epoch-to-double rounding.
      val events = t(s, dir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = events.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("value").as("click_value"))
      graft.operators.AsOfJoin.joinAsOf(purchases, clicks,
          Seq("user_id"), "ts", "ts", Seq("click_value"),
          direction = "nearest")
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"),
          unix_millis(col("asof_ts")).as("click_ts_ms"),
          (col("asof_click_value").cast("decimal(18,2)") * 100)
            .cast("long").as("click_value_cents"))
        .orderBy("event_id")
    }),

    "q_train_test_split" -> ((s, dir) =>
      graft.operators.AsOfJoin.trainTestSplit(
          t(s, dir, "orders"), "o_orderkey", 80)
        .groupBy("split")
        .agg(count(lit(1)).as("n"),
          (sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long").as("sum_price_cents"))
        .orderBy("split")),

    "q_props_map" -> ((s, dir) =>
      // JSON props -> typed map column, then per-key aggregation
      t(s, dir, "events")
        .withColumn("props_map",
          from_json(col("props"), org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)))
        .withColumn("k", element_at(col("props_map"), "k").cast("long"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
        .orderBy("k_mod")),

    "x_sessionize" -> ((s, dir) =>
      graft.streaming.Sessionize.sessions(t(s, dir, "events"), "30 minutes")
        .orderBy("user_id", "session_start_ms")),

    "x_session_funnel" -> ((s, dir) => {
      // SESSION-scoped conversion: the view→click→purchase machine run
      // WITHIN each 30-minute gap session — per-visit funnel depth, the
      // product-analytics refinement of the corpus-wide x_event_funnel.
      // Sessions are lag/cumsum islands (deterministic: ordered by
      // (tms, event_id) — unique, so no tie-order divergence); the
      // stage machine is a codegen'd HOF fold over the session's
      // time-ordered event codes, replayed by DuckDB list_reduce. The
      // per-user windows are bounded by per-user activity, the same
      // budget as sessionization itself.
      val ev = t(s, dir, "events").select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("tms"),
        when(col("event_type") === "view", 1)
          .when(col("event_type") === "click", 2)
          .when(col("event_type") === "purchase", 3)
          .otherwise(0).as("code"))
      val ord = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("tms", "event_id")
      val sess = ev
        .withColumn("brk", when(col("tms") -
          lag("tms", 1).over(ord) >= 1800000L, 1).otherwise(0))
        .withColumn("sid", sum(col("brk")).over(ord.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      sess.groupBy(col("user_id"), col("sid"))
        .agg(min(col("tms")).as("session_start_ms"),
          count(lit(1)).as("n_events"),
          sort_array(collect_list(struct(col("tms"), col("event_id"),
            col("code")))).as("__evs"))
        .withColumn("funnel_depth",
          expr("CAST(aggregate(transform(__evs, e -> e.code), 0, (a, b) -> " +
            "CASE WHEN b = 1 AND a = 0 THEN 1 " +
            "WHEN b = 2 AND a = 1 THEN 2 " +
            "WHEN b = 3 AND a = 2 THEN 3 ELSE a END) AS BIGINT)"))
        .select("session_start_ms", "user_id", "n_events", "funnel_depth")
        .orderBy("user_id", "session_start_ms")
    }),

    "x_stream_anomaly" -> ((s, dir) => {
      // Custom keyed state (flatMapGroupsWithState) with an ORACLE-HASHED
      // output: per-user running anomaly gate on exact integer cents —
      // value > 3·mean(previous) tested as value·n > 3·sum, no float
      // anywhere, so the custom-state path replays as a window query.
      // Mode-agnostic (same code runs the stream); the spec pins
      // cross-micro-batch state continuity.
      import s.implicits._
      val ev = t(s, dir, "events")
        .select(col("user_id").cast("long").as("user_id"),
          unix_millis(col("ts")).as("tms"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("value_cents"))
        .as[graft.streaming.Sessionize.CentsEvent]
      graft.streaming.Sessionize.anomaliesExact(ev)
        // n_prev completes the total order: two identical flagged events
        // (same user, ms-tied tms, same cents) differ only in state
        .toDF().orderBy("user_id", "tms", "value_cents", "n_prev")
    }),

    "q_stream_hourly" -> ((s, dir) => {
      try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () }
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      // fixed title, dropped first: re-runs replace the table instead of
      // accumulating one leaked hosted table per invocation
      val title = "stream_hourly_check"
      HostedStore.dropByTitle(title)
      EventStreams.runUpsertWindowedOnce(s, dir, "events.parquet", schema, title)
        .orderBy("window_start_ms", "event_type")
    }))

  val relationalOracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_base_price_cents,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS sum_disc_price_e4,
        |  count(*) AS count_order,
        |  sum(l_quantity) / count(*) AS avg_qty
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
        |GROUP BY l_orderkey
        |ORDER BY revenue_e4 DESC, l_orderkey LIMIT 10""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(sum(l_quantity) AS BIGINT) > 150)
        |SELECT c_custkey, c_name, o_orderkey, total_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey
        |LIMIT 25""".stripMargin,

    "q_grouping_sets" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(grouping(lang) AS BIGINT) AS g_lang,
        |  CAST(grouping(source) AS BIGINT) AS g_source
        |FROM documents
        |GROUP BY GROUPING SETS ((lang), (source), ())
        |ORDER BY g_lang, g_source, lang, source""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue_e4 DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q7_volume_shipping" ->
      """SELECT supp_nation, cust_nation, CAST(l_year AS INT) AS l_year,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |         year(l_shipdate) AS l_year,
        |         l_extendedprice, l_discount
        |  FROM supplier
        |  JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00')
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(sum(CASE WHEN ns.n_name = 'NATION_1'
        |        THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
        |        ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000 AS BIGINT) AS nation_volume_e4,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS total_volume_e4
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation nc ON c_nationkey = nc.n_nationkey
        |JOIN region ON nc.n_regionkey = r_regionkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ns ON s_nationkey = ns.n_nationkey
        |WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q14_promo_revenue" ->
      """SELECT CAST(month(l_shipdate) AS INT) AS ship_month,
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |        THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
        |        ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000 AS BIGINT) AS promo_revenue_e4,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS total_revenue_e4
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY ship_month ORDER BY ship_month""".stripMargin,

    "q19_disjunctive_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q13_customer_distribution" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |      FROM customer LEFT JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS total_revenue_e4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue_e4
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue_e4 = (SELECT max(total_revenue_e4) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q17_small_quantity_revenue" ->
      """WITH fact AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#23'),
        |stats AS (
        |  SELECT l_partkey AS pk, count(*) AS n,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM fact GROUP BY 1)
        |SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS revenue_cents,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM fact JOIN stats ON l_partkey = pk
        |WHERE CAST(l_quantity AS BIGINT) * 5 * n < sum_qty""".stripMargin,

    "q22_dormant_customers" ->
      """WITH pos AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_cents,
        |         CAST(count(*) AS BIGINT) AS n_pos
        |  FROM customer WHERE c_acctbal > 0),
        |recent AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_bal_cents
        |FROM customer, pos
        |WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) * n_pos > sum_cents
        |  AND c_custkey NOT IN (SELECT o_custkey FROM recent)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q5_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS revenue_e4
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue_e4 DESC, n_name""".stripMargin,

    "q_window_topn" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,

    "q_join_agg_nation" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_acctbal_cents
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q21_late_suppliers" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 25""".stripMargin,

    "q16_supplier_variety" ->
      """SELECT p_brand, p_type, p_size,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_size IN (1, 2, 3, 4, 5)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        |LIMIT 20""".stripMargin,

    "x_range_join_binned" ->
      // DuckDB replays with its NATIVE inequality join — identical rows
      // prove bin-and-refine changed the plan, not the result
      """WITH h AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n
        |          FROM events GROUP BY 1),
        |top AS (SELECT h FROM h ORDER BY n DESC, h LIMIT 5),
        |iv AS (SELECT CAST(epoch_ms(h) AS BIGINT) AS w_start,
        |              CAST(epoch_ms(h) + 3599999 AS BIGINT) AS w_end
        |       FROM top),
        |p AS (SELECT CAST(epoch_ms(ts) AS BIGINT) AS ev_ms, event_id,
        |             event_type
        |      FROM events)
        |SELECT iv.w_start, p.event_id, p.ev_ms, p.event_type
        |FROM p JOIN iv ON p.ev_ms BETWEEN iv.w_start AND iv.w_end
        |ORDER BY iv.w_start, p.event_id""".stripMargin,

    "q_interval_join" ->
      """SELECT c.user_id, epoch_ms(c.ts) AS click_ms, epoch_ms(p.ts) AS purchase_ms
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |ORDER BY 1, 2, 3""".stripMargin,

    "q_events_densified" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT date_trunc('hour', min(ts)) AS lo,
        |             date_trunc('hour', max(ts)) AS hi FROM events),
        |grid AS (SELECT t.event_type,
        |                unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS hour
        |         FROM (SELECT DISTINCT event_type FROM events) t, b)
        |SELECT CAST(epoch_ms(grid.hour) AS BIGINT) AS hour_ms,
        |       grid.event_type, coalesce(h.n, 0) AS n
        |FROM grid LEFT JOIN hourly h
        |  ON h.hour = grid.hour AND h.event_type = grid.event_type
        |ORDER BY hour_ms, grid.event_type""".stripMargin,

    "q_events_hourly" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_value_cents
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_events_json" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_pivot_status" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_exists_urgent" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey
        |                AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_percentiles" ->
      """WITH ranked AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice, o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS cnt
        |  FROM orders)
        |SELECT o_orderpriority,
        |  CAST(round(max(CASE WHEN rn = ceil(cnt * 0.5) THEN o_totalprice END) * 100) AS BIGINT) AS median_price_cents,
        |  CAST(round(max(CASE WHEN rn = ceil(cnt * 0.95) THEN o_totalprice END) * 100) AS BIGINT) AS p95_price_cents,
        |  count(*) AS n
        |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_distinct_parts" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_cube_orders" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_cents
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_rollup_nation" ->
      """SELECT r_name AS region_name, n_name AS nation_name,
        |  count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_acctbal_cents
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region_name NULLS FIRST, nation_name NULLS FIRST""".stripMargin,

    "q_setops_customers" ->
      """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        | INTERSECT
        | SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
        |ORDER BY c_custkey""".stripMargin,

    "q_asof_join" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |signups AS (
        |  SELECT user_id, ts, max(value) AS signup_value
        |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS ts_ms,
        |  epoch_ms(s.ts) AS signup_ts_ms,
        |  CAST(CAST(s.signup_value AS DECIMAL(18,2)) * 100 AS BIGINT) AS signup_value_cents
        |FROM purchases p ASOF LEFT JOIN signups s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY event_id""".stripMargin,

    "q_asof_forward" ->
      // DuckDB native ASOF with the <= comparator IS the forward join
      """WITH purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |clicks AS (
        |  SELECT user_id, ts, max(value) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS ts_ms,
        |  epoch_ms(c.ts) AS click_ts_ms,
        |  CAST(CAST(c.click_value AS DECIMAL(18,2)) * 100 AS BIGINT) AS click_value_cents
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts <= c.ts
        |ORDER BY event_id""".stripMargin,

    "q_asof_nearest" ->
      // nearest = argmin over the user's clicks by (|Δt|, backward
      // preferred) — equivalent to closer-of(backward-latest,
      // forward-earliest) with ties to backward
      """WITH purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |clicks AS (
        |  SELECT user_id, ts, max(value) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |ranked AS (
        |  SELECT p.event_id, p.user_id, p.ts, c.ts AS cts, c.click_value,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY abs(epoch_us(p.ts) - epoch_us(c.ts)),
        |               (c.ts <= p.ts) DESC) AS rn
        |  FROM purchases p LEFT JOIN clicks c ON c.user_id = p.user_id)
        |SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
        |  epoch_ms(cts) AS click_ts_ms,
        |  CAST(CAST(click_value AS DECIMAL(18,2)) * 100 AS BIGINT) AS click_value_cents
        |FROM ranked WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q_train_test_split" ->
      """SELECT CASE WHEN ((o_orderkey % 1000003) * 2654435761) % 1000000007 % 100 < 80
        |            THEN 'train' ELSE 'test' END AS split,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_price_cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_props_map" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        |  count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "x_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS tms, value FROM events),
        |marked AS (
        |  SELECT user_id, tms, value,
        |    CASE WHEN tms - lag(tms) OVER (PARTITION BY user_id ORDER BY tms) >= 1800000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |sess AS (
        |  SELECT user_id, tms, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY tms
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT min(tms) AS session_start_ms, max(tms) + 1800000 AS session_end_ms,
        |  user_id, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_value_cents
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start_ms""".stripMargin,

    "x_session_funnel" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tms,
        |    CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
        |         WHEN 'purchase' THEN 3 ELSE 0 END AS code
        |  FROM events),
        |marked AS (
        |  SELECT *, CASE WHEN tms - lag(tms) OVER
        |      (PARTITION BY user_id ORDER BY tms, event_id) >= 1800000
        |    THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |sess AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id
        |      ORDER BY tms, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked),
        |agg AS (
        |  SELECT user_id, sid, min(tms) AS session_start_ms,
        |         count(*) AS n_events,
        |         list(code ORDER BY tms, event_id) AS codes
        |  FROM sess GROUP BY 1, 2)
        |SELECT session_start_ms, user_id, CAST(n_events AS BIGINT) AS n_events,
        |  CAST(list_reduce(list_prepend(0, codes),
        |    (a, b) -> CASE WHEN b = 1 AND a = 0 THEN 1
        |                   WHEN b = 2 AND a = 1 THEN 2
        |                   WHEN b = 3 AND a = 2 THEN 3 ELSE a END) AS BIGINT)
        |    AS funnel_depth
        |FROM agg ORDER BY user_id, session_start_ms""".stripMargin,

    "x_stream_anomaly" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS tms,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS value_cents
        |  FROM events),
        |w AS (SELECT user_id, tms, value_cents,
        |    count(*) OVER win AS n_prev,
        |    coalesce(sum(value_cents) OVER win, 0) AS sum_prev
        |  FROM e
        |  WINDOW win AS (PARTITION BY user_id ORDER BY tms, value_cents
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT user_id, tms, value_cents,
        |  CAST(n_prev AS BIGINT) AS n_prev,
        |  CAST(sum_prev AS BIGINT) AS sum_prev_cents
        |FROM w WHERE n_prev > 0 AND value_cents * n_prev > 3 * sum_prev
        |ORDER BY user_id, tms, value_cents, n_prev""".stripMargin,

    "q_stream_hourly" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_value_cents
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  // ------------------------------------------------- pipeline extensions

  val extensionQueries: Map[String, Q] = Map(
    "x_dedup_exact" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val dupped = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + lit(100000L)))
      Dedup.exact(dupped, "doc_id", "text").orderBy("doc_id")
    }),

    "x_dedup_jaccard" -> ((s, dir) =>
      // The stop-shingle cap keeps hot shingles from producing O(df²)
      // candidate pairs in the inverted-index self-join; the oracle CTE
      // mirrors the cap so results stay hash-identical.
      Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text", 0.6,
          maxShingleFreq = Some(jaccardFreqCap))
        .orderBy("a", "b")),

    "x_dedup_minhash_sig" -> ((s, dir) =>
      Dedup.minhashSignatures(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "x_dedup_clusters" -> ((s, dir) =>
      // Near-dup pairs → connected components → keep-one-per-cluster:
      // same capped jaccard pair mining as x_dedup_jaccard, then min-label
      // propagation; the oracle replays the fixpoint with a recursive CTE.
      Dedup.duplicateClusters(
          Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text", 0.6,
            maxShingleFreq = Some(jaccardFreqCap)))
        .orderBy("doc_id")),

    "x_dedup_cross" -> ((s, dir) => {
      // Train/eval decontamination report: reference corpus = every 7th
      // doc, candidates = the whole table; md5Base so DuckDB replays the
      // exact band pipeline. Broadcast-ref is the scale posture (eval set
      // ≪ training corpus).
      val docs = t(s, dir, "documents")
      Dedup.crossCorpusPairs(docs, docs.filter(col("doc_id") % 7 === 0),
          "doc_id", "text", 0.7, base = Dedup.Hashers.md5Base)
        .orderBy("cand_id")
    }),

    "x_stream_neardup" -> ((s, dir) =>
      // Streaming near-dup detector (stateless per-row signatures +
      // per-bucket keyed state), invoked in batch mode — the operator is
      // mode-agnostic. Rows-only (xxhash64 signatures aren't oracle-
      // replayable); StreamDedupSpec pins stream≡batch agreement.
      graft.streaming.StreamDedup.nearDupPairs(
          t(s, dir, "documents"), "doc_id", "text", 0.9)
        .toDF()
        .dropDuplicates("a", "b")
        .orderBy("a", "b")),

    "x_stream_exactdedup" -> ((s, dir) => {
      // REAL streaming run (AvailableNow → memory sink) of Spark's native
      // watermarked dedup state; the surviving-hash-set projection is
      // deterministic, so this streaming path gets a full hash-MATCH
      // oracle (SELECT DISTINCT sha256), unlike the signature-based
      // streaming entries.
      try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () }
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      graft.streaming.StreamExactDedup.runOnce(s, dir, "documents.parquet",
          schema, "doc_id", "text")
        .orderBy("text_hash")
    }),

    "x_stream_drift" -> ((s, dir) => {
      // Streaming drift monitor, REAL run (append mode — one verdict per
      // window when the watermark passes it; the trailing partial window
      // never emits and the oracle replays that cutoff from max(ts)).
      // Reference mix = corpus-wide counts over the FIXED policy
      // taxonomy (the same literal category list the oracle folds —
      // deriving the list from data here while the static SQL hardcodes
      // it would silently diverge on a fixture with a new event type).
      try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () }
      val ev = t(s, dir, "events")
      val counts = ev.groupBy("event_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // a taxonomy category absent from the data keeps count 0 and the
      // operator's positive-count require fails LOUDLY instead of the
      // oracle silently diverging
      val ref = driftTaxonomy.map(c => c -> counts.getOrElse(c, 0L)).toMap
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      graft.streaming.StreamDrift.runOnce(s, dir, "events.parquet",
          schema, ref)
        .orderBy("window_start_ms")
    }),

    "x_stream_heavyhitters" -> ((s, dir) => {
      // Streaming windowed top-k heavy hitters through a REAL stream
      // (mergeable space-saving summary as watermarked window state,
      // append-mode emission). Capacity 512 > the fixture's 150 users,
      // so the summary runs in its EXACT regime and the oracle replays
      // per-window exact top-k; the eviction regime is spec-pinned.
      try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () }
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      graft.streaming.StreamHeavyHitters.runOnce(s, dir, "events.parquet",
          schema, "user_id", k = 5, capacity = 512)
        .orderBy("window_start_ms", "rank")
    }),

    "x_text_normalize" -> ((s, dir) => {
      // Unicode canonicalization audit: the fold key (NFKD → strip marks
      // → ROOT lowercase) every cross-script dedup hashes instead of raw
      // text, emitted as md5 + changed flag. On the ASCII fixture the
      // fold is the identity, so the oracle (DuckDB strip_accents ∘
      // nfc_normalize ∘ lower) validates the plumbing + the ASCII
      // subset; Unicode behavior (composed/decomposed, ligatures,
      // fullwidth forms) is spec-pinned in FunctionsSpec.
      import graft.functions.TextFunctions.normalize_text
      val folded = normalize_text(col("text"), "fold")
      t(s, dir, "documents")
        .select(col("doc_id"), md5(folded).as("canon_md5"),
          when(folded === col("text"), 0L).otherwise(1L).as("changed"))
        .orderBy("doc_id")
    }),

    "x_dedup_canonical" -> ((s, dir) => {
      // Exact dedup under the CANONICALIZATION key instead of raw text:
      // groups agree whenever their fold keys agree (catches case/width/
      // mark variants raw exact dedup misses). Same hash-aggregate
      // shape as x_dedup_exact, keyed on the codegen'd fold expression.
      import graft.functions.TextFunctions.normalize_text
      val canon = t(s, dir, "documents")
        .select(col("doc_id"), normalize_text(col("text"), "fold").as("__k"))
      canon.groupBy(col("__k"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select(col("doc_id"), col("n_copies"))
        .orderBy("doc_id")
    }),

    "x_text_compress" -> ((s, dir) =>
      // Compression-ratio quality signal (rows-only: deflate output is a
      // JDK-zlib artifact no SQL engine replays; the length relations and
      // repetition-monotonicity are spec-pinned in OperatorSpec).
      TextAnalysis.compressibility(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "x_event_funnel" -> ((s, dir) => {
      // Ordered conversion funnel view→click→purchase: each stage is the
      // user's FIRST qualifying event strictly after the previous stage —
      // the sequence constraint is what separates a funnel from three
      // independent counts. Three shuffles, all keyed on user_id (at
      // scale they co-partition: one exchange feeds every stage), then a
      // 1-row×1-row crossJoin of the stage counts.
      val ev = t(s, dir, "events")
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_uid"), col("ts").as("c_ts"))
      val vc = v.join(clicks,
          col("user_id") === col("c_uid") && col("c_ts") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("c_ts")).as("t_click"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_uid"), col("ts").as("p_ts"))
      val vcp = vc.join(buys,
          col("user_id") === col("p_uid") && col("p_ts") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("p_ts")).as("t_buy"))
      ev.agg(countDistinct(col("user_id")).as("n_users"))
        .crossJoin(v.agg(count(lit(1)).as("n_view")))
        .crossJoin(vc.agg(count(lit(1)).as("n_view_click")))
        .crossJoin(vcp.agg(count(lit(1)).as("n_full_funnel")))
    }),

    "x_cohort_retention" -> ((s, dir) => {
      // Weekly cohort retention: cohort = week of the user's first event,
      // activity = distinct (user, week), offset = exact integer week
      // difference (both engines truncate weeks to Monday UTC, so the
      // millisecond difference is an exact multiple of 604800000). The
      // classic growth-analytics triangle view.
      val ev = t(s, dir, "events")
      val cohort = ev.groupBy(col("user_id"))
        .agg(min(col("ts")).as("first_ts"))
        .select(col("user_id"),
          unix_millis(date_trunc("week", col("first_ts"))).as("cohort_ms"))
      val activity = ev.select(col("user_id"),
        unix_millis(date_trunc("week", col("ts"))).as("week_ms")).distinct()
      cohort.join(activity, Seq("user_id"))
        .withColumn("week_offset",
          expr("(week_ms - cohort_ms) div 604800000")) // exact integer weeks
        .groupBy(col("cohort_ms"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy("cohort_ms", "week_offset")
    }),

    "x_ingest_jsonl" -> ((s, dir) => {
      // Robust JSONL ingestion — the format 100 TB web corpora actually
      // arrive in, where some fraction of lines is always damaged. Spark
      // reads with an EXPLICIT schema in PERMISSIVE mode: malformed lines
      // land whole in _corrupt_record (never killing the job, never
      // silently dropped) and the clean rows parse typed. The oracle
      // re-reads the SAME staged file line-wise in DuckDB and replays the
      // parse with json_valid + json_extract — so the check covers the
      // quarantine semantics, not just the fixture round trip.
      val path = writeJsonlStageFixture(s, dir)
      readJsonlStage(s, path)
        // the doc_id conjunct keeps a DATA column referenced even when a
        // count() prunes the projection away — a filter touching ONLY
        // _corrupt_record is disallowed on raw JSON reads (Spark's
        // corrupt-record rule) and failed the bench's count-only run;
        // semantically identical (quarantined rows parse doc_id as null)
        .filter(col("_corrupt_record").isNull && col("doc_id").isNotNull)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    }),

    "x_ingest_jsonl_report" -> ((s, dir) => {
      // The ingestion health report over the same permissive read: rows
      // and char mass per language, with damaged lines grouped under
      // '__quarantine' — the per-batch monitoring view an ingestion
      // pipeline alerts on (quarantine ratio spike = upstream breakage).
      val path = writeJsonlStageFixture(s, dir)
      readJsonlStage(s, path)
        .groupBy(coalesce(col("lang"), lit("__quarantine")).as("lang_bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(coalesce(col("n_chars"), lit(0L))).as("sum_chars"),
          sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L))
            .as("n_corrupt"))
        .orderBy("lang_bucket")
    }),

    "x_ingest_binary" -> ((s, dir) => {
      // Multimodal ingest step 0: raw image FILES through Spark's
      // binaryFile source (path/length/content — what a crawl's media
      // sidecar actually is on disk). BMP payloads stage
      // deterministically from the documents fixture, executor-side
      // through the Hadoop FS; the oracle reads the SAME files via
      // DuckDB read_blob. Integrity column = md5 over the lowercase hex
      // of the bytes — both engines hash the same ASCII string, where a
      // blob→varchar cast would die on non-UTF8 bytes.
      val staged = stageIndex(binIngestDir, dir) {
        val out = binIngestDir
        graft.operators.Multimodal.withBmpPayload(
            t(s, dir, "documents").filter(col("doc_id") < 100),
            "doc_id", "text")
          .select(col("doc_id"), col("payload"))
          .repartition(8)
          .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
            val fs = org.apache.hadoop.fs.FileSystem.get(
              new java.net.URI(out),
              new org.apache.hadoop.conf.Configuration())
            it.foreach { r =>
              val p = new org.apache.hadoop.fs.Path(
                out, f"doc_${r.getLong(0)}%05d.bmp")
              val os = fs.create(p, true)
              try os.write(r.getAs[Array[Byte]](1)) finally os.close()
            }
          }
      }
      // pathGlobFilter instead of a glob IN the path: a glob path trips
      // FileStreamSink's metadata probe into logging a WARN + stack
      // every run, which would dirty the bench's clean-tail gate
      s.read.format("binaryFile").option("pathGlobFilter", "*.bmp")
        .load(staged)
        .select(
          regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
          col("length").as("n_bytes"),
          md5(lower(hex(col("content")))).as("content_md5"))
        .orderBy("fname")
    }),

    "x_ingest_orc" -> ((s, dir) => {
      // Columnar interchange beyond parquet: the corpus staged as ORC
      // (Spark-native writer; footer-stats/predicate pushdown work like
      // parquet's — PlanSpec gates it), read back and aggregated.
      // DuckDB cannot read ORC, so the oracle aggregates the SOURCE
      // table instead — which is exactly what makes this a LOSSLESS
      // round-trip check: any value damaged in the ORC write/read path
      // hash-mismatches.
      val orcDir = "/tmp/graft_orc_stage"
      t(s, dir, "documents").write.mode("overwrite").orc(orcDir)
      s.read.orc(orcDir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"),
          countDistinct(col("source")).as("n_sources"),
          sum(length(col("text"))).cast("long").as("sum_text_len"))
        .orderBy("lang")
    }),

    "x_kmv_distinct" -> ((s, dir) =>
      // Per-source distinct-text cardinality: KMV sketch estimate NEXT TO
      // the exact count (the accuracy audit). Capacity 16 < the ~25
      // distinct texts per source, so this deliberately exercises the
      // ESTIMATOR regime — which still hash-verifies, because KMV's
      // k-th-minimum is a rank selection DuckDB replays over the same
      // md5-prefix hashes (merge = set union, no tie-order sensitivity).
      graft.operators.Sketches.kmvDistinct(t(s, dir, "documents"),
          "source", "text", capacity = 16)
        .orderBy("source")),

    "x_stream_distinct" -> ((s, dir) => {
      // Streaming per-window distinct users through a REAL stream via the
      // mergeable KMV sketch as watermarked window state. Capacity 512 >
      // the fixture's 150 users, so the buffer holds every distinct hash
      // and the emitted value IS the exact per-window distinct count —
      // replayed by DuckDB count(DISTINCT); the estimator regime is
      // spec-pinned (SketchesSpec).
      try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () }
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      graft.streaming.StreamDistinct.runOnce(s, dir, "events.parquet",
          schema, "user_id", capacity = 512)
        .orderBy("window_start_ms")
    }),

    "x_stream_latedata" -> ((s, dir) => {
      // Late-data accounting through a REAL two-micro-batch stream: the
      // second batch replays early events behind the advanced watermark
      // and the report carries numRowsDroppedByWatermark — the metric a
      // production stream alerts on. Rows-only by design (the drop
      // counter is engine telemetry, not SQL-replayable); emitted-window
      // integrity vs the batch aggregation is spec-pinned
      // (LateDataSpec).
      try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () }
      graft.streaming.LateData.runOnce(s, dir)
    }),

    "x_stream_quantiles" -> ((s, dir) => {
      // Streaming per-window value percentiles (p50/p90/p99) through a
      // REAL stream via the mergeable quantile sketch as window state.
      // Selection-only semantics: in the exact regime (window rows fit
      // the summary — true at every fixture SF for hourly windows) the
      // emitted values are the elements at rank ceil(q·n), which DuckDB
      // replays by sorted rank.
      try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () }
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      graft.streaming.StreamQuantiles.runOnce(s, dir, "events.parquet",
          schema, "value")
        .orderBy("window_start_ms")
    }),

    "x_quantile_sketch" -> ((s, dir) => {
      // Batch grouped quantiles via the same mergeable sketch — partial
      // summaries merge map-side like any aggregate. Capacity 131072
      // keeps the sf0.01 correctness gate in the exact regime (20k rows
      // per returnflag); beyond that the estimates carry the documented
      // one-sided rank error — the sketch's contract, priced not hidden.
      val qagg = udaf(new graft.operators.Sketches.QuantileSketchAgg(
        131072, Seq(0.5, 0.9, 0.99)),
        org.apache.spark.sql.Encoders.scalaDouble)
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          qagg(col("l_extendedprice").cast("double")).as("__qs"))
        .select(col("l_returnflag"), col("n_rows"),
          element_at(col("__qs"), 1).as("q50"),
          element_at(col("__qs"), 2).as("q90"),
          element_at(col("__qs"), 3).as("q99"))
        .orderBy("l_returnflag")
    }),

    "x_stream_incremental" -> ((s, dir) => {
      // Streaming incremental dedup vs a static corpus index (stateless
      // sign + stream-static band join), invoked in batch mode. Rows-only;
      // StreamDedupSpec pins agreement with the batch incremental report.
      val docs = t(s, dir, "documents")
      val idx = graft.streaming.StreamDedup.corpusBandIndex(
        docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text")
      graft.streaming.StreamDedup.vsCorpusHits(
          docs.filter(col("doc_id") % 5 === 0), idx, "doc_id", "text", 0.7)
        .dropDuplicates("doc_id")
        .select("doc_id")
        .orderBy("doc_id")
    }),

    "x_dedup_minhash_fast" -> ((s, dir) =>
      // PRODUCTION dedup configuration: xxhash64 double-hash family +
      // signature-estimator verification (no shingle re-join). Rows-only —
      // xxhash64 isn't replayable in the oracle — but the estimator path
      // is spec-pinned against the exact path (OperatorSpec), and this
      // entry makes the driver bench price the configuration a 100 TB run
      // would actually use (the md5/exact-verify entry above prices the
      // oracle replay, ~2-4× dearer).
      Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text", 0.7,
          numHashes = lshNumHashes, bands = lshBandCount,
          base = Dedup.Hashers.xx64Base,
          maxBucketSize = Some(lshBucketCap), verifyExact = false)
        .orderBy("a", "b")),

    "x_dedup_cross_fast" -> ((s, dir) => {
      // PRODUCTION decontamination configuration (xx64Base + estimator
      // verify) — rows-only companion of x_dedup_cross, same rationale as
      // x_dedup_minhash_fast.
      val docs = t(s, dir, "documents")
      Dedup.crossCorpusPairs(docs, docs.filter(col("doc_id") % 7 === 0),
          "doc_id", "text", 0.7, base = Dedup.Hashers.xx64Base,
          verifyExact = false)
        .orderBy("cand_id")
    }),

    "x_dedup_incremental" -> ((s, dir) => {
      // Daily-ingest shape: the new batch (every 5th doc) dedups against
      // the existing corpus (the rest) with the batch broadcast and the
      // corpus streaming, plus earlier-wins dedup inside the batch.
      // md5Base so DuckDB replays the band pipeline.
      val docs = t(s, dir, "documents")
      Dedup.incrementalDedup(docs.filter(col("doc_id") % 5 === 0),
          docs.filter(col("doc_id") % 5 =!= 0),
          "doc_id", "text", 0.7, base = Dedup.Hashers.md5Base)
        .orderBy("doc_id")
    }),

    "x_dedup_sig_persisted" -> ((s, dir) => {
      // PERSISTED SIGNATURE REGISTRY serve: the corpus's 128-long
      // minhash signatures staged as parquet once; the arriving batch
      // (every 5th doc) dedups against the ARTIFACT alone — corpus text
      // never re-read, verification by signature agreement (integer
      // gate n_agree ≥ ⌈0.7·128⌉ = 90). The estimator path, made
      // oracle-hashable by the md5 family + the persisted replay.
      val path = stageIndex(sigIdxDir, dir) {
        val corp = t(s, dir, "documents").filter(col("doc_id") % 5 =!= 0)
        Dedup.signaturesFromShingles(
            Dedup.shingles(corp, "doc_id", "text", 3),
            "doc_id", 128, Dedup.Hashers.md5Base)
          .coalesce(1).write.mode("overwrite").parquet(s"$sigIdxDir/sigs")
      }
      Dedup.dedupeAgainstSignatures(
          t(s, dir, "documents").filter(col("doc_id") % 5 === 0),
          s.read.parquet(s"$path/sigs"),
          "doc_id", "text", 0.7, base = Dedup.Hashers.md5Base)
        .orderBy("doc_id", "corpus_id")
    }),

    "x_dedup_sig_appended" -> ((s, dir) => {
      // REGISTRY APPEND lifecycle: later corpus slices land as NEW
      // parquet files next to the base (no rewrite — O(batch) ingest);
      // the serve reads the combined registry and must match the
      // recomputed oracle over the same files.
      val path = stagedSigLifecycle(s, dir)
      Dedup.dedupeAgainstSignatures(
          t(s, dir, "documents").filter(col("doc_id") % 5 === 0),
          s.read.parquet(s"$path/sigs"),
          "doc_id", "text", 0.7, base = Dedup.Hashers.md5Base)
        .orderBy("doc_id", "corpus_id")
    }),

    "x_dedup_sig_deleted" -> ((s, dir) => {
      // REGISTRY TAKEDOWN: tombstoned corpus docs (an O(ids) sidecar,
      // never an O(registry) rewrite — the ANN deletion-vector
      // convention) are anti-joined out at serve; their near-dup flags
      // disappear from the report.
      val path = stagedSigLifecycle(s, dir)
      val reg = s.read.parquet(s"$path/sigs")
        .join(broadcast(s.read.parquet(s"$path/tombstones")),
          Seq("doc_id"), "left_anti")
      Dedup.dedupeAgainstSignatures(
          t(s, dir, "documents").filter(col("doc_id") % 5 === 0),
          reg, "doc_id", "text", 0.7, base = Dedup.Hashers.md5Base)
        .orderBy("doc_id", "corpus_id")
    }),

    "x_stream_sigdedup" -> ((s, dir) => {
      // LIVE ingest-dedup against the persisted registry: each arriving
      // micro-batch is signed and flagged via foreachBatch — corpus text
      // never read, per-doc results batch-invariant, so this shares
      // x_dedup_sig_persisted's oracle verbatim.
      try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () }
      val path = stageIndex(sigIdxDir, dir) {
        val corp = t(s, dir, "documents").filter(col("doc_id") % 5 =!= 0)
        Dedup.signaturesFromShingles(
            Dedup.shingles(corp, "doc_id", "text", 3),
            "doc_id", 128, Dedup.Hashers.md5Base)
          .coalesce(1).write.mode("overwrite").parquet(s"$sigIdxDir/sigs")
      }
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      graft.streaming.StreamSigDedup.runOnce(s, dir, "documents.parquet",
          schema, col("doc_id") % 5 === 0,
          s.read.parquet(s"$path/sigs"), "doc_id", "text", 0.7,
          base = Dedup.Hashers.md5Base)
        .orderBy("doc_id", "corpus_id")
    }),

    "x_dedup_sig_report" -> ((s, dir) => {
      // REGISTRY OBSERVABILITY: doc count, parquet-file census (the
      // compaction gauge for append-heavy registries), signature-width
      // bounds, pending tombstones — the describeIvf of the dedup
      // pillar; the oracle replays the file census via
      // read_parquet(filename = true).
      val path = stagedSigLifecycle(s, dir)
      Dedup.describeSigRegistry(s, path)
    }),

    "x_dedup_incremental_fast" -> ((s, dir) => { // rows-only: production config
      // Same increment-vs-corpus report priced at the production settings
      // (xxhash64 family, signature-estimator verify) — what a daily 100 TB
      // ingest actually runs; the md5 entry above prices the oracle replay.
      val docs = t(s, dir, "documents")
      Dedup.incrementalDedup(docs.filter(col("doc_id") % 5 === 0),
          docs.filter(col("doc_id") % 5 =!= 0),
          "doc_id", "text", 0.7, verifyExact = false)
        .orderBy("doc_id")
    }),

    "x_dedup_containment" -> ((s, dir) =>
      // Asymmetric near-dup: the smaller shingle set >= 80% inside the
      // other — catches excerpts/quotes that Jaccard structurally misses.
      Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text", 0.8,
          maxShingleFreq = Some(jaccardFreqCap))
        .orderBy("a", "b")),

    "x_cluster_assign" -> ((s, dir) =>
      // k-means-style cell assignment as a first-class output: nearest
      // literal centroid per vector, computed as a shuffle-free projection
      // argmax (the SemDeDup/IVF building block, exposed standalone).
      Dedup.semanticCells(t(s, dir, "embeddings"), "vec_id", "embedding", 16)
        .select(col("id").as("vec_id"), col("cell"))
        .orderBy("vec_id")),

    "x_cluster_cohesion" -> ((s, dir) =>
      // CELL HEALTH: per semantic cell, member→own-centroid dot
      // statistics (exact lattice integers from the same VecDotMatrix
      // pass that assigns the cell) — the observability that tells you
      // nlist is too small (anti-aligned members) or a cell needs
      // splitting (huge spread).
      Dedup.cellCohesionReport(t(s, dir, "embeddings"),
          "vec_id", "embedding", 16)
        .orderBy("cell")),

    "x_corpus_topics" -> ((s, dir) => {
      // Corpus TOPIC report: the deterministic semantic cells ("topics")
      // joined to document metadata — per topic: volume, language and
      // source spread, char mass. Clustering is the shuffle-free
      // projection argmax of x_cluster_assign; the report adds one join
      // + one aggregation — the corpus-composition view a data-mixing
      // policy is written against.
      val cells = Dedup.semanticCells(
          t(s, dir, "embeddings"), "vec_id", "embedding", 16)
        .select(col("id").as("doc_id"), col("cell"))
      cells.join(t(s, dir, "documents"), Seq("doc_id"))
        .groupBy("cell")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"),
          sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy("cell")
    }),

    "x_export_manifest" -> ((s, dir) => {
      // Shard manifest — the exactly-what-shipped audit a trainer
      // validates a delivered dataset against: per deterministic shard,
      // row count, token/char mass, and an ORDER-INDEPENDENT content
      // checksum (Σ md5-prefix(id|text) mod P — modular so the partial
      // sums can merge map-side in any order without overflow; ANSI-mode
      // long sums would throw on a plain 60-bit sum past 8 rows).
      val P = 1000000007L
      val sharded = Curation.shuffleShards(
        t(s, dir, "documents"), "doc_id", 8)
      sharded
        .withColumn("__h", conv(substring(md5(concat(
            col("doc_id").cast("string"), lit("|"), col("text"))), 1, 15),
          16, 10).cast("long") % P)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " "))).cast("long").as("n_tokens"),
          sum(length(col("text"))).cast("long").as("n_chars"),
          (sum(col("__h")) % P).as("checksum"))
        .orderBy("shard")
    }),

    "x_eval_clusters" -> ((s, dir) => {
      // CLUSTERING evaluation — the third evaluation pillar next to
      // retrieval (x_eval_retrieval) and dedup (x_eval_dedup): the
      // deterministic semantic cells scored against the embeddings
      // fixture's ground-truth labels. Per cell: members, majority-label
      // mass (purity numerator), label spread — all exact integers, ties
      // resolved (count desc, label asc) identically in both engines.
      val cells = Dedup.semanticCells(
          t(s, dir, "embeddings"), "vec_id", "embedding", 16)
        .select(col("id").as("vec_id"), col("cell"))
      val counts = cells
        .join(t(s, dir, "embeddings").select("vec_id", "label"), Seq("vec_id"))
        .groupBy(col("cell"), col("label"))
        .agg(count(lit(1)).as("n"))
      counts.groupBy(col("cell"))
        .agg(sum(col("n")).as("n_members"),
          max(struct(col("n"), (lit(0L) - col("label")).as("negl"))).as("__mx"),
          countDistinct(col("label")).as("n_labels"))
        .select(col("cell"), col("n_members"),
          col("__mx.n").as("n_majority"),
          (lit(0L) - col("__mx.negl")).as("majority_label"),
          col("n_labels"))
        .orderBy("cell")
    }),

    "x_curate_lengthclip" -> ((s, dir) => {
      // Sketch-driven length clipping: per-language p05/p95 of doc length
      // from the mergeable quantile sketch (exact regime at fixture
      // scales — selection-only semantics, so the bounds are actual data
      // values DuckDB replays by sorted rank), broadcast back as the keep
      // band. The "trim the length-outlier tails per language" curation
      // step, with the POLICY derived from a sketch instead of a global
      // sort.
      val qa = udaf(new graft.operators.Sketches.QuantileSketchAgg(
        4096, Seq(0.05, 0.95)), org.apache.spark.sql.Encoders.scalaDouble)
      val docs = t(s, dir, "documents")
      val bounds = docs.groupBy(col("lang"))
        .agg(qa(col("n_chars").cast("double")).as("__qs"),
          count(lit(1)).as("n_total"))
        .select(col("lang"),
          element_at(col("__qs"), 1).cast("long").as("lo_chars"),
          element_at(col("__qs"), 2).cast("long").as("hi_chars"),
          col("n_total"))
      docs.join(broadcast(bounds), Seq("lang"))
        .filter(col("n_chars") >= col("lo_chars") &&
          col("n_chars") <= col("hi_chars"))
        .groupBy(col("lang"))
        .agg(max(col("lo_chars")).as("lo_chars"),
          max(col("hi_chars")).as("hi_chars"),
          count(lit(1)).as("n_kept"),
          (max(col("n_total")) - count(lit(1))).as("n_dropped"))
        .orderBy("lang")
    }),

    "x_ingest_evolution" -> ((s, dir) => {
      // Schema-evolution ingestion: two parquet "crawl eras" staged with
      // DIFFERENT schemas (the newer era adds a score column), read as
      // one corpus via mergeSchema — the absent column surfaces as NULL
      // for old-era rows instead of failing the scan or silently
      // dropping files. The per-lang report pins the union semantics;
      // DuckDB replays with read_parquet(union_by_name).
      val (v1, v2) = writeEvolutionFixture(s, dir)
      val merged = s.read.option("mergeSchema", "true").parquet(v1, v2)
      merged.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("score").isNotNull, 1L).otherwise(0L))
            .as("n_with_score"),
          sum(coalesce(col("score"), lit(0L))).as("sum_score"))
        .orderBy("lang")
    }),

    "x_snapshot_diff" -> ((s, dir) => {
      // Corpus snapshot diff: removals (every 11th+3), in-place text
      // changes (every 7th), additions (every 13th re-keyed) classified
      // in one fingerprint-reduced full outer join.
      val docs = t(s, dir, "documents")
      val newSnap = docs
        .filter(col("doc_id") % 11 =!= 3)
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
        .unionByName(docs.filter(col("doc_id") % 13 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      Curation.snapshotDiff(docs, newSnap, "doc_id",
          Seq("text", "lang", "source"))
        .orderBy("doc_id")
    }),

    "x_cdc_snapshot" -> ((s, dir) =>
      // Merge-on-read over a Debezium-shaped change log (insert all →
      // update every 7th → delete every 11th+3 → re-insert the even
      // deletes): ONE max_by hash-aggregate, partial-aggregable — the
      // plan that survives a log with billions of superseded rows (a
      // row_number window would full-sort every key group).
      Cdc.applyLog(cdcLog(s, dir), "doc_id", "seq", "op")
        .orderBy("doc_id")),

    "x_cdc_history" -> ((s, dir) =>
      // SCD2 validity intervals over the same log: every version carries
      // [seq_from, seq_to) via a KEYED lead() window; tombstones close
      // their predecessor and are never "current".
      Cdc.history(cdcLog(s, dir), "doc_id", "seq", "op")
        .select("doc_id", "op", "seq_from", "seq_to", "is_current")
        .orderBy("doc_id", "seq_from")),

    "x_cdc_report" -> ((s, dir) => {
      // Change-log health report — the observability a CDC consumer
      // alarms on: per sequence slice, operation mix, keys touched, and
      // the NET row delta the snapshot will see (inserts of absent keys
      // minus deletes of present ones is what applyLog's count moves
      // by; here the per-op tallies that feed that reasoning).
      val log = cdcLog(s, dir)
      log.groupBy(col("seq"))
        .agg(
          count(lit(1)).cast("long").as("n_changes"),
          countDistinct(col("doc_id")).cast("long").as("n_keys"),
          sum(when(col("op") === "I", 1L).otherwise(0L)).as("n_insert"),
          sum(when(col("op") === "U", 1L).otherwise(0L)).as("n_update"),
          sum(when(col("op") === "D", 1L).otherwise(0L)).as("n_delete"),
          sum(when(col("text").isNull && col("op") =!= "D", 1L)
            .otherwise(0L)).as("n_suspect_null_payload"))
        .orderBy("seq")
    }),

    "x_cdc_asof" -> ((s, dir) =>
      // Time travel: the table AS OF seq 3 — after the deletes, before
      // the revives, so the cut EXERCISES the tombstone branch (an
      // asOf inside the I/U prefix would leave the oracle's op <> 'D'
      // filter and arg_max's null-payload handling as dead code in the
      // only cross-engine check). Same one-aggregate apply behind a
      // pushed-down sequence filter.
      Cdc.snapshotAsOf(cdcLog(s, dir), "doc_id", "seq", "op", asOfSeq = 3L)
        .orderBy("doc_id")),

    "x_cdc_checkpoint" -> ((s, dir) => {
      // LOG COMPACTION is content-neutral for the snapshot: compact at
      // seq 3 (checkpoint AFTER the deletes, so dead keys vanish with
      // their tombstones; the seq-4 revives stay in the tail verbatim),
      // write the compacted log to parquet, and derive the snapshot
      // from the RE-READ artifact alone. Shares x_cdc_snapshot's oracle
      // — applyLog(compacted) ≡ applyLog(original) IS the hash gate
      // (the x_layout_compact content-neutrality pattern).
      val staged = stageIndex(cdcCheckpointDir, dir) {
        Cdc.compactLog(cdcLog(s, dir), "doc_id", "seq", "op", asOfSeq = 3L)
          .write.mode("overwrite").parquet(cdcCheckpointDir)
      }
      Cdc.applyLog(s.read.parquet(staged), "doc_id", "seq", "op")
        .orderBy("doc_id")
    }),

    "x_cdc_checkpoint_asof" -> ((s, dir) =>
      // Time travel AT/ABOVE the checkpoint survives compaction across
      // the delete seam: compact at seq 2 (checkpoint BEFORE the
      // deletes), then AS OF seq 3 — the tail's tombstones must still
      // delete checkpointed keys, and the revives must stay invisible.
      // Shares x_cdc_asof's oracle verbatim.
      Cdc.snapshotAsOf(
          Cdc.compactLog(cdcLog(s, dir), "doc_id", "seq", "op", asOfSeq = 2L),
          "doc_id", "seq", "op", asOfSeq = 3L)
        .orderBy("doc_id")),

    "x_stream_cdc" -> ((s, dir) => {
      // The LIVE CDC applier: the same change log staged one file per
      // commit slice, consumed readStream → foreachBatch (LWW reduce,
      // seq guard vs the stored snapshot, upserts + delete_features
      // against the hosted table) under maxFilesPerTrigger=1 — four
      // micro-batches crossing the guard. Must converge to the exact
      // x_cdc_snapshot table; the oracle IS x_cdc_snapshot's.
      try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () }
      val log = cdcLog(s, dir)
      val stage =
        s"/tmp/graft_stream_cdc/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      graft.streaming.StreamCdc.stageLogSlices(log, "seq", stage,
        (1L to 4L).map(Seq(_)))
      graft.streaming.StreamCdc.runOnce(s, stage, log.schema,
          "doc_id", "seq", "op")
        .orderBy("doc_id")
    }),

    "x_emb_sq8" -> ((s, dir) =>
      // Trained FAISS-SQ8-style scalar quantization: per-dimension
      // corpus min/max grid, integer-exact codes + reconstruction error
      // on the fixed-point lattice — the 4× storage path whose codes are
      // comparable ACROSS vectors (unlike the per-vector max-abs
      // quantizeInt8).
      Embeddings.scalarQuantizeTrained(
          t(s, dir, "embeddings"), "vec_id", "embedding")
        .select("vec_id", "code_digest", "err_scaled", "n_dims")
        .orderBy("vec_id")),

    "x_text_extract_html" -> ((s, dir) => {
      // CommonCrawl step-1: markup → training text. Pages are
      // synthesized from the documents table (title with an entity,
      // style/script/comment subtrees to drop, block tags, anchors
      // injected around 'table' tokens) so the extractor faces every
      // branch; the oracle rebuilds the same pages and replays the
      // identical RE2∩Java regex chain.
      val docs = t(s, dir, "documents")
      HtmlText.extract(
          docs.select(col("doc_id"), syntheticHtml.as("html")),
          "doc_id", "html")
        .orderBy("doc_id")
    }),

    "x_pipeline_web" -> ((s, dir) => {
      // End-to-end web-corpus slice: synthesize pages → extract text →
      // quality gate (min chars + link-density cap, the boilerplate
      // signal n_links exists for) → exact dedup on the EXTRACTED text
      // keeping the smallest id — the first stages of a crawl pipeline
      // composed, hash-replayed as one chain.
      val docs = t(s, dir, "documents")
      Dedup.exactWithHash(
          HtmlText.extract(
              docs.select(col("doc_id"), syntheticHtml.as("html")),
              "doc_id", "html")
            .filter(col("text_chars") >= 50 && col("n_links") <= 5),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    "x_stream_sq8" -> ((s, dir) => {
      // Ingest-time embedding featurization: arriving vectors encode
      // against the FROZEN persisted grid through the projection-only
      // encoder (grid = plan-constant arrays, indexed transform — no
      // join, zero state). The oracle recodes from the same grid
      // parquet, so the live stream hash-proves the frozen-grid codes.
      try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () }
      val path = stageIndex(sq8IdxDir, dir) {
        graft.operators.Embeddings.scalarGrid(
            t(s, dir, "embeddings"), "vec_id", "embedding")
          .coalesce(1).write.mode("overwrite").parquet(s"$sq8IdxDir/grid")
      }
      val grid = s.read.parquet(s"$path/grid")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      val schema = s.read.parquet(s"$dir/embeddings.parquet").schema
      val raw = s.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings.parquet").parquet(dir)
      val name = s"stream_sq8_${System.nanoTime()}"
      val q = graft.operators.Embeddings.encodeWithGridProjection(
          raw, "vec_id", "embedding", grid)
        .select("vec_id", "code_digest")
        .writeStream.format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .outputMode("append").start()
      q.awaitTermination()
      s.table(name).orderBy("vec_id")
    }),

    "x_stream_extract" -> ((s, dir) => {
      // The extraction chain is a PURE projection, so it runs unchanged
      // on a live stream with zero state — ingest-time text extraction
      // where the crawl lands. Shares x_text_extract_html's oracle: the
      // real readStream run must hash-match the batch chain.
      try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () }
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val raw = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
      val name = s"stream_extract_${System.nanoTime()}"
      val q = HtmlText.extract(
          raw.select(col("doc_id"), syntheticHtml.as("html")),
          "doc_id", "html")
        .writeStream.format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .outputMode("append").start()
      q.awaitTermination()
      s.table(name).orderBy("doc_id")
    }),

    "x_sft_format" -> ((s, dir) =>
      // Chat-format SFT assembly: documents grouped by source into
      // conversations (ordered by doc_id, alternating user/assistant),
      // tagged, joined, with total vs LOSS token counts — the
      // post-training data-prep step between curation and the trainer.
      Curation.sftAssemble(
          t(s, dir, "documents"), "source", "doc_id", "text")
        .select(col("source").as("conv_id"), col("n_turns"),
          col("total_tokens"), col("loss_tokens"), col("sft_md5"))
        .orderBy("conv_id")),

    "x_sft_spans" -> ((s, dir) =>
      // The loss mask itself: per-turn token intervals [tok_start,
      // tok_end) in the assembled sequence, loss only on assistant
      // turns — a keyed running-sum window, aligned by construction
      // with x_sft_format's token arithmetic.
      Curation.sftTurns(
          t(s, dir, "documents"), "source", "doc_id", "text")
        .select(col("source").as("conv_id"), col("turn_idx"), col("role"),
          col("turn_tokens"), col("tok_start"), col("tok_end"),
          col("loss_turn"))
        .orderBy("conv_id", "turn_idx")),

    "x_sft_span_corrupt" -> ((s, dir) =>
      // T5-style SPAN CORRUPTION pairs: deterministic hash-masked token
      // runs collapse to sentinels in the input; the masked runs become
      // the target — the denoising-objective data prep, exact to the
      // string (no RNG state, pure function of the corpus).
      Curation.spanCorruptionPairs(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "x_stream_spancorrupt" -> ((s, dir) => {
      // Streaming twin of x_sft_span_corrupt: the SAME denoising pairs
      // folded row-locally with array HOFs — no explode, no window,
      // zero streaming state; shares the batch oracle verbatim.
      try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () }
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      graft.streaming.StreamSpanCorrupt.runOnce(s, dir,
          "documents.parquet", schema, "doc_id", "text")
        .orderBy("doc_id")
    }),

    "x_pref_pairs" -> ((s, dir) =>
      // DPO/RLHF preference-pair assembly — the post-training sibling
      // of x_sft_format: per prompt group (source), the best-scored
      // candidate pairs against each of the next 3 STRICTLY-worse ones
      // (ties are not preferences). One keyed rank window + a keyed
      // best-vs-rest join; margin is integer-exact.
      Curation.preferencePairs(t(s, dir, "documents"),
          "source", "doc_id", "n_chars", maxPairs = 3)
        .orderBy("source", "rejected_id")),

    "x_privacy_kanon" -> ((s, dir) =>
      // k-anonymity release audit over quasi-identifiers (nation ×
      // market segment): one partial-aggregable hash-agg; at_risk
      // combinations identify fewer than k=10 individuals — the data
      // card's privacy gate next to the PII scrub.
      Curation.kAnonymityAudit(t(s, dir, "customer"),
          Seq("c_nationkey", "c_mktsegment"), k = 10)
        .orderBy("c_nationkey", "c_mktsegment")),

    "x_privacy_suppress" -> ((s, dir) =>
      // the enforcement twin: suppress every row in an at-risk
      // quasi-identifier group (broadcast anti-join — the risky-group
      // set is policy-sized by construction)
      Curation.kAnonymitySuppress(t(s, dir, "customer"),
          Seq("c_nationkey", "c_mktsegment"), k = 10)
        .select("c_custkey", "c_nationkey", "c_mktsegment")
        .orderBy("c_custkey")),

    "x_export_jsonl" -> ((s, dir) => {
      // Sharded JSONL corpus release: canonical hand-assembled lines
      // (explicit field order, backslash-then-quote escaping — never an
      // engine's own JSON serializer, whose spacing/unicode choices
      // differ), md5 shards, one file per shard. UNLIKE the .npy
      // report, the ENTIRE report row replays cross-engine — including
      // the sha256 of the exact file bytes (DuckDB string_agg in shard
      // order || trailing newline hashes to the same digest).
      val docs = t(s, dir, "documents")
      val esc = replace(replace(col("text"), lit("\\"), lit("\\\\")),
        lit("\""), lit("\\\""))
      val line = concat(lit("{\"doc_id\":"), col("doc_id").cast("string"),
        lit(",\"lang\":\""), col("lang"), lit("\",\"source\":\""),
        col("source"), lit("\",\"text\":\""), esc, lit("\"}"))
      Curation.exportJsonl(docs.select(col("doc_id"), line.as("line")),
          "doc_id", "line", "/tmp/graft_export_jsonl", numShards = 8)
        .select("shard_no", "n_rows", "byte_len", "sha256")
        .orderBy("shard_no")
    }),

    "x_mix_waterfill" -> ((s, dir) => {
      // Water-filling budget allocation across sources at 60% of the
      // corpus: small domains keep everything, large ones cap at a
      // common level, Σ allocated ≡ budget EXACTLY (integer level +
      // deterministic remainder rule). The sort windows run over the
      // domain table, never the corpus.
      val docs = t(s, dir, "documents")
      val total = docs.agg(sum(col("n_chars")).cast("long")).head().getLong(0)
      Curation.domainWaterfill(docs, "source", "n_chars", total * 6 / 10)
        .orderBy("source")
    }),

    "x_mix_waterfill_take" -> ((s, dir) => {
      // the allocation ENFORCED: per source, docs in doc_id order until
      // the water-filled budget is reached (≤ one-doc overrun per
      // domain — the takeByBudget convention, keyed per domain)
      val docs = t(s, dir, "documents")
      val total = docs.agg(sum(col("n_chars")).cast("long")).head().getLong(0)
      Curation.waterfillTake(docs, "source", "doc_id", "n_chars",
          total * 6 / 10)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    }),

    "x_privacy_ldiv" -> ((s, dir) =>
      // l-diversity audit — the homogeneity-attack companion to
      // x_privacy_kanon: a (nation, segment) group where EVERY member
      // shares the same account-balance sign leaks the sensitive
      // attribute even when k-anonymous. Same one-aggregate shape.
      Curation.lDiversityAudit(
          t(s, dir, "customer").withColumn("bal_sign",
            when(col("c_acctbal") < 0, lit("neg")).otherwise(lit("pos"))),
          Seq("c_nationkey", "c_mktsegment"), "bal_sign", l = 2)
        .orderBy("c_nationkey", "c_mktsegment")),

    "x_privacy_tclose" -> ((s, dir) =>
      // t-closeness audit — the distribution-skew companion completing
      // the k-anonymity / l-diversity trilogy: a (nation, segment)
      // group whose balance-sign mix deviates >300‰ (total variation)
      // from the corpus-wide mix leaks the sensitive attribute even
      // when k-anonymous and l-diverse.
      Curation.tClosenessAudit(
          t(s, dir, "customer").withColumn("bal_sign",
            when(col("c_acctbal") < 0, lit("neg")).otherwise(lit("pos"))),
          Seq("c_nationkey", "c_mktsegment"), "bal_sign", tPermille = 300)
        .orderBy("c_nationkey", "c_mktsegment")),

    "x_contrastive_triplets" -> ((s, dir) => {
      // (anchor, positive, negative) training triplets: positives = mined
      // jaccard near-dups, negatives = deterministic per-shard md5
      // derangement — no cross join, no random state.
      val docs = t(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 0.6,
        maxShingleFreq = Some(jaccardFreqCap))
      Curation.contrastiveTriplets(docs, pairs, "doc_id", numShards = 8)
        .orderBy("anchor", "positive")
    }),

    "x_quality_flags" -> ((s, dir) =>
      // Gopher/C4-style rule bundle with per-rule attribution flags —
      // deterministic IEEE comparisons, oracle-replayed bit-for-bit.
      TextAnalysis.qualityFlags(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "x_knn_graph" -> ((s, dir) => // oracle: full IVF probe+rerank replay
      // All-corpus kNN edge list via IVF probing with the probe side
      // shuffle-joined on the cell id (corpus-sized — never broadcast).
      // nlist grows with the corpus (64 cells here): the cell key is the
      // join's parallelism AND bounds per-query candidates at
      // nprobe/nlist of the corpus — 16 cells made both degenerate.
      Similarity.knnGraph(t(s, dir, "embeddings"), "vec_id", "embedding", 5,
          nlist = 64, nprobe = 8)
        .orderBy("qid", "rank")),

    "x_hard_negatives" -> ((s, dir) =>
      // Contrastive-training data prep: per anchor, nearest neighbor as
      // the positive and the best-ranked sub-threshold neighbor as the
      // hard negative (ANCE-style top-ranked non-positive). One
      // conditional agg over the oracle-replayable kNN edge list.
      Similarity.hardNegatives(t(s, dir, "embeddings"), "vec_id", "embedding",
          k = 5, dupThreshold = 0.9, nlist = 64, nprobe = 8)
        .orderBy("anchor")),

    "x_knn_components" -> ((s, dir) =>
      // Graph-based curation on the kNN edge list: keep only MUTUAL
      // top-k edges (hub/boundary pruning), resolve connected components
      // by pointer-jumping CC, keep the smallest-id exemplar — the
      // SemDeDup-adjacent "cluster the neighborhood graph" primitive.
      // Fully oracle-replayed: IVF edges + mutuality + recursive-CTE CC.
      Similarity.mutualKnnComponents(t(s, dir, "embeddings"),
          "vec_id", "embedding", 5, nlist = 64, nprobe = 8)
        .select(col("doc_id").as("vec_id"), col("cluster_id"),
          col("n_members"), col("keep"))
        .orderBy("vec_id")),

    "x_graph_pagerank" -> ((s, dir) => { // centrality-based data selection
      // PageRank over the kNN similarity graph: hub documents (high pr)
      // are the corpus's most-representative picks; the ordered-fold
      // variant makes every float rank bit-replayable by the oracle.
      val edges = Similarity.knnGraph(t(s, dir, "embeddings"),
        "vec_id", "embedding", 5, nlist = 64, nprobe = 8)
      GraphOps.pageRank(edges, "qid", "id", iterations = 3)
        .select(col("node").as("vec_id"), col("pr"))
        .orderBy("vec_id")
    }),

    "x_graph_triangles" -> ((s, dir) => { // triangle census of the kNN graph
      // Exact triangles + local clustering coefficients over the same
      // kNN similarity graph as pagerank/labelprop: coefficient → 1
      // flags near-duplicate clique neighborhoods, → 0 flags hubs
      // stitched to strangers. Degree-ordered compact-forward keeps the
      // wedge join O(m^1.5) at any hub; every figure is integer so the
      // whole census hash-verifies through the full kNN replay.
      val edges = Similarity.knnGraph(t(s, dir, "embeddings"),
        "vec_id", "embedding", 5, nlist = 64, nprobe = 8)
      GraphOps.triangleCount(edges, "qid", "id")
        .orderBy("node")
    }),

    "x_quality_topquartile" -> ((s, dir) => {
      // Relative quality gate: top 25% per language by stopword ratio,
      // integer rank-vs-count test (no percentile estimate).
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis.quality(docs, "doc_id", "text")
        .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      Curation.topFractionByDomain(scored, "lang", "doc_id", "stopword_ratio")
        .select("doc_id", "lang", "n_tokens", "stopword_ratio")
        .orderBy("doc_id")
    }),

    "x_dedup_spans" -> ((s, dir) =>
      // Duplicate-substring localization: maximal token spans whose every
      // 8-gram appears in >= 2 distinct docs — what suffix-array dedup
      // clips, as one shingle agg + semi-join + per-doc run merge.
      Dedup.duplicateSpans(t(s, dir, "documents"), "doc_id", "text", n = 8)
        .orderBy("doc_id", "span_start")),

    "x_dedup_clip" -> ((s, dir) =>
      // Span clipping: duplicated 8-gram runs removed from each doc (the
      // keep-the-document transform); unaffected docs pass through.
      Dedup.clipSpans(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "x_decontam_ngram" -> ((s, dir) => {
      // Exact 8-gram eval-contamination report: reference corpus = every
      // 7th doc, candidates = the rest. 13 is the published convention;
      // 8 keeps the check meaningful on the short synthetic docs.
      val docs = t(s, dir, "documents")
      Dedup.ngramOverlapReport(docs.filter(col("doc_id") % 7 =!= 0),
          docs.filter(col("doc_id") % 7 === 0), "doc_id", "text", n = 8)
        .orderBy("cand_id")
    }),

    "x_decontam_clip" -> ((s, dir) => {
      // Surgical decontamination: clip reference 8-gram runs out of the
      // candidates (every-7th-doc eval set, matching x_decontam_ngram's
      // split) instead of dropping the whole document.
      val docs = t(s, dir, "documents")
      Dedup.clipContaminated(docs.filter(col("doc_id") % 7 =!= 0),
          docs.filter(col("doc_id") % 7 === 0), "doc_id", "text", n = 8)
        .orderBy("doc_id")
    }),

    "x_decontam_embedding" -> ((s, dir) => {
      // Semantic decontamination: every-17th vector is the eval set, the
      // rest the corpus; flag corpus vectors with any eval neighbor at
      // cosine ≥ 3/5 (exact rational test — the oracle replays the full
      // LSH-candidate + integer-threshold pipeline hash-exactly).
      val emb = t(s, dir, "embeddings")
      Dedup.embeddingDecontam(
          emb.filter(col("vec_id") % 17 =!= 0),
          emb.filter(col("vec_id") % 17 === 0),
          "vec_id", "embedding", thresholdNum = 3L, thresholdDen = 5L,
          tables = hpTables, planes = hpPlanes,
          maxRefBucket = Some(hpBucketCap))
        .orderBy("id")
    }),

    "x_decontam_bloom" -> ((s, dir) => {
      // Memory-lean production decontamination: reference n-grams folded
      // into ONE broadcast bitset (fixed KBs vs GBs of strings at
      // benchmark-suite scale), candidates stream through the membership
      // probe. The md5 double-hash bit family makes the ENTIRE filter —
      // bit pattern, membership tests, false positives included —
      // SQL-replayable, so this probabilistic operator runs under the
      // hard hash gate (flipped from rows-only in round 8; the murmur
      // variant remains for raw-throughput deployments, spec-pinned).
      val docs = t(s, dir, "documents")
      Dedup.decontaminateNgramBloomReplayable(
          docs.filter(col("doc_id") % 7 =!= 0),
          docs.filter(col("doc_id") % 7 === 0), "doc_id", "text", n = 8,
          numBits = 1 << 20, numHashes = 7)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),

    "x_domain_mix" -> ((s, dir) =>
      // Target-proportion training mix over a 100-doc budget, winners in
      // md5-of-id order (engine-agnostic determinism).
      Curation.domainMix(t(s, dir, "documents").select("doc_id", "lang", "source"),
          "lang", "doc_id",
          Map("en" -> 0.5, "de" -> 0.2, "fr" -> 0.15, "es" -> 0.1, "zh" -> 0.05),
          100L)
        .orderBy("doc_id")),

    "x_domain_temperature" -> ((s, dir) =>
      // α=1/2 temperature mix: per-source budgets ∝ isqrt(count), all
      // integer arithmetic so the oracle reproduces every floor exactly.
      Curation.domainMixTemperature(
          t(s, dir, "documents").select("doc_id", "source"),
          "source", "doc_id", 400L)
        .orderBy("doc_id")),

    "x_skew_profile" -> ((s, dir) =>
      // Heavy-hitter key diagnostic: top-20 order keys by lineitem row
      // count with integer ppm share — the pre-join skew check.
      Scale.keyProfile(t(s, dir, "lineitem"), "l_orderkey", 20)
        .orderBy(col("n").desc, col("key"))),

    "x_pipeline_semantic" -> ((s, dir) => {
      // Second end-to-end composite, over THIS round's operators: rule-
      // bundle quality gate -> semantic dedup of the SURVIVORS' embeddings
      // (centroids re-seeded on the filtered set) -> exemplar-or-unique
      // survivor list. One DataFrame program, one DuckDB oracle chain.
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      // the quality gate feeds THREE consumers (embedding join, final
      // survivor join, and semanticDedup's centroid collect) — checkpoint
      // it once instead of re-running the corpus-wide flag aggregations
      val kept = TextAnalysis.qualityFlags(docs, "doc_id", "text")
        .filter(col("keep")).select("doc_id", "n_tokens")
        .localCheckpoint(true)
      val vecs = emb.join(kept.select(col("doc_id").as("vec_id")), Seq("vec_id"))
      val clusters = Dedup.semanticDedup(vecs, "vec_id", "embedding",
          thresholdNum = semThreshNum, thresholdDen = semThreshDen,
          nlist = semNlist, maxCellSize = Some(semCellCap))
        .select(col("doc_id").as("__cid"), col("keep").as("__k"))
      kept.join(clusters, col("doc_id") === col("__cid"), "left")
        .filter(col("__k").isNull || col("__k"))
        .select("doc_id", "n_tokens")
        .orderBy("doc_id")
    }),

    "x_pipeline_rag" -> ((s, dir) => {
      // Third end-to-end composite, over THIS round's operators: the RAG
      // ingestion pipeline — NB-margin quality gate → overlapping token
      // chunking of the survivors → per-chunk token counts under the
      // induced BPE subword vocab. One DataFrame program; the oracle
      // replays classifier, chunker, and greedy tokenizer in one chain.
      val docs = t(s, dir, "documents")
      val kept = docs.join(
        TextAnalysis.nbQualityScore(docs,
            docs.filter(col("source") === "src0"),
            docs.filter(col("source") =!= "src0"), "doc_id", "text")
          .filter(col("score") > 0).select("doc_id"),
        Seq("doc_id"))
      val chunks = Curation.chunkTokens(kept, "doc_id", "text", 32, 24)
      val vocab = TextAnalysis.bpePairCounts(docs, "text", 50)
        .collect().map(_.getString(0)).toSeq
      chunks.select(col("doc_id"), col("chunk_id"), col("start_tok"),
          col("n_tokens"), explode(split(col("chunk"), " ")).as("w"))
        .select(col("doc_id"), col("chunk_id"), col("start_tok"), col("n_tokens"),
          size(graft.functions.TextFunctions.subword_encode(col("w"),
            vocab.toArray)).as("k"))
        .groupBy("doc_id", "chunk_id", "start_tok", "n_tokens")
        .agg(sum(col("k")).as("n_subwords"))
        .orderBy("doc_id", "chunk_id")
    }),

    "x_pipeline_curate" -> ((s, dir) => {
      // FLAGSHIP composite: the whole training-data curation pipeline in
      // one query — quality gate → exact dedup → 8-gram decontamination
      // vs the eval split → domain mix → token budget → export shards.
      // Every stage is deterministic (exact predicates + md5 priority),
      // so ONE DuckDB oracle replays the pipeline end to end. This is the
      // composability proof: the operators chain as plain DataFrames with
      // no materialization boundaries between stages.
      val budgeted = curateStages(s, dir).last._2
      Curation.shuffleShards(
          budgeted.select("doc_id", "lang", "n_tokens", "cum_before"),
          "doc_id", 4)
        .orderBy("doc_id")
    }),

    "x_pipeline_observe" -> ((s, dir) => {
      // In-flight pipeline observability via Spark's observe() API:
      // input-side metrics (row count, char mass) accumulate DURING the
      // same pass that computes the gated output — accumulator-backed,
      // NO second scan of the input. At 100 TB this is the difference
      // between metrics-for-free and re-reading the corpus to count it.
      // The four scalars are bounded metadata (an Observation row, like
      // the BPE argmax), not row data.
      val docs = t(s, dir, "documents")
      val obs = org.apache.spark.sql.Observation(s"curate_obs_${System.nanoTime()}")
      val gated = docs
        .observe(obs, count(lit(1)).as("n_in"),
          sum(length(col("text"))).cast("long").as("chars_in"))
        .filter(col("n_chars") >= 100)
      val out = gated.agg(count(lit(1)).as("n_kept"),
        sum(size(split(col("text"), " "))).cast("long").as("tokens_kept"))
        .head()
      val m = obs.get
      import s.implicits._
      Seq((m("n_in").asInstanceOf[Long], m("chars_in").asInstanceOf[Long],
        out.getLong(0), out.getLong(1)))
        .toDF("n_in", "chars_in", "n_kept", "tokens_kept")
    }),

    "x_pipeline_funnel" -> ((s, dir) =>
      // Per-stage attrition report over the SAME stage frames as the
      // flagship composite (shared builder — the two entries cannot
      // drift): rows surviving each stage and rows dropped by it, the
      // audit artifact a curation run ships with its output.
      Curation.funnelReport(curateStages(s, dir)).orderBy("stage_no")),

    "x_dedup_best" -> ((s, dir) => {
      // Keep-best-per-cluster: same capped jaccard mining + connected
      // components as x_dedup_clusters, canonical doc re-picked by
      // n_chars (longest copy wins, ties to the smallest id).
      val docs = t(s, dir, "documents")
      Dedup.bestPerCluster(
          Dedup.duplicateClusters(Dedup.jaccardPairs(docs, "doc_id", "text", 0.6,
            maxShingleFreq = Some(jaccardFreqCap))),
          docs.select("doc_id", "n_chars"), "doc_id", "n_chars")
        .orderBy("doc_id")
    }),

    "x_layout_zorder" -> ((s, dir) => {
      // Morton values over bucketized (custkey, orderkey): the write-side
      // layout key that lets footer stats prune on either dimension.
      val o = t(s, dir, "orders")
      o.select(col("o_orderkey"), col("o_custkey"),
          graft.operators.Scale.zValue(pmod(col("o_custkey"), lit(1024L)),
            pmod(col("o_orderkey"), lit(1024L)), 10).as("z"))
        .orderBy("o_orderkey")
    }),

    "x_layout_prunestats" -> ((s, dir) => { // oracle: census replay over the staged layout
      // FILE SKIPPING, MEASURED: orders written in z-order of
      // (custkey, orderkey) buckets, 64 z-range units (top-6 Morton
      // bits as a hive bucket — the deterministic stand-in for the
      // write-time-UUID part files footer stats attach to), then the
      // zone-map census: per-unit min/max of BOTH dimensions and
      // whether a mid-range predicate on either one skips the unit.
      // This is the gauge that PROVES a layout prunes (the x_layout_
      // zorder values are the mechanism; this is the measurement) —
      // and it hash-verifies because the bucketed layout is a pure
      // function of the data.
      val staged = stageIndex(pruneStatsDir, dir) {
        val o = t(s, dir, "orders")
        // MONOTONE affine bucketization into [0, 1024) from the actual
        // key bounds (a pmod wrap mixes low and high raw values into
        // one bucket and its zone map spans the whole domain — pmod on
        // the sparse orderkey measurably pruned ZERO units; and a fixed
        // div that underfills the bit space collapses every row into
        // bucket 0). The two bounds are a 1-row staging-time aggregate;
        // the oracle never replays staging — it reads the artifact.
        val b = o.agg(min("o_custkey"), max("o_custkey"),
          min("o_orderkey"), max("o_orderkey")).head()
        val (ckMn, ckMx, okMn, okMx) =
          (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
        val z = graft.operators.Scale.zValue(
          expr(s"CAST((o_custkey - $ckMn) * 1024 DIV ${ckMx - ckMn + 1} AS BIGINT)"),
          expr(s"CAST((o_orderkey - $okMn) * 1024 DIV ${okMx - okMn + 1} AS BIGINT)"),
          10)
        o.select(col("o_orderkey"), col("o_custkey"))
          .withColumn("zb", shiftrightunsigned(z, 14))
          .repartition(col("zb"))
          .write.mode("overwrite").partitionBy("zb").parquet(pruneStatsDir)
      }
      graft.operators.Scale.pruneStats(s.read.parquet(staged),
          Seq("o_custkey", "o_orderkey"),
          Seq(("o_custkey", 100L, 199L), ("o_orderkey", 10000L, 19999L)),
          fileLabel = col("zb").cast("long"))
        .orderBy("file")
    }),

    "x_token_budget" -> ((s, dir) => {
      // Budget-bounded selection in deterministic md5 priority order:
      // two-pass partition-offset cumulative sum, no global window.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          md5(col("doc_id").cast("string")).as("__hx"))
      Curation.takeByBudget(docs, Seq("__hx", "doc_id"), "n_tokens", 5000L)
        .select("doc_id", "n_tokens", "cum_before")
        .orderBy("doc_id")
    }),

    "x_shards_rendezvous" -> ((s, dir) =>
      // STABLE sharding under capacity change: hash%N (x_shuffle_shards)
      // remaps nearly every key when N grows; rendezvous/HRW moves only
      // the keys the NEW shard wins — and they all move TO it. The
      // entry materializes assignments at N=8 and N=9 side by side with
      // the moved flag, so the minimal-movement property is in the
      // hashed output itself (~1/9 of rows moved, all to shard 8).
      t(s, dir, "documents").select(col("doc_id"),
          Curation.rendezvousShard(col("doc_id"), 8).as("shard_n8"),
          Curation.rendezvousShard(col("doc_id"), 9).as("shard_n9"))
        .withColumn("moved",
          (col("shard_n8") =!= col("shard_n9")).cast("int"))
        .orderBy("doc_id")),

    "x_shuffle_shards" -> ((s, dir) =>
      // Deterministic global shuffle: md5-derived shard + in-shard
      // position, the export permutation before sequential training reads.
      Curation.shuffleShards(t(s, dir, "documents").select("doc_id"), "doc_id", 8)
        .orderBy("doc_id")),

    "x_dedup_minhash_pairs" -> ((s, dir) =>
      // md5Base double-hash family so the DuckDB oracle replays the
      // identical signature → band → bucket-cap → verify pipeline; banding
      // matches lshNumHashes/lshBandCount/lshBucketCap above.
      Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text", 0.7,
          numHashes = lshNumHashes, bands = lshBandCount,
          base = Dedup.Hashers.md5Base,
          maxBucketSize = Some(lshBucketCap))
        .orderBy("a", "b")),

    "x_eval_dedup" -> ((s, dir) => {
      // Dedup-pipeline EVALUATION: the LSH banding's raw candidate set
      // scored against exact-Jaccard truth at the 0.7 threshold — one
      // row of (n_truth, n_candidates, tp, fn); banding recall is
      // tp/n_truth, verifier workload is n_candidates. The measurement
      // numHashes/bands/bucket caps are tuned against, as x_eval_retrieval
      // is for ANN. Same md5 family/banding as the oracle chain.
      val docs = t(s, dir, "documents")
      val cand = Dedup.lshCandidatePairs(docs, "doc_id", "text",
          numHashes = lshNumHashes, bands = lshBandCount,
          base = Dedup.Hashers.md5Base, maxBucketSize = Some(lshBucketCap))
        .withColumn("__c", lit(1))
      val truth = Dedup.jaccardPairs(docs, "doc_id", "text", 0.7)
        .select(col("a"), col("b")).withColumn("__t", lit(1))
      cand.join(truth, Seq("a", "b"), "full_outer")
        .agg(
          sum(when(col("__t") === 1, 1).otherwise(0)).cast("long")
            .as("n_truth"),
          sum(when(col("__c") === 1, 1).otherwise(0)).cast("long")
            .as("n_candidates"),
          sum(when(col("__c") === 1 && col("__t") === 1, 1).otherwise(0))
            .cast("long").as("tp"),
          sum(when(col("__t") === 1 && col("__c").isNull, 1).otherwise(0))
            .cast("long").as("fn"))
    }),

    "x_eval_dedup_sampled" -> ((s, dir) => {
      // THE 100 TB FORM of the eval pillar's truth: exact-Jaccard is
      // quadratic, so truth restricts to a deterministic md5-sampled id
      // subset (the shuffleShards hash convention — engine-replayable,
      // partition-independent), while the CANDIDATE side stays the full
      // production banding filtered to sampled pairs. Sampled recall
      // estimates production recall at O(corpus) mining + O((n/S)²)
      // truth — the form that still runs when the corpus is 100 TB.
      // The exact x_eval_dedup stays the fixture-scale gold.
      val docs = t(s, dir, "documents")
      def inSample(c: org.apache.spark.sql.Column) =
        conv(substring(md5(c.cast("string")), 1, 15), 16, 10)
          .cast("long") % evalSampleMod === 0
      val cand = Dedup.lshCandidatePairs(docs, "doc_id", "text",
          numHashes = lshNumHashes, bands = lshBandCount,
          base = Dedup.Hashers.md5Base, maxBucketSize = Some(lshBucketCap))
        .filter(inSample(col("a")) && inSample(col("b")))
        .withColumn("__c", lit(1))
      val truth = Dedup.jaccardPairs(docs.filter(inSample(col("doc_id"))),
          "doc_id", "text", 0.7)
        .select(col("a"), col("b")).withColumn("__t", lit(1))
      cand.join(truth, Seq("a", "b"), "full_outer")
        .agg(
          sum(when(col("__t") === 1, 1).otherwise(0)).cast("long")
            .as("n_truth"),
          sum(when(col("__c") === 1, 1).otherwise(0)).cast("long")
            .as("n_candidates"),
          sum(when(col("__c") === 1 && col("__t") === 1, 1).otherwise(0))
            .cast("long").as("tp"),
          sum(when(col("__t") === 1 && col("__c").isNull, 1).otherwise(0))
            .cast("long").as("fn"))
    }),

    "x_corpus_overlap" -> ((s, dir) =>
      // Corpus-overlap audit: pairwise source↔source shingle-set overlap
      // from per-source minhash signatures + exact intersection counts
      // (verifyExact — the audit/oracle config; DuckDB replays the md5
      // K-M family, the G² signature compare, and the exact set join).
      Dedup.corpusOverlap(t(s, dir, "documents"), "source", "text",
          numHashes = lshNumHashes, base = Dedup.Hashers.md5Base,
          verifyExact = true)
        .orderBy("a", "b")),

    "x_corpus_overlap_fast" -> ((s, dir) =>
      // PRODUCTION overlap configuration: xx64 family, estimator only —
      // the corpus-wide cost is ONE signature aggregation; no pairwise
      // shingle join at all. Rows-only (xxhash64 not oracle-replayable);
      // estimator-vs-exact agreement is spec-pinned (DedupSpec).
      Dedup.corpusOverlap(t(s, dir, "documents"), "source", "text",
          numHashes = lshNumHashes, base = Dedup.Hashers.xx64Base,
          verifyExact = false)
        .orderBy("a", "b")),

    "x_text_linededup" -> ((s, dir) => {
      // CORPUS-LEVEL LINE DEDUP (CCNet / RefinedWeb practice): any line
      // shared verbatim by >= 2 documents is template chrome — cookie
      // banners, navigation, license headers — struck from EVERY
      // document while the rest survives in order. The within-document
      // complement of whole-document dedup: exact/minhash drops copies
      // of a page, this strips the template the pages share. The
      // single-line fixture docs are re-lined into 8-word rows first
      // (~4% of line rows are shared template at sf0.01).
      val docs = t(s, dir, "documents")
      val lined = docs.select(col("doc_id"), relinedText.as("text"))
      TextAnalysis.dedupLines(lined, "doc_id", "text", minDocs = 2)
        .orderBy("doc_id")
    }),

    "x_stream_linededup" -> ((s, dir) => { // LIVE stream, shares x_text_linededup's oracle
      // INGEST-TIME template removal: the boilerplate set mined in
      // batch (boilerplateLines) is the deployed model; each ARRIVING
      // document is cleaned by a zero-state, order-preserving array
      // filter against the plan-constant set — no explode, no per-doc
      // streaming aggregation, one O(1) hash probe per line. Converges
      // to the batch operator's exact table, so the oracle is shared
      // verbatim (the x_stream_extract convention).
      try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () }
      val docs = t(s, dir, "documents")
      val boiler = TextAnalysis.boilerplateLines(
          docs.select(col("doc_id"), relinedText.as("text")),
          "doc_id", "text", minDocs = 2)
        .select("line").collect().map(_.getString(0)).toSet
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      graft.streaming.StreamLineDedup.runOnce(s, dir, "documents.parquet",
          schema, boiler, "doc_id", "text",
          prep = df => df.select(col("doc_id"), relinedText.as("text")))
        .orderBy("doc_id")
    }),

    "x_corpus_overlap_kmv" -> ((s, dir) =>
      // SKETCH SET ALGEBRA joining the overlap family: x_corpus_overlap
      // joins the corpora on content (exact), x_corpus_overlap_fast
      // estimates via minhash signatures (rows-only); the KMV matrix
      // estimates |A|, |B|, |A∪B|, |A∩B| and Jaccard per source pair
      // from capacity-16 k-min buffers ALONE — one (group, hash)
      // distinct shuffle, then pure sketch algebra on G·cap longs. And
      // because the k-min sketch is a pure function of the input SET,
      // even the estimator regime hash-verifies (the x_kmv_distinct
      // argument, lifted to pairs — ~25 docs/source at sf0.01 puts
      // every group and pair over capacity).
      graft.operators.Sketches.kmvOverlapMatrix(
          t(s, dir, "documents"), "source", "text", capacity = 16)
        .orderBy("ga", "gb")),

    "x_dedup_editdist" -> ((s, dir) =>
      // Character-level fuzzy dedup: LSH band candidates verified by
      // normalized Levenshtein (all-integer threshold test). md5Base so
      // DuckDB replays band mining; its levenshtein is the same algorithm.
      Dedup.editDistancePairs(t(s, dir, "documents"), "doc_id", "text",
          maxDistPerMille = 300, base = Dedup.Hashers.md5Base,
          maxBucketSize = Some(lshBucketCap))
        .orderBy("a", "b")),

    "x_dedup_simhash" -> ((s, dir) =>
      Dedup.simhashSignatures(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "x_entity_resolution" -> ((s, dir) => {
      // Record linkage on structured names: every 10th customer gets a
      // re-keyed doppelganger with one character replaced, and the
      // blocked matcher (normalize → suffix block → capped pairs →
      // exact Levenshtein ≤ 2) must link each variant back to its
      // original — the classic MDM/dedupe step for short strings where
      // shingle-LSH blocking has nothing to band on.
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("id"),
          col("c_name").as("name"))
      val variants = cust.filter(col("id") % 10 === 0)
        .select((col("id") + 1000000L).as("id"),
          concat(substring(col("name"), 1, 9), lit("X"),
            expr("substring(name, 11)")).as("name"))
      Dedup.blockedFuzzyMatch(cust.unionByName(variants), "id", "name",
          maxDist = 2, suffixLen = 5)
        .orderBy("a", "b")
    }),

    "x_dedup_embedding_pairs" -> ((s, dir) =>
      // Quantized-hyperplane LSH candidates + exact re-rank — the corpus×
      // corpus product is never formed. The oracle replays the identical
      // signature→bucket→re-rank pipeline (integer-exact quantized dots),
      // so both engines see the same candidate set and the hash gate is
      // green by construction, like x_dedup_minhash_pairs.
      Dedup.embeddingTopPairsLsh(t(s, dir, "embeddings"), "vec_id", "embedding", 20,
          tables = hpTables, planes = hpPlanes, maxBucketSize = Some(hpBucketCap))
        .orderBy("rank")),

    "x_dedup_semantic" -> ((s, dir) =>
      // SemDeDup: assign each vector to its nearest literal centroid (pure
      // projection, no shuffle), mine cosine ≥ 2/5 pairs only within a
      // cell, resolve groups by pointer-jumping CC, keep the smallest id.
      // The threshold decision is integer-exact (DECIMAL), so the DuckDB
      // oracle replays the entire pipeline hash-identically.
      Dedup.semanticDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
          thresholdNum = semThreshNum, thresholdDen = semThreshDen,
          nlist = semNlist, maxCellSize = Some(semCellCap))
        .select(col("doc_id").as("vec_id"), col("cluster_id"),
          col("n_members"), col("keep"))
        .orderBy("vec_id")),

    "x_sim_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10)
        .orderBy("qid", "rank")
    }),

    "x_sim_ann_lsh" -> ((s, dir) => { // oracle: full quantized-LSH replay
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10)
        .orderBy("qid", "rank")
    }),

    "x_bitext_margin" -> ((s, dir) => {
      // MARGIN-BASED BITEXT MINING (Artetxe & Schwenk / CCMatrix): the
      // even-id half of the embeddings plays the source language, the
      // odd-id half the target; mined pairs are mutual nearest
      // neighbors scored by the ratio margin against each side's top-8
      // neighborhood. Everything on the floor(x·1e6) lattice — dots,
      // top-k sums, and the permille margin are exact integers.
      val emb = t(s, dir, "embeddings")
      Similarity.bitextMine(
          emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") % 2 === 1),
          "vec_id", "embedding", 8)
        .orderBy("sid")
    }),

    "x_eval_retrieval" -> ((s, dir) => {
      // ANN quality EVALUATION — the measurement loop every retrieval
      // deployment needs: LSH-ANN top-10 scored against the exact
      // brute-force top-10 per query (hits@10, top-1-in-truth), all
      // integer so the two-pipeline composite hash-matches. At 100 TB
      // this runs on a sampled query set against the full index — the
      // query side is broadcast in both pipelines.
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 5)
      val truth = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 10)
        .select(col("qid"), col("id")).withColumn("__in", lit(1))
      Similarity.lshTopK(emb, qs, "vec_id", "embedding", 10)
        .join(truth, Seq("qid", "id"), "left")
        .groupBy("qid")
        .agg(
          sum(coalesce(col("__in"), lit(0))).cast("long").as("hits_at_10"),
          max(when(col("rank") === 1 && col("__in") === 1, 1).otherwise(0))
            .cast("long").as("top1_in_truth"))
        .orderBy("qid")
    }),

    "x_eval_matryoshka" -> ((s, dir) => {
      // MATRYOSHKA TRUNCATION EVAL (MRL practice, Kusupati et al. 2022
      // — public knowledge): retrieval quality of the 16-dim PREFIX of
      // the 64-dim embedding against the full-vector exact top-10 —
      // the measurement that decides whether a 4× cheaper prefix index
      // serves well enough before anyone ships it. Same integer
      // hits@10 / top-1-agreement shape as x_eval_retrieval; pure
      // composition of existing kernels (slice + bruteForceTopK).
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 5)
      val pre = emb.select(col("vec_id"),
        expr("slice(embedding, 1, 16)").as("embedding"))
      val truth = Similarity.bruteForceTopK(emb, qs,
          "vec_id", "embedding", 10)
        .select(col("qid"), col("id")).withColumn("__in", lit(1))
      Similarity.bruteForceTopK(pre, pre.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10)
        .join(truth, Seq("qid", "id"), "left")
        .groupBy("qid")
        .agg(
          sum(coalesce(col("__in"), lit(0))).cast("long").as("hits_at_10"),
          max(when(col("rank") === 1 && col("__in") === 1, 1).otherwise(0))
            .cast("long").as("top1_in_truth"))
        .orderBy("qid")
    }),

    "x_retrieval_maxsim" -> ((s, dir) => {
      // LATE-INTERACTION retrieval (ColBERT-style MaxSim) — the fourth
      // member of the retrieval family after BM25 (lexical), dense
      // top-k, and RRF fusion: token-level embeddings synthesized by
      // reading the 64-dim fixture vector as a 4×16 row-major token
      // matrix on the floor(x·10⁶) fixed-point lattice, scored by the
      // vec_maxsim codegen kernel (Σ over query tokens of max over doc
      // tokens of dot). Every dot/max/sum is an exact integer-valued
      // double, so the ranks replay in DuckDB via list_dot_product over
      // the same slices.
      val toks = t(s, dir, "embeddings")
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("toks"))
      Similarity.maxsimTopK(toks, toks.filter(col("vec_id") < 5),
          "vec_id", "toks", 10, tokenDim = 16)
        .orderBy("qid", "rank")
    }),

    "x_retrieval_maxsim_pruned" -> ((s, dir) => {
      // THE SCALE PATH for late interaction (x_retrieval_maxsim is the
      // exact baseline, same contract as bruteforce→IVF): stage 1
      // shortlists k·rerank per query by the POOLED token-sum dot (one
      // 16-wide dot per pair), stage 2 re-ranks the shortlist with the
      // exact vec_maxsim kernel. Both stages integer-exact on the
      // lattice — the oracle replays shortlist AND re-rank bit-for-bit.
      val toks = t(s, dir, "embeddings")
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("toks"))
      Similarity.maxsimTopKPruned(toks, toks.filter(col("vec_id") < 5),
          "vec_id", "toks", 10, tokenDim = 16, rerank = 4)
        .orderBy("qid", "rank")
    }),

    "x_stream_maxsim" -> ((s, dir) => { // LIVE stream, shares x_retrieval_maxsim's replay
      // Streaming late-interaction serving: query vectors ARRIVE as a
      // stream; each micro-batch is lattice-tokenized and maxsim-scored
      // against the static token corpus via foreachBatch. Per-query
      // results are batch-invariant, so the live path shares the batch
      // entry's oracle verbatim (the x_stream_ann_serve convention).
      val emb = t(s, dir, "embeddings")
      val toks = emb.select(col("vec_id"),
        Similarity.quantize(col("embedding")).as("toks"))
      graft.streaming.StreamAnnServe.runOnceMaxsim(s, dir,
          "embeddings.parquet", emb.schema, col("vec_id") < 5,
          toks, "vec_id", "embedding", "toks", 10, tokenDim = 16)
        .orderBy("qid", "rank")
    }),

    "x_eval_maxsim" -> ((s, dir) => {
      // Late-interaction EVAL alongside x_eval_retrieval: maxsim@10
      // joined against the exact dense-cosine top-10 — hits@10 and
      // top-1 agreement per query measure how much late interaction
      // moves the ranking vs whole-vector retrieval on this corpus.
      // All integer, two-pipeline composite hash.
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 5)
      val truth = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 10)
        .select(col("qid"), col("id")).withColumn("__in", lit(1))
      val toks = emb.select(col("vec_id"),
        Similarity.quantize(col("embedding")).as("toks"))
      Similarity.maxsimTopK(toks, toks.filter(col("vec_id") < 5),
          "vec_id", "toks", 10, tokenDim = 16)
        .join(truth, Seq("qid", "id"), "left")
        .groupBy("qid")
        .agg(
          sum(coalesce(col("__in"), lit(0))).cast("long").as("hits_at_10"),
          max(when(col("rank") === 1 && col("__in") === 1, 1).otherwise(0))
            .cast("long").as("top1_in_truth"))
        .orderBy("qid")
    }),

    "x_corpus_datacard" -> ((s, dir) => {
      // The corpus DATA CARD: the one-row summary a dataset release
      // ships — volume, vocabulary of sources/langs, exact-duplicate
      // mass, length distribution bounds. ONE scan + partial aggs (the
      // dup count rides the same aggregation via count(distinct));
      // integer-exact throughout.
      t(s, dir, "documents").agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_distinct_texts"),
        (count(lit(1)) - countDistinct(col("text"))).as("exact_dup_docs"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(size(split(col("text"), " "))).cast("long").as("total_tokens"),
        sum(length(col("text"))).cast("long").as("total_chars"),
        min(col("n_chars")).cast("long").as("min_chars"),
        max(col("n_chars")).cast("long").as("max_chars"))
    }),

    "x_text_stats" -> ((s, dir) =>
      TextAnalysis.stats(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "x_text_quality" -> ((s, dir) =>
      TextAnalysis.quality(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "x_text_langid" -> ((s, dir) =>
      TextAnalysis.languageId(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "x_text_langconf" -> ((s, dir) =>
      // Lang-id confidence: winner score, margin to the runner-up, and a
      // mixed-language flag — all integer marker arithmetic.
      TextAnalysis.languageConfidence(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "x_text_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprint(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "x_text_rollhash" -> ((s, dir) =>
      TextAnalysis.rollingHash(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "x_text_repetition" -> ((s, dir) =>
      TextAnalysis.repetition(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "x_text_tokens" -> ((s, dir) =>
      TextAnalysis.tokenCounts(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "x_emb_pool" -> ((s, dir) =>
      // exact integer-space projection of per-label mean pooling (floor
      // e6 sums — float means are not order-stable across engines)
      Embeddings.poolSums(t(s, dir, "embeddings"), "label", "embedding")
        .select(col("label"), col("pos"), col("n_vecs"), col("sum_scaled").as("sum_e6"))
        .orderBy("label", "pos")),

    "x_emb_rq8" -> ((s, dir) =>
      // RESIDUAL quantization: a second SQ8 stage trained on stage 1's
      // reconstruction residuals — two uint8 codes/dim, per-vector
      // error-reduction accounting, all on exact integer lattices.
      Embeddings.residualQuantize(t(s, dir, "embeddings"),
          "vec_id", "embedding")
        .orderBy("vec_id")),

    "x_emb_kcenter" -> ((s, dir) =>
      // DIVERSE EXEMPLAR SELECTION: greedy k-center (farthest-point)
      // over the embedding corpus on the exact integer lattice — 8
      // rounds, each one corpus scan + a TakeOrdered argmax; the oracle
      // unrolls the same rounds.
      Embeddings.kcenterExemplars(t(s, dir, "embeddings"),
          "vec_id", "embedding", 8)
        .orderBy("round")),

    "x_emb_pca" -> ((s, dir) =>
      // ANISOTROPY / DRIFT DIAGNOSTIC: dominant covariance direction by
      // fix-point power iteration (one stats pass, BigInt driver solve,
      // broadcast-literal scoring), reported as per-label projection
      // mass. Exact to the bit — the oracle unrolls the same 12
      // iterations in HUGEINT.
      Embeddings.dominantDirectionReport(t(s, dir, "embeddings"),
          "embedding", "label")
        .orderBy("label")),

    "x_sim_ivf" -> ((s, dir) => { // oracle: full IVF probe+rerank replay
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10)
        .orderBy("qid", "rank")
    }),

    "x_sim_ivf_trained" -> ((s, dir) => { // approximate by design: rows-only
      // IVF with k-means-trained centroids (spark.ml, fixed seed): prices
      // the training pass + the better-balanced probe path.
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopKTrained(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10)
        .orderBy("qid", "rank")
    }),

    "x_sim_pq" -> ((s, dir) => { // oracle: full PQ train/encode/ADC replay
      // Product-quantization ADC scan + exact re-rank: the corpus scans as
      // m-byte codes (projection-encoded, zero shuffle) and only the
      // shortlist touches true float vectors — the memory-side ANN scale path.
      val emb = t(s, dir, "embeddings")
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10)
        .orderBy("qid", "rank")
    }),

    "x_layout_compact" -> ((s, dir) => { // oracle: content-neutrality hash
      // Generic small-files maintenance: a 64-way-fragmented copy of the
      // documents table is compacted to file count = ceil(bytes/target)
      // (here: ONE file, sized from the actual Hadoop listing — no data
      // pass), then aggregated. The oracle computes the same aggregate
      // over the ORIGINAL table, so the hash proves the rewrite changed
      // layout, not content; CompactSpec pins the file counts.
      val outDir = stageIndex(fragOutDir, dir) {
        t(s, dir, "documents").repartition(64)
          .write.mode("overwrite").parquet(fragInDir)
        graft.operators.Scale.compactParquet(s, fragInDir, fragOutDir,
          targetBytes = 1L << 30)
      }
      s.read.parquet(outDir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text"))).as("sum_text_len"))
        .orderBy("lang")
    }),

    "x_export_npy" -> ((s, dir) =>
      // Tensor export for training stacks: the embedding column lands as
      // float32 .npy shard files (public NumPy format, pure-JVM codec) +
      // an id manifest. The hashed projection is the SQL-replayable
      // sizing report — md5-shard row counts and the exact NPY
      // byte-length arithmetic (magic + 64-aligned header + n·dim·4);
      // the report's sha256 column is a binary artifact, pinned instead
      // by NpySpec's cross-partitioning determinism test.
      graft.operators.Embeddings.exportNpy(t(s, dir, "embeddings"),
          "vec_id", "embedding", "/tmp/graft_npy_export", numShards = 8)
        .select("shard_no", "n_rows", "n_dim", "byte_len")
        .orderBy("shard_no")),

    "x_export_npy_int8" -> ((s, dir) =>
      // The quantized serving artifact: uint8 .npy shards (4× smaller)
      // + the trained grid sidecar, codes from the SQ8 lattice — same
      // md5-shard determinism contract as x_export_npy, u8 header math
      // in the oracle (payload n·dim·1).
      graft.operators.Embeddings.exportNpyQuantized(t(s, dir, "embeddings"),
          "vec_id", "embedding", "/tmp/graft_npy_export_u8", numShards = 8)
        .select("shard_no", "n_rows", "n_dim", "byte_len")
        .orderBy("shard_no")),

    "x_sim_ivf_persisted" -> ((s, dir) => { // oracle: replay OVER the persisted index tables
      // The production ANN lifecycle: the IVF index (centroid table +
      // cid-partitioned inverted lists) is BUILT ONCE and persisted;
      // serving loads the nlist-row centroid table, probes as a pure
      // projection, and scans ONLY the probed cid partitions — no
      // training, no cell assignment, no corpus pass. Same params as
      // x_sim_ivf, so the result is bit-identical to the in-memory
      // variant (AnnIndexSpec pins the equality; the oracle replays
      // probe+score+rank in DuckDB directly over the persisted parquet).
      val emb = t(s, dir, "embeddings")
      val path = stageIndex(ivfIdxDir, dir)(
        graft.operators.AnnIndex.ivfBuild(emb, "vec_id", "embedding",
          ivfIdxDir, nlist = 16))
      graft.operators.AnnIndex.ivfServe(s, path,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10, nprobe = 4)
        .orderBy("qid", "rank")
    }),

    "x_sim_ivf_appended" -> ((s, dir) => { // oracle: replay over the APPENDED index
      // The incremental index lifecycle (incrementalDedup's ANN
      // sibling): centroids trained on the even-id half, the odd-id
      // batch appended later against the PERSISTED centroids — O(batch)
      // work, the existing inverted lists never rewritten. The oracle
      // replays probe/score/rank over the final on-disk parquet, so the
      // hash proves build+append composed to exactly the full index.
      val emb = t(s, dir, "embeddings")
      val path = stageIndex(ivfAppIdxDir, dir) {
        graft.operators.AnnIndex.ivfBuild(
          emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
          ivfAppIdxDir, nlist = 16)
        graft.operators.AnnIndex.ivfAppend(
          emb.filter(col("vec_id") % 2 =!= 0), "vec_id", "embedding",
          ivfAppIdxDir)
      }
      graft.operators.AnnIndex.ivfServe(s, path,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10, nprobe = 4)
        .orderBy("qid", "rank")
    }),

    "x_sim_ivf_compacted" -> ((s, dir) => { // oracle: replay over the COMPACTED index
      // The full index lifecycle: build → append → COMPACT → serve.
      // Compaction rewrites the inverted lists to one file per cid (the
      // small-files VACUUM the append history accumulates) and must be
      // content-neutral — the oracle replays over the compacted parquet,
      // so the hash proves the rewrite changed layout, not data.
      val emb = t(s, dir, "embeddings")
      val path = stageIndex(ivfCompactIdxDir, dir) {
        graft.operators.AnnIndex.ivfBuild(
          emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
          ivfCompactIdxDir, nlist = 16)
        graft.operators.AnnIndex.ivfAppend(
          emb.filter(col("vec_id") % 2 =!= 0), "vec_id", "embedding",
          ivfCompactIdxDir)
        graft.operators.AnnIndex.ivfCompact(s, ivfCompactIdxDir)
      }
      graft.operators.AnnIndex.ivfServe(s, path,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10, nprobe = 4)
        .orderBy("qid", "rank")
    }),

    "x_sim_pq_persisted" -> ((s, dir) => { // oracle: ADC+rerank replay over persisted codebooks/codes
      // PQ twin of the persisted lifecycle: codebooks + the PQ-encoded
      // corpus persist; the ADC scan reads the CODE table (8-64× smaller
      // than the float corpus), and only the shortlist re-rank touches
      // true vectors. Same params as x_sim_pq → bit-identical results.
      val emb = t(s, dir, "embeddings")
      val path = stageIndex(pqIdxDir, dir)(
        graft.operators.AnnIndex.pqBuild(emb, "vec_id", "embedding", pqIdxDir))
      graft.operators.AnnIndex.pqServe(s, path, emb,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
        .orderBy("qid", "rank")
    }),

    "x_sim_ivfpq_persisted" -> ((s, dir) => { // oracle: probe-restricted ADC+rerank replay
      // THE COMPOSED 100 TB ANN SHAPE (IVF-PQ, Jégou et al. TPAMI 2011):
      // coarse cells PARTITION the PQ code table, so a serve reads only
      // the probed cells' code partitions (O(probed) listing, like the
      // IVF serve) and ADC-scores compact integer codes — no float
      // vector is touched until the exact re-rank of the shortlist.
      // Flat PQ scans every code for every query; flat IVF stores full
      // vectors in its cells; the composition is what serves a corpus
      // whose vectors do not fit the cluster. The oracle replays probe →
      // cell-restricted ADC → shortlist → exact re-rank entirely from
      // the on-disk artifact (centroids, codebooks, cid-partitioned
      // codes), the same double arithmetic in the same order.
      val emb = t(s, dir, "embeddings")
      val path = stageIndex(ivfpqIdxDir, dir)(
        graft.operators.AnnIndex.ivfpqBuild(emb, "vec_id", "embedding",
          ivfpqIdxDir, nlist = 16))
      graft.operators.AnnIndex.ivfpqServe(s, path, emb,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10,
          nprobe = 4)
        .orderBy("qid", "rank")
    }),

    "x_sim_ivfpq_residual" -> ((s, dir) => { // oracle: residual (IVFADC) ADC replay
      // IVFADC proper (the PQ paper's composed form): codes quantize the
      // RESIDUAL u(x) − u(centroid(x)) against Lloyd-trained residual
      // codebooks, and the serve adds the coarse term u(q)·u(c) back per
      // probed cell — at production nlist this is what keeps recall up
      // without growing the re-rank budget (the A/B spec and committed
      // recall table show residual ≥ raw at every nprobe under trained
      // cells). The oracle replays probe (carrying the coarse dot) →
      // cell-restricted ADC (qc + LUT lookups, parenthesized to Spark's
      // add tree) → shortlist → exact re-rank from the on-disk artifact.
      val emb = t(s, dir, "embeddings")
      val path = stageIndex(ivfpqResIdxDir, dir)(
        graft.operators.AnnIndex.ivfpqBuild(emb, "vec_id", "embedding",
          ivfpqResIdxDir, nlist = 16, residual = true))
      graft.operators.AnnIndex.ivfpqServe(s, path, emb,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10,
          nprobe = 4)
        .orderBy("qid", "rank")
    }),

    "x_sim_ivfpq_deleted" -> ((s, dir) => { // oracle: tombstoned probe-restricted ADC replay
      // Deletion-vector lifecycle on the COMPOSED index: odd ids
      // tombstoned O(ids), serve suppresses via the broadcast sidecar
      // anti-join, code bytes untouched (spec pins the byte-identity);
      // the oracle replays THROUGH the sidecar like the ivf/pq twins.
      val emb = t(s, dir, "embeddings")
      val path = stageIndex(ivfpqDelIdxDir, dir) {
        graft.operators.AnnIndex.ivfpqBuild(emb, "vec_id", "embedding",
          ivfpqDelIdxDir, nlist = 16)
        graft.operators.AnnIndex.ivfpqDelete(s, ivfpqDelIdxDir,
          emb.filter(col("vec_id") % 2 =!= 0).select("vec_id"), "vec_id")
      }
      graft.operators.AnnIndex.ivfpqServe(s, path, emb,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10,
          nprobe = 4)
        .orderBy("qid", "rank")
    }),

    "x_sim_ivfpq_appended" -> ((s, dir) => { // oracle: replay over the APPENDED artifact
      // Incremental ingest on the composed index: centroids AND
      // codebooks trained on the even-id half (the index identity), the
      // odd-id batch assigned + encoded later against the PERSISTED
      // models and appended into the cid partitions — O(batch). The
      // oracle reads only the final on-disk artifact, so the hash proves
      // assign-encode-append composed exactly.
      val emb = t(s, dir, "embeddings")
      val path = stageIndex(ivfpqAppIdxDir, dir) {
        graft.operators.AnnIndex.ivfpqBuild(
          emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
          ivfpqAppIdxDir, nlist = 16)
        graft.operators.AnnIndex.ivfpqAppend(
          emb.filter(col("vec_id") % 2 =!= 0), "vec_id", "embedding",
          ivfpqAppIdxDir)
      }
      graft.operators.AnnIndex.ivfpqServe(s, path, emb,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10,
          nprobe = 4)
        .orderBy("qid", "rank")
    }),

    "x_ivfpq_report" -> ((s, dir) =>
      // Observability for the composed index over the SAME mid-lifecycle
      // (pending-takedown) artifact as x_sim_ivfpq_deleted — nlist,
      // codebook shape, stored codes, tombstone debt, serving
      // membership, files-per-cid pressure; the oracle recomputes every
      // figure from the artifact alone (the x_index_report convention).
      graft.operators.AnnIndex.describeIvfPq(s, {
        val emb = t(s, dir, "embeddings")
        stageIndex(ivfpqDelIdxDir, dir) {
          graft.operators.AnnIndex.ivfpqBuild(emb, "vec_id", "embedding",
            ivfpqDelIdxDir, nlist = 16)
          graft.operators.AnnIndex.ivfpqDelete(s, ivfpqDelIdxDir,
            emb.filter(col("vec_id") % 2 =!= 0).select("vec_id"), "vec_id")
        }
      })),

    "x_stream_ivfpq_serve" -> ((s, dir) => { // LIVE stream, shares the persisted replay
      // Streaming serving on the COMPOSED index: query vectors arrive
      // as a stream, each micro-batch probes + ADC-scores + re-ranks
      // against the persisted artifact via foreachBatch. Per-query
      // results are batch-invariant, so the live path shares
      // x_sim_ivfpq_persisted's oracle verbatim (the convention every
      // persisted artifact here follows).
      val emb = t(s, dir, "embeddings")
      val path = stageIndex(ivfpqIdxDir, dir)(
        graft.operators.AnnIndex.ivfpqBuild(emb, "vec_id", "embedding",
          ivfpqIdxDir, nlist = 16))
      graft.streaming.StreamAnnServe.runOnceIvfPq(s, dir,
          "embeddings.parquet", emb.schema, col("vec_id") < 5, path, emb,
          "vec_id", "embedding", 10, nprobe = 4)
        .orderBy("qid", "rank")
    }),

    "x_takedown_pipeline" -> ((s, dir) => { // oracle: sidecar-path replay (tombstoned)
      // COMPLIANCE COMPOSITION: the CDC change log drives the ANN-index
      // takedown — keys whose LAST operation is a tombstone (deleted,
      // never revived) are exactly what ivfDelete marks in the
      // deletion-vector sidecar. This is the GDPR flow end-to-end: the
      // log is the source of truth, the serving index follows it; the
      // oracle replays retrieval over cells + sidecar, proving the
      // tombstoned members are unfindable and everything else is intact.
      val emb = t(s, dir, "embeddings")
      val path = stageIndex(takedownIdxDir, dir) {
        graft.operators.AnnIndex.ivfBuild(emb, "vec_id", "embedding",
          takedownIdxDir, nlist = 16)
        val tombstoned = Cdc.tombstones(cdcLog(s, dir),
            "doc_id", "seq", "op")
          .select(col("doc_id").as("vec_id"))
        graft.operators.AnnIndex.ivfDelete(s, takedownIdxDir,
          tombstoned, "vec_id")
      }
      graft.operators.AnnIndex.ivfServe(s, path,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10, nprobe = 4)
        .orderBy("qid", "rank")
    }),

    "x_cdc_index_sync" -> ((s, dir) => { // oracle: plain replay over the SYNCED index
      // THE MAINTENANCE LOOP END TO END: a CDC change log of embedding
      // rows (update every 7th with a jittered vector, delete every
      // 11th+3, revive the even deletes) drives ivfSyncFromLog —
      // tombstone touched keys (O(tail) sidecar), fold, re-append the
      // LWW-current versions against the persisted centroids. The
      // serving index FOLLOWS the table; equivalence with a full
      // rebuild is spec-gated (AnnIndexSpec), and the oracle replays
      // retrieval over the final on-disk artifact — updated vectors
      // serve, tombstoned members are unfindable.
      val emb = t(s, dir, "embeddings")
      val path = stageIndex(cdcSyncIdxDir, dir) {
        graft.operators.AnnIndex.ivfBuild(emb, "vec_id", "embedding",
          cdcSyncIdxDir, nlist = 16)
        val vt = emb.schema("embedding").dataType
        val tail = emb.filter(col("vec_id") % 7 === 0)
          .select(col("vec_id"),
            expr("transform(embedding, x -> cast(x + 0.125 as float))")
              .as("embedding"))
          .withColumn("seq", lit(2L)).withColumn("op", lit("U"))
          .unionByName(emb.filter(col("vec_id") % 11 === 3)
            .select(col("vec_id"), lit(null).cast(vt).as("embedding"))
            .withColumn("seq", lit(3L)).withColumn("op", lit("D")))
          .unionByName(emb.filter(col("vec_id") % 22 === 3)
            .select(col("vec_id"),
              expr("transform(embedding, x -> cast(x - 0.25 as float))")
                .as("embedding"))
            .withColumn("seq", lit(4L)).withColumn("op", lit("I")))
        graft.operators.AnnIndex.ivfSyncFromLog(s, cdcSyncIdxDir, tail,
          "vec_id", "seq", "op", "embedding")
      }
      graft.operators.AnnIndex.ivfServe(s, path,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10, nprobe = 4)
        .orderBy("qid", "rank")
    }),

    "x_ann_autotune" -> ((s, dir) => { // oracle: full sweep+recall replay over the persisted index
      // THE KNOB-PICKING LOOP: before an IVF deployment ships, sweep
      // nprobe over candidates and measure recall@10 against the exact
      // brute-force truth on a deterministic md5-sampled query set —
      // the SAME sampling convention as x_eval_dedup_sampled (hash the
      // id, take a residue class), so the sample is partition-independent
      // and engine-replayable, and at scale the modulus grows with the
      // corpus to hold the sample COUNT constant (the BenchSf1
      // ann_autotune probe's regime — truth is |sample|·|members|, so a
      // constant sample keeps the quadratic leg flat while the index
      // grows). One scored pass at max(nprobe) prices the whole sweep
      // (probe ranks kept, every sweep point re-ranks the same frame),
      // one |sample|×|members| pass prices the truth. The report picks
      // the smallest nprobe meeting the 95% target (explicit best-effort
      // fallback to the largest). Integer-exact throughout: hits,
      // possible, and the // -quantized recall replay bit-for-bit.
      val emb = t(s, dir, "embeddings")
      val path = stageIndex(ivfIdxDir, dir)(
        graft.operators.AnnIndex.ivfBuild(emb, "vec_id", "embedding",
          ivfIdxDir, nlist = 16))
      val sampleQ = emb.filter(
        conv(substring(md5(col("vec_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % annTuneSampleMod === 7)
      graft.operators.AnnIndex.tuneIvf(s, path,
          sampleQ, "vec_id", "embedding", 10, Seq(1, 2, 4, 8))
        .orderBy("nprobe")
    }),

    "x_cdc_pq_sync" -> ((s, dir) => { // oracle: ADC+rerank replay over the SYNCED codes
      // THE PQ MEMBER OF THE MAINTENANCE LOOP: the same CDC tail shape
      // as x_cdc_index_sync drives pqSyncFromLog — tombstone every
      // touched key (O(tail) sidecar), fold (pqCompact), re-encode the
      // LWW-current versions against the PERSISTED codebooks (the
      // model is never retrained by maintenance). The exact re-rank
      // corpus is the POST-TAIL snapshot — the source table the same
      // log maintains — composed from the batch CDC operator.
      // Equivalence with a full re-encode is spec-gated (AnnIndexSpec);
      // the oracle replays ADC + exact re-rank over the final on-disk
      // codes, rebuilding the updated float vectors with the same IEEE
      // arithmetic.
      val emb = t(s, dir, "embeddings")
      val vt = emb.schema("embedding").dataType
      def tail = emb.filter(col("vec_id") % 7 === 0)
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x + 0.125 as float))")
            .as("embedding"))
        .withColumn("seq", lit(2L)).withColumn("op", lit("U"))
        .unionByName(emb.filter(col("vec_id") % 11 === 3)
          .select(col("vec_id"), lit(null).cast(vt).as("embedding"))
          .withColumn("seq", lit(3L)).withColumn("op", lit("D")))
        .unionByName(emb.filter(col("vec_id") % 22 === 3)
          .select(col("vec_id"),
            expr("transform(embedding, x -> cast(x - 0.25 as float))")
              .as("embedding"))
          .withColumn("seq", lit(4L)).withColumn("op", lit("I")))
      val path = stageIndex(pqSyncIdxDir, dir) {
        graft.operators.AnnIndex.pqBuild(emb, "vec_id", "embedding",
          pqSyncIdxDir)
        graft.operators.AnnIndex.pqSyncFromLog(s, pqSyncIdxDir, tail,
          "vec_id", "seq", "op", "embedding")
      }
      val post = emb.select("vec_id", "embedding")
        .join(tail.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
        .unionByName(Cdc.applyLog(tail, "vec_id", "seq", "op")
          .select("vec_id", "embedding"))
      graft.operators.AnnIndex.pqServe(s, path, post,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
        .orderBy("qid", "rank")
    }),

    "x_ann_autotune_ivfpq" -> ((s, dir) => { // oracle: full sweep+recall replay over the composed artifact
      // tuneIvf's composed sibling: ONE ADC pass at max(nprobe) with
      // probe ranks riding along prices the whole sweep (each sweep
      // point re-shortlists + re-ranks the same frame); truth is the
      // exact brute force over the serving membership's true vectors on
      // the md5-sampled query set (the annTuneSampleMod convention).
      // Full-probe recall here is FLAT-PQ recall, not 100% — the sweep
      // measures exactly what a deployment trades, quantization
      // included.
      val emb = t(s, dir, "embeddings")
      val path = stageIndex(ivfpqIdxDir, dir)(
        graft.operators.AnnIndex.ivfpqBuild(emb, "vec_id", "embedding",
          ivfpqIdxDir, nlist = 16))
      val sampleQ = emb.filter(
        conv(substring(md5(col("vec_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % annTuneSampleMod === 7)
      graft.operators.AnnIndex.tuneIvfPq(s, path, emb, sampleQ,
          "vec_id", "embedding", 10, Seq(1, 2, 4, 8))
        .orderBy("nprobe")
    }),

    "x_cdc_ivfpq_sync" -> ((s, dir) => { // oracle: probe-restricted ADC replay over the SYNCED artifact
      // THE COMPOSED MEMBER OF THE MAINTENANCE LOOP: the same CDC tail
      // shape as x_cdc_index_sync / x_cdc_pq_sync drives
      // ivfpqSyncFromLog — tombstone every touched key (O(tail)
      // sidecar), fold (ivfpqCompact), assign + re-encode the
      // LWW-current versions against the PERSISTED centroids and
      // codebooks (maintenance never retrains the index identity). The
      // exact re-rank corpus is the POST-TAIL snapshot the same log
      // maintains; the oracle replays probe → cell-restricted ADC →
      // re-rank over the final on-disk artifact, rebuilding the updated
      // float vectors with the identical IEEE arithmetic.
      val emb = t(s, dir, "embeddings")
      val vt = emb.schema("embedding").dataType
      def tail = emb.filter(col("vec_id") % 7 === 0)
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x + 0.125 as float))")
            .as("embedding"))
        .withColumn("seq", lit(2L)).withColumn("op", lit("U"))
        .unionByName(emb.filter(col("vec_id") % 11 === 3)
          .select(col("vec_id"), lit(null).cast(vt).as("embedding"))
          .withColumn("seq", lit(3L)).withColumn("op", lit("D")))
        .unionByName(emb.filter(col("vec_id") % 22 === 3)
          .select(col("vec_id"),
            expr("transform(embedding, x -> cast(x - 0.25 as float))")
              .as("embedding"))
          .withColumn("seq", lit(4L)).withColumn("op", lit("I")))
      val path = stageIndex(ivfpqSyncIdxDir, dir) {
        graft.operators.AnnIndex.ivfpqBuild(emb, "vec_id", "embedding",
          ivfpqSyncIdxDir, nlist = 16)
        graft.operators.AnnIndex.ivfpqSyncFromLog(s, ivfpqSyncIdxDir, tail,
          "vec_id", "seq", "op", "embedding")
      }
      val post = emb.select("vec_id", "embedding")
        .join(tail.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
        .unionByName(Cdc.applyLog(tail, "vec_id", "seq", "op")
          .select("vec_id", "embedding"))
      graft.operators.AnnIndex.ivfpqServe(s, path, post,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10,
          nprobe = 4)
        .orderBy("qid", "rank")
    }),

    "x_stream_takedown" -> ((s, dir) => { // oracle: sidecar replay over the stream-fed index
      // STREAMING COMPLIANCE, end to end: the LIVE CDC applier
      // maintains the hosted snapshot AND pushes every micro-batch's
      // tombstones into the serving index's deletion-vector sidecar —
      // x_takedown_pipeline with the log arriving as a stream (the
      // index follows the STREAM, O(dels) per batch, no rewrite). The
      // oracle replays retrieval over cells + sidecar: the streamed
      // tombstones are unfindable, everything else intact.
      val emb = t(s, dir, "embeddings")
      val path = stageIndex(streamTdIdxDir, dir) {
        graft.operators.AnnIndex.ivfBuild(emb, "vec_id", "embedding",
          streamTdIdxDir, nlist = 16)
        val vt = emb.schema("embedding").dataType
        val log = emb.select(col("vec_id"), col("embedding"))
          .withColumn("seq", lit(1L)).withColumn("op", lit("I"))
          .unionByName(emb.filter(col("vec_id") % 11 === 3)
            .select(col("vec_id"), lit(null).cast(vt).as("embedding"))
            .withColumn("seq", lit(2L)).withColumn("op", lit("D")))
        graft.streaming.StreamCdc.stageLogSlices(log, "seq",
          streamTdStageDir, Seq(Seq(1L), Seq(2L)))
        graft.streaming.StreamCdc.runOnce(s, streamTdStageDir, log.schema,
          "vec_id", "seq", "op", takedownIndexPath = Some(streamTdIdxDir))
        ()
      }
      graft.operators.AnnIndex.ivfServe(s, path,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10, nprobe = 4)
        .orderBy("qid", "rank")
    }),

    "x_sim_ivf_deleted" -> ((s, dir) => { // oracle: sidecar-path replay (tombstoned)
      // The takedown / right-to-be-forgotten lifecycle step with
      // DELETION-VECTOR semantics: odd-id vectors are tombstoned into
      // the O(ids) sidecar — the cells parquet is NOT rewritten — and
      // serve suppresses them with a broadcast anti-join. Two separate
      // ivfDelete calls prove takedowns accumulate. The oracle replays
      // cells + tombstones, so the hash proves the sidecar path
      // suppresses exactly the listed members and nothing else.
      val emb = t(s, dir, "embeddings")
      val path = stageIvfDeleted(s, dir)
      graft.operators.AnnIndex.ivfServe(s, path,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10, nprobe = 4)
        .orderBy("qid", "rank")
    }),

    "x_index_report" -> ((s, dir) =>
      // Index observability — the ANN sibling of x_cdc_report: one row
      // of centroid count, stored members, PENDING tombstones, serving
      // membership (stored minus suppressed), and small-files pressure
      // (parquet files per cid ×100). Shares x_sim_ivf_deleted's staged
      // index so the numbers describe a real mid-lifecycle state; the
      // oracle recomputes every figure from the artifact alone
      // (filename= gives DuckDB the file census).
      graft.operators.AnnIndex.describeIvf(s, stageIvfDeleted(s, dir))),

    "x_sim_ivf_del_compacted" -> ((s, dir) => { // oracle: PLAIN replay post-fold
      // COMPACTION FOLDS THE SIDECAR: after ivfCompact the tombstoned
      // rows physically leave the cells and the sidecar is cleared —
      // the oracle replays the cells ALONE (no tombstone clause), so
      // the hash proves fold-in ≡ the sidecar-path suppression.
      val emb = t(s, dir, "embeddings")
      val path = stageIndex(ivfDelCmpIdxDir, dir) {
        graft.operators.AnnIndex.ivfBuild(emb, "vec_id", "embedding",
          ivfDelCmpIdxDir, nlist = 16)
        graft.operators.AnnIndex.ivfDelete(s, ivfDelCmpIdxDir,
          emb.filter(col("vec_id") % 2 =!= 0).select("vec_id"), "vec_id")
        graft.operators.AnnIndex.ivfCompact(s, ivfDelCmpIdxDir)
      }
      graft.operators.AnnIndex.ivfServe(s, path,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10, nprobe = 4)
        .orderBy("qid", "rank")
    }),

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
      val back = customerPointLayer(s, dir, "q_layer_spatial")
      graft.operators.Spatial.neighborPairs(
          back.select(col("c_custkey"), col("geometry")), "c_custkey", 50.0)
        .orderBy("a", "b")
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
      // 8-band explode → stream-static join vs the cached corpus band
      // index → hamming verify → memory sink). Pure 64-bit integer
      // arithmetic end to end, so the REAL streaming path hash-verifies
      // like x_stream_classify; one row per colliding band (the
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

  /** Staged signature table for [[x_dedup_images]]: the x_multimodal_
    * imagehash chain (doubled corpus → real BMP decode → frame-0 aHash)
    * persisted as one parquet file per (JVM, sf-dir) — at production
    * scale the signature table is a first-class persisted artifact,
    * exactly like the ANN index.
    */
  private val imgHashStageDir = "/tmp/graft_imghash_stage"
  private def stageImageHashes(s: SparkSession, dir: String): String = {
    stageIndex(imgHashStageDir, dir) {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val doubled = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + lit(100000L)))
      val hashes = Multimodal.imageHashes(
          Multimodal.withBmpPayload(doubled, "doc_id", "text"), "doc_id")
        .filter(col("frame_no") === 0)
        .select(col("id"), col("ahash"))
      graft.core.ParquetStage.stageSingleFile(hashes, imgHashStageDir, "hashes")
    }
    s"$imgHashStageDir/hashes.parquet"
  }

  /** The deleted-index fixture shared by x_sim_ivf_deleted (serve
    * through the sidecar) and x_index_report (describe the
    * mid-lifecycle state): full build, then TWO takedown calls covering
    * the odd ids — takedowns accumulate in the sidecar.
    */
  private def stageIvfDeleted(s: SparkSession, dir: String): String = {
    val emb = t(s, dir, "embeddings")
    stageIndex(ivfDelIdxDir, dir) {
      graft.operators.AnnIndex.ivfBuild(emb, "vec_id", "embedding",
        ivfDelIdxDir, nlist = 16)
      graft.operators.AnnIndex.ivfDelete(s, ivfDelIdxDir,
        emb.filter(col("vec_id") % 4 === 1).select("vec_id"), "vec_id")
      graft.operators.AnnIndex.ivfDelete(s, ivfDelIdxDir,
        emb.filter(col("vec_id") % 4 === 3).select("vec_id"), "vec_id")
    }
  }

  /** Staged audio-fingerprint table for [[x_dedup_audio]] — the audio
    * twin of [[stageImageHashes]]: doubled corpus → real WAV encode →
    * 64-bit energy-delta fingerprint, one parquet per (JVM, sf-dir).
    */
  private val audioPrintStageDir = "/tmp/graft_audioprint_stage"
  private def stageAudioPrints(s: SparkSession, dir: String): String = {
    stageIndex(audioPrintStageDir, dir) {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val doubled = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + lit(100000L)))
      val prints = Multimodal.audioFingerprints(
        Multimodal.withWavPayload(doubled, "doc_id", "text"), "doc_id")
      graft.core.ParquetStage.stageSingleFile(prints, audioPrintStageDir,
        "prints")
    }
    s"$audioPrintStageDir/prints.parquet"
  }

  /** Greedy-subword segmentation replay (recursive CTE over (word,
    * position) states) — shared verbatim by the batch entry
    * (x_subword_tokenize) and its stateless streaming twin
    * (x_stream_tokenize): the stream's per-row fold is bit-identical to
    * the batch aggregation, so one oracle hash-gates both.
    */
  // the greedy-segmentation CTE chain shared by the per-doc tokenize
  // replays and the per-domain fertility rollup
  private lazy val subwordSegCtes: String =
    s"""${bpeCtes(50)},
       |words0 AS (SELECT doc_id,
       |             unnest(string_split(text, ' ')) AS w FROM documents),
       |dw AS (SELECT DISTINCT w FROM words0),
       |seg AS (
       |  SELECT w, 1 AS pos, 0 AS k FROM dw
       |  UNION ALL
       |  SELECT s.w, s.pos + (CASE WHEN v.pair IS NULL THEN 1 ELSE 2 END),
       |         s.k + 1
       |  FROM seg s LEFT JOIN bpt v ON v.pair = substring(s.w, s.pos, 2)
       |  WHERE s.pos <= length(s.w)),
       |done AS (SELECT w, k FROM seg WHERE pos = length(w) + 1)""".stripMargin

  private lazy val subwordTokenizeOracle: String =
    s"""WITH RECURSIVE $subwordSegCtes
       |SELECT w0.doc_id, count(*) AS n_words,
       |  CAST(sum(d.k) AS BIGINT) AS n_subwords
       |FROM words0 w0 JOIN done d USING (w)
       |GROUP BY w0.doc_id ORDER BY doc_id""".stripMargin

  val extensionOracles: Map[String, String] = {
    val stop = Seq("the", "a", "of", "and")
    val stopSql = stop.map(w => markerCountSql(s" $w ")).mkString(" + ")
    val langScores = TextAnalysis.markers.map { case (lang, ws) =>
      s"${ws.map(w => markerCountSql(s" $w ")).mkString(" + ")} AS score_$lang"
    }.mkString(",\n  ")

    // The x_cdc_* change log — must stay textually in ONE place: both
    // oracles and the Spark-side cdcLog helper encode the same
    // I→U→D→I arithmetic.
    val cdcLogSql =
      """cdclog AS (
        |  SELECT doc_id, text, lang, source, CAST(1 AS BIGINT) AS seq, 'I' AS op FROM documents
        |  UNION ALL SELECT doc_id, text || ' v2', lang, source, 2, 'U' FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL SELECT doc_id, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 3, 'D' FROM documents WHERE doc_id % 11 = 3
        |  UNION ALL SELECT doc_id, text || ' v3', lang, source, 4, 'I' FROM documents WHERE doc_id % 11 = 3 AND doc_id % 2 = 0)""".stripMargin

    val cdcSnapshotSql =
      s"""WITH $cdcLogSql,
         |lastv AS (SELECT doc_id,
         |            arg_max(op, seq) AS op, arg_max(text, seq) AS text,
         |            arg_max(lang, seq) AS lang, arg_max(source, seq) AS source
         |          FROM cdclog GROUP BY doc_id)
         |SELECT doc_id, text, lang, source FROM lastv
         |WHERE op <> 'D' ORDER BY doc_id""".stripMargin

    // MaxSim score replay: 4 query tokens × 4 doc tokens of width 16
    // over the flattened 64-dim quantized vector — greatest() of the 4
    // doc-token dots per query token, summed (exact integers)
    val maxsimScoreSql: String = (0 until 4).map { i =>
      val dots = (0 until 4).map { j =>
        s"list_dot_product(qt[${i * 16 + 1}:${i * 16 + 16}], dt[${j * 16 + 1}:${j * 16 + 16}])"
      }.mkString(", ")
      s"greatest($dots)"
    }.mkString(" + ")

    val maxsimReplaySql =
      s"""WITH qv AS (SELECT vec_id,
         |         [CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS DOUBLE)
         |          for x in embedding] AS t
         |       FROM embeddings),
         |q AS (SELECT vec_id AS qid, t AS qt FROM qv WHERE vec_id < 5),
         |d AS (SELECT vec_id AS id, t AS dt FROM qv),
         |scored AS (SELECT q.qid, d.id,
         |    $maxsimScoreSql AS score
         |  FROM q CROSS JOIN d WHERE d.id <> q.qid)
         |SELECT qid, id, rank FROM (
         |  SELECT qid, id,
         |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rank
         |  FROM scored) WHERE rank <= 10
         |ORDER BY qid, rank""".stripMargin

    val cdcAsofSql =
      s"""WITH $cdcLogSql,
         |lastv AS (SELECT doc_id,
         |            arg_max(op, seq) AS op, arg_max(text, seq) AS text,
         |            arg_max(lang, seq) AS lang, arg_max(source, seq) AS source
         |          FROM cdclog WHERE seq <= 3 GROUP BY doc_id)
         |SELECT doc_id, text, lang, source FROM lastv
         |WHERE op <> 'D' ORDER BY doc_id""".stripMargin

    // The x_text_extract_html page fixture + extraction chain, shared
    // between the result columns: one CTE per regexp_replace step of
    // HtmlText.extractText, applied in lockstep to the body (c) and the
    // title (tc). Sequential CTEs, not nested calls — deep expression
    // nesting hits DuckDB's binder recursion limit.
    val htmlSteps: Seq[(String, String)] = Seq(
      "(?is)<head\\b[^>]*>.*?</head[ \\t\\n]*>" -> "' '",
      "(?is)<script[^>]*>.*?</script>" -> "' '",
      "(?is)<style[^>]*>.*?</style>" -> "' '",
      "(?s)<!--.*?-->" -> "' '",
      "(?i)</?(p|br|div|li|ul|ol|h[1-6]|tr|table|blockquote)[^>]*>" -> "chr(10)",
      "<[^>]*>" -> "' '",
      "&lt;" -> "'<'",
      "&gt;" -> "'>'",
      "&quot;" -> "'\"'",
      "&#39;" -> "chr(39)",
      "&nbsp;" -> "' '",
      "&amp;" -> "'&'",
      "[ \\t\\r]+" -> "' '",
      " ?\\n[ \\n]*" -> "chr(10)",
      "^[ \\n]+" -> "''",
      "[ \\n]+$" -> "''")
    val htmlChainCtes = htmlSteps.zipWithIndex.map { case ((pat, rep), i) =>
      val prev = if (i == 0) "t0" else s"s$i"
      s"""s${i + 1} AS (SELECT doc_id, html,
         |  regexp_replace(c, '$pat', $rep, 'g') AS c,
         |  regexp_replace(tc, '$pat', $rep, 'g') AS tc FROM $prev)""".stripMargin
    }.mkString(",\n")
    val htmlLast = s"s${htmlSteps.size}"
    // the WITH body (page fixture + chain), reusable by every oracle
    // that consumes extracted pages; htmlLast names its final CTE
    val htmlCoreCtes =
      s"""h AS (SELECT doc_id,
         |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || ' &amp; ' || source ||
         |    '</title><style>p { color: red }</style>' ||
         |    '<script>if (1 &lt; 2) { go() }</script></head>' ||
         |    '<body><!-- nav boilerplate --><h1>' || upper(lang) || '</h1><p>' ||
         |    regexp_replace(text, ' table ', ' <a href=t>table</a> ', 'g') ||
         |    '</p><div>&nbsp;&quot;' || lang || '&#39;s&quot; x &gt; y</div></body></html>' AS html
         |  FROM documents),
         |t0 AS (SELECT doc_id, html, html AS c,
         |    regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1) AS tc
         |  FROM h),
         |$htmlChainCtes""".stripMargin
    val htmlExtractSql =
      s"""WITH $htmlCoreCtes
         |SELECT doc_id, tc AS title, c AS text,
         |  len(regexp_extract_all(html, '(?i)<a[ >]')) AS n_links,
         |  len(regexp_extract_all(html, '</?[a-zA-Z][^>]*>')) AS n_tags,
         |  CAST(length(c) AS BIGINT) AS text_chars
         |FROM $htmlLast ORDER BY doc_id""".stripMargin

    // Full IVF probe+rerank replay: id-sampled centroids, nearest-centroid
    // cell assignment, top-nprobe probe cells per query, exact cosine
    // re-rank of probed candidates. Every score both engines compare is
    // the same double arithmetic in the same order (float→double element
    // loads, ascending dot accumulation, mul-then-div), so assignment,
    // probing, and ranking replay hash-exactly — the same trust the
    // x_sim_topk oracle already established for list_dot_product.
    def ivfKnnCtes(nlist: Int, nprobe: Int, k: Int, queryPred: String) =
      s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
         |cents AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE nrm > 0
         |          ORDER BY vec_id LIMIT $nlist),
         |cell AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT n.vec_id, c.cid,
         |           row_number() OVER (PARTITION BY n.vec_id
         |             ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cn) DESC,
         |                      c.cid) AS rn
         |    FROM n CROSS JOIN cents c) WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE $queryPred),
         |probe AS (
         |  SELECT qid, cid FROM (
         |    SELECT q.qid, c.cid,
         |           row_number() OVER (PARTITION BY q.qid
         |             ORDER BY list_dot_product(q.qv, c.cv) / (q.qn * c.cn) DESC,
         |                      c.cid) AS rn
         |    FROM q CROSS JOIN cents c) WHERE rn <= $nprobe),
         |cand AS (
         |  SELECT q.qid, ce.vec_id AS id,
         |         list_dot_product(nv.v, q.qv) / (nv.nrm * q.qn) AS cos
         |  FROM probe p JOIN q ON q.qid = p.qid
         |  JOIN cell ce ON ce.cid = p.cid
         |  JOIN n nv ON nv.vec_id = ce.vec_id
         |  WHERE ce.vec_id <> q.qid),
         |knn AS (SELECT qid, id, cos, rank FROM (
         |  SELECT qid, id, cos,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
         |  FROM cand) WHERE rank <= $k)""".stripMargin

    def ivfReplaySql(nlist: Int, nprobe: Int, k: Int, queryPred: String) =
      s"""WITH ${ivfKnnCtes(nlist, nprobe, k, queryPred)}
         |SELECT qid, id, rank FROM knn ORDER BY qid, rank""".stripMargin

    // Replay over a PERSISTED IVF index directory: centroids and the
    // cid-partitioned cells (incl. STORED norms) come from the parquet
    // on disk; only the query vectors come from the embeddings table.
    // `tombstoned = true` replays THROUGH the deletion-vector sidecar:
    // the cells keep the taken-down rows on disk (ivfDelete is O(ids)),
    // and the serve path suppresses them with an anti-join — the oracle
    // must apply the same NOT IN over the sidecar parquet.
    def ivfPersistedReplay(idxDir: String,
                           tombstoned: Boolean = false): String = {
      val dv = if (tombstoned)
        s" WHERE id NOT IN (SELECT id FROM read_parquet('$idxDir/tombstones/*.parquet'))"
      else ""
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |nq AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
         |cents AS (SELECT CAST(cid AS BIGINT) AS cid, cvec AS cv, cnorm AS cn
         |          FROM read_parquet('$idxDir/centroids/*.parquet')),
         |cell AS (SELECT CAST(cid AS BIGINT) AS cid, id,
         |                CAST(vec AS DOUBLE[]) AS mv, norm AS mn
         |         FROM read_parquet('@@ANNDIR|$idxDir|cells@@/*/*.parquet',
         |                           hive_partitioning = true)$dv),
         |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM nq WHERE vec_id < 5),
         |probe AS (
         |  SELECT qid, cid FROM (
         |    SELECT q.qid, c.cid,
         |           row_number() OVER (PARTITION BY q.qid
         |             ORDER BY list_dot_product(q.qv, c.cv) / (q.qn * c.cn) DESC,
         |                      c.cid) AS rn
         |    FROM q CROSS JOIN cents c) WHERE rn <= 4),
         |cand AS (
         |  SELECT q.qid, m.id,
         |         list_dot_product(m.mv, q.qv) / (m.mn * q.qn) AS cos
         |  FROM probe p JOIN q ON q.qid = p.qid
         |  JOIN cell m ON m.cid = p.cid
         |  WHERE m.id <> q.qid)
         |SELECT qid, id, rank FROM (
         |  SELECT qid, id,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
         |  FROM cand) WHERE rank <= 10
         |ORDER BY qid, rank""".stripMargin
    }

    // Replay over a PERSISTED PQ index directory: codebooks and the
    // encoded code table come from the parquet on disk; queries and the
    // re-rank vectors come from the embeddings table. `tombstoned` as
    // in ivfPersistedReplay: replay the deletion-vector anti-join.
    // Shared by the batch line-dedup entry and its live streaming
    // twin: identical re-lining (ceil(n/8) chunks — range((len+7)//8)
    // ≡ sequence(0,(n-1) DIV 8)), distinct-doc line counts, NOT IN
    // against the boilerplate set, ordered string_agg reassembly;
    // all-lines-removed docs still row out via the tot LEFT JOIN.
    val lineDedupReplay: String =
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents),
        |lined AS (SELECT doc_id,
        |    list_transform(range((len(ws) + 7) // 8),
        |      i -> array_to_string(ws[i*8+1 : i*8+8], ' ')) AS ls
        |  FROM w),
        |lines AS (SELECT doc_id, unnest(range(len(ls))) AS pos,
        |                 unnest(ls) AS line
        |          FROM lined),
        |boiler AS (SELECT line FROM (
        |    SELECT line, count(DISTINCT doc_id) AS df FROM lines
        |    WHERE length(trim(line)) > 0 GROUP BY line) WHERE df >= 2),
        |kept AS (SELECT * FROM lines
        |         WHERE line NOT IN (SELECT line FROM boiler)),
        |tot AS (SELECT doc_id, count(*) AS n_lines FROM lines
        |        GROUP BY doc_id),
        |asm AS (SELECT doc_id,
        |          string_agg(line, chr(10) ORDER BY pos) AS text_clean,
        |          count(*) AS n_kept
        |        FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(a.text_clean, '') AS text_clean,
        |  CAST(t.n_lines AS BIGINT) AS n_lines,
        |  CAST(t.n_lines - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
        |FROM tot t LEFT JOIN asm a ON a.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin

    // Replay over a PERSISTED IVF-PQ index: probe from the persisted
    // centroids (raw double vectors, the probeCells arithmetic), ADC
    // restricted to each query's probed cells (codes join probe join
    // lut), explicit ascending subspace sum, shortlist, exact re-rank
    // from the embeddings table — the composed form of the ivf and pq
    // replays, every step the same double arithmetic in the same order.
    def ivfpqPersistedReplay(idxDir: String,
                             tombstoned: Boolean = false,
                             rerankCte: String = "",
                             rerankTable: String = "embeddings",
                             residual: Boolean = false): String = {
      val dv = if (tombstoned)
        s" WHERE id NOT IN (SELECT id FROM read_parquet('$idxDir/tombstones/*.parquet'))"
      else ""
      // residual (IVFADC) replay: the probe carries the coarse term
      // u(q)·u(c) and the ADC score becomes qc + Σ lut lookups — the
      // codes on disk quantize u(x) − u(centroid), so the centroid dot
      // must be added back, parenthesized to match Spark's add tree
      // (__qc + aggregate(...)) exactly
      val qcSel = if (residual)
        ", list_dot_product(q.qv, c.cv) / (q.qn * c.cn) AS qc" else ""
      val qcCol = if (residual) ", qc" else ""
      val qcAdc = if (residual) ", p.qc" else ""
      val scoreExpr =
        if (residual)
          "qc + (0.0 + ds[1] + ds[2] + ds[3] + ds[4] + ds[5] + ds[6] + ds[7] + ds[8])"
        else
          "0.0 + ds[1] + ds[2] + ds[3] + ds[4] + ds[5] + ds[6] + ds[7] + ds[8]"
      s"""WITH $rerankCte
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
         |u AS (SELECT vec_id,
         |        CASE WHEN nrm = 0 THEN v ELSE [x / nrm for x in v] END AS uv
         |      FROM n),
         |cents AS (SELECT CAST(cid AS BIGINT) AS cid, cvec AS cv, cnorm AS cn
         |          FROM read_parquet('$idxDir/centroids/*.parquet')),
         |cb AS (SELECT s, j, cvec FROM read_parquet('$idxDir/codebooks/*.parquet')),
         |codes AS (SELECT CAST(cid AS BIGINT) AS cid, id, code
         |          FROM read_parquet('@@ANNDIR|$idxDir|codes@@/*/*.parquet',
         |                            hive_partitioning = true)$dv),
         |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < 5),
         |qu AS (SELECT vec_id AS qid, uv AS quv FROM u WHERE vec_id < 5),
         |probe AS (SELECT qid, cid$qcCol FROM (
         |    SELECT q.qid, c.cid$qcSel,
         |           row_number() OVER (PARTITION BY q.qid
         |             ORDER BY list_dot_product(q.qv, c.cv) / (q.qn * c.cn) DESC,
         |                      c.cid) AS rn
         |    FROM q CROSS JOIN cents c) WHERE rn <= 4),
         |lut AS (SELECT qu.qid, c.s, c.j,
         |          list_dot_product(qu.quv[c.s * 8 + 1 : c.s * 8 + 8], c.cvec) AS d
         |        FROM qu CROSS JOIN cb c),
         |adc AS (SELECT l.qid, co.id$qcAdc, list(l.d ORDER BY l.s) AS ds
         |        FROM codes co
         |        JOIN probe p ON p.cid = co.cid
         |        JOIN lut l ON l.qid = p.qid AND l.j = co.code[l.s + 1]
         |        WHERE co.id <> l.qid
         |        GROUP BY l.qid, co.id$qcAdc),
         |scored AS (SELECT qid, id,
         |    $scoreExpr AS score
         |  FROM adc),
         |short AS (SELECT qid, id FROM (
         |    SELECT qid, id,
         |           row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rk
         |    FROM scored) WHERE rk <= 40),
         |exact AS (SELECT sh.qid, sh.id,
         |            list_cosine_similarity(ec.embedding, eq.embedding) AS cos
         |          FROM short sh
         |          JOIN $rerankTable ec ON ec.vec_id = sh.id
         |          JOIN embeddings eq ON eq.vec_id = sh.qid)
         |SELECT qid, id, rank FROM (
         |  SELECT qid, id,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
         |  FROM exact) WHERE rank <= 10
         |ORDER BY qid, rank""".stripMargin
    }

    def pqPersistedReplay(idxDir: String,
                          tombstoned: Boolean = false,
                          rerankCte: String = "",
                          rerankTable: String = "embeddings"): String = {
      val dv = if (tombstoned)
        s" WHERE id NOT IN (SELECT id FROM read_parquet('$idxDir/tombstones/*.parquet'))"
      else ""
      s"""WITH $rerankCte
           |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
           |u AS (SELECT vec_id,
           |        CASE WHEN nrm = 0 THEN v ELSE [x / nrm for x in v] END AS uv
           |      FROM n),
           |cb AS (SELECT s, j, cvec FROM read_parquet('$idxDir/codebooks/*.parquet')),
           |codes AS (SELECT id, code FROM read_parquet('@@ANNDIR|$idxDir|codes@@/*.parquet')$dv),
           |q0 AS (SELECT vec_id AS qid, uv AS quv FROM u WHERE vec_id < 5),
           |lut AS (SELECT q0.qid, c.s, c.j,
           |          list_dot_product(q0.quv[c.s * 8 + 1 : c.s * 8 + 8], c.cvec) AS d
           |        FROM q0 CROSS JOIN cb c),
           |adc AS (SELECT l.qid, co.id, list(l.d ORDER BY l.s) AS ds
           |        FROM codes co JOIN lut l ON l.j = co.code[l.s + 1]
           |        WHERE co.id <> l.qid
           |        GROUP BY l.qid, co.id),
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
           |          JOIN $rerankTable ec ON ec.vec_id = sh.id
           |          JOIN embeddings eq ON eq.vec_id = sh.qid)
           |SELECT qid, id, rank FROM (
           |  SELECT qid, id,
           |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
           |  FROM exact) WHERE rank <= 10
           |ORDER BY qid, rank""".stripMargin
    }

    Map(
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
           |  FROM read_parquet('$sigLifeDir/sigs/*.parquet', filename = true))
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
           |         FROM read_parquet('$sigLifeDir/sigs/*.parquet')""".stripMargin),

      "x_dedup_sig_deleted" -> sigServeOracle(
        s"""SELECT doc_id, sig
           |         FROM read_parquet('$sigLifeDir/sigs/*.parquet')
           |         WHERE doc_id NOT IN (SELECT doc_id
           |           FROM read_parquet('$sigLifeDir/tombstones/*.parquet'))""".stripMargin),

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
           |FROM scored ORDER BY doc_id""".stripMargin,

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
        ivfpqPersistedReplay(ivfpqResIdxDir, residual = true),

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
           |bands AS (SELECT id, ahash, bb.band, (ahash >> (bb.band * 8)) & 255 AS bv
           |          FROM h CROSS JOIN (SELECT unnest(range(0, 8)) AS band) bb),
           |ok AS (SELECT band, bv FROM bands GROUP BY band, bv
           |       HAVING count(*) >= 2 AND count(*) <= 1000),
           |cap AS (SELECT b.* FROM bands b JOIN ok USING (band, bv)),
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
           |bands AS (SELECT id, ahash, bb.band, (ahash >> (bb.band * 8)) & 255 AS bv
           |          FROM h CROSS JOIN (SELECT unnest(range(0, 8)) AS band) bb),
           |ok AS (SELECT band, bv FROM bands GROUP BY band, bv
           |       HAVING count(*) >= 2 AND count(*) <= 1000),
           |cap AS (SELECT b.* FROM bands b JOIN ok USING (band, bv)),
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
           |bands AS (SELECT id, ahash, bb.band, (ahash >> (bb.band * 8)) & 255 AS bv
           |          FROM h CROSS JOIN (SELECT unnest(range(0, 8)) AS band) bb),
           |ok AS (SELECT band, bv FROM bands GROUP BY band, bv
           |       HAVING count(*) >= 2 AND count(*) <= 1000),
           |cap AS (SELECT b.* FROM bands b JOIN ok USING (band, bv)),
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
           |bands AS (SELECT id, ahash, bb.band, (ahash >> (bb.band * 8)) & 255 AS bv
           |          FROM h CROSS JOIN (SELECT unnest(range(0, 8)) AS band) bb),
           |ok AS (SELECT band, bv FROM bands GROUP BY band, bv
           |       HAVING count(*) >= 2),
           |cap AS (SELECT b.* FROM bands b JOIN ok USING (band, bv)),
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
           |bands AS (SELECT id, ahash, bb.band, (ahash >> (bb.band * 8)) & 255 AS bv
           |          FROM h CROSS JOIN (SELECT unnest(range(0, 8)) AS band) bb),
           |ok AS (SELECT band, bv FROM bands GROUP BY band, bv
           |       HAVING count(*) >= 2),
           |cap AS (SELECT b.* FROM bands b JOIN ok USING (band, bv)),
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
        // corpus half (< 100000) bands with the BUILD-TIME bucket cap,
        // stream half (≥ 100000) bands uncapped, equi-join + hamming —
        // one row per colliding band, no distinct (matching the stream's
        // append-mode emission).
        s"""WITH h AS (SELECT id, ahash
           |  FROM read_parquet('$imgHashStageDir/hashes.parquet')),
           |bb AS (SELECT unnest(range(0, 8)) AS band),
           |cb AS (SELECT c.id AS corpus_id, c.ahash AS chash, bb.band,
           |         (c.ahash >> (bb.band * 8)) & 255 AS bv
           |       FROM h c CROSS JOIN bb WHERE c.id < 100000),
           |ok AS (SELECT band, bv FROM cb GROUP BY band, bv
           |       HAVING count(*) <= 1000),
           |cbo AS (SELECT cb.* FROM cb JOIN ok USING (band, bv)),
           |sb AS (SELECT s.id, s.ahash, bb.band,
           |         (s.ahash >> (bb.band * 8)) & 255 AS bv
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
          |FROM c GROUP BY shard ORDER BY shard""".stripMargin,

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

  val all: Map[String, Q] =
    referenceQueries ++ relationalQueries ++ extensionQueries
  val oracles: Map[String, String] =
    referenceOracles ++ relationalOracles ++ extensionOracles

  /** Oracle SQL references the VERSIONED ANN artifact directories
    * (`cells`/`codes` — compactions publish them via a pointer-manifest
    * flip, see [[graft.operators.AnnIndex]]) through
    * `@@ANNDIR|<index path>|<name>@@` placeholders. The serving
    * directory is pointer-resolved at DUMP time — after the staged
    * lifecycles ran — so DuckDB replays exactly the bytes the engine
    * serves; a static path would read the stale RETAINED previous
    * version after a compact published a new one. Verify/VerifyOne
    * apply this to every oracle before writing oracle_sql.json.
    */
  def resolveOracleDirs(sql: String): String =
    "@@ANNDIR\\|([^|@]+)\\|([^|@]+)@@".r.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(
        graft.operators.AnnIndex.resolveDirPath(m.group(1), m.group(2))))

  /** THE ROWS-ONLY INVARIANT: exactly these queries ship without a
    * DuckDB oracle, each for a declared reason (engine-specific sketch
    * internals, JDK float/zlib artifacts, xx64 production configs whose
    * md5 twins ARE oracle-hashed, real codec output pinned by ScalaTests)
    * — the set has been stable since round 8 and every NEW catalog entry
    * must be oracle-hashed. [[graft.Verify]] fails the whole correctness
    * dump if the catalog drifts from this list, and
    * CatalogConsistencySpec pins the same set in the test suite; growing
    * it is a deliberate, reviewed act, never a side effect.
    */
  val rowsOnlyByDesign: Set[String] = Set(
    "x_approx_distinct", "x_sim_ivf_trained", "x_multimodal_frames",
    "x_multimodal_png", "x_multimodal_jpeg", "x_multimodal_features",
    "x_multimodal_audio", "x_text_surprisal", "x_dedup_minhash_fast",
    "x_dedup_cross_fast", "x_text_heavyhitters", "x_unigram_train",
    "x_unigram_segment", "x_dedup_incremental_fast", "x_stream_neardup",
    "x_stream_incremental", "x_corpus_overlap_fast", "x_text_compress",
    "x_stream_latedata", "x_multimodal_imagehash")
}
