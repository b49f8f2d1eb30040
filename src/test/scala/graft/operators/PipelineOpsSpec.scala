package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-9 pipeline additions: CDC merge-on-read / SCD2
  * history, trained scalar quantization, HTML text extraction, and SFT
  * chat assembly with loss masks.
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  // ---------------------------------------------------------------- CDC

  private def log() = Seq(
    // key 1: I → U → U (current = v2)
    (1L, 1L, "I", "a0"), (1L, 2L, "U", "a1"), (1L, 3L, "U", "a2"),
    // key 2: I → D (tombstoned)
    (2L, 1L, "I", "b0"), (2L, 4L, "D", null.asInstanceOf[String]),
    // key 3: I → D → I (revived)
    (3L, 1L, "I", "c0"), (3L, 2L, "D", null.asInstanceOf[String]),
    (3L, 5L, "I", "c1"),
    // key 4: single insert
    (4L, 7L, "I", "d0")
  ).toDF("k", "seq", "op", "payload")

  test("applyLog: last-write-wins, tombstones drop, re-inserts revive") {
    val snap = Cdc.applyLog(log(), "k", "seq", "op")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(snap == Seq((1L, "a2"), (3L, "c1"), (4L, "d0")))
  }

  test("applyLog aggregates without a window sort (partial-agg plan)") {
    val plan = Cdc.applyLog(log(), "k", "seq", "op")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"no aggregate in:\n$plan")
  }

  test("applyLog refuses a payload-less log") {
    val e = intercept[IllegalArgumentException] {
      Cdc.applyLog(log().select("k", "seq", "op"), "k", "seq", "op")
    }
    assert(e.getMessage.contains("payload"))
  }

  test("history: keyed validity intervals, tombstones never current") {
    val h = Cdc.history(log(), "k", "seq", "op")
      .select("k", "op", "seq_from", "seq_to", "is_current")
      .orderBy("k", "seq_from")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(h == Seq(
      (1L, "I", 1L, Some(2L), false), (1L, "U", 2L, Some(3L), false),
      (1L, "U", 3L, None, true),
      (2L, "I", 1L, Some(4L), false), (2L, "D", 4L, None, false),
      (3L, "I", 1L, Some(2L), false), (3L, "D", 2L, Some(5L), false),
      (3L, "I", 5L, None, true),
      (4L, "I", 7L, None, true)))
  }

  test("snapshotAsOf time-travels across delete and revive boundaries") {
    def at(seq: Long) = Cdc.snapshotAsOf(log(), "k", "seq", "op", seq)
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(at(1L) == Seq((1L, "a0"), (2L, "b0"), (3L, "c0"))) // 4 lands at 7
    assert(at(2L) == Seq((1L, "a1"), (2L, "b0")))  // 3 deleted at seq 2
    assert(at(4L) == Seq((1L, "a2")))              // 2 deleted at 4, 3 still gone
    assert(at(5L) == Seq((1L, "a2"), (3L, "c1")))  // 3 revived at 5
    assert(at(99L) == Seq((1L, "a2"), (3L, "c1"), (4L, "d0")))
  }

  test("compactLog: snapshot and >=checkpoint time travel invariant at EVERY seam") {
    val l = log()
    def snap(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
      Cdc.applyLog(df, "k", "seq", "op")
        .orderBy("k").as[(Long, String)].collect().toSeq
    def asOf(df: org.apache.spark.sql.DataFrame, s: Long): Seq[(Long, String)] =
      Cdc.snapshotAsOf(df, "k", "seq", "op", s)
        .orderBy("k").as[(Long, String)].collect().toSeq
    val full = snap(l)
    // every checkpoint position crosses a different seam: inside the
    // insert prefix, on each delete, on the revive, past the end
    for (cut <- 0L to 8L) {
      val c = Cdc.compactLog(l, "k", "seq", "op", cut)
      assert(snap(c) == full, s"applyLog changed at checkpoint $cut")
      for (s <- cut to 8L)
        assert(asOf(c, s) == asOf(l, s),
          s"snapshotAsOf($s) changed at checkpoint $cut")
    }
  }

  test("compactLog: dead keys vanish with their tombstones, tail verbatim") {
    // checkpoint at 4: key 1 collapses to one insert at its last seq,
    // keys 2 (D@4) and 3 (D@2, revive in tail) vanish from the head,
    // keys 3 and 4 survive only via tail rows
    val c = Cdc.compactLog(log(), "k", "seq", "op", asOfSeq = 4L)
      .orderBy("k", "seq")
      .as[(Long, Long, String, Option[String])].collect().toSeq
    assert(c == Seq(
      (1L, 3L, "I", Some("a2")),  // checkpoint row: op=I, ORIGINAL seq
      (3L, 5L, "I", Some("c1")),  // tail revive, verbatim
      (4L, 7L, "I", Some("d0"))), // tail insert, verbatim
      s"unexpected compacted log: $c")
    // time travel BELOW the checkpoint is truncated by contract: the
    // pre-checkpoint versions are gone (key 1's seq-1 payload, keys
    // 2/3's pre-delete lives are unrecoverable)
    val below = Cdc.snapshotAsOf(
        Cdc.compactLog(log(), "k", "seq", "op", 4L), "k", "seq", "op", 1L)
      .as[(Long, String)].collect().toSeq
    assert(below.isEmpty, s"below-checkpoint travel should be empty: $below")
  }

  test("compactLog fails loudly on a null op in the head") {
    val bad = Seq((1L, 1L, "I", "a0"),
      (1L, 2L, null.asInstanceOf[String], "a1")).toDF("k", "seq", "op", "p")
    val e = intercept[Exception] {
      Cdc.compactLog(bad, "k", "seq", "op", asOfSeq = 5L).collect()
    }
    assert(e.getMessage.contains("null op"))
  }

  test("applyLog fails loudly on a null op instead of silently tombstoning") {
    val bad = Seq((1L, 1L, "I", "a0"),
      (1L, 2L, null.asInstanceOf[String], "a1")).toDF("k", "seq", "op", "p")
    val e = intercept[Exception] {
      Cdc.applyLog(bad, "k", "seq", "op").collect()
    }
    assert(e.getMessage.contains("null op"))
  }

  test("tombstones: deleted-never-revived keys only, null op raises") {
    val t = Cdc.tombstones(log(), "k", "seq", "op")
      .orderBy("k").as[Long].collect().toSeq
    assert(t == Seq(2L), "key 3 revived, key 2 stays tombstoned")
    val bad = Seq((9L, 1L, null.asInstanceOf[String], "x"))
      .toDF("k", "seq", "op", "p")
    val e = intercept[Exception] {
      Cdc.tombstones(bad, "k", "seq", "op").collect()
    }
    assert(e.getMessage.contains("null op"))
  }

  test("history fails loudly on a null op instead of a null is_current") {
    val bad = Seq((1L, 1L, "I", "a0"),
      (1L, 2L, null.asInstanceOf[String], "a1")).toDF("k", "seq", "op", "p")
    val e = intercept[Exception] {
      Cdc.history(bad, "k", "seq", "op").collect()
    }
    assert(e.getMessage.contains("null op"))
  }

  test("history honors a non-default delete op code") {
    val h = Cdc.history(
        Seq((1L, 1L, "INS", "x"), (1L, 2L, "DEL",
          null.asInstanceOf[String])).toDF("k", "seq", "op", "p"),
        "k", "seq", "op", deleteOp = "DEL")
      .orderBy("seq_from").select("op", "is_current")
      .as[(String, Boolean)].collect().toSeq
    assert(h == Seq(("INS", false), ("DEL", false)),
      "a DEL tombstone must never be current")
  }

  // ---------------------------------------- preference pairs / privacy

  test("preferencePairs: best-vs-rest, ties excluded, cap respected") {
    val df = Seq(
      // group a: clear ranking 10 > 8 > 7 > 6 > 5 — cap at 3 pairs
      ("a", 1L, 10L), ("a", 2L, 8L), ("a", 3L, 7L), ("a", 4L, 6L), ("a", 5L, 5L),
      // group b: runner-up TIES the best — no pair for it, one for the worse
      ("b", 6L, 9L), ("b", 7L, 9L), ("b", 8L, 2L),
      // group c: single candidate — no pairs at all
      ("c", 9L, 4L)
    ).toDF("grp", "id", "score")
    val got = Curation.preferencePairs(df, "grp", "id", "score", maxPairs = 3)
      .orderBy("grp", "rejected_id")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 1L, 2L, 2L), ("a", 1L, 3L, 3L), ("a", 1L, 4L, 4L), // id 5 capped
      ("b", 6L, 8L, 7L)                                        // tie id 7 skipped
    ), s"got $got")
  }

  test("k-anonymity: audit flags exactly the small groups; suppression leaves a k-anonymous table") {
    val df = (1 to 20).map(i => (i.toLong, "US", "A")) ++
      (21 to 24).map(i => (i.toLong, "US", "B")) ++   // 4 rows — at risk at k=5
      (25 to 30).map(i => (i.toLong, "DE", "A"))
    val t = df.toDF("id", "country", "segment")
    val audit = Curation.kAnonymityAudit(t, Seq("country", "segment"), k = 5)
      .orderBy("country", "segment")
      .as[(String, String, Long, Boolean)].collect().toSeq
    assert(audit == Seq(("DE", "A", 6L, false), ("US", "A", 20L, false),
      ("US", "B", 4L, true)))
    val kept = Curation.kAnonymitySuppress(t, Seq("country", "segment"), k = 5)
    assert(kept.count() == 26L)
    assert(kept.filter(col("segment") === "B").count() == 0L)
    // the suppressed output is itself k-anonymous: re-audit finds no risk
    val reaudit = Curation.kAnonymityAudit(kept, Seq("country", "segment"), 5)
      .filter(col("at_risk")).count()
    assert(reaudit == 0L)
  }

  test("l-diversity: homogeneous sensitive values flagged even when k-anonymous") {
    val t = (
      (1 to 10).map(i => (i.toLong, "US", "A", "pos")) ++      // k-anon, l=1 -> risk
      (11 to 20).map(i => (i.toLong, "US", "B",
        if (i % 2 == 0) "pos" else "neg"))                      // diverse -> fine
    ).toDF("id", "country", "segment", "sign")
    val audit = Curation.lDiversityAudit(t, Seq("country", "segment"),
        "sign", l = 2)
      .orderBy("country", "segment")
      .as[(String, String, Long, Long, Boolean)].collect().toSeq
    assert(audit == Seq(("US", "A", 10L, 1L, true),
      ("US", "B", 10L, 2L, false)))
  }

  test("domainWaterfill: exact budget split, small domains whole, level capped") {
    // availabilities (2, 4, 8, 100) built from split rows, budget 20:
    // levels 2 and 4 are affordable (saturate a, b), level =
    // (20-6) div 2 = 7 with remainder 0 -> allocations (2, 4, 7, 7)
    val df = Seq(("a", 1L), ("a", 1L), ("b", 2L), ("b", 2L),
      ("c", 4L), ("c", 4L), ("d", 50L), ("d", 50L))
      .toDF("domain", "tokens")
    val got = Curation.domainWaterfill(df, "domain", "tokens", budget = 20L)
      .orderBy("domain")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(("a", 2L, 2L, true), ("b", 4L, 4L, true),
      ("c", 8L, 7L, false), ("d", 100L, 7L, false)), s"got $got")
    // a budget with a nonzero remainder: 21 -> the smaller unsaturated
    // domain (c) takes the extra token
    val odd = Curation.domainWaterfill(df, "domain", "tokens", budget = 21L)
      .orderBy("domain")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(odd.map(_._3) == Seq(2L, 4L, 8L, 7L), s"got $odd")
    assert(odd.map(_._3).sum == 21L, "allocations must sum to the budget")
    assert(got.forall(t => t._3 <= t._2), "allocation exceeds availability")
    // budget >= total: everything saturates
    val all = Curation.domainWaterfill(df, "domain", "tokens", budget = 1000L)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(all.forall(t => t._3 == t._2 && t._4))
  }

  test("waterfillTake: per-domain budgets enforced with <= one-doc overrun") {
    val df = Seq(("a", 1L, 2L), ("a", 2L, 2L),
      ("b", 3L, 10L), ("b", 4L, 10L), ("b", 5L, 10L),
      ("c", 6L, 50L), ("c", 7L, 50L)).toDF("domain", "id", "tokens")
    // availabilities (4, 30, 100), budget 40: a saturates (4),
    // level = (40-4) div 2 = 18 -> b gets 18, c gets 18
    val alloc = Curation.domainWaterfill(df, "domain", "tokens", 40L)
      .orderBy("domain").as[(String, Long, Long, Boolean)].collect().toSeq
    assert(alloc == Seq(("a", 4L, 4L, true), ("b", 30L, 18L, false),
      ("c", 100L, 18L, false)), s"alloc $alloc")
    val taken = Curation.waterfillTake(df, "domain", "id", "tokens", 40L)
      .orderBy("id").as[(String, Long, Long)].collect().toSeq
    // a: both docs (4 = alloc); b: docs 3,4 (cum_before 0,10 < 18 —
    // overrun to 20, doc 5 cum_before 20 >= 18 stops); c: doc 6 only
    assert(taken.map(_._2) == Seq(1L, 2L, 3L, 4L, 6L), s"taken $taken")
    // overrun bound: per domain, taken tokens < allocated + max doc
    val byDom = taken.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(byDom("a") == 4L && byDom("b") == 20L && byDom("c") == 50L)
  }

  // ------------------------------------------- trained scalar quantizer

  test("scalarQuantizeTrained: exact codes on a planted grid") {
    // dim0 spans [0,1] → codes 0 / 127 / 255; dim1 constant → code 0,
    // zero error (mx == mn branch)
    val df = Seq(
      (1L, Array(0.0f, 5.0f)),
      (2L, Array(0.5f, 5.0f)),
      (3L, Array(1.0f, 5.0f))
    ).toDF("id", "vec")
    val out = Embeddings.scalarQuantizeTrained(df, "id", "vec")
      .orderBy("id")
      .select("id", "codes", "err_scaled", "n_dims")
      .as[(Long, Seq[Int], Long, Long)].collect().toSeq
    assert(out.map(_._2) == Seq(Seq(0, 0), Seq(127, 0), Seq(255, 0)))
    assert(out.map(_._4) == Seq(2L, 2L, 2L))
    // 0.5·2^20 is exactly representable → code 127 with residual
    // (xi·255 − code·range) = 2^19·255 − 127·2^20 = 2^19 exactly
    assert(out.map(_._3) == Seq(0L, 1L << 19, 0L))
  }

  test("scalarQuantizeTrained: per-element error bounded by the grid step") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)
    val coded = Embeddings.scalarQuantizeTrained(emb, "vec_id", "embedding")
    val dims = coded.select(max("n_dims")).as[Long].head()
    // |err per element| < (mx − mn) on the ×255 lattice → summed bound
    val fx = emb.select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("pos"),
        floor(col("x").cast("double") * lit(1048576.0)).cast("long").as("xi"))
    val worstRange = fx.groupBy("pos")
      .agg((max("xi") - min("xi")).as("range"))
      .select(max("range")).as[Long].head()
    val worstErr = coded.select(max("err_scaled")).as[Long].head()
    assert(worstErr <= dims * worstRange,
      s"err $worstErr exceeds dims($dims) * worst range($worstRange)")
    // codes stay on the 0..255 grid
    val bad = coded.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") > 255).count()
    assert(bad == 0)
  }

  test("scalarQuantizeWithGrid fails loudly on a dimension the grid never saw") {
    val base = Seq((1L, Array(0.0f, 1.0f))).toDF("id", "vec")
    val grid = Embeddings.scalarGrid(base, "id", "vec")
    val wider = Seq((2L, Array(0.5f, 0.5f, 0.5f))).toDF("id", "vec")
    val e = intercept[Exception] {
      Embeddings.scalarQuantizeWithGrid(wider, "id", "vec", grid).collect()
    }
    assert(e.getMessage.contains("absent from the grid"))
  }

  test("scalarQuantizeWithGrid fails loudly on a vector SHORTER than the grid") {
    // the converse of the absent-dimension guard: a short vector joins
    // every one of its dims, so only the n_dims check can catch it —
    // matching encodeWithGridProjection's length contract
    val base = Seq((1L, Array(0.0f, 1.0f, 2.0f))).toDF("id", "vec")
    val grid = Embeddings.scalarGrid(base, "id", "vec")
    val shorter = Seq((2L, Array(0.5f, 0.5f))).toDF("id", "vec")
    val e = intercept[Exception] {
      Embeddings.scalarQuantizeWithGrid(shorter, "id", "vec", grid).collect()
    }
    assert(e.getMessage.contains("expected 3 dims, got 2"),
      s"wrong failure: ${e.getMessage}")
  }

  test("projection encoder: codes identical to the join path, no shuffle, size guard") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    val gridDf = Embeddings.scalarGrid(emb, "vec_id", "embedding")
    val grid = gridDf.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val viaJoin = Embeddings
      .scalarQuantizeWithGrid(emb, "vec_id", "embedding", gridDf)
      .select(col("vec_id"), col("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    val proj = Embeddings
      .encodeWithGridProjection(emb, "vec_id", "embedding", grid)
    val viaProj = proj.select(col("vec_id"), col("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(viaProj == viaJoin, "projection and join paths disagree")
    // plan gate on an un-limited scan — the spec's own limit(50) above
    // adds a SinglePartition exchange that has nothing to do with the
    // encoder
    val full = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = Embeddings
      .encodeWithGridProjection(full, "vec_id", "embedding", grid)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // wrong dimensionality must raise, not truncate or null out
    val bad = Seq((99L, Array(0.1f, 0.2f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Embeddings.encodeWithGridProjection(bad, "vec_id", "embedding", grid)
        .select("code_digest").collect()
    }
    assert(e.getMessage.contains("expected"))
  }

  // ------------------------------------------------------- HTML extract

  test("HtmlText.extract: scripts/styles/comments drop, entities decode") {
    val html =
      """<html><head><title>T &amp; U</title>
        |<style>div { color: red }</style>
        |<script>if (a &lt; b) { document.write("<div>x</div>") }</script>
        |</head><body><!-- chrome --><h1>Head</h1>
        |<p>first&nbsp;para with &quot;quotes&quot; &#39;s</p>
        |<div>second <a href="/x">link</a> here</div>
        |<span>unclosed span</body></html>""".stripMargin
    val out = HtmlText.extract(
        Seq((1L, html)).toDF("id", "html"), "id", "html")
      .select("title", "text", "n_links", "n_tags")
      .as[(String, String, Int, Int)].head()
    assert(out._1 == "T & U")
    // NOTE the script's "<div>x</div>" payload must NOT leak into text
    assert(out._2 ==
      "Head\nfirst para with \"quotes\" 's\nsecond link here\nunclosed span")
    assert(out._3 == 1)
    assert(out._4 > 5)
  }

  test("a page missing </head> keeps its <header> content (close-tag anchoring)") {
    // `</head[^>]*>` would swallow everything up to </header> here
    val html = "<head><title>T</title><body><header>Nav</header>" +
      "<p>Main text</p>"
    val out = HtmlText.extract(
        Seq((1L, html)).toDF("id", "html"), "id", "html")
      .select("text").as[String].head()
    assert(out.contains("Main text"), s"body swallowed: '$out'")
    assert(out.contains("Nav"), s"header subtree swallowed: '$out'")
  }

  test("HtmlText.extract degrades on tagless text (no exception, identity-ish)") {
    val out = HtmlText.extract(
        Seq((1L, "plain  text   only")).toDF("id", "html"), "id", "html")
      .select("title", "text", "n_links", "n_tags")
      .as[(String, String, Int, Int)].head()
    assert(out == (("", "plain text only", 0, 0)))
  }

  // ------------------------------------------------- record linkage

  test("blockedFuzzyMatch links typos within a block, respects cap and bound") {
    val rows = Seq(
      (1L, "Acme Corp 12345"), (2L, "Acme Corpn 12345"),  // dist 1, linked
      (3L, "Zenith 99999"), (4L, "Zenith 99999"),          // exact dup
      (5L, "Acme Corp 54321"),                              // other block
      (6L, "Acmex Cyrpz 12345")                             // dist 3 > max
    ).toDF("id", "name")
    val got = Dedup.blockedFuzzyMatch(rows, "id", "name", maxDist = 2)
      .orderBy("a", "b").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 1L), (3L, 4L, 0L)))
    // a capped block prices as nothing: every row in one block, cap 3
    val flood = (1L to 10L).map(i => (i, s"same tail 777")).toDF("id", "name")
    assert(Dedup.blockedFuzzyMatch(flood, "id", "name",
      maxBlockSize = Some(3)).count() == 0)
  }

  test("blockedFuzzyMatchDropped censuses exactly the over-cap blocks") {
    // planted degenerate block: 10 rows share tail "l 777" (cap 3 drops
    // it); a healthy pair and a singleton stay under cap and NEVER appear
    val rows = ((1L to 10L).map(i => (i, "same tail 777")) ++
      Seq((11L, "Acme Corp 12345"), (12L, "Acme Corpn 12345"),
          (13L, "Zenith 99999"))).toDF("id", "name")
    val census = Dedup.blockedFuzzyMatchDropped(rows, "id", "name",
        suffixLen = 5, maxBlockSize = 3)
      .as[(String, Long)].collect().toSeq
    assert(census == Seq(("il777", 10L)),
      s"dropped census mismatch: $census")
    // the census + the matcher partition the work: the dropped block's
    // rows produce zero pairs, the surviving blocks still link
    val pairs = Dedup.blockedFuzzyMatch(rows, "id", "name",
        maxBlockSize = Some(3)).as[(Long, Long, Long)].collect().toSeq
    assert(pairs == Seq((11L, 12L, 1L)))
    // empty census certifies the cap excluded nothing
    assert(Dedup.blockedFuzzyMatchDropped(rows, "id", "name",
      suffixLen = 5, maxBlockSize = 100).count() == 0)
  }

  // ------------------------------------------- tokenizer persistence

  test("BPE merges survive a parquet round trip: loaded apply ≡ in-memory") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    val mergesDf = Bpe.train(docs, "text", numMerges = 8, maxWords = 2000,
      wordPattern = Some("[a-z]+"))
    val path = "/tmp/graft_test_bpe_idx/merges"
    mergesDf.coalesce(1).write.mode("overwrite").parquet(path)
    def ranked(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
    val inMem = ranked(mergesDf)
    val loaded = ranked(spark.read.parquet(path))
    assert(loaded == inMem, "merge table changed across the round trip")
    val words = Seq("spark", "tablesqq", "zzz").toDF("word")
    val a = Bpe.applyMerges(words, "word", inMem)
      .select("word", "syms").as[(String, Seq[String])].collect().toMap
    val b = Bpe.applyMerges(words, "word", loaded)
      .select("word", "syms").as[(String, Seq[String])].collect().toMap
    assert(a == b, "persisted tokenizer segments differently")
  }

  // ------------------------------------------------------- SFT assembly

  private def conv() = Seq(
    (10L, "c1", "hello there"),        // user  (2+1 toks)
    (11L, "c1", "hi how can I help"),  // asst  (5+1 toks)
    (12L, "c1", "fix my bug"),         // user  (3+1 toks)
    (13L, "c1", "done"),               // asst  (1+1 toks)
    (20L, "c2", "solo message")        // user only → zero loss tokens
  ).toDF("doc_id", "conv", "text")

  test("sftTurns: roles alternate, token intervals tile the sequence") {
    val t = Curation.sftTurns(conv(), "conv", "doc_id", "text")
      .orderBy("conv", "turn_idx")
      .select("conv", "turn_idx", "role", "turn_tokens", "tok_start",
        "tok_end", "loss_turn")
      .as[(String, Long, String, Long, Long, Long, Boolean)]
      .collect().toSeq
    assert(t == Seq(
      ("c1", 1L, "user", 3L, 0L, 3L, false),
      ("c1", 2L, "assistant", 6L, 3L, 9L, true),
      ("c1", 3L, "user", 4L, 9L, 13L, false),
      ("c1", 4L, "assistant", 2L, 13L, 15L, true),
      ("c2", 1L, "user", 3L, 0L, 3L, false)))
  }

  test("sftAssemble: tagged text, totals, and loss tokens agree with turns") {
    val a = Curation.sftAssemble(conv(), "conv", "doc_id", "text")
      .orderBy("conv")
      .select("conv", "n_turns", "total_tokens", "loss_tokens", "sft_text")
      .as[(String, Long, Long, Long, String)].collect().toSeq
    assert(a.map(r => (r._1, r._2, r._3, r._4)) ==
      Seq(("c1", 4L, 15L, 8L), ("c2", 1L, 3L, 0L)))
    assert(a.head._5 ==
      "<|user|>\nhello there\n<|assistant|>\nhi how can I help\n" +
      "<|user|>\nfix my bug\n<|assistant|>\ndone")
    assert(a(1)._5 == "<|user|>\nsolo message")
  }
}
