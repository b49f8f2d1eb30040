package graft.functions

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Tables
import graft.operators.Similarity

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("vec_dot / vec_cosine / service_name usable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       service_name(' 9My  Svc!! ') AS n""".stripMargin)
      .as[(Double, Double, String)].head()
    assert(r._1 == 11.0)
    assert(math.abs(r._2 - 1.0) < 1e-12)
    assert(r._3 == "_9my_svc_")
  }

  test("vec_dot on float embeddings matches the HOF formulation") {
    GraftFunctions.register(spark)
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    emb.createOrReplaceTempView("emb_fs")
    val native = spark.sql(
      "SELECT vec_id, vec_dot(embedding, embedding) AS d FROM emb_fs ORDER BY vec_id")
      .as[(Long, Double)].collect()
    val hof = spark.sql(
      """SELECT vec_id, aggregate(zip_with(embedding, embedding, (x, y) -> cast(x as double) * cast(y as double)),
        |                         cast(0.0 as double), (acc, v) -> acc + v) AS d
        |FROM emb_fs ORDER BY vec_id""".stripMargin)
      .as[(Long, Double)].collect()
    assert(native.toSeq == hof.toSeq) // bit-identical accumulation
  }

  // On the unclustered random fixture the id-sampled cells happen to beat
  // k-means (0.92 vs ~0.57 @10): balanced k-means cells split near-
  // neighborhoods of uniformly random vectors. Trained centroids win when
  // embeddings actually cluster; this pins the trained path's recall floor.
  test("vec_dot_matrix: full-width, quantized, and block-structured modes") {
    import graft.functions.VectorFunctions.{vec_dot, vec_dot_matrix}
    import org.apache.spark.sql.functions._
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f, 4.0f))).toDF("id", "v")
    val mat = Array(Array(1.0, 0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0, 1.0))
    val full = df.select(vec_dot_matrix(col("v"), mat).as("d"))
      .selectExpr("d[0]", "d[1]").as[(Double, Double)].head()
    assert(full == ((1.0, 10.0)))
    // quantize: floor(x*1e6) fused — same as quantize-then-dot
    val q = df.select(vec_dot_matrix(col("v"), Array(Array(1.0, 1.0, 1.0, 1.0)),
        quantize = true).as("d"))
      .selectExpr("d[0]").as[Double].head()
    assert(q == 10000000.0)
    // block rows: row 0 covers [0,2), row 1 covers [2,4)
    val blk = df.select(vec_dot_matrix(col("v"),
        Array(Array(1.0, 1.0), Array(1.0, 1.0)),
        rowStarts = Array(0, 2)).as("d"))
      .selectExpr("d[0]", "d[1]").as[(Double, Double)].head()
    assert(blk == ((3.0, 7.0)))
    // structural equality: two instances over equal-content arrays are
    // the same expression (canonicalization/CSE eligibility)
    val e1 = df.select(vec_dot_matrix(col("v"), mat).as("a"),
      vec_dot_matrix(col("v"), mat.map(_.clone())).as("b"))
    assert(e1.queryExecution.analyzed.expressions.flatMap(_.collect {
      case m: graft.functions.VecDotMatrix => m
    }).distinct.size == 1)
  }

  test("vec_dot_matrix rejects under- AND over-covered vectors, interpreted and codegen") {
    import graft.functions.VectorFunctions.vec_dot_matrix
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    // block rows cover 4 elements; a 5-element vector must NOT silently
    // score a prefix (PQ input with dim > m·sub), nor a 3-element one AIOOBE
    val blocks = Array(Array(1.0, 1.0), Array(1.0, 1.0))
    val starts = Array(0, 2)
    for (bad <- Seq(Seq(1.0f, 2.0f, 3.0f, 4.0f, 5.0f), Seq(1.0f, 2.0f, 3.0f))) {
      // codegen path (through a projection)
      val ex1 = intercept[Exception] {
        Seq(Tuple1(bad)).toDF("v")
          .select(vec_dot_matrix(col("v"), blocks, rowStarts = starts)).collect()
      }
      assert(ex1.getMessage.contains("matrix coverage"), ex1.getMessage)
      // interpreted path (direct eval)
      val ex2 = intercept[Exception] {
        graft.functions.VecDotMatrix(
          Literal.create(bad.map(_.toDouble), ArrayType(DoubleType, containsNull = false)),
          blocks, quantize = false, rowStarts = starts).eval()
      }
      assert(ex2.getMessage.contains("matrix coverage"), ex2.getMessage)
    }
  }

  test("subword_encode: greedy longest-match, char fallback, lossless concat") {
    import graft.functions.TextFunctions.subword_encode
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.catalyst.expressions.Literal
    val vocab = Array("ab", "bc", "abc")
    // codegen path: longest match wins (abc, not ab+c); fallback chars
    // pass through; empty string → empty array
    val got = Seq("abcab", "xabcy", "zzz", "").toDF("w")
      .select(subword_encode(col("w"), vocab).as("t"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("abc", "ab"), Seq("x", "abc", "y"),
      Seq("z", "z", "z"), Seq.empty))
    // every segmentation concatenates back to the input (no-UNK contract)
    assert(got.zip(Seq("abcab", "xabcy", "zzz", "")).forall {
      case (toks, w) => toks.mkString == w })
    // interpreted path agrees with codegen
    val interp = graft.functions.SubwordEncode(Literal("abcab"), vocab).eval()
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(interp.toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq == Seq("abc", "ab"))
    // content-based equality: equal-content vocab arrays → equal expressions
    assert(graft.functions.SubwordEncode(Literal("x"), vocab.clone()) ==
      graft.functions.SubwordEncode(Literal("x"), vocab))
    // empty vocab degrades to a char split
    val chars = Seq("ab").toDF("w")
      .select(subword_encode(col("w"), Array.empty[String]).as("t"))
      .as[Seq[String]].head()
    assert(chars == Seq("a", "b"))
  }

  test("subword_encode: astral chars segment as one code point, never split surrogates") {
    import graft.functions.TextFunctions.subword_encode
    import org.apache.spark.sql.functions._
    // 𝄞 (U+1D11E) is two UTF-16 units but ONE code point: the fallback
    // must emit it whole, and a vocab entry containing it must match by
    // codepoint length — same semantics as the SQL-substring vocab
    // induction and the DuckDB oracle recursion
    val astral = "𝄞" // 𝄞
    val got = Seq(astral + "a", "x" + astral + astral).toDF("w")
      .select(subword_encode(col("w"), Array("ab")).as("t"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq(astral, "a"), Seq("x", astral, astral)))
    // no lone surrogates: every token is a well-formed string
    assert(got.flatten.forall(t => t.codePointCount(0, t.length) == 1))
    // a vocab entry spanning an astral char matches greedily
    val v2 = Seq(astral + "a").toDF("w")
      .select(subword_encode(col("w"), Array(astral + "a")).as("t"))
      .as[Seq[String]].head()
    assert(v2 == Seq(astral + "a"))
  }

  test("weight_of: O(1) model lookup, OOV scores 0, content equality") {
    import graft.functions.TextFunctions.weight_of
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.catalyst.expressions.Literal
    val m = Map("good" -> 3L, "bad" -> -2L)
    // codegen path (plain projection)
    val got = Seq("good", "bad", "meh").toDF("w")
      .select(weight_of(col("w"), m).as("s")).as[Long].collect().toSeq
    assert(got == Seq(3L, -2L, 0L))
    // interpreted path (how HOF lambdas evaluate it) agrees
    val sorted = m.toArray.sortBy(_._1)
    val e = graft.functions.WeightLookup(
      Literal("bad"), sorted.map(_._1), sorted.map(_._2))
    assert(e.eval() == -2L)
    // equal-content models → equal expressions (CSE fires); Map ordering
    // is normalized by the sort in weight_of
    assert(graft.functions.WeightLookup(Literal("x"),
        sorted.map(_._1).clone(), sorted.map(_._2).clone()) ==
      graft.functions.WeightLookup(Literal("x"), sorted.map(_._1), sorted.map(_._2)))
    // arity mismatch fails loudly
    assertThrows[IllegalArgumentException] {
      graft.functions.WeightLookup(Literal("x"), Array("a"), Array(1L, 2L))
    }
  }

  test("k-means-trained IVF recall is usable on unclustered data") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val trained = Similarity.ivfTopKTrained(emb, queries, "vec_id", "embedding", 10)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val recall = (exact & trained).size.toDouble / exact.size
    info(f"trained-IVF recall@10: $recall%.3f")
    assert(recall >= 0.3)
  }

  test("IVF top-k recall vs brute force") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 10)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(f"IVF recall@10 (nlist=16, nprobe=4): $recall%.3f")
    assert(recall >= 0.3, s"recall $recall") // quarter of cells probed
  }

  test("normalize_text: composed/decomposed, ligatures, width, case, marks") {
    import graft.functions.TextFunctions.normalize_text
    val composed = "café"            // é precomposed
    val decomposed = "café"         // e + combining acute
    val rows = Seq(
      (1L, composed), (2L, decomposed),
      (3L, "ﬁle"),                   // ﬁ ligature + "le"
      (4L, "１２３"),         // fullwidth 123
      (5L, "MiXeD CaSe"),
      (6L, "plain ascii text"),
      (7L, "")
    ).toDF("id", "s")
      .select(col("id"),
        normalize_text(col("s"), "nfc").as("nfc"),
        normalize_text(col("s"), "nfkc").as("nfkc"),
        normalize_text(col("s"), "fold").as("fold"))
      .as[(Long, String, String, String)].collect()
      .map(r => r._1 -> r).toMap
    // NFC unifies composed/decomposed; both hash-keys agree
    assert(rows(1L)._2 == rows(2L)._2 && rows(1L)._2 == composed)
    assert(rows(1L)._4 == rows(2L)._4)
    // NFKC expands compatibility forms
    assert(rows(3L)._3 == "file")
    assert(rows(4L)._3 == "123" && rows(4L)._4 == "123")
    // fold: lowercased, accent marks stripped
    assert(rows(5L)._4 == "mixed case")
    assert(rows(1L)._4 == "cafe")
    // ASCII text and empty strings are fixed points of every mode
    assert(rows(6L)._2 == "plain ascii text" &&
      rows(6L)._3 == "plain ascii text" && rows(6L)._4 == "plain ascii text")
    assert(rows(7L)._2 == "" && rows(7L)._4 == "")
    // unknown mode fails loudly at construction, not per row
    assertThrows[IllegalArgumentException](
      Seq(("x")).toDF("s").select(normalize_text(col("s"), "nfd")).collect())
  }

  test("vec_maxsim: codegen and interpreted agree with the HOF reference") {
    import graft.functions.VectorFunctions.vec_maxsim
    import org.apache.spark.sql.functions._
    // 2 query tokens x 3 doc tokens of width 2, hand-checkable values
    val q = Seq(1.0, 0.0, /**/ 0.0, 2.0)
    val d = Seq(3.0, 1.0, /**/ -1.0, 5.0, /**/ 2.0, 2.0)
    // token dots: q0·d = [3, -1, 2]  -> max 3
    //             q1·d = [2, 10, 4]  -> max 10
    val expect = 13.0
    val df = Seq((q, d)).toDF("q", "d")
    val got = df.select(vec_maxsim(col("q"), col("d"), 2).as("s"))
      .as[Double].head()
    assert(got == expect, s"codegen path: $got")
    // interpreted path (direct eval)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val ev = graft.functions.VecMaxSim(
      Literal.create(q, ArrayType(DoubleType, containsNull = false)),
      Literal.create(d, ArrayType(DoubleType, containsNull = false)), 2).eval()
    assert(ev == expect, s"interpreted path: $ev")
    // float inputs load exactly like the double path
    val gotF = Seq((q.map(_.toFloat), d.map(_.toFloat))).toDF("q", "d")
      .select(vec_maxsim(col("q"), col("d"), 2).as("s")).as[Double].head()
    assert(gotF == expect, s"float path: $gotF")
    // HOF reference formulation on the engine side agrees
    val hof = Seq((q, d)).toDF("q", "d").selectExpr(
      """aggregate(sequence(0, 1), 0D, (acc, i) ->
        |  acc + aggregate(sequence(0, 2), cast('-Infinity' as double), (best, j) ->
        |    greatest(best, aggregate(sequence(0, 1), 0D,
        |      (s, e) -> s + q[i * 2 + e] * d[j * 2 + e]))))""".stripMargin + " AS s")
      .as[Double].head()
    assert(hof == expect)
  }

  test("vec_maxsim fails loudly on empty or non-multiple-of-dim matrices") {
    import graft.functions.VectorFunctions.vec_maxsim
    import org.apache.spark.sql.functions._
    for (bad <- Seq(
        (Seq(1.0, 2.0), Seq.empty[Double]),       // empty doc matrix
        (Seq.empty[Double], Seq(1.0, 2.0)),       // empty query matrix
        (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)))) {   // truncated matrix
      val ex = intercept[Exception] {
        Seq(bad).toDF("q", "d")
          .select(vec_maxsim(col("q"), col("d"), 2)).collect()
      }
      assert(ex.getMessage.contains("non-empty multiples of dim"),
        ex.getMessage)
    }
    // null matrix -> null score (BinaryExpression null propagation)
    val r = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("q", "d")
      .select(vec_maxsim(col("q"), col("d"), 2).as("s"))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("min_k_pairs: k smallest (key, value) pairs, any partitioning, " +
      "ties to the smaller value, string values, k past the group size") {
    import org.apache.spark.sql.functions._
    import graft.functions.TopKFunctions.min_k_pairs
    // 1000 rows over 7 groups, engineered ties (key = i % 13 gives many
    // equal keys per group) — expectation computed by plain Scala sort
    val rows = (0 until 1000).map(i => (i % 7L, (i % 13).toDouble, i.toLong))
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).sorted.take(5)
    }
    for (parts <- Seq(1, 13)) {
      val got = rows.toDF("g", "key", "v").repartition(parts)
        .groupBy("g").agg(min_k_pairs(col("key"), col("v"), 5).as("top"))
        .select(col("g"), posexplode(col("top")))
        .select(col("g"), col("col.key"), col("col.value"))
        .as[(Long, Double, Long)].collect()
        .groupBy(_._1).map { case (g, rs) => g -> rs.map(r => (r._2, r._3)).toSeq }
      assert(got.keySet == expected.keySet)
      for ((g, want) <- expected)
        assert(got(g) == want, s"group $g at $parts partitions")
    }
    // string values: interpreted ordering on ties, defensive copies
    // survive the buffer-backed UTF8String reuse across rows
    val sgot = Seq((1L, 1.0, "bb"), (1L, 1.0, "aa"), (1L, 0.5, "zz"),
        (1L, 2.0, "cc"))
      .toDF("g", "key", "v").repartition(3)
      .groupBy("g").agg(min_k_pairs(col("key"), col("v"), 3).as("top"))
      .select(posexplode(col("top")))
      .select(col("col.key"), col("col.value"))
      .as[(Double, String)].collect().toSeq
    assert(sgot == Seq((0.5, "zz"), (1.0, "aa"), (1.0, "bb")))
    // k past the group size: everything, ascending, nothing invented
    val small = Seq((1L, 3.0, 30L), (1L, 1.0, 10L))
      .toDF("g", "key", "v")
      .groupBy("g").agg(min_k_pairs(col("key"), col("v"), 10).as("top"))
      .select(posexplode(col("top"))).select(col("col.key"))
      .as[Double].collect().toSeq
    assert(small == Seq(1.0, 3.0))
    // null keys and null values are skipped, not ranked
    val withNulls = Seq((1L, Some(2.0), Some(20L)), (1L, None, Some(9L)),
        (1L, Some(1.0), None))
      .toDF("g", "key", "v")
      .groupBy("g").agg(min_k_pairs(col("key"), col("v"), 3).as("top"))
      .select(posexplode(col("top"))).select(col("col.value"))
      .as[Long].collect().toSeq
    assert(withNulls == Seq(20L))
  }

  test("min_k_pairs: lazy buffer growth past the 16-slot seed (large k), " +
      "growth across merge and serde paths (the r17 bucket-cap callers)") {
    import org.apache.spark.sql.functions._
    import graft.functions.TopKFunctions.min_k_pairs
    // k = 200 forces ensure() through doubling (16→32→64→128→200); 13
    // partitions force partial buffers through serialize/deserialize and
    // merge; group 0 holds > k rows (overflow), group 2 holds < 16 (never
    // grows). Expectation from a plain Scala sort.
    val rows = (0 until 1500).map(i => (i % 3L, (i % 997).toDouble, i.toLong))
      .filterNot { case (g, _, v) => g == 2L && v >= 30 }
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).sorted.take(200)
    }
    val got = rows.toDF("g", "key", "v").repartition(13)
      .groupBy("g").agg(min_k_pairs(col("key"), col("v"), 200).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.key"), col("col.value"))
      .as[(Long, Double, Long)].collect()
      .groupBy(_._1).map { case (g, rs) => g -> rs.map(r => (r._2, r._3)).toSeq }
    assert(got.keySet == expected.keySet)
    for ((g, want) <- expected) assert(got(g) == want, s"group $g")
  }

  test("min_k_pairs_if ≡ filter-then-min_k_pairs, per condition, " +
      "any partitioning (the r16 one-pass tune sweep)") {
    import org.apache.spark.sql.functions._
    import graft.functions.TopKFunctions.{min_k_pairs, min_k_pairs_if}
    // the tune-sweep shape: nested conditions rank <= p over one frame
    val rows = (0 until 600).map(i =>
      (i % 5L, (i % 11).toDouble, i.toLong, i % 4 + 1))
    val df = rows.toDF("g", "key", "v", "rank").repartition(7)
    def collectTop(d: org.apache.spark.sql.DataFrame, c: String) =
      d.select(col("g"), posexplode(col(c)))
        .select(col("g"), col("col.key"), col("col.value"))
        .as[(Long, Double, Long)].collect().toSeq.sorted
    val conds = Seq(1, 2, 4)
    // one pass, three FILTERed aggregates
    val onePass = df.groupBy("g").agg(
      min_k_pairs_if(col("key"), col("v"), 4, col("rank") <= 1).as("t1"),
      min_k_pairs_if(col("key"), col("v"), 4, col("rank") <= 2).as("t2"),
      min_k_pairs_if(col("key"), col("v"), 4, col("rank") <= 4).as("t4"))
      .localCheckpoint(true)
    for (p <- conds) {
      val want = collectTop(df.filter(col("rank") <= p)
        .groupBy("g").agg(min_k_pairs(col("key"), col("v"), 4).as("t")), "t")
      val got = collectTop(onePass, s"t$p")
      assert(got == want, s"cond rank <= $p")
    }
  }
}
