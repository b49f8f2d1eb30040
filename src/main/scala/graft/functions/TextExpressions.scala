package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword segmentation (the MaxMatch /
  * WordPiece-style tokenizer-apply step, Sennrich/Wu et al. — public
  * knowledge): at each position take the longest vocab entry matching the
  * remaining suffix, falling back to a single character. Fallback
  * characters are emitted as-is (no `[UNK]` collapse), so concatenating
  * the output always reproduces the input.
  *
  * A per-word iterative loop is inexpressible in Spark's built-in
  * functions without a Scala UDF (boxing + serialization per word);
  * this expression holds the vocab as a plan constant (`addReferenceObj`
  * — a shared HashSet, NOT a generated literal, so generated code is
  * O(1) in vocab size and a 100k-entry production vocab compiles exactly
  * like a 50-entry one) and runs the scan as a tight generated loop
  * inside whole-stage codegen.
  *
  * Determinism: pure function of (word, vocab) — exactly replayable, and
  * the DuckDB oracle replays it as a recursive CTE over word positions.
  */
case class SubwordEncode(child: Expression, vocab: Array[String])
  extends UnaryExpression {

  // case-class equality on the Array field is reference identity, which
  // would defeat subexpression elimination — compare contents
  override def equals(o: Any): Boolean = o match {
    case s: SubwordEncode =>
      child == s.child && java.util.Arrays.equals(
        vocab.asInstanceOf[Array[AnyRef]], s.vocab.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode: Int =
    java.util.Objects.hash(child,
      Int.box(java.util.Arrays.hashCode(vocab.asInstanceOf[Array[AnyRef]])))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"subword_encode requires a string input, got ${other.simpleString(10)}")
    }

  // shared across rows AND across codegen via addReferenceObj; transient
  // so the expression tree serializes the compact Array, not the set
  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(16, vocab.length * 2))
    vocab.foreach(s.add)
    s
  }
  // lengths are code points, not UTF-16 units: the vocab induction
  // (Spark SQL substring) and the DuckDB oracle are both codepoint-based,
  // and a UTF-16 scan would split surrogate pairs on astral input
  private lazy val maxLen: Int =
    if (vocab.isEmpty) 1
    else math.max(1, vocab.map(v => v.codePointCount(0, v.length)).max)

  override def nullSafeEval(a: Any): Any = {
    val cp = a.asInstanceOf[UTF8String].toString.codePoints().toArray
    val len = cp.length
    val out = new java.util.ArrayList[AnyRef]()
    var p = 0
    while (p < len) {
      var m = 1
      var l = math.min(maxLen, len - p)
      while (l >= 2 && m == 1) {
        if (vocabSet.contains(new String(cp, p, l))) m = l
        l -= 1
      }
      out.add(UTF8String.fromString(new String(cp, p, m)))
      p += m
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val set = ctx.addReferenceObj("vocabSet", vocabSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a => {
      val cp = ctx.freshName("cp")
      val len = ctx.freshName("len")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val m = ctx.freshName("m")
      val l = ctx.freshName("l")
      s"""
         |int[] $cp = $a.toString().codePoints().toArray();
         |int $len = $cp.length;
         |java.util.ArrayList $out = new java.util.ArrayList();
         |int $p = 0;
         |while ($p < $len) {
         |  int $m = 1;
         |  int $l = Math.min($maxLen, $len - $p);
         |  while ($l >= 2 && $m == 1) {
         |    if ($set.contains(new String($cp, $p, $l))) $m = $l;
         |    $l--;
         |  }
         |  $out.add(org.apache.spark.unsafe.types.UTF8String.fromString(
         |    new String($cp, $p, $m)));
         |  $p += $m;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out.toArray());
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** O(1) token→weight lookup against a plan-constant model, missing
  * tokens scoring 0. `element_at` on a map *literal* is a linear scan
  * over the entries (ArrayBasedMapData has no index), so folding a
  * 100k-entry NB model over a token stream that way costs
  * |tokens|×|vocab| comparisons; this expression holds the model as a
  * shared `HashMap[UTF8String, Long]` via `addReferenceObj` — one hash
  * probe per token, generated code O(1) in model size.
  *
  * Keys/values ride the expression tree as parallel arrays (compact,
  * serializable); equality is content-based so CSE still fires.
  */
case class WeightLookup(child: Expression, keys: Array[String],
                        values: Array[Long]) extends UnaryExpression {
  require(keys.length == values.length,
    s"weight model arity mismatch: ${keys.length} keys vs ${values.length} values")

  override def equals(o: Any): Boolean = o match {
    case w: WeightLookup =>
      child == w.child && java.util.Arrays.equals(
        keys.asInstanceOf[Array[AnyRef]], w.keys.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(values, w.values)
    case _ => false
  }
  override def hashCode: Int =
    java.util.Objects.hash(child,
      Int.box(java.util.Arrays.hashCode(keys.asInstanceOf[Array[AnyRef]])),
      Int.box(java.util.Arrays.hashCode(values)))

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"weight_lookup requires a string input, got ${other.simpleString(10)}")
    }

  // UTF8String keys: tokens arrive as UTF8String, so lookups allocate
  // nothing. Shared across rows and codegen via addReferenceObj.
  @transient private lazy val table: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](
      math.max(16, keys.length * 2))
    var i = 0
    while (i < keys.length) {
      m.put(UTF8String.fromString(keys(i)), values(i)); i += 1
    }
    m
  }

  override def nullSafeEval(a: Any): Any = {
    val v = table.get(a.asInstanceOf[UTF8String])
    if (v == null) 0L else v.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("weightTable", table, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, a => {
      val v = ctx.freshName("v")
      s"""
         |java.lang.Long $v = (java.lang.Long) $tbl.get($a);
         |${ev.value} = ($v == null) ? 0L : $v.longValue();
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[WeightLookup]]'s double-valued sibling for ratio models (DSIR
  * importance ratios): O(1) hash probe against a plan-constant
  * token→double table, `default` for out-of-vocab tokens (a token unseen
  * in BOTH reference distributions smooths to (0+1)/(0+1) = 1).
  */
case class RatioLookup(child: Expression, keys: Array[String],
                       values: Array[Double], default: Double)
  extends UnaryExpression {
  require(keys.length == values.length,
    s"ratio model arity mismatch: ${keys.length} keys vs ${values.length} values")
  // the default is spliced into generated Java source, where NaN/Infinity
  // are not literals (janino would reject the code and silently fall back
  // to interpreted eval); NaN also breaks content-equality (NaN != NaN)
  require(java.lang.Double.isFinite(default),
    s"ratio default must be finite, got $default")

  override def equals(o: Any): Boolean = o match {
    case w: RatioLookup =>
      child == w.child && default == w.default && java.util.Arrays.equals(
        keys.asInstanceOf[Array[AnyRef]], w.keys.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(values, w.values)
    case _ => false
  }
  override def hashCode: Int =
    java.util.Objects.hash(child, Double.box(default),
      Int.box(java.util.Arrays.hashCode(keys.asInstanceOf[Array[AnyRef]])),
      Int.box(java.util.Arrays.hashCode(values)))

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ratio_lookup requires a string input, got ${other.simpleString(10)}")
    }

  @transient private lazy val table: java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](
      math.max(16, keys.length * 2))
    var i = 0
    while (i < keys.length) {
      m.put(UTF8String.fromString(keys(i)), values(i)); i += 1
    }
    m
  }

  override def nullSafeEval(a: Any): Any = {
    val v = table.get(a.asInstanceOf[UTF8String])
    if (v == null) default else v.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("ratioTable", table, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, a => {
      val v = ctx.freshName("v")
      s"""
         |java.lang.Double $v = (java.lang.Double) $tbl.get($a);
         |${ev.value} = ($v == null) ? $default : $v.doubleValue();
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode text canonicalization — the normalize-before-hashing step
  * every dedup/decontamination pipeline needs once the corpus stops
  * being ASCII: visually-identical strings (composed é vs e+◌́, ﬁ
  * ligature vs fi, fullwidth vs ASCII digits) must hash identically or
  * every exact/minhash dedup silently misses them.
  *
  * Modes (all public-knowledge Unicode algorithms via
  * `java.text.Normalizer`):
  *  - `nfc`  — canonical composition (the web-canonical form);
  *  - `nfkc` — + compatibility foldings (ligatures, width variants);
  *  - `fold` — NFKD → strip combining marks (`\p{Mn}`) → ROOT-locale
  *    lowercase: the aggressive dedup-canonicalization key.
  *
  * Runs inside whole-stage codegen via one virtual call per row on the
  * plan-constant expression object (`addReferenceObj`) — no UDF boxing,
  * no per-row mode dispatch (the mode resolves once at plan time).
  */
case class NormalizeText(child: Expression, mode: String)
  extends UnaryExpression {
  require(NormalizeText.Modes.contains(mode),
    s"normalize_text: unknown mode '$mode' (expected ${NormalizeText.Modes.mkString("/")})")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"normalize_text requires a string input, got ${other.simpleString(10)}")
    }

  /** Public so generated code can call it on the referenced object. */
  def normalize(s: UTF8String): UTF8String =
    UTF8String.fromString(NormalizeText.run(s.toString, mode))

  override def nullSafeEval(a: Any): Any =
    normalize(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("normExpr", this,
      classOf[NormalizeText].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.normalize($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {
  val Modes: Set[String] = Set("nfc", "nfkc", "fold")
  private val MnStrip = java.util.regex.Pattern.compile("\\p{Mn}+")
  def run(s: String, mode: String): String = mode match {
    case "nfc" =>
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    case "nfkc" =>
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)
    case "fold" =>
      MnStrip.matcher(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKD))
        .replaceAll("")
        .toLowerCase(java.util.Locale.ROOT)
  }
}

object TextFunctions {
  /** Unicode canonicalization of a string column; see [[NormalizeText]]. */
  def normalize_text(c: Column, mode: String): Column =
    toColumn(NormalizeText(toExpression(c), mode))

  /** Greedy longest-match subword segmentation of a string column against
    * a constant vocab (single-character fallback, lossless concat).
    */
  def subword_encode(word: Column, vocab: Array[String]): Column =
    toColumn(SubwordEncode(toExpression(word), vocab))

  /** Token weight under a constant model; 0 for out-of-vocab tokens.
    * Keys are sorted so equal models build equal expressions (CSE).
    */
  def weight_of(token: Column, weights: Map[String, Long]): Column = {
    val sorted = weights.toArray.sortBy(_._1)
    toColumn(WeightLookup(toExpression(token), sorted.map(_._1), sorted.map(_._2)))
  }

  /** Token importance ratio under a constant model; `default` for
    * out-of-vocab tokens.
    */
  def ratio_of(token: Column, ratios: Map[String, Double],
               default: Double = 1.0): Column = {
    val sorted = ratios.toArray.sortBy(_._1)
    toColumn(RatioLookup(toExpression(token), sorted.map(_._1),
      sorted.map(_._2), default))
  }
}
