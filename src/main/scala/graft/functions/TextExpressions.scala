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
  private lazy val maxLen: Int =
    if (vocab.isEmpty) 1 else math.max(1, vocab.map(_.length).max)

  override def nullSafeEval(a: Any): Any = {
    val w = a.asInstanceOf[UTF8String].toString
    val len = w.length
    val out = new java.util.ArrayList[AnyRef]()
    var p = 0
    while (p < len) {
      var m = 1
      var l = math.min(maxLen, len - p)
      while (l >= 2 && m == 1) {
        if (vocabSet.contains(w.substring(p, p + l))) m = l
        l -= 1
      }
      out.add(UTF8String.fromString(w.substring(p, p + m)))
      p += m
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val set = ctx.addReferenceObj("vocabSet", vocabSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a => {
      val w = ctx.freshName("w")
      val len = ctx.freshName("len")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val m = ctx.freshName("m")
      val l = ctx.freshName("l")
      s"""
         |String $w = $a.toString();
         |int $len = $w.length();
         |java.util.ArrayList $out = new java.util.ArrayList();
         |int $p = 0;
         |while ($p < $len) {
         |  int $m = 1;
         |  int $l = Math.min($maxLen, $len - $p);
         |  while ($l >= 2 && $m == 1) {
         |    if ($set.contains($w.substring($p, $p + $l))) $m = $l;
         |    $l--;
         |  }
         |  $out.add(org.apache.spark.unsafe.types.UTF8String.fromString(
         |    $w.substring($p, $p + $m)));
         |  $p += $m;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out.toArray());
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  /** Greedy longest-match subword segmentation of a string column against
    * a constant vocab (single-character fallback, lossless concat).
    */
  def subword_encode(word: Column, vocab: Array[String]): Column =
    toColumn(SubwordEncode(toExpression(word), vocab))
}
