package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** Native vector arithmetic for embedding columns.
  *
  * `zip_with` + `aggregate` higher-order functions express a dot product
  * correctly but allocate an intermediate array and evaluate a lambda per
  * element; over billions of candidate pairs that dominates runtime. This
  * expression generates a tight primitive loop (`getFloat`/`getDouble`
  * straight off columnar ArrayData, accumulate in double) inside
  * whole-stage codegen — no boxing, no allocation, no virtual calls.
  *
  * Accumulation order is ascending index, identical to the HOF
  * formulation and to a sequential SQL sum — results are bit-identical to
  * the oracle's.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"vec_dot expects array inputs, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean =
    left.nullable || right.nullable || elementsNullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _                                                  => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float>/array<double> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  // fixed per expression instance; lazy so the interpreted eval loop
  // doesn't re-derive it per element
  private lazy val elementsNullable: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, n) => n
      case _               => true
    })

  // A null element makes the whole dot product null (matching the
  // zip_with/aggregate formulation, where null propagates through the
  // lambda). Mismatched lengths are data corruption — fail loudly rather
  // than silently truncating.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_dot: mismatched vector lengths $n vs ${y.numElements()}")
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (elementsNullable && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      sum += xi * yi
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val nullGuard =
        if (elementsNullable)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "vec_dot: mismatched vector lengths " + $n + " vs " + $b.numElements());
         |}
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullGuard
         |  $sum += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Late-interaction (ColBERT-style) MaxSim between two TOKEN MATRICES,
  * each flattened row-major into one array column with a shared token
  * dimension `dim`: `score = Σ_{i ∈ query tokens} max_{j ∈ doc tokens}
  * (q_i · d_j)` — the member of this family where BOTH sides are data
  * (VecDotMatrix's matrix is a plan constant; a retrieval corpus's token
  * matrices are not).
  *
  * The HOF formulation (nested `transform`/`aggregate` over re-sliced
  * arrays) allocates a slice per (i, j) pair; this generates three tight
  * primitive loops with zero allocation inside whole-stage codegen.
  * Accumulation order: per-dot ascending element index, max over doc
  * tokens ascending j, sum over query tokens ascending i — on the
  * engine's `floor(x·10⁶)` fixed-point lattice every intermediate is an
  * exact integer-valued double, so any engine replays the score
  * bit-for-bit (the x_retrieval_maxsim oracle does, with
  * `list_dot_product` over the same slices).
  *
  * Empty token matrices and lengths not divisible by `dim` are data
  * corruption — fail loudly (max over an empty doc is undefined; a
  * truncated matrix would silently score garbage).
  */
case class VecMaxSim(left: Expression, right: Expression, dim: Int)
    extends BinaryExpression {

  require(dim > 0, s"vec_maxsim: dim must be positive, got $dim")

  private def elemGet(e: Expression): String = e.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case _                       => "getDouble"
  }

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _                                                  => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_maxsim requires array<float>/array<double> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val d = b.asInstanceOf[ArrayData]
    val nq = q.numElements()
    val nd = d.numElements()
    if (nq == 0 || nd == 0 || nq % dim != 0 || nd % dim != 0)
      throw new IllegalArgumentException(
        s"vec_maxsim: token matrices must be non-empty multiples of dim=$dim, " +
          s"got $nq and $nd")
    val qf = elemGet(left) == "getFloat"
    val df = elemGet(right) == "getFloat"
    var score = 0.0
    var qi = 0
    while (qi < nq) {
      var best = Double.NegativeInfinity
      var dj = 0
      while (dj < nd) {
        var dot = 0.0
        var e = 0
        while (e < dim) {
          val x = if (qf) q.getFloat(qi + e).toDouble else q.getDouble(qi + e)
          val y = if (df) d.getFloat(dj + e).toDouble else d.getDouble(dj + e)
          dot += x * y
          e += 1
        }
        if (dot > best) best = dot
        dj += dim
      }
      score += best
      qi += dim
    }
    score
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qGet = elemGet(left)
    val dGet = elemGet(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nq = ctx.freshName("nq")
      val nd = ctx.freshName("nd")
      val qi = ctx.freshName("qi")
      val dj = ctx.freshName("dj")
      val e = ctx.freshName("e")
      val dot = ctx.freshName("dot")
      val best = ctx.freshName("best")
      val score = ctx.freshName("score")
      s"""
         |int $nq = $a.numElements();
         |int $nd = $b.numElements();
         |if ($nq == 0 || $nd == 0 || $nq % $dim != 0 || $nd % $dim != 0) {
         |  throw new IllegalArgumentException(
         |    "vec_maxsim: token matrices must be non-empty multiples of dim=$dim, got "
         |      + $nq + " and " + $nd);
         |}
         |double $score = 0.0;
         |for (int $qi = 0; $qi < $nq; $qi += $dim) {
         |  double $best = Double.NEGATIVE_INFINITY;
         |  for (int $dj = 0; $dj < $nd; $dj += $dim) {
         |    double $dot = 0.0;
         |    for (int $e = 0; $e < $dim; $e++) {
         |      $dot += ((double) $a.$qGet($qi + $e)) * ((double) $b.$dGet($dj + $e));
         |    }
         |    if ($dot > $best) $best = $dot;
         |  }
         |  $score += $best;
         |}
         |${ev.value} = $score;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All dot products of one vector column against a CONSTANT row matrix, in
  * one pass: `out[t] = Σ_i v_i · matrix[t][i]` (optionally with the
  * engine's exact `floor(v_i · 10⁶)` quantization fused into the load).
  *
  * This exists because the expression-tree formulation — N independent
  * `VecDot(vec, lit(row_t))` calls in one projection — degrades
  * catastrophically: each dot re-derives its input column (no common
  * subexpression elimination across when/struct branches), so an
  * LSH-signature projection of 128 planes costs ~100 µs/row instead of
  * ~0.1 µs. Here the matrix is a plan constant held in `references` (no
  * giant generated literals), the vector elements are loaded ONCE into a
  * stack array, and the generated code is two tight primitive loops.
  * Accumulation order per row is ascending index — bit-identical to the
  * `VecDot`-per-row formulation and to the DuckDB oracle's
  * `list_dot_product`.
  */
case class VecDotMatrix(child: Expression, matrix: Array[Array[Double]],
                        quantize: Boolean,
                        rowStarts: Array[Int] = Array.emptyIntArray)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  // rowStarts: block-structured mode — row t multiplies vector elements
  // [rowStarts(t), rowStarts(t) + matrix(t).length). Empty = every row
  // spans the whole vector. This is what keeps PQ codebook scoring at
  // m·ks·sub multiplies instead of m·ks·dim against zero padding.
  require(matrix.nonEmpty, "vec_dot_matrix: matrix must be non-empty")
  require(rowStarts.isEmpty ||
      (rowStarts.length == matrix.length && rowStarts.forall(_ >= 0)),
    "vec_dot_matrix: rowStarts must be empty or one non-negative start per row")
  require(rowStarts.nonEmpty || matrix.forall(_.length == matrix(0).length),
    "vec_dot_matrix: full-width mode requires a rectangular matrix")

  // case-class equality on Array fields is reference identity, which would
  // make two identical expressions semantically unequal and defeat
  // subexpression elimination / canonicalization — compare contents
  override def equals(o: Any): Boolean = o match {
    case v: VecDotMatrix =>
      child == v.child && quantize == v.quantize &&
        java.util.Arrays.equals(rowStarts, v.rowStarts) &&
        matrix.length == v.matrix.length &&
        matrix.indices.forall(i => java.util.Arrays.equals(matrix(i), v.matrix(i)))
    case _ => false
  }
  override def hashCode: Int =
    java.util.Objects.hash(child, Boolean.box(quantize),
      Int.box(java.util.Arrays.hashCode(rowStarts)),
      Int.box(matrix.map(java.util.Arrays.hashCode).sum))

  private def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_dot_matrix requires an array<float>/array<double> input, " +
            s"got ${other.simpleString(10)}")
    }

  private lazy val elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _               => true
  }

  override def nullable: Boolean = child.nullable || elementsNullable

  // Exact coverage expected of every input vector: matrix width in
  // full-width mode, max(rowStarts(t) + row width) in block mode. A
  // SHORTER vector would read out of bounds; a LONGER one would silently
  // score only a prefix (a PQ input with dim > m·sub) — both are data
  // corruption, both fail loudly, in interpreted AND generated code.
  private lazy val requiredLen: Int =
    if (rowStarts.isEmpty) matrix(0).length
    else matrix.indices.map(t => rowStarts(t) + matrix(t).length).max

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n != requiredLen)
      throw new IllegalArgumentException(
        s"vec_dot_matrix: vector length $n vs matrix coverage $requiredLen")
    val isF = childIsFloat
    val vals = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (elementsNullable && v.isNullAt(i)) return null
      val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
      vals(i) = if (quantize) math.floor(x * 1000000.0) else x
      i += 1
    }
    val out = new Array[Double](matrix.length)
    var t = 0
    while (t < matrix.length) {
      val row = matrix(t)
      val off = if (rowStarts.isEmpty) 0 else rowStarts(t)
      var s = 0.0
      i = 0
      while (i < row.length) { s += vals(off + i) * row(i); i += 1 }
      out(t) = s
      t += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (childIsFloat) "getFloat" else "getDouble"
    val mat = ctx.addReferenceObj("matrix", matrix, "double[][]")
    val starts =
      if (rowStarts.isEmpty) ""
      else ctx.addReferenceObj("rowStarts", rowStarts, "int[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val vals = ctx.freshName("vals")
      val out = ctx.freshName("out")
      val row = ctx.freshName("row")
      val load =
        if (quantize) s"Math.floor(((double) $a.$get($i)) * 1000000.0)"
        else s"((double) $a.$get($i))"
      val nullGuard =
        if (elementsNullable)
          s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      val widthCheck =
        s"""if ($n != $requiredLen) {
           |  throw new IllegalArgumentException(
           |    "vec_dot_matrix: vector length " + $n + " vs matrix coverage $requiredLen");
           |}""".stripMargin
      val offExpr = if (rowStarts.isEmpty) "0" else s"$starts[$t]"
      s"""
         |int $n = $a.numElements();
         |$widthCheck
         |double[] $vals = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullGuard
         |  $vals[$i] = $load;
         |}
         |if (!${ev.isNull}) {
         |  double[] $out = new double[$mat.length];
         |  for (int $t = 0; $t < $mat.length; $t++) {
         |    double[] $row = $mat[$t];
         |    int $off = $offExpr;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $row.length; $i++) { $s += $vals[$off + $i] * $row[$i]; }
         |    $out[$t] = $s;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Spark's nan-safe double ordering (NaN greatest, NaN == NaN,
  * -0.0 == 0.0) as a shared kernel for the scored-selection expressions
  * below — their tie/NaN behavior must be bit-identical to the
  * `array_max`/`array_sort`-over-`(score, -id)`-structs formulations they
  * replace, or cell assignments silently drift from the DuckDB oracles.
  */
private[graft] object ScoreOrdering {
  def nanSafeCompare(x: Double, y: Double): Int =
    if (x < y) -1
    else if (x > y) 1
    else if (x == y) 0
    else if (java.lang.Double.isNaN(x)) { if (java.lang.Double.isNaN(y)) 0 else 1 }
    else -1

  /** The same comparator as generated Java, registered once per codegen
    * context. Returns the callable (possibly class-qualified) name.
    */
  def addJavaHelper(ctx: CodegenContext): String =
    ctx.addNewFunction("graftNanSafeCmp",
      s"""
         |private int graftNanSafeCmp(double x, double y) {
         |  if (x < y) return -1;
         |  if (x > y) return 1;
         |  if (x == y) return 0;
         |  return Double.isNaN(x) ? (Double.isNaN(y) ? 0 : 1) : -1;
         |}
       """.stripMargin)
}

/** Argmax id over scores derived from a dots array: `score[k] = dots[k] /
  * (norm · scales[k])`, returning `ids[argmax]` under Spark's nan-safe
  * double ordering with ties to the SMALLEST id — exactly the
  * `-array_max(array(struct(score, -id), …)).ncid` formulation it
  * replaces, but with generated code O(1) in the number of centroids.
  * The per-centroid literal-struct array grew a >64 KB janino method at
  * nlist=64 (whole-stage codegen failed and the hot stage silently ran
  * interpreted — VERDICT round 4 #1), and nlist grows with the corpus;
  * here the centroid norms/ids live in `references` and the generated
  * code is one tight loop regardless of nlist.
  */
case class VecArgMaxId(left: Expression, right: Expression,
                       scales: Array[Double], ids: Array[Long])
  extends BinaryExpression {

  require(scales.nonEmpty && scales.length == ids.length,
    "vec_arg_max_id: scales and ids must be non-empty and the same length")

  // content-based equality: Array fields compare by reference in case
  // classes, which would defeat subexpression elimination (see VecDotMatrix)
  override def equals(o: Any): Boolean = o match {
    case v: VecArgMaxId =>
      left == v.left && right == v.right &&
        java.util.Arrays.equals(scales, v.scales) &&
        java.util.Arrays.equals(ids, v.ids)
    case _ => false
  }
  override def hashCode: Int =
    java.util.Objects.hash(left, right,
      Int.box(java.util.Arrays.hashCode(scales)),
      Int.box(java.util.Arrays.hashCode(ids)))

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_arg_max_id requires (array<double>, double), got " +
            s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  override def nullSafeEval(dotsAny: Any, normAny: Any): Any = {
    val d = dotsAny.asInstanceOf[ArrayData]
    val n = d.numElements()
    if (n != scales.length)
      throw new IllegalArgumentException(
        s"vec_arg_max_id: dots length $n vs ${scales.length} centroids")
    val nm = normAny.asInstanceOf[Double]
    var best = 0
    var bestS = d.getDouble(0) / (nm * scales(0))
    var k = 1
    while (k < n) {
      val s = d.getDouble(k) / (nm * scales(k))
      val c = ScoreOrdering.nanSafeCompare(s, bestS)
      if (c > 0 || (c == 0 && ids(k) < ids(best))) { best = k; bestS = s }
      k += 1
    }
    ids(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sc = ctx.addReferenceObj("scales", scales, "double[]")
    val id = ctx.addReferenceObj("ids", ids, "long[]")
    val cmp = ScoreOrdering.addJavaHelper(ctx)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val best = ctx.freshName("best")
      val bestS = ctx.freshName("bestS")
      s"""
         |int $n = $a.numElements();
         |if ($n != $sc.length) {
         |  throw new IllegalArgumentException(
         |    "vec_arg_max_id: dots length " + $n + " vs " + $sc.length + " centroids");
         |}
         |int $best = 0;
         |double $bestS = $a.getDouble(0) / ($b * $sc[0]);
         |for (int $k = 1; $k < $n; $k++) {
         |  double $s = $a.getDouble($k) / ($b * $sc[$k]);
         |  int $c = $cmp($s, $bestS);
         |  if ($c > 0 || ($c == 0 && $id[$k] < $id[$best])) { $best = $k; $bestS = $s; }
         |}
         |${ev.value} = $id[$best];
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Ordered top-N ids by the same derived score: `score[k] = dots[k] /
  * (norm · scales[k])`, output the ids of the N best entries, best first
  * (nan-safe score descending, ties to the smallest id) — exactly the
  * `slice(reverse(array_sort(array(struct(score, -id), …))), 1, N)`
  * probe-selection formulation it replaces, loop-shaped for the same
  * 64 KB-limit reason as [[VecArgMaxId]]. Output length is
  * `min(N, dots.length)`.
  */
case class VecTopIds(left: Expression, right: Expression,
                     scales: Array[Double], ids: Array[Long], topN: Int)
  extends BinaryExpression {

  require(scales.nonEmpty && scales.length == ids.length,
    "vec_top_ids: scales and ids must be non-empty and the same length")
  require(topN >= 1, s"vec_top_ids: topN must be >= 1, got $topN")

  override def equals(o: Any): Boolean = o match {
    case v: VecTopIds =>
      left == v.left && right == v.right && topN == v.topN &&
        java.util.Arrays.equals(scales, v.scales) &&
        java.util.Arrays.equals(ids, v.ids)
    case _ => false
  }
  override def hashCode: Int =
    java.util.Objects.hash(left, right, Int.box(topN),
      Int.box(java.util.Arrays.hashCode(scales)),
      Int.box(java.util.Arrays.hashCode(ids)))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_top_ids requires (array<double>, double), got " +
            s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  override def nullSafeEval(dotsAny: Any, normAny: Any): Any = {
    val d = dotsAny.asInstanceOf[ArrayData]
    val n = d.numElements()
    if (n != scales.length)
      throw new IllegalArgumentException(
        s"vec_top_ids: dots length $n vs ${scales.length} centroids")
    val nm = normAny.asInstanceOf[Double]
    val cap = math.min(topN, n)
    val bs = new Array[Double](cap)
    val bi = new Array[Long](cap)
    var filled = 0
    var k = 0
    while (k < n) {
      val s = d.getDouble(k) / (nm * scales(k))
      val idk = ids(k)
      // insertion position: after every entry strictly better than (s, id)
      var pos = filled
      while (pos > 0 && {
        val c = ScoreOrdering.nanSafeCompare(bs(pos - 1), s)
        c < 0 || (c == 0 && bi(pos - 1) > idk)
      }) pos -= 1
      if (pos < cap) {
        val end = math.min(filled, cap - 1)
        var m = end
        while (m > pos) { bs(m) = bs(m - 1); bi(m) = bi(m - 1); m -= 1 }
        bs(pos) = s; bi(pos) = idk
        if (filled < cap) filled += 1
      }
      k += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(bi, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sc = ctx.addReferenceObj("scales", scales, "double[]")
    val idr = ctx.addReferenceObj("ids", ids, "long[]")
    val cmp = ScoreOrdering.addJavaHelper(ctx)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val cap = ctx.freshName("cap")
      val bs = ctx.freshName("bs")
      val bi = ctx.freshName("bi")
      val filled = ctx.freshName("filled")
      val pos = ctx.freshName("pos")
      val m = ctx.freshName("m")
      val idk = ctx.freshName("idk")
      s"""
         |int $n = $a.numElements();
         |if ($n != $sc.length) {
         |  throw new IllegalArgumentException(
         |    "vec_top_ids: dots length " + $n + " vs " + $sc.length + " centroids");
         |}
         |int $cap = Math.min($topN, $n);
         |double[] $bs = new double[$cap];
         |long[] $bi = new long[$cap];
         |int $filled = 0;
         |for (int $k = 0; $k < $n; $k++) {
         |  double $s = $a.getDouble($k) / ($b * $sc[$k]);
         |  long $idk = $idr[$k];
         |  int $pos = $filled;
         |  while ($pos > 0) {
         |    int $c = $cmp($bs[$pos - 1], $s);
         |    if ($c < 0 || ($c == 0 && $bi[$pos - 1] > $idk)) { $pos--; } else break;
         |  }
         |  if ($pos < $cap) {
         |    for (int $m = Math.min($filled, $cap - 1); $m > $pos; $m--) {
         |      $bs[$m] = $bs[$m - 1]; $bi[$m] = $bi[$m - 1];
         |    }
         |    $bs[$pos] = $s; $bi[$pos] = $idk;
         |    if ($filled < $cap) $filled++;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  java.util.Arrays.copyOf($bi, $filled));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Per-block argmax over affine-transformed dots — the PQ code assignment
  * kernel. The dots array is `blocks` consecutive blocks of
  * `offsets.length / blocks` entries; within block `b`, entry `j` scores
  * `dots[i]·2 − offsets[i]` (i = b·per + j, the `2·x·c − ‖c‖²` L2-argmin
  * identity with `offsets` the squared codebook norms) and the output is
  * the winning IN-BLOCK index per block (ties to the smallest j) —
  * `array<int>` = the PQ code word. Replaces `m × ks` literal structs +
  * `m` array_max calls with one loop O(1) in `m·ks` generated code.
  */
case class VecBlockArgMax(child: Expression, offsets: Array[Double], blocks: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(blocks >= 1 && offsets.nonEmpty && offsets.length % blocks == 0,
    s"vec_block_arg_max: offsets length ${offsets.length} must be a " +
      s"positive multiple of blocks=$blocks")

  override def equals(o: Any): Boolean = o match {
    case v: VecBlockArgMax =>
      child == v.child && blocks == v.blocks &&
        java.util.Arrays.equals(offsets, v.offsets)
    case _ => false
  }
  override def hashCode: Int =
    java.util.Objects.hash(child, Int.box(blocks),
      Int.box(java.util.Arrays.hashCode(offsets)))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_block_arg_max requires array<double>, got ${other.simpleString(10)}")
    }

  private val per = offsets.length / blocks

  override def nullSafeEval(dotsAny: Any): Any = {
    val d = dotsAny.asInstanceOf[ArrayData]
    val n = d.numElements()
    if (n != offsets.length)
      throw new IllegalArgumentException(
        s"vec_block_arg_max: dots length $n vs ${offsets.length} entries")
    val out = new Array[Int](blocks)
    var b = 0
    while (b < blocks) {
      val off = b * per
      var best = 0
      var bestS = d.getDouble(off) * 2 - offsets(off)
      var j = 1
      while (j < per) {
        val s = d.getDouble(off + j) * 2 - offsets(off + j)
        if (ScoreOrdering.nanSafeCompare(s, bestS) > 0) { best = j; bestS = s }
        j += 1
      }
      out(b) = best
      b += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val offs = ctx.addReferenceObj("offsets", offsets, "double[]")
    val cmp = ScoreOrdering.addJavaHelper(ctx)
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val best = ctx.freshName("best")
      val bestS = ctx.freshName("bestS")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |if ($n != $offs.length) {
         |  throw new IllegalArgumentException(
         |    "vec_block_arg_max: dots length " + $n + " vs " + $offs.length + " entries");
         |}
         |int[] $out = new int[$blocks];
         |for (int $b = 0; $b < $blocks; $b++) {
         |  int $off = $b * $per;
         |  int $best = 0;
         |  double $bestS = $a.getDouble($off) * 2 - $offs[$off];
         |  for (int $j = 1; $j < $per; $j++) {
         |    double $s = $a.getDouble($off + $j) * 2 - $offs[$off + $j];
         |    if ($cmp($s, $bestS) > 0) { $best = $j; $bestS = $s; }
         |  }
         |  $out[$b] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cell-local kNN scoring kernel: given one IVF cell's member list
  * `ms: array<struct<id, vec, norm>>` and the list of queries probing it
  * `qs: array<struct<qid, qvec, qnorm>>`, emit each query's top-k members
  * by cosine as `array<struct<qid, id, cos>>` (self-pairs skipped; same
  * nan-safe (cos desc, id asc) order as the global rank window, so a
  * global top-k over the union of per-cell top-ks is exact).
  *
  * This is an Expression rather than a typed flatMap deliberately: the
  * co-grouped cell rows stay in Tungsten format end to end — member and
  * query vectors are read straight off `ArrayData` (bulk primitive
  * copies), where the Dataset-API formulation paid a DeserializeToObject
  * pass materializing every struct as a `Row` and every vector as a
  * boxed `Seq` (~10 s of the sf1 kNN probe, vs ~2 s of actual scoring).
  * Evaluation is one compiled Scala kernel per CELL row (thousands of
  * dot products per call), so interpreted-eval dispatch overhead is
  * irrelevant — CodegenFallback keeps the surrounding stage compiled.
  * Element loads widen float→double exactly like [[VecDot]].
  */
case class CellTopK(left: Expression, right: Expression, k: Int)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k >= 1, s"cell_top_k: k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("qid", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))), containsNull = false)

  private def sideCheck(dt: DataType, what: String):
      Option[String] = dt match {
    case ArrayType(s: StructType, _) if s.fields.length == 3 =>
      val idOk = s.fields(0).dataType == LongType
      val vecOk = s.fields(1).dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
        case _                                                  => false
      }
      val nOk = s.fields(2).dataType == DoubleType
      if (idOk && vecOk && nOk) None
      else Some(s"$what must be array<struct<long, array<float|double>, double>>, " +
        s"got ${dt.simpleString(10)}")
    case _ => Some(s"$what must be an array of 3-field structs, got ${dt.simpleString(10)}")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    sideCheck(left.dataType, "cell_top_k members").orElse(
        sideCheck(right.dataType, "cell_top_k queries")) match {
      case None => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case Some(m) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(m)
    }

  private def isFloatSide(dt: DataType): Boolean = dt match {
    case ArrayType(s: StructType, _) => s.fields(1).dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    case _ => false
  }
  private lazy val mFloat = isFloatSide(left.dataType)
  private lazy val qFloat = isFloatSide(right.dataType)

  private def vecOf(r: org.apache.spark.sql.catalyst.InternalRow,
                    isFloat: Boolean): Array[Double] =
    if (isFloat) {
      val f = r.getArray(1).toFloatArray()
      val d = new Array[Double](f.length)
      var j = 0
      while (j < f.length) { d(j) = f(j).toDouble; j += 1 }
      d
    } else r.getArray(1).toDoubleArray()

  override def nullSafeEval(msAny: Any, qsAny: Any): Any = {
    val ms = msAny.asInstanceOf[ArrayData]
    val qs = qsAny.asInstanceOf[ArrayData]
    val nm = ms.numElements()
    val mIds = new Array[Long](nm)
    val mVecs = new Array[Array[Double]](nm)
    val mNorms = new Array[Double](nm)
    var i = 0
    while (i < nm) {
      val r = ms.getStruct(i, 3)
      mIds(i) = r.getLong(0)
      mVecs(i) = vecOf(r, mFloat)
      mNorms(i) = r.getDouble(2)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    val nq = qs.numElements()
    val bs = new Array[Double](k)
    val bi = new Array[Long](k)
    var qi = 0
    while (qi < nq) {
      val qr = qs.getStruct(qi, 3)
      val qid = qr.getLong(0)
      val qv = vecOf(qr, qFloat)
      val qn = qr.getDouble(2)
      var filled = 0
      i = 0
      while (i < nm) {
        if (mIds(i) != qid) {
          val mv = mVecs(i)
          if (mv.length != qv.length)
            throw new IllegalArgumentException(
              s"cell_top_k: mismatched vector lengths ${mv.length} vs ${qv.length}")
          var d = 0.0
          var j = 0
          while (j < mv.length) { d += mv(j) * qv(j); j += 1 }
          val cos = d / (mNorms(i) * qn)
          val idk = mIds(i)
          var pos = filled
          while (pos > 0 && {
            val c = ScoreOrdering.nanSafeCompare(bs(pos - 1), cos)
            c < 0 || (c == 0 && bi(pos - 1) > idk)
          }) pos -= 1
          if (pos < k) {
            val end = math.min(filled, k - 1)
            var m2 = end
            while (m2 > pos) { bs(m2) = bs(m2 - 1); bi(m2) = bi(m2 - 1); m2 -= 1 }
            bs(pos) = cos; bi(pos) = idk
            if (filled < k) filled += 1
          }
        }
        i += 1
      }
      var r2 = 0
      while (r2 < filled) {
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](qid, bi(r2), bs(r2)))
        r2 += 1
      }
      qi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Dot product of two float/double array columns, accumulated in double. */
  def vec_dot(a: Column, b: Column): Column =
    toColumn(VecDot(toExpression(a), toExpression(b)))

  /** L2 norm of a float/double array column. */
  def vec_norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(vec_dot(a, a))

  /** All dots of a vector column against a constant row matrix (one tight
    * codegen pass). `quantize` fuses the engine's exact `floor(x·10⁶)`
    * integer quantization into the element load. `rowStarts` enables
    * block-structured rows: row t multiplies only the vector slice
    * starting at `rowStarts(t)` of the row's own width (PQ subspaces).
    */
  def vec_dot_matrix(v: Column, matrix: Array[Array[Double]],
                     quantize: Boolean = false,
                     rowStarts: Array[Int] = Array.emptyIntArray): Column =
    toColumn(VecDotMatrix(toExpression(v), matrix, quantize, rowStarts))

  /** Id of the best-scoring entry: `score[k] = dots[k] / (norm ·
    * scales[k])`, nan-safe descending, ties to the smallest id.
    */
  def vec_arg_max_id(dots: Column, norm: Column, scales: Array[Double],
                     ids: Array[Long]): Column =
    toColumn(VecArgMaxId(toExpression(dots), toExpression(norm), scales, ids))

  /** Ids of the `topN` best-scoring entries, best first (same ordering as
    * [[vec_arg_max_id]]).
    */
  def vec_top_ids(dots: Column, norm: Column, scales: Array[Double],
                  ids: Array[Long], topN: Int): Column =
    toColumn(VecTopIds(toExpression(dots), toExpression(norm), scales, ids, topN))

  /** Per-block argmax index over `dots[i]·2 − offsets[i]` (PQ code
    * assignment); output `array<int>` of length `blocks`.
    */
  def vec_block_arg_max(dots: Column, offsets: Array[Double], blocks: Int): Column =
    toColumn(VecBlockArgMax(toExpression(dots), offsets, blocks))

  /** Cell-local kNN top-k kernel over co-grouped member/query lists. */
  def cell_top_k(ms: Column, qs: Column, k: Int): Column =
    toColumn(CellTopK(toExpression(ms), toExpression(qs), k))

  /** Late-interaction MaxSim of two row-major flattened token matrices
    * with shared token dimension `dim`:
    * `Σ_{query token} max_{doc token} dot`.
    */
  def vec_maxsim(q: Column, d: Column, dim: Int): Column =
    toColumn(VecMaxSim(toExpression(q), toExpression(d), dim))
}
