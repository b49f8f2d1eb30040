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

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (rowStarts.isEmpty && n != matrix(0).length)
      throw new IllegalArgumentException(
        s"vec_dot_matrix: vector length $n vs matrix width ${matrix(0).length}")
    if (rowStarts.nonEmpty &&
        matrix.indices.exists(t => rowStarts(t) + matrix(t).length > n))
      throw new IllegalArgumentException(
        s"vec_dot_matrix: a block row exceeds vector length $n")
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
        if (rowStarts.isEmpty)
          s"""if ($n != $mat[0].length) {
             |  throw new IllegalArgumentException(
             |    "vec_dot_matrix: vector length " + $n + " vs matrix width " + $mat[0].length);
             |}""".stripMargin
        else ""
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
}
