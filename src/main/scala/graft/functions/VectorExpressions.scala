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

object VectorFunctions {
  /** Dot product of two float/double array columns, accumulated in double. */
  def vec_dot(a: Column, b: Column): Column =
    toColumn(VecDot(toExpression(a), toExpression(b)))

  /** L2 norm of a float/double array column. */
  def vec_norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(vec_dot(a, a))
}
