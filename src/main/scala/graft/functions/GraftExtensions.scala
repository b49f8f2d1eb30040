package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._

/** SQL-surface registration: the engine's custom functions, usable from
  * `spark.sql(...)` as well as the Column API.
  *
  *  - `vec_dot(a, b)`     — native codegen'd dot product ([[VecDot]])
  *  - `vec_cosine(a, b)`  — cosine similarity built on vec_dot
  *  - `service_name(s)`   — the reference's service-name normalization
  *                          (`/root/reference/src/agol_pandas.py:121-157`)
  *
  * Two attachment paths: `GraftFunctions.register(spark)` for an existing
  * session, or `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * for cluster-wide injection.
  */
object GraftFunctions {

  /** cosine = dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))) as a raw
    * Catalyst tree (function builders must return resolvable expressions,
    * not Column wrappers).
    */
  private def cosineExpr(a: Expression, b: Expression): Expression =
    Divide(VecDot(a, b),
      Multiply(Sqrt(VecDot(a, a)), Sqrt(VecDot(b, b))))

  /** The reference's service-name normalization as a Catalyst tree —
    * identical semantics to [[graft.core.ServiceName.normalizeCol]].
    */
  private def serviceNameExpr(e: Expression): Expression = {
    val t = StringTrim(e)
    val prefixed = If(
      RLike(Substring(t, Literal(1), Literal(1)), Literal("^[0-9]$")),
      Concat(Seq(Literal("_"), t)), t)
    val collapsed = RegExpReplace(
      RegExpReplace(prefixed, Literal("[^\\w]"), Literal("_")),
      Literal("_+"), Literal("_"))
    Substring(Lower(collapsed), Literal(1), Literal(graft.core.ServiceName.MaxLength))
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> { exprs =>
      require(exprs.length == 2, "vec_dot(a, b) takes 2 arguments")
      VecDot(exprs(0), exprs(1))
    },
    "vec_cosine" -> { exprs =>
      require(exprs.length == 2, "vec_cosine(a, b) takes 2 arguments")
      cosineExpr(exprs(0), exprs(1))
    },
    "service_name" -> { exprs =>
      require(exprs.length == 1, "service_name(s) takes 1 argument")
      serviceNameExpr(exprs.head)
    })

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, b) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[VecDot].getName, name), b))
    }
}
