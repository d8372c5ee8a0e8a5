package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expression for [[graft.det.Sig.sig5]]'s
  * 5-significant-digit rounding: one child evaluation, one static
  * call.
  *
  * Why (SURVEY.md §7.5 tier (b)): the composed Column form references
  * its input ~6 times (`abs(c)` twice for the exponent, `c/m`, the
  * null/zero guards), and Catalyst clones the ENTIRE child tree into
  * each reference. When the child is itself expensive and the
  * expression lands in a non-equi join condition via filter pushdown
  * — the brute-force cosine scorer's `sig5(cosine(array_dot(...)))`
  * inside a BroadcastNestedLoopJoin — every scored pair paid ~12
  * 64-element dot products (6 in the pushed condition + 6 in the
  * projection). This expression binds the child value ONCE into a
  * local double; the closed-form (exponent, exact positive power,
  * HALF_UP round at 5 decimals of the mantissa) runs as a single
  * JIT-compiled static call, inside whole-stage codegen.
  *
  * Semantics are bit-identical to the composed form (same Math.log10/
  * floor/pow ops, same BigDecimal.valueOf HALF_UP round Spark's own
  * `round(_, 5)` codegen performs, same NaN/±Inf → NaN collapse the
  * composed tree produced through its long-cast exponent), verified
  * by a sweep property test and by the full DuckDB oracle gate, whose
  * SQL side is unchanged. */
case class Sig5(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sig5"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sig5 needs a double, got ${other.catalogString}")
    }

  override def nullSafeEval(x: Any): Any =
    java.lang.Double.valueOf(
      graft.det.Sig.sig5Col(x.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.det.Sig.sig5Col($c)")

  override protected def withNewChildInternal(newChild: Expression): Sig5 =
    copy(newChild)
}

object Sig5 {
  import org.apache.spark.sql.graftbridge.GraftSql

  def sig5_expr(c: Column): Column =
    GraftSql.column(Sig5(GraftSql.expression(c)))
}
