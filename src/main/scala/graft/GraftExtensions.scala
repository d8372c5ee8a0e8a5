package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{ArrayDot, RollingMinHash}

/** Production registration of graft's native SQL functions through
  * the public extension point:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  * }}}
  *
  * After installation `rolling_min_hash(text[, gram])` and
  * `array_dot(a, b)` resolve in plain SQL on every session built from
  * that context — the supported path for cluster deployments, vs the
  * per-session temp registration in the companion objects. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("rolling_min_hash"),
      new ExpressionInfo(classOf[RollingMinHash].getName,
        "rolling_min_hash"),
      (exprs: Seq[Expression]) =>
        RollingMinHash(exprs.head,
          exprs.lift(1)
            .map(_.eval(null).asInstanceOf[Number].intValue())
            .getOrElse(8))))
    ext.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (exprs: Seq[Expression]) => ArrayDot(exprs(0), exprs(1))))
  }
}
