package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: minimum base-31 polynomial hash over
  * all `gram`-byte windows of a string — the Karp–Rabin document
  * fingerprint as ONE codegen'd O(len) loop with a true rolling
  * update (drop the leading term, shift, add the trailing byte).
  *
  * Why a custom Expression (SURVEY.md §7.5 tier (b)): the same
  * semantics composed from built-ins needs `split('')` +
  * `transform(ascii)` + `transform(sequence(...), 8 multiplies)` +
  * `array_min` — materializing two arrays per row and evaluating
  * higher-order lambdas interpreted. This operator does zero
  * allocation per row and runs inside whole-stage codegen.
  *
  * Value-compatible with the composed form for ASCII text (operates
  * on bytes; all test corpora are ASCII). No overflow: the hash is
  * bounded by 255·31⁷·8 < 2⁶³ and the rolling update is exact in
  * Long arithmetic.
  *
  * Returns null for strings shorter than `gram`.
  */
case class RollingMinHash(child: Expression, gram: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"rolling_min_hash needs a string input, " +
          s"got ${child.dataType.catalogString}")
  }
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_min_hash"

  private val topPow: Long = {
    var p = 1L
    (1 until gram).foreach(_ => p *= 31L)
    p // 31^(gram-1)
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.length < gram) null
    else {
      var h = 0L
      var i = 0
      while (i < gram) { h = h * 31L + (bytes(i) & 0xFF); i += 1 }
      var min = h
      while (i < bytes.length) {
        h = (h - (bytes(i - gram) & 0xFF) * topPow) * 31L +
          (bytes(i) & 0xFF)
        if (h < min) min = h
        i += 1
      }
      java.lang.Long.valueOf(min)
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, str => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val mn = ctx.freshName("mn")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $str.getBytes();
         |if ($bytes.length < $gram) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $h = 0L;
         |  int $i = 0;
         |  for (; $i < $gram; $i++) {
         |    $h = $h * 31L + ($bytes[$i] & 0xFF);
         |  }
         |  long $mn = $h;
         |  for (; $i < $bytes.length; $i++) {
         |    $h = ($h - ($bytes[$i - $gram] & 0xFF) * ${topPow}L) * 31L
         |      + ($bytes[$i] & 0xFF);
         |    if ($h < $mn) $mn = $h;
         |  }
         |  ${ev.value} = $mn;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): RollingMinHash = copy(child = newChild)
}

object RollingMinHash {
  import org.apache.spark.sql.graftbridge.GraftSql

  /** Column API. */
  def rolling_min_hash(c: Column, gram: Int = 8): Column =
    GraftSql.column(RollingMinHash(GraftSql.expression(c), gram))

  /** SQL registration: `SELECT rolling_min_hash(text, 8)`. */
  def register(spark: SparkSession): Unit =
    GraftSql.registerFunction(spark, "rolling_min_hash",
      exprs => RollingMinHash(exprs.head,
        exprs.lift(1).map(_.eval(null).asInstanceOf[Number].intValue())
          .getOrElse(8)))
}
