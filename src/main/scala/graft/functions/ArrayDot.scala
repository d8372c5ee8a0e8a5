package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: Σ aᵢ·bᵢ over two numeric arrays as one
  * codegen'd loop in doubles.
  *
  * Why (SURVEY.md §7.5 tier (b)): the composed form
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` evaluates two
  * higher-order lambdas interpreted per element and materializes the
  * zipped array — observed 47 s for the 2M-pair × 64-dim
  * `dedup_embed` self-join at sf0.1. This loop allocates nothing and
  * runs inside whole-stage codegen. Accumulation order (index order,
  * left fold) is identical to the composed form and to the oracle's
  * per-index SUM, so values agree to the last ulp class sig5 absorbs.
  *
  * Null semantics mirror zip_with/aggregate: null array or mismatched
  * lengths (zip_with would null-pad) or a null element → null.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_dot"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(et @ (FloatType | DoubleType | IntegerType | LongType |
        ShortType | ByteType), _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"array_dot needs two numeric arrays, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  private def get(arr: ArrayData, i: Int, et: DataType): Double =
    et match {
      case FloatType => arr.getFloat(i).toDouble
      case DoubleType => arr.getDouble(i)
      case IntegerType => arr.getInt(i).toDouble
      case LongType => arr.getLong(i).toDouble
      case ShortType => arr.getShort(i).toDouble
      case ByteType => arr.getByte(i).toDouble
      case _ => throw new IllegalStateException(et.toString)
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) null
    else {
      val (etA, etB) = (elemType(left).get, elemType(right).get)
      var s = 0.0
      var i = 0
      val n = a.numElements()
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        s += get(a, i, etA) * get(b, i, etB)
        i += 1
      }
      java.lang.Double.valueOf(s)
    }
  }

  private def genGet(et: DataType, arr: String, i: String): String =
    et match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case LongType => s"(double) $arr.getLong($i)"
      case ShortType => s"(double) $arr.getShort($i)"
      case ByteType => s"(double) $arr.getByte($i)"
      case _ => throw new IllegalStateException(et.toString)
    }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val etA = elemType(left).get
    val etB = elemType(right).get
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $s += ${genGet(etA, a, i)} * ${genGet(etB, b, i)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArrayDot = copy(newLeft, newRight)
}

object ArrayDot {
  import org.apache.spark.sql.graftbridge.GraftSql

  def array_dot(a: Column, b: Column): Column =
    GraftSql.column(ArrayDot(GraftSql.expression(a),
      GraftSql.expression(b)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftSql.registerFunction(spark, "array_dot",
      exprs => ArrayDot(exprs(0), exprs(1)))
}
