package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: nearest-sub-centroid argmin for the PQ
  * family — returns struct(score, cid) for the centroid minimizing
  * the sig5-rounded |c|² − 2·x·c (+ |x|² when `includeNorm`), cid
  * ascending tie-break, over a DRIVER-HELD codebook.
  *
  * Why (SURVEY.md §7.5 tier (b)): the composed form builds k struct
  * expressions per subspace and takes array_min/array_sort over them
  * — at k = 256 sub-centroids that is 2048 Expression evaluations
  * AND 2048 struct allocations per row (billions at 2M vectors;
  * measured 894 s for the trained ADC smoke vs 27 s at k = 16). This
  * expression is ONE eval per (row, subspace): a k·dsub
  * multiply-add loop over primitive arrays, no allocation but the
  * 2-field result.
  *
  * Determinism contract — bit-identical to the composed form it
  * replaces: cn2 is the index-order sum of squares (the Scala
  * `.map(t*t).sum` fold), the dot product accumulates in index order
  * ([[ArrayDot]]'s loop), the raw score associates as
  * ((cn2 − 2·dot) + xn2), rounding is [[graft.det.Sig.sig5Col]] (the
  * scalar twin of the native Sig5 column expression), and the
  * comparison is `java.lang.Double.compare` (NaN greatest — the
  * array_min total order) with first-wins ties over the cid-ASCENDING
  * entry order = smallest cid.
  *
  * `cids`/`cents` ride the serialized expression to executors like
  * any literal (O(k·dsub) doubles — broadcast-sized codebook state,
  * the PQ scale contract). */
case class PqArgMin(child: Expression, cids: Array[Long],
    cents: Array[Array[Double]], includeNorm: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("cid", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pq_argmin"

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    elemType match {
      case Some(_) if cents.nonEmpty && cents.length == cids.length =>
        TypeCheckResult.TypeCheckSuccess
      case Some(_) => TypeCheckResult.TypeCheckFailure(
        "pq_argmin needs a non-empty codebook with matching cids")
      case None => TypeCheckResult.TypeCheckFailure(
        s"pq_argmin needs a float/double array, got " +
          s"${child.dataType.catalogString}")
    }

  // index-order sum of squares — the same fold as cSlice.map(t*t).sum
  @transient private lazy val cn2s: Array[Double] =
    cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }
  @transient private lazy val isFloat = elemType.contains(FloatType)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      x(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    var xn2 = 0.0
    if (includeNorm) {
      var j = 0
      while (j < n) { xn2 += x(j) * x(j); j += 1 }
    }
    var bestScore = 0.0
    var bestCid = 0L
    var k = 0
    while (k < cents.length) {
      val c = cents(k)
      var dot = 0.0
      var d = 0
      val m = math.min(n, c.length)
      while (d < m) { dot += x(d) * c(d); d += 1 }
      val base = cn2s(k) - 2.0 * dot
      val score = graft.det.Sig.sig5Col(
        if (includeNorm) base + xn2 else base)
      if (k == 0 || java.lang.Double.compare(score, bestScore) < 0) {
        bestScore = score
        bestCid = cids(k)
      }
      k += 1
    }
    InternalRow(bestScore, bestCid)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : PqArgMin = copy(child = newChild)
}

object PqArgMin {
  import org.apache.spark.sql.graftbridge.GraftSql

  /** struct(score, cid) of the nearest codebook entry; `entries`
    * MUST be cid-ascending (the tie-break order). */
  def pq_argmin(x: Column, entries: Array[(Long, Array[Double])],
      includeNorm: Boolean): Column =
    GraftSql.column(PqArgMin(GraftSql.expression(x),
      entries.map(_._1), entries.map(_._2), includeNorm))
}
