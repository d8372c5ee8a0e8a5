package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bottom-k sketch: the k smallest DISTINCT xxhash64 values of a
  * column — a typed `Aggregator` (Spark's user-facing UDAF surface,
  * SURVEY.md §2.2 "UDF/UDAF/UDTF").
  *
  * Unlike HLL++ (approx_count_distinct), the bottom-k sketch is
  * (a) fully deterministic and order-independent — the k smallest
  * distinct hashes are a pure set property, so estimates are
  * identical across partitionings, retries, and cluster sizes — and
  * (b) doubles as a uniform distinct-value sample (the bottom hashes
  * are a uniform random subset of the value universe under the hash).
  * Distinct estimate: if fewer than k hashes were kept the count is
  * exact; else n̂ = (k−1)/F where F is the fraction of the hash space
  * covered by the kth smallest value. Error ~ 1/√k. Buffer is a
  * bounded sorted array — merge is a linear sorted-union, state is
  * O(k) regardless of input size (100 TB-safe).
  */
class BottomK(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0)

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (buf.length >= k && ins >= k) buf
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // linear sorted-union keeping the k smallest distinct values
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      val take =
        if (i >= a.length) { j += 1; b(j - 1) }
        else if (j >= b.length) { i += 1; a(i - 1) }
        else if (a(i) < b(j)) { i += 1; a(i - 1) }
        else if (b(j) < a(i)) { j += 1; b(j - 1) }
        else { i += 1; j += 1; a(i - 1) }
      out(o) = take; o += 1
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object BottomKSketch {

  /** The sketch as a Column over a pre-hashed LongType column. */
  def bottomKOfHashes(k: Int): Column =
    new BottomK(k).toColumn.asInstanceOf[Column]

  /** Untyped relational form: `bottom_k(ids)` over a groupBy keeps
    * the k smallest DISTINCT values of a LongType column — the
    * bounded-state replacement for `row_number() OVER (... ORDER BY
    * id) <= k`, which sorts the whole partition in one task. O(k)
    * map-side state, linear sorted-union merge, order-independent. */
  def bottom_k(k: Int)(c: Column): Column =
    udaf(new BottomK(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]())
      .apply(c)

  /** Distinct-count estimate from a collected sketch. */
  def estimateDistinct(sketch: Array[Long], k: Int): Double =
    if (sketch.length < k) sketch.length.toDouble
    else {
      // map signed long to fraction of hash space in [0, 1)
      val frac = sketch.last.toDouble / math.pow(2.0, 64) + 0.5
      (k - 1).toDouble / frac
    }

  /** One-shot distinct estimate of `colName` (one scan, O(k) state).
    * Returns (estimate, sketch). */
  def distinctEstimate(df: DataFrame, colName: String, k: Int = 256)
      : (Double, Array[Long]) = {
    val spark = df.sparkSession
    import spark.implicits._
    // xxhash64(NULL) returns the seed — a valid hash — which would
    // count NULL as a distinct value; countDistinct semantics exclude
    // nulls, so filter first
    val hashes = df.where(col(colName).isNotNull)
      .select(xxhash64(col(colName)).as("h")).as[Long]
    val sketch = hashes.select(bottomKOfHashes(k).as[Array[Long]])
      .head()
    (estimateDistinct(sketch, k), sketch)
  }
}
