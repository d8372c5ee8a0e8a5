package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.GraftSql

/** Primitive-buffer exact percentile — value-identical to Spark's
  * built-in `percentile(col, array(...))` on double input, an order
  * of magnitude cheaper per row (r16 optimization round).
  *
  * Spark's `Percentile` aggregate buffers a generic
  * `OpenHashMap[AnyRef, Long]`: every input double is BOXED on
  * insert, hashed as an object, and the partial maps are serialized
  * entry-by-entry through an UnsafeProjection. Measured at sf0.1
  * (600k rows × 8 columns in one agg): 3.9 s of which nearly all is
  * boxed map churn — the scan itself is 0.65 s. This buffer keys an
  * open-addressing long→long table on `doubleToLongBits` instead:
  * no boxing on the hot path, flat-array serialization, and the
  * final sort runs over primitive longs via the IEEE-total-order
  * bit transform.
  *
  * VALUE EQUIVALENCE with the built-in (the declared queries' hash
  * contract): `java.lang.Double.equals` compares `doubleToLongBits`,
  * so bit-keying groups values exactly as the boxed map does
  * (including -0.0 ≠ 0.0 and canonical NaN); the bit transform
  * sorts identically to catalyst's double ordering (-0.0 < 0.0,
  * NaN greatest); and the evaluation replays the built-in's exact
  * arithmetic: position = (n−1)·p, binary search of lower+1 /
  * higher+1 in the accumulated counts, and the identical
  * interpolation expression
  * `(higher − pos) · lowerKey + (pos − lower) · higherKey` —
  * the same IEEE ops in the same order, so results are
  * bit-identical, pinned by `ExactPercentileSpec` property tests
  * against the built-in. Exactness and merge-order independence are
  * inherited from the (value → count) map semantics. */
final class PctlBuf(initialCapacity: Int = 64) extends Serializable {
  // open addressing, linear probing, power-of-2 capacity; a slot is
  // occupied iff cnts(i) != 0 (true counts are always >= 1)
  var keys: Array[Long] = new Array[Long](initialCapacity)
  var cnts: Array[Long] = new Array[Long](initialCapacity)
  var used: Int = 0
  var total: Long = 0L

  @inline private def mix(x: Long): Long = {
    var z = x ^ (x >>> 33)
    z *= 0xff51afd7ed558ccdL
    z ^= z >>> 33
    z *= 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  def add(bits: Long, c: Long): Unit = {
    if ((used + 1) * 2 > keys.length) grow()
    val mask = keys.length - 1
    var i = (mix(bits) & mask).toInt
    while (cnts(i) != 0L && keys(i) != bits) i = (i + 1) & mask
    if (cnts(i) == 0L) { keys(i) = bits; used += 1 }
    cnts(i) += c
    total += c
  }

  private def grow(): Unit = {
    val ok = keys; val oc = cnts
    keys = new Array[Long](ok.length * 2)
    cnts = new Array[Long](ok.length * 2)
    val mask = keys.length - 1
    var j = 0
    while (j < ok.length) {
      if (oc(j) != 0L) {
        var i = (mix(ok(j)) & mask).toInt
        while (cnts(i) != 0L) i = (i + 1) & mask
        keys(i) = ok(j); cnts(i) = oc(j)
      }
      j += 1
    }
  }

  def mergeIn(other: PctlBuf): PctlBuf = {
    var j = 0
    while (j < other.keys.length) {
      if (other.cnts(j) != 0L) add(other.keys(j), other.cnts(j))
      j += 1
    }
    this
  }

  /** Count lookup for an occupied key (eval-time only). */
  def get(bits: Long): Long = {
    val mask = keys.length - 1
    var i = (mix(bits) & mask).toInt
    while (cnts(i) != 0L && keys(i) != bits) i = (i + 1) & mask
    cnts(i)
  }
}

/** `exact_percentile(cast(col as double), ps)` → array<double>, or
  * null on an empty (all-null) input — the built-in's contract. */
case class ExactPercentileAgg(child: Expression, ps: Seq[Double],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PctlBuf]
    with UnaryLike[Expression] {

  require(ps.forall(p => p >= 0.0 && p <= 1.0),
    s"percentages must be in [0, 1], got $ps")

  // r17 (advisor): declare the input contract so a non-double child
  // fails at ANALYSIS time instead of a runtime ClassCastException
  // in update() — all repo call sites already cast, but the helper
  // is public.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"exact_percentile requires a DOUBLE child (cast first); " +
          s"got ${child.dataType.catalogString}")

  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): PctlBuf = new PctlBuf()

  override def update(buf: PctlBuf, input: InternalRow): PctlBuf = {
    val v = child.eval(input)
    if (v != null)
      buf.add(java.lang.Double.doubleToLongBits(
        v.asInstanceOf[Double]), 1L)
    buf
  }

  override def merge(buf: PctlBuf, other: PctlBuf): PctlBuf =
    buf.mergeIn(other)

  /** IEEE-754 total-order-as-signed-long transform (self-inverse):
    * non-negative bit patterns unchanged, negative ones flip the low
    * 63 bits — long order then equals catalyst double order
    * (-Inf < … < -0.0 < 0.0 < … < NaN). */
  @inline private def flip(b: Long): Long =
    b ^ ((b >> 63) & 0x7fffffffffffffffL)

  override def eval(buf: PctlBuf): Any = {
    if (buf.total == 0L) return null
    // sorted distinct keys via the primitive bit transform
    val ts = new Array[Long](buf.used)
    var j = 0; var k = 0
    while (j < buf.keys.length) {
      if (buf.cnts(j) != 0L) { ts(k) = flip(buf.keys(j)); k += 1 }
      j += 1
    }
    java.util.Arrays.sort(ts)
    val kd = new Array[Double](buf.used)
    val accum = new Array[Long](buf.used)
    var run = 0L
    j = 0
    while (j < ts.length) {
      val bits = flip(ts(j))
      run += buf.get(bits)
      accum(j) = run
      kd(j) = java.lang.Double.longBitsToDouble(bits)
      j += 1
    }
    val maxPosition = buf.total - 1
    val out = new Array[Any](ps.length)
    j = 0
    while (j < ps.length) {
      out(j) = percentileAt(kd, accum, maxPosition * ps(j))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** The built-in Percentile.getPercentile arithmetic, verbatim. */
  private def percentileAt(kd: Array[Double], accum: Array[Long],
      position: Double): Double = {
    val lower = math.floor(position).toLong
    val higher = math.ceil(position).toLong
    val lowerIndex = search(accum, lower + 1)
    if (higher == lower) return kd(lowerIndex)
    val higherIndex = search(accum, higher + 1)
    if (higherIndex == lowerIndex) return kd(lowerIndex)
    (higher - position) * kd(lowerIndex) +
      (position - lower) * kd(higherIndex)
  }

  private def search(accum: Array[Long], value: Long): Int =
    java.util.Arrays.binarySearch(accum, value) match {
      case ix if ix < 0 => -(ix + 1)
      case ix => ix
    }

  // wire format v1: version byte, total, used, (bits, cnt) pairs
  override def serialize(buf: PctlBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(1)
    out.writeLong(buf.total)
    out.writeInt(buf.used)
    var j = 0
    while (j < buf.keys.length) {
      if (buf.cnts(j) != 0L) {
        out.writeLong(buf.keys(j)); out.writeLong(buf.cnts(j))
      }
      j += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): PctlBuf = {
    val in = new DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val ver = in.readByte()
    if (ver != 1)
      throw new IllegalStateException(
        s"ExactPercentileAgg buffer format $ver unsupported (want 1)")
    val total = in.readLong()
    val sz = in.readInt()
    val buf = new PctlBuf(
      math.max(64, Integer.highestOneBit(math.max(1, sz * 2 - 1)) * 2))
    var j = 0
    while (j < sz) {
      buf.add(in.readLong(), in.readLong())
      j += 1
    }
    require(buf.total == total,
      "ExactPercentileAgg buffer corrupt: count mismatch")
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : ExactPercentileAgg = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : ExactPercentileAgg = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : ExactPercentileAgg = copy(child = newChild)
}

object ExactPercentile {
  /** Exact percentiles of a DOUBLE column at `ps` — value-identical
    * to `percentile(col, array(ps…))`; callers cast to double first
    * (the built-in call sites already did). */
  def pctl(col: Column, ps: Seq[Double]): Column =
    GraftSql.column(ExactPercentileAgg(
      GraftSql.expression(col), ps).toAggregateExpression())
}
