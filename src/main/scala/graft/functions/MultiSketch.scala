package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, QuantileSummaries}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.GraftSql

/** Mutable per-column profile sketch: every distributive/sketchable
  * statistic the profiler needs from one column, maintained in a
  * single bounded-size buffer so a whole-table profile is ONE scan.
  *
  *  - count / min / max / sum / zero-count: exact.
  *  - central moments M2..M4 (→ var/sd/skew/kurtosis): exact up to
  *    float summation order, via Pébay's streaming one-pass update
  *    and pairwise merge formulas ("Formulas for Robust, One-Pass
  *    Parallel Computation of Covariances and Arbitrary-Order
  *    Statistical Moments", Sandia SAND2008-6212) — the same family
  *    of formulas Spark's own CentralMomentAgg uses.
  *  - distinct count: deterministic KMV bottom-k sketch (k smallest
  *    distinct 64-bit hashes; exact below k, ~1/√k error above —
  *    identical across partitionings and retries, unlike HLL++).
  *  - quantiles: Greenwald–Khanna summaries, the exact class
  *    `percentile_approx` uses, at the same default accuracy.
  *
  * State is O(k + accuracy) per column regardless of row count, and
  * merge is associative — the 100 TB shape.
  */
final class MultiSketchBuf(val k: Int, val accuracy: Int)
    extends Serializable {
  var cnt: Long = 0L // non-null values (any kind)
  var n: Long = 0L // numeric non-null values
  var mean, m2, m3, m4 = 0.0
  var mn: Double = Double.PositiveInfinity
  var mx: Double = Double.NegativeInfinity
  var sum: Double = 0.0
  var nz: Long = 0L
  val kmv: Array[Long] = new Array[Long](k)
  var kmvLen: Int = 0
  /** GK summary with an EMPTY head — all insertion goes through the
    * primitive head buffer below. `QuantileSummaries.insert` appends
    * to a boxed ArrayBuffer[Double] and sorts with boxing on each
    * 50k flush; measured 60+ s of a 10M×4-column scan (Spark's own
    * percentile_approx pays the same). The primitive path below is
    * the identical algorithm (same flush cadence, same GK delta rule,
    * same compress) over unboxed arrays. */
  var qs: QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      1.0 / accuracy)
  @transient private var gkHead: Array[Double] = _
  @transient private var gkHeadLen: Int = 0

  def gkInsert(x: Double): Unit = {
    if (gkHead == null) // lazy: never allocated for ps=Nil columns
      gkHead = new Array[Double](QuantileSummaries.defaultHeadSize)
    gkHead(gkHeadLen) = x
    gkHeadLen += 1
    if (gkHeadLen == gkHead.length) gkFlush()
  }

  /** Primitive twin of QuantileSummaries.withHeadBufferInserted (+
    * the same compress trigger insert() applies): sort the head run
    * unboxed, one linear merge into the sampled array, delta =
    * ⌊2εn⌋ except at the extremes — bit-identical summaries to the
    * boxed path at every flush boundary. */
  def gkFlush(): Unit = if (gkHeadLen > 0) {
    java.util.Arrays.sort(gkHead, 0, gkHeadLen)
    val old = qs.sampled
    val relErr = qs.relativeError
    val out = new Array[QuantileSummaries.Stats](old.length + gkHeadLen)
    var c = qs.count
    var si = 0; var oi = 0; var w = 0
    while (oi < gkHeadLen) {
      val x = gkHead(oi)
      while (si < old.length && old(si).value <= x) {
        out(w) = old(si); w += 1; si += 1
      }
      c += 1
      val delta =
        if (w == 0 || (si == old.length && oi == gkHeadLen - 1)) 0L
        else math.floor(2 * relErr * c).toLong
      out(w) = new QuantileSummaries.Stats(x, 1L, delta)
      w += 1; oi += 1
    }
    while (si < old.length) { out(w) = old(si); w += 1; si += 1 }
    var next = new QuantileSummaries(qs.compressThreshold, relErr, out,
      c, false)
    if (out.length >= qs.compressThreshold) next = next.compress()
    qs = next
    gkHeadLen = 0
  }

  def addHash(h: Long): Unit = {
    cnt += 1
    val pos = java.util.Arrays.binarySearch(kmv, 0, kmvLen, h)
    if (pos < 0) {
      val ins = -pos - 1
      if (ins < k) {
        val last = math.min(kmvLen, k - 1)
        System.arraycopy(kmv, ins, kmv, ins + 1, last - ins)
        kmv(ins) = h
        if (kmvLen < k) kmvLen += 1
      }
    }
  }

  def addValue(x: Double): Unit = {
    val n1 = n.toDouble
    n += 1
    val nd = n.toDouble
    val delta = x - mean
    val dn = delta / nd
    val dn2 = dn * dn
    val term1 = delta * dn * n1
    mean += dn
    m4 += term1 * dn2 * (nd * nd - 3 * nd + 3) + 6 * dn2 * m2 -
      4 * dn * m3
    m3 += term1 * dn * (nd - 2) - 3 * dn * m2
    m2 += term1
    if (x < mn) mn = x
    if (x > mx) mx = x
    sum += x
    if (x == 0.0) nz += 1
  }

  def mergeIn(o: MultiSketchBuf): MultiSketchBuf = {
    cnt += o.cnt
    // KMV: sorted-union keeping the k smallest distinct hashes
    if (o.kmvLen > 0) {
      val out = new Array[Long](math.min(kmvLen + o.kmvLen, k))
      var i = 0; var j = 0; var w = 0
      while (w < out.length && (i < kmvLen || j < o.kmvLen)) {
        val take =
          if (i >= kmvLen) { j += 1; o.kmv(j - 1) }
          else if (j >= o.kmvLen) { i += 1; kmv(i - 1) }
          else if (kmv(i) < o.kmv(j)) { i += 1; kmv(i - 1) }
          else if (o.kmv(j) < kmv(i)) { j += 1; o.kmv(j - 1) }
          else { i += 1; j += 1; kmv(i - 1) }
        out(w) = take; w += 1
      }
      System.arraycopy(out, 0, kmv, 0, w)
      kmvLen = w
    }
    // moments: Pébay pairwise merge
    if (o.n > 0) {
      if (n == 0) {
        n = o.n; mean = o.mean; m2 = o.m2; m3 = o.m3; m4 = o.m4
      } else {
        val na = n.toDouble; val nb = o.n.toDouble; val nt = na + nb
        val delta = o.mean - mean
        val d2 = delta * delta
        val newM2 = m2 + o.m2 + d2 * na * nb / nt
        val newM3 = m3 + o.m3 +
          delta * d2 * na * nb * (na - nb) / (nt * nt) +
          3 * delta * (na * o.m2 - nb * m2) / nt
        val newM4 = m4 + o.m4 +
          d2 * d2 * na * nb * (na * na - na * nb + nb * nb) /
            (nt * nt * nt) +
          6 * d2 * (na * na * o.m2 + nb * nb * m2) / (nt * nt) +
          4 * delta * (na * o.m3 - nb * m3) / nt
        mean = (na * mean + nb * o.mean) / nt
        m2 = newM2; m3 = newM3; m4 = newM4
        n += o.n
      }
      if (o.mn < mn) mn = o.mn
      if (o.mx > mx) mx = o.mx
      sum += o.sum
      nz += o.nz
    }
    gkFlush(); o.gkFlush()
    qs = qs.compress().merge(o.qs.compress())
    this
  }

  /** Distinct estimate: exact while the sketch is not full, else
    * (k−1) / fraction-of-hash-space below the kth smallest hash. */
  def distinctEstimate: Long =
    if (kmvLen < k) kmvLen.toLong
    else {
      val frac = kmv(kmvLen - 1).toDouble / math.pow(2.0, 64) + 0.5
      math.round((k - 1).toDouble / frac)
    }
}

/** One-scan multi-statistic aggregate (see [[MultiSketchBuf]]).
  *
  * Two children: `value` (DoubleType — the numeric/date-micros value,
  * or null for non-numeric columns) and `hash` (LongType — a 64-bit
  * hash of the column value for distinct counting, null when the
  * column value is null). Emits a struct of all statistics plus the
  * queried quantiles.
  */
case class MultiSketchAgg(
    valueChild: Expression,
    hashChild: Expression,
    k: Int = 1024,
    accuracy: Int = 10000,
    ps: Seq[Double] = Seq(0.05, 0.25, 0.5, 0.75, 0.95),
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MultiSketchBuf]
  with BinaryLike[Expression] {

  override def left: Expression = valueChild
  override def right: Expression = hashChild
  override def prettyName: String = "multi_sketch"
  override def nullable: Boolean = false
  override val dataType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("dis", LongType, nullable = false),
    StructField("n_num", LongType, nullable = false),
    StructField("mean", DoubleType),
    StructField("m2", DoubleType),
    StructField("m3", DoubleType),
    StructField("m4", DoubleType),
    StructField("mn", DoubleType),
    StructField("mx", DoubleType),
    StructField("sm", DoubleType),
    StructField("nz", LongType, nullable = false),
    StructField("qs", ArrayType(DoubleType)),
    // the full GK summary (count + sampled tuples), so callers can
    // make rank/CDF estimates — e.g. sketch histograms — without
    // another scan
    StructField("gk", BinaryType)))

  override def createAggregationBuffer(): MultiSketchBuf =
    new MultiSketchBuf(k, accuracy)

  override def update(buf: MultiSketchBuf, input: InternalRow)
      : MultiSketchBuf = {
    val h = hashChild.eval(input)
    if (h != null) buf.addHash(h.asInstanceOf[Long])
    val v = valueChild.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      buf.addValue(x)
      // NaN has no rank — GK comparisons against it are vacuous and
      // would poison the summary (histograms exclude NaN the same way)
      if (ps.nonEmpty && !x.isNaN) buf.gkInsert(x)
    }
    buf
  }

  override def merge(buf: MultiSketchBuf, other: MultiSketchBuf)
      : MultiSketchBuf = buf.mergeIn(other)

  override def eval(buf: MultiSketchBuf): Any = {
    val hasNum = buf.n > 0
    buf.gkFlush()
    val compressed =
      if (!hasNum || ps.isEmpty) null else buf.qs.compress()
    val q =
      if (compressed == null) null
      else new GenericArrayData(ps.map(p =>
        compressed.query(p).getOrElse(Double.NaN): Any).toArray)
    val gk =
      if (compressed == null) null
      else MultiSketch.serializeGk(compressed)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](buf.cnt, buf.distinctEstimate, buf.n,
        if (hasNum) buf.mean else null,
        if (hasNum) buf.m2 else null,
        if (hasNum) buf.m3 else null,
        if (hasNum) buf.m4 else null,
        if (hasNum) buf.mn else null,
        if (hasNum) buf.mx else null,
        if (hasNum) buf.sum else null,
        buf.nz, q, gk))
  }

  override def serialize(buf: MultiSketchBuf): Array[Byte] =
    MultiSketch.serializeBuf(buf)

  override def deserialize(bytes: Array[Byte]): MultiSketchBuf =
    MultiSketch.deserializeBuf(bytes, k, accuracy)

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : MultiSketchAgg = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : MultiSketchAgg = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MultiSketchAgg =
    copy(valueChild = newLeft, hashChild = newRight)
}

/** Variant of [[MultiSketchAgg]] whose eval emits the SERIALIZED
  * buffer (BinaryType) instead of the finalized statistics struct —
  * the capture side of the incremental profile store
  * ([[graft.profiler.ProfileStore]]): the persisted bytes are the
  * exact shuffle wire format, so a later job can deserialize,
  * `mergeIn`, and finalize without rescanning the rows that produced
  * them. Update/merge/serde are byte-identical to the struct form. */
case class MultiSketchStateAgg(
    valueChild: Expression,
    hashChild: Expression,
    k: Int = 1024,
    accuracy: Int = 10000,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MultiSketchBuf]
  with BinaryLike[Expression] {

  override def left: Expression = valueChild
  override def right: Expression = hashChild
  override def prettyName: String = "multi_sketch_state"
  override def nullable: Boolean = false
  override val dataType: DataType = BinaryType

  override def createAggregationBuffer(): MultiSketchBuf =
    new MultiSketchBuf(k, accuracy)

  override def update(buf: MultiSketchBuf, input: InternalRow)
      : MultiSketchBuf = {
    val h = hashChild.eval(input)
    if (h != null) buf.addHash(h.asInstanceOf[Long])
    val v = valueChild.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      buf.addValue(x)
      if (!x.isNaN) buf.gkInsert(x)
    }
    buf
  }

  override def merge(buf: MultiSketchBuf, other: MultiSketchBuf)
      : MultiSketchBuf = buf.mergeIn(other)

  override def eval(buf: MultiSketchBuf): Any =
    MultiSketch.serializeBuf(buf)

  override def serialize(buf: MultiSketchBuf): Array[Byte] =
    MultiSketch.serializeBuf(buf)

  override def deserialize(bytes: Array[Byte]): MultiSketchBuf =
    MultiSketch.deserializeBuf(bytes, k, accuracy)

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : MultiSketchStateAgg = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : MultiSketchStateAgg = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MultiSketchStateAgg =
    copy(valueChild = newLeft, hashChild = newRight)
}

object MultiSketch {

  /** The fused sketch as a Column. `value` must be DoubleType (null
    * for non-numeric columns); `hash` a LongType hash that is null
    * exactly when the column value is null. */
  def sketch(value: Column, hash: Column, k: Int = 1024,
      accuracy: Int = 10000,
      ps: Seq[Double] = Seq(0.05, 0.25, 0.5, 0.75, 0.95)): Column =
    GraftSql.column(
      MultiSketchAgg(GraftSql.expression(value),
        GraftSql.expression(hash), k, accuracy, ps)
        .toAggregateExpression())

  /** The serialized-state form of [[sketch]] (see
    * [[MultiSketchStateAgg]]). */
  def state(value: Column, hash: Column, k: Int = 1024,
      accuracy: Int = 10000): Column =
    GraftSql.column(
      MultiSketchStateAgg(GraftSql.expression(value),
        GraftSql.expression(hash), k, accuracy)
        .toAggregateExpression())

  /** Canonical wire format of a [[MultiSketchBuf]] — shared by the
    * aggregate's shuffle serde AND the profile store's persisted
    * snapshots (one format, one reader). GK state is written
    * compressed; k/accuracy ride OUTSIDE the bytes (snapshot
    * metadata), mirroring how the aggregate carries them. */
  def serializeBuf(buf: MultiSketchBuf): Array[Byte] = {
    buf.gkFlush()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.cnt); out.writeLong(buf.n)
    out.writeDouble(buf.mean); out.writeDouble(buf.m2)
    out.writeDouble(buf.m3); out.writeDouble(buf.m4)
    out.writeDouble(buf.mn); out.writeDouble(buf.mx)
    out.writeDouble(buf.sum); out.writeLong(buf.nz)
    out.writeInt(buf.kmvLen)
    var i = 0
    while (i < buf.kmvLen) { out.writeLong(buf.kmv(i)); i += 1 }
    val q = buf.qs.compress()
    out.writeLong(q.count)
    out.writeInt(q.sampled.length)
    q.sampled.foreach { s =>
      out.writeDouble(s.value); out.writeLong(s.g); out.writeLong(s.delta)
    }
    out.flush()
    bos.toByteArray
  }

  def deserializeBuf(bytes: Array[Byte], k: Int, accuracy: Int)
      : MultiSketchBuf = {
    val in = new DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val buf = new MultiSketchBuf(k, accuracy)
    buf.cnt = in.readLong(); buf.n = in.readLong()
    buf.mean = in.readDouble(); buf.m2 = in.readDouble()
    buf.m3 = in.readDouble(); buf.m4 = in.readDouble()
    buf.mn = in.readDouble(); buf.mx = in.readDouble()
    buf.sum = in.readDouble(); buf.nz = in.readLong()
    buf.kmvLen = in.readInt()
    var i = 0
    while (i < buf.kmvLen) { buf.kmv(i) = in.readLong(); i += 1 }
    val qCount = in.readLong()
    val nSampled = in.readInt()
    val sampled = Array.fill(nSampled) {
      new QuantileSummaries.Stats(in.readDouble(), in.readLong(),
        in.readLong())
    }
    buf.qs = new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, 1.0 / accuracy,
      sampled, qCount, true)
    buf
  }

  def serializeGk(q: QuantileSummaries): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(q.count)
    out.writeInt(q.sampled.length)
    q.sampled.foreach { s =>
      out.writeDouble(s.value); out.writeLong(s.g); out.writeLong(s.delta)
    }
    out.flush()
    bos.toByteArray
  }

  /** Parsed GK summary: (count, values, cumulative-g ranks rMin,
    * deltas) with values ascending. */
  final case class Gk(count: Long, values: Array[Double],
      rMin: Array[Long], delta: Array[Long]) {

    /** Estimated number of inserted values STRICTLY below x. GK
      * invariant: the true rank of sampled value vᵢ lies in
      * [rMinᵢ, rMinᵢ + deltaᵢ]; for x between vᵢ and vᵢ₊₁ the strict
      * rank lies in [rMinᵢ, rMinᵢ₊₁ + deltaᵢ₊₁ − 1]; the midpoint is
      * exact whenever the summary never compressed (g ≡ 1, δ ≡ 0). */
    def rankLt(x: Double): Double = {
      if (values.isEmpty || x <= values(0)) return 0.0
      if (x > values(values.length - 1)) return count.toDouble
      // binary search: largest i with values(i) < x
      var lo = 0; var hi = values.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (values(mid) < x) lo = mid else hi = mid - 1
      }
      val i = lo
      val hiBound = rMin(i + 1) + delta(i + 1) - 1
      (rMin(i) + hiBound) / 2.0
    }
  }

  def parseGk(bytes: Array[Byte]): Gk = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val count = in.readLong()
    val len = in.readInt()
    val values = new Array[Double](len)
    val rMin = new Array[Long](len)
    val delta = new Array[Long](len)
    var acc = 0L
    var i = 0
    while (i < len) {
      values(i) = in.readDouble()
      acc += in.readLong(); rMin(i) = acc
      delta(i) = in.readLong()
      i += 1
    }
    Gk(count, values, rMin, delta)
  }

  /** Equal-width histogram estimated from a GK summary — no extra
    * scan. Mirrors Stats.histogramWithBounds semantics: `bins` equal
    * buckets over [mn, mx], value == interior edge goes to the upper
    * bucket, max lands in the last bucket; degenerate bounds
    * (NaN / zero width) collapse to a single bucket 0. Per-bin count
    * error is bounded by the GK rank error (≤ ε·n per edge). */
  def gkHistogram(bytes: Array[Byte], mn: Double, mx: Double,
      bins: Int): Seq[(Long, Long)] = {
    val gk = parseGk(bytes)
    if (gk.count == 0L) return Seq.empty
    if (mn.isNaN || mx.isNaN || mn == mx) return Seq((0L, gk.count))
    val w = (mx - mn) / bins.toDouble
    val cum = new Array[Long](bins + 1)
    cum(bins) = gk.count
    var b = 1
    while (b < bins) {
      val est = math.round(gk.rankLt(mn + b.toDouble * w))
      cum(b) = math.min(gk.count, math.max(cum(b - 1), est))
      b += 1
    }
    // re-enforce monotonicity against the fixed top end
    b = bins - 1
    while (b >= 1) {
      if (cum(b) > cum(b + 1)) cum(b) = cum(b + 1)
      b -= 1
    }
    (0 until bins).map(i => (i.toLong, cum(i + 1) - cum(i)))
  }

  /** Quantile-value queries against a serialized GK summary — the
    * profiler's no-extra-scan source of Spearman grid cuts (ps must
    * be ascending; one monotone walk answers them all). Value error
    * follows the GK rank guarantee: the returned element's true rank
    * is within ε·n of the target. */
  def gkQuantiles(bytes: Array[Byte], ps: Seq[Double]): Array[Double] = {
    val gk = parseGk(bytes)
    if (gk.count == 0L) return Array.empty
    val out = new Array[Double](ps.size)
    var i = 0
    var j = 0
    while (j < ps.size) {
      val target = math.max(1L, math.ceil(ps(j) * gk.count).toLong)
      while (i < gk.values.length - 1 &&
          gk.rMin(i) + gk.delta(i) < target) i += 1
      out(j) = gk.values(i)
      j += 1
    }
    out
  }
}
