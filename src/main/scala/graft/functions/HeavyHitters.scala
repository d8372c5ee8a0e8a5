package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.GraftSql
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary: at most `k` (item → count)
  * counters over a string stream, with the classic deterministic
  * guarantees (Misra & Gries 1982; mergeability per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012):
  *
  *  - UNDER-estimate: est(x) ≤ true(x) for every item x;
  *  - bounded error: true(x) − est(x) ≤ n / (k + 1) where n is the
  *    stream length — REGARDLESS of partitioning or merge order;
  *  - coverage: every item with true(x) > n / (k + 1) is present in
  *    the summary.
  *
  * State is O(k) per group no matter how many rows stream through —
  * the sketch an LLM-pipeline uses for "which domains / licenses /
  * boilerplate lines dominate this 100 TB crawl" without paying a
  * full (item → count) shuffle. Merge sums counters then removes the
  * (k+1)-th largest count from all (the PODS-2012 mergeable form),
  * preserving all three guarantees under arbitrary merge trees.
  *
  * The per-item ESTIMATES depend on merge order (only the guarantees
  * are order-free), so queries that need deterministic output should
  * emit the guarantee booleans against exact premises — not raw
  * estimates (same pattern as the LSH recall-containment gates).
  */
final class MgBuf(val k: Int) extends Serializable {
  var n: Long = 0L // stream length (non-null items)
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(item: String): Unit = {
    n += 1
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None if counts.size < k => counts.update(item, 1L)
      case None => // full and absent: decrement-all (the MG step)
        val dead = mutable.ArrayBuffer.empty[String]
        counts.foreach { case (it, c) =>
          if (c == 1L) dead += it else counts.update(it, c - 1)
        }
        dead.foreach(counts.remove)
    }
  }

  /** PODS-2012 merge: counter-wise sum, then subtract the (k+1)-th
    * largest resulting count from every counter and drop the
    * non-positive ones — at most k survive. */
  def mergeIn(other: MgBuf): MgBuf = {
    n += other.n
    other.counts.foreach { case (it, c) =>
      counts.update(it, counts.getOrElse(it, 0L) + c)
    }
    if (counts.size > k) {
      val sorted = counts.values.toArray
      java.util.Arrays.sort(sorted)
      val sub = sorted(sorted.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      counts.foreach { case (it, c) =>
        if (c - sub <= 0L) dead += it else counts.update(it, c - sub)
      }
      dead.foreach(counts.remove)
    }
    this
  }
}

/** `mg_heavy_hitters(item, k)` aggregate → struct(n, items: map).
  * Null items are skipped (they are absent from the stream). */
case class MisraGriesAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuf] with UnaryLike[Expression] {

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("items", MapType(StringType, LongType))))

  override def createAggregationBuffer(): MgBuf = new MgBuf(k)

  override def update(buf: MgBuf, input: InternalRow): MgBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MgBuf, other: MgBuf): MgBuf = buf.mergeIn(other)

  override def eval(buf: MgBuf): Any = {
    val items = buf.counts.toArray.sortBy(_._1)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](buf.n, new ArrayBasedMapData(
        new GenericArrayData(
          items.map(e => UTF8String.fromString(e._1): Any)),
        new GenericArrayData(items.map(e => e._2: Any)))))
  }

  // items as length-prefixed UTF-8 byte arrays, NOT writeUTF: the
  // modified-UTF-8 format caps an item at 65535 encoded bytes and
  // throws beyond it, and this sketch is advertised for items like
  // boilerplate LINES from a crawl, where an oversized key must
  // degrade (count normally) rather than kill the aggregation.
  //
  // Wire format v2 (leading version byte). These buffers PERSIST in
  // streaming state-store checkpoints (windowedHeavyHitters), so any
  // format change is a checkpoint break; the version byte turns a
  // stale checkpoint into a clear error instead of garbage or EOF.
  // v1 (the round-5 writeUTF format) had no version byte — its first
  // byte is the high byte of the n Long, i.e. 0 for any real stream —
  // so v1 state is reliably detected and rejected.
  override def serialize(buf: MgBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(MisraGriesAgg.FormatVersion)
    out.writeLong(buf.n)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (it, c) =>
      val b = it.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val ver = in.readByte()
    if (ver != MisraGriesAgg.FormatVersion)
      throw new IllegalStateException(
        s"MisraGriesAgg state format $ver is not the supported " +
          s"v${MisraGriesAgg.FormatVersion}; a streaming checkpoint " +
          "written by an older build must be discarded (the sketch " +
          "buffer wire format changed)")
    val buf = new MgBuf(k)
    buf.n = in.readLong()
    val sz = in.readInt()
    var i = 0
    while (i < sz) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      val it = new String(b, java.nio.charset.StandardCharsets.UTF_8)
      val c = in.readLong()
      buf.counts.update(it, c)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : MisraGriesAgg = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : MisraGriesAgg = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : MisraGriesAgg = copy(child = newChild)
}

object MisraGriesAgg {
  /** Buffer wire-format version (see serialize). Bump on ANY change
    * to the serialized layout. */
  val FormatVersion: Byte = 2
}

object HeavyHitters {

  /** The Misra–Gries summary as a Column: struct(n, items map). */
  def mg(item: Column, k: Int): Column =
    GraftSql.column(
      MisraGriesAgg(GraftSql.expression(item), k).toAggregateExpression())

  /** Exact heavy hitters by the standard two-pass sketch-then-recount
    * pattern: pass 1 runs the Misra–Gries aggregate (O(k) state per
    * partition, no full item shuffle) to propose ≤ k candidates and
    * the exact stream length n; pass 2 recounts ONLY the candidates
    * exactly and keeps those with cnt·(k+1) > n.
    *
    * Output — (item, cnt, share) — is DETERMINISTIC even though the
    * sketch's candidate set is merge-order dependent: every true
    * heavy item (cnt > n/(k+1)) is guaranteed present in the sketch
    * (MG coverage), and any extra candidate the merge order happened
    * to retain fails the exact threshold and drops out. This is the
    * user-facing "top domains in the crawl" answer at corpus scale:
    * the full (item → count) shuffle the sketch avoids would carry
    * billions of distinct keys; the recount pass shuffles only rows
    * of ≤ k items after map-side combine.
    *
    * The collected sketch is ONE row of ≤ k entries — driver state
    * bounded by the parameter, same as the IVF codebooks. */
  def heavyHittersExact(df: org.apache.spark.sql.DataFrame,
      itemCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sk = df.agg(mg(col(itemCol), k).as("mg"))
      .select(col("mg.n"), col("mg.items")).collect()(0)
    val n = sk.getLong(0)
    val cand = sk.getMap[String, Long](1).keys.toSeq.sorted
    val base = df.select(col(itemCol).as("item"))
    val candidates =
      if (cand.isEmpty) base.where(lit(false)) // empty stream
      else base.where(col("item").isin(cand: _*))
    candidates
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * (k + 1) > lit(n))
      .select(col("item"), col("cnt"),
        graft.det.Sig.sig5(col("cnt").cast("double") / lit(n.toDouble))
          .as("share"))
      .orderBy("item")
  }
}
