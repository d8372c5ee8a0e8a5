package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k (score, id) heap aggregate — the scale-safe tail for
  * every similarity ranking (the [[BottomK]] pattern applied to
  * scored candidates).
  *
  * Motivation: ranking ANN candidates with
  * `row_number() OVER (PARTITION BY qid ORDER BY score)` sorts each
  * query's ENTIRE candidate set — O(corpus) rows for brute force,
  * O(n/C·nprobe) for IVF — through a single window partition, i.e.
  * one task per query at any scale. This aggregate keeps only the k
  * best (score DESC, id ASC) entries per group in a bounded sorted
  * array: partial aggregation prunes map-side (each task's state is
  * O(k) no matter how many candidates it scans), and the final merge
  * per qid is a linear O(k) sorted-union of partial buffers — never a
  * sort of the candidate set. State is O(k) regardless of input size
  * (100 TB-safe), fully deterministic and order-independent (the k
  * best entries are a pure set property under the total order
  * (−score, id)).
  *
  * Determinism contract: callers pass sig5-ROUNDED scores so the
  * ordering compares identical doubles on both engines; ties break on
  * ascending id. Entries with equal (score, id) cannot occur per
  * group (ids are unique per group in every call site) but are kept
  * verbatim if they do — the aggregate never dedups. Score and id
  * must be NON-NULL (every call site filters first): a null input
  * fails loudly through the non-nullable tuple encoder rather than
  * silently ranking as 0.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), Array[(Double, Long)],
      Array[(Double, Long)]] {
  require(k > 0)

  // total order: score DESC, id ASC — index 0 is the best entry.
  // Double.compare (not >/==) so the order stays TOTAL for NaN: the
  // IEEE operators are false both ways on NaN, which made a NaN entry
  // insert at index 0 and merge output buffer-order-dependent (the
  // ADC 'unreachable' LUT slots can surface NaN). Under Double
  // .compare NaN ranks above every number — deterministically — and
  // sig5 collapses ±0 to +0, so the compare-vs-== divergence on -0.0
  // never reaches rounded scores.
  @inline private def lt(s1: Double, i1: Long, s2: Double, i2: Long)
      : Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(buf: Array[(Double, Long)], e: (Double, Long))
      : Array[(Double, Long)] = {
    // binary search for the insertion point in the sorted buffer
    var lo = 0; var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lt(buf(mid)._1, buf(mid)._2, e._1, e._2)) lo = mid + 1
      else hi = mid
    }
    if (buf.length >= k && lo >= k) buf // worse than the kth best
    else {
      val n = math.min(buf.length + 1, k)
      val out = new Array[(Double, Long)](n)
      System.arraycopy(buf, 0, out, 0, lo)
      out(lo) = e
      System.arraycopy(buf, lo, out, lo + 1, n - lo - 1)
      out
    }
  }

  override def merge(a: Array[(Double, Long)], b: Array[(Double, Long)])
      : Array[(Double, Long)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[(Double, Long)](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      val takeA = j >= b.length || (i < a.length &&
        !lt(b(j)._1, b(j)._2, a(i)._1, a(i)._2))
      if (takeA) { out(o) = a(i); i += 1 } else { out(o) = b(j); j += 1 }
      o += 1
    }
    out
  }

  override def finish(buf: Array[(Double, Long)])
      : Array[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
  override def outputEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
}

object TopKByScore {
  /** Untyped column form: `top_k(score, id)` over a relational
    * groupBy; yields `array<struct<_1: double, _2: bigint>>` sorted
    * best-first. */
  def top_k(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKByScore(k), ExpressionEncoder[(Double, Long)]())
      .apply(score, id)

  /** String-id form: `top_k_str(score, key)` — same bounded heap,
    * ties on ascending STRING key (lexicographic, the collation
    * both engines share for ASCII keys). */
  def top_k_str(k: Int)(score: Column, key: Column): Column =
    udaf(new TopKByScoreStr(k), ExpressionEncoder[(Double, String)]())
      .apply(score, key)
}

/** String-keyed twin of [[TopKByScore]] (ranked TEXT entries — the
  * TF-IDF keyword head): identical bounded-heap algebra and
  * determinism contract, with ties on ascending string key. Kept as
  * a sibling rather than a type-parameterized base because the
  * Aggregator's tuple encoders are resolved per concrete type at
  * the udaf call. */
class TopKByScoreStr(k: Int)
    extends Aggregator[(Double, String), Array[(Double, String)],
      Array[(Double, String)]] {
  require(k > 0)

  @inline private def lt(s1: Double, i1: String, s2: Double, i2: String)
      : Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  override def zero: Array[(Double, String)] = Array.empty

  override def reduce(buf: Array[(Double, String)],
      e: (Double, String)): Array[(Double, String)] = {
    var lo = 0; var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lt(buf(mid)._1, buf(mid)._2, e._1, e._2)) lo = mid + 1
      else hi = mid
    }
    if (buf.length >= k && lo >= k) buf
    else {
      val n = math.min(buf.length + 1, k)
      val out = new Array[(Double, String)](n)
      System.arraycopy(buf, 0, out, 0, lo)
      out(lo) = e
      System.arraycopy(buf, lo, out, lo + 1, n - lo - 1)
      out
    }
  }

  override def merge(a: Array[(Double, String)],
      b: Array[(Double, String)]): Array[(Double, String)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out =
      new Array[(Double, String)](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      val takeA = j >= b.length || (i < a.length &&
        !lt(b(j)._1, b(j)._2, a(i)._1, a(i)._2))
      if (takeA) { out(o) = a(i); i += 1 } else { out(o) = b(j); j += 1 }
      o += 1
    }
    out
  }

  override def finish(buf: Array[(Double, String)])
      : Array[(Double, String)] = buf

  override def bufferEncoder: Encoder[Array[(Double, String)]] =
    ExpressionEncoder[Array[(Double, String)]]()
  override def outputEncoder: Encoder[Array[(Double, String)]] =
    ExpressionEncoder[Array[(Double, String)]]()
}
