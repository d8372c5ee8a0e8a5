package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins: backward as-of
  * join and point-in-interval (range) join. Both are implemented as
  * compositions of shuffle-on-key primitives whose cost is linear in
  * input size — NOT as inequality-predicate joins, which Spark can
  * only execute as a broadcast-nested-loop or cartesian product
  * (quadratic per key, a job-killer on a 100 TB event log).
  *
  * Reference scope note: the reference profiler has no temporal
  * joins; these extend the engine for event-log / feature-pipeline
  * workloads (the "operator the reference lacks, preference (a):
  * compose existing ops" route — the union-marker window trick and
  * bucket-exploded interval join are the standard scale shapes).
  */
object TemporalJoin {

  /** Backward as-of join: for every left row, the single right row
    * with the same `key` and the greatest `ts` at-or-before the left
    * row's `ts` (ties on `ts` broken toward the greatest `tiebreak`,
    * right-at-equal-ts admissible, i.e. `<=` semantics).
    *
    * Scale path — the union-marker window: instead of joining L×R on
    * an inequality (no equi-condition ⇒ Spark plans a per-key
    * nested loop), both sides are UNIONed with a side marker and a
    * single window over (key ORDER BY ts, side, tiebreak) carries the
    * last-seen right payload forward into each left row:
    *
    *   one shuffle on `key`, one sort, zero join operators —
    *   cost O((|L|+|R|) log) per partition, independent of how many
    *   right rows precede each left row (the naive join emits one
    *   intermediate row per (left, earlier-right) pair: quadratic in
    *   per-key density — measured equivalence is unit-tested instead).
    *
    * Right rows sort BEFORE left rows at equal ts (side 0 < 1), so a
    * right row exactly at the left timestamp is matched (ASOF `<=`,
    * like pandas merge_asof / DuckDB ASOF JOIN).
    *
    * `toleranceUs`: with Some(t), matches older than t microseconds
    * are nulled out (pandas `tolerance=` semantics) — the left row
    * survives with a NULL match, it is never dropped.
    *
    * Output: all `leftCols`, then matched_<idCol>, matched_<tsCol>,
    * one matched_<v> per `rightVals`, and gap_us (left ts − matched
    * ts, NULL when unmatched). Carried values are projected, never
    * recomputed — bit-identical across engines, no rounding needed.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      ts: String, idCol: String, rightVals: Seq[String],
      toleranceUs: Option[Long] = None): DataFrame = {
    val payload = struct(
      (Seq(col(ts).as("m_ts"), col(idCol).as("m_id")) ++
        rightVals.map(v => col(v).as(s"m_$v"))): _*)
    val l = left.select(col(key), col(ts), col(idCol), lit(1).as("_side"))
    val r = right.select(col(key), col(ts), col(idCol), lit(0).as("_side"),
      payload.as("_r"))
    // ORDER BY (ts, side, id): right rows precede left at equal ts
    // (inclusive semantics) and the last right row in order is the
    // (max ts, max id) one — exactly the oracle's
    // row_number() OVER (ORDER BY r.ts DESC, r.id DESC) = 1 pick.
    val w = Window.partitionBy(key).orderBy(ts, "_side", idCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    // unionByName(allowMissingColumns): the left side has no `_r`
    // payload — it is null-filled with the RIGHT side's resolved
    // struct type (no hand-written null cast to drift out of sync)
    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_m", last("_r", ignoreNulls = true).over(w))
      .where(col("_side") === 1)
    val inTol = toleranceUs match {
      case Some(t) => col("_m").isNotNull &&
        col(ts) - col("_m.m_ts") <= t
      case None => col("_m").isNotNull
    }
    matched.select(
      (Seq(col(idCol), col(key), col(ts)) ++
        Seq(when(inTol, col("_m.m_id")).as(s"matched_$idCol"),
          when(inTol, col("_m.m_ts")).as(s"matched_$ts"),
          when(inTol, col(ts) - col("_m.m_ts")).as("gap_us")) ++
        rightVals.map(v =>
          when(inTol, col(s"_m.m_$v")).as(s"matched_$v"))): _*)
      .orderBy(idCol)
  }

  /** Point-in-interval (range) join: every point row paired with the
    * interval rows of the same `key` that contain it
    * (start <= point <= end, both ends inclusive).
    *
    * Scale path — bucketed equi-join: a raw range predicate has no
    * equality conjunct, so Spark would plan a broadcast-nested-loop
    * (quadratic per key). Instead both sides are mapped onto
    * fixed-width time buckets — points to the one bucket containing
    * them, intervals EXPLODED to every bucket they overlap — and the
    * join becomes an equi-join on (key, bucket) followed by the exact
    * containment filter. Cost: |points| + Σ(interval_len/bucketUs + 1)
    * join-input rows, one shuffle, sort-merge/hash join — linear for
    * intervals short relative to `bucketUs` (pick bucketUs ≈ the
    * median interval length; a pathological interval spanning B
    * buckets costs B rows, never |points_in_B| × 1).
    *
    * Intervals with end < start are dropped (empty by definition);
    * NULL bounds never match (sequence() of NULL explodes nothing).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      key: String, pointCol: String, startCol: String, endCol: String,
      bucketUs: Long, pointProj: Seq[String], intervalProj: Seq[String])
      : DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val p = points.select(
      (Seq(col(key), col(pointCol)) ++ pointProj.map(col)): _*)
      .withColumn("_bkt", col(pointCol) divide_bucket bucketUs)
    val iv = intervals
      .where(col(startCol) <= col(endCol))
      .select((Seq(col(key), col(startCol), col(endCol)) ++
        intervalProj.map(col)): _*)
      .withColumn("_bkt", explode(sequence(
        col(startCol) divide_bucket bucketUs,
        col(endCol) divide_bucket bucketUs)))
    p.join(iv, Seq(key, "_bkt"))
      .where(col(pointCol) >= col(startCol) &&
        col(pointCol) <= col(endCol))
      .select((Seq(col(key), col(pointCol)) ++ pointProj.map(col) ++
        intervalProj.map(col)): _*)
  }

  /** Interval × interval overlap join via the same bucket
    * decomposition: each side explodes its interval onto covering
    * `bucketUs` buckets, candidates meet on bucket equality, and the
    * true-overlap predicate (a.start < b.end ∧ b.start < a.end,
    * strict — zero-length touching does not overlap) verifies. A
    * pair sharing k buckets would match k times; it is kept ONLY in
    * the first SHARED bucket (bucket == max(floor(a.start),
    * floor(b.start)) — a map-side-decidable dedup, so no
    * distinct/groupBy over the pair set ever runs. Output carries
    * both projections plus the exact `overlap_us`.
    *
    * Scale shape: shuffle keys are (bucket), join fan-out is
    * |intervals per bucket|² per bucket — pick bucketUs ≈ median
    * interval length so occupancy stays O(concurrency), and the
    * quadratic term is the TRUE concurrent-pair count the query
    * asks for, not an artifact. `cond` prunes candidate pairs
    * (e.g. different users only) INSIDE the join, before any
    * materialization. */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      startCol: String, endCol: String, bucketUs: Long,
      leftProj: Seq[String], rightProj: Seq[String],
      cond: org.apache.spark.sql.Column): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    def side(df: DataFrame, p: String, proj: Seq[String]): DataFrame =
      df.where(col(startCol) <= col(endCol))
        .select(proj.map(c => col(c).as(s"$p$c")) ++ Seq(
          col(startCol).as(s"${p}start"), col(endCol).as(s"${p}end")): _*)
        .withColumn("_bkt", explode(sequence(
          col(s"${p}start") divide_bucket bucketUs,
          col(s"${p}end") divide_bucket bucketUs)))
    val a = side(left, "a_", leftProj)
    val b = side(right, "b_", rightProj)
    a.join(b, Seq("_bkt"))
      .where(cond &&
        col("a_start") < col("b_end") && col("b_start") < col("a_end") &&
        col("_bkt") === greatest(
          col("a_start") divide_bucket bucketUs,
          col("b_start") divide_bucket bucketUs))
      .select(leftProj.map(c => col(s"a_$c")) ++
        rightProj.map(c => col(s"b_$c")) :+
        (least(col("a_end"), col("b_end")) -
          greatest(col("a_start"), col("b_start"))).as("overlap_us"): _*)
  }

  /** Exact integer floor-division onto buckets (negative-safe:
    * Spark's `div` truncates toward zero, so true floor needs the
    * pmod correction for pre-epoch timestamps; pmod is non-negative
    * by definition, making (c − pmod(c,b))/b the mathematical
    * floor). Pure long arithmetic — no double rounding anywhere near
    * a bucket boundary. */
  implicit private class BucketOps(c: org.apache.spark.sql.Column) {
    def divide_bucket(b: Long): org.apache.spark.sql.Column =
      ((c - pmod(c, lit(b))) / b).cast("long")
  }
}
