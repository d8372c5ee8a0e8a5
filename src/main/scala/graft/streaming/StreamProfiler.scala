package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.det.Sig.sig5

/** Continuous profiling over event-time streams — the reference is
  * batch-only (SURVEY.md §2.2: streaming absent); this is the
  * Spark-native extension mapping the same per-column statistics onto
  * Structured Streaming tumbling windows.
  *
  * Usage shape (file/kafka source):
  * {{{
  *   val events = spark.readStream.schema(sch).parquet(dir)
  *   StreamProfiler.windowedStats(events)
  *     .writeStream.outputMode("append")
  *     .option("checkpointLocation", ckpt).start(out)
  * }}}
  *
  * Scale notes: state is bounded by (windows in watermark horizon ×
  * group keys); the watermark both bounds state and defines late-data
  * drop semantics. Aggregations are the same fused partial/final hash
  * aggs as the batch path — the streaming micro-batch planner reuses
  * Catalyst's plans, so the batch EventOps.windowedStats is the exact
  * replay/backfill equivalent (verified in StreamingSpec and by the
  * events_window oracle query).
  */
object StreamProfiler {

  /** Event-time column normalization: nanosecond LONGs (parquet
    * TIMESTAMP(NANOS) read under nanosAsLong) become micros-precision
    * timestamps; anything else casts straight to timestamp. */
  def eventTime(events: DataFrame, tsCol: String): Column =
    if (events.schema(tsCol).dataType ==
        org.apache.spark.sql.types.LongType)
      timestamp_micros(expr(s"`$tsCol` div 1000"))
    else col(tsCol).cast("timestamp")

  /** Tumbling-window count/mean/min/max per event type over an
    * event-time stream. Late rows beyond `watermark` are dropped. */
  def windowedStats(events: DataFrame, tsCol: String = "ts",
      watermark: String = "10 minutes", windowLen: String = "1 hour")
      : DataFrame =
    events
      .withColumn("__ts", eventTime(events, tsCol))
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sig5(avg("value")).as("avg_value"),
        min("value").as("min_value"), max("value").as("max_value"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("cnt"), col("avg_value"),
        col("min_value"), col("max_value"))

  /** Streaming deduplication with bounded state: drops rows whose
    * `keyCols` were already seen within the watermark horizon
    * (`dropDuplicatesWithinWatermark` — state is garbage-collected
    * as event time advances, unlike a plain dropDuplicates whose
    * state grows forever). This is the streaming twin of
    * [[graft.ops.Dedup.exactStats]]'s content dedup: the ingest-time
    * guard of a training-data pipeline, with the batch operators as
    * the backfill/audit path. */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
      tsCol: String = "ts", watermark: String = "10 minutes")
      : DataFrame =
    events
      .withColumn("__ts", eventTime(events, tsCol))
      .withWatermark("__ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Windowed numeric profile: the batch profiler's fused moment agg
    * (count/mean/min/max/stddev + zeros) per tumbling window, for any
    * set of numeric columns — a continuously-maintained description
    * set. */
  def windowedNumericProfile(events: DataFrame, tsCol: String,
      cols: Seq[String], watermark: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame = {
    def d(c: String): Column = col(c).cast("double")
    val aggs = cols.flatMap { c =>
      Seq(count(d(c)).as(s"n__$c"), avg(d(c)).as(s"mean__$c"),
        min(d(c)).as(s"min__$c"), max(d(c)).as(s"max__$c"),
        stddev_samp(d(c)).as(s"sd__$c"),
        coalesce(sum(when(d(c) === 0.0, 1L).otherwise(0L)), lit(0L))
          .as(s"z__$c"))
    }
    val w = events
      .withColumn("__ts", eventTime(events, tsCol))
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), windowLen))
      .agg(aggs.head, aggs.tail: _*)
    val structs = cols.map { c =>
      struct(lit(c).as("col_name"), col(s"n__$c").as("n"),
        sig5(col(s"mean__$c")).as("mean"), col(s"min__$c").as("min_val"),
        col(s"max__$c").as("max_val"), sig5(col(s"sd__$c")).as("stddev"),
        col(s"z__$c").as("n_zeros"))
    }
    w.select(unix_micros(col("window.start")).as("window_start_us"),
      explode(array(structs: _*)).as("s")).select("window_start_us", "s.*")
  }
}
