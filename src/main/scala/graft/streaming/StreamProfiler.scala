package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.det.Sig.sig5

/** Open-session state carried between micro-batches by
  * [[StreamProfiler.sessionizeStream]] (per user). */
case class SessionState(startUs: Long, endUs: Long, n: Long, idx: Long)

/** A closed session — same schema as the batch
  * [[graft.ops.EventOps.sessionize]] output. */
case class SessionOut(user_id: Long, session_idx: Long,
    session_start_us: Long, session_end_us: Long, n_events: Long)

/** Last-seen right-side payload carried per key by
  * [[StreamProfiler.asofStream]]. */
case class AsofState(ts: Long, id: Long, value: Double)

/** One matched (or unmatched) left row — same schema as the batch
  * [[graft.ops.TemporalJoin.asofJoin]] output. */
case class AsofOut(event_id: Long, user_id: Long, us: Long,
    matched_event_id: Option[Long], matched_us: Option[Long],
    gap_us: Option[Long], matched_value: Option[Double])

/** Last event seen per user, carried between micro-batches by
  * [[StreamProfiler.stepStream]]. */
case class StepState(us: Long, eid: Long, tpe: String)

/** Last TWO events per user, carried between micro-batches by
  * [[StreamProfiler.pathStream]] (prev2 empty until the user has
  * two events). */
case class PathState(us1: Long, eid1: Long, t1: String,
    us2: Long, eid2: Long, t2: String, hasTwo: Boolean)

/** One 3-step journey — the [[graft.ops.EventOps.topPaths]] path
  * contract; `us` is the third event's time. */
case class PathOut(user_id: Long, t1: String, t2: String, t3: String,
    us: Long)

/** One Markov step — same (event_type, next_type) contract as the
  * batch [[graft.ops.EventOps.transitionMatrix]] step derivation;
  * `us` is the timestamp of the step's SECOND event (the moment the
  * transition became observable). */
case class StepOut(user_id: Long, event_type: String,
    next_type: String, us: Long)

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

  /** Tumbling- or sliding-window count/mean/min/max per event type
    * over an event-time stream (`slide` defaults to the window length
    * = tumbling; a shorter slide gives the overlapping-window
    * monitoring view — batch twin: EventOps.slidingWindowStats). Late
    * rows beyond `watermark` are dropped. */
  def windowedStats(events: DataFrame, tsCol: String = "ts",
      watermark: String = "10 minutes", windowLen: String = "1 hour",
      slide: Option[String] = None): DataFrame =
    events
      .withColumn("__ts", eventTime(events, tsCol))
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), windowLen,
        slide.getOrElse(windowLen)), col("event_type"))
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

  /** Streaming sessionization with CUSTOM state — the
    * `flatMapGroupsWithState` surface (arbitrary per-key state, which
    * windowed aggregation cannot express): per user, events within
    * `gapUs` of the open session extend it; a larger gap closes and
    * emits it; the event-time timeout fires once the watermark passes
    * the open session's end + gap, emitting the final session without
    * waiting for more input. State is one small (4-long) record per
    * user ever seen: the timeout shrinks a closed session's state to
    * a tombstone carrying the session counter rather than deleting
    * it, because a monotone per-user `session_idx` requires
    * remembering the count — bounded by distinct users, not stream
    * length.
    *
    * Semantics twin of the batch [[graft.ops.EventOps.sessionize]]
    * (same output schema and session boundaries; equivalence is
    * asserted in StreamingSpec). Caveat shared by every incremental
    * sessionizer: an event that arrives AFTER its session was already
    * closed (later micro-batch, still inside the watermark) starts a
    * new session instead of reopening the emitted one — the batch
    * operator is the authoritative backfill/audit path. */
  def sessionizeStream(events: DataFrame, tsCol: String = "ts",
      userCol: String = "user_id", gapUs: Long = 1800000000L,
      watermark: String = "10 minutes"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // the watermarked __ts column must survive into the grouped
    // dataset or the event-time timeout is rejected at analysis
    val prepared = events
      .withColumn("__ts", eventTime(events, tsCol))
      .withWatermark("__ts", watermark)
      .select(col(userCol).cast("long").as("user_id"),
        unix_micros(col("__ts")).as("us"), col("__ts"))
      .as[(Long, Long, java.sql.Timestamp)]
    prepared
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, rows, state) =>
          if (state.hasTimedOut) {
            // close the open session but KEEP the state as an n=0
            // tombstone carrying the session counter: removing it
            // would restart session_idx at 1 on the user's next
            // event, colliding (user_id, session_idx) keys and
            // breaking batch parity. State is therefore one tiny
            // record per user ever seen — the price of a monotone
            // per-user session index (any correct incremental
            // numberer must remember the count); no new timeout is
            // registered for the tombstone.
            val s = state.get
            state.update(s.copy(n = 0L))
            Iterator(SessionOut(user, s.idx, s.startUs, s.endUs, s.n))
          } else {
            val times = rows.map(_._2).toSeq.sorted
            val out = scala.collection.mutable.Buffer.empty[SessionOut]
            var cur = state.getOption
            for (t <- times) {
              cur match {
                case Some(s) if s.n == 0L => // tombstone: next session
                  cur = Some(SessionState(t, t, 1L, s.idx + 1))
                case Some(s)
                    if t >= s.startUs - gapUs && t - s.endUs <= gapUs =>
                  cur = Some(s.copy(startUs = math.min(s.startUs, t),
                    endUs = math.max(s.endUs, t), n = s.n + 1))
                case Some(s) =>
                  out += SessionOut(user, s.idx, s.startUs, s.endUs, s.n)
                  cur = Some(SessionState(t, t, 1L, s.idx + 1))
                case None => cur = Some(SessionState(t, t, 1L, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout once the watermark passes end + gap; must be
              // strictly ahead of the current watermark or Spark
              // rejects it (a very late group's session closes on the
              // next watermark advance instead). Tombstones register
              // no timeout.
              if (s.n > 0L)
                state.setTimeoutTimestamp(math.max(
                  s.endUs / 1000L + gapUs / 1000L,
                  state.getCurrentWatermarkMs() + 1L))
            }
            out.iterator
          }
      }.toDF()
  }

  /** Markov step extraction at ingest — the streaming twin of the
    * step derivation inside [[graft.ops.EventOps.transitionMatrix]]
    * and [[graft.ops.EventOps.sequenceAnomaly]]: per user, every
    * consecutive (event_type → next_type) step, ACROSS micro-batch
    * boundaries, via one tiny last-event record per user (a lead()
    * window cannot run on an unbounded stream; the state here is
    * exactly the carry it would need). Within a micro-batch rows
    * process in (us, event_id) order — the batch tie-break; across
    * batches steps follow arrival order, so an event arriving after
    * a later one was already absorbed yields steps in arrival order
    * (the sessionizeStream caveat — the batch operator is the
    * audit/backfill path; in-order feeds reproduce it exactly,
    * asserted in StreamingSpec). Downstream, `groupBy(window(...),
    * event_type, next_type).count` over this stream is live
    * transition-mix monitoring with the same counts the batch matrix
    * aggregates; `us` is the step's second event (when the
    * transition became observable). */
  def stepStream(events: DataFrame, tsCol: String = "ts",
      userCol: String = "user_id", watermark: String = "10 minutes")
      : DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val prepared = events
      .withColumn("__ts", eventTime(events, tsCol))
      .withWatermark("__ts", watermark)
      .select(col(userCol).cast("long").as("user_id"),
        col("event_id").cast("long").as("eid"),
        col("event_type").as("tpe"),
        unix_micros(col("__ts")).as("us"), col("__ts"))
      .as[(Long, Long, String, Long, java.sql.Timestamp)]
    prepared.groupByKey(_._1)
      .flatMapGroupsWithState[StepState, StepOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, rows, state) =>
          val sorted = rows.toSeq.sortBy(r => (r._4, r._2))
          val out = scala.collection.mutable.Buffer.empty[StepOut]
          var cur = state.getOption
          for (r <- sorted) {
            cur.foreach(p => out += StepOut(user, p.tpe, r._3, r._4))
            cur = Some(StepState(r._4, r._2, r._3))
          }
          cur.foreach(state.update)
          out.iterator
      }.toDF()
  }

  /** 3-step journey extraction at ingest — the streaming twin of
    * [[graft.ops.EventOps.topPaths]]'s chained-lead derivation: the
    * per-user state is the last TWO events (the carry two leads
    * would need), so paths spanning micro-batch boundaries are
    * emitted exactly once. Ordering/caveat contract identical to
    * [[stepStream]]. A windowed `groupBy(window(us), t1, t2, t3)
    * .count` over this stream is live journey-mix monitoring. */
  def pathStream(events: DataFrame, tsCol: String = "ts",
      userCol: String = "user_id", watermark: String = "10 minutes")
      : DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val prepared = events
      .withColumn("__ts", eventTime(events, tsCol))
      .withWatermark("__ts", watermark)
      .select(col(userCol).cast("long").as("user_id"),
        col("event_id").cast("long").as("eid"),
        col("event_type").as("tpe"),
        unix_micros(col("__ts")).as("us"), col("__ts"))
      .as[(Long, Long, String, Long, java.sql.Timestamp)]
    prepared.groupByKey(_._1)
      .flatMapGroupsWithState[PathState, PathOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, rows, state) =>
          val sorted = rows.toSeq.sortBy(r => (r._4, r._2))
          val out = scala.collection.mutable.Buffer.empty[PathOut]
          var cur = state.getOption
          for (r <- sorted) {
            cur match {
              case Some(s) if s.hasTwo =>
                out += PathOut(user, s.t1, s.t2, r._3, r._4)
                cur = Some(PathState(s.us2, s.eid2, s.t2,
                  r._4, r._2, r._3, hasTwo = true))
              case Some(s) =>
                cur = Some(PathState(s.us2, s.eid2, s.t2,
                  r._4, r._2, r._3, hasTwo = true))
              case None =>
                cur = Some(PathState(0L, 0L, "",
                  r._4, r._2, r._3, hasTwo = false))
            }
          }
          cur.foreach(state.update)
          out.iterator
      }.toDF()
  }

  /** Streaming backward as-of join — the incremental twin of the
    * batch [[graft.ops.TemporalJoin.asofJoin]]: one event stream
    * carrying both sides (rows whose `event_type` is `leftType` are
    * matched against the most recent `rightType` row of the same
    * user at-or-before their event time, `toleranceUs` semantics as
    * in the batch operator).
    *
    * State is ONE small record per user: the latest right payload
    * (ts, id, value) — exactly the carry the batch union-marker
    * window maintains per partition, made persistent across
    * micro-batches. Within a batch, rows process in (ts,
    * right-before-left, id) order, so intra-batch semantics equal the
    * batch operator exactly.
    *
    * Incremental caveat (shared by any single-state as-of stream): a
    * LEFT row arriving after a NEWER right was already absorbed into
    * state emits unmatched rather than matching the older right the
    * batch operator would find (the state guard `s.ts <= us` keeps it
    * from matching forward in time — never a wrong match, only a
    * conservative miss); late RIGHT rows older than the state are
    * ignored. In-event-time-order feeds reproduce the batch result
    * exactly (asserted in StreamingSpec); the batch operator is the
    * authoritative backfill path. */
  def asofStream(events: DataFrame, leftType: String, rightType: String,
      tsCol: String = "ts", toleranceUs: Option[Long] = None,
      watermark: String = "10 minutes"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val prepared = events
      .withColumn("__ts", eventTime(events, tsCol))
      .withWatermark("__ts", watermark)
      .where(col("event_type").isin(leftType, rightType))
      .select(col("user_id").cast("long"),
        unix_micros(col("__ts")).as("us"),
        col("event_id").cast("long"),
        (col("event_type") === leftType).as("isLeft"),
        col("value").cast("double"))
      .as[(Long, Long, Long, Boolean, Double)]
    prepared
      .groupByKey(_._1)
      .flatMapGroupsWithState[AsofState, AsofOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, rows, state) =>
          // (ts, side, id): right sorts before left at equal ts
          // (Ordering[Boolean]: false < true) — inclusive <= matching
          val sorted = rows.toSeq.sortBy(r => (r._2, r._4, r._3))
          val out = scala.collection.mutable.Buffer.empty[AsofOut]
          for ((_, us, id, isLeft, value) <- sorted) {
            if (!isLeft) {
              // keep the lexicographically-greatest (ts, id) right;
              // a cross-batch late right never regresses the state
              if (state.getOption.forall(s =>
                  us > s.ts || (us == s.ts && id > s.id)))
                state.update(AsofState(us, id, value))
            } else {
              val m = state.getOption.filter(s => s.ts <= us &&
                toleranceUs.forall(t => us - s.ts <= t))
              out += AsofOut(id, user, us, m.map(_.id), m.map(_.ts),
                m.map(us - _.ts), m.map(_.value))
            }
          }
          out.iterator
      }.toDF()
  }

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

  /** Windowed MULTI-SKETCH profile: the fused single-scan profiler
    * aggregate ([[graft.functions.MultiSketchAgg]]) per tumbling
    * window — count, streaming moments, KMV distinct estimate and a
    * GK median continuously maintained per column. The aggregate's
    * serialize/merge contract is exactly what the streaming state
    * store needs: per-window sketch buffers persist across
    * micro-batches and merge on arrival, state O(k + accuracy) per
    * window regardless of row count. */
  def windowedSketchProfile(events: DataFrame, tsCol: String,
      cols: Seq[String], watermark: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame = {
    val aggs = cols.map { c =>
      graft.functions.MultiSketch.sketch(col(c).cast("double"),
        when(col(c).isNotNull, xxhash64(col(c)))).as(s"ms__$c")
    }
    val w = events
      .withColumn("__ts", eventTime(events, tsCol))
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), windowLen))
      .agg(aggs.head, aggs.tail: _*)
    val structs = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"ms__$c.cnt").as("n"),
        col(s"ms__$c.dis").as("distinct_est"),
        sig5(col(s"ms__$c.mean")).as("mean"),
        col(s"ms__$c.mn").as("min_val"),
        col(s"ms__$c.mx").as("max_val"),
        element_at(col(s"ms__$c.qs"), 3).as("median_est"))
    }
    w.select(unix_micros(col("window.start")).as("window_start_us"),
      explode(array(structs: _*)).as("s")).select("window_start_us", "s.*")
  }

  /** Windowed heavy hitters: one O(k) Misra–Gries buffer
    * ([[graft.functions.MisraGriesAgg]]) per tumbling window — "which
    * items dominate the feed right now" maintained continuously. The
    * aggregate's serialize/merge contract (PODS-2012 mergeable form)
    * is exactly what the state store needs: per-window MG counters
    * persist across micro-batches and merge on arrival, state O(k)
    * per window regardless of stream volume. Estimates are
    * merge-order dependent; the MG guarantees (underestimate, error
    * ≤ n/(k+1), coverage of every item above that threshold) hold for
    * ANY micro-batch arrival order — assert those, not raw counts
    * (StreamingSpec does). */
  def windowedHeavyHitters(events: DataFrame, tsCol: String = "ts",
      itemCol: String = "event_type", k: Int = 8,
      watermark: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withColumn("__ts", eventTime(events, tsCol))
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), windowLen))
      .agg(graft.functions.HeavyHitters.mg(col(itemCol), k).as("mg"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("mg.n").as("n"), col("mg.items").as("items"))

  /** The [[graft.ops.TextStats.boilerplateGrams]] monitor on an
    * unbounded document INGEST stream: Misra–Gries heavy hitters
    * over the per-document distinct word n-grams (the SAME gram
    * derivation as the batch report — shared helper, the twins
    * cannot drift). State is O(k) per partition with a linear MG
    * merge — no unbounded distinct-gram state, no gram shuffle;
    * emit under `complete` mode (one global row). The items map
    * OVER-APPROXIMATES the true boilerplate head (the MG guarantee:
    * any gram in more than n/(k+1) documents survives); the batch
    * [[graft.ops.TextStats.boilerplateGrams]] recount certifies the
    * shortlist — the cat_heavy_hitters two-pass contract applied to
    * a stream. */
  def hotGramStream(docs: DataFrame, textCol: String = "text",
      n: Int = 3, k: Int = 16): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(split(col(textCol), " ").as("__toks"))
      .select(explode(
        graft.ops.TextStats.distinctGrams(col("__toks"), n)).as("gram"))
      .agg(graft.functions.HeavyHitters.mg(col("gram"), k).as("mg"))
      .select(col("mg.n").as("n_grams"), col("mg.items").as("items"))

  /** Streaming twin of [[graft.ops.Search.knBigramNll]]: score a
    * document stream against a FROZEN Kneser–Ney model (the static
    * frames [[graft.ops.Search.knTrain]] produced — train offline,
    * gate online, the CCNet deployment shape). The per-bigram scorer
    * is the exact batch expression tree (shared code, so the two can
    * never drift); it is stateless stream-static joins, and the only
    * state is the per-(window, doc) aggregate inside the watermark
    * horizon. Emits (window, doc_id, n_bigrams, nll, ppl) on window
    * close — append-mode legal. */
  def knScoreStream(docs: DataFrame, lm: graft.ops.Search.KnLm,
      idCol: String = "doc_id", textCol: String = "text",
      tsCol: String = "ts", watermark: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame = {
    val pairs = graft.ops.Search.bigramPairsCarry(
      docs.where(col(textCol).isNotNull), idCol, textCol,
      Seq("__ts" -> eventTime(docs, tsCol)))
    graft.ops.Search.knScoreBigrams(pairs, lm)
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), windowLen), col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        graft.det.Sig.sig5(avg(col("nl"))).as("nll"),
        graft.det.Sig.sig5(exp(avg(col("nl")))).as("ppl"))
      .select(col("window.start").as("window_start"), col("doc_id"),
        col("n_bigrams"), col("nll"), col("ppl"))
  }

  /** Streaming Count–Min: per event-time window, the d×w counter
    * frame of `valCol` ([[graft.ops.CatStats.countMinSketch]]'s
    * twin — same portable buckets, so window sketches ADD
    * counter-wise with each other and with batch sketches, the
    * mergeable contract). One stateful aggregation over the d-way
    * exploded stream; state is O(open windows · d · w) regardless
    * of stream rate. Emits (window_start, i, b, mc) on close. */
  def windowedCountMin(events: DataFrame, valCol: String,
      tsCol: String = "ts", watermark: String = "10 minutes",
      windowLen: String = "1 hour", d: Int = 4, w: Int = 256)
      : DataFrame = {
    val withTs = events
      .withColumn("__ts", eventTime(events, tsCol))
      .select(col("__ts"), col(valCol).cast("string").as("v"))
      .select(col("__ts"), col("v"),
        explode(typedLit((0 until d).map(_.toLong).toList)).as("i"))
    withTs
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), windowLen), col("i"),
        graft.ops.CatStats.cmBucket(col("v"), col("i"), w).as("b"))
      .agg(count(lit(1)).as("mc"))
      .select(col("window.start").as("window_start"), col("i"),
        col("b"), col("mc"))
  }

  /** Streaming twin of the learned quality filter
    * ([[graft.ops.Classifier]]): per event-time window, the doc
    * count, mean model keep-probability, the share the model would
    * keep at the 0.5 threshold, and the share the TEACHER gate
    * keeps — "is the learned filter still tracking the gate on live
    * traffic". The model is FROZEN (trained offline, loaded via
    * [[graft.ops.Classifier.loadLrModel]]); the per-doc path is the
    * batch featurizer + scorer with the event time riding the carry
    * columns (one map-only projection — the ruleGateStream
    * contract), so the only state is O(1) sums per open window. */
  def lrScoreStream(docs: DataFrame, m: graft.ops.Classifier.LrModel,
      th: graft.ops.QualityRules.Thresholds,
      idCol: String = "doc_id", textCol: String = "text",
      tsCol: String = "ts", watermark: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame = {
    val withTs = docs.where(col(textCol).isNotNull)
      .withColumn("__ts", eventTime(docs, tsCol))
    val scoredDocs = graft.ops.Classifier.scored(
      graft.ops.Classifier.featurize(withTs, idCol, textCol, th,
        carry = Seq("__ts")), m, carry = Seq("__ts"))
    scoredDocs
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), windowLen))
      .agg(count(lit(1)).as("n_docs"),
        graft.det.Sig.sig5(avg(col("prob"))).as("avg_prob"),
        graft.det.Sig.sig5(avg(when(col("prob") >= 0.5, 1.0)
          .otherwise(0.0))).as("model_keep_share"),
        graft.det.Sig.sig5(avg(col("label").cast("double")))
          .as("gate_keep_share"))
      .select(col("window.start").as("window_start"), col("n_docs"),
        col("avg_prob"), col("model_keep_share"),
        col("gate_keep_share"))
  }

  /** Streaming twin of [[graft.ops.QualityRules.filterFunnel]]: per
    * event-time window, the first-failing-rule counts of the
    * document stream — "did a rule start eating the crawl THIS
    * hour". The per-doc assignment is the batch operator's own
    * map-only projection (shared code, no histogram shuffle — the
    * in-row repetition fold), so the only state is O(rules) counters
    * per open window. Emits (window_start, rule_idx, rule, n_docs)
    * on window close; survival/share arithmetic is the downstream
    * batch funnel's job on the closed rows (zero-count rules are
    * absent here — a stream can't cross a literal frame per window
    * without a stateful join; the batch funnel table remains the
    * zero-complete form). */
  def ruleGateStream(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      tsCol: String = "ts", watermark: String = "10 minutes",
      windowLen: String = "1 hour",
      minTokens: Long = 50L, maxTokens: Long = 100000L,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      minStopwords: Long = 2L, maxTopTokenFrac: Double = 0.2)
      : DataFrame = {
    val withTs = docs.where(col(textCol).isNotNull)
      .withColumn("__ts", eventTime(docs, tsCol))
    // the event time rides ruleAssign's carry columns — the whole
    // per-doc path stays ONE map-only projection (a join back onto
    // the input would be an illegal stream-stream self-join)
    val assigned = graft.ops.QualityRules.ruleAssign(
      withTs, idCol, textCol, minTokens, maxTokens,
      minMeanWordLen, maxMeanWordLen, minStopwords, maxTopTokenFrac,
      carry = Seq("__ts"))
    val names = graft.ops.QualityRules.RuleNames
    val nameOf = names.zipWithIndex.foldLeft(lit(names.last)) {
      case (acc, (nm, i)) =>
        when(col("rule_idx") === i.toLong, lit(nm)).otherwise(acc)
    }
    assigned
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), windowLen), col("rule_idx"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("window.start").as("window_start"), col("rule_idx"),
        nameOf.as("rule"), col("n_docs"))
  }

  /** Native session-window aggregation (`session_window(ts, gap)`) —
    * the DECLARATIVE alternative to [[sessionizeStream]]'s custom
    * flatMapGroupsWithState state machine: Spark's own session
    * operator merges windows within `gap` per grouping key, state
    * bounded by open sessions inside the watermark horizon. Emits the
    * same session boundaries as the batch
    * [[graft.ops.EventOps.sessionize]] with `session_end_us` =
    * last-event time + gap (the session_window end convention;
    * StreamingSpec asserts the exact correspondence). Use this form
    * when per-session COUNTS/aggregates suffice; the custom
    * sessionizer remains for monotone per-user session indexing,
    * which a window aggregation cannot express. */
  def sessionWindowStats(events: DataFrame, tsCol: String = "ts",
      gap: String = "30 minutes", watermark: String = "10 minutes")
      : DataFrame =
    events
      .withColumn("__ts", eventTime(events, tsCol))
      .withWatermark("__ts", watermark)
      .groupBy(session_window(col("__ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"))

  /** Streaming IVF cell assignment — the ingest-time twin of the
    * batch ANN family ([[graft.ops.Similarity.ivfAssign]]): each
    * arriving vector is mapped to its nearest codebook cell. The
    * codebook is O(C·dim) plan constants (exactly as in the batch
    * plan), so this is a STATELESS map-only projection — no state
    * store, no watermark required, append-mode trivially legal, and
    * batch/stream results are identical by construction (the
    * micro-batch planner runs the very same Catalyst projection;
    * asserted in StreamingSpec). This is the indexing half of a
    * continuously-maintained IVF index: assignments stream out as
    * vectors arrive while the batch path rebuilds/audits offline. */
  def ivfAssignStream(vecs: DataFrame, idCol: String, vecCol: String,
      cents: Seq[(Long, Array[Double], Double)], dim: Int = 64)
      : DataFrame =
    graft.ops.Similarity.ivfAssign(vecs, idCol, vecCol, cents, dim)

  /** Streaming ANN-index ingest — the streaming twin of
    * [[graft.ops.AnnIndex.appendAnnIndex]]: each arriving vector is
    * coarse-cell-assigned AND PQ-encoded against the persisted
    * index's FROZEN codebooks (loaded once at stream setup — static
    * driver state, exactly like the IVF codebook above) in one
    * stateless projection — no shuffle, no state store, no
    * watermark, append-mode legal. Returns (vec_id, codes, mse,
    * cell); point the sink at the index's `codes` dir partitioned by
    * `cell` and the persisted index grows continuously with probe ≡
    * batch-append equality by construction (same expression tree —
    * batch-equivalence unit-tested). */
  def annEncodeStream(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, vecs: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    import graft.ops.AnnIndex
    val meta = AnnIndex.readMeta(spark, indexPath)
    val (ivfCents, cbs) = AnnIndex.readCodebooks(spark, indexPath, meta)
    AnnIndex.encodeWithCell(
      vecs.where(size(col(vecCol)) === meta.dim)
        .select(col(idCol).as("vid"), col(vecCol).as("v")),
      ivfCents, cbs, meta.pqLo, meta.dim, meta.m)
  }

  /** Streaming leakage-aware split routing — the ingest-time twin of
    * [[graft.ops.Sampling.splitAssign]]: each arriving document is
    * routed to train/val/test by the MINSTD mille of its near-dup
    * cluster representative. `clusters` is a STATIC frame (the
    * persisted clusters the batch dedup pass produced — rebuilt
    * offline per corpus version, like the IVF codebook above), so
    * this is a stateless stream-static left join + map-only mille:
    * no state store, no watermark, append-mode legal, batch/stream
    * equal by construction. A brand-new doc (no catalog cluster yet)
    * routes by its own id — consistent with the batch operator's
    * treatment of unclustered docs. */
  def splitAssignStream(docs: DataFrame, clusters: DataFrame,
      idCol: String, trainPerMille: Int = 800, valPerMille: Int = 100)
      : DataFrame =
    graft.ops.Sampling.splitAssign(docs, clusters, idCol,
      trainPerMille, valPerMille)

  /** Per-window categorical CONTINGENCY — the streaming feed of the
    * association family ([[graft.ops.CatStats.association]]): per
    * event-time window, the (value-a, value-b) co-occurrence counts
    * of two categorical facets. Each closed window's slice IS a
    * contingency frame (va, vb, nij), so the batch per-pair math
    * (Cramér's V / Theil's U) runs on it directly downstream —
    * "did the association between these facets shift this hour" as
    * a drift signal. State = O(card_a·card_b) counters per open
    * window; NULL categories survive (the cat_entropy contract —
    * groupBy keeps null keys). */
  def windowedContingency(events: DataFrame, a: String, b: String,
      tsCol: String = "ts", watermark: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withColumn("__ts", eventTime(events, tsCol))
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), windowLen),
        col(a).as("va"), col(b).as("vb"))
      .agg(count(lit(1)).as("nij"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("va"), col("vb"), col("nij"))

  /** Windowed metric trend — per (event-time window, type), the
    * value-over-time slope and r² from ONE-PASS sufficient statistics
    * (n, Σx, Σy, Σxy, Σx², Σy²): streaming state cannot do the batch
    * operator's two-pass centering, but within a window the x range
    * is tiny (≤ the window length in hours), so the one-pass form is
    * well-conditioned there — x is re-based to the WINDOW START
    * before the sums, which is what makes it so. Append-mode legal,
    * O(types) state per open window. */
  def windowedTrend(events: DataFrame, tsCol: String = "ts",
      watermark: String = "10 minutes", windowLen: String = "1 hour",
      windowUs: Long = 3600L * 1000000L): DataFrame = {
    require(windowUs > 0, "windowUs must match windowLen in micros")
    val withTs = events
      .withColumn("__ts", eventTime(events, tsCol))
      .withWatermark("__ts", watermark)
    // x = hours since the WINDOW START (tumbling windows are
    // epoch-aligned, so us mod windowUs is constant-shifted within a
    // window) — the rebase that keeps the one-pass sums conditioned
    val us = unix_micros(col("__ts"))
    val agg = withTs
      .where(col("value").isNotNull)
      .withColumn("__x",
        pmod(us, lit(windowUs)).cast("double") / lit(3.6e9))
      .groupBy(window(col("__ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("__x")).as("sx"), sum(col("value")).as("sy"),
        sum(col("__x") * col("value")).as("sxy"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("value") * col("value")).as("syy"))
    val covN = col("sxy") - col("sx") * col("sy") / col("n")
    val varX = col("sxx") - col("sx") * col("sx") / col("n")
    val varY = col("syy") - col("sy") * col("sy") / col("n")
    agg.select(unix_micros(col("window.start")).as("window_start_us"),
      col("event_type"), col("n").cast("long").as("n"),
      sig5(when(varX > 0, covN / varX)).as("slope_per_hour"),
      sig5(when(varX > 0 && varY > 0,
        covN * covN / (varX * varY))).as("r2"))
  }

  /** Windowed k-anonymity monitor — per event-time window, each
    * quasi-identifier group's size and at-risk flag (the ingest-time
    * twin of [[graft.ops.Privacy.kAnonymity]]): catches a batch
    * whose QI groups became singletons BEFORE it lands in a
    * releasable table. One windowed count aggregation; state =
    * O(QI groups) counters per open window, append-mode legal. The
    * batch operator's risk column is 1/n of the final count, so it
    * is computed here the same way from the windowed count —
    * per-window equality with the batch op is asserted in
    * StreamingSpec. */
  def windowedKAnonymity(events: DataFrame, qiCols: Seq[String],
      k: Long, tsCol: String = "ts",
      watermark: String = "10 minutes", windowLen: String = "1 hour")
      : DataFrame =
    events
      .withColumn("__ts", eventTime(events, tsCol))
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), windowLen) +: qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("window_start_us") +:
        (qiCols.map(col) ++ Seq(col("n"),
          sig5(lit(1.0) / col("n")).as("risk"),
          (col("n") < k).as("at_risk"))): _*)

  /** Windowed per-DOMAIN ingest counts — the streaming twin of
    * [[graft.ops.UrlOps.domainProfile]]'s counting core: per
    * event-time window, docs and tokens per registrable domain
    * (parse_url host, last-two-labels fold — the same expressions as
    * the batch op). The ingest-time hot-domain monitor: a crawler
    * stuck on one site shows up as a domain whose per-window count
    * explodes, BEFORE the corpus-level datasheet is ever built. One
    * windowed count aggregation; state = O(domains) counters per
    * open window, append-mode legal. Per-window equality with the
    * batch groupBy is asserted in StreamingSpec. */
  def windowedDomainCounts(events: DataFrame, urlCol: String,
      textCol: String, tsCol: String = "ts",
      watermark: String = "10 minutes", windowLen: String = "1 hour")
      : DataFrame = {
    val host = parse_url(col(urlCol), lit("HOST"))
    val domain = concat_ws(".", slice(split(host, "\\."), -2, 2))
    events
      .withColumn("__ts", eventTime(events, tsCol))
      .withWatermark("__ts", watermark)
      .withColumn("__domain", domain)
      .groupBy(window(col("__ts"), windowLen), col("__domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(graft.ops.TextStats.tokens(col(textCol)))
          .cast("long")).as("n_tokens"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("__domain").as("domain"), col("n_docs"), col("n_tokens"))
  }

  /** Windowed blocklist monitoring — per event-time window and
    * blocklist term, total occurrences and documents hit: the
    * streaming twin of [[graft.ops.Blocklist.termStats]] (an ingest
    * gate wants the PER-TERM hit trend, not a corpus constant). The
    * per-document scan is the same single Aho–Corasick pass
    * ([[graft.functions.AhoCorasickCount]], map-only, stateless);
    * state = O(terms) counters per open window. The counts array is
    * materialized in its own projection BEFORE posexplode so the
    * generator's pushed-down size filter cannot clone the AC scan. */
  def blocklistStatsStream(docs: DataFrame, terms: Seq[String],
      textCol: String = "text", tsCol: String = "ts",
      watermark: String = "10 minutes", windowLen: String = "1 hour")
      : DataFrame = {
    val withCnts = docs.where(col(textCol).isNotNull)
      .withColumn("__ts", eventTime(docs, tsCol))
      .select(col("__ts"), graft.functions.AhoCorasickCount
        .ac_counts(lower(col(textCol)), terms).as("cnts"))
    val termArr = typedLit(terms.toList)
    withCnts
      .select(col("__ts"), posexplode(col("cnts")).as(Seq("i", "n")))
      .select(col("__ts"),
        element_at(termArr, col("i") + 1).as("term"), col("n"))
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), windowLen), col("term"))
      .agg(sum("n").as("occurrences"),
        sum(when(col("n") > 0, 1L).otherwise(0L)).as("docs_hit"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("term"), col("occurrences"), col("docs_hit"))
  }

  /** Windowed IVF cell OCCUPANCY — per event-time window, how many
    * arriving vectors landed in each cell: the monitoring view over
    * [[ivfAssignStream]] that catches index skew (a hot cell =
    * degraded ANN pruning) and embedding drift at ingest time. One
    * windowed count aggregation over the stateless assignment;
    * state = O(cells) counters per open window. */
  def windowedCellCounts(vecs: DataFrame, idCol: String,
      vecCol: String, cents: Seq[(Long, Array[Double], Double)],
      tsCol: String = "ts", dim: Int = 64,
      watermark: String = "10 minutes", windowLen: String = "1 hour")
      : DataFrame = {
    val withTs = vecs
      .withColumn("__ts", eventTime(vecs, tsCol))
      .withWatermark("__ts", watermark)
    val assigned = withTs
      .where(size(col(vecCol)) === dim)
      .select(col("__ts"),
        element_at(graft.ops.Similarity.cellArray(col(vecCol), cents), 1)
          .getField("cid").as("cell"))
    assigned
      .groupBy(window(col("__ts"), windowLen), col("cell"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("cell"), col("cnt"))
  }

  /** Streaming incremental near-dup guard — the ingest-time twin of
    * the batch [[graft.ops.Dedup.incrementalLshPairs]] catalog dedup:
    * each arriving doc computes its own banded MinHash per row
    * (stateless — no explode-groupBy, see `Dedup.rowBanded`) and
    * probes the catalog's (band, bh) Bloom bitset. Static state is
    * O(mBits + hot-grams) broadcast constants built once by
    * `Dedup.catalogBandBloom`; the streaming plan is pure
    * Scan→Project, append-mode trivially legal, no watermark needed.
    * `maybe_dup = true` has Bloom+banding semantics: every doc whose
    * bands collide with the catalog index is flagged (no false
    * negatives vs the banded index), plus a tunable false-positive
    * sliver — route flagged docs to the exact batch path, exactly
    * like the contamination guard. */
  def incrementalGuardStream(docs: DataFrame, bloomBits: Array[Long],
      hotShingles: Seq[Long] = Nil, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, numHashes: Int = 64,
      bands: Int = 16, mBits: Long = 1L << 20, nBloomHashes: Int = 5)
      : DataFrame =
    graft.ops.Dedup.incrementalGuard(docs, idCol, textCol, bloomBits,
      hotShingles, n, numHashes, bands, mBits, nBloomHashes)

  /** Windowed drift against a FIXED reference distribution — the
    * continuously-run twin of [[graft.ops.Drift.referenceDrift]]:
    * every closed event-time window is scored (PSI / TVD / binned KS)
    * against the literal `refCounts` histogram of a blessed baseline
    * slice. This is the most monitoring-shaped operator in the set —
    * "is today's crawl drifting from the snapshot we trained on" as a
    * standing query.
    *
    * Scale/streaming shape: the reference is O(buckets) constants in
    * the plan, so the whole thing is ONE windowed conditional-sum
    * aggregation (append-mode legal, state = O(buckets) counters per
    * open window inside the watermark horizon) followed by stateless
    * closed-form score arithmetic. Per closed window the output row
    * equals the batch [[graft.ops.Drift.referenceDrift]] on that
    * window's rows exactly — same premise aggregates, same finisher
    * expressions (asserted in StreamingSpec). */
  def windowedReferenceDrift(events: DataFrame, tsCol: String,
      bucket: Column, refCounts: Seq[(String, Long)],
      watermark: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame = {
    require(refCounts.nonEmpty, "reference histogram is empty")
    val aggs = graft.ops.Drift.refDriftAggs(bucket, refCounts.map(_._1))
    events
      .withColumn("__ts", eventTime(events, tsCol))
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), windowLen))
      .agg(aggs.head, aggs.tail: _*)
      .select(unix_micros(col("window.start")).as("window_start_us") +:
        graft.ops.Drift.refDriftStats(refCounts): _*)
  }

  /** The GROUPED twin of [[windowedReferenceDrift]] — per (window,
    * group) drift against the frozen reference histogram, mirroring
    * the batch `Drift.numericDriftByGroup` question at ingest time:
    * WHICH source drifted this hour, not just whether the stream
    * did. Same compiled reference aggs (one definition site); state
    * per key stays O(reference buckets). */
  def windowedReferenceDriftByGroup(events: DataFrame, tsCol: String,
      groupCol: String, bucket: Column,
      refCounts: Seq[(String, Long)],
      watermark: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame = {
    require(refCounts.nonEmpty, "reference histogram is empty")
    val aggs = graft.ops.Drift.refDriftAggs(bucket, refCounts.map(_._1))
    events
      .withColumn("__ts", eventTime(events, tsCol))
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), windowLen),
        col(groupCol).as("grp"))
      .agg(aggs.head, aggs.tail: _*)
      .select(unix_micros(col("window.start")).as("window_start_us") +:
        col("grp").as(groupCol) +:
        graft.ops.Drift.refDriftStats(refCounts): _*)
  }

  /** Continuous data-quality gate: [[graft.ops.Quality]] check suites
    * evaluated per tumbling event-time window — the streaming twin of
    * `Quality.runChecks`, sharing the SAME compiled metric aggregates
    * and result expressions (one definition site, the twins cannot
    * drift). Uniqueness is forced through HLL++
    * (`approx_count_distinct`) because exact count(DISTINCT) is not
    * streamable; every other metric is a plain conditional count /
    * mean whose partial state the window store merges in O(1) per
    * column. Emits (window_start_us, check_type, col_name, observed,
    * lo, hi, passed) on window close (append mode with watermark) —
    * the shape a downstream alerting sink consumes directly. */
  def windowedQualityChecks(events: DataFrame, tsCol: String,
      checks: Seq[graft.ops.Quality.Check],
      watermark: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame = {
    val aggs = graft.ops.Quality.compiledAggs(checks, approxUnique = true)
    events
      .withColumn("__ts", eventTime(events, tsCol))
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), windowLen))
      .agg(aggs.head, aggs.tail: _*)
      .select(unix_micros(col("window.start")).as("window_start_us"),
        explode(array(
          graft.ops.Quality.resultStructs(checks): _*)).as("s"))
      .select("window_start_us", "s.*")
  }

  /** Streaming ingest into the incremental profile store
    * ([[graft.profiler.ProfileStore]]): each micro-batch becomes one
    * appended snapshot (id = zero-padded batch id), so the persisted
    * state grows O(1) rows per batch and the corpus-wide profile /
    * drift report stay a driver-side merge away at any stream age —
    * the same lifecycle the batch "daily crawl" uses, driven by the
    * engine's own micro-batch boundary. foreachBatch (not a stateful
    * aggregation) is the right altitude: the store IS the state,
    * durable and queryable outside the stream, and the batch append
    * path is reused verbatim (stream ≡ batch-append is the tested
    * contract — no second write path to drift).
    *
    * The first batch creates the store (build params fixed there);
    * later batches append through the store's own compatibility
    * checks. Empty micro-batches are skipped (an empty snapshot adds
    * no information and would burn a snapshot id). */
  def profileStoreSink(stream: DataFrame, path: String,
      k: Int = graft.profiler.ProfileStore.DefaultK,
      accuracy: Int = graft.profiler.ProfileStore.DefaultAccuracy)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          val snapId = f"batch$id%06d"
          val exists = try {
            graft.profiler.ProfileStore.readMeta(
              batch.sparkSession, path); true
          } catch { case _: org.apache.spark.sql.AnalysisException =>
            false }
          if (exists)
            graft.profiler.ProfileStore.appendSnapshot(batch, path,
              snapId)
          else
            graft.profiler.ProfileStore.writeSnapshot(batch, path,
              snapId, k, accuracy)
        }
    }
}
