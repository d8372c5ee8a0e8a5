package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.profiler.ProfileStore

/** Dev utility: the incremental-profile-store scale measurement —
  * the daily-crawl profiling lifecycle at corpus scale.
  *
  * Generates `days` parquet batches of `rows` rows each (the "daily
  * ingest"), then measures:
  *  1. build: snapshot day 1 (one O(day) scan);
  *  2. append: snapshot each further day (O(day) each — the steady-
  *     state daily cost, INDEPENDENT of history length);
  *  3. mergedProfile: corpus-wide profile from persisted state only
  *     (driver-side sketch merge — no data scan at all);
  *  4. the rescan alternative: profileFused over the full corpus
  *     (what every non-incremental profiler pays on every refresh).
  *
  * The claim measured: refreshing the corpus profile after day N
  * costs O(day N) + milliseconds, vs O(N·day) for the rescan — the
  * gap grows linearly with history.
  *
  * Usage: `graft.ProfileStoreSmoke [rowsPerDay] [days]`.
  * Numbers recorded in BASELINE.md round-10. */
object ProfileStoreSmoke {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 10000000L
    val days = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[pstore-smoke] $name: $s%.1f s")
      (r, s)
    }

    val base = "/tmp/graft_pstore_smoke"
    def dayDf(d: Int) = {
      val lo = d.toLong * rows
      spark.range(lo, lo + rows).select(col("id"),
        (pmod(col("id") * 2654435761L, lit(100000L)).cast("double")
          / 100.0).as("score"),
        when(pmod(col("id"), lit(50L)) === 0L,
            lit(null).cast("double"))
          .otherwise(pmod(col("id") * 40503L, lit(9973L))
            .cast("double")).as("metric"),
        concat(lit("u"), pmod(col("id") * 48271L, lit(5000000L)))
          .as("user"),
        concat(lit("host"), pmod(col("id"), lit(300L))).as("host"))
    }
    timed(s"generate $days x $rows-row day parquets") {
      (0 until days).foreach(d =>
        dayDf(d).write.mode("overwrite").parquet(s"$base/day$d"))
    }
    def readDay(d: Int) = spark.read.parquet(s"$base/day$d")

    val store = s"$base/store"
    timed(s"build: snapshot day 0 ($rows rows)") {
      ProfileStore.writeSnapshot(readDay(0), store, "day00")
    }
    val appendTimes = (1 until days).map { d =>
      timed(f"append: snapshot day $d")(
        ProfileStore.appendSnapshot(readDay(d), store,
          f"day$d%02d"))._2
    }
    println(f"[pstore-smoke] median append: " +
      f"${appendTimes.sorted.apply(appendTimes.size / 2)}%.1f s")

    val (prof, mergeS) = timed("mergedProfile: corpus profile from " +
        "state only (no data scan)") {
      val p = ProfileStore.mergedProfile(spark, store)
      p.collect()
    }
    prof.take(3).foreach(r => println(s"[pstore-smoke]   $r"))

    // the state-only analytics a store answers WITHOUT any rescan —
    // each is a driver-side sketch merge at any history length
    timed("driftReport: last day vs all history (state only)") {
      ProfileStore.driftReport(spark, store,
        (0 until days - 1).map(d => f"day$d%02d"),
        Seq(f"day${days - 1}%02d")).collect()
    }
    timed("mergedCorrelations: Pearson matrix (state only)") {
      ProfileStore.mergedCorrelations(spark, store)
    }
    val (html, _) = timed("htmlFromStore: full HTML report " +
        "(state only)") {
      ProfileStore.htmlFromStore(spark, store)
    }
    println(s"[pstore-smoke] html bytes = ${html.length}")

    val all = (0 until days).map(readDay).reduce(_.unionByName(_))
    val (_, rescanS) = timed(
      s"rescan alternative: profileFused over all ${days}x$rows") {
      graft.profiler.Profiler.profileFused(all)
    }
    println(f"[pstore-smoke] daily refresh: append+merge = " +
      f"${appendTimes.last + mergeS}%.1f s vs full rescan = " +
      f"$rescanS%.1f s (history $days days)")

    // sanity: merged n_rows and exact fields match a direct count
    val total = days.toLong * rows
    val nRows = prof.find(_.getString(0) == "id").get
      .getLong(2)
    require(nRows == total, s"merged n_rows $nRows != $total")
    spark.stop()
  }
}
