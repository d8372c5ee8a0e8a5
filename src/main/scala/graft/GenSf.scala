package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: deterministic scale-tier fixture generator — the same
  * star schema, value domains and distributions as the driver's
  * read-only `/root/testdata/sf*` tables (fingerprinted in the round-13
  * session from sf0.01/sf0.1: categorical domains, ranges, per-order
  * fan-out, monotone-irregular event timestamps, 31-word document
  * vocabulary, unit-norm dim-64 embeddings), at any multiple of the
  * sf0.1 row counts. The driver caps its tiers at sf0.1 (600k
  * lineitem); this main manufactures the sf1 tier (6M lineitem) the
  * full-sweep + bench scale gate runs against.
  *
  * Determinism: one splitmix64 stream per (table, row id) — content
  * is a pure function of (id), independent of partitioning, task
  * retries, or row order, the same contract as the testdata fixtures.
  * Generation is distributed (spark.range → typed map, no shuffle).
  *
  * Usage: graft.GenSf <outDir> [scaleVsSf01=100] [vocab] [only]
  *   vocab: `closed` (default — the fixtures' 31-word vocabulary) or
  *     `heaps` — OPEN vocabulary: tokens Zipf-drawn from a 10M-rank
  *     tail (rank = R^u, giving df(r) ∝ 1/r), so the distinct-gram
  *     space GROWS with the corpus (Heaps' law) instead of
  *     saturating — the production crawl regime where the exact
  *     near-dup family's Σdf² stays ~linear in corpus size. Every
  *     101st document is a planted near-dup (its predecessor's text
  *     with the final token replaced), so pair queries have
  *     ground-truth output across tiers.
  *   only: comma-list of table names to write (e.g. `documents` for
  *     the dedup-family gate tiers — skips the 6M-row lineitem).
  * (100 → sf1)
  */
object GenSf {

  /** splitmix64 step — the standard public mixing constant chain. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Per-row deterministic draw stream: draw k of row id in table t. */
  private final class Rng(table: Long, id: Long) {
    private var n = 0L
    private val base = mix(mix(table * 0x632be59bd9b4e019L) ^ id)
    def nextLong(): Long = { n += 1; mix(base + n * 0xd1b54a32d192ed03L) }
    def uniform(): Double = // [0, 1)
      (nextLong() >>> 11).toDouble / (1L << 53).toDouble
    def int(bound: Int): Int = ((nextLong() >>> 1) % bound).toInt
    def gaussian(): Double = { // Box-Muller, one branch
      val u1 = math.max(uniform(), 1e-300); val u2 = uniform()
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    }
  }

  private def round2(d: Double): Double = math.rint(d * 100.0) / 100.0

  private val Segments = Array("AUTOMOBILE", "BUILDING", "FURNITURE",
    "HOUSEHOLD", "MACHINERY")
  private val Priorities = Array("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")
  private val Adjs = Array("blue", "cold", "hot", "large", "new", "old",
    "red", "small")
  private val Nouns = Array("anvil", "bolt", "gear", "gizmo", "plate",
    "ring", "rod", "widget")
  private val Types = Array("ECONOMY", "LARGE", "MEDIUM", "PROMO",
    "SMALL", "STANDARD")
  private val EventTypes = Array("click", "error", "purchase", "signup",
    "view")
  private val Langs = Array("de", "es", "fr", "zh") // 0.15 each, en 0.4
  private val Vocab = Array("a", "agg", "batch", "big", "column",
    "customer", "data", "dup", "fast", "filter", "group", "hash",
    "join", "key", "line", "merge", "order", "part", "query", "row",
    "scan", "slow", "small", "sort", "spark", "stream", "table", "the",
    "value", "vector", "window")

  private val DayMicros = 86400000000L
  private val Epoch1995 = // 1995-01-01T00:00:00Z in micros
    java.time.Instant.parse("1995-01-01T00:00:00Z").toEpochMilli * 1000L
  private val Epoch2024 =
    java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L

  /** o_orderdate as a pure function of the order key, so lineitem
    * ship dates can stay consistent without a join. */
  private def orderDateMicros(orderkey: Long): Long =
    Epoch1995 + new Rng(90, orderkey).int(2405) * DayMicros

  /** One open-vocabulary document: tokens "w<rank>" with rank = R^u
    * (u uniform), the inverse-CDF of a truncated 1/r Zipf over R=1e7
    * ranks — low ranks are stopword-like boilerplate (their grams are
    * exactly what the df cap exists for), the tail is effectively
    * unbounded so distinct grams grow with the corpus. */
  private val HeapsRanks = 1e7
  private def heapsText(id: Long): String = {
    val r = new Rng(17, id)
    val wc = 10 + r.int(91)
    Array.fill(wc) {
      "w" + math.floor(math.pow(HeapsRanks, r.uniform())).toLong
    }.mkString(" ")
  }

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val scale = if (args.length > 1) args(1).toInt else 100 // vs sf0.01
    val vocabMode = if (args.length > 2) args(2) else "closed"
    require(vocabMode == "closed" || vocabMode == "heaps",
      s"vocab mode must be closed|heaps, got $vocabMode")
    val only: Set[String] =
      if (args.length > 3) args(3).split(",").toSet else Set.empty
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nCustomer = 1500L * scale
    val nSupplier = 100L * scale
    val nPart = 2000L * scale
    val nOrders = 15000L * scale
    val nLineitem = 60000L * scale
    val nEvents = 10000L * scale
    val nDocs = 500L * scale
    val nEmb = 200L * scale // embeddings scale at 0.4× docs

    // single file per table named <t>.parquet, like the driver's
    // fixtures (DuckDB opens the path directly, no glob). Bench-only
    // tiers (no DuckDB replay) can set GRAFT_GENSF_PARTS>1 to keep the
    // write parallel: <t>.parquet becomes a normal multi-part parquet
    // directory, which spark.read handles identically — at the sf100
    // tier the coalesce(1) funnel is a ~25 GB single-thread encode.
    val parts = sys.env.getOrElse("GRAFT_GENSF_PARTS", "1").toInt
    def write(df: DataFrame, name: String): Unit = {
      if (only.nonEmpty && !only(name)) return
      if (parts > 1) {
        df.repartition(parts).write.mode(SaveMode.Overwrite)
          .parquet(s"$out/$name.parquet")
        println(s"[gensf] wrote $name ($parts parts)")
        return
      }
      val tmp = s"$out/_tmp_$name"
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(conf)
      val part = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$tmp/part-*.parquet"))(0).getPath
      val dest = new org.apache.hadoop.fs.Path(s"$out/$name.parquet")
      // A previous GRAFT_GENSF_PARTS>1 run leaves a multi-part
      // DIRECTORY here; a non-recursive delete fails on a non-empty
      // dir and the rename then aborts opaquely — delete recursively
      // when the destination is a directory.
      if (fs.exists(dest))
        fs.delete(dest, fs.getFileStatus(dest).isDirectory)
      require(fs.rename(part, dest), s"rename failed for $name")
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      println(s"[gensf] wrote $name")
    }

    write(Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
      (4, "MIDDLE EAST")).toDF("r_regionkey", "r_name"), "region")

    write((0 until 25).map(i => (i, s"NATION_$i", i % 5))
      .toDF("n_nationkey", "n_name", "n_regionkey"), "nation")

    write(spark.range(nCustomer).map { id =>
      val r = new Rng(1, id)
      (id, f"Customer#$id%09d", r.int(25),
        round2(-1000.0 + r.uniform() * 11000.0), Segments(r.int(5)))
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment")
      .withColumn("c_nationkey", col("c_nationkey").cast("int")),
      "customer")

    write(spark.range(nSupplier).map { id =>
      val r = new Rng(2, id)
      (id, f"Supplier#$id%09d", r.int(25),
        round2(-1000.0 + r.uniform() * 11000.0))
    }.toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .withColumn("s_nationkey", col("s_nationkey").cast("int")),
      "supplier")

    write(spark.range(nPart).map { id =>
      val r = new Rng(3, id)
      (id, s"${Adjs(r.int(8))} ${Nouns(r.int(8))}",
        s"Brand#${r.int(25)}", Types(r.int(6)), 1 + r.int(50),
        math.rint((900.0 + r.uniform() * 99.9) * 10.0) / 10.0)
    }.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice")
      .withColumn("p_size", col("p_size").cast("int")), "part")

    write(spark.range(nOrders).map { id =>
      val r = new Rng(4, id)
      (id, (r.nextLong() >>> 1) % nCustomer,
        "POF".charAt(r.int(3)).toString,
        round2(1000.0 + r.uniform() * 499000.0),
        orderDateMicros(id), Priorities(r.int(5)))
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .withColumn("o_orderdate", timestamp_micros(col("o_orderdate"))),
      "orders")

    write(spark.range(nLineitem).map { id =>
      val r = new Rng(5, id)
      val orderkey = (r.nextLong() >>> 1) % nOrders
      val qty = (1 + r.int(50)).toDouble
      val unit = 900.0 + r.uniform() * 1200.0
      (orderkey, (r.nextLong() >>> 1) % nPart,
        (r.nextLong() >>> 1) % nSupplier, 1 + r.int(7), qty,
        round2(qty * unit), r.int(11) * 0.01, r.int(9) * 0.01,
        "ANR".charAt(r.int(3)).toString, "FO".charAt(r.int(2)).toString,
        orderDateMicros(orderkey) + (1 + r.int(95)) * DayMicros)
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .withColumn("l_linenumber", col("l_linenumber").cast("int"))
      .withColumn("l_shipdate", timestamp_micros(col("l_shipdate"))),
      "lineitem")

    val evSpan = 30L * DayMicros
    val evStep = evSpan / nEvents
    val nUsers = 15L * scale
    write(spark.range(nEvents).map { id =>
      val r = new Rng(6, id)
      // sorted-uniform shape: monotone in id, irregular step
      (id, Epoch2024 + id * evStep + (r.uniform() * evStep).toLong,
        (r.nextLong() >>> 1) % nUsers, EventTypes(r.int(5)),
        math.max(0.01, round2(-50.0 * math.log(
          math.max(r.uniform(), 1e-12)))),
        s"""{"k": ${r.int(100)}}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts"))), "events")

    val heaps = vocabMode == "heaps"
    write(spark.range(nDocs).map { id =>
      val r = new Rng(7, id)
      val wc = 10 + r.int(91)
      val text =
        if (!heaps)
          Array.fill(wc)(Vocab(r.int(Vocab.length))).mkString(" ")
        else if (id >= 101L && id % 101L == 0L) {
          // planted near-dup: the PREDECESSOR doc's text (id-1 is
          // never ≡ 0 mod 101, so the source is a base doc whose own
          // text is heapsText(id-1)) with the final token replaced —
          // text is a pure function of id, no cross-row state
          val w = heapsText(id - 1L).split(" ")
          w(w.length - 1) = s"dup$id"
          w.mkString(" ")
        } else heapsText(id)
      val lang = if (r.uniform() < 0.4) "en" else Langs(r.int(4))
      (id, text, lang, s"src${id % 20}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars"), "documents")

    write(spark.range(nEmb).map { id =>
      val r = new Rng(8, id)
      val label = r.int(10)
      // unit-norm gaussian with a faint label direction (the testdata
      // shows ~0.005 same-label mean cosine vs ~0 cross-label)
      val v = Array.tabulate(64) { d =>
        r.gaussian() + (if (d % 10 == label) 0.35 else 0.0)
      }
      val norm = math.sqrt(v.map(x => x * x).sum)
      (id, v.map(x => (x / norm).toFloat), label)
    }.toDF("vec_id", "embedding", "label")
      .withColumn("label", col("label").cast("int")), "embeddings")

    println(s"[gensf] done: $out at ${scale}x sf0.01")
    spark.stop()
  }
}
