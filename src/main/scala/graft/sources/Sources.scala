package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Ingestion surface for the non-parquet formats a corpus pipeline
  * meets (JSONL dumps, CSV exports), with explicit schemas — never
  * inference, which at 100 TB means a full extra pass and
  * nondeterministic widening — and corrupt-record accounting instead
  * of silent row drops.
  *
  * The reference takes a ready-made DataFrame and never reads storage
  * (SURVEY.md §2.2: sources "none of its own"); this is the extension
  * surface that feeds the profiler/dedup operators from raw corpus
  * files.
  */
object Sources {

  val CorruptCol = "_corrupt_record"

  /** Schema-enforced JSON-lines reader in PERMISSIVE mode: malformed
    * lines land in [[CorruptCol]] instead of killing the job
    * (FAILFAST) or vanishing (DROPMALFORMED). Returns the frame WITH
    * the corrupt column so callers can count/quarantine before
    * dropping it. */
  def jsonl(spark: SparkSession, path: String, schema: StructType)
      : DataFrame =
    spark.read
      .schema(schema.add(StructField(CorruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Schema-enforced CSV reader with the same corrupt-record
    * contract. `multiLine` defaults to true because Spark's own CSV
    * writer quotes embedded newlines across physical lines — without
    * it each half parses as a separate (corrupt) record and the rows
    * are silently lost on clean(). Trade-off: multiLine files are
    * not splittable, so one task reads each file; for corpus-scale
    * ingestion either write many files or pre-scrub newlines and
    * pass multiLine = false to regain splittable scans. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, multiLine: Boolean = true): DataFrame =
    spark.read
      .schema(schema.add(StructField(CorruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header.toString)
      .option("multiLine", multiLine.toString)
      .csv(path)

  /** Ingestion health: (n_rows, n_corrupt) — WITHOUT caching, so an
    * audit-only flow never pins a corpus-sized frame in storage
    * memory. Two constraints shape the aggregation:
    *
    *  - Spark refuses queries over raw JSON/CSV that reference ONLY
    *    the internal corrupt column
    *    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN);
    *  - corruption is detected during parse of the REFERENCED
    *    columns, so an agg touching a subset of the schema would
    *    miss value-level corruption (type mismatches) in the rest.
    *
    * Counting every data column satisfies both: the scan parses the
    * full schema (same corruption semantics a cached materialization
    * had) and the query references far more than the corrupt column.
    * Row-format sources parse whole lines anyway, so the extra
    * column references cost no extra I/O. */
  def corruptStats(df: DataFrame): (Long, Long) = {
    val dataCols = df.columns.filter(_ != CorruptCol).toSeq
    val aggs = count(lit(1)).as("__n") +:
      count(col(CorruptCol)).as("__nc") +:
      dataCols.map(c => count(col(c)).as(s"__t__$c"))
    val r = df.agg(aggs.head, aggs.tail: _*).first()
    (r.getLong(0), r.getLong(1))
  }

  /** Clean rows only, corrupt column dropped.
    *
    * `cache = true` (default) materializes the frame first, because a
    * downstream query that references NO data column (a bare
    * `count()`) prunes the scan to just the corrupt column, which
    * Spark disallows on raw JSON/CSV. The cache is right for the
    * profiling flow — the caller reads the same data repeatedly — but
    * it is the CALLER'S responsibility to `df.unpersist()` (this
    * `df`, the raw frame) when done; nothing here does it.
    *
    * Pass `cache = false` for single-pass pipelines (clean → write
    * out, clean → profile selected columns): any downstream query
    * referencing at least one data column is legal uncached, and a
    * corpus-sized frame never enters storage memory. For bare
    * row-count health checks use [[corruptStats]], which is uncached
    * by construction. */
  def clean(df: DataFrame, cache: Boolean = true): DataFrame = {
    if (cache) df.cache()
    df.where(col(CorruptCol).isNull).drop(CorruptCol)
  }

  // ------------------------------------------------------------------
  // Reproducible sharded release (the data-publishing side of the
  // pipeline): deterministic shard assignment + a verification
  // manifest, so a consumer can check a copied release shard-by-shard
  // without talking to the producer.
  // ------------------------------------------------------------------

  /** Modulus for the manifest's modular id-hash checksum: prime, and
    * small enough that a shard of any size sums without 64-bit
    * overflow (n · 1e6 ≪ 2⁶³) while DuckDB's HUGEINT sum reduces to
    * the same residue — modular arithmetic is width-independent. */
  val ChecksumMod = 1000003L

  /** Per-shard release manifest: (shard, n_docs, checksum).
    * Shard = MINSTD(id) mod `buckets` — content-independent, stable
    * under repartitioning and insertion order (the hashSplit
    * contract); checksum = Σ (MINSTD(id) mod p) mod p — order-free
    * modular sum, so ANY engine recomputes it from the ids alone.
    * One aggregation, O(buckets) output. */
  def shardManifest(df: DataFrame, idCol: String, buckets: Int)
      : DataFrame = {
    require(buckets > 0, "buckets must be > 0")
    val h = graft.ops.Sampling.minstdHash(col(idCol).cast("long"))
    df.select(pmod(h, lit(buckets.toLong)).as("shard"),
        (h % ChecksumMod).as("hm"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        (sum("hm") % ChecksumMod).as("checksum"))
      .orderBy("shard")
  }

  /** Write `df` partitioned by the deterministic shard plus the
    * manifest — the publishable layout (each shard independently
    * consumable and verifiable). */
  def writeSharded(df: DataFrame, idCol: String, path: String,
      buckets: Int): Unit = {
    val h = graft.ops.Sampling.minstdHash(col(idCol).cast("long"))
    df.withColumn("shard", pmod(h, lit(buckets.toLong)))
      .write.mode("overwrite").partitionBy("shard")
      .parquet(s"$path/data")
    shardManifest(df, idCol, buckets)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/manifest")
  }

  /** Verify a copied release against its own manifest: recompute
    * per-shard counts and checksums from the data files and compare.
    * Full outer join so a MISSING shard (or an extra one) surfaces
    * as ok = false rather than vanishing. */
  def verifySharded(spark: SparkSession, path: String, idCol: String)
      : DataFrame = {
    val data = spark.read.parquet(s"$path/data")
    val stored = spark.read.parquet(s"$path/manifest")
      .select(col("shard"), col("n_docs").as("m_docs"),
        col("checksum").as("m_sum"))
    val h = graft.ops.Sampling.minstdHash(col(idCol).cast("long"))
    val recomputed = data
      .select(col("shard").cast("long").as("shard"),
        (h % ChecksumMod).as("hm"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        (sum("hm") % ChecksumMod).as("checksum"))
    recomputed.join(stored, Seq("shard"), "full_outer")
      .select(col("shard"), col("n_docs"), col("m_docs"),
        (col("n_docs") <=> col("m_docs") &&
          col("checksum") <=> col("m_sum")).as("ok"))
      .orderBy("shard")
  }
}
