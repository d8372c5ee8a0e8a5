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

  /** Ingestion health: (n_rows, n_corrupt). Spark refuses queries
    * over raw JSON/CSV that reference only the internal corrupt
    * column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN),
    * so the frame is materialized via cache for the check — the
    * caller is about to profile the same data anyway, so the cache
    * is not wasted. */
  def corruptStats(df: DataFrame): (Long, Long) = {
    df.cache() // stays cached for the caller's follow-up reads
    val r = df.agg(count(lit(1)), count(col(CorruptCol))).first()
    (r.getLong(0), r.getLong(1))
  }

  /** Clean rows only, corrupt column dropped. Cached first for the
    * same reason as [[corruptStats]]: a downstream count/aggregate
    * over the filtered frame prunes every column except the corrupt
    * one, which Spark disallows on raw JSON/CSV scans. */
  def clean(df: DataFrame): DataFrame = {
    df.cache()
    df.where(col(CorruptCol).isNull).drop(CorruptCol)
  }
}
