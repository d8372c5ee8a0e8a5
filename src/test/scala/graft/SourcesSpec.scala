package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Sources

/** Source/sink format coverage: schema-enforced JSONL and CSV
  * ingestion with corrupt-record accounting, and partitioned parquet
  * as the sink shape whose reads are partition-pruned. */
class SourcesSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("jsonl: schema-enforced read flags malformed lines instead of " +
      "dropping or failing") {
    val dir = tmpDir("jsonl")
    Files.write(java.nio.file.Paths.get(dir, "part.jsonl"),
      java.util.Arrays.asList(
        """{"doc_id": 1, "text": "hello world"}""",
        """{"doc_id": 2, "text": "second doc"}""",
        """this is not json at all""",
        """{"doc_id": 3, "text": "third"}"""))
    val df = Sources.jsonl(spark, dir, docSchema)
    val (n, corrupt) = Sources.corruptStats(df)
    assert(n == 4L && corrupt == 1L)
    // the audit path must NOT have pinned the frame in storage memory
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "corruptStats must not cache")
    val cleaned = Sources.clean(df)
    assert(cleaned.columns.toSeq == Seq("doc_id", "text"))
    assert(cleaned.count() == 3L)
    assert(cleaned.agg(sum("doc_id")).first().getLong(0) == 6L)
    df.unpersist() // the documented caller-side contract for clean()
  }

  test("corruptStats sees value-level corruption in every column " +
      "without caching; clean(cache=false) works for column queries") {
    val dir = tmpDir("jsonlv")
    Files.write(java.nio.file.Paths.get(dir, "part.jsonl"),
      java.util.Arrays.asList(
        """{"doc_id": 1, "text": "ok"}""",
        """{"doc_id": "NOT_A_NUMBER", "text": "type mismatch"}""",
        """{"doc_id": 3, "text": "fine"}"""))
    val df = Sources.jsonl(spark, dir, docSchema)
    // the type mismatch lives in doc_id only — a corrupt-count that
    // parsed a column subset would miss it
    val (n, corrupt) = Sources.corruptStats(df)
    assert(n == 3L && corrupt == 1L)
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    val cleaned = Sources.clean(df, cache = false)
    assert(cleaned.agg(sum("doc_id")).first().getLong(0) == 4L)
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "clean(cache=false) must not cache")
  }

  test("csv: round-trips the fixture corpus for profiling") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang")
    val dir = tmpDir("csv")
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val back = Sources.clean(Sources.csv(spark, dir, schema))
    assert(back.count() == docs.count())
    // profiling stats survive the round-trip byte-for-byte
    val a = graft.ops.TextStats.langStats(docs, "text", "lang")
      .collect().toSeq
    val b = graft.ops.TextStats.langStats(back, "text", "lang")
      .collect().toSeq
    assert(a == b)
  }

  test("csv: embedded newlines survive the round-trip (multiLine)") {
    val sql = spark
    import sql.implicits._
    val dir = tmpDir("csvnl")
    val src = Seq((1L, "line one\nline two"), (2L, "plain"))
      .toDF("doc_id", "text")
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = Sources.clean(Sources.csv(spark, dir, docSchema))
    assert(back.count() == 2L)
    val texts = back.orderBy("doc_id").collect().map(_.getString(1))
    assert(texts(0) == "line one\nline two", texts.mkString("|"))
  }

  test("partitioned parquet sink: reads prune partitions on the " +
      "partition key filter") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang")
    val dir = tmpDir("part")
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val filtered = spark.read.parquet(dir).where(col("lang") === "en")
    val plan = filtered.queryExecution.executedPlan.toString
    // the lang predicate must appear INSIDE the PartitionFilters
    // bracket — the bracket itself prints even when empty, and "lang"
    // always appears in the scan's column list, so a bare contains()
    // would pass even if pruning regressed to a post-scan Filter
    assert("PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(plan)
        .isDefined,
      "partition-key filter must prune at the source, not post-scan: " +
        plan.take(800))
    assert(filtered.count() ==
      docs.where(col("lang") === "en").count())
  }

  test("sharded release: write → verify all ok; a tampered shard " +
      "fails while untouched shards still verify") {
    import spark.implicits._
    val rel = (0L until 400L).map(i => (i, s"text$i"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft_shards").toString
    Sources.writeSharded(rel, "doc_id", path, buckets = 4)
    val ok = Sources.verifySharded(spark, path, "doc_id").collect()
    assert(ok.length === 4)
    assert(ok.forall(_.getBoolean(3)), "intact release verifies")
    // tamper: drop one row from shard 0 and rewrite that partition
    val d = spark.read.parquet(s"$path/data")
    val s0 = d.where(col("shard") === 0).drop("shard")
    val victim = s0.agg(min("doc_id")).first().getLong(0)
    val rewritten = s0.where(col("doc_id") =!= victim).collect()
    val rewrittenDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rewritten.toSeq, 1), s0.schema)
    rewrittenDf.write.mode("overwrite")
      .parquet(s"$path/data/shard=0")
    val after = Sources.verifySharded(spark, path, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(!after(0L), "tampered shard fails")
    assert(after.filter(_._1 != 0L).values.forall(identity),
      "untouched shards still verify")
  }
}
