package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession
import graft.streaming.StreamProfiler

/** Dev utility: drive the Structured Streaming profile over a REAL
  * file source (not MemoryStream) — parquet files appearing in a
  * staging directory, the way a continuously-landing event feed
  * behaves. Usage: graft.StreamDemo [sfDir] */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val staging = Files.createTempDirectory("graft_stream").toString
    val src = Paths.get(s"$sfDir/events.parquet")
    val schema = spark.read.parquet(src.toString).schema

    val stream = spark.readStream.schema(schema).parquet(staging)
    val q = StreamProfiler.windowedStats(stream)
      .writeStream.format("memory").queryName("demo")
      .outputMode("append").start()

    // land the file as if a feed delivered it, then let the
    // micro-batch planner pick it up
    Files.copy(src, Paths.get(staging, "batch-0.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    q.processAllAvailable()
    // append-mode windows only emit once the watermark passes them;
    // at end-of-feed the demo reports what has been finalized so far
    val finalized = spark.table("demo").count()
    println(s"[stream-demo] finalized windows after batch 0: $finalized")
    spark.table("demo").show(5, truncate = false)
    q.stop()
    spark.stop()
  }
}
