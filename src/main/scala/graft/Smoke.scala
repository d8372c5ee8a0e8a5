package graft

import org.apache.spark.sql.SparkSession

/** Dev utility mirroring the driver's t1 smoke: run the flagship
  * `SparkEntry.entry` and print its row count + a sample. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[smoke] entry rows = ${rows.length}")
    df.show(30, truncate = false)
    spark.stop()
  }
}
