package graft
import org.apache.spark.sql.SparkSession
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env("SPARK_GRAFT_SF_DIR")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session on whatever table the tier carries (subset
    // tiers like the heaps doc corpora have no region table)
    val warm = Seq("region", "documents", "lineitem")
      .map(t => s"$sfDir/$t.parquet")
      .find(p => new java.io.File(p).exists())
    warm.foreach(p => spark.read.parquet(p).limit(1).collect())
    // GRAFT_QTIME_REPS=1 for decade-scale tiers where a query runs
    // many minutes and the cold-JVM overhead is noise
    val reps = sys.env.getOrElse("GRAFT_QTIME_REPS", "2").toInt
    for (name <- args; r <- 1 to reps) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).collect()
      println(s"$name r$r ${(System.nanoTime()-t0)/1e9}")
    }
    spark.stop()
  }
}
