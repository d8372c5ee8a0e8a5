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
    spark.read.parquet(s"$sfDir/region.parquet").collect()
    for (name <- args; r <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).collect()
      println(s"$name r$r ${(System.nanoTime()-t0)/1e9}")
    }
    spark.stop()
  }
}
