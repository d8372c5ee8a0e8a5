package graft
import org.apache.spark.sql.SparkSession
import graft.profiler.{Profiler, ProfilerConfig}
/** Dev utility: warmed timings of the three whole-profile variants. */
object FusedTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env("SPARK_GRAFT_SF_DIR")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").collect()
    val li = () => spark.read.parquet(s"$sfDir/lineitem.parquet")
    for (round <- 1 to 2) {
      for ((name, fn) <- Seq(
        "full" -> (() => Profiler.profile(li())),
        "sketch" -> (() => Profiler.profile(li(), ProfilerConfig(exactQuantiles=false, exactDistinct=false))),
        "fused" -> (() => Profiler.profileFused(li())))) {
        val t0 = System.nanoTime(); fn(); println(s"r$round $name ${(System.nanoTime()-t0)/1e9}")
      }
    }
    spark.stop()
  }
}
