package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{MultiSketch, CoMoment}
/** Dev utility: decompose fused-scan per-row costs at scale. */
object FusedCost {
  def main(args: Array[String]): Unit = {
    val rows = 10000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(rows).select(
      col("id").cast("double").as("v1"),
      (col("id") % 999983L).cast("double").as("v2"),
      sin(col("id").cast("double")).as("v3"),
      rand(42).as("v4"))
    df.cache().count()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[cost] $name ${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    val cols = Seq("v1","v2","v3","v4")
    val hashed = df.select(cols.flatMap(c =>
      Seq(col(c), xxhash64(col(c)).as(s"h_$c"))): _*)
    hashed.cache().count()
    t("baseline count(*)") { df.agg(count(lit(1))).collect() }
    t("4x percentile_approx") { df.agg(
      expr("percentile_approx(v1, array(0.5), 10000)"),
      expr("percentile_approx(v2, array(0.5), 10000)"),
      expr("percentile_approx(v3, array(0.5), 10000)"),
      expr("percentile_approx(v4, array(0.5), 10000)")).collect() }
    t("4x sketch ps=Nil (moments+KMV only)") { hashed.agg(
      MultiSketch.sketch(col("v1"), col("h_v1"), ps = Nil),
      MultiSketch.sketch(col("v2"), col("h_v2"), ps = Nil),
      MultiSketch.sketch(col("v3"), col("h_v3"), ps = Nil),
      MultiSketch.sketch(col("v4"), col("h_v4"), ps = Nil)).collect() }
    t("4x sketch full (with GK)") { hashed.agg(
      MultiSketch.sketch(col("v1"), col("h_v1")),
      MultiSketch.sketch(col("v2"), col("h_v2")),
      MultiSketch.sketch(col("v3"), col("h_v3")),
      MultiSketch.sketch(col("v4"), col("h_v4"))).collect() }
    t("co_moments k=4") { df.agg(
      CoMoment.sketch(array(cols.map(col): _*), 4)).collect() }
    spark.stop()
  }
}
