package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement main for the r17 optimization round (guide
  * §1): A/B the fused k-countDistinct Expand aggregation against the
  * per-column single-distinct jobs, at any SF. Not a declared query. */
object OptProbe17 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.profiler.Stats
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.count() // warm
    val cols = li.columns.toSeq
    val reps = sys.env.getOrElse("GRAFT_PROBE_REPS", "2").toInt
    def timed(label: String)(f: => Unit): Unit =
      for (r <- 1 to reps) {
        spark.sparkContext.setJobDescription(label)
        val t0 = System.nanoTime()
        f
        println(f"$label r$r ${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    val which = args.headOption.getOrElse("all")
    if (which == "all" || which == "fused") timed("dis_fused_expand") {
      // the r16 form: one agg, k countDistinct → Expand (k+1)×
      val aggs = cols.flatMap { c =>
        Seq(count(col(c)).as(s"cnt__$c"),
          countDistinct(Stats.orderable(li, c)).as(s"dis__$c"))
      }
      Stats.parallelized(li).agg(aggs.head, aggs.tail: _*).first()
      ()
    }
    if (which == "all" || which == "percol") timed("dis_percol_par8") {
      Stats.exactDistinctPerCol(li, cols); ()
    }
    if (which == "all" || which == "percol_norep")
      timed("dis_percol_norep_par8") {
        // per-column WITHOUT the unsplittable-input repartition
        import scala.concurrent.{Await, ExecutionContext, Future}
        val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
        implicit val ec: ExecutionContext =
          ExecutionContext.fromExecutorService(pool)
        try Await.result(Future.sequence(cols.map { c => Future {
          li.select(col(c)).agg(count(col(c)),
            countDistinct(Stats.orderable(li, c))).first()
        } }), scala.concurrent.duration.Duration.Inf)
        finally pool.shutdown()
        ()
      }
    if (which == "all" || which == "percol_seq")
      timed("dis_percol_seq") {
        cols.foreach { c =>
          Stats.parallelized(li.select(col(c))).agg(count(col(c)),
            countDistinct(Stats.orderable(li, c))).first()
        }
      }
    spark.stop()
  }
}
