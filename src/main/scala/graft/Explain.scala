package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of one or more
  * SparkEntry queries (plan-quality review: pushdown, pruning,
  * codegen spans, join strategies).
  * Usage: graft.Explain <sfDir> <queryName>... */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    // SPARK_GRAFT_CPUS so plans that depend on the session's core
    // count (e.g. the unsplittable-input repartition) can be captured
    // under the bench's parallelism (r16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
