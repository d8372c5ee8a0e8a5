package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement main for the r16 optimization round: times
  * labelled sub-plans of the hot queries so changes are driven by
  * measurement, not guesses (guide §1). Not a declared query. */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // env-driven extra confs for A/B, e.g.
    // GRAFT_CONF="spark.sql.files.openCostInBytes=131072"
    sys.env.get("GRAFT_CONF").foreach(_.split(",").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    })
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.count() // warm
    import graft.queries.Core.{nums, floats}
    def d(c: String) = col(c).cast("double")
    def timed(label: String)(f: => Unit): Unit = {
      for (r <- 1 to 2) {
        val t0 = System.nanoTime()
        f
        println(f"$label r$r ${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    val arr = "array(0.05D, 0.25D, 0.5D, 0.75D, 0.95D)"
    timed("count_only") { li.count(); () }
    timed("scan_all_cols") {
      li.write.format("noop").mode("overwrite").save()
    }
    timed("pctl_1col") {
      li.agg(expr(s"percentile(cast(l_quantity as double), $arr)"))
        .first(); ()
    }
    timed("pctl_8col_one_agg") {
      val aggs = nums.map(c =>
        expr(s"percentile(cast(`$c` as double), $arr)").as(s"q__$c"))
      li.agg(aggs.head, aggs.tail: _*).first(); ()
    }
    timed("pctl_8col_par4") {
      import scala.concurrent.{Await, ExecutionContext, Future}
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      val futs = nums.map { c => Future {
        li.agg(expr(s"percentile(cast(`$c` as double), $arr)")).first()
      } }
      Await.result(Future.sequence(futs),
        scala.concurrent.duration.Duration.Inf)
      pool.shutdown()
    }
    timed("distinct_8col_one_agg") {
      val aggs = nums.map(c => countDistinct(col(c)).as(s"d__$c"))
      li.agg(aggs.head, aggs.tail: _*).first(); ()
    }
    timed("distinct_8col_par") {
      import scala.concurrent.{Await, ExecutionContext, Future}
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      val futs = nums.map { c => Future {
        li.agg(countDistinct(col(c))).first()
      } }
      Await.result(Future.sequence(futs),
        scala.concurrent.duration.Duration.Inf)
      pool.shutdown()
    }
    timed("moments_8col") {
      val aggs = nums.flatMap(c => Seq(count(d(c)), avg(d(c)),
        min(d(c)), max(d(c)), sum(d(c))))
      li.agg(aggs.head, aggs.tail: _*).first(); ()
    }
    val li32 = li.repartition(32)
    timed("pctl_8col_repart32") {
      val aggs = nums.map(c =>
        expr(s"percentile(cast(`$c` as double), $arr)").as(s"q__$c"))
      li32.agg(aggs.head, aggs.tail: _*).first(); ()
    }
    timed("distinct_8col_repart32") {
      val aggs = nums.map(c => countDistinct(col(c)).as(s"d__$c"))
      li32.agg(aggs.head, aggs.tail: _*).first(); ()
    }
    timed("moments_8col_repart32") {
      val aggs = nums.flatMap(c => Seq(count(d(c)), avg(d(c)),
        min(d(c)), max(d(c)), sum(d(c))))
      li32.agg(aggs.head, aggs.tail: _*).first(); ()
    }
    timed("fastpctl_8col_one_agg") {
      val aggs = nums.map(c => graft.functions.ExactPercentile.pctl(
        d(c), Seq(0.05, 0.25, 0.5, 0.75, 0.95)).as(s"q__$c"))
      li.agg(aggs.head, aggs.tail: _*).first(); ()
    }
    timed("stats_distinct_all") {
      graft.profiler.Stats.distinct(li,
        graft.queries.Core.all).collect(); ()
    }
    timed("distinct_all11_one_agg_noexpand_check") {
      val aggs = graft.queries.Core.all.flatMap { c =>
        Seq(count(col(c)).as(s"c__$c"),
          countDistinct(col(c)).as(s"d__$c"))
      }
      li.agg(aggs.head, aggs.tail: _*).first(); ()
    }
    timed("distinct_all11_repart") {
      val aggs = graft.queries.Core.all.flatMap { c =>
        Seq(count(col(c)).as(s"c__$c"),
          countDistinct(col(c)).as(s"d__$c"))
      }
      li.repartition(32).agg(aggs.head, aggs.tail: _*).first(); ()
    }
    timed("quality_suggest_now") {
      graft.ops.Quality.suggest(li,
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus"), 8).collect(); ()
    }
    timed("pctl_8col_repart8") {
      val li8 = li.repartition(8)
      val aggs = nums.map(c =>
        expr(s"percentile(cast(`$c` as double), $arr)").as(s"q__$c"))
      li8.agg(aggs.head, aggs.tail: _*).first(); ()
    }
    spark.stop()
  }
}
