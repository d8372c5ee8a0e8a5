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
    timed("distinct11_par_chunk1_noexpand") {
      val all = graft.queries.Core.all
      val par = graft.profiler.Stats.parallelized(li)
      val dAggs = all.map(c => countDistinct(col(c)).as(s"d__$c"))
      val cAggs = all.map(c => count(col(c)).as(s"c__$c"))
      import scala.concurrent.{Await, ExecutionContext, Future}
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      val futs = (dAggs.map(a => Future { par.agg(a).first() }) :+
        Future { li.agg(cAggs.head, cAggs.tail: _*).first() })
      Await.result(Future.sequence(futs),
        scala.concurrent.duration.Duration.Inf)
      pool.shutdown()
    }
    if (sys.env.get("GRAFT_PROBE_PIPE").contains("1")) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val corpus = docs.where(col("source") =!= "src0")
      val evalD = docs.where(col("source") === "src0")
      import graft.pipeline.CorpusPipeline
      import graft.ops.{Dedup, Materialize, TextStats}
      val cfg = CorpusPipeline.BandedConfig
      timed("pipe_repetition") {
        TextStats.repetition(corpus, "doc_id", "text").collect(); ()
      }
      timed("pipe_quality") {
        CorpusPipeline.qualityFiltered(corpus, "doc_id", "text", cfg)
          .count(); ()
      }
      val q = Materialize.materialize(
        CorpusPipeline.qualityFiltered(corpus, "doc_id", "text", cfg))
      timed("pipe_pairs_banded") {
        Dedup.minhashVerifiedPairs(q, "doc_id", "text", n = 3,
          numHashes = 64, bands = 16, minJaccard = 0.5,
          maxDf = Some(1000L), maxBucket = Some(1024L)).collect(); ()
      }
      timed("pipe_pairs_exact") {
        Dedup.ngramJaccardPairs(q, "doc_id", "text", n = 3,
          minJaccard = 0.5, maxDf = Some(1000L)).collect(); ()
      }
      val pairs = CorpusPipeline.nearDupPairs(q, "doc_id", "text", cfg)
      timed("pipe_clusters") {
        Dedup.duplicateClustersStar(pairs).collect(); ()
      }
      val d = Materialize.materialize(
        CorpusPipeline.dedupKeepOne(q, "doc_id", "text", cfg))
      timed("pipe_decontam_bloom") {
        CorpusPipeline.decontaminated(d, evalD, "doc_id", "text", cfg)
          .count(); ()
      }
      timed("pipe_funnel_banded_total") {
        CorpusPipeline.funnelCounts(corpus, evalD, "doc_id", "text",
          cfg).collect(); ()
      }
      timed("pipe_curate_banded_total") {
        CorpusPipeline.curateCounts(corpus, evalD, "doc_id", "text",
          graft.queries.ClassifierQueries.Th,
          cfg = cfg).collect(); ()
      }
    }
    // job-level decomposition of the exact profile (guide §1.1):
    // which pass owns the time
    if (sys.env.get("GRAFT_PROBE_PROFILE").contains("1")) {
      val jobs = new java.util.concurrent.ConcurrentHashMap[Int,
        (Long, String)]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart)
              : Unit =
            jobs.put(j.jobId, (j.time,
              Option(j.properties.getProperty(
                "spark.job.description")).getOrElse("?")))
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd)
              : Unit = {
            val (t0, d) = jobs.getOrDefault(j.jobId, (j.time, "?"))
            println(f"[job] ${j.jobId}%4d ${(j.time - t0) / 1e3}%7.2fs $d")
          }
        })
      graft.profiler.Profiler.profile(li) // warm
      println("=== exact profile jobs (warmed run) ===")
      val t0 = System.nanoTime()
      graft.profiler.Profiler.profile(li)
      println(f"profile_full total ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
