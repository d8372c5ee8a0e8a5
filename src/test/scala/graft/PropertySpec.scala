package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.profiler.Stats

/** ScalaCheck-generator-driven properties over the core statistics
  * (SURVEY.md §5.2): invariants that must hold for ANY input column.
  * Sampling is explicit (fixed seeds — deterministic CI) because only
  * scalatest + scalacheck are on the classpath, not scalatestplus. */
class PropertySpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(StructField("x", DoubleType)))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(30), Seed(i.toLong)))

  private val colGen: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6))

  private def mk(xs: List[Double]) =
    spark.createDataFrame(xs.map(Row(_)).asJava, schema)

  test("histogram bins partition the non-null count") {
    samples(colGen, 8).foreach { xs =>
      val bins = Stats.histogram(mk(xs), Seq("x"), bins = 10).collect()
      assert(bins.map(_.getAs[Long]("cnt")).sum == xs.size.toLong,
        s"input $xs")
      assert(bins.forall { r =>
        val b = r.getAs[Long]("bin"); b >= 0 && b <= 9
      })
    }
  }

  test("quantiles are monotone and bounded by min/max") {
    samples(colGen, 8).foreach { xs =>
      val r = Stats.quantiles(mk(xs), Seq("x")).collect().head
      val qs = Seq("p05", "q1", "median", "q3", "p95")
        .map(r.getAs[Double])
      assert(qs == qs.sorted, s"input $xs")
      assert(qs.head >= xs.min - math.abs(xs.min) * 1e-4 - 1e-6)
      assert(qs.last <= xs.max + math.abs(xs.max) * 1e-4 + 1e-6)
    }
  }

  test("0 <= p_missing <= 1 and missing + cnt = n") {
    val optGen = Gen.nonEmptyListOf(Gen.option(Gen.chooseNum(-1e3, 1e3)))
    samples(optGen, 8).foreach { xs =>
      val df = spark.createDataFrame(
        xs.map(o => Row(o.map(Double.box).orNull)).asJava, schema)
      val r = Stats.counts(df, Seq("x")).collect().head
      val p = r.getAs[Double]("p_missing")
      assert(p >= 0.0 && p <= 1.0)
      assert(r.getAs[Long]("cnt") + r.getAs[Long]("n_missing") ==
        xs.size.toLong)
    }
  }

  test("moments: variance nonnegative; mean within [min,max]") {
    samples(colGen.suchThat(_.size >= 2), 8).foreach { xs =>
      val r = Stats.moments(mk(xs), Seq("x")).collect().head
      assert(r.getAs[Double]("variance") >= 0.0)
      val mean = r.getAs[Double]("mean")
      assert(mean >= r.getAs[Double]("min_val") - 1e-6 &&
        mean <= r.getAs[Double]("max_val") + 1e-6, s"input $xs")
    }
  }

  test("connected components: star algorithm ≡ min-label propagation " +
      "on random graphs, and labels are a fixpoint") {
    val edgeSchema = StructType(Seq(StructField("id_a", LongType),
      StructField("id_b", LongType)))
    val graphGen: Gen[List[(Long, Long)]] =
      Gen.nonEmptyListOf(for {
        a <- Gen.chooseNum(1L, 30L)
        b <- Gen.chooseNum(1L, 30L) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    samples(graphGen, 6).foreach { es =>
      val pairs = spark.createDataFrame(
        es.map { case (a, b) => Row(a, b) }.asJava, edgeSchema)
      val prop = graft.ops.Dedup.duplicateClusters(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // driver union-find path (default threshold) ...
      val star = graft.ops.Dedup.duplicateClustersStar(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // ... AND the distributed star rounds (threshold 0 forces them)
      val dist = graft.ops.Dedup.duplicateClustersStar(pairs,
          driverThreshold = 0L).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(prop == star, s"graph $es")
      assert(prop == dist, s"graph $es (distributed path)")
      // fixpoint: both endpoints of every edge share a label, and
      // every label is the minimum of its own cluster
      es.foreach { case (a, b) =>
        assert(star(a) == star(b), s"edge ($a,$b) split in $star")
      }
      star.groupBy(_._2).foreach { case (lbl, members) =>
        assert(members.keys.min == lbl, s"label $lbl not cluster min")
      }
    }
  }

  test("sig5 is idempotent") {
    import graft.det.Sig.sig5
    import org.apache.spark.sql.functions.col
    samples(colGen, 8).foreach { xs =>
      val df = mk(xs)
      val once = df.select(sig5(col("x")).as("r")).collect()
        .map(_.getDouble(0))
      val twice = df.select(sig5(sig5(col("x"))).as("r")).collect()
        .map(_.getDouble(0))
      assert(once.toSeq == twice.toSeq, s"input $xs")
    }
  }

  test("TopKByScore equals sort-take under any partitioning of the " +
      "reduce/merge tree") {
    val entryGen: Gen[List[(Double, Long)]] = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(-1.0, 1.0), Gen.chooseNum(0L, 50L)))
    val kGen = Gen.chooseNum(1, 12)
    samples(Gen.zip(entryGen, kGen), 24).foreach { case (raw, k) =>
      // ids unique per group (the call-site invariant): keep the
      // first score per id
      val items = raw.groupBy(_._2).map(_._2.head).toList
      val agg = new graft.functions.TopKByScore(k)
      val want = items.sortBy { case (s, i) => (-s, i) }.take(k)
      // single reduce chain
      assert(items.foldLeft(agg.zero)(agg.reduce).toSeq == want,
        s"reduce: items=$items k=$k")
      // random split points → partial buffers → arbitrary merge tree
      (1 until math.min(items.length, 4)).foreach { parts =>
        val bufs = items.grouped(
          math.max(1, items.length / parts)).toList
          .map(_.foldLeft(agg.zero)(agg.reduce))
        val merged = bufs.reduce(agg.merge)
        assert(merged.toSeq == want,
          s"merge($parts): items=$items k=$k")
      }
    }
  }
}
