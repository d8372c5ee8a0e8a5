package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKByScore
import graft.ops.CatStats

/** Round-8 additions: the sample_quota window-free contract, the
  * NaN-total-order fix in TopKByScore, and the ADVICE determinism
  * hardenings (Theil guard, inclusion native keys, associationAll
  * normalization, eqDepth NaN exclusion). */
class Round8Spec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private lazy val sql = spark
  private val sfDir = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------
  // sample_quota: bounded-heap per-group top-k, window-free plan
  // ---------------------------------------------------------------

  test("sample_quota runs window-free (TopKByScore contract) and " +
      "matches the windowed reference ranking") {
    val out = SparkEntry.queries("sample_quota")(spark, sfDir)
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "sample_quota must not rank through a window partition")
    val got = out.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // independent reference: the windowed form the oracle uses
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val q = graft.ops.TextStats.quality(d, "doc_id", "text")
      .select(col("doc_id"), col("quality"))
      .join(d.select(col("doc_id"), col("lang")), Seq("doc_id"))
    import org.apache.spark.sql.expressions.Window
    val ref = q.withColumn("rnk",
        row_number().over(Window.partitionBy("lang")
          .orderBy(col("quality").desc, col("doc_id"))))
      .where(col("rnk") <= 5)
      .select(col("lang"), col("rnk").cast("long"), col("doc_id"),
        col("quality"))
      .orderBy("lang", "rnk")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq == ref.toSeq)
  }

  // ---------------------------------------------------------------
  // TopKByScore: NaN has a defined, order-independent rank
  // ---------------------------------------------------------------

  test("TopKByScore ranks NaN deterministically regardless of " +
      "buffer order") {
    import sql.implicits._
    val rows = Seq((1L, Double.NaN, 10L), (1L, 0.9, 11L),
      (1L, Double.NaN, 12L), (1L, 0.7, 13L), (1L, 0.8, 14L))
    // two opposite insertion orders must agree exactly
    val outs = Seq(rows, rows.reverse).map { rs =>
      rs.toDF("g", "s", "id").repartition(1)
        .groupBy("g").agg(TopKByScore.top_k(3)(col("s"), col("id")))
        .collect()(0).getSeq[org.apache.spark.sql.Row](1)
        // NaN-safe equality: compare the raw bit pattern (NaN != NaN
        // under tuple ==, which would fail on identical outputs)
        .map(r => (java.lang.Double.doubleToLongBits(r.getDouble(0)),
          r.getLong(1)))
    }
    assert(outs(0) == outs(1), s"order-dependent: ${outs(0)} vs ${outs(1)}")
    // Double.compare total order: NaN above every number, id tiebreak
    assert(outs(0).map(_._2) == Seq(10L, 12L, 11L))
  }

  // ---------------------------------------------------------------
  // Theil's U guard decides on integer cardinality, not a float sum
  // ---------------------------------------------------------------

  test("association: constant facet reports NULL Theil's U toward " +
      "the constant side, number away from it") {
    import sql.implicits._
    val df = Seq(("k", "x"), ("k", "y"), ("k", "y"), ("k", "x"))
      .toDF("a", "b")
    val r = CatStats.association(df, Seq(("a", "b"))).collect()(0)
    // card_a = 1: H(A) = 0, U(A|B) undefined -> NULL
    assert(r.isNullAt(r.fieldIndex("theils_u_ab")),
      "U(A|B) must be NULL for a constant A")
    // H(B) > 0 and H(B|A) = H(B): U(B|A) = 0
    assert(r.getDouble(r.fieldIndex("theils_u_ba")) == 0.0)
  }

  // ---------------------------------------------------------------
  // Inclusion: native (non-numeric) key types join correctly
  // ---------------------------------------------------------------

  test("inclusionStats handles string keys (no silent long-cast)") {
    import sql.implicits._
    val child = Seq("a", "b", "b", "c").toDF("k8")
    val parent = Seq("a", "b", "c", "d").toDF("p8")
    val r = graft.ops.Inclusion.inclusionStats(
      Seq(("child.k8->parent.p8", child, "k8", parent, "p8")))
      .collect()(0)
    assert(r.getLong(r.fieldIndex("n_child_distinct")) == 3L)
    assert(r.getLong(r.fieldIndex("n_shared")) == 3L)
    assert(r.getLong(r.fieldIndex("is_fk")) == 1L)
  }

  // ---------------------------------------------------------------
  // associationAll groups float facets like association does
  // ---------------------------------------------------------------

  test("associationAll normalizes -0.0 so both twin paths agree") {
    import sql.implicits._
    val df = Seq((0.0, "x"), (-0.0, "x"), (1.5, "y"), (1.5, "y"))
      .toDF("f", "c")
    val one = CatStats.association(df, Seq(("f", "c"))).collect()(0)
    val all = CatStats.associationAll(df, Seq(("f", "c"))).collect()(0)
    assert(one.getLong(one.fieldIndex("card_a")) == 2L)
    assert(all.getLong(all.fieldIndex("card_a")) == 2L,
      "-0.0 and 0.0 must be ONE category on the all-pairs path")
    assert(one.getDouble(one.fieldIndex("cramers_v")) ==
      all.getDouble(all.fieldIndex("cramers_v")))
  }

  // ---------------------------------------------------------------
  // Catalog-bucket cap: bounded BottomK aggregate, window-free
  // ---------------------------------------------------------------

  private val docSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text",
      org.apache.spark.sql.types.StringType)))
  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2)).asJava,
      docSchema)

  test("catalog-bucket cap is window-free and keeps the cap " +
      "smallest ids per bucket") {
    val base = (1 to 14).map(i => s"tok$i").mkString(" ")
    val catalog = docs((0L until 30L).map(i =>
      i -> (base + s" tail$i")): _*)
    val incoming = docs((100L, base + " tailX"))
    val q = graft.ops.Dedup.incrementalLshPairs(incoming, catalog,
      "doc_id", "text", n = 3, numHashes = 64, bands = 16,
      minEstJaccard = 0.3, maxCatalogPerBucket = Some(3L))
    assert(!q.queryExecution.executedPlan.toString.contains("Window"),
      "the per-bucket cap must not sort buckets through a window")
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: the row_number-window form the cap replaced
    val sigs = graft.ops.Dedup.minhashSignatures(catalog, "doc_id",
      "text", n = 3, numHashes = 64)
    val bandsDf = graft.ops.Dedup.bandedFromSignatures(sigs, 64, 16)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("band", "bh").orderBy(col("id").asc)
    val cappedRef = bandsDf.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= 3L).drop("__rn")
    val ref = graft.ops.Dedup.incrementalLshPairsWithIndex(incoming,
        sigs, cappedRef, "doc_id", "text", n = 3, numHashes = 64,
        bands = 16, minEstJaccard = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == ref,
      s"BottomK cap must equal the windowed cap: $got vs $ref")
    assert(got.nonEmpty, "detection must survive the cap")
  }

  // ---------------------------------------------------------------
  // Catalog index append: merged index ≡ rebuilt index
  // ---------------------------------------------------------------

  test("appendCatalogIndex folds a batch into the persisted index; " +
      "probe equals a full rebuild") {
    val base = (1 to 14).map(i => s"tok$i").mkString(" ")
    val day0 = docs((0L, base), (1L, base + " tailA"),
      (2L, (30 to 45).map(i => s"other$i").mkString(" ")))
    val day1 = docs((10L, base + " tailB"),
      (11L, (60 to 75).map(i => s"fresh$i").mkString(" ")))
    val incoming = docs((100L, base + " tailC"),
      (101L, (60 to 75).map(i => s"fresh$i").mkString(" ") + " x"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_catidx_merge").toString
    graft.ops.Dedup.writeCatalogIndex(day0, "doc_id", "text", dir,
      n = 3, numHashes = 64, bands = 16)
    graft.ops.Dedup.appendCatalogIndex(day1, "doc_id", "text", dir,
      n = 3, numHashes = 64, bands = 16)
    val (sigs, bandsDf) = graft.ops.Dedup.readCatalogIndex(spark, dir)
    val viaMerged = graft.ops.Dedup.incrementalLshPairsWithIndex(
      incoming, sigs, bandsDf, "doc_id", "text", n = 3,
      numHashes = 64, bands = 16, minEstJaccard = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rebuilt = graft.ops.Dedup.incrementalLshPairs(incoming,
      day0.unionByName(day1), "doc_id", "text", n = 3,
      numHashes = 64, bands = 16, minEstJaccard = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaMerged == rebuilt,
      s"append must equal rebuild: $viaMerged vs $rebuilt")
    // the appended near-dup of the boilerplate cluster is probed
    assert(viaMerged.contains((100L, 10L)),
      "incoming must collide with the APPENDED catalog doc")
    assert(viaMerged.contains((101L, 11L)),
      "incoming must collide with the appended fresh doc")
  }

  // ---------------------------------------------------------------
  // eqDepthHistogram excludes NaN like it excludes NULL
  // ---------------------------------------------------------------

  test("eqDepthHistogram drops NaN rows (cross-engine binning)") {
    import sql.implicits._
    val df = (Seq.tabulate(40)(i => (i + 1).toDouble) ++
      Seq(Double.NaN, Double.NaN)).toDF("v")
    val bins = graft.profiler.Stats.eqDepthHistogram(df, "v", bins = 4)
      .collect()
    assert(bins.map(_.getLong(1)).sum == 40L,
      "NaN rows must not be binned")
    assert(bins.forall(r => !r.getDouble(2).isNaN && !r.getDouble(3).isNaN))
  }
}
