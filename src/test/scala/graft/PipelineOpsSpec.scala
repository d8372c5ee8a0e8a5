package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{KMeansOp, Pii, Search, VectorQuant}

/** BM25 retrieval, PII scrubbing, int8 quantization, and seeded
  * k-means on crafted fixtures with hand-computable expectations. */
class PipelineOpsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))
  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, docSchema)

  test("bm25: tf and length effects rank as the formula dictates") {
    val d = docs(
      0L -> "spark spark spark",          // high tf, short
      1L -> "spark alpha beta gamma delta epsilon zeta eta theta iota",
      2L -> "alpha beta gamma",           // no query term
      3L -> "spark spark alpha")
    val r = Search.bm25TopK(d, "doc_id", "text", Seq("spark"), k = 10)
      .collect()
    // doc 2 scores nothing; higher tf in shorter docs ranks first
    assert(r.map(_.getLong(1)).toSeq == Seq(0L, 3L, 1L))
    assert(r.head.getLong(0) == 1L) // rnk starts at 1
    // hand-check doc 0: N=4, df=3, dl=3, avgdl=19/4
    // idf = ln((4-3+0.5)/(3+0.5)+1); tf part = 3*2.2/(3+1.2*(0.25+0.75*3/4.75))
    val idf = math.log((4 - 3 + 0.5) / (3 + 0.5) + 1.0)
    val exp = idf * (3 * 2.2) / (3 + 1.2 * (0.25 + 0.75 * 3 / 4.75))
    assert(math.abs(r.head.getDouble(2) - exp) < 1e-4)
  }

  test("bm25: multi-term scores add; absent terms contribute nothing") {
    val d = docs(0L -> "spark hash", 1L -> "spark", 2L -> "hash zzz")
    val both = Search.bm25TopK(d, "doc_id", "text",
      Seq("spark", "hash", "nosuchterm"), k = 10).collect()
    assert(both.head.getLong(1) == 0L) // only doc 0 matches both terms
    assert(both.length == 3)
  }

  test("pii: detection counts and redaction placeholders") {
    val d = docs(
      0L -> "write to alice.b@corp.example.org and bob9@x.io today",
      1L -> "server 192.168.0.1 and 10.0.0.255 up",
      2L -> "call +1-555-123-4567 now",
      3L -> "clean text with nothing at all",
      4L -> "mixed a@b.cd at 8.8.8.8 via +44-207-946-0958")
    val r = Pii.piiStats(d, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getLong(1) == 2 && r(0L).getLong(2) == 0)
    assert(r(1L).getLong(2) == 2)
    assert(r(2L).getLong(3) == 1)
    assert(r(3L).getLong(1) + r(3L).getLong(2) + r(3L).getLong(3) == 0)
    assert(r(4L).getLong(1) == 1 && r(4L).getLong(2) == 1 &&
      r(4L).getLong(3) == 1)
    assert(r(0L).getString(4) ==
      "write to <EMAIL> and <EMAIL> today")
    assert(r(4L).getString(4) == "mixed <EMAIL> at <IP> via <PHONE>")
    // an email's dotted host must NOT leave a partial <IP> behind
    assert(!r(0L).getString(4).contains("<IP>"))
  }

  test("pii: synthesized corpus counts follow the doc_id formulas") {
    val base = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val r = Pii.piiStats(Pii.synthPii(base, "doc_id", "text"),
      "doc_id", "text").collect()
    r.foreach { x =>
      val id = x.getLong(0)
      assert(x.getLong(1) == id % 3, s"emails of doc $id")
      assert(x.getLong(2) == (if (id % 2 == 0) 1 else 0), s"ips of $id")
      assert(x.getLong(3) == (if (id % 5 == 0) 1 else 0), s"phones of $id")
      assert(!x.getString(4).contains("@"))
    }
  }

  private val vecSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))
  private def vecs(rows: (Long, Seq[Float])*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, vecSchema)

  test("quantize: exact codes on a crafted dimension, constant dim degenerates") {
    // dim 1 spans [0, 255] → step 1, codes = the values themselves;
    // dim 2 constant → step 0, every code 0, zero error
    val d = vecs(
      0L -> Seq(0.0f, 7.0f), 1L -> Seq(255.0f, 7.0f),
      2L -> Seq(128.0f, 7.0f), 3L -> Seq(1.4f, 7.0f))
    val r = VectorQuant.quantizeStats(d, "embedding", dim = 2)
      .collect().map(x => x.getLong(0) -> x).toMap
    val d1 = r(1L)
    assert(d1.getDouble(1) == 0.0 && d1.getDouble(2) == 255.0)
    assert(d1.getDouble(3) == 1.0)
    // 1.4 encodes to q=1 → error 0.4 is the max; mean = 0.4/4
    assert(math.abs(d1.getDouble(5) - 0.4) < 1e-6)
    assert(d1.getLong(6) == 4)
    val d2 = r(2L)
    assert(d2.getDouble(3) == 0.0 && d2.getLong(6) == 1)
    assert(d2.getDouble(4) == 0.0 && d2.getDouble(5) == 0.0)
  }

  test("quantize: reconstruction error bounded by half a step on real data") {
    val d = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val r = VectorQuant.quantizeStats(d, "embedding", dim = 64).collect()
    assert(r.length == 64)
    r.foreach { x =>
      val step = x.getDouble(3)
      assert(x.getDouble(5) <= step / 2 + 1e-9,
        s"dim ${x.getLong(0)} max err ${x.getDouble(5)} > step/2 $step")
      assert(x.getLong(6) >= 2 && x.getLong(6) <= 256)
    }
  }

  test("unigram LM score: rare tokens raise a doc's nll") {
    val d = docs(0L -> "a a", 1L -> "a b")
    val r = Search.unigramNll(d, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    // freq: a=3, b=1, total=4
    assert(math.abs(r(0L).getDouble(2) - math.log(4.0 / 3)) < 1e-4)
    assert(math.abs(r(1L).getDouble(2) -
      (math.log(4.0 / 3) + math.log(4.0)) / 2) < 1e-4)
    assert(r(1L).getDouble(2) > r(0L).getDouble(2))
    assert(r(0L).getLong(1) == 2L)
  }

  test("categorical entropy: uniform = ln k with evenness 1, constant = 0") {
    import graft.ops.CatStats
    val s = StructType(Seq(StructField("u", StringType),
      StructField("k", StringType)))
    val d = spark.createDataFrame(Seq(
      Row("x", "c"), Row("x", "c"), Row("y", "c"), Row("y", "c"))
      .asJava, s)
    val r = CatStats.entropy(d, Seq("u", "k")).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(math.abs(r("u").getDouble(3) - math.log(2.0)) < 1e-4)
    assert(math.abs(r("u").getDouble(4) - 1.0) < 1e-4)
    assert(r("k").getDouble(3) == 0.0)
    assert(r("k").isNullAt(4)) // evenness undefined for 1 category
    assert(r("u").getLong(1) == 4L && r("u").getLong(2) == 2L)
  }

  test("weighted sample: weight 1 keeps all, 0 keeps none, fractions track") {
    import graft.ops.Sampling
    val d = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val n = d.count()
    assert(Sampling.weightedSample(d, "doc_id", lit(1.0)).count() == n)
    assert(Sampling.weightedSample(d, "doc_id", lit(0.0)).count() == 0)
    // a flat 0.3 weight keeps ~30% (MINSTD mille is near-uniform)
    val k = Sampling.weightedSample(d, "doc_id", lit(0.3)).count()
    assert(k > n * 0.2 && k < n * 0.4, s"kept $k of $n at weight 0.3")
    // deterministic: the same call yields the identical kept set
    val a = Sampling.weightedSample(d, "doc_id", lit(0.3))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedSample(d, "doc_id", lit(0.3))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("lagged features: leakage-free rolling frame excludes current row") {
    import graft.ops.EventOps
    val s = StructType(Seq(StructField("event_id", LongType),
      StructField("user_id", LongType), StructField("ts", LongType),
      StructField("value", DoubleType)))
    // ts in NANOS (the fixtures' nanosAsLong shape): us = ns div 1000
    val d = spark.createDataFrame(Seq(
      Row(1L, 1L, 1000L, 10.0), Row(2L, 1L, 2000L, 20.0),
      Row(3L, 1L, 3000L, 30.0), Row(4L, 1L, 4000L, 40.0),
      Row(5L, 1L, 5000L, 50.0), Row(6L, 2L, 1000L, 99.0)).asJava, s)
    val r = EventOps.laggedFeatures(d).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).isNullAt(3) && r(1L).isNullAt(4) && r(1L).isNullAt(5))
    assert(r(1L).getLong(6) == 0L)
    assert(r(2L).getDouble(3) == 10.0 && r(2L).getLong(4) == 1L)
    assert(r(2L).getDouble(5) == 10.0) // mean of the single prev row
    assert(r(5L).getDouble(5) == 30.0) // mean(20,30,40), not incl. 50
    assert(r(5L).getLong(6) == 3L)
    assert(r(6L).isNullAt(3)) // other user: frames never cross keys
  }

  test("kmeans: 1 iteration assigns every row to its nearest seed") {
    // two tight blobs around the seed rows 10 and 11
    val d = vecs(
      0L -> Seq(1.0f, 0.0f), 1L -> Seq(1.1f, 0.0f),
      2L -> Seq(0.9f, 0.1f), 3L -> Seq(10.0f, 10.0f),
      4L -> Seq(10.1f, 9.9f),
      10L -> Seq(1.0f, 0.1f), 11L -> Seq(10.0f, 10.1f))
    val r = KMeansOp.kmeansStats(d, "vec_id", "embedding",
      seedLo = 10L, seedHi = 12L, iters = 1, dim = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r == Map(10L -> 4L, 11L -> 3L)) // seeds assign to themselves
  }

  test("kmeans: second iteration shrinks or preserves total WCSS") {
    val d = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    def total(iters: Int) = KMeansOp.kmeansStats(d, "vec_id",
      "embedding", 120L, 136L, iters).collect().map(_.getDouble(2)).sum
    val w1 = total(1); val w2 = total(2)
    // Lloyd's monotonicity (up to the 1e-5 sig5 rounding granularity)
    assert(w2 <= w1 * (1 + 1e-4), s"wcss rose: $w1 -> $w2")
    // and membership covers the whole corpus in both runs
    val n = KMeansOp.kmeansStats(d, "vec_id", "embedding", 120L, 136L, 2)
      .collect().map(_.getLong(1)).sum
    assert(n == d.count())
  }
}
