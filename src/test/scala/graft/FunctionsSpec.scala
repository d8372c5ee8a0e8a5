package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.RollingMinHash
import graft.ops.TextStats

class FunctionsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private val docs = spark.createDataFrame(Seq(
    Row(0L, "the quick brown fox jumps over the lazy dog"),
    Row(1L, "pack my box with five dozen liquor jugs"),
    Row(2L, "short"),
    Row(3L, "exactly8!")
  ).asJava, docSchema)

  test("native rolling_min_hash equals the composed-builtins form") {
    val nat = TextStats.fingerprints(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val comp = TextStats.fingerprintsComposed(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nat == comp)
    assert(!nat.contains(2L)) // shorter than gram => filtered
  }

  test("rolling_min_hash: nulls, short strings, SQL registration") {
    val withNull = spark.createDataFrame(
      Seq(Row(0L, null), Row(1L, "a plausible document")).asJava,
      docSchema)
    val r = withNull.select(col("doc_id"),
      RollingMinHash.rolling_min_hash(col("text")).as("fp")).collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None
                                 else Some(x.getLong(1)))).toMap
    assert(r(0L).isEmpty)
    assert(r(1L).isDefined)
    RollingMinHash.register(spark)
    docs.createOrReplaceTempView("fndocs")
    val viaSql = spark.sql(
      "SELECT doc_id, rolling_min_hash(text, 8) AS fp FROM fndocs " +
        "WHERE length(text) >= 8 ORDER BY doc_id").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val direct = TextStats.fingerprints(docs, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(viaSql == direct)
  }

  test("native sig5 equals the composed-builtins form and the " +
      "driver scalar twin bit-for-bit") {
    val sql = spark
    import sql.implicits._
    val rng = new scala.util.Random(7L)
    val values: Seq[java.lang.Double] =
      Seq[java.lang.Double](null, 0.0, -0.0, 1e-13, -1e-13, 1e-12,
        -1e-12, 1.0, -1.0, 102.7575, 0.123455, 12345.5, 1e300, 1e-300,
        Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity) ++
        (1 to 500).map(_ => Double.box(
          (rng.nextDouble() - 0.5) * math.pow(10.0, rng.nextInt(20) - 10)))
    val df = values.toDF("x")
    val rows = df.select(
        graft.det.Sig.sig5(col("x")).as("nat"),
        graft.det.Sig.sig5Composed(col("x")).as("comp"))
      .collect()
    rows.zip(values).foreach { case (r, v) =>
      val nat = if (r.isNullAt(0)) null else Double.box(r.getDouble(0))
      val comp = if (r.isNullAt(1)) null else Double.box(r.getDouble(1))
      def bits(d: java.lang.Double) =
        if (d == null) -1L
        else java.lang.Double.doubleToLongBits(d.doubleValue)
      assert(bits(nat) == bits(comp),
        s"sig5($v): native $nat != composed $comp")
      // driver twin (skip null and the non-finite inputs the scalar
      // legacy form handles differently by documented design)
      if (v != null && !v.isNaN && !v.isInfinite) {
        assert(bits(nat) == bits(Double.box(
          graft.det.Sig.sig5(v.doubleValue))),
          s"sig5($v): native $nat != driver twin")
      }
    }
  }

  test("array_dot equals the composed zip_with+aggregate fold bit-for-bit") {
    val vs = StructType(Seq(StructField("id", LongType),
      StructField("a", ArrayType(FloatType)),
      StructField("b", ArrayType(FloatType))))
    val rng = new scala.util.Random(11)
    val rows = (0 until 100).map { i =>
      Row(i.toLong, Seq.fill(64)(rng.nextFloat() - 0.5f),
        Seq.fill(64)(rng.nextFloat() - 0.5f))
    }
    val df = spark.createDataFrame(rows.asJava, vs)
    val got = df.select(
      graft.functions.ArrayDot.array_dot(col("a"), col("b")).as("nat"),
      graft.ops.Similarity.dotComposed(col("a"), col("b")).as("comp"))
      .collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    // null + mismatch semantics
    val edge = spark.createDataFrame(Seq(
      Row(0L, Seq(1.0f, 2.0f), Seq(3.0f)),
      Row(1L, null, Seq(1.0f))).asJava, vs)
    val e = edge.select(graft.functions.ArrayDot
      .array_dot(col("a"), col("b")).as("d")).collect()
    assert(e.forall(_.isNullAt(0)))
    // SQL registration
    graft.functions.ArrayDot.register(spark)
    df.createOrReplaceTempView("adot")
    assert(spark.sql(
      "SELECT array_dot(a, a) >= 0 AS ok FROM adot").collect()
      .forall(_.getBoolean(0)))
  }

  test("rolling_min_hash matches a hand-rolled reference on random ASCII") {
    def ref(s: String, gram: Int): Option[Long] = {
      if (s.length < gram) None
      else Some((0 to s.length - gram).map { i =>
        s.substring(i, i + gram).foldLeft(0L)((h, c) => h * 31L + c.toLong)
      }.min)
    }
    val rng = new scala.util.Random(7)
    val strs = (0 until 50).map { i =>
      i.toLong -> rng.alphanumeric.take(rng.nextInt(40) + 1).mkString
    }
    val df = spark.createDataFrame(
      strs.map { case (i, s) => Row(i, s) }.asJava, docSchema)
    val got = df.select(col("doc_id"),
      RollingMinHash.rolling_min_hash(col("text")).as("fp")).collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None
                                 else Some(x.getLong(1)))).toMap
    strs.foreach { case (i, s) => assert(got(i) == ref(s, 8), s"doc $i") }
  }
}
