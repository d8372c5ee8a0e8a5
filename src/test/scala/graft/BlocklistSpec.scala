package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.AhoCorasickCount
import graft.functions.AhoCorasickCount.ac_counts
import graft.ops.Blocklist

class BlocklistSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def df(rows: (Long, String)*) =
    spark.createDataFrame(
      rows.map { case (i, t) => Row(i, t) }.asJava, docSchema)

  /** Naive all-occurrences (overlapping) byte-level reference. */
  private def naive(text: String, pats: Seq[String]): Seq[Long] = {
    val tb = text.getBytes("UTF-8")
    pats.map { p =>
      val pb = p.getBytes("UTF-8")
      (0 to tb.length - pb.length)
        .count(i => tb.slice(i, i + pb.length).sameElements(pb)).toLong
    }
  }

  private def acDirect(text: String, pats: Seq[String]): Seq[Long] =
    new graft.functions.AcAutomaton(
      pats.map(_.getBytes("UTF-8")).toArray)
      .count(text.getBytes("UTF-8")).toSeq

  test("AC counts every occurrence, overlapping included") {
    assert(acDirect("aaaa", Seq("aa")) == Seq(3L))
    assert(acDirect("abcbc", Seq("ab", "abc", "bc")) == Seq(1L, 1L, 2L))
    // pattern that is a suffix of another fires on both paths
    assert(acDirect("xabc", Seq("abc", "c", "bc")) == Seq(1L, 1L, 1L))
    assert(acDirect("", Seq("a")) == Seq(0L))
    assert(acDirect("ab", Seq("abc")) == Seq(0L))
  }

  test("AC equals the naive scan on 300 random (text, patterns) draws") {
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      val text = (1 to rnd.nextInt(60)).map(_ =>
        "ab".charAt(rnd.nextInt(2))).mkString
      val nPats = 1 + rnd.nextInt(4)
      val pats = (1 to nPats).map(_ => (1 to 1 + rnd.nextInt(3)).map(_ =>
        "ab".charAt(rnd.nextInt(2))).mkString).distinct
      assert(acDirect(text, pats) == naive(text, pats),
        s"text=$text pats=$pats")
    }
  }

  test("UTF-8 multibyte patterns match byte-exactly") {
    assert(acDirect("café café", Seq("café", "fe")) ==
      Seq(2L, 0L))
  }

  test("expression: null in null out; interpreted == codegen") {
    val d = df(0L -> "spark spark slow", 1L -> null,
      2L -> "no hits here at all")
    val pats = Seq("spark", "slow", "fast merge")
    def run(): Map[Long, Option[Seq[Long]]] =
      d.select(col("doc_id"), ac_counts(col("text"), pats).as("c"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getSeq[Long](1)))).toMap
    val gen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try run() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(gen == interp)
    assert(gen(0L).contains(Seq(2L, 1L, 0L)))
    assert(gen(1L).isEmpty)
    assert(gen(2L).contains(Seq(0L, 0L, 0L)))
  }

  test("fixture blocklist terms are borderless (replace-count oracle premise)") {
    graft.queries.BlocklistQueries.Terms.foreach { tm =>
      (1 until tm.length).foreach { k =>
        assert(tm.take(k) != tm.takeRight(k),
          s"'$tm' has border of length $k — replace-count oracle " +
            "would diverge from AC on overlapping occurrences")
      }
    }
  }

  test("gate / termStats / filterDocs compose correctly") {
    val d = df(0L -> "SPARK is slow slow", 1L -> "clean text",
      2L -> "big data spark")
    val terms = Seq("spark", "slow", "big data")
    val g = Blocklist.gate(d, "doc_id", "text", terms).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(g(0L) == ((3L, 2L, false))) // lower() catches SPARK
    assert(g(1L) == ((0L, 0L, true)))
    assert(g(2L) == ((2L, 2L, false)))
    val kept = Blocklist.filterDocs(d, "text", terms).collect()
      .map(_.getLong(0)).toSet
    assert(kept == Set(1L))
    val st = Blocklist.termStats(d, "text", terms).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(st("spark") == ((2L, 2L)))
    assert(st("slow") == ((2L, 1L)))
    assert(st("big data") == ((1L, 1L)))
  }

  test("matchCounts explodes to (id, term, n) rows") {
    val d = df(0L -> "spark slow spark")
    val m = Blocklist.matchCounts(d, "doc_id", "text",
      Seq("spark", "slow")).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(m == Map("spark" -> 2L, "slow" -> 1L))
  }

  test("ac_hit (early-exit gate) agrees with counts on random draws and nulls") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val text = (1 to rnd.nextInt(40)).map(_ =>
        "ab".charAt(rnd.nextInt(2))).mkString
      val pats = (1 to 1 + rnd.nextInt(3)).map(_ =>
        (1 to 1 + rnd.nextInt(3)).map(_ =>
          "ab".charAt(rnd.nextInt(2))).mkString).distinct
      val auto = new graft.functions.AcAutomaton(
        pats.map(_.getBytes("UTF-8")).toArray)
      assert(auto.anyHit(text.getBytes("UTF-8")) ==
        naive(text, pats).exists(_ > 0), s"text=$text pats=$pats")
    }
    val d = df(0L -> "clean", 1L -> null, 2L -> "has spark here")
    val r = d.select(col("doc_id"), graft.functions.AhoCorasickCount
      .ac_hit(col("text"), Seq("spark")).as("h")).collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getBoolean(1)))).toMap
    assert(r == Map(0L -> Some(false), 1L -> None, 2L -> Some(true)))
  }

  test("termStatsByLang reports only each language's own list") {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("text", StringType)))
    val d = spark.createDataFrame(Seq(
      Row(0L, "en", "spark slow"),
      Row(1L, "es", "spark stream"),
      Row(2L, "en", "stream stream")).asJava, schema)
    val st = Blocklist.termStatsByLang(d, "lang", "text",
      Map("en" -> Seq("spark", "slow"), "es" -> Seq("stream")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // en doc 2 contains "stream" twice but stream is not on the en
    // list; es doc 1 contains "spark" but spark is not on the es list
    assert(st == Map(
      ("en", "spark") -> ((1L, 1L)), ("en", "slow") -> ((1L, 1L)),
      ("es", "stream") -> ((1L, 1L))))
  }

  test("gate plan shape: map-only, no exchange, inside codegen") {
    // parquet-backed source: a LocalRelation would be constant-folded
    // by ConvertToLocalRelation and leave no plan to assert on
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bl_plan").toString
    df(0L -> "spark slow", 1L -> "clean").write
      .mode("overwrite").parquet(dir)
    val d = spark.read.parquet(dir)
    val plan = Blocklist.filterDocs(d, "text", Seq("spark", "x y"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"blocklist gate must be map-only:\n$plan")
    // `*(1)` is the whole-stage-codegen marker in the simple plan
    // string — the filter must carry it
    assert(plan.contains("*(1) Filter"),
      s"ac_hit must stay inside whole-stage codegen:\n$plan")
  }

  test("SQL registration: ac_counts / ac_hit usable from SQL") {
    graft.functions.AhoCorasickCount.register(spark)
    df(0L -> "spark slow spark").createOrReplaceTempView("bldocs")
    val r = spark.sql("SELECT ac_counts(text, 'spark', 'slow') AS c, " +
      "ac_hit(text, 'absent') AS h FROM bldocs").collect().head
    assert(r.getSeq[Long](0) == Seq(2L, 1L))
    assert(!r.getBoolean(1))
  }

  test("ac_counts rejects empty pattern lists and non-string input") {
    val d = df(0L -> "x")
    intercept[Exception] {
      d.select(ac_counts(col("text"), Seq.empty)).collect()
    }
    intercept[Exception] {
      d.select(ac_counts(col("doc_id"), Seq("a"))).collect()
    }
  }
}
