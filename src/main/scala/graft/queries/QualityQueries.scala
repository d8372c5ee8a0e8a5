package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.det.Sig
import graft.ops.Quality
import graft.ops.Quality._

/** Declared data-quality queries: the verification suite, the
  * per-group twin, and constraint suggestion — with oracle SQL
  * GENERATED from the same check metadata the Spark side declares,
  * so constants, aliases, and rounding can never drift between the
  * two engines (the Core.scala pattern). */
object QualityQueries {

  private def sig(x: String) = Sig.sql(x)

  private def unionAll(parts: Seq[String]): String =
    parts.mkString("", "\nUNION ALL\n", "")

  private def lit(x: Double): String = s"CAST(${x} AS DOUBLE)"

  // ---------------------------------------------------------------- //
  // The declared suites (one definition site for both engines).
  // ---------------------------------------------------------------- //

  /** lineitem gate: a deliberate pass/fail mix — the uniqueness
    * check FAILS by design (l_orderkey repeats across lines), so the
    * failed path of the comparator is exercised, not just all-green
    * output. */
  val lineitemChecks: Seq[Check] = Seq(
    Completeness("l_quantity", 0.99),
    Completeness("l_returnflag", 1.0),
    Uniqueness("l_orderkey", 0.9),
    InRange("l_discount", 0.0, 0.1, 1.0),
    InRange("l_quantity", 1.0, 30.0, 0.5),
    InSet("l_returnflag", Seq("A", "N", "R"), 1.0),
    Matches("l_linestatus", "^[OF]$", 1.0),
    MeanBetween("l_tax", 0.0, 0.1),
    MinBetween("l_quantity", 1.0, 1.0),
    MaxBetween("l_quantity", 30.0, 100.0),
    RowCountBetween(1000L, 10000000000L))

  /** per-source documents gate (the per-shard corpus acceptance
    * shape): mean document length varies by source, so the
    * mean_between rows carry a data-dependent pass/fail mix. */
  val documentChecks: Seq[Check] = Seq(
    Completeness("text", 1.0),
    InRange("n_chars", 1.0, 2000.0, 1.0),
    InSet("lang", Seq("de", "en", "es", "fr", "zh"), 1.0),
    MeanBetween("n_chars", 150.0, 300.0),
    RowCountBetween(1L, 10000000000L))

  /** Warehouse-wide manifest: a minimal generic gate per table —
    * row count, key completeness, key uniqueness (threshold 1.0 on
    * true PKs; 0.1 on lineitem, whose l_orderkey repeats ~4× by
    * construction at every sf). One definition site for both
    * engines, like the per-table suites. */
  val manifestTables: Seq[(String, String, Double)] = Seq(
    ("region", "r_regionkey", 1.0),
    ("nation", "n_nationkey", 1.0),
    ("customer", "c_custkey", 1.0),
    ("supplier", "s_suppkey", 1.0),
    ("part", "p_partkey", 1.0),
    ("orders", "o_orderkey", 1.0),
    ("lineitem", "l_orderkey", 0.1),
    ("events", "event_id", 1.0),
    ("documents", "doc_id", 1.0),
    ("embeddings", "vec_id", 1.0))

  private def manifestChecks(key: String, uniqLo: Double): Seq[Check] =
    Seq(RowCountBetween(1L, 10000000000000L),
      Completeness(key, 1.0),
      Uniqueness(key, uniqLo))

  private val suggestCols: Seq[String] = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus")
  private val suggestNums: Seq[String] = suggestCols.take(8)
  private val suggestStrings: Seq[String] =
    Seq("l_returnflag", "l_linestatus")
  private val SuggestLowCard = 8

  // ---------------------------------------------------------------- //
  // Oracle generation.
  // ---------------------------------------------------------------- //

  private def quote(s: String) = "'" + s.replace("'", "''") + "'"

  /** The observed-metric SQL for one check (pre-rounding). */
  private def observedSql(chk: Check): String = {
    def ratio(num: String, den: String) =
      s"CASE WHEN $den = 0 THEN 1.0 " +
        s"ELSE CAST($num AS DOUBLE) / CAST($den AS DOUBLE) END"
    chk match {
      case Completeness(c, _) => ratio(s"count($c)", "count(*)")
      case Uniqueness(c, _) => ratio(s"count(DISTINCT $c)", s"count($c)")
      case InRange(c, lo, hi, _) =>
        ratio(s"count(CASE WHEN $c >= ${lit(lo)} AND $c <= ${lit(hi)} " +
          "THEN 1 END)", s"count($c)")
      case InSet(c, vs, _) =>
        ratio(s"count(CASE WHEN $c IN (${vs.map(quote).mkString(", ")}) " +
          "THEN 1 END)", s"count($c)")
      case Matches(c, p, _) =>
        ratio(s"count(CASE WHEN regexp_matches($c, ${quote(p)}) " +
          "THEN 1 END)", s"count($c)")
      case MeanBetween(c, _, _) => s"avg($c)"
      case RowCountBetween(_, _) => "CAST(count(*) AS DOUBLE)"
      case MinBetween(c, lo, _) =>
        s"COALESCE(CAST(min($c) AS DOUBLE), ${lit(lo)})"
      case MaxBetween(c, lo, _) =>
        s"COALESCE(CAST(max($c) AS DOUBLE), ${lit(lo)})"
    }
  }

  private def checkMeta(chk: Check): (String, String, Double, Double) =
    chk match {
      case Completeness(c, t) => ("completeness", c, t, 1.0)
      case Uniqueness(c, t) => ("uniqueness", c, t, 1.0)
      case InRange(c, _, _, t) => ("in_range", c, t, 1.0)
      case InSet(c, _, t) => ("in_set", c, t, 1.0)
      case Matches(c, _, t) => ("matches", c, t, 1.0)
      case MeanBetween(c, lo, hi) => ("mean_between", c, lo, hi)
      case RowCountBetween(lo, hi) =>
        ("row_count", "*", lo.toDouble, hi.toDouble)
      case MinBetween(c, lo, hi) => ("min_between", c, lo, hi)
      case MaxBetween(c, lo, hi) => ("max_between", c, lo, hi)
    }

  /** One SELECT per check; a subquery isolates the (large, sig5-
    * expanded) observed expression so `passed` can reference it by
    * name. `groupCol` switches on the per-group twin. */
  private def checkSql(t: String, chk: Check,
      groupCol: Option[String]): String = {
    val (typ, cn, lo, hi) = checkMeta(chk)
    val obs = sig(observedSql(chk))
    val gSel = groupCol.map(g => s"$g, ").getOrElse("")
    val gBy = groupCol.map(g => s" GROUP BY $g").getOrElse("")
    s"""SELECT ${gSel}check_type, col_name, observed, lo, hi,
       |CAST(CASE WHEN observed >= lo AND observed <= hi
       |     THEN 1 ELSE 0 END AS BIGINT) AS passed
       |FROM (SELECT $gSel${quote(typ)} AS check_type,
       |  ${quote(cn)} AS col_name, $obs AS observed,
       |  ${lit(lo)} AS lo, ${lit(hi)} AS hi FROM $t$gBy)""".stripMargin
  }

  private def suiteSql(t: String, checks: Seq[Check],
      groupCol: Option[String]): String = {
    val order = (groupCol.toSeq ++ Seq("check_type", "col_name"))
      .mkString(", ")
    unionAll(checks.map(checkSql(t, _, groupCol))) +
      s"\nORDER BY $order"
  }

  /** Suggestion oracle: the same two logical passes as
    * [[Quality.suggest]] expressed as per-rule aggregate SELECTs with
    * HAVING as the emission gate. */
  private def suggestSql(t: String): String = {
    val notNull = suggestCols.map(c =>
      s"""SELECT ${quote(c)} AS col_name, 'not_null' AS rule,
         |'' AS detail, ${lit(0.0)} AS lo, ${lit(0.0)} AS hi FROM $t
         |HAVING count($c) = count(*) AND count(*) > 0""".stripMargin)
    val uniq = suggestCols.map(c =>
      s"""SELECT ${quote(c)} AS col_name, 'unique' AS rule,
         |'' AS detail, ${lit(0.0)} AS lo, ${lit(0.0)} AS hi FROM $t
         |HAVING count(DISTINCT $c) = count($c) AND count($c) > 1""".stripMargin)
    val isin = suggestStrings.map(c =>
      s"""SELECT ${quote(c)} AS col_name, 'is_in' AS rule,
         |string_agg(DISTINCT $c, ',' ORDER BY $c) AS detail,
         |${lit(0.0)} AS lo, ${lit(0.0)} AS hi FROM $t
         |HAVING count(DISTINCT $c) <= $SuggestLowCard
         |AND count(DISTINCT $c) > 0""".stripMargin)
    val rng = suggestNums.map(c =>
      s"""SELECT ${quote(c)} AS col_name, 'value_range' AS rule,
         |'' AS detail, CAST(min($c) AS DOUBLE) AS lo,
         |CAST(max($c) AS DOUBLE) AS hi FROM $t
         |HAVING count($c) > 0""".stripMargin)
    val nonNeg = suggestNums.map(c =>
      s"""SELECT ${quote(c)} AS col_name, 'non_negative' AS rule,
         |'' AS detail, ${lit(0.0)} AS lo, ${lit(0.0)} AS hi FROM $t
         |HAVING count($c) > 0 AND min($c) >= 0""".stripMargin)
    unionAll(notNull ++ uniq ++ isin ++ rng ++ nonNeg) +
      "\nORDER BY col_name, rule"
  }

  // ---------------------------------------------------------------- //
  // Declared queries + oracles.
  // ---------------------------------------------------------------- //

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Benford oracle: the same exact-positive-power digit extraction,
    * rounded observed/expected named in subqueries so the gap and
    * TVD reference the SAME canon doubles the Spark side compares. */
  private def benfordSql(t: String, c: String): String =
    s"""WITH src AS (
       |  SELECT abs(CAST($c AS DOUBLE)) AS x FROM $t
       |  WHERE $c IS NOT NULL AND abs(CAST($c AS DOUBLE)) > 0),
       |dg AS (
       |  SELECT CASE WHEN s >= 10 THEN floor(s / 10)
       |              WHEN s < 1 THEN floor(s * 10)
       |              ELSE floor(s) END AS digit
       |  FROM (SELECT CASE WHEN p >= 0 THEN x / power(10.0, p)
       |               ELSE x * power(10.0, -p) END AS s
       |        FROM (SELECT x, floor(log10(x)) AS p FROM src))),
       |cnt AS (SELECT CAST(digit AS BIGINT) AS digit, count(*) AS c
       |  FROM dg GROUP BY 1),
       |spine AS (SELECT CAST(d AS BIGINT) AS digit
       |  FROM range(1, 10) t(d)),
       |joined AS (SELECT spine.digit, COALESCE(cnt.c, 0) AS c
       |  FROM spine LEFT JOIN cnt ON spine.digit = cnt.digit),
       |per AS (SELECT digit,
       |  ${sig("CASE WHEN (SELECT sum(c) FROM joined) = 0 THEN 0.0 " +
           "ELSE CAST(c AS DOUBLE) / (SELECT sum(c) FROM joined) END")}
       |    AS observed,
       |  ${sig("log10(1.0 + 1.0 / CAST(digit AS DOUBLE))")} AS expected
       |  FROM joined),
       |per2 AS (SELECT digit, observed, expected,
       |  ${sig("abs(observed - expected)")} AS abs_gap FROM per),
       |tvd AS (SELECT ${sig("sum(abs_gap) / 2.0")} AS observed
       |  FROM per2)
       |SELECT digit, observed, expected, abs_gap FROM per2
       |UNION ALL
       |SELECT CAST(0 AS BIGINT) AS digit, observed,
       |  CAST(0.0 AS DOUBLE) AS expected, CAST(0.0 AS DOUBLE) AS abs_gap
       |FROM tvd
       |ORDER BY digit""".stripMargin

  private def manifestSql: String = {
    val parts = manifestTables.flatMap { case (tbl, key, uniqLo) =>
      manifestChecks(key, uniqLo).map(chk =>
        s"SELECT '$tbl' AS table_name, * FROM (\n" +
          checkSql(tbl, chk, None) + "\n)")
    }
    unionAll(parts) + "\nORDER BY table_name, check_type, col_name"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_suite" -> ((s, dir) =>
      Quality.runChecks(t(s, dir, "lineitem"), lineitemChecks)),
    "quality_manifest" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      manifestTables.map { case (tbl, key, uniqLo) =>
        Quality.runChecks(t(s, dir, tbl), manifestChecks(key, uniqLo))
          .select(org.apache.spark.sql.functions.lit(tbl)
            .as("table_name"), col("*"))
      }.reduce(_ unionAll _)
        .orderBy("table_name", "check_type", "col_name")
    }),
    "quality_by_source" -> ((s, dir) =>
      Quality.runChecksByGroup(t(s, dir, "documents"), Seq("source"),
        documentChecks)),
    "quality_suggest" -> ((s, dir) =>
      Quality.suggest(t(s, dir, "lineitem"), suggestCols,
        SuggestLowCard)),
    "quality_benford" -> ((s, dir) =>
      Quality.benford(t(s, dir, "lineitem"), "l_extendedprice")))

  // bare table names: the harness registers each parquet as a view
  private val LI = "lineitem"
  private val DOCS = "documents"

  val oracle: Map[String, String] = Map(
    "quality_suite" -> suiteSql(LI, lineitemChecks, None),
    "quality_by_source" -> suiteSql(DOCS, documentChecks, Some("source")),
    "quality_suggest" -> suggestSql(LI),
    "quality_benford" -> benfordSql(LI, "l_extendedprice"),
    "quality_manifest" -> manifestSql)
}
