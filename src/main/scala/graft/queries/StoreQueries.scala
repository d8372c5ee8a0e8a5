package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.det.Sig
import graft.profiler.ProfileStore

/** Declared incremental-profile queries: the sig5-canonical
  * partition-merge form of the profile store
  * ([[graft.profiler.ProfileStore]]), with the DuckDB oracle
  * replaying per-part statistics AND the Pébay/Chan merge arithmetic
  * as CTEs — the merge algebra itself is value-checked, not just the
  * final numbers. The sketch-state lifecycle (persisted
  * MultiSketchBuf bytes) is the scale path, unit-tested for
  * merge ≡ rescan; this query pins the part→merge contract
  * relationally.
  */
object StoreQueries {

  private def sig(x: String) = Sig.sql(x)
  private val T = "lineitem"
  // the float columns: the merge formulas' interesting case (the int
  // columns exercise nothing the floats don't)
  private val cols = Core.floats
  // a deterministic, data-derived 2-way split — the "two ingest days"
  private val splitA = "l_orderkey % 2 = 0"
  private val splitB = "l_orderkey % 2 = 1"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "profile_incremental" -> ((s, dir) => {
      val li = Core.li(s, dir)
      ProfileStore.incrementalMoments(
        Seq("a" -> li.where(expr(splitA)),
          "b" -> li.where(expr(splitB))), cols)
    }),
    // the correlation twin: per-part co-moment canon merged with the
    // multi-way pairwise formula (the v3 store's merge algebra) —
    // oracle replays parts AND merge arithmetic
    "profile_incremental_corr" -> ((s, dir) => {
      val li = Core.li(s, dir)
      ProfileStore.incrementalCorr(
        Seq("a" -> li.where(expr(splitA)),
          "b" -> li.where(expr(splitB))), cols)
    }),
    // robust metric-history anomaly: four "ingest days" (orderkey-mod
    // splits), one deliberately corrupted (day d only received the
    // high-quantity rows) — median/MAD z-scores must flag it
    "store_metric_anomaly" -> ((s, dir) => {
      val li = Core.li(s, dir)
      ProfileStore.metricAnomaly(
        anomSplits.map { case (p, pred) => p -> li.where(expr(pred)) },
        cols)
    }),
    // completeness anomaly: which ingest day's extractor started
    // dropping fields — nulls synthesized per day, day d at 5× rate
    "store_null_anomaly" -> ((s, dir) => {
      val li = Core.li(s, dir)
      val parts = nullSplits.map { case (p, nullPred) =>
        p -> li.where(expr(anomMod(p)))
          .select(li.columns.toSeq.map { c =>
            (if (cols.contains(c))
              when(expr(nullPred), lit(null)).otherwise(col(c))
            else col(c)).as(c)
          }: _*)
      }
      ProfileStore.metricAnomaly(parts, cols, metric = "null_frac")
    }))

  // the "bad ingest day": split d is biased to l_quantity > 40, so
  // every quantity-correlated metric drifts — data-derived,
  // deterministic, independently re-derivable in SQL
  private val anomSplits = Seq(
    "a" -> "l_orderkey % 4 = 0",
    "b" -> "l_orderkey % 4 = 1",
    "c" -> "l_orderkey % 4 = 2",
    "d" -> "l_orderkey % 4 = 3 AND l_quantity > 40")

  /** The plain day split (completeness variant needs unbiased rows —
    * the anomaly is synthesized in the NULL pattern, not the rows). */
  private def anomMod(p: String): String = p match {
    case "a" => "l_orderkey % 4 = 0"
    case "b" => "l_orderkey % 4 = 1"
    case "c" => "l_orderkey % 4 = 2"
    case _ => "l_orderkey % 4 = 3"
  }

  // every day's extractor drops ~2% of the field (l_partkey % 50);
  // broken day d drops ~10% (l_partkey % 10) — deterministic,
  // key-derived, independently re-derivable (the null_association
  // synthesis precedent; lineitem itself has no NULLs)
  private val nullSplits = Seq(
    "a" -> "l_partkey % 50 = 0",
    "b" -> "l_partkey % 50 = 0",
    "c" -> "l_partkey % 50 = 0",
    "d" -> "l_partkey % 10 = 0")

  private val profileIncrementalSql: String = {
    val ctes = cols.flatMap { c =>
      Seq("a" -> splitA, "b" -> splitB).flatMap { case (p, pred) =>
        Seq(
          s"""src_${p}_$c AS (SELECT CAST($c AS DOUBLE) AS x FROM $T
             |WHERE ($pred) AND $c IS NOT NULL)""".stripMargin,
          s"""agg_${p}_$c AS (SELECT count(*) AS n, avg(x) AS mu,
             |min(x) AS mn, max(x) AS mx, sum(x) AS sm
             |FROM src_${p}_$c)""".stripMargin,
          s"""cs_${p}_$c AS (SELECT
             |sum(pow(x - (SELECT mu FROM agg_${p}_$c), 2)) AS s2r
             |FROM src_${p}_$c)""".stripMargin,
          // per-part canon: sig5-rounded mean/sum/central-sum — the
          // handoff both engines reproduce bit-exactly; min/max/count
          // are exact and stay raw
          s"""canon_${p}_$c AS (SELECT n, ${sig("mu")} AS ma,
             |mn, mx, ${sig("sm")} AS sa, ${sig("s2r")} AS s2
             |FROM agg_${p}_$c, cs_${p}_$c)""".stripMargin)
      } :+
        // the merge: exact IEEE arithmetic over the rounded canon,
        // parenthesized EXACTLY as the Scala fold computes it
        s"""mrg_$c AS (SELECT a.n AS na, b.n AS nb,
           |a.ma AS ma, b.ma AS mb, a.mn AS mna, b.mn AS mnb,
           |a.mx AS mxa, b.mx AS mxb, a.sa AS sa, b.sa AS sb,
           |a.s2 AS s2a, b.s2 AS s2b,
           |(a.n * a.ma + b.n * b.ma) / (a.n + b.n) AS mu
           |FROM canon_a_$c a, canon_b_$c b)""".stripMargin
    }
    val selects = cols.map { c =>
      s"""SELECT '$c' AS col_name, na + nb AS n,
         |${sig("mu")} AS mean,
         |LEAST(mna, mnb) AS min_val, GREATEST(mxa, mxb) AS max_val,
         |${sig("(sa + sb)")} AS sum_val,
         |${sig("((s2a + s2b) + (na * ((ma - mu) * (ma - mu)) + nb * ((mb - mu) * (mb - mu)))) / (na + nb - 1)")} AS variance,
         |na AS n_a, nb AS n_b
         |FROM mrg_$c""".stripMargin
    }
    s"WITH ${ctes.mkString(",\n")}\n" +
      selects.mkString("", "\nUNION ALL\n", "") + "\nORDER BY col_name"
  }

  private val profileIncrementalCorrSql: String = {
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val colSel = cols.map(c => s"CAST($c AS DOUBLE) AS $c")
      .mkString(", ")
    val notNull = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")
    val partCtes = Seq("a" -> splitA, "b" -> splitB).flatMap {
      case (p, pred) =>
        val mus = cols.map(c => s"avg($c) AS mu_$c").mkString(", ")
        val sub = (c: String) => s"(SELECT mu_$c FROM agg_$p)"
        val cxx = cols.map(c =>
          s"sum(($c - ${sub(c)}) * ($c - ${sub(c)})) AS cxx_$c")
        val cxy = pairs.zipWithIndex.map { case ((x, y), i) =>
          s"sum(($x - ${sub(x)}) * ($y - ${sub(y)})) AS cxy_$i" }
        val canonFields =
          (Seq("n") ++
            cols.map(c => s"${sig(s"mu_$c")} AS m_$c") ++
            cols.map(c => s"${sig(s"cxx_$c")} AS x_$c") ++
            pairs.indices.map(i => s"${sig(s"cxy_$i")} AS p_$i"))
            .mkString(",\n")
        Seq(
          s"src_$p AS (SELECT $colSel FROM $T WHERE ($pred) AND $notNull)",
          s"agg_$p AS (SELECT count(*) AS n, $mus FROM src_$p)",
          s"cs_$p AS (SELECT ${(cxx ++ cxy).mkString(",\n")} FROM src_$p)",
          s"canon_$p AS (SELECT $canonFields FROM agg_$p, cs_$p)")
    }
    val pairCtes = pairs.zipWithIndex.map { case ((x, y), i) =>
      s"""m_$i AS (SELECT a.n AS na, b.n AS nb,
         |a.m_$x AS mxa, b.m_$x AS mxb, a.m_$y AS mya, b.m_$y AS myb,
         |a.x_$x AS cxxa, b.x_$x AS cxxb,
         |a.x_$y AS cyya, b.x_$y AS cyyb,
         |a.p_$i AS cxya, b.p_$i AS cxyb,
         |(a.n * a.m_$x + b.n * b.m_$x) / (a.n + b.n) AS mx,
         |(a.n * a.m_$y + b.n * b.m_$y) / (a.n + b.n) AS my
         |FROM canon_a a, canon_b b)""".stripMargin
    }
    // merge arithmetic parenthesized EXACTLY as the Scala fold:
    // (xa + xb) + ((dxa*dya)*na + (dxb*dyb)*nb)
    val selects = pairs.zipWithIndex.map { case ((x, y), i) =>
      val cxy = "(cxya + cxyb) + (((mxa - mx) * (mya - my)) * na" +
        " + ((mxb - mx) * (myb - my)) * nb)"
      val cxx = "(cxxa + cxxb) + (((mxa - mx) * (mxa - mx)) * na" +
        " + ((mxb - mx) * (mxb - mx)) * nb)"
      val cyy = "(cyya + cyyb) + (((mya - my) * (mya - my)) * na" +
        " + ((myb - my) * (myb - my)) * nb)"
      s"""SELECT '$x' AS col_a, '$y' AS col_b,
         |${sig(s"($cxy) / (sqrt($cxx) * sqrt($cyy))")} AS rho,
         |na + nb AS n FROM m_$i""".stripMargin
    }
    s"WITH ${(partCtes ++ pairCtes).mkString(",\n")}\n" +
      selects.mkString("", "\nUNION ALL\n", "") +
      "\nORDER BY col_a, col_b"
  }

  /** Mirror of [[graft.profiler.ProfileStore.metricAnomaly]]: per-part
    * sig5 mean canon, median()/MAD over the canon (DuckDB's median IS
    * quantile_cont(0.5) — the interpolation formula the Scala side
    * writes out), z from the ROUNDED med/mad, flag from the same raw
    * comparison. */
  private val storeMetricAnomalySql: String =
    robustZSql(for { c <- cols; (p, pred) <- anomSplits } yield
      s"""SELECT '$p' AS part, '$c' AS col_name,
         |${sig(s"avg(CAST($c AS DOUBLE))")} AS m
         |FROM $T WHERE ($pred)""".stripMargin)

  /** The shared robust-z CTE tail: median()/MAD over whatever
    * per-(part, col) metric canon the `pm` branches compute. */
  private def robustZSql(pm: Seq[String]): String =
    s"""WITH pm AS (
       |${pm.mkString("\nUNION ALL\n")}),
       |st AS (SELECT col_name, ${sig("median(m)")} AS med
       |  FROM pm GROUP BY col_name),
       |md AS (SELECT pm.col_name, ${sig("median(abs(m - med))")} AS mad
       |  FROM pm JOIN st ON st.col_name = pm.col_name
       |  GROUP BY pm.col_name)
       |SELECT part, pm.col_name AS col_name, m AS metric_mean, med, mad,
       |CASE WHEN mad = 0 THEN NULL
       |  ELSE ${sig("(m - med) / (1.4826 * mad)")} END AS z,
       |CAST(CASE WHEN mad <> 0
       |    AND abs((m - med) / (1.4826 * mad)) > 3.0
       |  THEN 1 ELSE 0 END AS BIGINT) AS anomalous
       |FROM pm JOIN st ON st.col_name = pm.col_name
       |JOIN md ON md.col_name = pm.col_name
       |ORDER BY col_name, part""".stripMargin

  /** Completeness-anomaly mirror: the synthesized per-part null
    * conditions replayed as CASE-averages (the base corpus has no
    * NULLs; the text_pii / null_association synthesis precedent). */
  private val storeNullAnomalySql: String =
    robustZSql(for { c <- cols; (p, nullPred) <- nullSplits } yield
      s"""SELECT '$p' AS part, '$c' AS col_name,
         |${sig(s"avg(CASE WHEN ($nullPred) THEN 1.0 ELSE 0.0 END)")}
         |  AS m
         |FROM $T WHERE (${anomMod(p)})""".stripMargin)

  val oracle: Map[String, String] = Map(
    "profile_incremental" -> profileIncrementalSql,
    "profile_incremental_corr" -> profileIncrementalCorrSql,
    "store_metric_anomaly" -> storeMetricAnomalySql,
    "store_null_anomaly" -> storeNullAnomalySql)
}
