package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.det.Sig
import graft.ops.{Classifier, QualityRules}
import Shared.{enStops, stopOr, t}

/** Learned quality-filter queries (round 12): logistic regression
  * distilled from the Gopher rule gate ([[graft.ops.Classifier]]),
  * trained INSIDE the engine by full-batch GD with sig5-rounded
  * per-iteration weights. The DuckDB oracle replays the ENTIRE
  * training run — featurization, standardization moments, and every
  * gradient step as chained CTEs (the graph_pagerank / BPE-trainer
  * replay pattern) — so the declared rows pin the learning
  * trajectory itself, not just a final score. */
object ClassifierQueries {

  private def sig(x: String) = Sig.sql(x)

  /** ccnet-gate thresholds (the pipeline_ccnet operating point) —
    * 305/500 keep at sf0.01, so both classes are well-populated. */
  val Th: QualityRules.Thresholds =
    QualityRules.Thresholds(30L, 90L, 3.8, 5.0, 2L, 0.12)
  val Iters = 5

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the full GD trajectory: (iter, feature, weight) — the oracle
    // replays every iteration, so a wrong gradient ANYWHERE fails
    "text_lr_train" -> ((s, dir) =>
      Classifier.trajectoryFrame(t(s, dir, "documents"),
        "doc_id", "text", Th, Iters)),
    // per-doc scores under the trained model (map-only production
    // scorer): (doc_id, gate label, sig5 keep-probability)
    "text_lr_score" -> ((s, dir) =>
      Classifier.trainScored(t(s, dir, "documents"),
        "doc_id", "text", Th, Iters).orderBy("doc_id")),
    // exact rank-sum ROC AUC of the learned scores vs the gate
    // labels — "did the distillation actually learn the gate";
    // the rank window orders the sig5-BOUNDED grouped-prob frame
    "text_lr_auc" -> ((s, dir) =>
      Classifier.auc(Classifier.trainScored(t(s, dir, "documents"),
        "doc_id", "text", Th, Iters))),
    // reliability table: 10 fixed bins -> n, mean prob, keep rate
    "text_lr_calibration" -> ((s, dir) =>
      Classifier.calibration(
        Classifier.trainScored(t(s, dir, "documents"),
          "doc_id", "text", Th, Iters))),
    // confusion matrix at tau = 0.5 + precision/recall/F1 — the
    // operating-point numbers a gate owner reads next to the AUC
    "text_lr_confusion" -> ((s, dir) =>
      Classifier.confusion(Classifier.trainScored(
        t(s, dir, "documents"), "doc_id", "text", Th, Iters))),
    // where the linear model can't express the gate: top-20 docs by
    // |prob − label| — the feature-engineering worklist (a band rule
    // is non-monotone in ln_tokens, so big gaps are structural)
    "text_lr_disagreement" -> ((s, dir) =>
      Classifier.trainScored(t(s, dir, "documents"),
          "doc_id", "text", Th, Iters)
        .select(col("doc_id"), col("label"), col("prob"),
          abs(col("prob") - col("label").cast("double")).as("gap"))
        .orderBy(col("gap").desc, col("doc_id").asc)
        .limit(20)),
    // model-score drift between the reference feed (src0) and the
    // rest: PSI/TVD over the 10 calibration bins — "is the learned
    // filter seeing a different score distribution on new traffic"
    "drift_lr_score" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val feats = graft.ops.Materialize.materialize(
        Classifier.featurize(docs, "doc_id", "text", Th,
          carry = Seq("source")))
      val sc = Classifier.scored(feats,
        Classifier.train(feats, Iters), carry = Seq("source"))
      graft.ops.Drift.categoricalDrift(sc, "lr_score",
        least(floor(col("prob") * 10).cast("long"), lit(9L)),
        when(col("source") === "src0", 0).otherwise(1))
    }))

  /** Featurize → standardize → 5 GD iterations as chained CTEs.
    * Every float literal CAST to DOUBLE (the DECIMAL trap); moments
    * and per-iteration weights sig5-rounded exactly as the Spark
    * side rounds them, so each iteration starts from bitwise
    * identical inputs on both engines. `src` is any relation with
    * (doc_id, text); `pfx` namespaces every CTE so the chain embeds
    * into larger oracles (the corpus datasheet). */
  private[queries] def lrCoreCteOn(src: String, pfx: String): String = {
    def N(x: String) = pfx + x
    val f = stopOr("x", enStops)
    val d1 = "CAST(1.0 AS DOUBLE)"
    val moments = (1 to 5).map { j =>
      s"${sig(s"avg(x$j)")} AS m$j, ${sig(s"stddev_pop(x$j)")} AS r$j"
    }.mkString(",\n|  ")
    val guards = (1 to 5).map { j =>
      s"m$j, CASE WHEN r$j < 1e-9 THEN $d1 ELSE r$j END AS s$j"
    }.mkString(", ")
    val zcols = (1 to 5).map(j => s"(x$j - m$j) / s$j AS z$j")
      .mkString(", ")
    val w0 = (0 to 5).map(j => s"($j, CAST(0.0 AS DOUBLE))")
      .mkString(", ")
    def iter(k: Int): String =
      s"""${N(s"sc$k")} AS MATERIALIZED (SELECT f.doc_id, max(f.y) AS y,
         |  sum(w.w * f.v) AS s
         |  FROM ${N("fl")} f JOIN ${N(s"w${k - 1}")} w ON w.j = f.j
         |  GROUP BY f.doc_id),
         |${N(s"g$k")} AS (SELECT f.j,
         |  sum(($d1 / ($d1 + exp(-sc.s)) - sc.y) * f.v) AS g
         |  FROM ${N("fl")} f JOIN ${N(s"sc$k")} sc
         |    ON sc.doc_id = f.doc_id
         |  GROUP BY f.j),
         |${N(s"w$k")} AS MATERIALIZED (SELECT g.j, ${sig("w.w - g.g / nn.n")} AS w
         |  FROM ${N(s"w${k - 1}")} w JOIN ${N(s"g$k")} g
         |    ON g.j = w.j, ${N("nn")} nn)""".stripMargin
    s"""${N("d")} AS (SELECT doc_id, string_split(text, ' ') AS t
       |       FROM $src),
       |${N("e")} AS (SELECT doc_id, coalesce(len(t), 0) AS nt,
       |  list_sum(list_transform(t, x -> length(x))) AS sl,
       |  len(list_filter(t, x -> $f)) AS ns,
       |  len(list_distinct(t)) AS nd FROM ${N("d")}),
       |${N("tt")} AS (SELECT doc_id, max(c) AS top_c FROM (
       |  SELECT doc_id, count(*) AS c FROM (
       |    SELECT doc_id, unnest(t) AS w FROM ${N("d")})
       |  GROUP BY doc_id, w) GROUP BY doc_id),
       |${N("x")} AS MATERIALIZED (SELECT e.doc_id,
       |  CASE WHEN nt < 30 OR nt > 90
       |    OR CAST(sl AS DOUBLE) / nt < 3.8
       |    OR CAST(sl AS DOUBLE) / nt > 5.0
       |    OR ns < 2 OR CAST(top_c AS DOUBLE) / nt > 0.12
       |    THEN CAST(0.0 AS DOUBLE) ELSE $d1 END AS y,
       |  ln(nt) AS x1, CAST(sl AS DOUBLE) / nt AS x2,
       |  CAST(ns AS DOUBLE) / nt AS x3,
       |  CAST(nd AS DOUBLE) / nt AS x4,
       |  CAST(top_c AS DOUBLE) / nt AS x5
       |  FROM ${N("e")} e JOIN ${N("tt")} USING (doc_id)
       |  WHERE nt >= 1),
       |${N("st")} AS (SELECT $moments FROM ${N("x")}),
       |${N("stg")} AS (SELECT $guards FROM ${N("st")}),
       |${N("z")} AS (SELECT doc_id, y, $zcols FROM ${N("x")},
       |  ${N("stg")}),
       |${N("nn")} AS (SELECT CAST(count(*) AS DOUBLE) AS n
       |  FROM ${N("x")}),
       |${N("fl")} AS MATERIALIZED (SELECT doc_id, y, j, CASE j WHEN 0 THEN $d1
       |  WHEN 1 THEN z1 WHEN 2 THEN z2 WHEN 3 THEN z3
       |  WHEN 4 THEN z4 ELSE z5 END AS v
       |  FROM ${N("z")}, range(0, 6) t(j)),
       |${N("w0")}(j, w) AS (VALUES $w0),
       |${iter(1)},
       |${iter(2)},
       |${iter(3)},
       |${iter(4)},
       |${iter(5)}""".stripMargin
  }

  /** Final-model per-doc scores (the sc-iteration shape against the
    * trained w5), shared by the score / auc / calibration oracles
    * and embeddable under a prefix (the datasheet model section). */
  private[queries] def scoredCteOn(src: String, pfx: String): String = {
    def N(x: String) = pfx + x
    val d1 = "CAST(1.0 AS DOUBLE)"
    s"""${lrCoreCteOn(src, pfx)},
       |${N("scf")} AS (SELECT f.doc_id, max(f.y) AS y,
       |  sum(w.w * f.v) AS s
       |  FROM ${N("fl")} f JOIN ${N("w5")} w ON w.j = f.j
       |  GROUP BY f.doc_id),
       |${N("p")} AS MATERIALIZED (SELECT doc_id, CAST(y AS BIGINT) AS yy,
       |  ${sig(s"$d1 / ($d1 + exp(-s))")} AS prob
       |  FROM ${N("scf")})""".stripMargin
  }

  private val scoredCte: String = scoredCteOn("documents", "")

  val textLrTrainSql: String = {
    val names = Classifier.FeatureNames.zipWithIndex
      .map { case (n, j) => s"($j, '$n')" }.mkString(", ")
    val union = (1 to Iters)
      .map(k => s"SELECT $k AS it, j, w FROM w$k")
      .mkString("\n|  UNION ALL ")
    s"""WITH ${lrCoreCteOn("documents", "")},
       |names(j, feature) AS (VALUES $names),
       |tr AS ($union)
       |SELECT CAST(it AS BIGINT) AS iter, feature, w AS weight
       |FROM tr JOIN names USING (j) ORDER BY iter, feature""".stripMargin
  }

  val textLrScoreSql: String =
    s"""WITH $scoredCte
       |SELECT doc_id, yy AS label, prob FROM p ORDER BY doc_id""".stripMargin

  val textLrAucSql: String = {
    val d2 = "CAST(2.0 AS DOUBLE)"
    s"""WITH $scoredCte,
       |grp AS (SELECT prob, count(*) AS c, sum(yy) AS pos
       |        FROM p GROUP BY prob),
       |cum AS (SELECT prob, c, pos, coalesce(sum(c) OVER (
       |  ORDER BY prob ROWS BETWEEN UNBOUNDED PRECEDING
       |  AND 1 PRECEDING), 0) AS lt FROM grp),
       |ag AS (SELECT
       |  sum(CAST(pos AS DOUBLE) * (lt + (c + 1) / $d2)) AS s,
       |  sum(pos) AS np, sum(c) AS n FROM cum)
       |SELECT CAST(np AS BIGINT) AS n_pos,
       |CAST(n - np AS BIGINT) AS n_neg,
       |CASE WHEN np = 0 OR np = n THEN CAST(NULL AS DOUBLE)
       |  ELSE ${sig(s"(s - CAST(np AS DOUBLE) * (CAST(np AS DOUBLE) + 1) / $d2) / (CAST(np AS DOUBLE) * CAST(n - np AS DOUBLE))")}
       |END AS auc
       |FROM ag""".stripMargin
  }

  val textLrCalibrationSql: String =
    s"""WITH $scoredCte
       |SELECT CAST(least(CAST(floor(prob * 10) AS BIGINT), 9)
       |  AS BIGINT) AS bin,
       |CAST(count(*) AS BIGINT) AS n_docs,
       |${sig("avg(prob)")} AS avg_prob,
       |${sig("CAST(sum(yy) AS DOUBLE) / count(*)")} AS keep_rate
       |FROM p GROUP BY 1 ORDER BY bin""".stripMargin

  val textLrConfusionSql: String = {
    val d2 = "CAST(2.0 AS DOUBLE)"
    s"""WITH $scoredCte,
       |cm AS (SELECT
       |  sum(CASE WHEN yy = 1 AND prob >= 0.5 THEN 1 ELSE 0 END)
       |    AS tp,
       |  sum(CASE WHEN yy = 0 AND prob >= 0.5 THEN 1 ELSE 0 END)
       |    AS fp,
       |  sum(CASE WHEN yy = 0 AND prob < 0.5 THEN 1 ELSE 0 END)
       |    AS tn,
       |  sum(CASE WHEN yy = 1 AND prob < 0.5 THEN 1 ELSE 0 END)
       |    AS fn FROM p)
       |SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       |CAST(tn AS BIGINT) AS tn, CAST(fn AS BIGINT) AS fn,
       |CASE WHEN tp + fp > 0
       |  THEN ${sig("CAST(tp AS DOUBLE) / (tp + fp)")}
       |  ELSE CAST(NULL AS DOUBLE) END AS precision,
       |CASE WHEN tp + fn > 0
       |  THEN ${sig("CAST(tp AS DOUBLE) / (tp + fn)")}
       |  ELSE CAST(NULL AS DOUBLE) END AS recall,
       |CASE WHEN 2 * tp + fp + fn > 0
       |  THEN ${sig(s"$d2 * tp / (2 * tp + fp + fn)")}
       |  ELSE CAST(NULL AS DOUBLE) END AS f1
       |FROM cm""".stripMargin
  }

  val textLrDisagreementSql: String =
    s"""WITH $scoredCte
       |SELECT doc_id, yy AS label, prob, gap FROM (
       |  SELECT doc_id, yy, prob,
       |    abs(prob - CAST(yy AS DOUBLE)) AS gap,
       |    row_number() OVER (
       |      ORDER BY abs(prob - CAST(yy AS DOUBLE)) DESC,
       |      doc_id ASC) AS rn
       |  FROM p)
       |WHERE rn <= 20 ORDER BY gap DESC, doc_id ASC""".stripMargin

  /** The drift family's smoothed-share PSI/TVD shape over the
    * classifier's 10 calibration bins, source re-attached by doc_id
    * (the scored frame is keyed, so the join is value-identical to
    * the Spark side's carry column). */
  val driftLrScoreSql: String =
    s"""WITH $scoredCte,
       |ps AS (SELECT p.doc_id, prob,
       |  CASE WHEN d.source = 'src0' THEN 0 ELSE 1 END AS sl
       |  FROM p JOIN documents d USING (doc_id)),
       |c AS (SELECT least(CAST(floor(prob * 10) AS BIGINT), 9) AS b,
       |  sum(CASE WHEN sl = 0 THEN 1 ELSE 0 END) AS ca,
       |  sum(CASE WHEN sl = 1 THEN 1 ELSE 0 END) AS cb
       |  FROM ps GROUP BY 1),
       |dtot AS (SELECT CAST(sum(ca) AS DOUBLE) AS na,
       |  CAST(sum(cb) AS DOUBLE) AS nb,
       |  CAST(count(*) AS DOUBLE) AS k FROM c)
       |SELECT 'lr_score' AS dim, CAST(min(na) AS BIGINT) AS n_a,
       |CAST(min(nb) AS BIGINT) AS n_b,
       |CAST(min(k) AS BIGINT) AS n_buckets,
       |${sig("sum((sp - sq) * ln(sp / sq))")} AS psi,
       |${sig("sum(abs(sp - sq)) / 2.0")} AS tvd
       |FROM (SELECT (ca + 0.5) / (na + 0.5 * k) AS sp,
       |        (cb + 0.5) / (nb + 0.5 * k) AS sq, na, nb, k
       |      FROM c, dtot)
       |HAVING count(*) > 0""".stripMargin

  val oracle: Map[String, String] = Map(
    "text_lr_train" -> textLrTrainSql,
    "text_lr_score" -> textLrScoreSql,
    "text_lr_auc" -> textLrAucSql,
    "text_lr_calibration" -> textLrCalibrationSql,
    "text_lr_disagreement" -> textLrDisagreementSql,
    "text_lr_confusion" -> textLrConfusionSql,
    "drift_lr_score" -> driftLrScoreSql)
}
