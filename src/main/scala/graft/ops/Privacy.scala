package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.det.Sig

/** Release-time privacy audit over tabular data: k-anonymity,
  * l-diversity and a suppression-risk curve over quasi-identifier
  * (QI) groups — the checks a dataset has to pass before rows that
  * describe people can ship with a corpus release (Sweeney 2002
  * k-anonymity; Machanavajjhala 2007 l-diversity). The reference
  * profiler surfaces uniqueness per single column; these operators
  * answer the stronger multi-column question "how identifiable is a
  * row given everything quasi-public at once".
  *
  * Scale shape (100 TB): every operator is one hash aggregation on
  * the QI key — partial (map-side) combine, then a reduce keyed by
  * the QI tuple; l-diversity pre-distincts on (QI, sensitive) so no
  * count-distinct Expand ever runs. Outputs are O(#groups), never
  * O(rows). Skewed QI groups are a non-issue: a HOT group is by
  * definition a LOW-risk group, and partial aggregation collapses it
  * map-side before the shuffle.
  */
object Privacy {

  /** Per-QI-group k-anonymity audit: group size `n`, prosecutor
    * re-identification risk `risk` = 1/n (the probability of singling
    * a row out knowing only the QI values), and the `at_risk` flag
    * (n < k). One shuffle on the QI tuple; groups ordered by QI for
    * determinism. */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .select(qiCols.map(col) ++ Seq(
        col("n"),
        Sig.sig5(lit(1.0) / col("n")).as("risk"),
        (col("n") < k).as("at_risk")): _*)
      .orderBy(qiCols.map(col): _*)

  /** Per-QI-group l-diversity audit: `l_distinct` well-represented
    * sensitive values per group and the `at_risk` flag (l < l
    * required). Pre-aggregates on (QI, sensitive) first — the
    * distinct count becomes a plain `count(1)` over an already-
    * distinct frame, so the plan is two ordinary hash aggregations
    * (both with partial combine) instead of a count-distinct Expand
    * over the raw rows. `sensitive` may be any expression (e.g. a
    * coarsened bucket of the raw value). */
  def lDiversity(df: DataFrame, qiCols: Seq[String],
      sensitive: Column, l: Long): DataFrame = {
    val pairs = df.select(qiCols.map(col) :+ sensitive.as("__sens"): _*)
      .groupBy(qiCols.map(col) :+ col("__sens"): _*)
      .agg(count(lit(1)).as("__cnt")) // also the group size, reused below
    pairs.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("l_distinct"),
        sum(col("__cnt")).as("n"))
      .select(qiCols.map(col) ++ Seq(
        col("n"), col("l_distinct"),
        (col("l_distinct") < l).as("at_risk")): _*)
      .orderBy(qiCols.map(col): _*)
  }

  /** The actionable half of [[kAnonymity]]: the k-anonymized release
    * itself — rows whose QI group has ≥ k members (suppression; the
    * generalization path is the caller coarsening a QI column first,
    * e.g. bucketing age, and re-running). One aggregation on the QI
    * tuple broadcast/shuffle-joined back — row order and all other
    * columns preserved. */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Long)
      : DataFrame = {
    val safe = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .where(col("__n") >= k)
      .drop("__n")
    df.join(safe, qiCols, "left_semi")
  }

  /** Suppression-risk curve: for each candidate k, how many QI
    * groups and how many ROWS sit below it — i.e. what a k-anonymous
    * release would have to suppress (or generalize away) at that k.
    * One aggregation pass builds the group sizes; the k-sweep is a
    * constant-size explode over the already-tiny group frame, so the
    * whole curve costs the same single shuffle as one k. */
  def riskCurve(df: DataFrame, qiCols: Seq[String],
      ks: Seq[Long]): DataFrame = {
    val sizes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val total = sizes.agg(sum("n").as("__total"),
      count(lit(1)).as("__groups"))
    sizes
      .select(col("n"), explode(
        typedLit(ks.sorted)).as("k"))
      .groupBy("k")
      .agg(sum(when(col("n") < col("k"), lit(1L)).otherwise(0L))
            .as("groups_at_risk"),
        sum(when(col("n") < col("k"), col("n")).otherwise(0L))
            .as("rows_at_risk"))
      .crossJoin(broadcast(total))
      .select(col("k"), col("groups_at_risk"), col("rows_at_risk"),
        Sig.sig5(col("rows_at_risk").cast("double") / col("__total"))
          .as("share_at_risk"))
      .orderBy("k")
  }
}
