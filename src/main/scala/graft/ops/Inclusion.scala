package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.det.Sig.sig5

/** Cross-table inclusion-dependency (foreign-key) discovery — the
  * multi-table profiling pass single-table profilers (the reference
  * included) lack: for a candidate (child.col → parent.col) pair,
  * the inclusion coefficient |distinct(child) ∩ distinct(parent)| /
  * |distinct(child)| and the is_fk verdict (coefficient = 1, i.e.
  * every child value resolves in the parent).
  *
  * Scale shape: per pair, each side reduces to its DISTINCT key set
  * with map-side combine (shuffle volume = distinct keys, not rows),
  * then one equi-join between the two distinct sets — never a
  * row-level join. At 100 TB the exact distinct sets themselves are
  * the cost; the documented switch is the [[graft.functions.BottomK]]
  * containment estimate (two O(k) sketches; |A∩B|/|A| estimated from
  * the bottom-k union — the same mergeable-sketch contract as
  * `col_distinct_mergeable`), with the exact path remaining the
  * verification config. Nulls are excluded on both sides (SQL FK
  * semantics: NULL child keys do not violate referential
  * integrity). */
object Inclusion {

  /** One (pair, n_child_distinct, n_shared, inclusion, is_fk) row
    * per candidate, in the given order. Each element:
    * (label, childDf, childCol, parentDf, parentCol). */
  def inclusionStats(
      candidates: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(candidates.nonEmpty, "no candidate pairs")
    candidates.map { case (label, child, cCol, parent, pCol) =>
      // native-typed keys (Catalyst coerces the join sides to a common
      // type): a hard cast("long") here sent non-numeric keys — e.g.
      // string codes — to NULL AFTER the null filter, so they counted
      // into n_child_distinct but could never match the semi-join,
      // silently reporting inclusion < 1 for a perfectly valid FK
      val c = child.where(col(cCol).isNotNull)
        .select(col(cCol).as("k")).distinct()
      val p = parent.where(col(pCol).isNotNull)
        .select(col(pCol).as("k")).distinct()
      c.join(p, Seq("k"), "left_semi")
        .agg(count(lit(1)).as("n_shared"))
        .crossJoin(c.agg(count(lit(1)).as("n_child_distinct")))
        .select(lit(label).as("pair"),
          col("n_child_distinct"), col("n_shared"),
          sig5(when(col("n_child_distinct") > 0,
            col("n_shared").cast("double") /
              col("n_child_distinct"))).as("inclusion"),
          when(col("n_shared") === col("n_child_distinct"), 1L)
            .otherwise(0L).as("is_fk"))
    }.reduce(_.unionByName(_)).orderBy("pair")
  }

  /** The 100 TB inclusion path as a first-class error contract: the
    * bottom-k containment ESTIMATE next to the exact coefficient,
    * with the |estimate − exact| ≤ `bound` verdict as a column.
    *
    * Estimator (KMV containment, the mergeable-sketch family of
    * Beyer et al., "On synopses for distinct-value estimation under
    * multiset operations", SIGMOD 2007): SA/SB are each side's k
    * smallest distinct key hashes; M = the k smallest of SA ∪ SB is
    * a uniform size-k sample of distinct(A) ∪ distinct(B), so
    * |A∩B| / |A| ≈ |{h∈M: h∈SA∩SB}| / |{h∈M: h∈SA}| — binomial
    * error ~1/√k.
    *
    * Scale shape — the point of the sketch: each side is ONE O(k)
    * mergeable [[graft.functions.BottomK]] aggregation over a
    * map-only hash projection; shuffle volume is k·partitions,
    * independent of both row count AND key cardinality (the exact
    * path shuffles every distinct key). The exact columns computed
    * alongside are the verification premise of THIS query — the
    * production call runs the sketch alone.
    *
    * Determinism: keys are hashed with the pure-arithmetic
    * [[Sampling.minstdHash]] (injective at fixture scales), which
    * any SQL engine re-derives exactly — so the oracle recomputes
    * the SAME sketches, the SAME estimate, and the same verdict:
    * the contract is value-checked, not declared true. Keys must be
    * integral for the cross-engine hash (the exact path handles any
    * type); nulls excluded as in [[inclusionStats]]. */
  /** The estimate-ONLY production form of [[inclusionSketchStats]]:
    * two O(k) mergeable BottomK sketches per pair and the KMV
    * containment estimate — NO exact distinct-set join anywhere, so
    * per-pair cost is one map-side-combined sketch aggregation per
    * side (shuffle O(k), independent of key cardinality). This is
    * the operator a 100 TB FK-discovery sweep actually runs; the
    * error-contract twin exists to certify its bound on fixtures. */
  def inclusionSketchEstimate(
      candidates: Seq[(String, DataFrame, String, DataFrame, String)],
      k: Int = 1024): DataFrame = {
    import graft.functions.BottomKSketch.bottom_k
    require(candidates.nonEmpty, "no candidate pairs")
    candidates.map { case (label, child, cCol, parent, pCol) =>
      def sketch(df: DataFrame, c: String, as: String) =
        df.where(col(c).isNotNull)
          .select(Sampling.minstdHash(col(c).cast("long")).as("h"))
          .agg(bottom_k(k)(col("h")).as(as))
      val m = slice(array_sort(array_union(col("sa"), col("sb"))),
        1, k)
      sketch(child, cCol, "sa")
        .crossJoin(sketch(parent, pCol, "sb"))
        .select(
          size(array_intersect(m, col("sa"))).cast("long")
            .as("child_in"),
          size(array_intersect(array_intersect(m, col("sa")),
            col("sb"))).cast("long").as("shared_in"))
        .select(lit(label).as("pair"),
          sig5(when(col("child_in") > 0,
            col("shared_in").cast("double") / col("child_in")))
            .as("inclusion_est"))
    }.reduce(_.unionByName(_)).orderBy("pair")
  }

  def inclusionSketchStats(
      candidates: Seq[(String, DataFrame, String, DataFrame, String)],
      k: Int = 1024, bound: Double = 0.05): DataFrame = {
    import graft.functions.BottomKSketch.bottom_k
    require(candidates.nonEmpty, "no candidate pairs")
    candidates.map { case (label, child, cCol, parent, pCol) =>
      def sketch(df: DataFrame, c: String, as: String) =
        df.where(col(c).isNotNull)
          .select(Sampling.minstdHash(col(c).cast("long")).as("h"))
          .agg(bottom_k(k)(col("h")).as(as))
      val cDist = child.where(col(cCol).isNotNull)
        .select(col(cCol).as("k")).distinct()
      val pDist = parent.where(col(pCol).isNotNull)
        .select(col(pCol).as("k")).distinct()
      val exact = cDist.join(pDist, Seq("k"), "left_semi")
        .agg(count(lit(1)).as("n_shared"))
        .crossJoin(cDist.agg(count(lit(1)).as("n_child_distinct")))
      val m = slice(array_sort(array_union(col("sa"), col("sb"))),
        1, k)
      val est = sketch(child, cCol, "sa")
        .crossJoin(sketch(parent, pCol, "sb"))
        .select(
          size(array_intersect(m, col("sa"))).cast("long")
            .as("child_in"),
          size(array_intersect(array_intersect(m, col("sa")),
            col("sb"))).cast("long").as("shared_in"))
      exact.crossJoin(est)
        .select(lit(label).as("pair"), col("n_child_distinct"),
          sig5(when(col("n_child_distinct") > 0,
            col("n_shared").cast("double") /
              col("n_child_distinct"))).as("inclusion"),
          sig5(when(col("child_in") > 0,
            col("shared_in").cast("double") / col("child_in")))
            .as("inclusion_est"))
        // the discrete verdict compares ROUNDED operands (engine
        // contract): both engines computed identical integer counts,
        // so the sig5'd ratios — and the verdict — are identical
        .withColumn("abs_err",
          sig5(abs(col("inclusion") - col("inclusion_est"))))
        .withColumn("within_bound",
          when(col("abs_err") <= bound, 1L).otherwise(0L))
    }.reduce(_.unionByName(_)).orderBy("pair")
  }
}
