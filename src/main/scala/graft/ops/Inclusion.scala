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
}
