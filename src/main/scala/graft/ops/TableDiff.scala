package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed diff between two versions of a table — the release-audit
  * question "what changed between yesterday's corpus and today's":
  * per row status added / removed / changed / same by key, and the
  * summary counts a release note needs. One full-outer shuffle join
  * on the key (both sides pre-projected to key + compared columns,
  * so the shuffle carries only what the diff reads); comparison is
  * null-safe (`<=>`) per column. Output is O(#statuses), the detail
  * form O(changed rows). */
object TableDiff {

  private def statusCol(keyCols: Seq[String], valCols: Seq[String]) = {
    val oldKey = col(s"o_${keyCols.head}")
    val newKey = col(s"n_${keyCols.head}")
    val allSame = valCols.map(c => col(s"o_$c") <=> col(s"n_$c"))
      .reduce(_ && _)
    when(oldKey.isNull, "added")
      .when(newKey.isNull, "removed")
      .when(allSame, "same")
      .otherwise("changed")
  }

  private def joined(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], valCols: Seq[String]): DataFrame = {
    val cols = keyCols ++ valCols
    val o = oldDf.select(cols.map(c => col(c).as(s"o_$c")): _*)
    val n = newDf.select(cols.map(c => col(c).as(s"n_$c")): _*)
    val cond = keyCols.map(c => col(s"o_$c") === col(s"n_$c"))
      .reduce(_ && _)
    o.join(n, cond, "full_outer")
  }

  /** Summary counts per status (added/removed/changed/same). */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], valCols: Seq[String]): DataFrame =
    joined(oldDf, newDf, keyCols, valCols)
      .select(statusCol(keyCols, valCols).as("status"))
      .groupBy("status").agg(count(lit(1)).as("n"))
      .orderBy("status")

  /** Detail rows for the non-`same` statuses, keyed by whichever
    * side has the key. */
  def diffRows(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], valCols: Seq[String]): DataFrame = {
    val st = statusCol(keyCols, valCols)
    joined(oldDf, newDf, keyCols, valCols)
      .withColumn("status", st)
      .where(col("status") =!= "same")
      .select(keyCols.map(c =>
        coalesce(col(s"o_$c"), col(s"n_$c")).as(c)) :+
        col("status"): _*)
      .orderBy(keyCols.map(col) :+ col("status"): _*)
  }
}
