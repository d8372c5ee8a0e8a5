package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.det.Sig.sig5

/** Star-schema analytic joins over the TPC-H-ish tables — the join
  * coverage the single-table reference lacks (SURVEY.md §2.2).
  *
  * Scale design: dimension tables (nation, region) are broadcast —
  * no shuffle of the fact side for those hops; the fact⋈fact hops
  * (lineitem⋈orders, orders⋈customer) shuffle on their join keys and
  * AQE handles skew/coalescing. At 100 TB the win is bucketing
  * lineitem/orders on orderkey at write time, which turns the big
  * hop into a shuffle-free sort-merge join — noted here because the
  * test harness reads unbucketed parquet. */
object StarJoins {

  def load(s: SparkSession, dir: String, t: String): DataFrame =
    s.read.parquet(s"$dir/$t.parquet")

  /** Revenue by nation: lineitem ⋈ orders ⋈ customer ⋈ nation(bcast). */
  def revenueByNation(s: SparkSession, dir: String): DataFrame = {
    val li = load(s, dir, "lineitem")
    val o = load(s, dir, "orders")
    val c = load(s, dir, "customer")
    val n = load(s, dir, "nation")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_lineitems"),
        sig5(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue"))
      .orderBy("n_name")
  }

  /** Set-operation coverage (absent in the reference — SURVEY §2.2):
    * customers with orders in BOTH order-status classes (INTERSECT),
    * in 'O' only (EXCEPT), and the distinct union count. Set ops
    * compile to aggregate/anti-join plans Catalyst optimizes like any
    * other — one row of counts keeps the oracle compact. */
  def customerSetOps(s: SparkSession, dir: String): DataFrame = {
    val o = load(s, dir, "orders")
    val open = o.where(col("o_orderstatus") === "O")
      .select(col("o_custkey"))
    val closed = o.where(col("o_orderstatus") === "F")
      .select(col("o_custkey"))
    val both = open.intersect(closed)
    val openOnly = open.except(closed)
    val all = open.union(closed).distinct()
    both.agg(count(lit(1)).as("n_both")).crossJoin(
      openOnly.agg(count(lit(1)).as("n_open_only"))).crossJoin(
      all.agg(count(lit(1)).as("n_any")))
  }

  /** Top-3 suppliers by revenue within each nation: join + grouped
    * agg + ranking window (deterministic: rank on sig5(revenue) with
    * suppkey tie-break). */
  def topSuppliersPerNation(s: SparkSession, dir: String, k: Int = 3)
      : DataFrame = {
    val li = load(s, dir, "lineitem")
    val sup = load(s, dir, "supplier")
    val n = load(s, dir, "nation")
    val rev = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"), col("s_suppkey"))
      .agg(sig5(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("revenue"))
    val w = Window.partitionBy("n_name")
      .orderBy(col("revenue").desc, col("s_suppkey").asc)
    rev.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("n_name", "rnk", "s_suppkey", "revenue")
      .orderBy("n_name", "rnk")
  }
}
