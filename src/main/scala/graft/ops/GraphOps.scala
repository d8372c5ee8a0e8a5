package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.det.Sig.sig5

/** Link-graph centrality for crawl curation (Page et al. 1999;
  * Common Crawl publishes exactly these per-domain ranks) — the
  * quality-weighting signal a web-scale training pipeline computes
  * BEFORE content filtering: a page linked by many well-linked pages
  * is worth keeping even when its text looks thin.
  *
  * Scale shape: PageRank is the canonical iterative-join workload —
  * each iteration is one (src-keyed) join of the edge list against
  * the current rank frame plus one dst-keyed aggregation. The edge
  * list is joined `iters` times, so a real deployment PERSISTS it
  * pre-partitioned on src (bucketing makes every iteration's join
  * shuffle-free on the edge side; the rank frame, O(nodes), is the
  * small side). Iterations are a FIXED small count (3–10 suffices
  * for curation ranking) — this is a bounded pipeline, not a
  * convergence loop, so the plan is a static DAG Catalyst sees
  * whole. No driver-side state beyond the iteration counter. */
object GraphOps {

  /** Damped PageRank after a fixed number of power iterations.
    * Assumes every node has at least one out-edge (a crawl graph
    * pre-filtered to resolvable links; dangling-mass redistribution
    * is deliberately out of contract — document it, don't guess).
    * Returns (node, pr) with pr sig5-rounded; `topK` cuts on the
    * ROUNDED rank with node-id tie-break (TakeOrdered — no global
    * sort materialization). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, damping: Double = 0.85,
      topK: Option[Int] = None): DataFrame = {
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val outdeg = e0.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e = e0.join(outdeg, Seq("src"))
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct()
    val total = nodes.agg(count(lit(1)).as("n_nodes"))
    // r: (node, pr). p0 = 1/N; each step
    //   p'(v) = (1−d)/N + d·Σ_{u→v} p(u)/outdeg(u)
    var r = nodes.crossJoin(broadcast(total))
      .select(col("node"), (lit(1.0) / col("n_nodes")).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = e.join(r, col("src") === col("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("pr") / col("outdeg")).as("in_pr"))
      r = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(total))
        .select(col("node"),
          (lit(1.0 - damping) / col("n_nodes") +
            lit(damping) * coalesce(col("in_pr"), lit(0.0))).as("pr"))
    }
    val out = r.select(col("node"), sig5(col("pr")).as("pr"))
    topK match {
      case Some(k) =>
        out.orderBy(col("pr").desc, col("node").asc).limit(k)
      case None => out.orderBy("node")
    }
  }

  /** Damped PageRank WARM-STARTED from a previous rank vector — the
    * incremental form for daily crawl deltas: instead of re-iterating
    * from uniform 1/N, start from yesterday's (sig5-canonical) ranks
    * and run a SHORT refresh (1–2 iterations). Power iteration with
    * damping contracts toward the stationary vector from ANY start,
    * and yesterday's ranks are already near it, so the refresh buys
    * most of a full rebuild's accuracy at a fraction of the joins
    * (measured in GraphScaleSmoke / BASELINE.md r13). Nodes unseen by
    * `ranks0` (the delta's new pages) start at uniform 1/N.
    *
    * Determinism contract: the handoff vector is the sig5-ROUNDED
    * [[pageRank]] output (the sig5-shared-literal pattern — both
    * engines warm-start from bitwise-identical doubles), so the
    * refresh iterations replay exactly in the oracle's CTEs. */
  def pageRankWarm(edges: DataFrame, srcCol: String, dstCol: String,
      ranks0: DataFrame, iters: Int = 1, damping: Double = 0.85,
      topK: Option[Int] = None): DataFrame = {
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val outdeg = e0.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e = e0.join(outdeg, Seq("src"))
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct()
    val total = nodes.agg(count(lit(1)).as("n_nodes"))
    var r = nodes
      .join(ranks0.select(col("node"), col("pr").as("pr0")),
        Seq("node"), "left")
      .crossJoin(broadcast(total))
      .select(col("node"),
        coalesce(col("pr0"), lit(1.0) / col("n_nodes")).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = e.join(r, col("src") === col("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("pr") / col("outdeg")).as("in_pr"))
      r = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(total))
        .select(col("node"),
          (lit(1.0 - damping) / col("n_nodes") +
            lit(damping) * coalesce(col("in_pr"), lit(0.0))).as("pr"))
    }
    val out = r.select(col("node"), sig5(col("pr")).as("pr"))
    topK match {
      case Some(k) =>
        out.orderBy(col("pr").desc, col("node").asc).limit(k)
      case None => out.orderBy("node")
    }
  }

  /** Persisted link-graph state — the graph member of the
    * persisted-state family (dedup catalog, ANN index, profile
    * store, KN counts): the edge list IS the model's sufficient
    * statistic and merges by plain UNION, so a daily crawl appends
    * its O(delta) edges and never rewrites the graph; the rank
    * vector is a cached derived artifact the next refresh
    * warm-starts from. Edges are written partitioned such that a
    * cluster deployment would bucket on src (every refresh
    * iteration's join is src-keyed). */
  def writeEdges(edges: DataFrame, srcCol: String, dstCol: String,
      path: String): Unit =
    edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .write.mode("overwrite").parquet(s"$path/edges")

  def appendEdges(edges: DataFrame, srcCol: String, dstCol: String,
      path: String): Unit =
    edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .write.mode("append").parquet(s"$path/edges")

  def loadEdges(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(s"$path/edges")

  /** Persist a (node, pr) rank vector (the [[pageRank]] /
    * [[pageRankWarm]] output — already sig5-canonical). */
  def writeRanks(ranks: DataFrame, path: String): Unit =
    ranks.select(col("node"), col("pr"))
      .write.mode("overwrite").parquet(s"$path/ranks")

  def loadRanks(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(s"$path/ranks")

  /** Refresh the persisted graph's ranks after [[appendEdges]]:
    * warm-start from the stored vector over the merged edge list. */
  def pageRankIncremental(spark: org.apache.spark.sql.SparkSession,
      path: String, iters: Int = 1, damping: Double = 0.85,
      topK: Option[Int] = None): DataFrame =
    pageRankWarm(loadEdges(spark, path), "src", "dst",
      loadRanks(spark, path), iters, damping, topK)

  /** HITS hubs/authorities (Kleinberg 1999) after a fixed number of
    * iterations — the complement of [[pageRank]] for crawl curation:
    * a directory page (high hub) is kept for link discovery, a
    * high-authority page for content. From all-ones: h_k = A·a_{k−1}
    * then a_k = Aᵀ·h_k, each one edge-keyed join + aggregation (the
    * PageRank scale shape — the edge list is the bucketed big side,
    * the score frame the small side). Every intermediate score is an
    * INTEGER-VALUED double (sums of counts), so the only float step
    * is the final L1 normalization — one broadcast scalar each —
    * making the whole run exactly replayable. `topK` cuts on the
    * sig5-rounded authority with node tie-break. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 2, topK: Option[Int] = None): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    var a = nodes.select(col("node"), lit(1.0).as("auth"))
    var h = nodes.select(col("node"), lit(1.0).as("hub"))
    for (_ <- 1 to iters) {
      h = nodes.join(
          e.join(a, e("dst") === a("node"))
            .groupBy(col("src").as("node"))
            .agg(sum("auth").as("s")), Seq("node"), "left")
        .select(col("node"), coalesce(col("s"), lit(0.0)).as("hub"))
      a = nodes.join(
          e.join(h, e("src") === h("node"))
            .groupBy(col("dst").as("node"))
            .agg(sum("hub").as("s")), Seq("node"), "left")
        .select(col("node"), coalesce(col("s"), lit(0.0)).as("auth"))
    }
    val sums = a.join(h, Seq("node"))
      .agg(sum("auth").as("sa"), sum("hub").as("sh"))
    val out = a.join(h, Seq("node")).crossJoin(broadcast(sums))
      .select(col("node"), sig5(col("hub") / col("sh")).as("hub"),
        sig5(col("auth") / col("sa")).as("authority"))
    topK match {
      case Some(k) => out
        .orderBy(col("authority").desc, col("node").asc).limit(k)
      case None => out.orderBy("node")
    }
  }

  /** Deterministic crawl-shaped link-graph fixture from a doc-id
    * column (the synthUrl precedent — the fixture corpus has no link
    * data, so the edges are synthesized from id arithmetic the
    * oracle replays exactly): every doc links to three affine-mod
    * targets, duplicates collapsed, and every FOURTH doc also links
    * to one of ten HUB nodes (id % 10) — giving the graph the
    * crawl-shaped skewed in-degree head (hubs ≈ n/40 in-links vs ≈3
    * for the tail) that makes degree histograms and centrality
    * ranks meaningful. No node dangles. */
  def synthLinkGraph(docs: DataFrame, idCol: String): DataFrame = {
    val n = docs.agg(count(lit(1)).as("cnt"))
    def tgt(a: Long, b: Long): Column =
      pmod(col(idCol) * a + b, col("cnt"))
    val base = array(tgt(7L, 1L), tgt(13L, 3L), tgt(29L, 7L))
    val withHub = array(tgt(7L, 1L), tgt(13L, 3L), tgt(29L, 7L),
      pmod(col(idCol), lit(10L)))
    docs.select(col(idCol)).crossJoin(broadcast(n))
      .select(col(idCol).as("src"),
        explode(array_distinct(
          when(pmod(col(idCol), lit(4L)) === 0L, withHub)
            .otherwise(base))).as("dst"))
  }

  /** Degree profile of a link graph: per-bucket (power-of-two
    * in-degree) node counts plus out-degree summary — the shape
    * check before any centrality run (a crawl graph whose in-degree
    * head is one node is a link farm, not a web). Exact integer
    * log2 via the binary digit count (`length(bin(x)) − 1` — the
    * engine's portable-log2 contract). */
  def degreeStats(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val indeg = edges.groupBy(col(dstCol).as("node"))
      .agg(count(lit(1)).as("indeg"))
    val bucket = (length(bin(col("indeg"))) - 1).cast("long")
    indeg.groupBy(bucket.as("log2_indeg"))
      .agg(count(lit(1)).as("n_nodes"),
        sum("indeg").cast("long").as("n_edges"))
      .orderBy("log2_indeg")
  }
}
