package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.det.Sig

/** Corpus-level composition analytics: cross-source content overlap
  * (exact and KMV-sketched), token-budget planning against a target
  * mixture, and the reproducible global shuffle that fixes a training
  * order. These answer the corpus-assembly questions ("how much of
  * source A is already in source B", "how many epochs of each source
  * does a B-token run need", "what exact order do the examples ship
  * in") that per-document profiling cannot.
  *
  * Overlap is measured over word-3-gram sets (the cross-corpus
  * n-gram overlap methodology of the C4/Pile dataset analyses, e.g.
  * Dodge et al. 2021), NOT whole-document hashes: near-identical
  * corpora with trivially differing documents still show up, and the
  * measure degrades gracefully to containment for subset corpora.
  * Gram derivation is [[TextStats.distinctGrams]] — the ONE gram
  * construction shared with dedup/boilerplate, so "overlap",
  * "duplicate" and "boilerplate" can never disagree on what a gram
  * is. Grams are folded to 60-bit keys via md5 (portable: any SQL
  * engine re-derives the identical value), so shuffle keys are 8
  * bytes regardless of gram text length.
  *
  * Scale shape (100 TB): the gram-set frame is one distinct
  * (source, hash) aggregation — partial combine collapses repeated
  * grams map-side. Exact overlap self-joins that frame on the 8-byte
  * hash (S-bounded rows per key after the distinct, so no skew), the
  * sketch form reduces each source to a k-long signature first and
  * pairs signatures instead of sets — the form that stays cheap when
  * the gram sets themselves are billions per source.
  */
object Corpus {

  /** Portable 60-bit content key: first 15 hex digits of md5, parsed
    * base-16 (fits a signed long; DuckDB: `('0x'||substr(md5(x),1,15
    * ))::BIGINT`). */
  private[graft] def textHash60(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Distinct (source, gram-hash) pairs — the per-source gram set. */
  private def gramSets(df: DataFrame, srcCol: String, textCol: String,
      n: Int): DataFrame =
    df.where(col(textCol).isNotNull)
      .select(col(srcCol).as("source"),
        explode(TextStats.distinctGrams(
          split(col(textCol), " "), n)).as("g"))
      .select(col("source"), textHash60(col("g")).as("h"))
      .distinct()

  /** Exact pairwise source overlap: for every source pair (a < b)
    * the gram-set sizes, intersection, Jaccard and both containments
    * (`c_a` = share of a's grams also in b — the "a is inside b"
    * signal Jaccard hides when sizes differ). Zero-overlap pairs ARE
    * emitted (a release manifest needs the zeros). One distinct
    * aggregation + one hash-key self-join + a broadcast of the
    * O(sources) size frame. */
  def sourceOverlap(df: DataFrame, srcCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    // (r17 note: materializing `sets` like ngramJaccardPairs was
    // MEASURED SLOWER — 3.33 → 3.75 s at sf0.1 — this frame is the
    // corpus's whole distinct gram multiset, so the checkpoint
    // round-trip exceeds the one re-derivation it saves; honest
    // negative result, kept as-was)
    val sets = gramSets(df, srcCol, textCol, n)
    val sz0 = sets.groupBy("source").agg(count(lit(1)).as("sz"))
    // pair frame built from the INPUT's distinct sources, not the
    // gram-set sizes: a source whose docs are all shorter than n
    // tokens (or all-null text) has an empty gram set but must still
    // appear in the manifest (sz 0, zero overlaps) — "zero-overlap
    // pairs ARE emitted" includes zero-GRAM sources.
    val srcs = df.select(col(srcCol).cast("string").as("source"))
      .where(col("source").isNotNull).distinct()
    val sz = srcs.join(sz0, Seq("source"), "left")
      .select(col("source"), coalesce(col("sz"), lit(0L)).as("sz"))
    val common = sets.as("a")
      .join(sets.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    val pairs = sz.select(col("source").as("src_a"), col("sz").as("sz_a"))
      .crossJoin(broadcast(
        sz.select(col("source").as("src_b"), col("sz").as("sz_b"))))
      .where(col("src_a") < col("src_b"))
    pairs.join(common, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("sz_a"), col("sz_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
      .select(col("src_a"), col("src_b"), col("sz_a"), col("sz_b"),
        col("n_common"),
        Sig.sig5(when(col("sz_a") + col("sz_b") - col("n_common") > 0,
          col("n_common").cast("double") /
            (col("sz_a") + col("sz_b") - col("n_common"))))
          .as("jaccard"),
        Sig.sig5(when(col("sz_a") > 0,
          col("n_common").cast("double") / col("sz_a"))).as("c_a"),
        Sig.sig5(when(col("sz_b") > 0,
          col("n_common").cast("double") / col("sz_b"))).as("c_b"))
      .orderBy("src_a", "src_b")
  }

  /** KMV-sketched pairwise Jaccard (Beyer et al. 2007 set-operation
    * estimator): each source keeps only its k smallest gram hashes
    * ([[graft.functions.BottomKSketch]] — O(k) mergeable state), and
    * a pair's estimate is |bottom-k(A ∪ B) ∩ A ∩ B| / k_used over
    * the union's bottom-k. The entire computation after the gram
    * distinct touches S·k rows, not the gram sets — the 100 TB form.
    * Deterministic given the data (order-free sketch, exact integer
    * arithmetic), so the oracle replays it value-level. */
  def sourceOverlapSketch(df: DataFrame, srcCol: String,
      textCol: String, n: Int = 3, k: Int = 128): DataFrame = {
    val sets = gramSets(df, srcCol, textCol, n)
    val sig = sets.groupBy("source")
      .agg(graft.functions.BottomKSketch.bottom_k(k)(col("h")).as("sig"))
    val ex = sig.select(col("source"), explode(col("sig")).as("h"))
    // pair frame from the INPUT's distinct sources (the exact form's
    // zero-gram-source rule applied to the sketch twin): a source
    // with an empty gram set keeps its manifest rows (k_used 0,
    // est NULL) instead of silently vanishing
    val srcs = df.select(col(srcCol).cast("string").as("source"))
      .where(col("source").isNotNull).distinct()
    val pairs = srcs.select(col("source").as("src_a"))
      .crossJoin(broadcast(srcs.select(col("source").as("src_b"))))
      .where(col("src_a") < col("src_b"))
    // each pair's union rows via two equi-joins (no OR-condition
    // nested loop): a-side rows keyed by src_a, b-side by src_b
    val ua = pairs.join(ex.withColumnRenamed("source", "src_a"), "src_a")
      .select(col("src_a"), col("src_b"), col("h"),
        lit(1).as("in_a"), lit(0).as("in_b"))
    val ub = pairs.join(ex.withColumnRenamed("source", "src_b"), "src_b")
      .select(col("src_a"), col("src_b"), col("h"),
        lit(0).as("in_a"), lit(1).as("in_b"))
    val u = ua.unionByName(ub)
      .groupBy("src_a", "src_b", "h")
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    // bottom-k of the union, bounded-state again; then membership
    // flags rejoined by (pair, h)
    val ubk = u.groupBy("src_a", "src_b")
      .agg(graft.functions.BottomKSketch.bottom_k(k)(col("h")).as("sig"))
      .select(col("src_a"), col("src_b"), explode(col("sig")).as("h"))
    val est = ubk.join(u, Seq("src_a", "src_b", "h"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("k_used"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L)
          .otherwise(0L)).as("n_both"))
    pairs.join(est, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("k_used"), lit(0L)).as("k_used"),
        coalesce(col("n_both"), lit(0L)).as("n_both"))
      .select(col("src_a"), col("src_b"), col("k_used"), col("n_both"),
        Sig.sig5(when(col("k_used") > 0,
          col("n_both").cast("double") / col("k_used")))
          .as("est_jaccard"))
      .orderBy("src_a", "src_b")
  }

  /** Token-budget plan: given target mixture `weights` (summing to
    * 1) and a total token `budget`, the per-source availability,
    * target and epoch count (target/available — >1 means the source
    * repeats). Sources absent from `weights` report weight 0. One
    * aggregation with map-side combine; weights are a broadcast
    * literal map. */
  def tokenBudget(df: DataFrame, srcCol: String, textCol: String,
      weights: Map[String, Double], budget: Long): DataFrame = {
    val counts = df.groupBy(col(srcCol).as("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(size(TextStats.tokens(col(textCol))).cast("long"))
        .as("n_tokens"))
    val wm = typedLit(weights)
    counts
      .select(col("source"), col("n_docs"), col("n_tokens"),
        coalesce(element_at(wm, col("source")), lit(0.0)).as("weight"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        Sig.sig5(col("weight")).as("weight"),
        floor(col("weight") * budget).cast("long").as("target_tokens"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("weight"), col("target_tokens"),
        Sig.sig5(col("target_tokens").cast("double") / col("n_tokens"))
          .as("epochs"))
      .orderBy("source")
  }

  /** Reproducible global shuffle: every row gets a (shard, pos)
    * coordinate — shard = minstdHash(id) mod `shards`, pos = rank of
    * a SECOND Lehmer step within the shard. Any engine re-derives
    * the identical order from ids alone (pure integer arithmetic, no
    * engine RNG), which is what makes a training order auditable.
    * The within-shard rank is a window partitioned by shard: with
    * shards sized for ~file-of-rows granularity (thousands at corpus
    * scale) each partition is bounded, so no single-task global sort
    * ever runs — this is exactly how sharded training data is
    * written (one output file per shard, rows in pos order). */
  /** Persist a training order: the full rows plus their
    * [[reproducibleShuffle]] (shard, pos) coordinates, laid out
    * hive-style by shard (one directory per shard, each written by
    * one task). Consumers read a shard's directory and sort by `pos`
    * — the coordinates are IN the data, so the order survives any
    * reader's row-group scheduling and can be re-audited from ids
    * alone. */
  def writeShuffled(df: DataFrame, idCol: String, path: String,
      shards: Int): Unit = {
    val coords = reproducibleShuffle(df.select(col(idCol)), idCol,
      shards)
    df.join(coords, Seq(idCol))
      .repartition(shards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  def reproducibleShuffle(df: DataFrame, idCol: String,
      shards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = Sampling.minstdHash(col(idCol))
    val h2 = Sampling.minstdHash(h1) // independent second step
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("ord"), col(idCol))
    df.select(col(idCol),
        pmod(h1, lit(shards.toLong)).as("shard"), h2.as("ord"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("shard"), col("pos"), col(idCol))
      .orderBy("shard", "pos")
  }
}
