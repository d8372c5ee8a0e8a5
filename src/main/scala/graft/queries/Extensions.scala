package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.det.Sig
import graft.ops._
import graft.pipeline.CorpusPipeline

/** Remaining extension queries (star joins, categorical
  * stats, relationship discovery, pipeline composition) —
  * the per-family registries split out in round 11 live in
  * DedupQueries / EmbedQueries / TextQueries / EventQueries /
  * MultimodalQueries / DriftQueries / SampleQueries. */
object Extensions {

  import Shared._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the full corpus-preparation funnel as ONE oracle-checked query:
    // quality filter → near-dedup keep → decontamination, stage
    // counts compared against DuckDB's independent re-derivation
    "pipeline_funnel" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      CorpusPipeline.funnelCounts(
        docs.where(col("source") =!= "src0"),
        docs.where(col("source") === "src0"),
        "doc_id", "text", CorpusPipeline.ExactConfig)
    }),
    // the ROUTED funnel (r15) — the NO-CONFIG path a user gets:
    // corpus-stat dispatch picks the exact near-dup join below the
    // row threshold and the banded plan above, decontamination
    // routes exact-vs-bloom the same way — one dispatch, one oracle
    // (all arms value-identical where banding recall is 1; the
    // banded twins pin that at every tier). At the driver SFs the
    // exact arms run; at GenSf sf1/heaps the production arms do
    "pipeline_funnel_routed" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      CorpusPipeline.funnelCounts(
        docs.where(col("source") =!= "src0"),
        docs.where(col("source") === "src0"),
        "doc_id", "text")
    }),
    // the PRODUCTION-shape funnel (r14): near-dedup via MinHash-banded
    // candidates + exact verify, decontamination through the Bloom
    // prefilter — the declared end-to-end plan a user runs at 100 TB.
    // Identical stage counts, SAME oracle (banding recall 1 on the
    // fixtures, bloom provably lossless)
    "pipeline_funnel_banded" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      CorpusPipeline.funnelCounts(
        docs.where(col("source") =!= "src0"),
        docs.where(col("source") === "src0"),
        "doc_id", "text", CorpusPipeline.BandedConfig)
    }),
    // the CCNet-complete funnel: rule gate → per-language KN tercile
    // cut against a TARGET-trained LM (drop the tail) → near-dedup
    // keep → decontamination — stage counts vs DuckDB's independent
    // replay of all four stages. Runs the r15 ROUTED default for the
    // dedup/contamination stages (exact arms below the corpus-size
    // threshold — all driver tiers; banded/bloom arms above, same
    // values where banding recall is 1)
    "pipeline_ccnet" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      CorpusPipeline.ccnetCounts(
        docs.where(col("source") =!= "src0"),
        docs.where(col("source") === "src0"),
        "doc_id", "text", "lang",
        th = QualityRules.Thresholds(30L, 90L, 3.8, 5.0, 2L, 0.12))
    }),
    // the MODEL-gated curation funnel (CCNet's actual architecture:
    // the learned filter makes the keep call): train the LR
    // distillation in-engine, model keep at tau=0.5 -> near-dedup ->
    // decontamination; the oracle replays training AND all stages
    "pipeline_curate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      CorpusPipeline.curateCounts(
        docs.where(col("source") =!= "src0"),
        docs.where(col("source") === "src0"),
        "doc_id", "text", ClassifierQueries.Th,
        cfg = CorpusPipeline.ExactConfig)
    }),
    // the model-gated funnel on the ROUTED dedup/decontamination
    // dispatch (the r15 no-config path); same oracle
    "pipeline_curate_routed" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      CorpusPipeline.curateCounts(
        docs.where(col("source") =!= "src0"),
        docs.where(col("source") === "src0"),
        "doc_id", "text", ClassifierQueries.Th)
    }),
    // the model-gated funnel on the production dedup/decontamination
    // paths (banded near-dup + bloom prefilter); same oracle
    "pipeline_curate_banded" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      CorpusPipeline.curateCounts(
        docs.where(col("source") =!= "src0"),
        docs.where(col("source") === "src0"),
        "doc_id", "text", ClassifierQueries.Th,
        cfg = CorpusPipeline.BandedConfig)
    }),
    // link-graph centrality over the deterministic synthesized crawl
    // graph: 3 power iterations of damped PageRank, top-20 on the
    // sig5-rounded rank with node tie-break
    "graph_pagerank" -> ((s, dir) =>
      GraphOps.pageRank(
        GraphOps.synthLinkGraph(t(s, dir, "documents"), "doc_id"),
        "src", "dst", iters = 3, topK = Some(20))),
    // INCREMENTAL PageRank (the persisted-state lifecycle's graph
    // member): day-1 edges (src % 5 <> 0) ranked cold (3 iters),
    // then the day-2 delta appended and the ranks REFRESHED by 2
    // warm-start iterations from day-1's sig5-canonical vector —
    // the oracle replays day-1's chain AND the warm refresh; the
    // disk roundtrip (writeEdges/appendEdges/writeRanks) is pinned
    // store ≡ frame in Round13Spec
    "graph_pagerank_incremental" -> ((s, dir) => {
      val edges = GraphOps.synthLinkGraph(
        t(s, dir, "documents"), "doc_id")
      val day1 = edges.where(pmod(col("src"), lit(5L)) =!= 0L)
      val r1 = GraphOps.pageRank(day1, "src", "dst", iters = 3)
      GraphOps.pageRankWarm(edges, "src", "dst", r1, iters = 2,
        topK = Some(20))
    }),
    // the shape check before any centrality run: power-of-two
    // in-degree histogram (exact binary-digit-count log2)
    "graph_degree_stats" -> ((s, dir) =>
      GraphOps.degreeStats(
        GraphOps.synthLinkGraph(t(s, dir, "documents"), "doc_id"),
        "src", "dst")),
    // HITS hubs/authorities: 2 fixed iterations from all-ones
    // (integer-exact until the final L1 normalization), top-20 on
    // the sig5 authority with node tie-break
    "graph_hits" -> ((s, dir) =>
      GraphOps.hits(
        GraphOps.synthLinkGraph(t(s, dir, "documents"), "doc_id"),
        "src", "dst", iters = 2, topK = Some(20))),
    // categorical distribution shape: Shannon entropy + evenness per
    // column via the O(distinct) identity H = ln n − (Σ c·ln c)/n
    "cat_entropy" -> ((s, dir) =>
      CatStats.entropy(t(s, dir, "orders"),
        Seq("o_orderstatus", "o_orderpriority"))),
    // Count–Min error contract: exact top-20 counts vs the 4×256
    // sketch estimate, one-sided lower_ok + ε·N Markov verdict
    // (l_partkey: ~2000 distinct >> 256 buckets, so collisions are
    // real and the bound is doing work)
    "cat_countmin_err" -> ((s, dir) =>
      CatStats.countMinErr(t(s, dir, "lineitem"), "l_partkey")),
    // the sketch's merge algebra pinned: per-shard sketches summed
    // counter-wise ≡ the whole-corpus sketch, every (row, bucket)
    "cat_countmin_mergeable" -> ((s, dir) =>
      CatStats.countMinMergeCheck(t(s, dir, "lineitem"),
        "l_partkey", "l_returnflag")),
    // equi-DEPTH histogram: ~equal-count buckets bounded by exact
    // percentiles — readable under skew where equi-width collapses;
    // one edge agg + one conditional pass, rounded-edge decisions
    "num_histogram_eqdepth" -> ((s, dir) =>
      graft.profiler.Stats.eqDepthHistogram(
        t(s, dir, "documents"), "n_chars", bins = 10)),
    // pairwise categorical association (Cramér's V + Theil's U both
    // directions) across three tables' facet pairs — the categorical
    // counterpart of corr_matrix; one contingency shuffle per pair
    "cat_association" -> ((s, dir) =>
      CatStats.association(t(s, dir, "orders"),
          Seq(("o_orderstatus", "o_orderpriority")))
        .unionByName(CatStats.association(t(s, dir, "customer"),
          Seq(("c_mktsegment", "c_nationkey"))))
        .unionByName(CatStats.association(t(s, dir, "documents"),
          Seq(("lang", "source"))))
        .orderBy("col_a", "col_b")),
    // ---- temporal joins (operators Spark lacks as built-ins) ----
    // backward as-of join: every click matched to the user's most
    // recent purchase at-or-before it (7-day tolerance), via the
    // union-marker single-window plan — one shuffle, ZERO join
    // operators (an inequality join would plan a per-key nested
    // loop). The oracle is the quadratic LEFT JOIN + row_number
    // formulation — a hash-match proves the window trick equals the
    // textbook semantics on every row, ties and tolerance included.
    "join_asof" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val base = e.select(col("event_id"), col("user_id"),
        EventOps.tsMicros(e).as("us"), col("event_type"), col("value"))
      TemporalJoin.asofJoin(
        base.where(col("event_type") === "click")
          .select("event_id", "user_id", "us"),
        base.where(col("event_type") === "purchase")
          .select("event_id", "user_id", "us", "value"),
        key = "user_id", ts = "us", idCol = "event_id",
        rightVals = Seq("value"),
        toleranceUs = Some(7L * 24 * 3600 * 1000000L))
    }),
    // point-in-interval (range) join: every event matched to the
    // containing session interval of its user via the bucket-exploded
    // equi-join (1-hour buckets) — no broadcast-nested-loop. The
    // oracle derives each event's session index directly from the
    // window formulation, so the bucketing machinery must reproduce
    // exact interval-containment semantics to hash-match.
    "join_range" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val pts = e.select(col("event_id"), col("user_id"),
        EventOps.tsMicros(e).as("us"))
      TemporalJoin.pointInInterval(pts, EventOps.sessionize(e),
          key = "user_id", pointCol = "us",
          startCol = "session_start_us", endCol = "session_end_us",
          bucketUs = 3600L * 1000000L,
          pointProj = Seq("event_id"), intervalProj = Seq("session_idx"))
        .select("event_id", "user_id", "us", "session_idx")
        .orderBy("event_id")
    }),
    // crawl-saturation curve: distinct grams first seen per id-range
    // decile — a drying crawl collapses the late-bucket new-gram
    // share long before row counts move
    "corpus_saturation" -> ((s, dir) =>
      TextStats.saturationCurve(t(s, dir, "documents"), "doc_id",
        "text")),
    // FD discovery over a candidate column set (fdCheck verifies
    // claims; this finds them) — quality_suggest's one-Expand
    // declared form, HLL at corpus scale
    "col_fd_discover" -> ((s, dir) =>
      graft.profiler.Stats.fdDiscover(t(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus"))),
    // ---- nested-type profiling ----
    "array_profile" -> ((s, dir) =>
      ArrayStats.profile(t(s, dir, "embeddings"), "embedding")),
    // ---- star-schema joins ----
    "join_revenue_nation" -> ((s, dir) =>
      StarJoins.revenueByNation(s, dir)),
    "join_top_suppliers" -> ((s, dir) =>
      StarJoins.topSuppliersPerNation(s, dir)),
    "set_ops_customers" -> ((s, dir) =>
      StarJoins.customerSetOps(s, dir)),
    // sliced profiling: per-returnflag numeric stats, long form
    "num_grouped" -> ((s, dir) =>
      graft.profiler.Stats.grouped(t(s, dir, "lineitem"), "l_returnflag",
        Seq("l_quantity", "l_extendedprice", "l_discount"))),
    // Misra–Gries guarantee gate: exact counts are the premise; the
    // query emits every TRUE heavy item (cnt·(k+1) > n) with the
    // sketch's order-free guarantees as booleans. Estimates are
    // merge-order dependent and deliberately NOT emitted; coverage
    // failure drops a row (row-count mismatch), a bound violation
    // flips a boolean (hash mismatch).
    "cat_heavy_hitters" -> ((s, dir) => {
      val k = 2
      val li = t(s, dir, "lineitem").select(col("l_returnflag").as("item"))
      val sk = li.agg(graft.functions.HeavyHitters.mg(col("item"), k)
        .as("mg"))
      val entries = sk.select(col("mg.n").as("n"),
          explode(col("mg.items")))
        .select(col("n"), col("key").as("item"), col("value").as("est"))
      val exact = li.groupBy("item").agg(count(lit(1)).as("cnt"))
      val tot = exact.agg(sum("cnt").as("n_stream"))
      exact.crossJoin(broadcast(tot))
        .where(col("cnt") * (k + 1) > col("n_stream"))
        .join(entries, Seq("item"))
        .select(col("item"), col("cnt"),
          (col("est") <= col("cnt")).as("est_le_exact"),
          ((col("cnt") - col("est")) * (k + 1) <= col("n"))
            .as("err_bounded"))
        .orderBy("item")
    }),
    // the user-facing deterministic answer the sketch enables: MG
    // proposes ≤ k candidates (pass 1), an exact recount of only
    // those candidates (pass 2) keeps the true heavy items — the
    // oracle is a plain GROUP BY, proving the two-pass result equals
    // the full exact aggregation it avoids at scale
    "cat_heavy_exact" -> ((s, dir) =>
      graft.functions.HeavyHitters.heavyHittersExact(
        t(s, dir, "lineitem").select(col("l_returnflag")),
        "l_returnflag", k = 2)),
    // fixed-reference drift: the even-doc slice's lang histogram is
    // collected once (O(langs) driver state, the blessed-baseline
    // monitoring shape) and the odd-doc slice is scored against it in
    // ONE conditional-sum agg — the batch twin of the streaming
    // windowedReferenceDrift (StreamingSpec asserts per-window
    // equality)
    // per-source corpus manifest (the training-data datasheet)
    "corpus_manifest" -> ((s, dir) =>
      TextStats.manifest(t(s, dir, "documents"), "source", "text")),
    // the two-level datasheet: what each source is made of by lang
    "corpus_composition" -> ((s, dir) =>
      TextStats.composition(t(s, dir, "documents"), "source", "lang",
        "text")),
    // release diff: what changed between two corpus versions — v2 is
    // a deterministic edit of v1 (every 11th doc removed, every 13th
    // surviving doc's text edited, every 17th re-added under a new
    // id), so all four statuses are exercised non-vacuously
    "table_diff" -> ((s, dir) => {
      val v1 = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
      val v2 = v1.where(col("doc_id") % 11 =!= 0)
        .withColumn("text", when(col("doc_id") % 13 === 0,
          concat(col("text"), lit(" [v2]"))).otherwise(col("text")))
        .unionByName(v1.where(col("doc_id") % 17 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            col("text"), col("lang"), col("source")))
      graft.ops.TableDiff.diffSummary(v1, v2, Seq("doc_id"),
        Seq("text", "lang", "source"))
    }),
    // schema-quality audit: key/FD claims with violation counts —
    // o_orderkey IS the table key (holds), o_custkey does not
    // determine status (fails, counted)
    "col_fd_keys" -> ((s, dir) =>
      graft.profiler.Stats.fdCheck(t(s, dir, "orders"), Seq(
        Seq("o_orderkey") -> Seq(),
        Seq("o_orderkey") -> Seq("o_custkey"),
        Seq("o_custkey") -> Seq("o_orderstatus")))),
    // exact duplicate-row profile over the full-row struct
    "table_duplicates" -> ((s, dir) =>
      graft.profiler.Stats.duplicateRows(t(s, dir, "lineitem"))),
    // cross-table inclusion dependencies (FK discovery) — the
    // multi-table profiling pass: four true TPC-H FKs (inclusion 1.0)
    // plus one deliberately partial pair so the non-FK verdict is
    // exercised non-trivially
    "table_inclusion" -> ((s, dir) =>
      Inclusion.inclusionStats(Seq(
        ("customer.c_nationkey->nation.n_nationkey",
          t(s, dir, "customer"), "c_nationkey",
          t(s, dir, "nation"), "n_nationkey"),
        ("lineitem.l_orderkey->orders.o_orderkey",
          t(s, dir, "lineitem"), "l_orderkey",
          t(s, dir, "orders"), "o_orderkey"),
        ("lineitem.l_partkey->part.p_partkey",
          t(s, dir, "lineitem"), "l_partkey",
          t(s, dir, "part"), "p_partkey"),
        ("orders.o_custkey->customer.c_custkey",
          t(s, dir, "orders"), "o_custkey",
          t(s, dir, "customer"), "c_custkey"),
        ("part.p_partkey->supplier.s_suppkey",
          t(s, dir, "part"), "p_partkey",
          t(s, dir, "supplier"), "s_suppkey")))),
    // the 100 TB inclusion path as a value-checked error contract:
    // bottom-k (KMV) containment estimate vs the exact coefficient —
    // the sketch side is ONE O(k) mergeable aggregation per table
    // (shuffle independent of key cardinality), and because the key
    // hash is the pure-arithmetic minstdHash, the ORACLE recomputes
    // the same sketches and the same estimate (not an all-true
    // declaration). Same 5 candidate pairs as table_inclusion.
    "table_inclusion_sketch" -> ((s, dir) =>
      Inclusion.inclusionSketchStats(Seq(
        ("customer.c_nationkey->nation.n_nationkey",
          t(s, dir, "customer"), "c_nationkey",
          t(s, dir, "nation"), "n_nationkey"),
        ("lineitem.l_orderkey->orders.o_orderkey",
          t(s, dir, "lineitem"), "l_orderkey",
          t(s, dir, "orders"), "o_orderkey"),
        ("lineitem.l_partkey->part.p_partkey",
          t(s, dir, "lineitem"), "l_partkey",
          t(s, dir, "part"), "p_partkey"),
        ("orders.o_custkey->customer.c_custkey",
          t(s, dir, "orders"), "o_custkey",
          t(s, dir, "customer"), "c_custkey"),
        ("part.p_partkey->supplier.s_suppkey",
          t(s, dir, "part"), "p_partkey",
          t(s, dir, "supplier"), "s_suppkey")))),
    // mergeable-sketch distinct: per-source HLL sketches (DataSketches
    // hll_sketch_agg — the per-day/per-partition shards of an
    // INCREMENTAL profile) unioned vs one single-pass global sketch.
    // NOTE the estimates are NOT required to be equal: DataSketches
    // HLL keeps small shards in an exact coupon mode, so a union of
    // exact shards can be MORE accurate than the already-promoted
    // global sketch (observed: union exact at 500 distinct while the
    // global sketch estimated 494). The composable-shards contract is
    // the error ENVELOPE: both paths must sit within the sketch's
    // bound of the exact count — emitted as booleans over the exact
    // premise (raw estimates are engine-specific, not emitted).
    "col_distinct_mergeable" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val perSrc = docs.groupBy("source")
        .agg(expr("hll_sketch_agg(doc_id)").as("sk"))
      val merged = perSrc.agg(expr(
        "hll_sketch_estimate(hll_union_agg(sk))").as("est_merged"))
      val global = docs.agg(
        expr("hll_sketch_estimate(hll_sketch_agg(doc_id))")
          .as("est_global"),
        countDistinct(col("doc_id")).as("exact"))
      merged.crossJoin(global).select(
        col("exact"),
        (abs(col("est_merged") - col("exact")) <=
          col("exact").cast("double") * 0.05).as("merged_err_bounded"),
        (abs(col("est_global") - col("exact")) <=
          col("exact").cast("double") * 0.05).as("global_err_bounded"))
    }),
    // quality-quota data selection: the top-5 highest-quality docs
    // per language (rank on the sig5-ROUNDED score, doc_id
    // tie-break — the engine contract for discrete decisions)
    // per-language top-5 by quality via the bounded TopKByScore heap
    // (the repo's per-GROUP top-k contract): the former
    // row_number() OVER (PARTITION BY lang ...) form ranked each
    // language's ENTIRE corpus through one window task — at 100 TB
    // the dominant language is one task sorting most of the corpus.
    // The heap keeps O(k) state map-side with a linear merge; the
    // tie-break is ASCENDING doc_id on equal (sig5-rounded) quality,
    // matching the oracle's ORDER BY quality DESC, doc_id. Plan is
    // asserted window-free (Round8Spec).
    // reproducible-release manifest: deterministic MINSTD shards +
    // order-free modular checksums (any engine recomputes from ids)
    "corpus_shards" -> ((s, dir) =>
      graft.sources.Sources.shardManifest(t(s, dir, "documents"),
        "doc_id", buckets = 8)),
    // the explicit hot-key mitigation path as a first-class query:
    // salted equi-join (big side salted, small side replicated), then
    // revenue by nation — the oracle is the PLAIN join, so the salt
    // machinery must be result-invisible
    "join_salted" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_custkey").as("custkey"), col("o_totalprice"))
      val c = t(s, dir, "customer")
        .select(col("c_custkey").as("custkey"), col("c_nationkey"))
      SkewJoin.saltedEquiJoin(o, c, "custkey", salt = 8)
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_orders"),
          Sig.sig5(sum("o_totalprice")).as("revenue"))
        .orderBy("c_nationkey")
    })
  )

  val corpusShardsSql: String = {
    val h = "((((((doc_id + 12345) % 2147483647) * 48271) " +
      "% 2147483647) * 48271) % 2147483647)"
    s"""SELECT $h % 8 AS shard, count(*) AS n_docs,
       |CAST(sum($h % 1000003) % 1000003 AS BIGINT) AS checksum
       |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin
  }

  val joinAsofSql: String =
    """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us,
      |            event_type, value FROM events),
      |l AS (SELECT event_id, user_id, us FROM e
      |      WHERE event_type = 'click'),
      |r AS (SELECT event_id, user_id, us, value FROM e
      |      WHERE event_type = 'purchase'),
      |j AS (SELECT l.event_id, l.user_id, l.us,
      |        r.event_id AS m_eid, r.us AS m_us, r.value AS m_val,
      |        row_number() OVER (PARTITION BY l.event_id
      |          ORDER BY r.us DESC, r.event_id DESC) AS rn
      |      FROM l LEFT JOIN r
      |      ON r.user_id = l.user_id AND r.us <= l.us),
      |t AS (SELECT *, m_us IS NOT NULL
      |        AND us - m_us <= 604800000000 AS ok
      |      FROM j WHERE rn = 1)
      |SELECT event_id, user_id, us,
      |CAST(CASE WHEN ok THEN m_eid END AS BIGINT) AS matched_event_id,
      |CAST(CASE WHEN ok THEN m_us END AS BIGINT) AS matched_us,
      |CAST(CASE WHEN ok THEN us - m_us END AS BIGINT) AS gap_us,
      |CAST(CASE WHEN ok THEN m_val END AS DOUBLE) AS matched_value
      |FROM t ORDER BY event_id""".stripMargin

  /** Each event's containing session derived straight from the
    * window formulation (sessions of one user are disjoint, so the
    * interval join has exactly one match per event). */

  val joinRangeSql: String =
    """WITH x AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us
      |           FROM events),
      |f AS (SELECT user_id, event_id, us,
      |  CASE WHEN lag(us) OVER w IS NULL
      |       OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS flag
      |  FROM x WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |s AS (SELECT user_id, event_id, us,
      |  sum(flag) OVER (PARTITION BY user_id ORDER BY us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      |  FROM f)
      |SELECT event_id, user_id, us, CAST(session_idx AS BIGINT)
      |  AS session_idx
      |FROM s ORDER BY event_id""".stripMargin

  val tableDiffSql: String =
    """WITH v1 AS (SELECT doc_id, text, lang, source FROM documents),
      |v2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 0 THEN text || ' [v2]'
      |         ELSE text END AS text, lang, source
      |  FROM v1 WHERE doc_id % 11 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, text, lang, source FROM v1
      |  WHERE doc_id % 17 = 0),
      |j AS (SELECT
      |  CASE WHEN o.doc_id IS NULL THEN 'added'
      |       WHEN n.doc_id IS NULL THEN 'removed'
      |       WHEN o.text IS NOT DISTINCT FROM n.text
      |        AND o.lang IS NOT DISTINCT FROM n.lang
      |        AND o.source IS NOT DISTINCT FROM n.source THEN 'same'
      |       ELSE 'changed' END AS status
      |  FROM v1 o FULL OUTER JOIN v2 n ON n.doc_id = o.doc_id)
      |SELECT status, count(*) AS n FROM j GROUP BY status
      |ORDER BY status""".stripMargin

  val corpusCompositionSql: String =
    s"""WITH c AS (SELECT source, lang AS sub, count(*) AS n_docs,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT)
       |      AS n_tokens
       |  FROM documents GROUP BY source, lang),
       |t AS (SELECT source, sum(n_docs) AS src_docs FROM c
       |      GROUP BY source)
       |SELECT c.source, c.sub, c.n_docs, c.n_tokens,
       |  ${sig("CAST(c.n_docs AS DOUBLE) / t.src_docs")}
       |    AS share_in_source
       |FROM c JOIN t ON t.source = c.source
       |ORDER BY c.source, c.sub""".stripMargin

  /** [[graft.ops.Drift.categoricalDriftByGroup]] mirror: same
    * per-group Laplace-smoothed shares and TVD. */

  val colFdDiscoverSql: String = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus")
    val pairs = for { a <- cols; b <- cols if a != b } yield (a, b)
    val parts = pairs.map { case (a, b) =>
      s"""SELECT '$a' AS lhs, '$b' AS rhs,
         |  count(DISTINCT $a) AS n_lhs,
         |  count(DISTINCT CASE WHEN $a IS NOT NULL
         |    THEN ($a, $b) END) AS n_pairs,
         |  count(DISTINCT CASE WHEN $a IS NOT NULL
         |    THEN ($a, $b) END) = count(DISTINCT $a) AS holds
         |FROM orders""".stripMargin
    }
    parts.mkString("", "\nUNION ALL\n", "") + "\nORDER BY lhs, rhs"
  }

  val corpusSaturationSql: String =
    s"""WITH ${shingleCteSql("sh", "documents")},
       |fs AS (SELECT shingle, min(id) AS fid FROM sh0
       |       GROUP BY shingle),
       |mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
       |pb AS (SELECT least(fid * 10 // m, 9) AS bucket, count(*)
       |         AS n_new
       |       FROM fs, mx GROUP BY 1),
       |tt AS (SELECT sum(n_new) AS tot FROM pb)
       |SELECT CAST(bucket AS BIGINT) AS bucket,
       |  CAST(n_new AS BIGINT) AS n_new,
       |  CAST(sum(n_new) OVER (ORDER BY bucket
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS BIGINT) AS cum_new,
       |  ${sig("CAST(n_new AS DOUBLE) / tot")} AS new_share
       |FROM pb, tt ORDER BY bucket""".stripMargin

  /** [[graft.ops.TextStats.entropyDrift]] mirror: per-slice unigram
    * entropy, delta over the sig5 literals. */

  val arrayProfileSql: String =
    s"""WITH l AS (SELECT len(embedding) AS ln FROM embeddings
       |  WHERE embedding IS NOT NULL),
       |la AS (SELECT count(*) AS n_arrays, ${sig("avg(ln)")} AS avg_len,
       |  CAST(min(ln) AS BIGINT) AS min_len,
       |  CAST(max(ln) AS BIGINT) AS max_len FROM l),
       |e AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
       |ea AS (SELECT count(*) AS elem_n, ${sig("avg(v)")} AS elem_mean,
       |  min(v) AS elem_min, max(v) AS elem_max,
       |  ${sig("stddev_samp(v)")} AS elem_std FROM e)
       |SELECT * FROM la, ea""".stripMargin

  val joinRevenueNationSql: String =
    s"""SELECT n_name, count(*) AS n_lineitems,
       |${sig("sum(l_extendedprice * (1.0 - l_discount))")} AS revenue
       |FROM lineitem, orders, customer, nation
       |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
       |AND c_nationkey = n_nationkey
       |GROUP BY n_name ORDER BY n_name""".stripMargin

  val joinTopSuppliersSql: String =
    s"""WITH rev AS (SELECT n_name, s_suppkey,
       |  ${sig("sum(l_extendedprice * (1.0 - l_discount))")} AS revenue
       |  FROM lineitem, supplier, nation
       |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
       |  GROUP BY n_name, s_suppkey)
       |SELECT n_name, rnk, s_suppkey, revenue FROM (
       |  SELECT n_name, s_suppkey, revenue,
       |    CAST(row_number() OVER (PARTITION BY n_name
       |      ORDER BY revenue DESC, s_suppkey ASC) AS BIGINT) AS rnk
       |  FROM rev)
       |WHERE rnk <= 3 ORDER BY n_name, rnk""".stripMargin

  val setOpsCustomersSql: String =
    """WITH open AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
      |closed AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
      |b AS (SELECT count(*) AS n_both FROM
      |  (SELECT * FROM open INTERSECT SELECT * FROM closed)),
      |oo AS (SELECT count(*) AS n_open_only FROM
      |  (SELECT * FROM open EXCEPT SELECT * FROM closed)),
      |a AS (SELECT count(*) AS n_any FROM
      |  (SELECT DISTINCT o_custkey FROM orders
      |   WHERE o_orderstatus IN ('O', 'F')))
      |SELECT * FROM b, oo, a""".stripMargin

  /** The ccnet funnel re-derived end to end: gate via the shared
    * rule subquery over the corpus slice, KN via the parametrized
    * model CTE chain (trained on the TARGET slice, scoring the gated
    * docs), the tercile keep as the same rank arithmetic as the
    * bucket oracle, then the recursive cluster closure and the
    * shingle-overlap decontamination — every stage the SAME
    * derivation its standalone oracle uses. */
  val pipelineCcnetSql: String =
    s"""WITH RECURSIVE
       |corpus AS (SELECT doc_id, lang, text FROM documents
       |           WHERE source <> 'src0'),
       |gk AS (SELECT doc_id FROM
       |  ${TextQueries.ruleIdxSubqueryFor("corpus")}
       |  WHERE rule_idx = 5),
       |g AS (SELECT c.doc_id, c.lang, c.text FROM corpus c
       |      JOIN gk USING (doc_id)),
       |${TextQueries.knCtesFor(
        "(SELECT text FROM documents WHERE source = 'src0')", "g")},
       |lgr AS (SELECT kd.doc_id, g.lang, kd.nll FROM kd
       |        JOIN g USING (doc_id)),
       |rk AS (SELECT doc_id,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY nll, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY lang) AS n FROM lgr),
       |l AS (SELECT g.doc_id, g.text FROM g JOIN rk USING (doc_id)
       |      WHERE rn * 3 <= n * 2),
       |${shingleCteSql("sh", "l")},
       |sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
       |pr AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
       |       FROM sh a JOIN sh b
       |       ON a.shingle = b.shingle AND a.id < b.id
       |       GROUP BY a.id, b.id),
       |pairs AS MATERIALIZED (SELECT pr.id_a, pr.id_b
       |  FROM pr JOIN sz sa ON sa.id = pr.id_a
       |  JOIN sz sb ON sb.id = pr.id_b
       |  WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5),
       |und AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs
       |        UNION SELECT id_b, id_a FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM und)
       |  UNION
       |  SELECT e.a, r.b FROM und e JOIN reach r ON r.a = e.b),
       |cl AS (SELECT a AS doc_id, min(b) AS cluster_id
       |       FROM reach GROUP BY a),
       |dd AS (SELECT * FROM l WHERE doc_id NOT IN
       |       (SELECT doc_id FROM cl WHERE doc_id <> cluster_id)),
       |${shingleCteSql("tr", "dd")},
       |${shingleCteSql("ev",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')")},
       |contam AS (SELECT DISTINCT tr.id AS train_id
       |  FROM ev JOIN tr ON tr.shingle = ev.shingle
       |  GROUP BY ev.id, tr.id HAVING count(*) >= 5)
       |SELECT (SELECT count(*) FROM corpus) AS n_corpus,
       |(SELECT count(*) FROM g) AS n_gate,
       |(SELECT count(*) FROM l) AS n_lm,
       |(SELECT count(*) FROM dd) AS n_dedup,
       |(SELECT count(*) FROM dd WHERE doc_id NOT IN
       |  (SELECT train_id FROM contam)) AS n_clean""".stripMargin

  /** Shared link-graph fixture CTEs: the affine-mod edge synthesis
    * replayed from id arithmetic (list_distinct ≙ array_distinct). */
  private val linkEdgesCte: String =
    """nn0 AS (SELECT count(*) AS cnt FROM documents),
      |ed AS (SELECT doc_id AS src, unnest(list_distinct(
      |  CASE WHEN doc_id % 4 = 0 THEN
      |    [(doc_id * 7 + 1) % cnt, (doc_id * 13 + 3) % cnt,
      |     (doc_id * 29 + 7) % cnt, doc_id % 10]
      |  ELSE
      |    [(doc_id * 7 + 1) % cnt, (doc_id * 13 + 3) % cnt,
      |     (doc_id * 29 + 7) % cnt] END)) AS dst
      |  FROM documents, nn0)""".stripMargin

  /** Three power iterations replayed as chained CTEs; every float
    * literal CAST to DOUBLE (the DECIMAL-literal trap) and the
    * (1 − d) subtraction mirrored as the same IEEE op the Spark
    * side's lit(1.0 − damping) performs. Top-20 cut on the
    * sig5-ROUNDED rank with node tie-break. */
  /** The three-iteration chain (through CTE r3), shared by the
    * top-20 query and the domain-mass composition. */
  private[queries] val pageRankCtes: String = {
    def iter(k: Int): String =
      s"""r$k AS (SELECT n.node,
         |  (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n_nodes
         |    + CAST(0.85 AS DOUBLE) *
         |      coalesce(c.in_pr, CAST(0.0 AS DOUBLE)) AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT dst AS node, sum(pr / od) AS in_pr
         |    FROM e JOIN r${k - 1} ON r${k - 1}.node = e.src
         |    GROUP BY dst) c ON c.node = n.node, nn)""".stripMargin
    s"""$linkEdgesCte,
       |outdeg AS (SELECT src, count(*) AS od FROM ed GROUP BY src),
       |e AS (SELECT ed.src, ed.dst, od FROM ed
       |      JOIN outdeg USING (src)),
       |nodes AS (SELECT src AS node FROM ed
       |          UNION SELECT dst FROM ed),
       |nn AS (SELECT count(*) AS n_nodes FROM nodes),
       |r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n_nodes AS pr
       |       FROM nodes, nn),
       |${iter(1)},
       |${iter(2)},
       |${iter(3)}""".stripMargin
  }

  val graphPagerankSql: String = {
    s"""WITH $pageRankCtes
       |SELECT node, pr FROM (
       |  SELECT node, pr,
       |    row_number() OVER (ORDER BY pr DESC, node ASC) AS rn
       |  FROM (SELECT node, ${sig("pr")} AS pr FROM r3))
       |WHERE rn <= 20 ORDER BY pr DESC, node ASC""".stripMargin
  }

  /** Incremental-PageRank oracle: day-1's three cold iterations over
    * the src % 5 <> 0 subgraph, the handoff vector sig5-rounded (the
    * Spark side's [[graft.ops.GraphOps.pageRank]] output rounding),
    * then two warm iterations over the FULL graph with new nodes at
    * uniform 1/N — every CTE the same IEEE shape as the cold chain. */
  val graphPagerankIncrementalSql: String = {
    def iter(out: String, in: String, eT: String, nT: String,
        mT: String): String =
      s"""$out AS (SELECT n.node,
         |  (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / $mT.n_nodes
         |    + CAST(0.85 AS DOUBLE) *
         |      coalesce(c.in_pr, CAST(0.0 AS DOUBLE)) AS pr
         |  FROM $nT n LEFT JOIN (
         |    SELECT dst AS node, sum(pr / od) AS in_pr
         |    FROM $eT JOIN $in ON $in.node = $eT.src
         |    GROUP BY dst) c ON c.node = n.node, $mT)""".stripMargin
    s"""WITH $linkEdgesCte,
       |ed1 AS (SELECT src, dst FROM ed WHERE src % 5 <> 0),
       |od1 AS (SELECT src, count(*) AS od FROM ed1 GROUP BY src),
       |e1 AS (SELECT ed1.src, ed1.dst, od FROM ed1
       |       JOIN od1 USING (src)),
       |n1 AS (SELECT src AS node FROM ed1
       |       UNION SELECT dst FROM ed1),
       |m1 AS (SELECT count(*) AS n_nodes FROM n1),
       |d0 AS (SELECT node, CAST(1.0 AS DOUBLE) / m1.n_nodes AS pr
       |       FROM n1, m1),
       |${iter("d1", "d0", "e1", "n1", "m1")},
       |${iter("d2", "d1", "e1", "n1", "m1")},
       |${iter("d3", "d2", "e1", "n1", "m1")},
       |c1 AS (SELECT node, ${sig("pr")} AS pr FROM d3),
       |outdeg AS (SELECT src, count(*) AS od FROM ed GROUP BY src),
       |e AS (SELECT ed.src, ed.dst, od FROM ed
       |      JOIN outdeg USING (src)),
       |nodes AS (SELECT src AS node FROM ed
       |          UNION SELECT dst FROM ed),
       |nn AS (SELECT count(*) AS n_nodes FROM nodes),
       |w0 AS (SELECT n.node,
       |  coalesce(c1.pr, CAST(1.0 AS DOUBLE) / nn.n_nodes) AS pr
       |  FROM nodes n LEFT JOIN c1 ON c1.node = n.node, nn),
       |${iter("w1", "w0", "e", "nodes", "nn")},
       |${iter("w2", "w1", "e", "nodes", "nn")}
       |SELECT node, pr FROM (
       |  SELECT node, pr,
       |    row_number() OVER (ORDER BY pr DESC, node ASC) AS rn
       |  FROM (SELECT node, ${sig("pr")} AS pr FROM w2))
       |WHERE rn <= 20 ORDER BY pr DESC, node ASC""".stripMargin
  }

  /** h_k = A·a_{k−1} then a_k = Aᵀ·h_k replayed as chained CTEs;
    * all scores stay integer-valued doubles until the final L1
    * normalization, so only the last division needs sig5. */
  val graphHitsSql: String = {
    def iter(k: Int): String =
      s"""h$k AS (SELECT n.node,
         |  coalesce(s.s, CAST(0.0 AS DOUBLE)) AS hub
         |  FROM nodes n LEFT JOIN (
         |    SELECT src AS node, sum(auth) AS s
         |    FROM ed JOIN a${k - 1} ON a${k - 1}.node = ed.dst
         |    GROUP BY src) s ON s.node = n.node),
         |a$k AS (SELECT n.node,
         |  coalesce(s.s, CAST(0.0 AS DOUBLE)) AS auth
         |  FROM nodes n LEFT JOIN (
         |    SELECT dst AS node, sum(hub) AS s
         |    FROM ed JOIN h$k ON h$k.node = ed.src
         |    GROUP BY dst) s ON s.node = n.node)""".stripMargin
    s"""WITH $linkEdgesCte,
       |nodes AS (SELECT src AS node FROM ed
       |          UNION SELECT dst FROM ed),
       |a0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS auth FROM nodes),
       |${iter(1)},
       |${iter(2)},
       |sm AS (SELECT sum(auth) AS sa FROM a2),
       |sh AS (SELECT sum(hub) AS shh FROM h2)
       |SELECT node, hub, authority FROM (
       |  SELECT a2.node, ${sig("h2.hub / shh")} AS hub,
       |    ${sig("a2.auth / sa")} AS authority,
       |    row_number() OVER (ORDER BY ${sig("a2.auth / sa")} DESC,
       |      a2.node ASC) AS rn
       |  FROM a2 JOIN h2 ON h2.node = a2.node, sm, sh)
       |WHERE rn <= 20 ORDER BY authority DESC, node ASC""".stripMargin
  }

  val graphDegreeStatsSql: String =
    s"""WITH $linkEdgesCte,
       |ind AS (SELECT dst AS node, count(*) AS indeg FROM ed
       |        GROUP BY dst)
       |SELECT CAST(length(bin(indeg)) - 1 AS BIGINT) AS log2_indeg,
       |CAST(count(*) AS BIGINT) AS n_nodes,
       |CAST(sum(indeg) AS BIGINT) AS n_edges
       |FROM ind GROUP BY 1 ORDER BY 1""".stripMargin

  val pipelineFunnelSql: String = {
    val repFrac = sig("CAST(top_bi AS DOUBLE) / n_bigrams")
    s"""WITH RECURSIVE
       |corpus AS (SELECT doc_id, text FROM documents
       |           WHERE source <> 'src0'),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
       |        FROM corpus),
       |tc AS (SELECT doc_id, count(*) AS c FROM tok GROUP BY doc_id, t),
       |ts AS (SELECT doc_id, sum(c) AS n_tokens, max(c) AS top_tok
       |       FROM tc GROUP BY doc_id),
       |bg AS (SELECT doc_id, unnest(grams) AS g FROM (
       |  SELECT doc_id, list_transform(range(1, len(w)),
       |    i -> w[i] || ' ' || w[i+1]) AS grams
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus))),
       |bc AS (SELECT doc_id, count(*) AS c FROM bg GROUP BY doc_id, g),
       |bs AS (SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bi
       |       FROM bc GROUP BY doc_id),
       |q AS (SELECT ts.doc_id FROM ts LEFT JOIN bs ON bs.doc_id = ts.doc_id
       |      WHERE n_tokens BETWEEN 20 AND 1000
       |      AND (top_bi IS NULL OR $repFrac < 0.2)),
       |qd AS (SELECT c.doc_id, c.text FROM corpus c
       |       JOIN q ON q.doc_id = c.doc_id),
       |${shingleCteSql("sh", "qd")},
       |sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
       |pr AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
       |       FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
       |       GROUP BY a.id, b.id),
       |pairs AS MATERIALIZED (SELECT pr.id_a, pr.id_b
       |  FROM pr JOIN sz sa ON sa.id = pr.id_a
       |  JOIN sz sb ON sb.id = pr.id_b
       |  WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5),
       |und AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs
       |        UNION SELECT id_b, id_a FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM und)
       |  UNION
       |  SELECT e.a, r.b FROM und e JOIN reach r ON r.a = e.b),
       |cl AS (SELECT a AS doc_id, min(b) AS cluster_id
       |       FROM reach GROUP BY a),
       |dd AS (SELECT * FROM qd WHERE doc_id NOT IN
       |       (SELECT doc_id FROM cl WHERE doc_id <> cluster_id)),
       |${shingleCteSql("tr", "dd")},
       |${shingleCteSql("ev",
        "(SELECT doc_id, text FROM documents WHERE source = 'src0')")},
       |contam AS (SELECT DISTINCT tr.id AS train_id
       |  FROM ev JOIN tr ON tr.shingle = ev.shingle
       |  GROUP BY ev.id, tr.id HAVING count(*) >= 5),
       |final AS (SELECT doc_id FROM dd
       |          WHERE doc_id NOT IN (SELECT train_id FROM contam))
       |SELECT (SELECT count(*) FROM corpus) AS n_corpus,
       |(SELECT count(*) FROM q) AS n_quality,
       |(SELECT count(*) FROM dd) AS n_dedup,
       |(SELECT count(*) FROM final) AS n_clean""".stripMargin
  }

  private def entropyColSql(c: String): String =
    s"""SELECT '$c' AS col_name, CAST(n AS BIGINT) AS n,
       |CAST(nd AS BIGINT) AS n_distinct,
       |${sig("ln(n) - clc / n")} AS entropy,
       |${sig("CASE WHEN nd > 1 THEN (ln(n) - clc / n) / ln(nd) END")}
       |  AS evenness
       |FROM (SELECT sum(cnt) AS n, count(*) AS nd,
       |      sum(cnt * ln(cnt)) AS clc
       |      FROM (SELECT $c AS v, count(*) AS cnt FROM orders
       |            GROUP BY 1))""".stripMargin

  val catEntropySql: String =
    s"""SELECT * FROM (${entropyColSql("o_orderstatus")}
       |UNION ALL ${entropyColSql("o_orderpriority")})
       |ORDER BY col_name""".stripMargin

  /** One (a, b) block of [[catAssociationSql]], re-deriving
    * [[graft.ops.CatStats.association]]'s observed-cells identities:
    * χ² = n·(Σ nij²/(ri·cj) − 1), H(A) = ln n − (Σ nij·ln ri)/n
    * (valid because Σ_cells nij·ln ri = Σ_a ri·ln ri), and
    * H(A|B) = (Σ nij·ln cj − Σ nij·ln nij)/n. Marginals via window
    * sums over the contingency. */

  val numHistogramEqdepthSql: String = {
    val fracs = (1 to 9).map(i => s"0.$i").mkString("[", ", ", "]")
    val binSum = (1 to 9)
      .map(i => s"CASE WHEN v >= ${sig(s"es[$i]")} THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH e AS (SELECT quantile_cont(CAST(n_chars AS DOUBLE), $fracs)
       |           AS es FROM documents
       |           WHERE NOT isnan(CAST(n_chars AS DOUBLE))),
       |v AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
       |      WHERE n_chars IS NOT NULL
       |        AND NOT isnan(CAST(n_chars AS DOUBLE))),
       |b AS (SELECT CAST($binSum AS BIGINT) AS bin, v FROM v, e)
       |SELECT bin, count(*) AS cnt, min(v) AS lo, max(v) AS hi
       |FROM b GROUP BY 1 ORDER BY bin""".stripMargin
  }

  val catAssociationSql: String =
    s"""SELECT * FROM (
       |${assocPairSql("orders", "o_orderstatus", "o_orderpriority")}
       |UNION ALL ${assocPairSql("customer", "c_mktsegment", "c_nationkey")}
       |UNION ALL ${assocPairSql("documents", "lang", "source")})
       |ORDER BY col_a, col_b""".stripMargin

  /** int8 quantization re-derived relationally: the codes come from
    * floor(x+0.5) on doubles both engines computed with identical
    * correctly-rounded IEEE ops, so mn/mx/step/max_abs_err/n_codes
    * need NO rounding; only avg(err) (summation order) is sig5'd. */

  val numGroupedSql: String = {
    def branch(c: String): String =
      s"""SELECT l_returnflag AS grp, '$c' AS col_name,
         |count(CAST($c AS DOUBLE)) AS n,
         |CAST(count(*) - count($c) AS BIGINT) AS n_null,
         |${sig(s"avg(CAST($c AS DOUBLE))")} AS mean,
         |${sig(s"stddev_samp(CAST($c AS DOUBLE))")} AS sd,
         |min(CAST($c AS DOUBLE)) AS min_val,
         |max(CAST($c AS DOUBLE)) AS max_val
         |FROM lineitem GROUP BY l_returnflag""".stripMargin
    Seq("l_quantity", "l_extendedprice", "l_discount")
      .map(branch).mkString("", "\nUNION ALL\n",
        "\nORDER BY grp, col_name")
  }

  /** Exact heavy hitters above the n/(k+1) MG threshold (k = 2); the
    * guarantee booleans are theorems (order-free), so TRUE literals. */

  val catHeavyHittersSql: String =
    """WITH c AS (SELECT l_returnflag AS item, count(*) AS cnt
      |           FROM lineitem GROUP BY 1),
      |t AS (SELECT sum(cnt) AS n FROM c)
      |SELECT item, cnt, TRUE AS est_le_exact, TRUE AS err_bounded
      |FROM c, t WHERE cnt * 3 > n ORDER BY item""".stripMargin

  /** The two-pass exact heavy hitters collapse to a plain exact
    * GROUP BY + threshold — candidates beyond the true heavy set are
    * filtered out by the exact recount, so the sketch pass is
    * result-invisible. */

  val catHeavyExactSql: String =
    s"""WITH c AS (SELECT l_returnflag AS item, count(*) AS cnt
       |           FROM lineitem GROUP BY 1),
       |t AS (SELECT sum(cnt) AS n FROM c)
       |SELECT item, cnt, ${sig("CAST(cnt AS DOUBLE) / n")} AS share
       |FROM c, t WHERE cnt * 3 > n ORDER BY item""".stripMargin

  /** Duplicated-span report re-derived on string grams: position
    * index → df≥2 flags → gaps-and-islands runs → interval union.
    * range(a,b) is [a,b); list_slice is 1-based inclusive. */

  val corpusManifestSql: String =
    s"""WITH c AS (SELECT source, count(*) AS n_docs,
       |  sum(len(string_split(text, ' '))) AS n_tokens,
       |  sum(len(text)) AS n_chars
       |  FROM documents GROUP BY 1),
       |t AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS td FROM c)
       |SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
       |CAST(n_chars AS BIGINT) AS n_chars,
       |${sig("CAST(n_docs AS DOUBLE) / td")} AS doc_share
       |FROM c, t ORDER BY source""".stripMargin

  /** Inclusion coefficients re-derived: distinct child keys
    * left-semi'd against distinct parent keys, per candidate pair —
    * mirrors [[graft.ops.Inclusion.inclusionStats]]. */

  val tableInclusionSql: String = {
    val pairs = Seq(
      ("customer.c_nationkey->nation.n_nationkey",
        "customer", "c_nationkey", "nation", "n_nationkey"),
      ("lineitem.l_orderkey->orders.o_orderkey",
        "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem.l_partkey->part.p_partkey",
        "lineitem", "l_partkey", "part", "p_partkey"),
      ("orders.o_custkey->customer.c_custkey",
        "orders", "o_custkey", "customer", "c_custkey"),
      ("part.p_partkey->supplier.s_suppkey",
        "part", "p_partkey", "supplier", "s_suppkey"))
    pairs.map { case (label, ct, cc, pt, pc) =>
      s"""SELECT '$label' AS pair,
         |nc AS n_child_distinct, ns AS n_shared,
         |${sig("CAST(ns AS DOUBLE) / nc")} AS inclusion,
         |CAST(CASE WHEN ns = nc THEN 1 ELSE 0 END AS BIGINT) AS is_fk
         |FROM (SELECT count(*) AS nc FROM
         |  (SELECT DISTINCT $cc FROM $ct WHERE $cc IS NOT NULL)),
         |(SELECT count(*) AS ns FROM
         |  (SELECT DISTINCT $cc AS k FROM $ct WHERE $cc IS NOT NULL) c
         |  JOIN (SELECT DISTINCT $pc AS k FROM $pt
         |        WHERE $pc IS NOT NULL) p USING (k))""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY pair")
  }

  /** The [[graft.ops.Sampling.minstdHash]] twin in portable SQL:
    * two Lehmer steps in pure BIGINT arithmetic (products bounded
    * ≪ 2⁶³), pmod spelled out for negative inputs. */

  val tableInclusionSketchSql: String = {
    val k = 1024
    val pairs = Seq(
      ("customer.c_nationkey->nation.n_nationkey",
        "customer", "c_nationkey", "nation", "n_nationkey"),
      ("lineitem.l_orderkey->orders.o_orderkey",
        "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem.l_partkey->part.p_partkey",
        "lineitem", "l_partkey", "part", "p_partkey"),
      ("orders.o_custkey->customer.c_custkey",
        "orders", "o_custkey", "customer", "c_custkey"),
      ("part.p_partkey->supplier.s_suppkey",
        "part", "p_partkey", "supplier", "s_suppkey"))
    val ctes = pairs.zipWithIndex.flatMap { case ((_, ct, cc, pt, pc), i) =>
      Seq(
        s"""sa_$i AS (SELECT h FROM (SELECT DISTINCT
           |  ${minstdHashSql(cc)} AS h FROM $ct WHERE $cc IS NOT NULL)
           |  ORDER BY h LIMIT $k)""".stripMargin,
        s"""sb_$i AS (SELECT h FROM (SELECT DISTINCT
           |  ${minstdHashSql(pc)} AS h FROM $pt WHERE $pc IS NOT NULL)
           |  ORDER BY h LIMIT $k)""".stripMargin,
        s"""m_$i AS (SELECT h FROM (SELECT h FROM sa_$i
           |  UNION SELECT h FROM sb_$i) ORDER BY h LIMIT $k)""".stripMargin,
        s"""sk_$i AS (SELECT count(a.h) AS child_in,
           |  count(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
           |        THEN 1 END) AS shared_in
           |  FROM m_$i LEFT JOIN sa_$i a ON m_$i.h = a.h
           |  LEFT JOIN sb_$i b ON m_$i.h = b.h)""".stripMargin,
        s"""ex_$i AS (SELECT
           |  (SELECT count(*) FROM (SELECT DISTINCT $cc FROM $ct
           |   WHERE $cc IS NOT NULL)) AS nc,
           |  (SELECT count(*) FROM
           |   (SELECT DISTINCT $cc AS k FROM $ct WHERE $cc IS NOT NULL) c
           |   JOIN (SELECT DISTINCT $pc AS k FROM $pt
           |         WHERE $pc IS NOT NULL) p USING (k)) AS ns)""".stripMargin)
    }
    val selects = pairs.zipWithIndex.map { case ((label, _, _, _, _), i) =>
      s"""SELECT pair, n_child_distinct, inclusion, inclusion_est,
         |  abs_err, CAST(CASE WHEN abs_err <= 0.05 THEN 1 ELSE 0 END
         |    AS BIGINT) AS within_bound
         |FROM (SELECT pair, n_child_distinct, inclusion, inclusion_est,
         |  ${sig("abs(inclusion - inclusion_est)")} AS abs_err
         |  FROM (SELECT '$label' AS pair, nc AS n_child_distinct,
         |    ${sig("CAST(ns AS DOUBLE) / nc")} AS inclusion,
         |    ${sig("CASE WHEN child_in > 0 THEN CAST(shared_in AS DOUBLE) / child_in END")}
         |      AS inclusion_est
         |    FROM ex_$i, sk_$i))""".stripMargin
    }
    s"WITH ${ctes.mkString(",\n")}\n${selects.mkString("", "\nUNION ALL\n", "\nORDER BY pair")}"
  }

  /** FD/key claims re-derived; row(...) constructors mirror Spark's
    * struct() distinct semantics (NULL fields stay row-valued). */

  val colFdKeysSql: String =
    """SELECT lhs, rhs, n_lhs, n_lhs_rhs,
      |n_lhs_rhs - n_lhs AS n_violations, n_lhs_rhs = n_lhs AS holds
      |FROM (
      |  SELECT 'o_orderkey' AS lhs, '*' AS rhs,
      |    count(DISTINCT row(o_orderkey)) AS n_lhs,
      |    count(DISTINCT row(o_orderkey, o_custkey, o_orderstatus,
      |      o_totalprice, o_orderdate, o_orderpriority)) AS n_lhs_rhs
      |  FROM orders
      |  UNION ALL
      |  SELECT 'o_orderkey', 'o_custkey',
      |    count(DISTINCT row(o_orderkey)),
      |    count(DISTINCT row(o_orderkey, o_custkey)) FROM orders
      |  UNION ALL
      |  SELECT 'o_custkey', 'o_orderstatus',
      |    count(DISTINCT row(o_custkey)),
      |    count(DISTINCT row(o_custkey, o_orderstatus)) FROM orders)
      |ORDER BY lhs, rhs""".stripMargin

  /** Duplicate rows re-derived via DISTINCT *. */
  val tableDuplicatesSql: String =
    """SELECT count(*) AS n_rows,
      |(SELECT count(*) FROM (SELECT DISTINCT * FROM lineitem))
      |  AS n_distinct_rows,
      |count(*) - (SELECT count(*) FROM (SELECT DISTINCT * FROM
      |  lineitem)) AS n_duplicate_rows
      |FROM lineitem""".stripMargin

  /** Mergeable-distinct gate: exact count + both error-envelope
    * theorems as TRUE literals (5% at default lgK=12 is ~3σ of the
    * ~1.6% RSE — far beyond observed deviation). */

  val colDistinctMergeableSql: String =
    """SELECT count(DISTINCT doc_id) AS exact,
      |TRUE AS merged_err_bounded, TRUE AS global_err_bounded
      |FROM documents""".stripMargin

  /** Quantile drift re-derived: DuckDB quantile_cont per slice via
    * conditional inputs, indexed unnest over the quantile list. */

  /** The PLAIN join — salting must be result-invisible. */
  val joinSaltedSql: String =
    s"""SELECT c_nationkey, count(*) AS n_orders,
       |${sig("sum(o_totalprice)")} AS revenue
       |FROM orders JOIN customer ON c_custkey = o_custkey
       |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** Portable CM bucket: the engine's 60-bit md5 key mod w — the
    * identical integer arithmetic on both engines. */
  private def cmBucketSql(v: String, i: String, w: Int): String =
    s"CAST(('0x'||substr(md5($v || '|' || $i), 1, 15)) AS BIGINT) % $w"

  /** The whole sketch replayed value-level: DuckDB rebuilds the
    * identical counter matrix (integer arithmetic only), so the
    * estimates — and both verdict booleans — land exactly. */
  val catCountminErrSql: String = {
    val eps = "CAST(2.718281828459045 AS DOUBLE) / " +
      "CAST(256.0 AS DOUBLE)"
    s"""WITH vc AS (SELECT CAST(l_partkey AS VARCHAR) AS v,
       |  count(*) AS c FROM lineitem GROUP BY 1),
       |r AS (SELECT v, c, i, ${cmBucketSql("v", "i", 256)} AS b
       |      FROM vc, range(0, 4) t(i)),
       |m AS (SELECT i, b, sum(c) AS mc FROM r GROUP BY i, b),
       |nn AS (SELECT sum(c) AS n FROM vc),
       |e AS (SELECT v, max(c) AS tru, min(mc) AS est
       |      FROM r JOIN m USING (i, b) GROUP BY v)
       |SELECT value, true_count, cm_count, overestimate, lower_ok,
       |  within_eps FROM (
       |  SELECT v AS value, CAST(tru AS BIGINT) AS true_count,
       |    CAST(est AS BIGINT) AS cm_count,
       |    CAST(est - tru AS BIGINT) AS overestimate,
       |    est >= tru AS lower_ok,
       |    CAST(est - tru AS DOUBLE) <= $eps * CAST(n AS DOUBLE)
       |      AS within_eps,
       |    row_number() OVER (ORDER BY tru DESC, v ASC) AS rn
       |  FROM e, nn)
       |WHERE rn <= 20 ORDER BY true_count DESC, value ASC""".stripMargin
  }

  val catCountminMergeableSql: String =
    s"""WITH vcs AS (SELECT l_returnflag AS shard,
       |  CAST(l_partkey AS VARCHAR) AS v, count(*) AS c
       |  FROM lineitem GROUP BY 1, 2),
       |ss AS (SELECT shard, i, ${cmBucketSql("v", "i", 256)} AS b,
       |  sum(c) AS mc FROM vcs, range(0, 4) t(i) GROUP BY 1, 2, 3),
       |mg AS (SELECT i, b, sum(mc) AS mcm FROM ss GROUP BY 1, 2),
       |vc AS (SELECT CAST(l_partkey AS VARCHAR) AS v, count(*) AS c
       |       FROM lineitem GROUP BY 1),
       |mw AS (SELECT i, ${cmBucketSql("v", "i", 256)} AS b,
       |  sum(c) AS mcw FROM vc, range(0, 4) t(i) GROUP BY 1, 2)
       |SELECT CAST(i AS BIGINT) AS i, CAST(b AS BIGINT) AS b,
       |CAST(coalesce(mcw, 0) AS BIGINT) AS mc_whole,
       |CAST(coalesce(mcm, 0) AS BIGINT) AS mc_merged,
       |coalesce(mcw, 0) = coalesce(mcm, 0) AS equal
       |FROM mw FULL JOIN mg USING (i, b) ORDER BY i, b""".stripMargin

  /** The model-gated funnel replayed: the full LR training chain on
    * the corpus slice, the tau keep, then the funnel oracle's own
    * dedup-keep and decontamination fragments. */
  val pipelineCurateSql: String =
    s"""WITH RECURSIVE ${ClassifierQueries.scoredCteOn(
          "(SELECT doc_id, text FROM documents WHERE source <> 'src0')",
          "lr_")},
       |corpus AS (SELECT doc_id, text FROM documents
       |           WHERE source <> 'src0'),
       |q AS (SELECT doc_id FROM lr_p WHERE prob >= 0.5),
       |qd AS (SELECT c.doc_id, c.text FROM corpus c
       |       JOIN q USING (doc_id)),
       |${shingleCteSql("sh", "qd")},
       |sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
       |pr AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
       |       FROM sh a JOIN sh b ON a.shingle = b.shingle
       |       AND a.id < b.id GROUP BY a.id, b.id),
       |pairs AS MATERIALIZED (SELECT pr.id_a, pr.id_b
       |  FROM pr JOIN sz sa ON sa.id = pr.id_a
       |  JOIN sz sb ON sb.id = pr.id_b
       |  WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5),
       |und AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs
       |        UNION SELECT id_b, id_a FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM und)
       |  UNION
       |  SELECT e.a, r.b FROM und e JOIN reach r ON r.a = e.b),
       |cl AS (SELECT a AS doc_id, min(b) AS cluster_id
       |       FROM reach GROUP BY a),
       |dd AS (SELECT * FROM qd WHERE doc_id NOT IN
       |       (SELECT doc_id FROM cl WHERE doc_id <> cluster_id)),
       |${shingleCteSql("tr", "dd")},
       |${shingleCteSql("ev",
          "(SELECT doc_id, text FROM documents WHERE source = 'src0')")},
       |contam AS (SELECT DISTINCT tr.id AS train_id
       |  FROM ev JOIN tr ON tr.shingle = ev.shingle
       |  GROUP BY ev.id, tr.id HAVING count(*) >= 5),
       |final AS (SELECT doc_id FROM dd
       |          WHERE doc_id NOT IN (SELECT train_id FROM contam))
       |SELECT (SELECT count(*) FROM corpus) AS n_corpus,
       |(SELECT count(*) FROM q) AS n_model,
       |(SELECT count(*) FROM dd) AS n_dedup,
       |(SELECT count(*) FROM final) AS n_clean""".stripMargin

  val oracle: Map[String, String] = Map(
    "pipeline_curate" -> pipelineCurateSql,
    "cat_countmin_err" -> catCountminErrSql,
    "cat_countmin_mergeable" -> catCountminMergeableSql,
    "col_distinct_mergeable" -> colDistinctMergeableSql,
    "col_fd_keys" -> colFdKeysSql,
    "table_inclusion" -> tableInclusionSql,
    "table_inclusion_sketch" -> tableInclusionSketchSql,
    "corpus_manifest" -> corpusManifestSql,
    "table_duplicates" -> tableDuplicatesSql,
    "corpus_shards" -> corpusShardsSql,
    "join_salted" -> joinSaltedSql,
    "num_grouped" -> numGroupedSql,
    "cat_heavy_hitters" -> catHeavyHittersSql,
    "cat_heavy_exact" -> catHeavyExactSql,
    "cat_entropy" -> catEntropySql,
    "cat_association" -> catAssociationSql,
    "num_histogram_eqdepth" -> numHistogramEqdepthSql,
    "pipeline_funnel" -> pipelineFunnelSql,
    "pipeline_funnel_banded" -> pipelineFunnelSql,
    "pipeline_funnel_routed" -> pipelineFunnelSql,
    "pipeline_curate_banded" -> pipelineCurateSql,
    "pipeline_curate_routed" -> pipelineCurateSql,
    "pipeline_ccnet" -> pipelineCcnetSql,
    "graph_pagerank" -> graphPagerankSql,
    "graph_pagerank_incremental" -> graphPagerankIncrementalSql,
    "graph_degree_stats" -> graphDegreeStatsSql,
    "graph_hits" -> graphHitsSql,
    "join_asof" -> joinAsofSql,
    "join_range" -> joinRangeSql,
    "corpus_composition" -> corpusCompositionSql,
    "corpus_saturation" -> corpusSaturationSql,
    "col_fd_discover" -> colFdDiscoverSql,
    "table_diff" -> tableDiffSql,
    "array_profile" -> arrayProfileSql,
    "join_revenue_nation" -> joinRevenueNationSql,
    "join_top_suppliers" -> joinTopSuppliersSql,
    "set_ops_customers" -> setOpsCustomersSql
  )
}
