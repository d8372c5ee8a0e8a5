package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.det.Sig.sig5

/** Scalar int8 quantization of an embedding column — the standard
  * 4× storage/bandwidth compression for vector search at corpus
  * scale (each float32 dimension mapped to an unsigned 8-bit code
  * against per-dimension min/max bounds).
  *
  * Scale shape: pass 1 computes the 2·dim bound scalars by exploded
  * aggregation (map-side combine; shuffle volume = partitions × dim,
  * independent of row count); pass 2 is a map-only encode against the
  * broadcast bounds. Reconstruction-error stats prove the codec's
  * quality contract (max abs error ≤ half a quantization step).
  *
  * Determinism contract: the code is floor(x + 0.5) on a double both
  * engines computed from IDENTICAL inputs with correctly-rounded
  * IEEE ops (min, max, subtraction, division) — floor is exact, so
  * codes are bit-identical across engines with NO rounding guard;
  * only the error AGGREGATES (different summation order) go through
  * sig5. */
object VectorQuant {

  /** Per-dimension quantization report over `vecCol`
    * (array<float>, 1-based dim index): bounds, the quantization
    * step, mean/max absolute reconstruction error, and the count of
    * distinct codes used — one row per dimension. */
  def quantizeStats(df: DataFrame, vecCol: String, dim: Int)
      : DataFrame = {
    val el = df.where(size(col(vecCol)) === dim)
      .select(posexplode(col(vecCol)).as(Seq("p", "vf")))
      .select((col("p") + 1).cast("long").as("i"),
        col("vf").cast("double").as("v"))
    val bounds = el.groupBy("i")
      .agg(min("v").as("mn"), max("v").as("mx"))
      .withColumn("step", (col("mx") - col("mn")) / 255.0)
    val coded = el.join(broadcast(bounds), Seq("i"))
      .withColumn("q",
        when(col("step") > 0.0,
          least(greatest(
            floor((col("v") - col("mn")) / col("step") + 0.5), lit(0.0)),
            lit(255.0)).cast("long"))
          .otherwise(0L))
      .withColumn("err",
        abs(col("v") - (col("mn") + col("q") * col("step"))))
    // mn/mx/step are constant within a dimension group (first is
    // deterministic); max(err) compares identical doubles so it needs
    // no rounding — only avg(err) sums in engine-specific order
    coded.groupBy("i")
      .agg(first("mn").as("mn"), first("mx").as("mx"),
        first("step").as("step"),
        sig5(avg("err")).as("avg_abs_err"),
        max("err").as("max_abs_err"),
        countDistinct(col("q")).as("n_codes"))
      .orderBy("i")
  }

  /** A per-subspace PQ codebook: for subspace s, the (cid,
    * sub-vector) entries sorted by cid. cid is the SEED row id the
    * centroid descends from (codes = cid − seedLo), so identities —
    * and the argmin tie-break — survive training unchanged. */
  private[ops] type PqCodebook = Array[Array[(Long, Array[Double])]]

  /** Train the per-subspace PQ codebooks: initialization is the
    * designated corpus rows with id in [seedLo, seedHi) sliced per
    * subspace (k = seedHi − seedLo sub-centroids, no RNG), then
    * `iters − 1` Lloyd reassign→recompute rounds run INDEPENDENTLY in
    * every subspace — the actual PQ training loop (Jégou et al.,
    * TPAMI 2011 §II: k-means per subquantizer), not just seed
    * slicing. iters = 1 is exactly the seeded codebook.
    *
    * Scale shape per iteration: ONE map-only assignment pass (m
    * argmins per row over the broadcast codebook — O(m·k·dsub)
    * FLOPs/row, no shuffle, no row expansion), one bounded
    * recompute aggregation (shuffle volume m·k·dsub × partitions,
    * independent of row count) and an O(m·k·dsub) driver collect —
    * the [[KMeansOp.kmeansStats]] structure per subspace. At corpus
    * scale you train on a bounded sample (codebooks converge on
    * ~10⁵–10⁶ vectors; Jégou §V trains on a learning subset) and
    * encode the full corpus with the frozen codebook — training cost
    * is amortized index-build work either way. The assignment frame
    * is materialized before the recompute explode (the computed-array
    * Generate trap, round-7 lesson).
    *
    * Determinism contract: assignment argmins rank sig5-ROUNDED
    * |c_s|² − 2·x_s·c_s scores (the per-row-constant |x_s|² dropped,
    * the [[KMeansOp.assignCells]] form) with cid tie-break; centroid
    * recomputation is a plain per-(subspace, cid, dim) average. The
    * oracle re-derives the same rounds relationally (the
    * embed_kmeans unrolling), so the whole trained codebook is a
    * closed-form function of the data. Sub-clusters left empty by a
    * round drop out identically in both engines. */
  private[ops] def pqCodebook(base: DataFrame, seedLo: Long,
      seedHi: Long, dim: Int, m: Int, iters: Int): PqCodebook = {
    require(iters >= 1, "iters must be >= 1")
    import graft.functions.ArrayDot.array_dot
    val dsub = dim / m
    val seeds = KMeansOp.seedCentroids(base, seedLo, seedHi)
    var cbs: PqCodebook = Array.tabulate(m)(s =>
      seeds.map { case (cid, cv) =>
        (cid, cv.slice(s * dsub, (s + 1) * dsub)) })
    for (_ <- 1 until iters) {
      val sliced = base.select(
        col("vid") +: (0 until m).map(s =>
          slice(col("v"), s * dsub + 1, dsub).cast("array<double>")
            .as(s"x$s")): _*)
      // native PqArgMin: one k·dsub loop per (row, subspace) instead
      // of k struct expressions (measured 894 s → tight-loop at
      // k=256 over 2M vectors; see the expression's scaladoc)
      val withBest = sliced.select(
        col("vid") +: (0 until m).flatMap { s =>
          Seq(col(s"x$s"),
            graft.functions.PqArgMin.pq_argmin(col(s"x$s"), cbs(s),
              includeNorm = false).getField("cid").as(s"c$s"))
        }: _*)
      val assigned = Materialize.materialize(withBest)
      val rows = assigned
        .select(explode(array((0 until m).map(s =>
            struct(lit(s).as("s"), col(s"c$s").as("cid"),
              col(s"x$s").as("x"))): _*)).as("e"))
        .select(col("e.s").as("s"), col("e.cid").as("cid"),
          posexplode(col("e.x")).as(Seq("p", "xv")))
        .groupBy("s", "cid", "p")
        .agg(avg("xv").as("w"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
          r.getDouble(3)))
      cbs = Array.tabulate(m) { s =>
        rows.filter(_._1 == s)
          .groupBy(_._2).map { case (cid, vs) =>
            val arr = new Array[Double](dsub)
            vs.foreach { case (_, _, p, w) => arr(p) = w }
            (cid, arr)
          }.toArray.sortBy(_._1)
      }
    }
    cbs
  }

  /** Product quantization (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011): the vector is cut into
    * `m` subspaces and each slice is coded as the id of its nearest
    * sub-centroid — dim floats become m small codes (8 bytes
    * here vs 256 for a 64-dim float32 vector), the codebook layout
    * IVF-PQ indexes build on. Codebooks initialize from the
    * designated corpus rows with id in [seedLo, seedHi) sliced per
    * subspace (no RNG, same seeding contract as [[KMeansOp]] / IVF)
    * and are Lloyd-TRAINED for `iters − 1` rounds ([[pqCodebook]]),
    * so the whole computation is a closed-form function of the data.
    *
    * Scale shape: the codebook is O(k·dim) driver state; encoding is
    * a MAP-ONLY pass — per row, m independent argmins over k inline
    * squared-distance expressions (no shuffle, no row expansion).
    * Emits (vec_id, codes, mse) with mse the per-dimension mean
    * squared reconstruction-proxy error (mean of the winning
    * sub-distances over dim).
    *
    * Determinism contract: each argmin ranks sig5-ROUNDED sub-
    * distances with centroid-id tie-break; mse sums the rounded
    * winners (the [[KMeansOp]] wcss pattern). */
  def pqCodes(df: DataFrame, idCol: String, vecCol: String,
      seedLo: Long, seedHi: Long, dim: Int = 64, m: Int = 8,
      iters: Int = 1): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim $dim must divide into $m")
    val base = KMeansOp.vecBase(df, idCol, vecCol, dim)
    pqEncode(base, pqCodebook(base, seedLo, seedHi, dim, m, iters),
      seedLo, dim, m)
  }

  /** The map-only encode pass against a trained codebook — the
    * shared tail of [[pqCodes]] / [[pqAdcTopK]] / [[ivfPqTopK]] (one
    * training, one encode; no double codebook derivation).
    *
    * Expression economy matters here (measured r6): an unrolled
    * per-dimension (v[i]−c[i])² form is m·k·dsub element_at nodes,
    * and with the argmin array duplicated per extracted field the
    * serialized plan reached >200 MB task binaries and 227 s for
    * 2000 rows — pure codegen/planning cost. The assignCells form —
    * native array_dot over a per-subspace slice with the
    * |c|²−2·x·c+|x|² expansion, slices and norms projected ONCE,
    * best-struct extracted ONCE per subspace — keeps the plan
    * O(m·k) small nodes. */
  private[ops] def pqEncode(base: DataFrame, cbs: PqCodebook,
      seedLo: Long, dim: Int, m: Int): DataFrame = {
    val dsub = dim / m
    val sliced = base.select(
      col("vid") +: (0 until m).flatMap { s =>
        val x = slice(col("v"), s * dsub + 1, dsub)
        Seq(x.as(s"x$s"))
      }: _*)
    // native PqArgMin (includeNorm: score is the full rounded squared
    // distance (|c|² − 2·x·c) + |x|², the mse the report sums) — one
    // k·dsub loop per (row, subspace); the former k-struct
    // array_sort form allocated k structs per cell and was the whole
    // cost of the trained-codebook smoke at k=256
    val withBest = sliced.select(
      col("vid") +: (0 until m).map { s =>
        graft.functions.PqArgMin.pq_argmin(col(s"x$s"), cbs(s),
          includeNorm = true).as(s"b$s")
      }: _*)
    withBest.select(col("vid").as("vec_id"),
        array((0 until m).map(s =>
          col(s"b$s").getField("cid") - lit(seedLo)): _*).as("codes"),
        sig5((0 until m).map(s => col(s"b$s").getField("score"))
          .reduce(_ + _) / dim.toDouble).as("mse"))
      .orderBy("vec_id")
  }

  /** PQ asymmetric-distance (ADC) top-k search (Jégou et al., TPAMI
    * 2011 §IV-A): queries keep their exact vectors, the corpus is
    * represented ONLY by its PQ codes, and the approximate distance
    * is the sum of per-subspace lookup-table entries
    * d(q, x) ≈ Σ_s ‖q_s − c_{s, code_s(x)}‖² — the search mode PQ
    * exists for (the codes are 8 bytes/vector; the scan never touches
    * raw corpus floats).
    *
    * Scale shape: the per-query LUTs are O(Q·m·k) DRIVER state
    * (computed once from the collected query slices and the seeded
    * codebook, shipped as plan literals — exactly how an IVF-PQ
    * scanner holds them in registers); scoring is a MAP-ONLY pass
    * over the (materialized) codes frame — per row, m array lookups
    * per query, no shuffle, no join, no raw-vector access. The
    * ranking tail is the same bounded [[graft.functions.TopKByScore]]
    * heap as the similarity family (window-free; distances rank
    * ascending via score negation AFTER sig5 rounding, vid
    * tie-break).
    *
    * Determinism contract: LUT entries are raw doubles on both
    * engines (identical operands, IEEE ops); only the SUMMED distance
    * is sig5-rounded, and ranking compares the rounded values. */
  def pqAdcTopK(df: DataFrame, idCol: String, vecCol: String,
      seedLo: Long, seedHi: Long, numQueries: Int = 5, k: Int = 10,
      dim: Int = 64, m: Int = 8, iters: Int = 1): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim $dim must divide into $m")
    val dsub = dim / m
    val base = KMeansOp.vecBase(df, idCol, vecCol, dim)
    val cbs = pqCodebook(base, seedLo, seedHi, dim, m, iters)
    // LUT slot = the CODE value (cid − seedLo), not the centroid's
    // sort position: with a gap in the seed id range (or a
    // sub-cluster emptied by training) the two diverge and every
    // later code would read a shifted LUT row. Absent codes can
    // never be emitted by the encode, so their slots hold NaN.
    val ksz = (seedHi - seedLo).toInt
    val centByCode: Array[Map[Int, Array[Double]]] =
      cbs.map(_.map { case (cid, cv) =>
        ((cid - seedLo).toInt, cv) }.toMap)
    // query vectors: O(Q·dim) driver state, same collection contract
    // as the codebook itself
    val queries = base.where(col("vid") < numQueries)
      .select(col("vid"), col("v").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(queries.nonEmpty, s"no query rows with id < $numQueries")
    val qids = queries.map(_._1)
    // flat per-query LUT: lut(s·k + c) = ‖q_s − c_{s,c}‖²
    val luts = queries.map { case (_, qv) =>
      Array.tabulate(m * ksz) { i =>
        val (s, c) = (i / ksz, i % ksz)
        centByCode(s).get(c) match {
          case None => Double.NaN // unreachable code slot
          case Some(cv) =>
            var d2 = 0.0
            var d = 0
            while (d < dsub) {
              val t = qv(s * dsub + d) - cv(d); d2 += t * t; d += 1
            }
            d2
        }
      }
    }
    val codes = Materialize.materialize(
      pqEncode(base, cbs, seedLo, dim, m))
    // one pass over the codes: every query's ADC sum from its LUT
    val distExprs = luts.map { lut =>
      (0 until m).map { s =>
        element_at(typedLit(lut),
          (col("codes").getItem(s) + lit(s * ksz) + 1).cast("int"))
      }.reduce(_ + _)
    }
    val scored = codes
      .select(col("vec_id").as("vid"),
        posexplode(array(distExprs: _*)).as(Seq("qp", "dist")))
      .select(
        element_at(typedLit(qids), col("qp").cast("int") + 1).as("qid"),
        col("vid"), (-sig5(col("dist"))).as("cosine"))
      .where(col("vid") =!= col("qid"))
    Similarity.rankTopK(scored, k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        (-col("cosine")).as("adc_d2"))
  }

  /** IVF-PQ top-k: the canonical billion-scale ANN index shape —
    * coarse Voronoi cells prune the corpus to the `nprobe` cells
    * nearest each query, then the survivors are scored by PQ
    * asymmetric distance against their codes ONLY (no raw corpus
    * floats in the scan). Composes [[graft.ops.Similarity]]'s
    * map-only cell assignment (IVF codebook = corpus rows
    * [ivfLo, ivfHi)) with [[pqAdcTopK]]'s LUT scoring (PQ codebook =
    * corpus rows [pqLo, pqHi)); both codebooks and the per-query
    * LUTs are driver/broadcast state.
    *
    * Scale shape: one map-only assignment pass, one map-only encode
    * pass (both amortizable index builds), then a broadcast
    * candidate join (probes are O(Q·nprobe)) and a key-key join to
    * the codes — never a corpus×corpus pair, never raw vectors in
    * the scoring loop; the all-queries LUT is ONE flat plan literal
    * indexed by (query, subspace, code), so the scorer is a single
    * expression for every candidate row. Ranking: the same
    * window-free TopKByScore tail, ascending rounded distance, vid
    * tie-break. */
  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String,
      ivfLo: Long, ivfHi: Long, pqLo: Long, pqHi: Long,
      numQueries: Int = 5, k: Int = 10, nprobe: Int = 4,
      dim: Int = 64, m: Int = 8, iters: Int = 1,
      coarseIters: Int = 1): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim $dim must divide into $m")
    val dsub = dim / m
    val base = KMeansOp.vecBase(df, idCol, vecCol, dim)
    val ivfCents =
      if (coarseIters <= 1)
        Similarity.seedCodebook(base, "vid", "v", ivfLo, ivfHi)
      else Similarity.trainedCodebook(base, "vid", "v", ivfLo, ivfHi,
        dim, coarseIters)
    val cbs = pqCodebook(base, pqLo, pqHi, dim, m, iters)
    val ksz = (pqHi - pqLo).toInt
    val centByCode: Array[Map[Int, Array[Double]]] =
      cbs.map(_.map { case (cid, cv) =>
        ((cid - pqLo).toInt, cv) }.toMap)
    val queries = base.where(col("vid") < numQueries)
      .select(col("vid"), col("v").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(queries.nonEmpty, s"no query rows with id < $numQueries")
    val qids = queries.map(_._1)
    // ONE flat LUT for all queries: slot = qidx·m·k + s·k + code
    val flatLut = queries.flatMap { case (_, qv) =>
      Array.tabulate(m * ksz) { i =>
        val (s, c) = (i / ksz, i % ksz)
        centByCode(s).get(c) match {
          case None => Double.NaN
          case Some(cv) =>
            var d2 = 0.0
            var d = 0
            while (d < dsub) {
              val t = qv(s * dsub + d) - cv(d); d2 += t * t; d += 1
            }
            d2
        }
      }
    }
    // coarse quantizer: cells computed once per row, probes from the
    // tiny query side (the ivfTopK plan, minus exact rescoring)
    val withCells = base.select(col("vid"),
      Similarity.cellArray(col("v"), ivfCents).as("cells"))
    val assigned = withCells.select(col("vid"),
      element_at(col("cells"), 1).getField("cid").as("cell"))
    val probes = withCells.where(col("vid") < numQueries)
      .select(col("vid").as("qid"),
        explode(slice(col("cells"), 1, nprobe)).as("p"))
      .select(col("qid"), col("p.cid").as("pcell"))
    val codes = Materialize.materialize(
      pqEncode(base, cbs, pqLo, dim, m))
    val cand = assigned.join(broadcast(probes),
        col("vid") =!= col("qid") && col("cell") === col("pcell"))
      .select(col("qid"), col("vid"))
    val qidx = array_position(typedLit(qids), col("qid")) - 1L
    val dist = (0 until m).map { s =>
      element_at(typedLit(flatLut),
        (qidx * (m * ksz) + col("codes").getItem(s) + lit(s * ksz) + 1)
          .cast("int"))
    }.reduce(_ + _)
    val scored = cand
      .join(codes.withColumnRenamed("vec_id", "vid"), "vid")
      .select(col("qid"), col("vid"), (-sig5(dist)).as("cosine"))
    Similarity.rankTopK(scored, k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        (-col("cosine")).as("adc_d2"))
  }

  /** RESIDUAL IVF-PQ top-k — the full Jégou IVF-ADC shape (TPAMI
    * 2011 §IV-B): the PQ codebook is trained on and encodes the
    * RESIDUAL r = x − q₁(x) of each vector against its coarse
    * centroid, not the raw vector. Residual magnitudes are a fraction
    * of vector magnitudes once the coarse quantizer has absorbed the
    * cluster structure, so the same code budget buys materially finer
    * resolution — this is the refinement step that separates a
    * deployed IVF-ADC index from naive per-cell PQ (see
    * [[ivfPqTopK]], kept as the comparison baseline).
    *
    * Query side: ADC needs one lookup table PER (query, probed cell)
    * — the query's residual against THAT cell's centroid scored
    * against the shared residual codebook — so LUT state is
    * O(Q·nprobe·m·k) driver literals (vs O(Q·m·k) for raw ADC), still
    * register-resident by design; every candidate is scored through
    * the LUT of the one cell it lives in.
    *
    * Scale shape: one map-only assignment pass, one map-only
    * residualization (`zip_with` against the broadcast centroid map —
    * exact IEEE subtraction, no shuffle), the [[pqCodebook]] training
    * loop over residuals, one map-only encode, then the identical
    * broadcast candidate join + flat-LUT scoring + window-free
    * [[graft.functions.TopKByScore]] tail as [[ivfPqTopK]]. Probes
    * are collected once (O(Q·nprobe) rows — driver state like the
    * queries themselves).
    *
    * Determinism contract: with the SEEDED coarse quantizer
    * (coarseIters = 1) residuals are exact differences of
    * identically-derived doubles — bit-identical across engines with
    * no rounding guard. With a TRAINED coarse quantizer
    * (coarseIters ≥ 2, the declared-query form — the deployed
    * IVF-ADC index trains its coarse cells too) each centroid
    * component is a Lloyd AVERAGE whose last ulp differs between
    * engines (summation order), so both engines residualize against
    * the CANONICAL sig5-ROUNDED components: r = x − sig5(c). The
    * subtraction of identically-valued doubles is again exact, so
    * residuals stay bit-identical and everything downstream keeps
    * the [[ivfPqTopK]] contract (all discrete decisions — cell
    * argmin, probe cutoff, training/encode argmins, final ranking —
    * compare sig5-rounded scores with id tie-breaks). Cell
    * ASSIGNMENT still ranks against the unrounded centroids (its
    * scores are sig5-rounded anyway); only the residual subtraction
    * reads the rounded canon. */
  /** Two-stage search — ADC shortlist, exact re-rank: the deployed
    * refinement that undoes PQ's quantization loss for the price of
    * `topM` exact distances per query (M ≪ corpus; the shortlist is
    * [[ivfPqTopK]]'s output verbatim, so index geometry, training
    * and probing are shared, not re-implemented). A lossy ADC
    * ordering only has to be right about WHICH M vectors matter;
    * the exact cosine then fixes their order — the standard
    * production answer to "PQ recall is fine but the top-1 is
    * wrong".
    *
    * Scale shape: stage 1 is the ivfPqTopK plan; stage 2 joins the
    * Q·M shortlist (tiny, broadcast) back to the corpus vectors by
    * id — M exact 64-dim dots per query, then the window-free
    * bounded-heap rank. */
  def ivfPqRerankTopK(df: DataFrame, idCol: String, vecCol: String,
      ivfLo: Long, ivfHi: Long, pqLo: Long, pqHi: Long,
      numQueries: Int = 5, k: Int = 10, topM: Int = 25,
      nprobe: Int = 4, dim: Int = 64, m: Int = 8, iters: Int = 1,
      coarseIters: Int = 1): DataFrame = {
    require(topM >= k, s"shortlist $topM must cover k=$k")
    val shortlist = ivfPqTopK(df, idCol, vecCol, ivfLo, ivfHi, pqLo,
      pqHi, numQueries, topM, nprobe, dim, m, iters, coarseIters)
      .select(col("query_id").as("qid"), col("neighbor_id").as("vid"))
    val base = KMeansOp.vecBase(df, idCol, vecCol, dim)
      .select(col("vid"), col("v"),
        Similarity.norm(col("v")).as("nrm"))
    val scored = base
      .join(broadcast(shortlist), Seq("vid"))
      .join(broadcast(base
        .select(col("vid").as("qid"), col("v").as("qv"),
          col("nrm").as("qnrm"))
        .where(col("qid") < numQueries)), Seq("qid"))
      .select(col("qid"), col("vid"),
        graft.det.Sig.sig5(Similarity.cosine(
          Similarity.dot(col("qv"), col("v")), col("qnrm"), col("nrm")))
          .as("cosine"))
      .where(col("cosine").isNotNull)
    Similarity.rankTopK(scored, k)
  }

  def ivfPqResidualTopK(df: DataFrame, idCol: String, vecCol: String,
      ivfLo: Long, ivfHi: Long, pqLo: Long, pqHi: Long,
      numQueries: Int = 5, k: Int = 10, nprobe: Int = 4,
      dim: Int = 64, m: Int = 8, iters: Int = 1,
      coarseIters: Int = 1): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim $dim must divide into $m")
    val dsub = dim / m
    val base = KMeansOp.vecBase(df, idCol, vecCol, dim)
    val ivfCents =
      if (coarseIters <= 1)
        Similarity.seedCodebook(base, "vid", "v", ivfLo, ivfHi)
      else Similarity.trainedCodebook(base, "vid", "v", ivfLo, ivfHi,
        dim, coarseIters)
    // the canonical components residualization subtracts: raw seed
    // rows as-is (exact data), trained averages sig5-rounded (see
    // the determinism contract above)
    val resCents =
      if (coarseIters <= 1) ivfCents
      else ivfCents.map { case (cid, cv, n2) =>
        (cid, cv.map(graft.det.Sig.sig5(_: Double)), n2) }
    val withCells = base.select(col("vid"), col("v"),
      Similarity.cellArray(col("v"), ivfCents).as("cells"))
    // materialized: the O(N·C) cellArray argmin would otherwise
    // re-execute for the training collect, the encode, and the cand
    // join (the round-7 materialize-before-reuse lesson; codes alone
    // was not enough — ADVICE r9)
    val assigned = Materialize.materialize(
      withCells.select(col("vid"), col("v"),
        element_at(col("cells"), 1).getField("cid").as("cell")))
    // residualize: map-only exact subtraction against the broadcast
    // centroid map (O(C·dim) literal, the codebook itself)
    val centMap = typedLit(resCents.map { case (cid, cv, _) =>
      cid -> cv.toSeq }.toMap)
    val resBase = assigned.select(col("vid"),
      zip_with(col("v").cast("array<double>"),
        element_at(centMap, col("cell")), (a, b) => a - b).as("v"),
      col("cell"))
    val cbs = pqCodebook(resBase, pqLo, pqHi, dim, m, iters)
    val ksz = (pqHi - pqLo).toInt
    val centByCode: Array[Map[Int, Array[Double]]] =
      cbs.map(_.map { case (cid, cv) =>
        ((cid - pqLo).toInt, cv) }.toMap)
    val codes = Materialize.materialize(
      pqEncode(resBase, cbs, pqLo, dim, m))
    // probes: the nprobe nearest cells per query, collected as
    // O(Q·nprobe) driver state (the filter prunes the cellArray
    // projection to the Q query rows before it runs)
    val probesDf = withCells.where(col("vid") < numQueries)
      .select(col("vid").as("qid"),
        explode(slice(col("cells"), 1, nprobe)).as("p"))
      .select(col("qid"), col("p.cid").as("pcell"))
    val probes = probesDf.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    require(probes.nonEmpty, s"no query rows with id < $numQueries")
    val queries = base.where(col("vid") < numQueries)
      .select(col("vid"), col("v").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    val centById = resCents.map { case (cid, cv, _) => cid -> cv }.toMap
    // one flat LUT over all (query, probed cell) pairs: the query's
    // residual vs that cell, scored against the residual codebook
    val flatLut = probes.toArray.flatMap { case (qid, cell) =>
      val qv = queries(qid)
      val cw = centById(cell)
      Array.tabulate(m * ksz) { i =>
        val (s, c) = (i / ksz, i % ksz)
        centByCode(s).get(c) match {
          case None => Double.NaN // unreachable code slot
          case Some(cv) =>
            var d2 = 0.0
            var d = 0
            while (d < dsub) {
              val t = (qv(s * dsub + d) - cw(s * dsub + d)) - cv(d)
              d2 += t * t; d += 1
            }
            d2
        }
      }
    }
    // (qid, cell) → LUT block index via one flat key literal; span
    // makes the packed key collision-free over the codebook's ids
    val span = ivfCents.map(_._1).max + 1L
    val probeKeys: Array[Long] =
      probes.toArray.map { case (q, c) => q * span + c }
    val cand = assigned.select(col("vid"), col("cell"))
      .join(broadcast(probesDf),
        col("vid") =!= col("qid") && col("cell") === col("pcell"))
      .select(col("qid"), col("vid"), col("cell"))
    // structural guard (ADVICE r9): a (qid, cell) key missing from
    // probeKeys would make array_position return 0 → pidx −1, and
    // element_at's NEGATIVE index silently reads from the END of the
    // flat LUT — corrupt distances instead of a failure. Unreachable
    // while cand joins the same probesDf the keys were collected
    // from; raise_error makes a future break of that invariant loud.
    val pos = array_position(typedLit(probeKeys),
      col("qid") * lit(span) + col("cell"))
    val pidx = when(pos >= 1L, pos - 1L).otherwise(
      raise_error(concat(lit("residual IVF-PQ probe LUT miss: qid="),
        col("qid").cast("string"), lit(" cell="),
        col("cell").cast("string"))).cast("long"))
    val dist = (0 until m).map { s =>
      element_at(typedLit(flatLut),
        (pidx * (m * ksz) + col("codes").getItem(s) + lit(s * ksz) + 1)
          .cast("int"))
    }.reduce(_ + _)
    val scored = cand
      .join(codes.withColumnRenamed("vec_id", "vid"), "vid")
      .select(col("qid"), col("vid"), (-sig5(dist)).as("cosine"))
    Similarity.rankTopK(scored, k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        (-col("cosine")).as("adc_d2"))
  }

  /** [[pqCodes]] flattened to one SCALAR row per (vec_id, subspace,
    * code) with the per-vector mse repeated on each row — hash-
    * comparator-friendly output (array columns are unhashable in
    * pandas-based harnesses, which made the nested form unverifiable
    * by the driver gate in round 6). Subspace is 0-based, matching
    * the oracle's `(i-1)//8` fold.
    *
    * The encode result is MATERIALIZED before the explode: the
    * posexplode Generate infers a `size(codes) > 0` predicate that
    * predicate-pushdown substitutes through every Project, cloning
    * the whole O(m·k) argmin expression tree into the Filter (plan
    * text 713 KB, 17.5 s vs 5 s — the round-5 Generate-inlining trap
    * from the other direction). Cutting lineage at the (tiny,
    * O(vectors)) encoded frame keeps the heavy tree in exactly one
    * plan node; the explode then runs on plain columns. */
  def pqCodeRows(df: DataFrame, idCol: String, vecCol: String,
      seedLo: Long, seedHi: Long, dim: Int = 64, m: Int = 8,
      iters: Int = 1): DataFrame =
    Materialize.materialize(
        pqCodes(df, idCol, vecCol, seedLo, seedHi, dim, m, iters))
      .select(col("vec_id"), col("mse"),
        posexplode(col("codes")).as(Seq("p", "code")))
      .select(col("vec_id"), col("p").cast("long").as("subspace"),
        col("code"), col("mse"))
      .orderBy("vec_id", "subspace")
}
