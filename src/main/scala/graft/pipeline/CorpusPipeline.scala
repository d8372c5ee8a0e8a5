package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Materialize, Sampling, TextStats}

/** End-to-end training-corpus preparation: the composition of the
  * oracle-checked operators into the standard funnel
  *
  *   raw corpus → quality filter (token range + repetition)
  *              → near-dedup (cluster, keep one representative)
  *              → benchmark decontamination (n-gram overlap vs eval)
  *              → deterministic train/holdout split
  *
  * Every stage is a declarative plan over the previous one — one
  * lazily-composed DAG per stage, no driver materialization of
  * anything proportional to the corpus. Filter decisions use the
  * same rounded values as the per-operator oracles, so the whole
  * funnel is itself oracle-checkable (`pipeline_funnel`). */
object CorpusPipeline {

  /** How the funnel's near-dedup stage generates candidate pairs.
    * Both strategies emit the same (id_a, id_b, jaccard) frame at the
    * same exact-Jaccard threshold — they differ only in HOW
    * candidates are found, so the funnel oracle is strategy-
    * independent wherever banding recall is 1 (the fixtures). */
  sealed trait NearDupStrategy
  /** Exact inverted-index pair join ([[Dedup.ngramJaccardPairs]]) —
    * the audit path: ground truth, but Θ(Σ_g df(g)²) candidates. */
  case object ExactNgram extends NearDupStrategy
  /** MinHash-banded candidates verified exactly on the candidate set
    * ([[Dedup.minhashVerifiedPairs]]) — the production path: linear
    * in the corpus, bucket skew bounded by the star cap. */
  final case class BandedMinHash(numHashes: Int = 64, bands: Int = 16,
      maxBucket: Option[Long] = Some(1024L)) extends NearDupStrategy
  /** Corpus-size-ROUTED (the default since r15): exact while one
    * scan-only count() says Σdf² is affordable, banded above
    * `bandedAboveRows` ([[Dedup.ngramJaccardPairsRouted]]) — the
    * no-config funnel never embeds the quadratic stage on a corpus
    * big enough for it to matter. */
  final case class Routed(bandedAboveRows: Long = 20000L,
      numHashes: Int = 64, bands: Int = 16,
      maxBucket: Option[Long] = Some(1024L)) extends NearDupStrategy

  /** How the funnel's decontamination stage finds (train, eval)
    * overlap pairs; all three arms are value-identical (the Bloom
    * prefilter is provably lossless — no false negatives). */
  sealed trait ContamStrategy
  /** Exact inverted-index gram-probe join — the audit arm. */
  case object ExactContam extends ContamStrategy
  /** Always through [[graft.ops.BloomPrefilter.bloomDecontaminate]]
    * — map-only bitset probe on the corpus side. */
  case object BloomContam extends ContamStrategy
  /** Train-side-row-count routed ([[Dedup.contaminationPairsRouted]])
    * — the default: exact below the threshold, bloom above. */
  final case class RoutedContam(bloomAboveRows: Long = 20000L)
    extends ContamStrategy

  case class FunnelConfig(
      minTokens: Long = 20L,
      maxTokens: Long = 1000L,
      maxTopBigramFrac: Double = 0.2,
      dedupMinJaccard: Double = 0.5,
      contaminationMinShared: Long = 5L,
      maxDf: Long = 1000L,
      holdoutPerMille: Int = 100,
      nearDup: NearDupStrategy = Routed(),
      contam: ContamStrategy = RoutedContam())

  /** The exact-everything parameterization — the AUDIT funnel
    * (ground-truth Θ(Σdf²) near-dup join + exact gram-probe
    * decontamination at any size); the declared `pipeline_funnel` /
    * `pipeline_curate` queries run this form so the exact oracles
    * stay exercised verbatim. */
  val ExactConfig: FunnelConfig =
    FunnelConfig(nearDup = ExactNgram, contam = ExactContam)

  /** The always-banded parameterization: banded near-dup +
    * Bloom-prefiltered decontamination at every size. Same
    * thresholds, same oracle. */
  val BandedConfig: FunnelConfig =
    FunnelConfig(nearDup = BandedMinHash(), contam = BloomContam)

  /** Quality-filter survivors: token count in range and the
    * (sig5-rounded) top-bigram repetition below threshold. */
  def qualityFiltered(corpus: DataFrame, idCol: String, textCol: String,
      cfg: FunnelConfig): DataFrame = {
    val rep = TextStats.repetition(corpus, idCol, textCol)
      .where(col("n_tokens") >= cfg.minTokens &&
        col("n_tokens") <= cfg.maxTokens &&
        (col("top_bigram_frac").isNull ||
          col("top_bigram_frac") < cfg.maxTopBigramFrac))
      .select(col("doc_id").as(idCol))
    corpus.join(rep, Seq(idCol), "left_semi")
  }

  /** Near-dedup keep: drop cluster members that are not the
    * minimum-id representative. */
  /** The near-dup pair frame for `docs` under the configured
    * strategy — one dispatch site, so every funnel variant's dedup
    * stage is the same code path modulo candidate generation. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      cfg: FunnelConfig): DataFrame = cfg.nearDup match {
    case ExactNgram =>
      Dedup.ngramJaccardPairs(docs, idCol, textCol, n = 3,
        minJaccard = cfg.dedupMinJaccard, maxDf = Some(cfg.maxDf))
    case BandedMinHash(numHashes, bands, maxBucket) =>
      Dedup.minhashVerifiedPairs(docs, idCol, textCol, n = 3,
        numHashes = numHashes, bands = bands,
        minJaccard = cfg.dedupMinJaccard, maxDf = Some(cfg.maxDf),
        maxBucket = maxBucket)
    case Routed(aboveRows, numHashes, bands, maxBucket) =>
      Dedup.ngramJaccardPairsRouted(docs, idCol, textCol, n = 3,
        minJaccard = cfg.dedupMinJaccard, maxDf = Some(cfg.maxDf),
        numHashes = numHashes, bands = bands, maxBucket = maxBucket,
        bandedAboveRows = aboveRows)
  }

  def dedupKeepOne(docs: DataFrame, idCol: String, textCol: String,
      cfg: FunnelConfig): DataFrame = {
    val clusters = Dedup.duplicateClustersStar(
      nearDupPairs(docs, idCol, textCol, cfg))
    docs.join(
      clusters.where(col("doc_id") =!= col("cluster_id"))
        .select(col("doc_id").as(idCol)),
      Seq(idCol), "left_anti")
  }

  /** Decontamination: drop training docs sharing ≥ minShared shingles
    * with any eval doc. */
  def decontaminated(docs: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String, cfg: FunnelConfig): DataFrame = {
    val pairs = cfg.contam match {
      case BloomContam =>
        graft.ops.BloomPrefilter.bloomDecontaminate(docs, evalDocs,
          idCol, textCol, n = 3,
          minShared = cfg.contaminationMinShared,
          maxDf = Some(cfg.maxDf))
      case ExactContam =>
        Dedup.contaminationPairs(docs, evalDocs, idCol,
          textCol, n = 3, minShared = cfg.contaminationMinShared,
          maxDf = Some(cfg.maxDf))
      case RoutedContam(aboveRows) =>
        Dedup.contaminationPairsRouted(docs, evalDocs, idCol,
          textCol, n = 3, minShared = cfg.contaminationMinShared,
          maxDf = Some(cfg.maxDf), bloomAboveRows = aboveRows)
    }
    val flagged = pairs.select(col("train_id").as(idCol)).distinct()
    docs.join(flagged, Seq(idCol), "left_anti")
  }

  /** Full funnel; returns (clean train frame, holdout frame). */
  def run(corpus: DataFrame, evalDocs: DataFrame, idCol: String,
      textCol: String, cfg: FunnelConfig = FunnelConfig())
      : (DataFrame, DataFrame) = {
    val clean = decontaminated(
      dedupKeepOne(qualityFiltered(corpus, idCol, textCol, cfg),
        idCol, textCol, cfg),
      evalDocs, idCol, textCol, cfg)
    Sampling.hashSplit(clean, idCol, cfg.holdoutPerMille)
  }

  /** Stage counts for the oracle-checked funnel query (the hash
    * split is xxhash64-bound, so its sizes are covered by unit tests
    * rather than the DuckDB oracle). */
  def funnelCounts(corpus: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String,
      cfg: FunnelConfig = FunnelConfig()): DataFrame = {
    // each stage is materialized once (localCheckpoint, or reliable
    // checkpoint when a checkpoint dir is set — see Materialize)
    // before the next consumes it — four naive count() actions would
    // replay the repetition shuffles and semi-joins up to three times
    val q = qualityFiltered(corpus, idCol, textCol, cfg)
      .transform(Materialize.materialize)
    val d = dedupKeepOne(q, idCol, textCol, cfg).transform(Materialize.materialize)
    val c = decontaminated(d, evalDocs, idCol, textCol, cfg)
    val spark = corpus.sparkSession
    import spark.implicits._
    // r17: the stage counts run SEQUENTIALLY. r16 overlapped them
    // (guide §2.6), but the driver measured all 7 pipeline queries
    // 14–36% slower at 32 cores with faster-at-8-cores scaling — the
    // overlapped jobs are CHEAP (counts over already-materialized
    // frames), so there is no tail to back-fill and the concurrent
    // jobs only contend for cores with the funnel's real work.
    // Action overlap pays for expensive independent scans (the
    // Profiler passes), not for trivial counts.
    Seq((corpus.count(), q.count(), d.count(), c.count()))
      .toDF("n_corpus", "n_quality", "n_dedup", "n_clean")
  }

  /** The CCNet-complete preparation funnel (Wenzek et al. 2020
    * composed with the Gopher gate):
    *
    *   raw corpus → structural rule gate (first-failing-rule gate,
    *                [[graft.ops.QualityRules]])
    *              → LM cut: per-language Kneser–Ney terciles against
    *                an LM trained on the TARGET slice; the worst
    *                tercile (tail) is dropped — CCNet's head+middle
    *                keep
    *              → near-dedup keep one → decontamination vs target
    *
    * Stage counts as one row; every stage reuses its oracle-checked
    * operator, and each materializes once before the next consumes
    * it (the funnelCounts contract). */
  def ccnetCounts(corpus: DataFrame, target: DataFrame, idCol: String,
      textCol: String, langCol: String,
      th: graft.ops.QualityRules.Thresholds =
        graft.ops.QualityRules.Thresholds(),
      cfg: FunnelConfig = FunnelConfig()): DataFrame = {
    val g = graft.ops.QualityRules.filterDocs(corpus, idCol, textCol,
        th.minTokens, th.maxTokens, th.minMeanWordLen,
        th.maxMeanWordLen, th.minStopwords, th.maxTopTokenFrac)
      .transform(Materialize.materialize)
    val keep = graft.ops.Search
      .knPplBucketAssign(target, g, idCol, textCol, langCol)
      .where(col("bucket") =!= "tail")
      .select(col("doc_id").as(idCol))
    val l = g.join(keep, Seq(idCol), "left_semi")
      .transform(Materialize.materialize)
    val d = dedupKeepOne(l, idCol, textCol, cfg)
      .transform(Materialize.materialize)
    val c = decontaminated(d, target, idCol, textCol, cfg)
    val spark = corpus.sparkSession
    import spark.implicits._
    // sequential stage counts — see funnelCounts (r17 revert)
    Seq((corpus.count(), g.count(), l.count(), d.count(), c.count()))
      .toDF("n_corpus", "n_gate", "n_lm", "n_dedup", "n_clean")
  }

  /** The MODEL-gated curation funnel — CCNet's actual architecture
    * (the learned filter, not the rule gate, makes the keep call):
    *
    *   raw corpus → train the LR distillation of the rule gate on
    *                the corpus itself ([[graft.ops.Classifier]]),
    *                keep docs the MODEL keeps at `tau`
    *              → near-dedup keep one → decontamination vs target
    *
    * Stage counts as one row; the training pass and every stage
    * materialize once (the funnelCounts contract). */
  def curateCounts(corpus: DataFrame, target: DataFrame,
      idCol: String, textCol: String,
      th: graft.ops.QualityRules.Thresholds,
      iters: Int = 5, tau: Double = 0.5,
      cfg: FunnelConfig = FunnelConfig()): DataFrame = {
    val feats = Materialize.materialize(
      graft.ops.Classifier.featurize(corpus, idCol, textCol, th))
    val m = graft.ops.Classifier.train(feats, iters)
    val g = graft.ops.Classifier
      .filterDocs(corpus, idCol, textCol, th, m, tau)
      .transform(Materialize.materialize)
    val d = dedupKeepOne(g, idCol, textCol, cfg)
      .transform(Materialize.materialize)
    val c = decontaminated(d, target, idCol, textCol, cfg)
    val spark = corpus.sparkSession
    import spark.implicits._
    // sequential stage counts — see funnelCounts (r17 revert)
    Seq((corpus.count(), g.count(), d.count(), c.count()))
      .toDF("n_corpus", "n_model", "n_dedup", "n_clean")
  }
}
