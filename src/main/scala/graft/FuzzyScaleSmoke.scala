package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale decomposition of the exact fuzzy-dedup audit form
  * (`dedup_fuzzy` = df-capped inverted index → exact Jaccard gate →
  * Levenshtein verify): measures, per fixture tier, the quantity the
  * candidate join actually scales in — Σ_g df(g)² over index grams —
  * against wall time, to pin WHY the r13 sf1 gate showed the query
  * growing ~quadratically on the synthetic fixture.
  *
  * The synthetic documents table draws words from a CLOSED 31-word
  * vocabulary, so the trigram space saturates (~30k grams): corpus
  * growth raises per-gram df LINEARLY, and Σ df² grows ~quadratically
  * while the `maxDf` boilerplate cap (1000) never engages. A real
  * crawl grows its gram space with the corpus (Heaps' law) keeping
  * typical df roughly flat — there Σ df² is ~linear and the cap
  * bounds the hot tail. The production paths for gram-saturated
  * corpora are `ngramJaccardPairsBlocked` (per-block indexes) and the
  * MinHash band family; this main records the decision evidence.
  *
  * Usage: graft.FuzzyScaleSmoke <dir1,dir2,...>
  */
object FuzzyScaleSmoke {
  def main(args: Array[String]): Unit = {
    val dirs = args(0).split(",").toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (dir <- dirs) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val nDocs = docs.count()
      val t0 = System.nanoTime()
      // the index frame the candidate join runs over (distinct
      // (id, gram), df-capped) — same parameters as dedup_fuzzy
      val sh = graft.ops.Dedup.shingleIndex(docs, "doc_id", "text",
        n = 3, maxDf = Some(1000L)) // 1000 = Shared.NgramMaxDf
      val dfStats = sh.groupBy("shingle")
        .agg(count(lit(1)).as("df"))
        .agg(count(lit(1)).as("grams"), max("df").as("max_df"),
          sum(col("df") * col("df")).as("sum_df_sq"))
        .first()
      val tIdx = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nPairs = graft.ops.Dedup.fuzzyPairs(docs, "doc_id", "text",
        n = 3, blockJaccard = 0.3, maxNormDist = 0.05,
        maxDf = Some(1000L)).count() // 1000 = Shared.NgramMaxDf
      val tAll = (System.nanoTime() - t1) / 1e9
      println(f"[fuzzy-scale] dir=$dir docs=$nDocs " +
        f"grams=${dfStats.getLong(0)} max_df=${dfStats.getLong(1)} " +
        f"sum_df_sq=${dfStats.getLong(2)} index_s=$tIdx%.1f " +
        f"pairs=$nPairs fuzzy_s=$tAll%.1f")
    }
    spark.stop()
  }
}
