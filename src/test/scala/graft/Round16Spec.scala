package graft

/** Round-16 pins.
  *
  * Silent-empty fixture audit (VERDICT r15 task 8): the r15
  * open-vocab sweep proved a correctness gate can pass VACUOUSLY —
  * the BPE/WordPiece word filter rejected every open-vocabulary
  * token, the trained vocabulary was empty, and the 0-row Spark
  * result hash-matched the 0-row oracle. Any query whose fixture is
  * TRAINED or DERIVED (a vocabulary, a codebook, a model, an LM)
  * can degenerate the same way, so this sweep pins every such query
  * to a non-empty result at sf0.001 — a fixture regression now
  * fails a unit test instead of greening the gate on nothing. */
class Round16Spec extends SparkSpec {

  /** Every declared query whose output is produced THROUGH a trained
    * or derived artifact: tokenizer vocabularies (BPE / WordPiece /
    * unigram), n-gram LMs, the logistic-regression filter, k-means /
    * PQ / IVF codebooks, and vocabulary-derived statistics. A 0-row
    * result from any of these means the fixture degenerated (empty
    * vocab, no trainable rows), never that the corpus is clean. */
  private val trainedOrDerived = Seq(
    // tokenizer trainers + everything encoded under their vocabs
    "text_bpe_train", "text_bpe_encode", "text_bpe_fertility",
    "text_bpe_pairs", "text_wordpiece_train", "text_wordpiece_encode",
    "text_unigram_train", "text_unigram_encode", "text_unigram_oov",
    // n-gram LMs and their scores
    "text_kn_trigram", "text_kn_score", "text_kn_by_lang",
    "text_lm_score", "text_ppl_buckets", "text_ppl_buckets_err",
    // learned filter (teacher-labeled LR)
    "text_classify", "text_guard_recall",
    // vector codebooks
    "embed_kmeans", "embed_kmeans_convergence", "embed_pq",
    "embed_pq_search", "embed_pq_recall", "embed_ivf_assign",
    "embed_ivf_pq", "embed_ivf_pq_rerank", "embed_ivf_pq_residual",
    // vocabulary-derived corpus statistics
    "text_vocab", "text_zipf", "text_pmi", "text_tfidf_topk")

  test("trained/derived fixtures are non-empty at sf0.001 (the " +
      "vacuous-pass guard from the r15 open-vocab lesson)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val missing = trainedOrDerived.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"sweep names unknown queries: $missing")
    val empty = trainedOrDerived.flatMap { name =>
      val n = SparkEntry.queries(name)(spark, dir).count()
      if (n == 0L) Some(name) else None
    }
    assert(empty.isEmpty,
      "trained/derived queries returned 0 rows (degenerate fixture " +
        s"— the gate would pass vacuously): ${empty.mkString(", ")}")
  }

  test("tokenizer vocabularies contain multi-character pieces at " +
      "sf0.001 (an all-single-char vocab is the degenerate fallback)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    import org.apache.spark.sql.functions._
    for (name <- Seq("text_bpe_train", "text_wordpiece_train",
        "text_unigram_train")) {
      val out = SparkEntry.queries(name)(spark, dir)
      val pieceCol = out.columns.find(c =>
        c == "piece" || c == "merged" || c == "token")
        .getOrElse(out.columns(0))
      val multi = out
        .where(length(regexp_replace(col(pieceCol), "^##", "")) > 1)
        .count()
      assert(multi > 0L,
        s"$name trained no multi-char pieces — character-fallback " +
          "vocabulary, the r15 empty-vocab shape")
    }
  }
}
