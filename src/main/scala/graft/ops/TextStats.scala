package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.det.Sig.sig5

/** Text-analysis operators for training-data pipelines: token/char
  * statistics, heuristic quality scoring, n-gram/stopword language
  * identification, and rolling-hash document fingerprinting. All are
  * single-scan, per-row expressions + one aggregation — embarrassingly
  * parallel at 100 TB (no shuffle except the final small groupBy). */
object TextStats {

  /** Stopword marker sets per language for the n-gram/stopword
    * language-ID heuristic (tiny, compiled into the plan as literals;
    * langs sorted alphabetically for deterministic tie-breaks). */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "en" -> Seq("the", "and", "of", "to", "a", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une"),
    "zh" -> Seq("de5", "shi4", "bu4", "le5", "zai4", "you3"))

  def tokens(c: Column): Column = split(c, " ")

  private def inList(x: Column, ws: Seq[String]): Column =
    ws.map(w => x === w).reduce(_ || _)

  def stopCount(c: Column, ws: Seq[String]): Column =
    size(filter(tokens(c), t => inList(t, ws)))

  /** Per-language aggregate stats over a corpus:
    * (lang, n_docs, avg_chars, avg_tokens, stop_ratio). */
  def langStats(df: DataFrame, textCol: String, langCol: String)
      : DataFrame = {
    val en = stopwords.toMap.apply("en")
    df.select(col(langCol).as("lang"),
        length(col(textCol)).cast("long").as("nc"),
        size(tokens(col(textCol))).cast("long").as("nt"),
        stopCount(col(textCol), en).cast("long").as("ns"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sig5(avg("nc")).as("avg_chars"),
        sig5(avg("nt")).as("avg_tokens"),
        sig5(sum("ns").cast("double") / sum("nt")).as("stop_ratio"))
      .orderBy("lang")
  }

  /** Per-document quality score: a deterministic rational-arithmetic
    * blend of length, stopword density and lexical diversity (no
    * transcendental functions → bit-identical across engines). */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val en = stopwords.toMap.apply("en")
    val t = tokens(col(textCol))
    val nt = size(t).cast("long")
    val nd = size(array_distinct(t)).cast("long")
    val ns = stopCount(col(textCol), en).cast("long")
    val lenScore = least(nt, lit(100L)).cast("double") / 100.0
    val stopScore = ns.cast("double") / nt
    val divScore = nd.cast("double") / nt
    df.select(col(idCol).as("doc_id"),
        length(col(textCol)).cast("long").as("n_chars"),
        nt.as("n_tokens"), nd.as("n_distinct_tokens"),
        sig5(stopScore).as("stop_ratio"),
        sig5(divScore).as("distinct_ratio"),
        sig5(lenScore * 0.3 + stopScore * 0.4 + divScore * 0.3)
          .as("quality"))
      .orderBy("doc_id")
  }

  /** BPE-style pre-tokenizer pattern: optional leading space +
    * letter-run | digit-run | punctuation-run — the GPT-2 regex shape
    * restricted to constructs both Java regex and RE2 (the oracle's
    * engine) support identically (no lookahead). */
  val BpePattern = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  /** Per-document token counting two ways: whitespace words and the
    * BPE-ish pre-tokenization (what an LLM tokenizer's first stage
    * would produce). */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(col(idCol).as("doc_id"),
        size(tokens(col(textCol))).cast("long").as("n_ws_tokens"),
        expr(s"size(regexp_extract_all(`$textCol`, '$BpePattern', 0))")
          .cast("long").as("n_bpe_tokens"))
      .orderBy("doc_id")

  /** Stopword-profile language ID: score every language's marker set
    * against the token stream; predict the alphabetically-first
    * language achieving the max score ('unknown' when all zero).
    * Returns the (labeled lang × predicted lang) confusion counts. */
  def langIdConfusion(df: DataFrame, textCol: String, langCol: String)
      : DataFrame = {
    val scores = stopwords.map { case (l, ws) =>
      l -> stopCount(col(textCol), ws).as(s"s_$l")
    }
    val scored = df.select(col(langCol).as("lang") +:
      scores.map(_._2): _*)
    val m = greatest(stopwords.map { case (l, _) => col(s"s_$l") }: _*)
    val allZero = stopwords.map { case (l, _) => col(s"s_$l") === 0 }
      .reduce(_ && _)
    val pred = stopwords.foldRight(lit("unknown")) { case ((l, _), acc) =>
      when(col(s"s_$l") === m, lit(l)).otherwise(acc)
    }
    // foldRight builds de→en→es→fr→zh→unknown; the first WHEN that
    // matches wins, so ties resolve to the alphabetically-first lang.
    scored.select(col("lang"), when(allZero, "unknown").otherwise(pred)
        .as("pred_lang"))
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("cnt"))
      .orderBy("lang", "pred_lang")
  }

  /** Within-document repetition stats (the MassiveText/Gopher-style
    * quality filters): per doc, the fraction of occurrences claimed
    * by the most frequent token and by the most frequent word
    * 2-gram. Highly repetitive machine-generated text scores near 1;
    * natural prose near 2/len. Bigram identity rides the 64-bit
    * token-hash pair (full multiplicity — unlike the dedup shingles,
    * NO distinct), so the count join shuffles 8-byte keys.
    * Fractions are NULL when the doc is too short to have any
    * (n-gram) occurrences. */
  def repetition(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("t"))
    val tokStats = tok.groupBy("doc_id", "t").count()
      .groupBy("doc_id")
      .agg(sum("count").as("n_tokens"), max("count").as("top_tok"))
    val bi = Dedup.hashedGramFrame(df, idCol, textCol, n = 2,
        distinct = false)
      .select(col("id").as("doc_id"), col("shingle").as("g"))
    val biStats = bi.groupBy("doc_id", "g").count()
      .groupBy("doc_id")
      .agg(sum("count").as("n_bigrams"), max("count").as("top_bi"))
    tokStats.join(biStats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        sig5(col("top_tok").cast("double") / col("n_tokens"))
          .as("top_token_frac"),
        sig5(col("top_bi").cast("double") / col("n_bigrams"))
          .as("top_bigram_frac"))
      .orderBy("doc_id")
  }

  /** The fuller Gopher repetition battery: per document and n-gram
    * size, the fraction of n-gram OCCURRENCES that are duplicates
    * (1 − distinct/total) — the `dup_ngram_frac` family
    * ([[repetition]] covers the top-1 fractions; this covers the
    * mass). Long-form output (doc_id, n, n_grams, dup_frac) so one
    * query carries every n. A doc shorter than n tokens has no
    * n-grams and is absent for that n.
    *
    * Scale shape: one hashed-gram pass per n (multiplicity — NO
    * distinct), 8-byte shuffle keys, per-doc count +
    * count-distinct; the ns are a tiny fixed list. */
  def repetitionNgrams(df: DataFrame, idCol: String, textCol: String,
      ns: Seq[Int] = Seq(2, 5, 10)): DataFrame = {
    val parts = ns.map { n =>
      Dedup.hashedGramFrame(df, idCol, textCol, n, distinct = false)
        .select(col("id").as("doc_id"), col("shingle"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          countDistinct("shingle").as("n_distinct"))
        .select(col("doc_id"), lit(n.toLong).as("n"), col("n_grams"),
          sig5(lit(1.0) -
            col("n_distinct").cast("double") /
              col("n_grams").cast("double")).as("dup_frac"))
    }
    parts.reduce(_ unionByName _).orderBy("doc_id", "n")
  }

  /** Karp–Rabin rolling-hash document fingerprint: the minimum base-31
    * polynomial hash over all 8-char windows (winnowing with window =
    * whole doc). Pure integer arithmetic → exact. Docs shorter than
    * 8 chars are excluded. */
  val FpGram = 8
  private[graft] val pow31: Array[Long] =
    Iterator.iterate(1L)(_ * 31L).take(FpGram).toArray.reverse

  def fingerprintExpr(textCol: String): Column = {
    // Precompute the char-code array once: substr(text, i, 1) is O(i)
    // on UTF8String (codepoint scan), which made the direct form
    // O(len²) per document — observed 25 s at sf0.1 vs ~1 s for this
    // split-once form.
    val terms = (0 until FpGram).map { k =>
      s"codes[i + $k - 1] * CAST(${pow31(k)} AS BIGINT)"
    }.mkString(" + ")
    expr(
      s"array_min(transform(sequence(1, length(`$textCol`) - ${FpGram - 1}), " +
        s"i -> $terms))")
  }

  /** Char-code array for [[fingerprintExpr]] (`codes` column). */
  def charCodes(textCol: String): Column =
    expr(s"transform(split(`$textCol`, ''), ch -> ascii(ch))")

  /** Composed-builtins fingerprint (kept for cross-checking the
    * native expression; same values on ASCII text). */
  def fingerprintsComposed(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.where(length(col(textCol)) >= FpGram)
      .withColumn("codes", charCodes(textCol))
      .select(col(idCol).as("doc_id"), fingerprintExpr(textCol).as("fp"))
      .orderBy("doc_id")

  /** Production path: the native codegen'd
    * [[graft.functions.RollingMinHash]] expression — one O(len)
    * rolling loop, no per-row array materialization. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.where(length(col(textCol)) >= FpGram)
      .select(col(idCol).as("doc_id"),
        graft.functions.RollingMinHash
          .rolling_min_hash(col(textCol), FpGram).as("fp"))
      .orderBy("doc_id")

  /** Corpus manifest: the per-source composition datasheet shipped
    * with a training corpus — docs, tokens, chars and doc-share per
    * source. ONE aggregation with map-side combine plus broadcast
    * totals (the freq()/vocab() distributed-totals pattern). */
  def manifest(df: DataFrame, srcCol: String, textCol: String)
      : DataFrame = {
    val counts = df.groupBy(col(srcCol).as("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(size(tokens(col(textCol))).cast("long")).as("n_tokens"),
      sum(length(col(textCol)).cast("long")).as("n_chars"))
    val totals = counts.agg(sum("n_docs").cast("double").as("td"))
    counts.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_chars"),
        sig5(col("n_docs").cast("double") / col("td")).as("doc_share"))
      .orderBy("source")
  }

  /** Two-level corpus composition: the (source × lang) datasheet —
    * docs, tokens, and each cell's share WITHIN its source (the
    * "what is src7 made of" view [[manifest]]'s one-level rows
    * can't answer). One aggregation on the pair key + a broadcast of
    * the O(sources) totals. */
  def composition(df: DataFrame, srcCol: String, subCol: String,
      textCol: String): DataFrame = {
    val cells = df.groupBy(col(srcCol).as("source"),
        col(subCol).as("sub"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col(textCol))).cast("long")).as("n_tokens"))
    val totals = cells.groupBy("source")
      .agg(sum("n_docs").as("src_docs"))
    cells.join(broadcast(totals), Seq("source"))
      .select(col("source"), col("sub"), col("n_docs"),
        col("n_tokens"),
        sig5(col("n_docs").cast("double") / col("src_docs"))
          .as("share_in_source"))
      .orderBy("source", "sub")
  }

  /** Top adjacent character-pair frequencies within tokens — the
    * counting pass of BPE tokenizer training (Sennrich et al. 2016):
    * the first merge rule is exactly the head of this list, and each
    * subsequent BPE iteration re-runs this count over the re-tokenized
    * corpus. At 100 TB the counting pass IS the training cost, so its
    * plan shape matters: token explode → in-token position explode →
    * ONE (pair → count) hash aggregation with map-side combine, head
    * via orderBy+limit (TakeOrderedAndProject), rank stamped after
    * the limit — the same distributed top-k contract as [[vocab]].
    * Ties break by pair for determinism. */
  def bpePairs(df: DataFrame, textCol: String, topK: Int = 20)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(explode(tokens(col(textCol))).as("tok"))
      .where(length(col("tok")) >= 2)
    val counts = tok
      .select(col("tok"),
        explode(sequence(lit(1), length(col("tok")) - 1)).as("i"))
      .select(expr("substring(tok, i, 2)").as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
    val top = counts.orderBy(col("cnt").desc, col("pair")).limit(topK)
    top.withColumn("rnk", row_number()
        .over(Window.orderBy(col("cnt").desc, col("pair")))
        .cast("long"))
      .select("rnk", "pair", "cnt")
      .orderBy("rnk")
  }

  /** Corpus vocabulary profile: the `topK` tokens by frequency with
    * rank, count, and corpus share — the vocabulary sanity check run
    * before tokenizer training (a misbehaving extractor shows up as
    * markup tokens at the head of this list).
    *
    * Scale shape: a whitespace vocabulary over a web-scale corpus is
    * BILLIONS of distinct tokens, so nothing unbounded may pass
    * through one partition. The (token → count) hash aggregation is
    * the only corpus pass; from that aggregated child,
    *   - corpus totals come from a 1-row scalar aggregate that is
    *     crossJoin(broadcast)-ed back (the same distributed-totals
    *     pattern as Stats.freq's `__other__` bucket), and
    *   - the head comes from orderBy+limit, which plans as
    *     TakeOrderedAndProject — each partition keeps its local
    *     top-k heap and only k·partitions candidate rows reach the
    *     driver-side merge.
    * Rank is stamped by a window AFTER the limit, over ≤ topK rows —
    * bounded by the parameter, not the data. The two consumers of
    * the aggregation share its shuffle via exchange reuse, so the
    * expensive token explode still runs once. Ties break by token
    * for determinism. */
  /** Corpus-level boilerplate detection: the top-k word n-grams by
    * DOCUMENT frequency (a gram repeated inside one document counts
    * once) with their corpus share — templates, headers, and license
    * blurbs surface here long before they distort near-dup
    * signatures. This is the INSPECTABLE form of the hot-gram state
    * the dedup family handles internally: the over-cap set `maxDf`
    * drops from MinHash signatures (and the frozen set the catalog
    * index persists for appends) is exactly the head of this
    * ranking at the df cap.
    *
    * Scale shape: tokens are projected ONCE (HOF lambdas evaluate
    * with no CSE — an inlined split would re-evaluate per element,
    * the shingleIndex O(tokens²) trap), per-doc grams are
    * array_distinct'd BEFORE the explode (within-doc dedup costs
    * nothing extra and keeps the exploded row count ≤ corpus token
    * count), one map-side-combined groupBy on the gram, head via
    * orderBy().limit(k) (TakeOrderedAndProject — the per-TABLE
    * top-k contract), rank stamped after the limit over ≤ k rows.
    * Ties break (df DESC, gram ASC) in both engines. */
  /** Per-document DISTINCT word n-grams from a pre-projected token
    * array column. `ts` MUST be a bound column attribute, not an
    * inline split(...) — HOF lambdas evaluate with no CSE, so an
    * inlined expression would re-evaluate per element (the
    * shingleIndex O(tokens²) trap). Shared by [[boilerplateGrams]]
    * and the streaming hot-gram monitor so the two derive IDENTICAL
    * gram sets. */
  private[graft] def distinctGrams(ts: Column, n: Int): Column =
    when(size(ts) >= n,
      array_distinct(transform(sequence(lit(0), size(ts) - n),
        i => concat_ws(" ", slice(ts, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))

  def boilerplateGrams(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1 && topK >= 1, "n and topK must be >= 1")
    val base = df.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), split(col(textCol), " ").as("ts"))
    val c = base.select(explode(distinctGrams(col("ts"), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("df_docs"))
    val nd = base.agg(count(lit(1)).as("n_docs"))
    val top = c.orderBy(col("df_docs").desc, col("gram")).limit(topK)
    val wRank = Window.orderBy(col("df_docs").desc, col("gram"))
    top.crossJoin(broadcast(nd))
      .withColumn("rnk", row_number().over(wRank))
      .select(col("rnk").cast("long").as("rnk"), col("gram"),
        col("df_docs"),
        sig5(col("df_docs").cast("double") / col("n_docs"))
          .as("df_share"),
        col("n_docs"))
      .orderBy("rnk")
  }

  /** Encoding-health diagnostics — the "did a decode step corrupt
    * this shard" gate a crawl pipeline runs before spending compute
    * downstream. Per-language aggregate of four per-doc signals:
    *
    *  - replacement chars (U+FFFD): a decoder already gave up;
    *  - stray control chars (C0 minus \t\n\r, plus DEL): binary
    *    bleed-through or broken transfer encoding;
    *  - mojibake markers: the UTF-8-bytes-read-as-Latin-1 digraphs
    *    ("Ã©" for é, "â€" opening the quote/dash family) — counted
    *    as LITERAL substrings via the replace-length identity, so
    *    both engines count identically with no regex-dialect risk;
    *  - non-ASCII ratio: legitimate signal for language mix (zh ≫
    *    en), a drift alarm when it moves within a language.
    *
    * Counting is one map-only projection + one O(langs) groupBy —
    * embarrassingly parallel at corpus scale. */
  def encodingHealth(df: DataFrame, textCol: String, langCol: String)
      : DataFrame = {
    def litCount(c: Column, marker: String): Column =
      (length(c) - length(replace(c, lit(marker), lit("")))) /
        lit(marker.length)
    val ctrlClass = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
    val t = col(textCol)
    val perDoc = df.select(col(langCol).as("lang"),
      length(t).cast("long").as("nc"),
      litCount(t, "�").cast("long").as("n_repl"),
      (length(t) - length(regexp_replace(t, ctrlClass, "")))
        .cast("long").as("n_ctrl"),
      (litCount(t, "Ã©") + litCount(t, "â€"))
        .cast("long").as("n_moji"),
      (length(t) - length(regexp_replace(t, "[^\\x00-\\x7F]", "")))
        .cast("long").as("n_nonascii"))
    perDoc.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_repl") > 0, 1L).otherwise(0L))
          .as("repl_docs"),
        sum(when(col("n_ctrl") > 0, 1L).otherwise(0L))
          .as("ctrl_docs"),
        sum(when(col("n_moji") > 0, 1L).otherwise(0L))
          .as("moji_docs"),
        sum("n_nonascii").as("nonascii_chars"),
        sum("nc").as("total_chars"))
      .select(col("lang"), col("n_docs"), col("repl_docs"),
        col("ctrl_docs"), col("moji_docs"),
        sig5(col("nonascii_chars").cast("double") /
          col("total_chars")).as("nonascii_ratio"))
      .orderBy("lang")
  }

  /** Collocation discovery: the top-k word bigrams by occurrence
    * count with their pointwise mutual information
    * PMI = ln( p(ab) / (p(a)·p(b)) ) — how much more often the pair
    * occurs than its unigram frequencies predict. High-count
    * high-PMI bigrams are multiword units ("machine learning");
    * high-count LOW-PMI bigrams are chance collisions of two
    * stopwords — the statistic that separates them. `minCount`
    * floors the estimate (PMI of a count-1 pair is noise).
    *
    * Scale shape: two corpus passes (unigram and bigram hash aggs —
    * the bigram explode is the cost, same as the shingle family);
    * the head is orderBy+limit (TakeOrderedAndProject heaps), rank
    * stamped after the limit; unigram counts join against the ≤topK
    * head rows (broadcast), totals are 1-row broadcast crossjoins.
    * Nothing unbounded crosses one partition. */
  /** Corpus n-gram entropy: Shannon entropy (bits) and perplexity of
    * the unigram and bigram distributions, plus the conditional
    * bigram entropy H(w₂|w₁) = H₂ − H₁ — the information-theoretic
    * corpus gauges next to [[zipfFit]]: natural text sits near
    * H(w₂|w₁) ≈ 6–8 bits; template/boilerplate-heavy corpora read
    * far lower, random token soup reads ≈ H₁. Computed exactly from
    * counts: H = log₂N − (Σ c·log₂c)/N, one (gram → count) hash
    * aggregation per order + one tiny reduction over distinct grams
    * — no sort anywhere. The conditional entropy subtracts the
    * sig5-ROUNDED H values so both engines difference identical
    * literals. */
  /** One-row gram-entropy frame (n, n_grams, n_distinct,
    * entropy_bits) over a tokenized frame with a `w` array column —
    * the shared core of [[ngramEntropy]] and [[entropyDrift]]. */
  private def gramEntropyRow(d: DataFrame, n: Int): DataFrame = {
    val g =
      if (n == 1) explode(col("w"))
      else explode(when(size(col("w")) >= n, expr(
        s"transform(sequence(1, size(w) - ${n - 1}), " +
          s"i -> concat_ws(' ', slice(w, i, $n)))"))
        .otherwise(array().cast("array<string>")))
    d.select(g.as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
      .agg(sum("c").as("n_grams"), count(lit(1)).as("n_distinct"),
        sum(col("c").cast("double") *
          log(2.0, col("c").cast("double"))).as("s"))
      .select(lit(n.toLong).as("n"), col("n_grams"),
        col("n_distinct"),
        sig5(log(2.0, col("n_grams").cast("double")) -
          col("s") / col("n_grams")).as("entropy_bits"))
  }

  private def tokenized(df: DataFrame, textCol: String): DataFrame =
    df.where(col(textCol).isNotNull)
      .select(tokens(col(textCol)).as("w"))

  def ngramEntropy(df: DataFrame, textCol: String): DataFrame = {
    val d = tokenized(df, textCol)
    def gramRow(n: Int): DataFrame = gramEntropyRow(d, n)
    val e1 = gramRow(1)
    val e2 = gramRow(2)
    val r1 = e1.select(col("n"), col("n_grams"), col("n_distinct"),
      col("entropy_bits"),
      sig5(pow(lit(2.0), col("entropy_bits"))).as("perplexity"),
      lit(null).cast("double").as("cond_bits"))
    val r2 = e2.crossJoin(broadcast(
        e1.select(col("entropy_bits").as("h1"))))
      .select(col("n"), col("n_grams"), col("n_distinct"),
        col("entropy_bits"),
        sig5(pow(lit(2.0), col("entropy_bits"))).as("perplexity"),
        sig5(col("entropy_bits") - col("h1")).as("cond_bits"))
    r1.unionByName(r2).orderBy("n")
  }

  /** Token-length profile in power-of-two buckets — the sequence-
    * length planner's input: how many docs and how much token MASS
    * sit at each length scale (packing efficiency and truncation
    * loss are both read straight off this table). One map-only
    * bucket expression + one ≤64-group aggregation. */
  def lengthProfile(df: DataFrame, textCol: String): DataFrame = {
    val n = size(tokens(col(textCol)))
    // floor(log2) via the binary-digit count — EXACT integer
    // arithmetic (a float log2 can land a hair under a power of two
    // and floor into the wrong bucket on one engine but not the
    // other)
    val bucket = (length(bin(n.cast("long"))) - 1).cast("long")
    val cells = df.where(col(textCol).isNotNull && n >= 1)
      .select(bucket.as("log2_len"), n.cast("long").as("nt"))
      .groupBy("log2_len")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
    val tot = cells.agg(sum("n_tokens").as("__t"))
    cells.crossJoin(broadcast(tot))
      .select(col("log2_len"), col("n_docs"), col("n_tokens"),
        sig5(col("n_tokens").cast("double") / col("__t"))
          .as("token_share"))
      .orderBy("log2_len")
  }

  /** Corpus saturation curve: bucket the id range into `buckets`
    * equal slices and count the distinct grams FIRST SEEN in each —
    * a crawl running dry shows the new-gram share collapsing in the
    * late buckets, long before raw row counts say anything (the
    * cumulative view of doc_novelty). One gram→min(id) aggregation
    * (map-side combined), then O(buckets) arithmetic; the cumulative
    * window touches `buckets` rows. Uncapped grams on purpose: hot
    * boilerplate is PART of the saturation signal. */
  def saturationCurve(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 1, "buckets must be >= 1")
    val first = Dedup.hashedGramFrame(
        df.where(col(textCol).isNotNull), idCol, textCol, n,
        distinct = true)
      .groupBy("shingle").agg(min("id").as("first_id"))
    val m = df.agg(max(col(idCol))).first().getLong(0) + 1
    val perBucket = first
      .select(least(expr(s"first_id * $buckets div ${m}L"),
        lit(buckets - 1L)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = perBucket.agg(sum("n_new").as("__t"))
    perBucket
      .withColumn("cum_new", sum("n_new").over(w))
      .crossJoin(broadcast(total))
      .select(col("bucket"), col("n_new"), col("cum_new"),
        sig5(col("n_new").cast("double") / col("__t"))
          .as("new_share"))
      .orderBy("bucket")
  }

  /** Token-entropy drift between a reference and a current slice —
    * "did the corpus's information content move": a template flood
    * or a language-mix shift moves H by whole bits while count-based
    * drift can stay flat. One count aggregation per side; the delta
    * differences the sig5-rounded H literals (the events_trend
    * centering contract). */
  def entropyDrift(ref: DataFrame, cur: DataFrame, textCol: String)
      : DataFrame = {
    val hr = gramEntropyRow(tokenized(ref, textCol), 1)
      .select(col("n_grams").as("n_tokens_ref"),
        col("entropy_bits").as("h_ref"))
    val hc = gramEntropyRow(tokenized(cur, textCol), 1)
      .select(col("n_grams").as("n_tokens_cur"),
        col("entropy_bits").as("h_cur"))
    hr.crossJoin(broadcast(hc))
      .select(col("n_tokens_ref"), col("n_tokens_cur"),
        col("h_ref"), col("h_cur"),
        sig5(col("h_cur") - col("h_ref")).as("delta_bits"))
  }

  def pmiBigrams(df: DataFrame, textCol: String, topK: Int = 20,
      minCount: Long = 5L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = df.where(col(textCol).isNotNull)
      .select(tokens(col(textCol)).as("w"))
    val uc = d.select(explode(col("w")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val nu = uc.agg(sum("c").cast("double").as("nu"))
    val bc = d.select(explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> struct(element_at(w, i) AS a, element_at(w, i + 1) AS b))"))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cab"))
    val nb = bc.agg(sum("cab").cast("double").as("nb"))
    val top = bc.where(col("cab") >= minCount)
      .orderBy(col("cab").desc, col("a"), col("b")).limit(topK)
    top
      .join(uc.select(col("tok").as("a"), col("c").as("ca")), Seq("a"))
      .join(uc.select(col("tok").as("b"), col("c").as("cb")), Seq("b"))
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .withColumn("rnk", row_number()
        .over(Window.orderBy(col("cab").desc, col("a"), col("b")))
        .cast("long"))
      .select(col("rnk"), col("a").as("token_a"), col("b").as("token_b"),
        col("cab").as("cnt"),
        sig5(log((col("cab") / col("nb")) /
          ((col("ca") / col("nu")) * (col("cb") / col("nu")))))
          .as("pmi"))
      .orderBy("rnk")
  }

  /** Zipf rank-frequency fit: the least-squares slope of
    * ln(count) ~ ln(rank) over the top-`topK` vocabulary — natural
    * language sits near slope −1; a synthetic or template-heavy
    * corpus reads much flatter or much steeper, making this a
    * one-number corpus-naturalness gauge (with r² saying how
    * line-like the fit is at all). Ranks use the vocab family's
    * deterministic (count desc, token) ordering.
    *
    * Scale shape: the one (token → count) hash aggregation, a
    * TakeOrderedAndProject head, then regr_* over ≤ topK rows. */
  def zipfFit(df: DataFrame, textCol: String, topK: Int = 50)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val top = counts.orderBy(col("cnt").desc, col("token")).limit(topK)
    top
      .withColumn("rnk", row_number()
        .over(Window.orderBy(col("cnt").desc, col("token"))))
      .select(log(col("rnk").cast("double")).as("lx"),
        log(col("cnt").cast("double")).as("ly"))
      .agg(count(lit(1)).as("n_tokens"),
        sig5(expr("regr_slope(ly, lx)")).as("slope"),
        sig5(expr("regr_intercept(ly, lx)")).as("intercept"),
        sig5(expr("regr_r2(ly, lx)")).as("r2"))
  }

  /** Per-document deflate compression ratio — the Gopher-family
    * quality heuristic: templated or highly repetitive text
    * compresses far below natural language (English prose deflates
    * to ~0.3–0.5 of raw; a repeated line to <0.05; near-random
    * symbols toward 1.0), so the ratio separates boilerplate and
    * generator loops from real content with zero linguistics.
    *
    * Scale shape: mapPartitions at the codec boundary (the
    * [[Multimodal]] pattern — one Deflater reused per partition),
    * O(len) per row, no shuffle. No relational oracle exists (the
    * oracle engine has no deflate), so this ships as a library
    * operator with unit contracts rather than a declared query —
    * the repo's only-oracle-checked-queries rule stays intact. */
  def compressionRatio(df: DataFrame, idCol: String, textCol: String,
      level: Int = 6, batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(level)
        val buf = new Array[Byte](1 << 16)
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, text) =>
            val raw = text.getBytes("UTF-8")
            deflater.reset()
            deflater.setInput(raw)
            deflater.finish()
            var out = 0L
            while (!deflater.finished())
              out += deflater.deflate(buf)
            (id, raw.length.toLong, out,
              if (raw.length > 0)
                graft.det.Sig.sig5(out.toDouble / raw.length.toDouble)
              else Double.NaN)
          }
        }
      }.toDF("doc_id", "raw_len", "deflate_len", "ratio")
  }

  def vocab(df: DataFrame, textCol: String, topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum("cnt").cast("double").as("n_total"),
      count(lit(1)).as("n_vocab"))
    val top = counts.orderBy(col("cnt").desc, col("token")).limit(topK)
    val wRank = Window.orderBy(col("cnt").desc, col("token"))
    top.crossJoin(broadcast(totals))
      .withColumn("rnk", row_number().over(wRank))
      .select(col("rnk").cast("long").as("rnk"), col("token"),
        col("cnt"), sig5(col("cnt") / col("n_total")).as("share"),
        col("n_vocab"))
      .orderBy("rnk")
  }

  /** Per-document top-k TF-IDF terms (Spärck Jones 1972; the
    * sklearn-convention smooth idf ln((N+1)/(df+1)) + 1 so unseen
    * and ubiquitous terms stay finite) — keyword extraction, the
    * first summarization a corpus datasheet shows per document.
    *
    * Scale shape: one (doc, token) count shuffle (the exact shuffle
    * token histograms already pay), document frequency as an
    * O(vocab) re-aggregation of THAT frame (no second corpus scan),
    * N as a 1-row broadcast, and the top-k cut as a bounded
    * [[graft.functions.TopKByScore]] heap — the window form sorted
    * ~37 scored rows per doc through a 370M-row shuffle at 10M docs
    * (287 s); the heap prunes to O(k) per doc MAP-SIDE, so only
    * docs·k rows ever shuffle. Ranking compares the sig5-ROUNDED
    * score (cross-engine ln noise cannot flip a rank), ties on
    * ascending token. */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    // per-doc (token, tf) WITHOUT the (doc, token) histogram
    // shuffle: run-length encode the sorted token array in-row (the
    // rule gate's repetition-fold move, measured 5.4x there) — a
    // NULL sentinel flushes the last run; split() never yields NULL
    // tokens, so the sentinel cannot collide
    val tfFold = expr("""aggregate(
      array_append(array_sort(w), CAST(NULL AS STRING)),
      named_struct('prev', CAST(NULL AS STRING), 'run', 0L,
        'acc', filter(array(named_struct('t', '', 'c', 0L)),
          x -> false)),
      (a, x) -> named_struct(
        'prev', x,
        'run', IF(x IS NOT NULL AND x = a.prev, a.run + 1L, 1L),
        'acc', IF(a.prev IS NOT NULL AND (x IS NULL OR x != a.prev),
          array_append(a.acc, named_struct('t', a.prev, 'c', a.run)),
          a.acc)),
      a -> a.acc)""")
    // NOT persisted, deliberately (r13 measurement): tf feeds two
    // consumers, but both exchange on `token` (dfreq's groupBy and
    // the scoring join's shuffle side), so ReuseExchange already
    // dedupes the fold+shuffle subplan — the "persist would halve"
    // hypothesis was refuted at 10M docs: bare 183.9 s, Dataset
    // cache 189.9 s (write cost eats the reuse), localCheckpoint
    // 366.5 s (RDD-block materialization costs more than the fold).
    val tf = df
      .select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("w"))
      .select(col("doc_id"), explode(tfFold).as("tc"))
      .select(col("doc_id"), col("tc.t").as("token"),
        col("tc.c").as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    // = count(DISTINCT doc_id) over tf, WITHOUT the doc-distinct
    // shuffle: ids are unique per row and split() yields >= 1 token
    // for any non-NULL text
    val nDocs = df.where(col(textCol).isNotNull)
      .agg(count(lit(1)).as("n_docs"))
    val idf = log((col("n_docs").cast("double") + lit(1.0)) /
      (col("df").cast("double") + lit(1.0))) + lit(1.0)
    // dfreq is O(vocab) — unbounded at web scale, so no broadcast
    // hint: AQE picks broadcast when it actually fits
    val scored = tf.join(dfreq, Seq("token"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("token"),
        graft.det.Sig.sig5(col("tf").cast("double") * idf)
          .as("tfidf"))
    scored.groupBy("doc_id")
      .agg(graft.functions.TopKByScore.top_k_str(k)(
        col("tfidf"), col("token")).as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("p", "e")))
      .select(col("doc_id"), (col("p") + 1).cast("long").as("rnk"),
        col("e._2").as("token"), col("e._1").as("tfidf"))
      .orderBy("doc_id", "rnk")
  }
}
