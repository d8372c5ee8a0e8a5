package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter decontamination prefilter — the map-only candidate
  * cut that makes benchmark decontamination affordable at corpus
  * scale. [[Dedup.contaminationPairs]] joins the FULL training
  * shingle index against the eval index: correct, but the shuffle
  * carries every training document's shingles even though almost
  * none of them overlap any eval doc. This operator first folds the
  * (small) eval shingle set into a Bloom bitset, broadcasts it, and
  * drops every training document none of whose shingles can be in
  * the eval set — a pure Scan→Project→Filter with NO shuffle — then
  * runs the exact overlap join on the surviving sliver.
  *
  * Bloom filters have no false negatives, so the prefilter provably
  * loses nothing: any training doc sharing ≥1 shingle with the eval
  * set survives, and the composed result is IDENTICAL to the
  * unfiltered exact join (the declared query's oracle is exactly
  * that). False positives only cost wasted candidates (rate
  * (1−e^(−kn/m))^k ≈ 1e-5 at the defaults for a 15k-shingle eval
  * set).
  *
  * Built relationally on purpose: the bitset is ~m/64 longs as ONE
  * map<long,long> row (bit_or aggregation of per-position masks),
  * broadcast-crossJoined; membership is pure builtin arithmetic
  * (xxhash64 + pmod + shiftleft + bitwiseAND) inside an `exists`
  * lambda over the doc's gram array — no UDF, no driver-side sketch
  * object to serialize, deterministic everywhere.
  *
  * The hot-shingle df cap (CCNet skew guard) is computed on the FULL
  * training corpus before filtering — computing it on the candidate
  * set would under-count document frequencies and could keep a
  * boilerplate shingle the exact path drops. That pass is one
  * map-side-combined aggregation emitting a tiny hot set; the
  * expensive pair join never sees non-candidates.
  */
object BloomPrefilter {

  /** Bloom bitset over `keys` (a LongType `shingle` column) as a
    * single-row DENSE array<bigint> of m/64 words (128 KiB at the
    * default m=2^20 — bounded by the parameter, not the data, the
    * same driver-state contract as the IVF codebooks).
    *
    * Dense-array form is the load-bearing choice: `element_at` on a
    * Catalyst map is a LINEAR scan of the ~m/64 entries, so a sparse
    * map<word,bits> bitset pays ~16k key comparisons PER PROBE —
    * measured r6, it dominated the whole decontamination probe (the
    * map-form prefilter ran 3× slower than the unfiltered exact
    * join it was supposed to beat). Array `element_at` is O(1). */
  def buildBits(keys: DataFrame, mBits: Long, nHashes: Int): DataFrame = {
    val words = keys
      .select(explode(array((0 until nHashes).map(j =>
        pmod(xxhash64(lit(j.toLong), col("shingle")), lit(mBits))): _*))
        .as("pos"))
      .select((col("pos") / lit(64L)).cast("long").as("w"),
        call_function("shiftleft", lit(1L),
          pmod(col("pos"), lit(64L)).cast("int")).as("m"))
      .groupBy("w")
      .agg(call_function("bit_or", col("m")).as("bits"))
      .collect() // ≤ m/64 rows — parameter-bounded, like a codebook
    val arr = new Array[Long](((mBits + 63L) / 64L).toInt)
    words.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    keys.sparkSession.range(1).select(typedlit(arr.toSeq).as("bloom"))
  }

  /** All `nHashes` bit probes for `key` against the dense bitset
    * array (1-based element_at; every word index is in range by
    * construction). */
  def mightContain(bloom: Column, key: Column, mBits: Long,
      nHashes: Int): Column =
    (0 until nHashes).map { j =>
      val pos = pmod(xxhash64(lit(j.toLong), key), lit(mBits))
      val word = element_at(bloom, (pos / lit(64L)).cast("int") + 1)
      val mask = call_function("shiftleft", lit(1L),
        pmod(pos, lit(64L)).cast("int"))
      word.bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)

  /** The distinct hashed-n-gram array of `textCol` as a column —
    * the array (not exploded) twin of [[Dedup.shingleIndex]]'s gram
    * construction, value-identical hashes. `hw` must be the
    * materialized token-hash array projection (HOF-CSE rule: the
    * lambda below reads it per element). */
  private def gramArray(hw: Column, n: Int): Column = {
    val grams = transform(sequence(lit(0), size(hw) - n), i =>
      xxhash64((0 until n).map(k => element_at(hw, i + k + 1)): _*))
    when(size(hw) >= n, array_distinct(grams))
      .otherwise(array().cast("array<bigint>"))
  }

  /** A helper-column name that does not collide with `taken` (the
    * same probe pattern as SkewJoin.saltedEquiJoin's `__salt`). */
  private def freshName(base: String, taken: Seq[String]): String =
    Iterator.from(0)
      .map(i => if (i == 0) base else s"$base$i")
      .find(n => !taken.contains(n)).get

  /** Training docs that MIGHT share a shingle with the eval set:
    * map-only Bloom probe over each doc's gram array (keeps the
    * original schema). Guaranteed superset of the docs the exact
    * join would match. Helper columns are collision-probed against
    * the input schema, so a training frame that already has a
    * `bloom` (or `__hw`/`__gs`) column profiles unchanged. */
  def bloomCandidates(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 3, maxDf: Option[Long] = None,
      mBits: Long = 1L << 20, nHashes: Int = 4): DataFrame = {
    val evalShingles = Dedup.shingleIndex(eval, idCol, textCol, n, maxDf)
      .select("shingle").distinct()
    val cols = train.columns
    val bloomC = freshName("__bloom", cols)
    val hwC = freshName("__hw", cols)
    val gsC = freshName("__gs", cols)
    val bloom = buildBits(evalShingles, mBits, nHashes)
      .withColumnRenamed("bloom", bloomC)
    train
      .withColumn(hwC,
        transform(split(col(textCol), " "), t => xxhash64(t)))
      .withColumn(gsC, gramArray(col(hwC), n))
      .crossJoin(broadcast(bloom))
      .where(exists(col(gsC),
        g => mightContain(col(bloomC), g, mBits, nHashes)))
      .select(cols.map(col): _*)
  }

  /** Ingest-time contamination flag: every row of `df` keeps its
    * schema and gains a `maybe_contaminated` boolean — true iff some
    * n-gram of the document MIGHT be in the eval set's Bloom bitset.
    * `false` is definitive (no false negatives); `true` routes the
    * doc to the exact [[Dedup.contaminationPairs]] audit.
    *
    * The probe is a pure Scan→Project against a broadcast 1-row
    * bitset — no shuffle, no state — so `df` may be a STREAMING frame
    * (stream-static broadcast join, append-safe): this is the
    * ingest-time guard of a training pipeline, flagging contaminated
    * documents as they arrive with the batch path as backfill/audit
    * (StreamingSpec asserts stream/batch flag equality). */
  def flagMaybeContaminated(df: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      maxDf: Option[Long] = None, mBits: Long = 1L << 20,
      nHashes: Int = 4): DataFrame = {
    val evalShingles = Dedup.shingleIndex(eval, idCol, textCol, n, maxDf)
      .select("shingle").distinct()
    val cols = df.columns
    val bloomC = freshName("__bloom", cols)
    val hwC = freshName("__hw", cols)
    val gsC = freshName("__gs", cols)
    val bloom = buildBits(evalShingles, mBits, nHashes)
      .withColumnRenamed("bloom", bloomC)
    df.withColumn(hwC,
        transform(split(col(textCol), " "), t => xxhash64(t)))
      .withColumn(gsC, gramArray(col(hwC), n))
      .crossJoin(broadcast(bloom))
      .withColumn("maybe_contaminated", exists(col(gsC),
        g => mightContain(col(bloomC), g, mBits, nHashes)))
      .select(cols.map(col) :+ col("maybe_contaminated"): _*)
  }

  /** Exact decontamination through the Bloom prefilter: identical
    * result to [[Dedup.contaminationPairs]] on the full inputs (no
    * false negatives), with the pair join reduced to candidates.
    *
    * Single-corpus-pass shape (r6): the probe runs per INDEX ROW,
    * not per document — one corpus-wide gram scan feeds a map-only
    * bitset filter, and the surviving sliver (eval-matching grams
    * plus a ~1e-5 false-positive tail — small by the prefilter's own
    * premise) is materialized once. Both the df-cap hot set and the
    * pair join then read that materialized sliver, so the corpus
    * text is scanned exactly once.
    *
    * The df cap stays FULL-corpus exact without a second pass: the
    * probe is a pure function of the shingle value, so for any
    * surviving shingle the sliver retains EVERY (doc, shingle)
    * occurrence — its document frequency over the sliver equals its
    * document frequency over the whole corpus. Shingles the probe
    * drops can never join the eval index (no false negatives), so
    * their df is irrelevant. Computing df on a doc-level candidate
    * subset would under-count (the class used to pay a second
    * full-corpus shingleIndex pass to avoid exactly that). */
  def bloomDecontaminate(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 3, minShared: Long = 5L,
      maxDf: Option[Long] = None, mBits: Long = 1L << 20,
      nHashes: Int = 4): DataFrame = {
    val evalShingles = Dedup.shingleIndex(eval, idCol, textCol, n, maxDf)
      .select("shingle").distinct()
    val bloom = buildBits(evalShingles, mBits, nHashes)
    val idx = Dedup.shingleIndex(train, idCol, textCol, n, None)
    val probed = Materialize.materialize(
      idx.crossJoin(broadcast(bloom))
        .where(mightContain(col("bloom"), col("shingle"), mBits,
          nHashes))
        .select("id", "shingle"))
    val ti = (maxDf match {
      case None => probed
      case Some(cap) =>
        // exact full-corpus df for every surviving shingle (see
        // scaladoc); the hot set is tiny by construction (> cap docs
        // each) → broadcast anti-join
        val hot = probed.groupBy("shingle")
          .agg(count(lit(1)).as("df"))
          .where(col("df") > cap).select("shingle")
        probed.join(broadcast(hot), Seq("shingle"), "left_anti")
    }).select(col("id").as("train_id"), col("shingle"))
    val ei = Dedup.shingleIndex(eval, idCol, textCol, n, maxDf)
      .select(col("id").as("eval_id"), col("shingle"))
    val evalSizes = ei.groupBy("eval_id").agg(count(lit(1)).as("esz"))
    ei.join(ti, Seq("shingle"))
      .groupBy("eval_id", "train_id")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .join(evalSizes, Seq("eval_id"))
      .select(col("eval_id"), col("train_id"), col("n_shared"),
        graft.det.Sig.sig5(
          col("n_shared").cast("double") / col("esz")).as("overlap"))
      .orderBy("eval_id", "train_id")
  }
}
