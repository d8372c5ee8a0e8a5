package graft

import org.apache.spark.sql.functions._

/** Round-14 pins: the banded production near-dup plan
  * (minhashVerifiedPairs) agrees with the exact inverted-index plan,
  * its star cap degrades pairs but never cluster connectivity, the
  * funnel strategy dispatch is value-invariant, and the AC automaton
  * serializes only its pattern list. */
class Round14Spec extends SparkSpec {

  private def fixtureDocs = {
    val s = spark
    import s.implicits._
    // three near-dup families + unrelated docs; texts long enough
    // for 3-gram shingles to discriminate
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "the quick brown fox jumps over the lazy dog"),
      (10L, "spark streams shuffle partitions across the cluster fast"),
      (11L, "spark streams shuffle partitions across the cluster slowly"),
      (20L, "completely unrelated text about gardens and flowers here"),
      (21L, "another unrelated document mentioning compilers and parsers")
    ).toDF("doc_id", "text")
  }

  test("minhashVerifiedPairs == ngramJaccardPairs (pairs AND values)") {
    val docs = fixtureDocs
    val exact = graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id",
      "text", n = 3, minJaccard = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val banded = graft.ops.Dedup.minhashVerifiedPairs(docs, "doc_id",
      "text", n = 3, minJaccard = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(exact.nonEmpty) // the fixture really has near-dups
    assert(banded.toSeq == exact.toSeq) // bitwise: same division arithmetic
  }

  test("star cap bounds the pair list but keeps cluster connectivity") {
    val s = spark
    import s.implicits._
    // one 6-member near-identical family: every banded bucket holds
    // all 6 docs, so cap=2 forces star linking
    val family = (0 until 6).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta eta theta " +
        s"iota kappa tag$i")).toDF("doc_id", "text")
    val capped = graft.ops.Dedup.minhashVerifiedPairs(family, "doc_id",
      "text", n = 3, minJaccard = 0.3, maxBucket = Some(2L))
    val pairs = capped.collect().map(r => (r.getLong(0), r.getLong(1)))
    // star form: fewer than the C(6,2)=15 all-pairs edges...
    assert(pairs.length < 15 && pairs.nonEmpty)
    // ...but the cluster frame is the full family under one rep
    val cl = graft.ops.Dedup.duplicateClustersStar(capped)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cl.map(_._2).distinct.toSeq == Seq(0L))
    assert(cl.map(_._1).sorted.toSeq == (0L until 6L))
  }

  test("funnel strategy dispatch is value-invariant on the fixture") {
    val docs = fixtureDocs.withColumn("text",
      concat_ws(" ", (1 to 5).map(_ => col("text")): _*))
    // 5x-repeated texts pass the funnel's 20-token quality floor
    val evalDocs = docs.where(col("doc_id") >= 20L)
    val corpus = docs.where(col("doc_id") < 20L)
    val exact = graft.pipeline.CorpusPipeline.funnelCounts(
      corpus, evalDocs, "doc_id", "text").collect()(0)
    val banded = graft.pipeline.CorpusPipeline.funnelCounts(
      corpus, evalDocs, "doc_id", "text",
      graft.pipeline.CorpusPipeline.BandedConfig).collect()(0)
    assert(banded == exact)
  }

  test("AcAutomaton serialized state is the pattern list, not tables") {
    val terms = (0 until 200).map(i => s"pattern$i bad term")
    val ac = new graft.functions.AcAutomaton(
      terms.map(_.getBytes("UTF-8")).toArray)
    // force the tables to exist, then serialize
    assert(ac.count("xx pattern7 bad term yy".getBytes).sum == 1L)
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(ac); oos.close()
    val patternBytes = terms.map(_.length).sum
    // serialized form ~ the pattern bytes (plus java object overhead),
    // nowhere near the ~nStates KiB dense tables (~3.6 MiB here)
    assert(bos.size() < 64 * patternBytes + 16384,
      s"AC serialized to ${bos.size()} bytes — tables leaked into the plan?")
    // and the deserialized automaton rebuilds working tables
    val in = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val ac2 = in.readObject().asInstanceOf[graft.functions.AcAutomaton]
    assert(ac2.count("pattern42 bad term pattern42 bad term".getBytes)
      .sum == 2L)
  }
}
