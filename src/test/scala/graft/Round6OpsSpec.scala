package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Dedup, KMeansOp, TextStats}

/** Round-6 operators and plan-shape guarantees: distributed
  * vocabulary top-k, capped semantic dedup, exact heavy hitters. */
class Round6OpsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))
  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, docSchema)

  // ---------------------------------------------------------------
  // vocab: scale shape
  // ---------------------------------------------------------------

  test("vocab: head is a distributed TakeOrderedAndProject, not a " +
      "full-vocab single-partition window") {
    val d = docs((0L until 20L).map(i => i -> s"tok$i common common"): _*)
    val q = TextStats.vocab(d, "text", topK = 3)
    val rows = q.collect()
    // 21 distinct tokens: common=40, tok0..tok19=1 → head is common,
    // then ties broken by token order.
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq == Seq((1L, "common", 40L), (2L, "tok0", 1L),
        (3L, "tok1", 1L)))
    assert(rows.forall(_.getAs[Long]("n_vocab") == 21L))
    assert(math.abs(rows(0).getAs[Double]("share") - 40.0 / 60) < 1e-4)
    // The plan must take the head via a per-partition top-k heap
    // (TakeOrderedAndProject) so only k·partitions rows leave any
    // executor; a billion-token vocabulary never crosses one
    // partition. The (bounded) rank window sits ABOVE that limit.
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab head must plan as TakeOrderedAndProject, got:\n$plan")
  }

  // ---------------------------------------------------------------
  // SemDeDup maxCluster cap
  // ---------------------------------------------------------------

  test("semanticDupPairs: maxCluster turns an adversarial cell into " +
      "star edges, connectivity unchanged") {
    // the SemDeDup worst case: many near-identical embeddings all
    // landing in ONE cell — uncapped that is C(m,2) pairs
    val vecSchema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    val blob = spark.createDataFrame(
      (0L until 100L).map(i => Row(i, Seq(1.0, 2.0, 3.0, 4.0))).asJava,
      vecSchema)
    val capped = KMeansOp.semanticDupPairs(blob, "vec_id", "embedding",
      seedLo = 0L, seedHi = 1L, dim = 4, minCosine = 0.9,
      maxCluster = Some(50L))
    val cRows = capped.collect()
    // star linking: m−1 edges, every one anchored at the cell's min id
    assert(cRows.length == 99)
    assert(cRows.forall(r => r.getAs[Long]("id_a") == 0L))
    assert(cRows.forall(r => r.getAs[Double]("cosine") == 1.0))
    val uncapped = KMeansOp.semanticDupPairs(blob, "vec_id", "embedding",
      seedLo = 0L, seedHi = 1L, dim = 4, minCosine = 0.9,
      maxCluster = None)
    assert(uncapped.count() == 100L * 99 / 2) // the quadratic blow-up
    // the keep-one decision the pairs feed is identical: same
    // clusters, same representatives
    val cc = Dedup.duplicateClusters(capped).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cu = Dedup.duplicateClusters(uncapped).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cc == cu)
  }
}
