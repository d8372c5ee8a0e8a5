package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

/** Loss-aware mixture reweighting: hard domains get larger shares,
  * equal-loss domains split evenly, budget is respected. */
class MixtureLossSpec extends SparkSpec {

  import spark.implicits._

  test("a domain of rare tokens (high NLL) is upweighted over a " +
      "domain of one repeated token; equal domains share evenly") {
    // easy: every doc is the same common word (NLL ~ -ln(share of
    // 'common')); hard: each doc has unique rare tokens
    val docs = ((0L until 40L).map(i =>
        (i, "common common common common", "easy")) ++
      (40L until 80L).map(i =>
        (i, s"rare$i word$i tok$i only$i", "hard")) ++
      (80L until 120L).map(i =>
        (i, "common common common common", "easy2")))
      .toDF("doc_id", "text", "source")
    val out = Sampling.mixtureByLoss(docs, "doc_id", "text",
        "source", budget = 1000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getLong(4)))).toMap
    assert(out.keySet === Set("easy", "easy2", "hard"))
    val (nE, nllE, shE, qE) = out("easy")
    val (_, nllE2, shE2, _) = out("easy2")
    val (nH, nllH, shH, qH) = out("hard")
    assert(nE === 40L && nH === 40L)
    assert(nllH > nllE, "rare tokens carry higher NLL")
    assert(shH > shE, "the hard domain is upweighted")
    assert(nllE === nllE2 && shE === shE2,
      "identical domains get identical canon shares")
    assert(qH > qE)
    // quotas respect the budget (floors can undershoot, never over)
    assert(out.values.map(_._4).sum <= 1000L)
    // shares are a distribution (within sig5 granularity)
    val total = out.values.map(_._3).sum
    assert(math.abs(total - 1.0) < 1e-3, s"share sum $total")
  }
}
