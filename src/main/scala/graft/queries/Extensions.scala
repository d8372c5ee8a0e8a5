package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM-data-pipeline extension queries (dedup, similarity search, text
  * analysis, multimodal, streaming-equivalent, star-schema joins).
  * Populated incrementally; see graft.ops.* for the operator impls. */
object Extensions {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracle: Map[String, String] = Map()
}
