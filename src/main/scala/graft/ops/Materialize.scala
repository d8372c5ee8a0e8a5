package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage-truncating materialization for iterative algorithms.
  *
  * Iterative plans (connected components, the corpus funnel) must cut
  * their lineage each round or round N replays rounds 1..N−1. Two
  * mechanisms exist, with different fault-tolerance:
  *
  *  - `localCheckpoint(eager = true)`: blocks live in executor
  *    storage with NO lineage to recompute them — fast (no
  *    filesystem round-trip), but one lost executor mid-iteration
  *    kills a multi-hour job. Right for local / single-JVM runs.
  *  - `checkpoint(eager = true)`: blocks go to the reliable
  *    checkpoint directory (HDFS/object store on a cluster) and
  *    survive executor loss. Right for long-running 100 TB jobs.
  *
  * [[materialize]] picks reliable checkpointing exactly when the
  * SparkContext has a checkpoint dir configured
  * (`sc.setCheckpointDir(...)`), so a production job opts in with
  * one line of cluster setup and local tests stay fast by default.
  * The session conf `spark.graft.checkpoint.reliable` overrides:
  * `"false"` forces localCheckpoint even with a dir set, `"true"`
  * demands reliable (and fails loudly if no dir is configured —
  * silently degrading to executor-local blocks would defeat the
  * reason the caller asked for it).
  */
object Materialize {

  val ConfKey = "spark.graft.checkpoint.reliable"

  /** Unpersist the storage blocks behind a [[materialize]]d frame.
    * localCheckpoint blocks otherwise sit in executor storage until
    * the ContextCleaner happens to GC the RDD — repeated audits in a
    * long session accumulate them (advisor r16). Call ONLY once no
    * surviving plan references the frame: a localCheckpoint has no
    * lineage, so a consumer executed after release would fail rather
    * than recompute. No-op for frames that are not checkpoint-backed;
    * reliable-checkpoint files stay on disk (owned by the checkpoint
    * dir). */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))

  def materialize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val dirSet = spark.sparkContext.getCheckpointDir.isDefined
    spark.conf.get(ConfKey, "auto") match {
      case "true" =>
        require(dirSet, s"$ConfKey=true but no checkpoint dir is " +
          "configured — call sc.setCheckpointDir(...) first")
        df.checkpoint(true)
      case "false" => df.localCheckpoint(true)
      case _ => if (dirSet) df.checkpoint(true)
        else df.localCheckpoint(true)
    }
  }
}
