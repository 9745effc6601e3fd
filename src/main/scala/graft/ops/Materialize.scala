package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage-truncating materialization for the iterative operators
  * (connected components, incremental dedup, IVF build): each round's
  * result must be cut loose from its lineage or plan size and compile time
  * grow linearly with rounds.
  *
  * Two modes (round-3 verdict item #3):
  *
  *  - `reliable = false` (default): `localCheckpoint()` — blocks live on
  *    executor local storage. Fastest, but blocks are LOST on executor
  *    failure and the truncated lineage means they are unrecoverable: a
  *    multi-hour iterative job on a real cluster dies with no restart path.
  *    The right mode for local runs, tests, and short jobs.
  *
  *  - `reliable = true`: `checkpoint()` to the SparkContext checkpoint
  *    directory (`spark.sparkContext.setCheckpointDir(...)` — point it at
  *    durable shared storage on a cluster). Each round pays a write to that
  *    storage, and in exchange any executor can be lost and replaced
  *    mid-job. The right mode for long iterative jobs at scale.
  */
object Materialize {

  def stable(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) {
      require(
        df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "reliable materialization needs sparkContext.setCheckpointDir " +
          "(durable shared storage on a cluster)")
      df.checkpoint()
    } else df.localCheckpoint()

  /** LAZY variant (round-8): the checkpoint materializes with the FIRST
    * action over the returned frame instead of running its own job. Use
    * when the very next statement probes the frame anyway (the iterative
    * operators' materialize-then-aggregate pairs) — the probe and the
    * checkpoint then share ONE job, halving the driver actions per
    * round. NOT for frames whose sources are deleted before the first
    * action (compaction folds need `stable`'s eagerness).
    */
  def stableLazy(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) {
      require(
        df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "reliable materialization needs sparkContext.setCheckpointDir " +
          "(durable shared storage on a cluster)")
      df.checkpoint(eager = false)
    } else df.localCheckpoint(eager = false)
}
