package graft

import org.apache.spark.sql.SparkSession

/** Deterministic release of block-manager residency between queries.
  *
  * Multi-consumer intermediates use eager `localCheckpoint(true)`. The
  * checkpoint's RDD blocks are freed only when the frame becomes unreachable
  * AND the ContextCleaner runs — `spark.catalog.clearCache()` never touches
  * them. In a long-lived session the stragglers occupy unified memory and
  * starve execution for later queries (round 2 shipped q19 0.99 s → 23.2 s
  * purely from a *previous* query's leaked blocks). Harnesses (Bench, Verify,
  * specs) call [[release]] after consuming each query's result.
  */
object Residency {

  /** Drop cached tables AND every persisted/checkpointed RDD's blocks.
    * Safe only once the frames built by the previous query are fully
    * consumed — a localCheckpointed RDD cannot be recomputed after its
    * blocks are gone.
    */
  def release(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    // Every stopped streaming query leaves its state-store providers loaded
    // with a periodic maintenance task (snapshotting + delta cleanup). With
    // the full cascade (7 MVs incl. the complete-mode session store) plus
    // the per-entry streaming reruns, that background churn lands inside
    // LATER timed entries. Unload the providers and stop the maintenance
    // pool; the next streaming query reloads them lazily, so this is purely
    // a residency release, not a behavior change.
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
  }

  /** RDDs still registered as persistent (0 after a successful release). */
  def residentRddCount(spark: SparkSession): Int =
    spark.sparkContext.getPersistentRDDs.size
}
