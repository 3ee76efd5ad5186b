package graft

import org.apache.spark.sql.SparkSession

/** Session storage hygiene. Operators use eager `localCheckpoint` frames as
  * materialization barriers (Dedup/Similarity/Graph); their blocks live
  * until the consuming action finishes AND the frame objects are GC'd
  * (ContextCleaner is GC-driven). A long-lived session that runs many such
  * queries — the bench loop, the query server — accumulates checkpoint
  * blocks and slows 2-6x under storage pressure (measured in round 2:
  * q_c3 2.0s warm-isolated vs 25.3s late in a contaminated bench session).
  */
object Hygiene {

  /** Unpersist everything the session currently holds: cached tables /
    * datasets, persisted RDDs (which includes `localCheckpoint` blocks),
    * then nudge GC so ContextCleaner reaps checkpoint and broadcast state.
    *
    * Safe only BETWEEN queries: a locally-checkpointed frame cannot
    * recompute once its blocks are dropped (lineage is truncated), so
    * callers must not hold un-acted DataFrames across a release().
    */
  def release(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    spark.catalog.clearCache()
    gcNudge()
  }

  /** GC-only hygiene for sessions that must keep their managed caches
    * (e.g. the query server's TTL'd QueryCache entries stay referenced and
    * survive; orphaned operator checkpoint frames do not — ContextCleaner
    * frees their blocks once the GC proves them unreachable).
    */
  def gcNudge(): Unit = {
    System.gc()
    System.runFinalization()
  }
}
