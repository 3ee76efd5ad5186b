package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Materialization-barrier policy. The iterative operators (Dedup,
  * Similarity, Graph) cut lineage at hot frames so Catalyst never
  * re-inlines an expensive subtree (HOF lambdas re-running normalize+split
  * per element) and per-round plans stay O(1). The CUT is a semantic
  * necessity; HOW the cut frame is stored is an operational policy:
  *
  *  - `graft.barrier=local` (default on local[*] masters): eager
  *    `localCheckpoint` —
  *    unreplicated executor-local blocks, zero write amplification, the
  *    right call for single-host and short-lived jobs. But lineage is
  *    truncated, so a lost block (executor death, external memory
  *    pressure evicting a block) FAILS the job instead of recomputing —
  *    SCALE.md records a real sf1eq in-sweep failure of exactly this
  *    shape.
  *  - `graft.barrier=reliable`: cluster-safe. With a checkpoint dir
  *    configured (`sparkContext.setCheckpointDir`, HDFS/S3 in
  *    production), frames `checkpoint()` to replicated storage — lineage
  *    truncation is then safe because the storage survives executor
  *    loss. Without a checkpoint dir, frames fall back to DISK_ONLY
  *    persist, which KEEPS lineage: a lost block recomputes from source
  *    instead of killing a multi-hour run.
  *
  * Set the policy per session: `spark.conf.set("graft.barrier",
  * "reliable")`. Every operator site routes through [[BarrierOps.barrier]],
  * so one config flips the whole engine. A third value, `none`, disables
  * barriers entirely (frames pass through with full lineage) — for plan
  * inspection and CI plan guards only, never production.
  *
  * DEFAULT RESOLUTION (safe-by-default): when neither the session conf
  * nor `GRAFT_BARRIER` sets a policy, the default is `local` on a
  * local master (`sparkContext.isLocal` — single JVM, executor death
  * kills the driver too, so localCheckpoint's failure mode adds no new
  * risk and avoids write amplification) and `reliable` on a real
  * cluster (executor loss is routine there; a 1000-executor job that
  * loses one container must recompute, not die). An explicit conf or
  * env value always wins over the master-based default.
  */
object Barrier {

  val ConfKey = "graft.barrier"

  /** Session conf wins; `GRAFT_BARRIER` in the environment is the
    * spark-submit-friendly fallback (a plain `graft.*` key doesn't ride
    * through `-D` system properties the way `spark.*` keys do).
    */
  def policy(ds: Dataset[_]): String =
    resolve(
      ds.sparkSession.conf.getOption(ConfKey),
      sys.env.get("GRAFT_BARRIER"),
      ds.sparkSession.sparkContext.isLocal)

  /** Pure resolution matrix (pinned by BarrierSpec): explicit session
    * conf > environment fallback > master-based default (`local` on a
    * local master, `reliable` on a cluster).
    */
  def resolve(conf: Option[String], env: Option[String], isLocal: Boolean): String =
    conf.orElse(env).getOrElse(if (isLocal) "local" else "reliable")

  /** Cut lineage (or durably pin) `ds` according to the session policy.
    * `eager` mirrors `localCheckpoint(eager)`: materialize now vs at
    * first action.
    */
  def cut[T](ds: Dataset[T], eager: Boolean): Dataset[T] = policy(ds) match {
    // Diagnostic/test policy: no materialization at all — the frame keeps
    // its full lineage so plan-quality guards (and .explain users) can see
    // the subtree a barrier would otherwise truncate. Never the right
    // choice for real runs: the semantic re-inlining the barrier prevents
    // comes back.
    case "none" => ds
    case "reliable" =>
      val sc = ds.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty)
        sys.env.get("GRAFT_CHECKPOINT_DIR").foreach(sc.setCheckpointDir)
      if (sc.getCheckpointDir.isDefined) ds.checkpoint(eager)
      else {
        // No durable dir: DISK_ONLY persist keeps lineage, so block loss
        // recomputes. MEMORY variants would be faster but re-introduce
        // the eviction-under-pressure window the policy exists to close.
        val p = ds.persist(StorageLevel.DISK_ONLY)
        if (eager) { p.count(); () }
        p
      }
    case _ => ds.localCheckpoint(eager)
  }

  implicit class BarrierOps[T](private val ds: Dataset[T]) extends AnyVal {
    /** Policy-routed materialization barrier — see [[Barrier]]. */
    def barrier(eager: Boolean = true): Dataset[T] = Barrier.cut(ds, eager)
  }
}
