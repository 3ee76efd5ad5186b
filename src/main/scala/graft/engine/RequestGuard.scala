package graft.engine

import java.util.concurrent.{Executors, ScheduledFuture, Semaphore, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.spark.sql.SparkSession

/** Per-request guard shared by both query-server transports
  * ([[QueryServer]] HTTP, [[GrpcQueryServer]]): a bounded ADMISSION
  * gate (reject with a 429-style error instead of queueing work
  * unboundedly behind a slow query) and a per-request TIMEOUT enforced
  * by cancelling the request's Spark job group — the reference ships a
  * 30 s default query timeout (corkscrew.yaml:68); without one, a
  * single slow query holds a handler thread (and its permit) open
  * indefinitely.
  *
  * Mechanics: each admitted request runs under a unique job group with
  * `interruptOnCancel = true`; a shared single-thread watchdog cancels
  * the group when the deadline passes, which aborts the request's
  * RUNNING and FUTURE Spark jobs (the collect in flight throws and the
  * handler maps it to a timeout error). Driver-side planning that has
  * not submitted a job yet is not interruptible — the timeout bounds
  * cluster work, which is where the cost is. Job group and deadline are
  * per-thread/per-request; the FAIR scheduler-pool local property is
  * orthogonal and untouched.
  *
  * `timeoutMs <= 0` disables the timeout; `maxInFlight <= 0` disables
  * admission control (both still release cleanly).
  */
private[engine] final class RequestGuard(spark: SparkSession,
    maxInFlight: Int, timeoutMs: Long) {

  private val permits =
    if (maxInFlight > 0) new Semaphore(maxInFlight) else null
  private val seq = new AtomicLong(0)
  private lazy val watchdog = {
    val ex = Executors.newSingleThreadScheduledExecutor { (r: Runnable) =>
      val t = new Thread(r, "graft-server-watchdog")
      t.setDaemon(true)
      t
    }
    ex
  }

  /** Outcome statuses the transports map to their wire shape. */
  val StatusOk = 200
  val StatusTimeout = 408
  val StatusBusy = 429

  private def timeoutResult: (Int, String) =
    (StatusTimeout, s"""{"error":${QueryWire.jstr(
      s"query timeout after ${timeoutMs}ms (job group cancelled)")}}""")

  /** Run `body` (which carries the transport's own status + rendered
    * payload, including its error rendering) under admission + timeout.
    * 429 with an error JSON when the in-flight bound is hit; 408 with an
    * error JSON when the watchdog cancelled the request's job group —
    * the override is checked AFTER `body`, so a cancellation the
    * transport's catch-all rendered as a generic 400 still reports as
    * the timeout it was.
    */
  def run(body: => (Int, String)): (Int, String) = {
    if (permits != null && !permits.tryAcquire())
      return (StatusBusy, s"""{"error":"server at capacity ($maxInFlight requests in flight); retry"}""")
    val group = s"graft-req-${seq.incrementAndGet()}"
    val timedOut = new AtomicBoolean(false)
    var cancel: ScheduledFuture[_] = null
    try {
      spark.sparkContext.setJobGroup(group,
        s"graft query-server request (timeout ${timeoutMs}ms)",
        interruptOnCancel = true)
      if (timeoutMs > 0)
        // REPEATING cancel ticks from the deadline on: cancelJobGroup
        // only aborts jobs running at that instant — a job the request
        // submits after the deadline (driver-side planning ran long)
        // would otherwise start fresh and run to completion. The ticks
        // stop in the finally below when the request ends.
        cancel = watchdog.scheduleWithFixedDelay(new Runnable {
          override def run(): Unit = {
            timedOut.set(true)
            spark.sparkContext.cancelJobGroup(group)
          }
        }, timeoutMs, math.max(50L, timeoutMs / 4), TimeUnit.MILLISECONDS)
      val r = try body catch {
        case _: Exception if timedOut.get() => timeoutResult
      }
      // A request that still completed OK at the deadline edge keeps its
      // result; a non-OK outcome after the cancel fired is the timeout.
      if (timedOut.get() && r._1 != StatusOk) timeoutResult else r
    } finally {
      if (cancel != null) cancel.cancel(false)
      spark.sparkContext.clearJobGroup()
      if (permits != null) permits.release()
    }
  }
}
