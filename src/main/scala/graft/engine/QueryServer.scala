package graft.engine

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

/** Thin remote query API over the engine — the Spark twin of corkscrew's
  * gRPC `ExecuteQuery(sql) → {columns, rows, error}`
  * (internal/server/api_server.go:127-180). HTTP+JSON on the JDK's
  * built-in server (no extra dependencies): POST a SQL string to
  * `/query`, get `{"columns":[{name,type,nullable}],"rows":[[..]],
  * "rowCount":n,"durationMs":ms}` back, or `{"error": "..."}` with
  * status 400. The statement-class guard (E4) runs before execution, so
  * DDL/DML is rejected exactly as in the reference's deny-list path.
  *
  * The server is a driver-side component: queries execute on the cluster
  * through the shared SparkSession. Requests are handled CONCURRENTLY on
  * a bounded daemon pool (the reference serves concurrent gRPC clients,
  * api_server.go:127-180); Spark's scheduler interleaves the resulting
  * jobs — under `spark.scheduler.mode=FAIR` each request's jobs land in
  * the pool named by `graft.server.pool` (round-robin across jobs
  * instead of FIFO head-of-line blocking). SparkSession is thread-safe
  * for concurrent `sql(...)+collect()` by contract; local properties
  * (the scheduler pool) are per-thread, so requests never clobber each
  * other's.
  */
class QueryServer(spark: SparkSession, port: Int = 0,
    handlerThreads: Int = 16, timeoutMs: Long = 30000L,
    maxInFlight: Int = 64) {

  // Per-request timeout (reference default: 30 s, corkscrew.yaml:68 —
  // enforced by job-group cancel so a slow query stops burning cluster
  // work, not just the connection) + bounded admission (maxInFlight
  // concurrent requests; excess gets 429 instead of queueing without
  // bound behind a slow one). See [[RequestGuard]].
  private val guard = new RequestGuard(spark, maxInFlight, timeoutMs)

  private val server: HttpServer =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  server.createContext("/query", (exchange: HttpExchange) => handle(exchange))
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(
    handlerThreads,
    (r: Runnable) => {
      val t = new Thread(r, "graft-query-server")
      t.setDaemon(true) // never pin a driver JVM open past main
      t
    })
  server.setExecutor(pool)

  /** Bound port (useful when constructed with port 0). */
  def boundPort: Int = server.getAddress.getPort

  // Long-lived-session hygiene: operator checkpoint frames orphaned by
  // finished requests are only reclaimed when a GC proves them dead
  // (ContextCleaner). Nudge periodically so a soak of checkpoint-heavy
  // queries keeps flat latency; QueryCache entries stay referenced by the
  // cache map and survive (see graft.Hygiene).
  private val served = new java.util.concurrent.atomic.AtomicLong(0)
  private val gcEvery = 16L

  def start(): Unit = server.start()

  /** Graceful stop: drains in-flight exchanges (up to 1 s) before
    * returning, then waits for the handler pool to terminate — callers
    * that `spark.stop()` immediately afterwards (SoakServer, specs)
    * must not race handler threads still running Spark jobs.
    */
  def stop(): Unit = {
    server.stop(1)
    pool.shutdown()
    pool.awaitTermination(5, java.util.concurrent.TimeUnit.SECONDS)
    ()
  }

  private def handle(exchange: HttpExchange): Unit = {
    // FAIR-pool routing (local property = per-thread, so pooled handler
    // threads each route their own requests; no cross-request clobber).
    // `per-thread` gives every handler thread its own dynamically-created
    // pool — under spark.scheduler.mode=FAIR, scheduling is round-robin
    // ACROSS pools (inside one named pool it would still be FIFO), which
    // is what stops one heavy client head-of-line-blocking the rest. A
    // fixed name routes everything into that single pool. No-op under
    // the default FIFO scheduler.
    spark.conf.getOption("graft.server.pool").foreach { p =>
      val pool = if (p == "per-thread")
        s"graft-req-${Thread.currentThread().getId}" else p
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
    }
    val (status, body) =
      if (exchange.getRequestMethod != "POST")
        (405, """{"error":"POST a SQL string to /query"}""")
      else {
        val sql = new String(exchange.getRequestBody.readAllBytes(), UTF_8)
        guard.run {
          try (200, QueryWire.render(QueryEngine.execute(spark, sql)))
          catch {
            case e: QueryEngine.QueryValidationError =>
              (400, s"""{"error":${QueryWire.jstr(e.message)}}""")
            case e: Exception =>
              (400, QueryWire.renderError(spark, e))
          }
        }
      }
    val bytes = body.getBytes(UTF_8)
    exchange.getResponseHeaders.set("Content-Type", "application/json")
    exchange.sendResponseHeaders(status, bytes.length)
    val os = exchange.getResponseBody
    try os.write(bytes) finally os.close()
    if (served.incrementAndGet() % gcEvery == 0) graft.Hygiene.gcNudge()
  }
}
