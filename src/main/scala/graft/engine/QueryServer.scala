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
  * through the shared SparkSession; concurrency is handled by Spark's
  * scheduler (FAIR pool if configured), mirroring the reference's shared
  * engine behind its gRPC server.
  */
class QueryServer(spark: SparkSession, port: Int = 0) {

  private val server: HttpServer =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  server.createContext("/query", (exchange: HttpExchange) => handle(exchange))
  server.setExecutor(null) // serial; Spark schedules the real work

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
  def stop(): Unit = server.stop(0)

  private def handle(exchange: HttpExchange): Unit = {
    val (status, body) =
      if (exchange.getRequestMethod != "POST")
        (405, """{"error":"POST a SQL string to /query"}""")
      else {
        val sql = new String(exchange.getRequestBody.readAllBytes(), UTF_8)
        try (200, QueryWire.render(QueryEngine.execute(spark, sql)))
        catch {
          case e: QueryEngine.QueryValidationError =>
            (400, s"""{"error":${QueryWire.jstr(e.message)}}""")
          case e: Exception =>
            (400, QueryWire.renderError(spark, e))
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
