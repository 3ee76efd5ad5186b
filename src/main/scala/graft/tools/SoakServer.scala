package graft.tools

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession

/** QueryServer soak: N mixed requests through the HTTP query API on one
  * long-lived session, reporting first/last-decile latency — the check
  * that session hygiene keeps a server flat instead of degrading as
  * operator/cache blocks accumulate (round-2 verdict item 1). Since
  * round 13 the soak is CONCURRENT: C parallel clients (each its own
  * HTTP connection and request stream, mixed query set offset per
  * client) against the server's handler pool with FAIR scheduling and
  * per-thread pools — the reference serves concurrent gRPC clients
  * (api_server.go:127-180), so flat latency must hold under overlap,
  * not just in sequence. Per-client AND aggregate deciles print;
  * cross-query interference shows up as a last/first ratio drift or a
  * fat p99.
  *
  * Usage: runMain graft.tools.SoakServer [requests-total] [clients]
  * (clients=1 reproduces the old sequential soak)
  */
object SoakServer {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(120)
    val clients = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("graft.server.pool", "per-thread")
    graft.Tables.register(spark, sfDir)
    graft.functions.JsonMacros.register(spark)
    val server = new graft.engine.QueryServer(spark)
    server.start()
    val url = URI.create(s"http://127.0.0.1:${server.boundPort}/query")
    val sqls = Seq(
      "SELECT l_returnflag, sum(l_quantity) FROM lineitem GROUP BY 1",
      "SELECT event_type, COUNT(*) FROM events GROUP BY 1",
      "SELECT lang, COUNT(*) FROM documents GROUP BY 1",
      "SELECT o_orderpriority, avg(o_totalprice) FROM orders GROUP BY 1",
      "SELECT n_name, COUNT(*) FROM nation JOIN customer ON n_nationkey = c_nationkey GROUP BY 1",
      "SELECT extract_json(to_json(named_struct('a', p_partkey)), '$.a') FROM part LIMIT 5")

    val perClient = n / clients
    val errors = new java.util.concurrent.atomic.AtomicInteger(0)
    val lats: Array[Array[Double]] = Array.ofDim(clients, perClient)
    val threads = (0 until clients).map { c =>
      new Thread(() => {
        val client = HttpClient.newHttpClient()
        for (i <- 0 until perClient) {
          val sql = sqls((c + i) % sqls.length) // offset: clients overlap on
          // different queries at any instant — the interference shape
          val t0 = System.nanoTime()
          try {
            val resp = client.send(
              HttpRequest.newBuilder(url)
                .POST(HttpRequest.BodyPublishers.ofString(sql)).build(),
              HttpResponse.BodyHandlers.ofString())
            if (resp.statusCode() != 200) {
              errors.incrementAndGet()
              System.err.println(
                s"[soak] c$c#$i HTTP ${resp.statusCode()}: ${resp.body().take(160)}")
            }
          } catch {
            case e: Exception =>
              errors.incrementAndGet()
              System.err.println(s"[soak] c$c#$i ${e.getMessage}")
          }
          lats(c)(i) = (System.nanoTime() - t0) / 1e6
        }
      }, s"soak-client-$c")
    }
    val wall0 = System.nanoTime()
    threads.foreach(_.start())
    threads.foreach(_.join())
    val wall = (System.nanoTime() - wall0) / 1e9

    def decile(xs: Array[Double], first: Boolean): Double = {
      val d = math.max(1, xs.length / 10)
      val slice = if (first) xs.slice(d, 2 * d) else xs.takeRight(d)
      slice.sum / slice.length
    }
    for (c <- 0 until clients) {
      val f = decile(lats(c), first = true)
      val l = decile(lats(c), first = false)
      println(f"[soak] client=$c requests=$perClient " +
        f"first-decile(after warmup)=$f%.1f ms last-decile=$l%.1f ms " +
        f"ratio=${l / f}%.2f")
    }
    val all = lats.flatten.sorted
    val p50 = all(all.length / 2)
    val p99 = all(math.min(all.length - 1, (all.length * 0.99).toInt))
    val firstAll = lats.map(decile(_, first = true)).sum / clients
    val lastAll = lats.map(decile(_, first = false)).sum / clients
    println(f"[soak] TOTAL clients=$clients requests=${clients * perClient} " +
      f"errors=${errors.get()} wall=${wall}%.1f s " +
      f"throughput=${clients * perClient / wall}%.1f req/s p50=$p50%.1f ms " +
      f"p99=$p99%.1f ms first-decile=$firstAll%.1f ms " +
      f"last-decile=$lastAll%.1f ms ratio=${lastAll / firstAll}%.2f")
    server.stop()
    spark.stop()
    if (errors.get() > 0) sys.exit(1)
  }
}
