package graft.tools

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession

/** Query-server soak: N mixed requests through the remote query API on
  * one long-lived session, reporting first/last-decile latency — the
  * check that session hygiene keeps a server flat instead of degrading
  * as operator/cache blocks accumulate (round-2 verdict item 1). Since
  * round 13 the soak is CONCURRENT: C parallel clients (each its own
  * connection and request stream, mixed query set offset per client)
  * against the server's handler pool with FAIR scheduling and
  * per-thread pools — the reference serves concurrent gRPC clients
  * (api_server.go:127-180), so flat latency must hold under overlap,
  * not just in sequence. Per-client AND aggregate deciles print;
  * cross-query interference shows up as a last/first ratio drift or a
  * fat p99.
  *
  * Round 14 additions:
  *  - `transport` arg (`http` | `grpc`): the same soak through
  *    [[graft.engine.GrpcQueryServer]] — the reference's actual
  *    concurrent surface — with per-client correctness checks (each
  *    client verifies a client-specific aggregate, so cross-talk or
  *    swapped responses turn into counted errors, not silence).
  *  - `--poison`: one EXTRA client loops a deliberately expensive query
  *    under a short server timeout (2 s). The server must cancel its
  *    job group each round (timeout responses are EXPECTED and counted
  *    separately) while the well-behaved clients' deciles stay flat —
  *    the isolation proof for the per-request timeout + admission
  *    bound.
  *
  * Usage: runMain graft.tools.SoakServer [requests-total] [clients]
  *        [http|grpc] [--poison]
  * (clients=1 reproduces the old sequential soak). Degenerate splits
  * fail fast: requests-total must be >= 10 per client; the remainder of
  * the split is distributed so every requested request actually runs.
  */
object SoakServer {
  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--")).toSet
    val pos = args.filterNot(_.startsWith("--"))
    val n = pos.headOption.map(_.toInt).getOrElse(120)
    val clients = pos.drop(1).headOption.map(_.toInt).getOrElse(8)
    val transport = pos.drop(2).headOption.getOrElse("http")
    val poison = flags.contains("--poison")
    if (clients < 1 || n < clients * 10) {
      System.err.println(s"usage: SoakServer [requests-total] [clients] " +
        s"[http|grpc] [--poison] — need requests-total >= 10*clients " +
        s"(got n=$n, clients=$clients)")
      sys.exit(2)
    }
    if (transport != "http" && transport != "grpc") {
      System.err.println(s"unknown transport '$transport' (http|grpc)")
      sys.exit(2)
    }
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
    // Short timeout only when a poison client needs cancelling; the
    // plain soak keeps the production default.
    val timeoutMs = if (poison) 2000L else 30000L
    val (post: (String => (Int, String)), stopServer: (() => Unit)) =
      if (transport == "http") {
        val server = new graft.engine.QueryServer(spark,
          timeoutMs = timeoutMs)
        server.start()
        val url = URI.create(s"http://127.0.0.1:${server.boundPort}/query")
        val send = (sql: String) => {
          val client = HttpClient.newHttpClient()
          val resp = client.send(
            HttpRequest.newBuilder(url)
              .POST(HttpRequest.BodyPublishers.ofString(sql)).build(),
            HttpResponse.BodyHandlers.ofString())
          (resp.statusCode(), resp.body())
        }
        (send, () => server.stop())
      } else {
        val server = new graft.engine.GrpcQueryServer(spark,
          timeoutMs = timeoutMs)
        server.start()
        val port = server.boundPort
        val send = (sql: String) => {
          val body = graft.engine.GrpcQueryClient
            .execute("127.0.0.1", port, sql)
          // message-carried errors: map to the HTTP-style code for the
          // shared counting below. Error payloads START with {"error" —
          // a contains() check would false-positive on result ROWS that
          // carry the string (events.event_type has an 'error' value).
          val code =
            if (!body.startsWith("{\"error\"")) 200
            else if (body.contains("\"code\":429")) 429
            else if (body.contains("\"code\":408")) 408
            else 400
          (code, body)
        }
        (send, () => server.stop())
      }

    // Per-client correctness: each client owns one aggregate whose exact
    // answer it can assert from the response body (cross-talk detector,
    // both transports). The remaining mixed queries exercise variety.
    val sqls = Seq(
      "SELECT l_returnflag, sum(l_quantity) FROM lineitem GROUP BY 1",
      "SELECT event_type, COUNT(*) FROM events GROUP BY 1",
      "SELECT lang, COUNT(*) FROM documents GROUP BY 1",
      "SELECT o_orderpriority, avg(o_totalprice) FROM orders GROUP BY 1",
      "SELECT n_name, COUNT(*) FROM nation JOIN customer ON n_nationkey = c_nationkey GROUP BY 1",
      "SELECT extract_json(to_json(named_struct('a', p_partkey)), '$.a') FROM part LIMIT 5")
    val partCount = spark.read.parquet(s"$sfDir/part.parquet").count()

    val errors = new java.util.concurrent.atomic.AtomicInteger(0)
    // remainder-distributed split: first (n % clients) clients run one
    // extra request, so exactly n requests run in total
    val perClient = Array.tabulate(clients)(c =>
      n / clients + (if (c < n % clients) 1 else 0))
    val lats: Array[Array[Double]] =
      Array.tabulate(clients)(c => new Array[Double](perClient(c)))
    val threads = (0 until clients).map { c =>
      new Thread(() => {
        val ownSql = s"SELECT count(*) % ${c + 2} AS own FROM part"
        val ownExpect = s"[[${partCount % (c + 2)}]]"
        for (i <- 0 until perClient(c)) {
          val sql = if (i % 7 == 6) ownSql else sqls((c + i) % sqls.length)
          val t0 = System.nanoTime()
          try {
            val (code, body) = post(sql)
            if (code != 200) {
              errors.incrementAndGet()
              System.err.println(s"[soak] c$c#$i code $code: ${body.take(160)}")
            } else if (sql == ownSql && !body.contains(ownExpect)) {
              errors.incrementAndGet()
              System.err.println(
                s"[soak] c$c#$i CROSS-TALK: wanted $ownExpect in ${body.take(160)}")
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
    // Poison client: loops an expensive self-joined aggregate the 2 s
    // timeout must cancel. Timeouts (408) are the EXPECTED outcome and
    // count separately; any 200 here (host fast enough) is also fine —
    // what matters is the well-behaved clients' deciles staying flat.
    val poisonTimeouts = new java.util.concurrent.atomic.AtomicInteger(0)
    val poisonOther = new java.util.concurrent.atomic.AtomicInteger(0)
    val poisonRounds = 10
    val poisonThread = if (!poison) None else Some(new Thread(() => {
      val slowSql = "SELECT COUNT(*) FROM lineitem a JOIN lineitem b " +
        "ON a.l_orderkey % 8 = b.l_orderkey % 8 " +
        "WHERE a.l_quantity + b.l_quantity > 0"
      for (_ <- 0 until poisonRounds) {
        try {
          val (code, _) = post(slowSql)
          if (code == 408) poisonTimeouts.incrementAndGet()
          else poisonOther.incrementAndGet()
        } catch { case _: Exception => poisonOther.incrementAndGet() }
      }
    }, "soak-poison"))
    val wall0 = System.nanoTime()
    poisonThread.foreach(_.start())
    threads.foreach(_.start())
    threads.foreach(_.join())
    poisonThread.foreach(_.join())
    val wall = (System.nanoTime() - wall0) / 1e9

    def decile(xs: Array[Double], first: Boolean): Double = {
      val d = math.max(1, xs.length / 10)
      val slice = if (first) xs.slice(d, 2 * d) else xs.takeRight(d)
      slice.sum / slice.length
    }
    for (c <- 0 until clients) {
      val f = decile(lats(c), first = true)
      val l = decile(lats(c), first = false)
      println(f"[soak] client=$c requests=${perClient(c)} " +
        f"first-decile(after warmup)=$f%.1f ms last-decile=$l%.1f ms " +
        f"ratio=${l / f}%.2f")
    }
    val all = lats.flatten.sorted
    val p50 = all(all.length / 2)
    val p99 = all(math.min(all.length - 1, (all.length * 0.99).toInt))
    val firstAll = lats.map(decile(_, first = true)).sum / clients
    val lastAll = lats.map(decile(_, first = false)).sum / clients
    println(f"[soak] TOTAL transport=$transport clients=$clients requests=$n " +
      f"errors=${errors.get()} wall=${wall}%.1f s " +
      f"throughput=${n / wall}%.1f req/s p50=$p50%.1f ms " +
      f"p99=$p99%.1f ms first-decile=$firstAll%.1f ms " +
      f"last-decile=$lastAll%.1f ms ratio=${lastAll / firstAll}%.2f")
    if (poison)
      println(s"[soak] POISON rounds=$poisonRounds " +
        s"timeouts(408, expected)=${poisonTimeouts.get()} " +
        s"other=${poisonOther.get()}")
    stopServer()
    spark.stop()
    if (errors.get() > 0) sys.exit(1)
  }
}
