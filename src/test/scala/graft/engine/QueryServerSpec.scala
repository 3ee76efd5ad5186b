package graft.engine

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkSpec

/** E22: the remote query API (api_server.go:127-180 shape — columns,
  * rows, error; deny-list guard applies).
  */
class QueryServerSpec extends SparkSpec {
  import spark.implicits._

  private def post(port: Int, sql: String): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/query"))
      .POST(HttpRequest.BodyPublishers.ofString(sql)).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("executes SQL and returns columns+rows+stats; rejects DDL; hints typos") {
    Seq((1, "alpha"), (2, "beta")).toDF("id", "name")
      .createOrReplaceTempView("api_things")
    val server = new QueryServer(spark)
    server.start()
    try {
      val (code, body) =
        post(server.boundPort, "SELECT id, name FROM api_things ORDER BY id")
      assert(code == 200)
      assert(body.contains(""""columns":[{"name":"id","type":"int","nullable":false},"""))
      assert(body.contains(""""rows":[[1,"alpha"],[2,"beta"]]"""))
      assert(body.contains(""""rowCount":2"""))

      val (badCode, badBody) = post(server.boundPort, "DROP TABLE api_things")
      assert(badCode == 400 && badBody.contains("dangerous operation"))

      val (missCode, missBody) =
        post(server.boundPort, "SELECT * FROM api_thing")
      assert(missCode == 400)
      assert(missBody.contains("did you mean api_things?"), missBody)

      // EXPLAIN rides the same wire contract: one-row, one-column plan
      // text (the guard rejects raw ExplainCommand, so the engine strips
      // the keyword and formats the inner frame without executing it)
      val (exCode, exBody) = post(server.boundPort,
        "EXPLAIN SELECT name FROM api_things WHERE id = 1")
      assert(exCode == 200, exBody)
      assert(exBody.contains(""""columns":[{"name":"plan","type":"string","nullable":false}]"""), exBody)
      assert(exBody.contains("Physical Plan") &&
        exBody.contains("Plan Facts"), exBody)
    } finally server.stop()
  }

  test("serves CONCURRENT clients: parallel request streams all answer " +
      "correctly, none serialized into an error or a cross-talk result") {
    import spark.implicits._
    Seq.tabulate(100)(i => (i, s"v$i")).toDF("id", "v")
      .createOrReplaceTempView("api_conc")
    val server = new QueryServer(spark)
    server.start()
    try {
      val port = server.boundPort
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      // each client repeatedly asks a DIFFERENT aggregate whose answer it
      // knows — a swapped/interleaved response body would mismatch
      val threads = (0 until 6).map { c =>
        new Thread(() => {
          val expect = (0 until 100).filter(_ % 6 == c).sum
          for (_ <- 0 until 5) {
            val (code, body) = post(port,
              s"SELECT sum(id) AS s FROM api_conc WHERE id % 6 = $c")
            if (code != 200 || !body.contains(s""""rows":[[$expect]]"""))
              failures.add(s"client $c: code=$code body=${body.take(120)}")
          }
        }, s"conc-client-$c")
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      assert(failures.isEmpty, failures.toString)
    } finally server.stop()
  }

  test("per-request timeout cancels the job group: a slow query answers " +
      "408 within bounds and the server still serves afterwards") {
    import spark.implicits._
    Seq.tabulate(512)(i => i).toDF("id")
      .createOrReplaceTempView("api_slow")
    // The "slow" query is DETERMINISTICALLY slow: every task blocks on a
    // latch until the test releases it, so it can never finish before the
    // timeout no matter how fast or idle the host is (a join-sized query
    // lost that race twice — too slow for the warm-up timeout on a loaded
    // host at 400 ms, finished under 1500 ms on a fast one). The guard
    // sets interruptOnCancel=true, so cancelJobGroup interrupts the
    // blocked tasks and the cores free immediately.
    QueryServerSpec.resetGate()
    spark.udf.register("test_block",
      (x: Int) => { QueryServerSpec.awaitGate(); x })
    val server = new QueryServer(spark, timeoutMs = 1500)
    server.start()
    try {
      // warm the session first (retry: under full-suite load even the
      // trivial count can trip the short test timeout once while cold)
      var warmed = false
      var warmTries = 0
      while (!warmed && warmTries < 5) {
        val (warmCode, _) =
          post(server.boundPort, "SELECT count(*) AS n FROM api_slow")
        warmed = warmCode == 200
        warmTries += 1
      }
      assert(warmed, s"warm-up failed after $warmTries tries")
      val t0 = System.nanoTime()
      val (code, body) = post(server.boundPort,
        "SELECT count(*) FROM api_slow WHERE test_block(id) >= 0")
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      assert(code == 408, s"$code $body")
      assert(body.contains("timeout"), body)
      // cancel must end the request long before the gate would open
      assert(elapsedMs < 15000, s"timeout took ${elapsedMs}ms")
      QueryServerSpec.openGate()
      // the server is healthy after a cancelled request (retry over the
      // short test timeout, as with the warm-up)
      var okSeen = false
      var okTries = 0
      var lastBody = ""
      while (!okSeen && okTries < 5) {
        val (okCode, okBody) =
          post(server.boundPort, "SELECT count(*) AS n FROM api_slow")
        lastBody = okBody
        okSeen = okCode == 200 && okBody.contains(""""rows":[[512]]""")
        okTries += 1
      }
      assert(okSeen, lastBody)
    } finally {
      QueryServerSpec.openGate()
      server.stop()
    }
  }

  test("admission bound rejects excess in-flight requests with 429 and " +
      "recovers once the slot frees") {
    import spark.implicits._
    Seq.tabulate(40000)(i => i).toDF("id")
      .createOrReplaceTempView("api_busy")
    // one slot, no timeout: the slow request holds the only permit
    val server = new QueryServer(spark, timeoutMs = 0, maxInFlight = 1)
    server.start()
    try {
      val port = server.boundPort
      @volatile var slowDone = false
      val slow = new Thread(() => {
        // a poll below may transiently hold the single permit when this
        // request lands — retry until the slow query actually runs
        var admitted = false
        while (!admitted) {
          val (c, _) = post(port,
            "SELECT count(*) FROM api_busy a JOIN api_busy b ON a.id % 3 = b.id % 3")
          admitted = c != 429
        }
        slowDone = true
      })
      slow.start()
      // poll with quick queries while the slow one holds the permit; at
      // least one must bounce with 429
      var saw429 = false
      var tries = 0
      while (!saw429 && !slowDone && tries < 200) {
        val (code, body) = post(port, "SELECT 1")
        if (code == 429) {
          saw429 = true
          assert(body.contains("capacity"), body)
        }
        tries += 1
        Thread.sleep(20)
      }
      assert(saw429, s"no 429 in $tries tries (slowDone=$slowDone)")
      slow.join()
      // permit released: back to serving
      val (okCode, _) = post(port, "SELECT 1")
      assert(okCode == 200)
    } finally server.stop()
  }

  // (companion holds the gate — see object QueryServerSpec below)

  test("two concurrent sessions with different graft.barrier confs keep " +
      "their own policy (session conf is not global state)") {
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    s1.conf.set(graft.Barrier.ConfKey, "reliable")
    s2.conf.set(graft.Barrier.ConfKey, "local")
    val seen = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val t1 = new Thread(() => {
      import s1.implicits._
      for (_ <- 0 until 10)
        seen.merge("s1", graft.Barrier.policy(Seq(1, 2).toDS()), _ + _)
    })
    val t2 = new Thread(() => {
      import s2.implicits._
      for (_ <- 0 until 10)
        seen.merge("s2", graft.Barrier.policy(Seq(3, 4).toDS()), _ + _)
    })
    t1.start(); t2.start(); t1.join(); t2.join()
    assert(seen.get("s1") == "reliable" * 10, seen.get("s1"))
    assert(seen.get("s2") == "local" * 10, seen.get("s2"))
  }
}

/** Static gate for the timeout test's blocking UDF: the closure references
  * the object (a static field access after closure cleaning), so nothing
  * non-serializable is captured, and local-mode tasks share the same
  * instance as the test thread. The await is bounded so a missed release
  * can never hang the suite; an interrupt (cancelJobGroup with
  * interruptOnCancel) exits immediately.
  */
object QueryServerSpec {
  @volatile private var gate = new java.util.concurrent.CountDownLatch(1)
  def resetGate(): Unit = { gate = new java.util.concurrent.CountDownLatch(1) }
  def openGate(): Unit = gate.countDown()
  def awaitGate(): Unit =
    try gate.await(60, java.util.concurrent.TimeUnit.SECONDS)
    catch { case _: InterruptedException => Thread.currentThread().interrupt() }
}
