package graft.sources

import java.net.InetSocketAddress

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Loopback AWS-JSON-protocol fixture endpoint for [[RestScanner.awsScan]]
  * — the q_k4 driver query and RestScannerSpec run the REAL HTTP
  * transport, paging loop, and describe-enrichment path against it; the
  * only fake part is the resource synthesis itself, which is CLOSED-FORM
  * so a DuckDB oracle can replay it exactly (the q_k3 FakeCloudProvider
  * pattern, reference `plugins/aws-provider/runtime/pipeline.go:230-368`):
  *
  *  - per (service, region): `n` resources, id `"<svc>-<region>-<i>"`
  *  - `state`  = "running" iff i % 3 == 0 else "stopped"
  *  - `size_gb` = (i * 7) % 500
  *  - `encrypted` = i % 5 != 0
  *  - tag `Environment` = "Production" iff i % 4 == 0 else "Dev"
  *
  * Wire shape: region rides as the path (`/{region}` — real AWS scopes
  * it into the host); `X-Amz-Target: Graft<svc>.List|Describe` selects
  * the action; List pages `pageSize` ids per response chained by
  * `NextToken` (an offset). `failDescribeEvery` makes every k-th
  * resource's Describe return 500, to exercise the basic-resource
  * fallback (scanner_registry.go:156-163).
  */
final class FakeAwsEndpoint(services: Seq[String], regions: Seq[String],
    n: Int, pageSize: Int = 50, failDescribeEvery: Option[Int] = None) {

  private val mapper = new ObjectMapper()
  private var server: HttpServer = _

  /** Total requests served — lets specs prove single-fetch behavior
    * (the barrier must stop schema inference re-running the page loop).
    */
  val hits = new java.util.concurrent.atomic.AtomicLong(0L)

  def start(): Int = synchronized {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // exceptions escaping handle() (malformed JSON body, a Describe id
    // that fails toInt, ...) would leave the exchange unanswered and the
    // client blocked until its timeout — turn them into a 500 instead
    server.createContext("/", (x: HttpExchange) =>
      try handle(x)
      catch {
        case scala.util.control.NonFatal(_) =>
          try respond(x, 500, """{"__type":"InternalFailure"}""")
          catch { case scala.util.control.NonFatal(_) => x.close() }
      })
    // start from a daemon thread: the JDK HTTP-Dispatcher inherits the
    // spawning thread's daemon flag, and a non-daemon dispatcher would
    // pin the JVM open after a driver run's main returns (the lazy
    // per-JVM endpoint has no natural stop point before shutdown)
    val t = new Thread(() => server.start(), "fake-aws-endpoint-starter")
    t.setDaemon(true)
    t.start()
    t.join()
    server.getAddress.getPort
  }

  def stop(): Unit = synchronized {
    if (server != null) { server.stop(0); server = null }
  }

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    x.getResponseHeaders.add("Content-Type", "application/x-amz-json-1.1")
    x.sendResponseHeaders(code, bytes.length.toLong)
    x.getResponseBody.write(bytes)
    x.close()
  }

  private def handle(x: HttpExchange): Unit = {
    hits.incrementAndGet()
    val auth = Option(x.getRequestHeaders.getFirst("Authorization"))
    if (!auth.exists(_.startsWith("Bearer ")))
      return respond(x, 403, """{"__type":"AccessDeniedException"}""")
    val region = x.getRequestURI.getPath.stripPrefix("/").stripSuffix("/")
    val target = Option(x.getRequestHeaders.getFirst("X-Amz-Target"))
      .getOrElse("")
    val (svcPart, op) = target.split("\\.", 2) match {
      case Array(s, o) => (s.stripPrefix("Graft"), o)
      case _ => ("", "")
    }
    if (!regions.contains(region) || !services.contains(svcPart))
      return respond(x, 400, """{"__type":"ValidationException"}""")
    val body = mapper.readTree(x.getRequestBody.readAllBytes())
    op match {
      case "List" =>
        val from = Option(body.path("NextToken").asText(null))
          .filter(_.nonEmpty).map(_.toInt).getOrElse(0)
        val until = math.min(from + pageSize, n)
        val root = mapper.createObjectNode()
        val arr = root.putArray("Resources")
        (from until until).foreach { i =>
          val ref = arr.addObject()
          ref.put("Id", s"$svcPart-$region-$i")
          ref.put("Arn", s"arn:graft:$svcPart:$region::$i")
        }
        if (until < n) root.put("NextToken", until.toString)
        respond(x, 200, mapper.writeValueAsString(root))
      case "Describe" =>
        val id = body.path("Id").asText("")
        val i = id.substring(id.lastIndexOf('-') + 1).toInt
        if (failDescribeEvery.exists(k => i % k == 0))
          return respond(x, 500, """{"__type":"InternalFailure"}""")
        val root = mapper.createObjectNode()
        root.put("Id", id)
        root.put("Arn", s"arn:graft:$svcPart:$region::$i")
        root.put("State", if (i % 3 == 0) "running" else "stopped")
        root.put("SizeGb", (i * 7) % 500)
        root.put("Encrypted", i % 5 != 0)
        root.putObject("Tags")
          .put("Environment", if (i % 4 == 0) "Production" else "Dev")
        respond(x, 200, mapper.writeValueAsString(root))
      case _ =>
        respond(x, 400, """{"__type":"UnknownOperationException"}""")
    }
  }
}
