package graft.compliance

import org.scalatest.funsuite.AnyFunSuite
import java.net.InetSocketAddress
import java.nio.file.Files
import java.time.Instant
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import PackRegistry._

/** End-to-end registry client over the real HTTP transport against a
  * loopback fixture server (no egress): updateRegistry → search →
  * download → checksum → install, plus HTTP-level retry and the
  * offline path — the live half of registry.go:257-318.
  */
class HttpTransportSpec extends AnyFunSuite {

  private val bundleYaml: String = {
    val manifest =
      """apiVersion: v1
        |kind: QueryPack
        |metadata:
        |  name: httppack
        |  namespace: test-org/httppack
        |  version: 1.2.0
        |  description: served over loopback http
        |  provider: aws
        |spec:
        |  queries:
        |    - id: Q1
        |      title: one
        |      severity: LOW
        |      category: security
        |      query_file: queries/q1.sql
        |      enabled: true
        |""".stripMargin
    val m = new java.util.LinkedHashMap[String, Object]()
    m.put("manifest.yaml", manifest)
    m.put("queries/q1.sql", "SELECT 42 AS answer")
    new org.yaml.snakeyaml.Yaml().dump(m)
  }

  private def indexYaml(port: Int): String =
    s"""- name: httppack
       |  namespace: test-org/httppack
       |  description: pack served over http
       |  provider: aws
       |  tags: [security]
       |  latest_version: 1.2.0
       |  versions:
       |    - version: 1.2.0
       |      tag: v1.2.0
       |      checksum: ${PackRegistry.sha256Hex(bundleYaml)}
       |      download_url: http://127.0.0.1:$port/bundles/httppack-1.2.0.yaml
       |""".stripMargin

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    x.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length.toLong)
    if (bytes.nonEmpty) x.getResponseBody.write(bytes)
    x.close()
  }

  private def withServer[A](body: (HttpServer, Int) => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.start()
    try body(server, server.getAddress.getPort)
    finally server.stop(0)
  }

  test("updateRegistry + searchPacks + downloadPack over loopback HTTP") {
    withServer { (server, port) =>
      var agents = Seq.empty[String]
      server.createContext("/index.yaml", (x: HttpExchange) => {
        agents :+= x.getRequestHeaders.getFirst("User-Agent")
        respond(x, 200, indexYaml(port))
      })
      server.createContext("/bundles/httppack-1.2.0.yaml",
        (x: HttpExchange) => respond(x, 200, bundleYaml))

      val dir = graft.SparkSpec.tempDir("graft-http-registry")
      val c = new PackRegistry(dir.resolve("registry.yaml"),
        new HttpTransport(timeoutMs = 5000),
        Seq(s"http://127.0.0.1:$port"), offlineMode = false,
        RetryConfig(maxRetries = 1, retryDelayMs = 1),
        () => Instant.now(), _ => ())
      assert(c.updateRegistry(forceRefresh = true).isRight)
      assert(agents.forall(_ == "Graft-Registry-Client/1.0"))

      val found = c.searchPacks(SearchCriteria(query = "http"))
      assert(found.total == 1 && found.packs.head.namespace == "test-org/httppack")

      val r = c.downloadPack("test-org/httppack", "latest", dir.resolve("packs"))
      assert(r.isRight, r)
      assert(r.toOption.get.queries.head.sql.contains("SELECT 42"))
      assert(Files.exists(
        dir.resolve("packs/test-org/httppack/queries/q1.sql")))
    }
  }

  test("HTTP failures retry with backoff and then succeed") {
    withServer { (server, port) =>
      var hits = 0
      server.createContext("/bundles/flaky.yaml", (x: HttpExchange) => {
        hits += 1
        if (hits <= 2) respond(x, 500, "boom") else respond(x, 200, bundleYaml)
      })
      val dir = graft.SparkSpec.tempDir("graft-http-flaky")
      var slept = Seq.empty[Long]
      val c = new PackRegistry(dir.resolve("registry.yaml"),
        new HttpTransport(timeoutMs = 5000), Nil, offlineMode = false,
        RetryConfig(maxRetries = 3, retryDelayMs = 10, backoff = 2.0),
        () => Instant.now(), ms => slept :+= ms)
      c.setCache(Cache(1L, Cache.DefaultTtlMs, Map(
        "t/flaky" -> PackInfo(name = "flaky", namespace = "t/flaky",
          versions = Seq(PackVersion("1.0.0",
            downloadUrl = s"http://127.0.0.1:$port/bundles/flaky.yaml")))),
        "1.0"))
      assert(c.downloadPack("t/flaky", "latest", dir.resolve("packs")).isRight)
      assert(hits == 3)
      assert(slept == Seq(10L, 20L))
    }
  }

  test("non-2xx and unreachable endpoints surface as RegistryError " +
      "(and an offline client never dials)") {
    withServer { (server, port) =>
      server.createContext("/index.yaml",
        (x: HttpExchange) => respond(x, 404, "not here"))
      val t = new HttpTransport(timeoutMs = 2000)
      val e404 = t.fetchIndex(s"http://127.0.0.1:$port")
      assert(e404.swap.toOption.get.message == "HTTP 404")
      // connection refused (nothing listens on the ephemeral port + 1)
      val refused = t.fetchBundle(s"http://127.0.0.1:1/x.yaml")
      assert(refused.isLeft)

      // offline mode short-circuits before the transport ever runs
      var dialed = 0
      server.createContext("/count.yaml", (x: HttpExchange) => {
        dialed += 1; respond(x, 200, "[]")
      })
      val dir = graft.SparkSpec.tempDir("graft-http-offline")
      val c = new PackRegistry(dir.resolve("registry.yaml"), t,
        Seq(s"http://127.0.0.1:$port"), offlineMode = true,
        RetryConfig(retryDelayMs = 1), () => Instant.now(), _ => ())
      assert(c.updateRegistry(forceRefresh = true).isRight)
      assert(dialed == 0)
    }
  }
}
