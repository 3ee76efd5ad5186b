package graft.sources

import graft.SparkSpec
import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentLinkedQueue
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** The REST connector halves against loopback fixtures: Azure Resource
  * Graph `$skipToken` paging (resource_graph.go:299-345) and GCP Cloud
  * Asset Inventory `nextPageToken` paging (asset_inventory.go:107-134),
  * both through the executor-fan-out scan path.
  */
class RestScannerSpec extends SparkSpec {
  import RestScanner._

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    x.getResponseHeaders.add("Content-Type", "application/json")
    x.sendResponseHeaders(code, bytes.length.toLong)
    x.getResponseBody.write(bytes)
    x.close()
  }

  private def withServer[A](body: (HttpServer, Int) => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.start()
    try body(server, server.getAddress.getPort)
    finally server.stop(0)
  }

  test("azure resource graph: POST body, bearer auth, $skipToken paging") {
    withServer { (server, port) =>
      val seen = new ConcurrentLinkedQueue[String]()
      server.createContext("/providers/Microsoft.ResourceGraph/resources",
        (x: HttpExchange) => {
          seen.add(x.getRequestHeaders.getFirst("Authorization"))
          val req = new String(x.getRequestBody.readAllBytes(), "UTF-8")
          assert(req.contains("\"resultFormat\":\"objectArray\""), req)
          assert(x.getRequestURI.toString.contains("api-version="), x.getRequestURI)
          if (!req.contains("$skipToken"))
            respond(x, 200,
              """{"data":[{"id":"/sub/1/vm1","type":"microsoft.compute/virtualmachines","location":"eastus"},
                |{"id":"/sub/1/vm2","type":"microsoft.compute/virtualmachines","location":"westus"}],
                |"$skipToken":"page2"}""".stripMargin.replace("\n", ""))
          else {
            assert(req.contains("\"$skipToken\":\"page2\""), req)
            respond(x, 200,
              """{"data":[{"id":"/sub/1/disk1","type":"microsoft.compute/disks","location":"eastus"}]}""")
          }
        })
      val df = azureScan(spark, s"http://127.0.0.1:$port",
        StaticToken("tok-az"), "Resources | project id, type, location",
        Seq("sub-1"))
      val rows = df.select("id", "type").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(rows == Set(
        "/sub/1/vm1" -> "microsoft.compute/virtualmachines",
        "/sub/1/vm2" -> "microsoft.compute/virtualmachines",
        "/sub/1/disk1" -> "microsoft.compute/disks"))
      assert(seen.size() == 2) // one request per page
      seen.forEach(a => assert(a == "Bearer tok-az"))
    }
  }

  test("gcp asset inventory: per-parent fan-out, nextPageToken paging") {
    withServer { (server, port) =>
      val hits = new java.util.concurrent.atomic.AtomicInteger(0)
      def handler(parent: String, prefix: String): Unit =
        server.createContext(s"/v1/projects/$parent/assets",
          (x: HttpExchange) => {
            hits.incrementAndGet()
            assert(x.getRequestHeaders.getFirst("Authorization") == "Bearer tok-gcp")
            val q = Option(x.getRequestURI.getQuery).getOrElse("")
            assert(q.contains("contentType=RESOURCE"), q)
            if (!q.contains("pageToken="))
              respond(x, 200,
                s"""{"assets":[{"name":"$prefix-a","assetType":"compute.googleapis.com/Instance"}],
                   |"nextPageToken":"n2"}""".stripMargin.replace("\n", ""))
            else {
              assert(q.contains("pageToken=n2"), q)
              respond(x, 200,
                s"""{"assets":[{"name":"$prefix-b","assetType":"compute.googleapis.com/Disk"}]}""")
            }
          })
      handler("p1", "one")
      handler("p2", "two")
      val df = gcpScan(spark, s"http://127.0.0.1:$port",
        StaticToken("tok-gcp"), Seq("projects/p1", "projects/p2"))
      val names = df.select("name").collect().map(_.getString(0)).toSet
      assert(names == Set("one-a", "one-b", "two-a", "two-b"))
      // 2 parents × 2 pages, fetched EXACTLY once despite schema
      // inference being a separate pass (the barrier cut the lineage)
      assert(hits.get() == 4, s"paged fetches ran ${hits.get()} times")
    }
  }

  test("non-2xx surfaces as an error, not silent truncation") {
    withServer { (server, port) =>
      server.createContext("/v1/projects/p9/assets",
        (x: HttpExchange) => respond(x, 403, """{"error":"forbidden"}"""))
      val e = intercept[Exception] {
        gcpAssetPages(s"http://127.0.0.1:$port", StaticToken("t"),
          "projects/p9")
      }
      assert(e.getMessage.contains("403"), e.getMessage)
    }
  }
}
