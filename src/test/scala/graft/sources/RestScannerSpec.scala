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

  test("aws scan: NextToken paging, per-ref describe enrichment, " +
      "service/region attach, single fetch pass") {
    val ep = new FakeAwsEndpoint(Seq("ec2"),
      Seq("us-east-1", "eu-west-1"), n = 7, pageSize = 3)
    val port = ep.start()
    try {
      val df = RestScanner.awsScan(spark, s"http://127.0.0.1:$port/{region}",
        StaticToken("tok-aws"),
        Seq(AwsAction("ec2", "Graftec2.List",
          describeTarget = Some("Graftec2.Describe"), pageSize = 3)),
        Seq("us-east-1", "eu-west-1"))
      val rows = df.collect()
      assert(rows.length == 14) // 7 resources × 2 regions
      val byId = rows.map(r => r.getAs[String]("Id") -> r).toMap
      val r0 = byId("ec2-us-east-1-0")
      assert(r0.getAs[String]("State") == "running") // i % 3 == 0
      assert(!r0.getAs[Boolean]("Encrypted"))        // i % 5 == 0
      assert(r0.getAs[String]("service") == "ec2")   // engine attach
      assert(r0.getAs[String]("region") == "us-east-1")
      val r1 = byId("ec2-eu-west-1-1")
      assert(r1.getAs[String]("State") == "stopped")
      assert(r1.getAs[Boolean]("Encrypted"))
      assert(r1.getAs[Long]("SizeGb") == 7L)
      // per region: ceil(7/3)=3 list pages + 7 describes, and the
      // barrier keeps it to ONE pass despite json schema inference
      assert(ep.hits.get() == 2L * (3 + 7),
        s"paged fetches ran ${ep.hits.get()} times")
    } finally ep.stop()
  }

  test("aws describe failure falls back to the listed ref instead of " +
      "dropping the resource (scanner_registry.go:156-163)") {
    val ep = new FakeAwsEndpoint(Seq("s3"), Seq("us-east-1"), n = 5,
      pageSize = 10, failDescribeEvery = Some(2))
    val port = ep.start()
    try {
      val df = RestScanner.awsScan(spark, s"http://127.0.0.1:$port/{region}",
        StaticToken("t"),
        Seq(AwsAction("s3", "Grafts3.List",
          describeTarget = Some("Grafts3.Describe"))),
        Seq("us-east-1"))
      assert(df.count() == 5) // nothing dropped
      // even ids (0,2,4) fell back to the bare ref: no State, but the
      // engine-attached service/region still present
      val basic = df.filter(df("State").isNull).collect()
      assert(basic.map(_.getAs[String]("Id")).sorted.toSeq ==
        Seq("s3-us-east-1-0", "s3-us-east-1-2", "s3-us-east-1-4"))
      basic.foreach(r => assert(r.getAs[String]("region") == "us-east-1"))
    } finally ep.stop()
  }

  test("aws list without a describe target returns the refs as-is") {
    val ep = new FakeAwsEndpoint(Seq("ec2"), Seq("us-east-1"), n = 4,
      pageSize = 2)
    val port = ep.start()
    try {
      val refs = RestScanner.awsListPages(
        s"http://127.0.0.1:$port/us-east-1", StaticToken("t"),
        "Graftec2.List", pageSize = 2)
      assert(refs.length == 4)
      assert(refs.forall(_.contains("\"Arn\"")))
      assert(ep.hits.get() == 2L) // two pages, one request each
    } finally ep.stop()
  }

  test("retry policy: transient 503s retry with backoff, permanent 403 " +
      "fails immediately, exhausted budget surfaces the error") {
    withServer { (server, port) =>
      val flaky = new java.util.concurrent.atomic.AtomicInteger(0)
      server.createContext("/v1/projects/flaky/assets",
        (x: HttpExchange) => {
          if (flaky.incrementAndGet() <= 2)
            respond(x, 503, """{"error":"throttle"}""")
          else respond(x, 200, """{"assets":[{"name":"ok"}]}""")
        })
      val out = gcpAssetPages(s"http://127.0.0.1:$port", StaticToken("t"),
        "projects/flaky",
        policy = RetryPolicy(maxRetries = 3, backoffMs = 1))
      assert(out.size == 1 && flaky.get() == 3,
        s"${out.size} rows after ${flaky.get()} attempts")
      // permanent class: one attempt only — retrying auth errors hides them
      val denied = new java.util.concurrent.atomic.AtomicInteger(0)
      server.createContext("/v1/projects/denied/assets",
        (x: HttpExchange) => { denied.incrementAndGet(); respond(x, 403, "{}") })
      val e = intercept[Exception] {
        gcpAssetPages(s"http://127.0.0.1:$port", StaticToken("t"),
          "projects/denied",
          policy = RetryPolicy(maxRetries = 5, backoffMs = 1))
      }
      assert(e.getMessage.contains("403") && denied.get() == 1, e.getMessage)
      // exhausted budget: maxRetries + 1 attempts, then the real error
      val down = new java.util.concurrent.atomic.AtomicInteger(0)
      server.createContext("/v1/projects/down/assets",
        (x: HttpExchange) => { down.incrementAndGet(); respond(x, 503, "{}") })
      val e3 = intercept[Exception] {
        gcpAssetPages(s"http://127.0.0.1:$port", StaticToken("t"),
          "projects/down",
          policy = RetryPolicy(maxRetries = 2, backoffMs = 1))
      }
      assert(e3.getMessage.contains("503") && down.get() == 3, e3.getMessage)
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
