package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.GrpcTransport

/** The scanner-plugin seam: the SPI contract, the gRPC wire, and the
  * executor-side fan-out ([[ScannerSource.scanDistributed]]) must all
  * agree with the in-process provider — plus the ingest handoff into the
  * S6 upsert path.
  */
class ScannerPluginSpec extends SparkSpec {

  private val provider = new FakeCloudProvider(perServiceRegion = 20)

  private def withServer[A](f: (String, Int) => A): A = {
    assume(GrpcTransport.available, "relocated gRPC runtime not on classpath")
    val srv = new GrpcScannerServer(provider)
    srv.start()
    try f("127.0.0.1", srv.boundPort) finally srv.stop()
  }

  test("provider info and service discovery over the wire") {
    withServer { (h, p) =>
      val info = GrpcScannerClient.providerInfo(h, p)
      assert(info.contains("\"fake-aws\"") && info.contains("\"s3\""), info)
      val disc = GrpcScannerClient.discoverServices(h, p)
      assert(disc.contains("\"AWS::EC2::Instance\""), disc)
    }
  }

  test("list → describe round-trips one resource over the wire") {
    withServer { (h, p) =>
      val listed = GrpcScannerClient.listResources(h, p, "s3", "us-east-1")
      assert(listed.contains("arn:fake:s3:us-east-1:123456789012:res/0"),
        listed)
      val ref = provider.listResources("s3", "us-east-1").head
      val described = GrpcScannerClient.describeResource(h, p, ref)
      // i=0: Production tag, Encrypted=false (0%5==0), PublicAccess=true
      assert(described.contains("\\\"Environment\\\":\\\"Production\\\"") &&
        described.contains("\\\"Encrypted\\\":false"), described)
    }
  }

  test("unknown service is a protocol error, not a silent empty") {
    withServer { (h, p) =>
      // unary error frames throw like stream ones do — an error payload
      // returned as a successful response would exit 0 from the CLI
      val e = intercept[IllegalStateException] {
        GrpcScannerClient.listResources(h, p, "nope", "us-east-1")
      }
      assert(e.getMessage.contains("\"error\"") &&
        e.getMessage.contains("unknown service"), e.getMessage)
    }
  }

  test("StreamScan provider faults surface as named errors, not UNKNOWN") {
    withServer { (h, p) =>
      val e = intercept[IllegalStateException] {
        GrpcScannerClient.streamScan(h, p, ScanTask("ghost", "us-east-1"))
      }
      assert(e.getMessage.contains("ghost") &&
        e.getMessage.contains("unknown service"), e.getMessage)
    }
  }

  test("distributed scan equals the in-process scan exactly") {
    withServer { (h, p) =>
      val work = ScannerSource.tasks(provider, Seq("us-east-1", "eu-west-1"))
      assert(work.size == 8) // 4 services x 2 regions
      val local = ScannerSource.scanLocal(spark, provider, work)
      val dist = ScannerSource.scanDistributed(spark, h, p, work)
      assert(dist.count() == 4L * 2 * 20)
      // exact frame equality both directions (schema fixed, rows keyed)
      assert(dist.exceptAll(local).isEmpty && local.exceptAll(dist).isEmpty)
    }
  }

  test("scanned frame drops into the S6 upsert (first-write-wins)") {
    withServer { (h, p) =>
      val work = Seq(ScanTask("s3", "us-east-1"))
      val scanned = ScannerSource.scanDistributed(spark, h, p, work)
        .withColumn("scanned_at", lit(java.sql.Timestamp.valueOf(
          "2025-06-21 00:00:00")))
      // pre-existing catalog row for res/0 must win over the rescan
      val existing = scanned.filter(col("id").endsWith("/0"))
        .withColumn("name", lit("original-name"))
        .withColumn("scanned_at", lit(java.sql.Timestamp.valueOf(
          "2025-06-20 00:00:00")))
      val merged = graft.catalog.ResourceCatalog.upsertResources(
        existing, scanned)
      assert(merged.count() == 20)
      val kept = merged.filter(col("id").endsWith("/0"))
        .select("name").head.getString(0)
      assert(kept == "original-name", kept)
    }
  }
}
