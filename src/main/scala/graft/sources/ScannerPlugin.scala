package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.types._

/** The provider-plugin seam (proto/scanner.proto:9-37 `CloudProvider`,
  * plugins/aws-provider/runtime/pipeline.go:230-368 `ScanService`): the
  * reference fans scanning out to per-provider plugin processes over
  * gRPC, each following the Discovery → List → Describe pattern and
  * streaming `Resource` messages back. The cloud SDK call itself cannot
  * exist in a zero-egress sandbox, so the SEAM is built and tested with
  * a deterministic fake provider behind the real protocol: the trait
  * below is the engine-side SPI, [[GrpcScannerServer]] serves it over
  * the same relocated-gRPC transport as the query API, and
  * [[ScannerSource]] is the Spark-side fan-out — (service × region)
  * tasks partitioned across EXECUTORS, each streaming its slice from
  * the plugin endpoint. Swapping [[FakeCloudProvider]] for an SDK-backed
  * implementation changes no engine code.
  */
final case class ProviderInfo(name: String, version: String,
    supportedServices: Seq[String])

/** proto/scanner.proto:78-90 `ServiceInfo` (the queryable subset). */
final case class ServiceInfo(name: String, displayName: String,
    resourceType: String)

/** proto/scanner.proto:144-152 `ResourceRef` — the List half. */
final case class ResourceRef(id: String, name: String, resourceType: String,
    service: String, region: String)

/** proto/scanner.proto:166-200 `Resource` — the Describe half. `tags`
  * and `rawData` are JSON strings, exactly the shape `aws_resources`
  * stores (S1's scan source), so scanned rows drop straight into the
  * catalog/pack pipeline.
  */
final case class ScannedResource(provider: String, service: String,
    resourceType: String, id: String, name: String, region: String,
    accountId: String, arn: String, tags: String, rawData: String,
    createdAtMicros: Long)

/** Engine-side SPI — the RPC surface a plugin must serve. */
trait ScannerProvider {
  def providerInfo: ProviderInfo
  def discoverServices(): Seq[ServiceInfo]
  def listResources(service: String, region: String): Seq[ResourceRef]
  def describeResource(ref: ResourceRef): ScannedResource
  /** The streaming scan: List → Describe composed, one resource at a
    * time (`rpc StreamScan(...) returns (stream Resource)`).
    */
  def streamScan(service: String, region: String): Iterator[ScannedResource] =
    listResources(service, region).iterator.map(describeResource)
}

/** Deterministic stand-in for an SDK-backed provider: every field derives
  * from `(service, region, index)` by closed-form arithmetic, so a DuckDB
  * oracle can replay the ENTIRE scan contract relationally and any
  * dropped/duplicated/corrupted message on the wire changes an aggregate.
  * Shape mirrors what the reference's AWS plugin emits (ARNs, tag maps,
  * raw JSON config payloads, creation timestamps).
  */
final class FakeCloudProvider(accountId: String = "123456789012",
    perServiceRegion: Int = 200) extends ScannerProvider {

  private val services = Seq(
    ServiceInfo("s3", "Amazon S3", "AWS::S3::Bucket"),
    ServiceInfo("ec2", "Amazon EC2", "AWS::EC2::Instance"),
    ServiceInfo("iam", "AWS IAM", "AWS::IAM::Role"),
    ServiceInfo("rds", "Amazon RDS", "AWS::RDS::DBInstance"))
  private val typeOf = services.map(s => s.name -> s.resourceType).toMap

  override def providerInfo: ProviderInfo =
    ProviderInfo("fake-aws", "1.0.0", services.map(_.name))

  override def discoverServices(): Seq[ServiceInfo] = services

  override def listResources(service: String,
      region: String): Seq[ResourceRef] = {
    val tpe = typeOf.getOrElse(service,
      throw new IllegalArgumentException(s"unknown service '$service'"))
    (0 until perServiceRegion).map { i =>
      ResourceRef(
        id = s"arn:fake:$service:$region:$accountId:res/$i",
        name = s"$service-$region-$i",
        resourceType = tpe, service = service, region = region)
    }
  }

  override def describeResource(ref: ResourceRef): ScannedResource = {
    val i = ref.id.substring(ref.id.lastIndexOf('/') + 1).toInt
    ScannedResource(
      provider = "fake-aws", service = ref.service,
      resourceType = ref.resourceType, id = ref.id, name = ref.name,
      region = ref.region, accountId = accountId, arn = ref.id,
      tags = s"""{"Environment":"${if (i % 4 == 0) "Production"
        else "Development"}","Index":"$i"}""",
      rawData = s"""{"Encrypted":${i % 5 != 0},"PublicAccess":${i % 7 == 0},""" +
        s""""SizeGb":${i * 3 % 1000}}""",
      createdAtMicros = 1750000000000000L + i * 60000000L)
  }
}

/** JSON codec for the wire messages. Same protoc-less discipline as the
  * query transport ([[graft.engine.GrpcQueryServer]]): gRPC frames carry
  * the documented JSON contract; requests are flat string objects,
  * responses render each proto message's queryable fields.
  */
object ScannerWire {
  def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Extract a flat string field from a request object — requests are
    * engine-authored `{"service":"…","region":"…"}` shapes; a missing
    * field is a protocol error, reported as such. Unescaping covers the
    * FULL set [[jstr]] emits (`\" \\ \n \r \t \uXXXX`) so every string
    * value round-trips through the wire byte-exact.
    */
  def field(json: String, name: String): String = {
    val m = ("\"" + java.util.regex.Pattern.quote(name) +
      "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r.findFirstMatchIn(json)
    m.map(g => unescape(g.group(1))).getOrElse(
      throw new IllegalArgumentException(
        s"scanner request missing '$name': $json"))
  }

  private def unescape(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => b += '"'; i += 2
          case '\\' => b += '\\'; i += 2
          case 'n' => b += '\n'; i += 2
          case 'r' => b += '\r'; i += 2
          case 't' => b += '\t'; i += 2
          case 'u' if i + 6 <= s.length =>
            b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
            i += 6
          case other => b += '\\'; b += other; i += 2
        }
      } else { b += c; i += 1 }
    }
    b.toString
  }

  def renderResource(r: ScannedResource): String =
    s"""{"provider":${jstr(r.provider)},"service":${jstr(r.service)},""" +
      s""""type":${jstr(r.resourceType)},"id":${jstr(r.id)},""" +
      s""""name":${jstr(r.name)},"region":${jstr(r.region)},""" +
      s""""account_id":${jstr(r.accountId)},"arn":${jstr(r.arn)},""" +
      s""""tags":${jstr(r.tags)},"raw_data":${jstr(r.rawData)},""" +
      s""""created_at_micros":${r.createdAtMicros}}"""

  def renderRef(r: ResourceRef): String =
    s"""{"id":${jstr(r.id)},"name":${jstr(r.name)},""" +
      s""""type":${jstr(r.resourceType)},"service":${jstr(r.service)},""" +
      s""""region":${jstr(r.region)}}"""

  def parseRef(json: String): ResourceRef =
    ResourceRef(field(json, "id"), field(json, "name"), field(json, "type"),
      field(json, "service"), field(json, "region"))

  /** The schema a streamed `Resource` JSON parses into on executors. */
  val ResourceSchema: StructType = StructType(Seq(
    StructField("provider", StringType), StructField("service", StringType),
    StructField("type", StringType), StructField("id", StringType),
    StructField("name", StringType), StructField("region", StringType),
    StructField("account_id", StringType), StructField("arn", StringType),
    StructField("tags", StringType), StructField("raw_data", StringType),
    StructField("created_at_micros", LongType)))
}

/** One (service, region) unit of scan work — the granularity the
  * reference's orchestrator fans out (pipeline.go:230: `ScanService(ctx,
  * serviceName, cfg, region)`).
  */
final case class ScanTask(service: String, region: String)

/** The Spark-side scan source: partition the (service × region) task
  * list across executors; each task opens its own client channel to the
  * plugin endpoint, streams its `Resource` slice, and the JSON batch
  * parses under an explicit schema — no driver-side row loops, so 1000
  * executors scan 1000 task slices concurrently while the driver only
  * plans. At fixture scale everything is loopback; at real scale the
  * endpoint is wherever the plugin processes listen (the go-plugin
  * model), and per-task channels mean no shared connection bottleneck.
  */
object ScannerSource {

  def tasks(provider: ScannerProvider, regions: Seq[String]): Seq[ScanTask] =
    for {
      s <- provider.discoverServices().map(_.name)
      r <- regions
    } yield ScanTask(s, r)

  /** Distributed scan through a gRPC plugin endpoint. */
  def scanDistributed(spark: SparkSession, host: String, port: Int,
      work: Seq[ScanTask], partitions: Int = 8): DataFrame = {
    require(work.nonEmpty, "scanDistributed: empty task list")
    val taskDs: Dataset[ScanTask] =
      spark.createDataset(work)(Encoders.product[ScanTask])
        .repartition(math.min(work.size, partitions))
    val json: Dataset[String] = taskDs.mapPartitions { it =>
      it.flatMap(t => GrpcScannerClient.streamScan(host, port, t))
    }(Encoders.STRING)
    spark.read.schema(ScannerWire.ResourceSchema).json(json)
  }

  /** In-process scan (no transport) — the comparison baseline the spec
    * uses to prove the wire adds nothing and loses nothing.
    */
  def scanLocal(spark: SparkSession, provider: ScannerProvider,
      work: Seq[ScanTask]): DataFrame = {
    val json = work.flatMap(t =>
      provider.streamScan(t.service, t.region).map(ScannerWire.renderResource))
    spark.read.schema(ScannerWire.ResourceSchema)
      .json(spark.createDataset(json)(Encoders.STRING))
  }
}
