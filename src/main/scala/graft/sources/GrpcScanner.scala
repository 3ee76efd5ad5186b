package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import org.sparkproject.connect.grpc.{CallOptions, MethodDescriptor, Server, ServerServiceDefinition}
import org.sparkproject.connect.grpc.netty.{NettyChannelBuilder, NettyServerBuilder}
import org.sparkproject.connect.grpc.stub.{ClientCalls, ServerCalls, StreamObserver}

import scala.jdk.CollectionConverters._

/** gRPC transport for the scanner-plugin protocol — the wire twin of the
  * reference's `service CloudProvider` (proto/scanner.proto:9-37) on the
  * same relocated runtime and protoc-less JSON-frame discipline as
  * [[graft.engine.GrpcQueryServer]] (see that file's deployment caveat;
  * gate construction on [[graft.engine.GrpcTransport.available]]).
  * Served methods are the queryable core of the proto: GetProviderInfo,
  * DiscoverServices, ListResources (unary) and StreamScan
  * (server-streaming `Resource` messages — the shape pipeline.go streams
  * into the orchestrator's resource channel); DescribeResource completes
  * the Discovery → List → Describe triple.
  */
class GrpcScannerServer(provider: ScannerProvider, port: Int = 0) {
  import GrpcScannerServer._
  import ScannerWire._

  private def unary(fn: String => String)
      : ServerCalls.UnaryMethod[Array[Byte], Array[Byte]] =
    new ServerCalls.UnaryMethod[Array[Byte], Array[Byte]] {
      override def invoke(req: Array[Byte],
          out: StreamObserver[Array[Byte]]): Unit = {
        val resp =
          try fn(new String(req, UTF_8))
          catch { case e: Exception =>
            s"""{"error":${jstr(Option(e.getMessage).getOrElse(e.toString))}}"""
          }
        out.onNext(resp.getBytes(UTF_8))
        out.onCompleted()
      }
    }

  private val service: ServerServiceDefinition =
    ServerServiceDefinition.builder(ServiceName)
      .addMethod(ProviderInfoMethod, ServerCalls.asyncUnaryCall(unary { _ =>
        val p = provider.providerInfo
        s"""{"name":${jstr(p.name)},"version":${jstr(p.version)},""" +
          s""""supported_services":${p.supportedServices.map(jstr)
            .mkString("[", ",", "]")}}"""
      }))
      .addMethod(DiscoverServicesMethod, ServerCalls.asyncUnaryCall(unary {
        _ =>
          provider.discoverServices().map(s =>
            s"""{"name":${jstr(s.name)},"display_name":${jstr(s.displayName)},""" +
              s""""resource_type":${jstr(s.resourceType)}}""")
            .mkString("""{"services":[""", ",", "]}")
      }))
      .addMethod(ListResourcesMethod, ServerCalls.asyncUnaryCall(unary { req =>
        provider.listResources(field(req, "service"), field(req, "region"))
          .map(renderRef).mkString("""{"resources":[""", ",", "]}")
      }))
      .addMethod(DescribeResourceMethod, ServerCalls.asyncUnaryCall(unary {
        req => renderResource(provider.describeResource(parseRef(req)))
      }))
      .addMethod(StreamScanMethod, ServerCalls.asyncServerStreamingCall(
        new ServerCalls.ServerStreamingMethod[Array[Byte], Array[Byte]] {
          override def invoke(req: Array[Byte],
              out: StreamObserver[Array[Byte]]): Unit = {
            // same error contract as the unary methods: a provider fault
            // becomes an {"error":...} payload, never an opaque gRPC
            // UNKNOWN that Spark would retry 4x before failing blind
            try {
              val r = new String(req, UTF_8)
              provider.streamScan(field(r, "service"), field(r, "region"))
                .foreach(res =>
                  out.onNext(renderResource(res).getBytes(UTF_8)))
            } catch { case e: Exception =>
              out.onNext(s"""{"error":${jstr(
                Option(e.getMessage).getOrElse(e.toString))}}"""
                .getBytes(UTF_8))
            }
            out.onCompleted()
          }
        }))
      .build()

  private val server: Server = NettyServerBuilder
    .forAddress(new InetSocketAddress("127.0.0.1", port))
    .addService(service)
    .build()

  def start(): Unit = server.start()
  def stop(): Unit = { server.shutdownNow(); server.awaitTermination() }
  def boundPort: Int = server.getPort
}

object GrpcScannerServer {
  val ServiceName = "graft.ScannerService"

  private object BytesMarshaller extends MethodDescriptor.Marshaller[Array[Byte]] {
    override def stream(value: Array[Byte]): InputStream =
      new ByteArrayInputStream(value)
    override def parse(stream: InputStream): Array[Byte] = stream.readAllBytes()
  }

  private def method(name: String, mtype: MethodDescriptor.MethodType)
      : MethodDescriptor[Array[Byte], Array[Byte]] =
    MethodDescriptor.newBuilder(BytesMarshaller, BytesMarshaller)
      .setFullMethodName(
        MethodDescriptor.generateFullMethodName(ServiceName, name))
      .setType(mtype)
      .build()

  val ProviderInfoMethod: MethodDescriptor[Array[Byte], Array[Byte]] =
    method("GetProviderInfo", MethodDescriptor.MethodType.UNARY)
  val DiscoverServicesMethod: MethodDescriptor[Array[Byte], Array[Byte]] =
    method("DiscoverServices", MethodDescriptor.MethodType.UNARY)
  val ListResourcesMethod: MethodDescriptor[Array[Byte], Array[Byte]] =
    method("ListResources", MethodDescriptor.MethodType.UNARY)
  val DescribeResourceMethod: MethodDescriptor[Array[Byte], Array[Byte]] =
    method("DescribeResource", MethodDescriptor.MethodType.UNARY)
  val StreamScanMethod: MethodDescriptor[Array[Byte], Array[Byte]] =
    method("StreamScan", MethodDescriptor.MethodType.SERVER_STREAMING)
}

/** Blocking client over the same stack. Executors call [[streamScan]]
  * from inside `mapPartitions` — one short-lived channel per call keeps
  * the closure state-free (nothing to serialize) and avoids any shared
  * connection bottleneck across task slots.
  */
object GrpcScannerClient {
  import GrpcScannerServer._

  private def withChannel[A](host: String, port: Int)(
      f: org.sparkproject.connect.grpc.ManagedChannel => A): A = {
    val ch = NettyChannelBuilder.forAddress(host, port).usePlaintext().build()
    try f(ch)
    finally { ch.shutdownNow(); () }
  }

  /** The server converts provider faults into an `{"error":…}` payload on
    * unary responses too (not just stream frames) — surface those as
    * failures with the real message instead of returning them as data,
    * mirroring [[streamScan]]'s handling (otherwise e.g. the CLI describe
    * path would print an error JSON and exit 0).
    */
  private def checkUnary(op: String, resp: String): String = {
    if (resp.startsWith("{\"error\""))
      throw new IllegalStateException(s"$op failed: $resp")
    resp
  }

  def providerInfo(host: String, port: Int): String =
    withChannel(host, port) { ch =>
      checkUnary("GetProviderInfo",
        new String(ClientCalls.blockingUnaryCall(ch, ProviderInfoMethod,
          CallOptions.DEFAULT, "{}".getBytes(UTF_8)), UTF_8))
    }

  def discoverServices(host: String, port: Int): String =
    withChannel(host, port) { ch =>
      checkUnary("DiscoverServices",
        new String(ClientCalls.blockingUnaryCall(ch, DiscoverServicesMethod,
          CallOptions.DEFAULT, "{}".getBytes(UTF_8)), UTF_8))
    }

  def listResources(host: String, port: Int, service: String,
      region: String): String =
    withChannel(host, port) { ch =>
      checkUnary(s"ListResources($service, $region)",
        new String(ClientCalls.blockingUnaryCall(ch, ListResourcesMethod,
          CallOptions.DEFAULT,
          s"""{"service":${ScannerWire.jstr(service)},"region":${
            ScannerWire.jstr(region)}}""".getBytes(UTF_8)), UTF_8))
    }

  def describeResource(host: String, port: Int, ref: ResourceRef): String =
    withChannel(host, port) { ch =>
      checkUnary(s"DescribeResource(${ref.id})",
        new String(ClientCalls.blockingUnaryCall(ch, DescribeResourceMethod,
          CallOptions.DEFAULT, ScannerWire.renderRef(ref).getBytes(UTF_8)),
          UTF_8))
    }

  /** One StreamScan call → the `Resource` JSON messages, materialized.
    * Bounded by a single (service, region) slice — the reference's page
    * unit — so per-call memory is a task slice, never the corpus.
    */
  def streamScan(host: String, port: Int, task: ScanTask): Seq[String] =
    withChannel(host, port) { ch =>
      val frames = ClientCalls.blockingServerStreamingCall(ch,
        StreamScanMethod, CallOptions.DEFAULT,
        s"""{"service":${ScannerWire.jstr(task.service)},"region":${
          ScannerWire.jstr(task.region)}}""".getBytes(UTF_8))
        .asScala.map(new String(_, UTF_8)).toVector
      // the server converts provider faults into an error frame — fail
      // the task HERE with the real message instead of parsing it as data
      frames.find(_.startsWith("{\"error\"")).foreach(err =>
        throw new IllegalStateException(
          s"StreamScan(${task.service}, ${task.region}) failed: $err"))
      frames
    }
}
