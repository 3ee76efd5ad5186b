package graft.engine

import java.io.{ByteArrayInputStream, InputStream}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession
import org.sparkproject.connect.grpc.{CallOptions, ManagedChannel, MethodDescriptor, Server, ServerServiceDefinition}
import org.sparkproject.connect.grpc.netty.{NettyChannelBuilder, NettyServerBuilder}
import org.sparkproject.connect.grpc.stub.{ClientCalls, ServerCalls, StreamObserver}

import scala.jdk.CollectionConverters._

/** gRPC transport for the remote query API — the wire-protocol twin of
  * corkscrew's `ExecuteQuery(sql) → {columns, rows, error}` gRPC server
  * (internal/server/api_server.go:127-180). Runs on the gRPC runtime the
  * Spark distribution itself ships (the Spark Connect server's relocated
  * `org.sparkproject.connect.grpc` + netty — a public artifact of the
  * Spark 4 release; no extra dependency, which matters in a zero-egress
  * build). Offline there is no protoc, so the messages are
  * length-prefixed gRPC frames carrying the same UTF-8 JSON contract as
  * [[QueryServer]] ([[QueryWire]]) instead of protobuf-compiled classes:
  * transport semantics (HTTP/2, one `Execute` unary RPC, one
  * `ExecuteStreaming` server-streaming RPC) match the reference; message
  * encoding is the engine's documented JSON shape.
  *
  * Error contract follows the reference's message-carried style: the RPC
  * completes OK and the payload carries `{"error": …, "hint"?: …}` — the
  * E4 statement guard and E21 did-you-mean hints run exactly as on the
  * HTTP path.
  *
  * `ExecuteStreaming` mirrors E5's `toLocalIterator` delivery
  * (engine.go:232-365): one `{"columns":[…]}` header message, then
  * `{"rows":[…]}` batches of [[GrpcQueryServer.StreamBatchRows]] rows
  * (one result partition in driver memory at a time), then a
  * `{"rowCount":n}` footer — the reference's channel-with-EOF-sentinel
  * shape as a gRPC stream.
  *
  * ==Deployment requirement==
  * `org.sparkproject.connect.grpc.*` is a shading artifact of the
  * `spark-connect` jar shipped in the Spark 4.1 distribution's `jars/`,
  * NOT a supported public API: a Spark minor upgrade may re-relocate it,
  * and a deployment that strips the connect jar loses the classes
  * entirely (NoClassDefFoundError at class load). The core engine never
  * references this file — nothing in `graft` loads these classes unless
  * a caller instantiates the gRPC transport — so a connect-less
  * deployment keeps the full engine plus the dependency-free HTTP
  * transport ([[QueryServer]]). Callers should gate construction on
  * [[GrpcTransport.available]] (reflective probe, safe on any
  * classpath) and treat the HTTP transport as the fallback. Built and
  * tested against Spark 4.1.x; re-verify the relocation prefix on any
  * Spark upgrade.
  */
class GrpcQueryServer(spark: SparkSession, port: Int = 0,
    handlerThreads: Int = 16, timeoutMs: Long = 30000L,
    maxInFlight: Int = 64) {
  import GrpcQueryServer._

  // Bounded FIXED handler pool (mirrors QueryServer's): gRPC's default
  // executor is an unbounded cached pool whose idle threads die and
  // respawn with fresh thread ids — under `graft.server.pool=per-thread`
  // FAIR routing that would mint an ever-growing set of pool names
  // (Spark never removes dynamically-created FAIR pools). Sixteen
  // long-lived daemon threads bound the name set exactly like the HTTP
  // transport's.
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(
    handlerThreads,
    (r: Runnable) => {
      val t = new Thread(r, "graft-grpc-server")
      t.setDaemon(true)
      t
    })

  // Same per-request timeout + bounded admission as [[QueryServer]]
  // (reference default 30 s, corkscrew.yaml:68). gRPC's error contract
  // here is message-carried, so 429/408 ride as `{"error":…,"code":n}`
  // payloads on an OK-completing RPC.
  private val guard = new RequestGuard(spark, maxInFlight, timeoutMs)

  private def withCode(r: (Int, String)): String = r match {
    case (200, body) => body
    case (400, body) => body
    case (code, body) =>
      // splice the transport code into the guard's error object
      body.patch(body.lastIndexOf('}'), s""","code":$code""", 0)
  }

  private val service: ServerServiceDefinition =
    ServerServiceDefinition.builder(ServiceName)
      .addMethod(ExecuteMethod, ServerCalls.asyncUnaryCall(
        new ServerCalls.UnaryMethod[Array[Byte], Array[Byte]] {
          override def invoke(req: Array[Byte],
              out: StreamObserver[Array[Byte]]): Unit = {
            out.onNext(execute(new String(req, UTF_8)).getBytes(UTF_8))
            out.onCompleted()
            afterRequest()
          }
        }))
      .addMethod(ExecuteStreamingMethod, ServerCalls.asyncServerStreamingCall(
        new ServerCalls.ServerStreamingMethod[Array[Byte], Array[Byte]] {
          override def invoke(req: Array[Byte],
              out: StreamObserver[Array[Byte]]): Unit = {
            executeStreaming(new String(req, UTF_8), out)
            out.onCompleted()
            afterRequest()
          }
        }))
      .build()

  private val server: Server = NettyServerBuilder
    .forAddress(new InetSocketAddress("127.0.0.1", port))
    .addService(service)
    .executor(pool)
    .build()

  def start(): Unit = server.start()
  def stop(): Unit = {
    server.shutdownNow()
    server.awaitTermination()
    pool.shutdown()
    pool.awaitTermination(5, java.util.concurrent.TimeUnit.SECONDS)
    ()
  }

  /** Bound port (useful when constructed with port 0). */
  def boundPort: Int = server.getPort

  // Same long-lived-session hygiene cadence as the HTTP transport.
  private val served = new java.util.concurrent.atomic.AtomicLong(0)
  private def afterRequest(): Unit =
    if (served.incrementAndGet() % 16 == 0) graft.Hygiene.gcNudge()

  /** Same FAIR-pool routing as [[QueryServer]] (gRPC's default server
    * executor is a cached pool, so requests already run concurrently;
    * this routes each handler thread's Spark jobs into its own pool
    * under spark.scheduler.mode=FAIR — round-robin across requests).
    */
  private def routePool(): Unit =
    spark.conf.getOption("graft.server.pool").foreach { p =>
      val pool = if (p == "per-thread")
        s"graft-req-${Thread.currentThread().getId}" else p
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
    }

  private def execute(sql: String): String =
    withCode(guard.run {
      try { routePool()
        (200, QueryWire.render(QueryEngine.execute(spark, sql))) }
      catch {
        case e: QueryEngine.QueryValidationError =>
          (400, s"""{"error":${QueryWire.jstr(e.message)}}""")
        case e: Exception => (400, QueryWire.renderError(spark, e))
      }
    })

  private def executeStreaming(sql: String,
      out: StreamObserver[Array[Byte]]): Unit = {
    // Admission + timeout wrap the whole stream; a mid-stream timeout
    // (or rejection) surfaces as a FINAL error message after whatever
    // batches already went out — the reference's message-carried style.
    val outcome = guard.run {
      try {
        routePool()
        val (cols, rows) = QueryEngine.executeStreaming(spark, sql)
        out.onNext(s"""{"columns":${QueryWire.renderColumns(cols)}}""".getBytes(UTF_8))
        var n = 0L
        rows.grouped(StreamBatchRows).foreach { batch =>
          n += batch.size
          out.onNext(s"""{"rows":${QueryWire.renderRows(batch)}}""".getBytes(UTF_8))
        }
        out.onNext(s"""{"rowCount":$n}""".getBytes(UTF_8))
        (200, "")
      } catch {
        case e: QueryEngine.QueryValidationError =>
          (400, s"""{"error":${QueryWire.jstr(e.message)}}""")
        case e: Exception => (400, QueryWire.renderError(spark, e))
      }
    }
    if (outcome._1 != 200) out.onNext(withCode(outcome).getBytes(UTF_8))
  }
}

/** Classpath probe for the optional gRPC transport. This object MUST NOT
  * reference any `org.sparkproject.connect.grpc` type (not even in a
  * method signature): its own class has to link on a classpath without
  * the spark-connect jar, which is exactly the situation it reports on.
  */
object GrpcTransport {

  /** True iff the relocated gRPC runtime (spark-connect jar) is present,
    * i.e. [[GrpcQueryServer]] can be constructed without
    * NoClassDefFoundError. Initialization is NOT forced — only linkage.
    */
  def available: Boolean =
    try {
      Class.forName("org.sparkproject.connect.grpc.stub.ServerCalls",
        /* initialize = */ false, getClass.getClassLoader)
      true
    } catch { case _: ClassNotFoundException | _: LinkageError => false }
}

object GrpcQueryServer {

  val ServiceName = "graft.QueryService"
  val StreamBatchRows = 1024

  /** Raw-bytes marshaller: gRPC's `Marshaller` contract is public API
    * designed for exactly this (protoc-less frameworks marshal JSON or
    * flatbuffers the same way).
    */
  private object BytesMarshaller extends MethodDescriptor.Marshaller[Array[Byte]] {
    override def stream(value: Array[Byte]): InputStream =
      new ByteArrayInputStream(value)
    override def parse(stream: InputStream): Array[Byte] = stream.readAllBytes()
  }

  val ExecuteMethod: MethodDescriptor[Array[Byte], Array[Byte]] =
    MethodDescriptor.newBuilder(BytesMarshaller, BytesMarshaller)
      .setFullMethodName(
        MethodDescriptor.generateFullMethodName(ServiceName, "Execute"))
      .setType(MethodDescriptor.MethodType.UNARY)
      .build()

  val ExecuteStreamingMethod: MethodDescriptor[Array[Byte], Array[Byte]] =
    MethodDescriptor.newBuilder(BytesMarshaller, BytesMarshaller)
      .setFullMethodName(
        MethodDescriptor.generateFullMethodName(ServiceName, "ExecuteStreaming"))
      .setType(MethodDescriptor.MethodType.SERVER_STREAMING)
      .build()
}

/** Minimal blocking client over the same stack — what a remote caller
  * (or the parity spec) uses; plaintext loopback by default, mirroring
  * the reference CLI's client side (cmd/corkscrew/main.go query path).
  */
object GrpcQueryClient {

  def withChannel[A](host: String, port: Int)(f: ManagedChannel => A): A = {
    val ch = NettyChannelBuilder.forAddress(host, port).usePlaintext().build()
    try f(ch)
    finally { ch.shutdownNow(); () }
  }

  /** One unary `Execute` call → the JSON result/error payload. */
  def execute(host: String, port: Int, sql: String): String =
    withChannel(host, port) { ch =>
      new String(
        ClientCalls.blockingUnaryCall(
          ch, GrpcQueryServer.ExecuteMethod, CallOptions.DEFAULT,
          sql.getBytes(UTF_8)),
        UTF_8)
    }

  /** One `ExecuteStreaming` call → the header/batch/footer messages. */
  def executeStreaming(host: String, port: Int, sql: String): Seq[String] =
    withChannel(host, port) { ch =>
      ClientCalls.blockingServerStreamingCall(
        ch, GrpcQueryServer.ExecuteStreamingMethod, CallOptions.DEFAULT,
        sql.getBytes(UTF_8)).asScala.map(new String(_, UTF_8)).toVector
    }
}
