package graft.engine

import graft.SparkSpec

/** E22 over its reference wire protocol: the gRPC transport
  * (api_server.go:127-180 — ExecuteQuery returns columns+rows+error in
  * the message; deny-list guard and typo hints apply) and the
  * server-streaming delivery path (E5, engine.go:232-365).
  */
class GrpcQueryServerSpec extends SparkSpec {
  import spark.implicits._

  test("GrpcTransport.available reports the relocated runtime's presence") {
    // This build runs on the full Spark 4.1 distribution (connect jar in
    // jars/), so the probe must be true here; the probe itself must not
    // link any relocated class (it would defeat its purpose on a
    // connect-less classpath — enforced by the probe living in an object
    // with zero org.sparkproject references).
    assert(GrpcTransport.available)
  }

  test("unary Execute over gRPC: result contract, guard, hints") {
    Seq((1, "alpha"), (2, "beta")).toDF("id", "name")
      .createOrReplaceTempView("grpc_things")
    val server = new GrpcQueryServer(spark)
    server.start()
    try {
      val port = server.boundPort
      assert(port > 0)

      val body = GrpcQueryClient.execute("127.0.0.1", port,
        "SELECT id, name FROM grpc_things ORDER BY id")
      assert(body.contains(""""columns":[{"name":"id","type":"int","nullable":false},"""))
      assert(body.contains(""""rows":[[1,"alpha"],[2,"beta"]]"""))
      assert(body.contains(""""rowCount":2"""))

      // E4 guard: DDL is rejected in the message, not executed.
      val bad = GrpcQueryClient.execute("127.0.0.1", port,
        "DROP TABLE grpc_things")
      assert(bad.contains("dangerous operation"), bad)
      assert(spark.catalog.tableExists("grpc_things"))

      // E21 hint on a near-miss table name.
      val miss = GrpcQueryClient.execute("127.0.0.1", port,
        "SELECT * FROM grpc_thing")
      assert(miss.contains(""""error":"""), miss)
      assert(miss.contains("did you mean grpc_things?"), miss)
    } finally server.stop()
  }

  test("server-streaming Execute: header, row batches, footer") {
    spark.range(0, 2500).selectExpr("id", "concat('v', id) AS v")
      .createOrReplaceTempView("grpc_stream_src")
    val server = new GrpcQueryServer(spark)
    server.start()
    try {
      val msgs = GrpcQueryClient.executeStreaming("127.0.0.1", server.boundPort,
        "SELECT id, v FROM grpc_stream_src ORDER BY id")
      assert(msgs.head.startsWith("""{"columns":["""), msgs.head)
      assert(msgs.last == """{"rowCount":2500}""", msgs.last)
      val batches = msgs.tail.init
      assert(batches.nonEmpty && batches.forall(_.startsWith("""{"rows":[""")))
      // 2500 rows at 1024/batch → 3 batches; first row of first batch intact.
      assert(batches.size == 3)
      assert(batches.head.contains("""[0,"v0"]"""))

      // Streaming errors arrive as a message too.
      val err = GrpcQueryClient.executeStreaming("127.0.0.1", server.boundPort,
        "DELETE FROM grpc_stream_src")
      assert(err.size == 1 && err.head.contains("dangerous operation"), err)
    } finally server.stop()
  }
}
