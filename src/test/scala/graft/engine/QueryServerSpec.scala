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
}
