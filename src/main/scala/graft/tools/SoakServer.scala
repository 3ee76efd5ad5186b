package graft.tools

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession

/** QueryServer soak: N mixed requests through the HTTP query API on one
  * long-lived session, reporting first/last-decile latency — the check
  * that session hygiene keeps a server flat instead of degrading as
  * operator/cache blocks accumulate (round-2 verdict item 1).
  *
  * Usage: runMain graft.tools.SoakServer [requests]
  */
object SoakServer {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(120)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.register(spark, sfDir)
    graft.functions.JsonMacros.register(spark)
    val server = new graft.engine.QueryServer(spark)
    server.start()
    val url = URI.create(s"http://127.0.0.1:${server.boundPort}/query")
    val client = HttpClient.newHttpClient()
    val sqls = Seq(
      "SELECT l_returnflag, sum(l_quantity) FROM lineitem GROUP BY 1",
      "SELECT event_type, COUNT(*) FROM events GROUP BY 1",
      "SELECT lang, COUNT(*) FROM documents GROUP BY 1",
      "SELECT o_orderpriority, avg(o_totalprice) FROM orders GROUP BY 1",
      "SELECT n_name, COUNT(*) FROM nation JOIN customer ON n_nationkey = c_nationkey GROUP BY 1",
      "SELECT extract_json(to_json(named_struct('a', p_partkey)), '$.a') FROM part LIMIT 5")
    val lat = new Array[Double](n)
    for (i <- 0 until n) {
      val sql = sqls(i % sqls.length)
      val t0 = System.nanoTime()
      val resp = client.send(
        HttpRequest.newBuilder(url)
          .POST(HttpRequest.BodyPublishers.ofString(sql)).build(),
        HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() == 200, s"HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
      lat(i) = (System.nanoTime() - t0) / 1e6
    }
    val dec = n / 10
    val first = lat.slice(dec, 2 * dec).sum / dec // skip warmup decile
    val last = lat.takeRight(dec).sum / dec
    println(f"[soak] requests=$n first-decile(after warmup)=${first}%.1f ms " +
      f"last-decile=${last}%.1f ms ratio=${last / first}%.2f")
    server.stop()
    spark.stop()
  }
}
