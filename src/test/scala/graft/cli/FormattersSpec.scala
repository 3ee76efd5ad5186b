package graft.cli

import graft.SparkSpec
import graft.engine.QueryCache

/** Mirrors pkg/query/formatter_test.go: CSV quoting, JSON typing, table
  * width calc / truncation / NULL rendering; plus the E20 TTL cache.
  */
class FormattersSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "plain", Option(2.5)),
    (2L, "has,comma \"quoted\"", Option.empty[Double]))
    .toDF("id", "name", "score")

  test("csv quotes commas and doubles quotes") {
    val out = Formatters.csv(df.columns.toSeq, df.collect().iterator)
    val lines = out.split("\n")
    assert(lines(0) == "id,name,score")
    assert(lines(1) == "1,plain,2.5")
    assert(lines(2) == "2,\"has,comma \"\"quoted\"\"\",NULL")
  }

  test("json keeps numeric types and nulls") {
    val out = Formatters.json(df.columns.toSeq, df.collect().iterator)
    assert(out.contains("\"id\": 1"))
    assert(out.contains("\"score\": 2.5"))
    assert(out.contains("\"score\": null"))
    assert(out.contains("\"name\": \"has,comma \\\"quoted\\\"\""))
  }

  test("table pads, truncates wide cells, renders NULL, counts rows") {
    val wide = Seq((1, "x" * 80)).toDF("id", "text")
    val out = Formatters.tableOf(wide)
    assert(out.contains("..."))
    assert(!out.split("\n").exists(_.length > 200))
    assert(out.endsWith("1 row(s)"))
    val withNull = Formatters.tableOf(df)
    assert(withNull.contains("NULL"))
    assert(withNull.endsWith("2 row(s)"))
  }

  test("format dispatches by kind") {
    assert(Formatters.format("csv", df).startsWith("id,name,score"))
    assert(Formatters.format("json", df).startsWith("["))
    assert(Formatters.format("table", df).contains("| id"))
  }

  test("query cache: TTL expiry and normalized keys (E20)") {
    var now = 0L
    val cache = new QueryCache(ttlMillis = 1000, clock = () => now)
    var computes = 0
    def compute = { computes += 1; spark.range(3).toDF() }
    cache.getOrElseUpdate("SELECT  *  FROM t")(compute)
    cache.getOrElseUpdate("select * from t")(compute) // same normalized key
    assert(computes == 1 && cache.size == 1)
    now = 2000 // past TTL
    cache.getOrElseUpdate("SELECT * FROM t")(compute)
    assert(computes == 2)
    cache.invalidateAll()
    assert(cache.size == 0)
  }
}
