package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.cli.Formatters
import graft.engine.{QueryCache, QueryEngine}
import graft.compliance.{ComplianceExecutor, PackLoader}
import graft.fixtures.CorkscrewFixtures

/** End-to-end demo of the corkscrew-equivalent CLI flow: ad-hoc SQL →
  * formatters; pack execution → summary; TTL cache. Drives the public
  * library surface the way the reference's CLI does (main.go:797-901,
  * :905-1075).
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 1. ad-hoc SQL through the engine + all three formatters
    Tables.register(spark, sfDir)
    val df = spark.sql(QueryEngine.bindParams(
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY n DESC, event_type",
      Map.empty))
    println("== table ==");  println(Formatters.format("table", df))
    println("== csv ==");    println(Formatters.format("csv", df))
    println("== json ==");   println(Formatters.format("json", df))

    // 2. dangerous SQL rejected
    println("== guard ==")
    println(QueryEngine.validate(spark, "DROP TABLE events"))

    // 3. query cache
    val cache = new QueryCache()
    val q = "SELECT count(*) AS n FROM events"
    val t0 = System.nanoTime(); cache.getOrElseUpdate(q)(spark.sql(q)).count()
    val t1 = System.nanoTime(); cache.getOrElseUpdate(q.toUpperCase.replace("COUNT(*) AS N", "count(*) AS n"))(spark.sql(q)).count()
    val t2 = System.nanoTime()
    println(f"== cache == first=${(t1-t0)/1e6}%.0fms cached=${(t2-t1)/1e6}%.0fms entries=${cache.size}")

    // 4. compliance pack end-to-end + table render of the summary
    CorkscrewFixtures.register(spark)
    val pack = PackLoader.load(java.nio.file.Paths.get(
      "packs/cfi/ccc-storage/manifest.yaml"))
    val run = ComplianceExecutor.run(spark, pack, Map(
      "trusted_kms_keys" -> "arn:aws:kms:us-east-1:123456789012:key/trusted-key-123"),
      onProgress = e => println(s"   progress: $e"))
    println(s"== pack == passed=${run.passed} failed=${run.failed} errors=${run.errors}")
    run.runs.foreach(r => println(
      s"   ${r.queryId}: ${r.results.size} rows, err=${r.error.getOrElse("-")}"))

    spark.stop()
  }
}
