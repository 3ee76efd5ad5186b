package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Queries, Tables}

/** Round-count / wall-clock profile of connectedComponents on the bench
  * chain graph. Usage: runMain graft.tools.ProfileCC [sfDir]
  */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("profile-cc")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tw = System.nanoTime()
    Tables.register(spark, sfDir)
    val no = spark.table("orders").count()
    println(s"[profile-cc] warmup orders=$no ${(System.nanoTime() - tw) / 1e9}s")
    val t0 = System.nanoTime()
    val edges = Tables.sql(spark, sfDir, Queries.chainEdgesSql)
    val ne = edges.count()
    val t1 = System.nanoTime()
    println(s"[profile-cc] edges=$ne edgeBuild=${(t1 - t0) / 1e9}s")
    val df = graft.operators.Graph.connectedComponents(edges)
    val n = df.count()
    println(s"[profile-cc] rows=$n cc=${(System.nanoTime() - t1) / 1e9}s total=${(System.nanoTime() - t0) / 1e9}s")
    spark.stop()
  }
}
