package graft

import org.apache.spark.sql.SparkSession

/** Scratch perf probe: time one driver query at a given SF with warm
  * repeats, optionally print its formatted plan. Not part of the library
  * surface — a local iteration tool (`runMain graft.Probe <sfDir> <name>
  * [--explain]`).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = if (args.length > 1) args(1) else "q_g9_triangles"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, sf).count() // warm
    var best = Double.MaxValue
    (1 to 3).foreach { _ =>
      val t0 = System.nanoTime()
      val n = fn(spark, sf).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name%s: $dt%.3f s ($n rows)")
      best = math.min(best, dt)
    }
    println(f"BEST $name%s: $best%.3f")
    if (args.contains("--explain")) fn(spark, sf).explain("formatted")
    spark.stop()
  }
}
