package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query profiling harness: runs named SparkEntry queries repeatedly at
  * a given SF, printing each run's wall-clock (Bench reports min-of-2; this
  * shows the distribution and lets GRAFT_*_DEBUG env flags expose internal
  * round timings).
  *
  * Usage: runMain graft.tools.ProfileQuery q_g3_khop q_g6_components [reps]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (names, reps) = args.partition(a => !a.forall(_.isDigit)) match {
      case (ns, rs) => (ns.toSeq, rs.headOption.map(_.toInt).getOrElse(3))
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val n = df.count()
        println(f"[profile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        // After the action, AQE has finalized the plan — print what ran.
        if (i == reps && sys.env.contains("GRAFT_PROFILE_EXPLAIN"))
          println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}
