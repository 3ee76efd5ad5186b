package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic for q_g15's driver-side time (deleted after use). */
object KcoreDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries("q_g15_kcore")
    // warm
    fn(spark, sfDir).count(); graft.Hygiene.release(spark)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (_ <- 1 to 2) {
      val df = t("build df (plan construction)") { fn(spark, sfDir) }
      val n = t("count action") { df.count() }
      println(s"[diag] rows=$n")
      graft.Hygiene.release(spark)
    }
    spark.stop()
  }
}
