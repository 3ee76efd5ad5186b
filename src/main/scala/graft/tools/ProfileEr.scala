package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{EntityResolution, Graph}

/** Stage-level wall-clock breakdown of the q_er1 chain (blocking →
  * candidates → verify → CC), so "candidate volume is the cost" stays a
  * measured claim as the chain evolves.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileEr [reps]
  */
object ProfileEr {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[er] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    for (i <- 1 to reps) {
      println(s"[er] --- rep $i ---")
      val recs = graft.Tables.sql(spark, sfDir,
        graft.PipelineQueries.erRecsSql).cache()
      time("records (cache+count)") { recs.count() }
      val cand = time("candidatePairs") {
        val c = EntityResolution.candidatePairs(recs, "rid", "name",
          Seq("nation"), 10, 18).cache()
        println(s"[er]   candidates = ${c.count()}")
        c
      }
      val edges = time("verify (lev+attrs)") {
        val l = recs.as("l"); val r = recs.as("r")
        val e = cand
          .join(l, col("ra") === col("l.rid"))
          .join(r, col("rb") === col("r.rid"))
          .where(abs(length(col("l.name")) - length(col("r.name"))) <= lit(1) &&
            levenshtein(col("l.name"), col("r.name"), 1) >= 0 &&
            col("l.segment") === col("r.segment") &&
            abs(col("l.acctbal") - col("r.acctbal")) <= 2.5)
          .select(col("ra").as("from_id"), col("rb").as("to_id")).cache()
        println(s"[er]   edges = ${e.count()}")
        e
      }
      time("connectedComponents") {
        Graph.connectedComponents(edges).count()
      }
      recs.unpersist(true); cand.unpersist(true); edges.unpersist(true)
      graft.Hygiene.release(spark)
    }
    spark.stop()
  }
}
