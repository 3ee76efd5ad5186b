package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.operators.{Dedup, Spread, TextAnalysis}

/** Stage-by-stage timing of the q_d10 substring-dedup pipeline. */
object ProfileSubstr {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.register(spark, sfDir)
    val docs = spark.table("documents")
    val winTokens = 20

    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[substr] $label run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
      }
    }

    val toks = split(TextAnalysis.normalize(col("text")), " ")
    def base0 = Spread(docs).select(col("doc_id"), toks.as("_toks"))
      .withColumn("_n", size(col("_toks"))).filter(col("_n") >= winTokens)
    def wins0 = base0.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), col("_n") - winTokens),
        i => md5(concat_ws(" ", slice(col("_toks"), i + 1, lit(winTokens))))))
        .as(Seq("pos", "wfp")))
    def dup0 = wins0.groupBy("wfp").agg(count(lit(1)).as("_cnt"))
      .filter(col("_cnt") > 1).select("wfp")
    def dupPos0 = wins0.join(dup0, Seq("wfp")).select(col("doc_id"), col("pos"))
    def dupPosW = wins0
      .withColumn("_cnt", count(lit(1)).over(Window.partitionBy("wfp")))
      .filter(col("_cnt") > 1).select(col("doc_id"), col("pos"))
    time("base")(base0.count())
    time("wins")(wins0.count())
    time("dup")(dup0.count())
    time("dupPos")(dupPos0.count())
    time("dupPosW")(dupPosW.count())
    time("full")(Dedup.substringDedupSpans(docs, "doc_id", "text", winTokens).count())
    spark.stop()
  }
}
