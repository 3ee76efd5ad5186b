package graft.tools

import graft.Barrier.BarrierOps

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Stage-level timing for the pairwise dedup hot path at a given SF. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VecExprs.register(spark)
    Tables.register(spark, sfDir)
    val docs = spark.table("documents")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sh = time("shingleFrame (hash+sort+checkpoint)") {
      Dedup.shingleFrame(docs, "doc_id", "text", 3)
    }
    time("shingle count")(sh.count())

    val sig = time("minhash signatures (64 seeds)") {
      sh.select(col("id"), Dedup.minhashSignature(col("sh"), 64).as("sig"))
        .barrier(true)
    }

    time("band join candidates") {
      val banded = sig.select(col("id"),
          explode(Dedup.lshBands(col("sig"), 64, 16)).as("bb"))
        .select(col("id"), col("bb.band"), col("bb.bucket"))
      banded.as("a").join(banded.as("b"), Seq("band", "bucket"))
        .filter(col("a.id") < col("b.id")).count()
    }

    time("pair join + jaccardFast (blocked by source)") {
      val shs = docs.select(col("source").as("blk"), col("doc_id").as("id"),
          split(graft.operators.TextAnalysis.normalize(col("text")), " ").as("toks"))
        .barrier(true)
        .select(col("blk"), col("id"),
          Dedup.hashedShinglesFromTokens(col("toks"), 3).as("sh"))
        .barrier(true)
      val a = shs.select(col("blk"), col("id").as("id_a"), col("sh").as("sh_a"))
      val b = shs.select(col("blk"), col("id").as("id_b"), col("sh").as("sh_b"))
      a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
        .withColumn("j", Dedup.jaccardFast(col("sh_a"), col("sh_b")))
        .filter(col("j") >= 0.2).count()
    }
    spark.stop()
  }
}
