package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Hnsw, Similarity}

/** Recall-vs-knob curves for the two serving indexes (IVF nProbe, HNSW
  * ef) against the exact brute-force truth — the capacity-planning
  * instrument behind the q_s25/q_s26 audits, run offline because the
  * audits pin ONE deliberately-cheap operating point each (nProbe=2,
  * ef=8) and an operator picking a production setting needs the whole
  * curve.
  *
  * Measures TWO query populations side by side:
  *  - `prefix`: the audits' own vec_id < 5 queries, and
  *  - `uniform`: 25 hash-uniform corpus vectors (md5 order — the same
  *    draw discipline as the round-13 training samples),
  * because the round-12 → round-13 sampling change exposed an
  * instrument bias: with id-prefix anchor/centroid training, prefix
  * queries were IN (or adjacent to) the training sample, so the audits
  * measured the index serving its own sample (s26 read 82–100%). The
  * hash-uniform training sample removed that coupling; these curves are
  * the honest serving numbers at each knob setting.
  *
  * Usage: runMain graft.tools.RecallCurve [sfDir]
  */
object RecallCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").cache()
    val n = emb.count()

    def queriesOf(df: DataFrame): DataFrame =
      df.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val prefixQ = queriesOf(emb.filter(col("vec_id") < 5))
    val uniformQ = queriesOf(emb
      .sort(md5(concat(lit("rq:"), col("vec_id").cast("string"))), col("vec_id"))
      .limit(25))

    def recall(approx: DataFrame, truth: DataFrame): Double = {
      val hit = truth.join(approx.select("query_id", "id"),
        Seq("query_id", "id"), "left_semi").count()
      hit.toDouble / truth.count()
    }

    println(s"corpus=$n vectors @ $sfDir")
    for ((qname, q) <- Seq("prefix" -> prefixQ, "uniform" -> uniformQ)) {
      val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
        .cache()
      truth.count()
      val (centroids, assigned) =
        Similarity.ivfIndex(emb, "vec_id", "embedding", nCells = 16)
      assigned.cache().count()
      for (nProbe <- Seq(1, 2, 4, 8, 16)) {
        val r = recall(
          Similarity.ivfTopK(assigned, centroids, q, 10, nProbe), truth)
        println(f"ivf  queries=$qname%-7s nProbe=$nProbe%2d/16  recall@10=$r%.3f")
      }
      assigned.unpersist()
      val (graph, hAssigned) =
        Hnsw.index(emb, "vec_id", "embedding", m = 8, sampleSize = 256)
      hAssigned.cache().count()
      for (ef <- Seq(4, 8, 16, 32, 64)) {
        val r = recall(Hnsw.topK(graph, hAssigned, q, 10, ef), truth)
        println(f"hnsw queries=$qname%-7s ef=$ef%2d/256  recall@10=$r%.3f")
      }
      hAssigned.unpersist()
      truth.unpersist()
    }
    spark.stop()
  }
}
