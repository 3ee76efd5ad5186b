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
  * Usage: runMain graft.tools.RecallCurve [sfDir] [nCells] [sampleSize] [m]
  * nCells / sampleSize size the two indexes; 0 = auto (≈√n — the
  * [[Similarity.autoCells]] / [[Hnsw.autoSampleSize]] rule). Defaults
  * are the audit fixtures' 16 / 256. Index build wall-times print per
  * index so sizing cost is visible alongside the recall it buys.
  */
object RecallCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nCells = if (args.length > 1) args(1).toInt else 16
    val sampleSize = if (args.length > 2) args(2).toInt else 256
    val m = if (args.length > 3) args(3).toInt else 8
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").cache()
    val n = emb.count()
    val kCells = if (nCells > 0) nCells else Similarity.autoCells(n)
    val kAnchors = if (sampleSize > 0) sampleSize else Hnsw.autoSampleSize(n)

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
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    println(s"corpus=$n vectors @ $sfDir  nCells=$kCells anchors=$kAnchors")
    for ((qname, q) <- Seq("prefix" -> prefixQ, "uniform" -> uniformQ)) {
      val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
        .cache()
      truth.count()
      val ((centroids, assigned), tIvf) = timed {
        val r = Similarity.ivfIndex(emb, "vec_id", "embedding",
          nCells = kCells)
        r._2.cache().count()
        r
      }
      println(f"ivf  build $tIvf%.1f s ($kCells cells)")
      for (nProbe <- Seq(1, 2, 4, 8, 16).map(p =>
          math.min(p * kCells / 16, kCells)).distinct.filter(_ >= 1)) {
        val r = recall(
          Similarity.ivfTopK(assigned, centroids, q, 10, nProbe), truth)
        println(f"ivf  queries=$qname%-7s nProbe=$nProbe%4d/$kCells  " +
          f"recall@10=$r%.3f")
      }
      assigned.unpersist()
      val ((graph, hAssigned), tH) = timed {
        val r = Hnsw.index(emb, "vec_id", "embedding", m = m,
          sampleSize = kAnchors)
        r._2.cache().count()
        r
      }
      println(f"hnsw build $tH%.1f s ($kAnchors anchors)")
      for (ef <- Seq(4, 8, 16, 32, 64).map(e =>
          math.min(e * kAnchors / 256, kAnchors)).distinct.filter(_ >= 1)) {
        val r = recall(Hnsw.topK(graph, hAssigned, q, 10, ef), truth)
        println(f"hnsw queries=$qname%-7s ef=$ef%4d/$kAnchors  " +
          f"recall@10=$r%.3f")
      }
      hAssigned.unpersist()
      truth.unpersist()
    }
    spark.stop()
  }
}
