package graft.operators

// (lives in the operators package for Similarity.scoreCells access;
// run as: runMain graft.operators.HnswDiag)

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._


/** Decomposes HNSW recall loss into its two stages:
  *  1. SELECTION — does the beam graph-walk find the true top-ef
  *     anchors by similarity? (compare searchAnchors to the exhaustive
  *     anchor argsort)
  *  2. ASSIGNMENT — does greedy descent place corpus vectors in their
  *     true nearest-anchor region? (fraction where greedyDescend ==
  *     exhaustive argmax; plus the recall an ORACLE selector probing
  *     the true top-ef anchor regions would get over the real
  *     assignment)
  * The stage that caps the oracle's recall is the one worth fixing.
  *
  * Usage: runMain graft.operators.HnswDiag [sfDir] [sampleSize]
  */
object HnswDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10eq_emb")
    val sampleArg = if (args.length > 1) args(1).toInt else 0
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").cache()
    val n = emb.count()
    val anchors = if (sampleArg > 0) sampleArg else Hnsw.autoSampleSize(n)
    val (g, assigned) = Hnsw.index(emb, "vec_id", "embedding",
      m = 8, sampleSize = anchors)
    assigned.cache().count()
    val queries = emb
      .sort(md5(concat(lit("rq:"), col("vec_id").cast("string"))), col("vec_id"))
      .limit(25)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .cache()
    val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, 10).cache()
    truth.count()

    def simTo(q: Array[Float], i: Int): Double = {
      val y = g.anchors(i)
      var dq = 0.0; var dy = 0.0; var dd = 0.0
      var j = 0
      val m = math.min(q.length, y.length)
      while (j < m) {
        dq += q(j).toDouble * q(j); dy += y(j).toDouble * y(j)
        dd += q(j).toDouble * y(j); j += 1
      }
      if (dq == 0 || dy == 0) 0.0 else dd / math.sqrt(dq * dy)
    }
    def trueTop(q: Array[Float], ef: Int): Array[Int] =
      g.anchors.indices.sortBy(i => (-simTo(q, i), i)).take(ef).toArray

    // 1. selection overlap: |searchAnchors ∩ trueTop| / ef
    val qRows = queries.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray))
    // 2. assignment exactness over a 2000-vector sample
    val sample = emb
      .sort(md5(concat(lit("dg:"), col("vec_id").cast("string"))), col("vec_id"))
      .limit(2000).collect().map(_.getSeq[Float](1).toArray)
    val exact = sample.count(v => Hnsw.greedyDescend(g, v) ==
      trueTop(v, 1).head)
    println(f"assignment: greedyDescend == true nearest anchor for " +
      f"$exact/${sample.length} (${exact * 100.0 / sample.length}%.1f%%)")

    import spark.implicits._
    for (ef <- Seq(7, 14, 28, 56, 112).map(e =>
        math.min(math.max(1, e * anchors / 448), anchors)).distinct) {
      val overlaps = qRows.map { case (_, q) =>
        val found = Hnsw.searchAnchors(g, q, ef).toSet
        val ideal = trueTop(q, ef)
        ideal.count(found) / ideal.length.toDouble
      }
      val meanOverlap = overlaps.sum / overlaps.length
      // oracle-selection recall: probe the TRUE top-ef anchors' regions
      val probes = qRows.flatMap { case (qid, q) =>
        trueTop(q, ef).map(cell => (qid, q.toSeq, cell))
      }.toSeq.toDF("query_id", "qvec", "cell")
        .withColumn("qvec", col("qvec").cast("array<float>"))
      val oracleTop = Similarity.scoreCells(assigned, probes, 10)
      val hit = truth.join(oracleTop.select("query_id", "id"),
        Seq("query_id", "id"), "left_semi").count()
      val beamTop = Hnsw.topK(g, assigned, queries, 10, ef)
      val bhit = truth.join(beamTop.select("query_id", "id"),
        Seq("query_id", "id"), "left_semi").count()
      println(f"ef=$ef%4d  selection-overlap=${meanOverlap}%.3f  " +
        f"oracle-selection recall=${hit / 250.0}%.3f  " +
        f"beam recall=${bhit / 250.0}%.3f")
    }
    spark.stop()
  }
}
