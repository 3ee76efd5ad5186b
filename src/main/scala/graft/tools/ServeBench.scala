package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Hnsw, Similarity}

/** Serving-latency bench over the PERSISTED ANN indexes — the companion
  * to [[RecallCurve]] (which measures recall per knob on in-memory
  * frames): build + write the IVF and HNSW indexes once, then time the
  * partition-pruned probe path (`ivfTopKIndexed` / `Hnsw.topKIndexed`)
  * against the exact brute-force scan at matched knobs, min-of-3, with
  * recall alongside so each latency pairs with the quality it buys.
  * This is the number a serving rollout sizes against: at 100 TB the
  * probe reads nProbe/nCells (ef/anchors) partition directories from
  * disk while the exact scan reads everything.
  *
  * Usage: runMain graft.tools.ServeBench [sfDir] [nCells] [sampleSize]
  * (0 = auto ≈√n). Indexes build once per (corpus signature, size)
  * via [[graft.FixtureCache]] and are reused across runs.
  */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nCellsArg = if (args.length > 1) args(1).toInt else 0
    val sampleArg = if (args.length > 2) args(2).toInt else 0
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").cache()
    val n = emb.count()
    val nCells = if (nCellsArg > 0) nCellsArg else Similarity.autoCells(n)
    val anchors = if (sampleArg > 0) sampleArg else Hnsw.autoSampleSize(n)
    val queries = emb
      .sort(md5(concat(lit("rq:"), col("vec_id").cast("string"))),
        col("vec_id"))
      .limit(25)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .cache()
    queries.count()

    // FixtureCache keys on the source parquet's (mtime, size), so a
    // regenerated corpus rebuilds instead of silently reusing a stale
    // index; readiness checks the LAST artifact each writer emits
    // (ivfWriteIndex: centroids after assigned; Hnsw.writeIndex: graph
    // after assigned + anchors) so a crashed half-build also rebuilds.
    // v2/v4 tags: bumped after the r14 byCell writer-layout change so
    // cached indexes with the old many-files-per-cell layout rebuild and
    // serving measurements reflect what the writers now produce.
    val ivfDir = graft.FixtureCache.resolve(
      s"graft-servebench-ivf-v2-$nCells", sfDir, "embeddings.parquet")(
      dir => Files.exists(dir.resolve("centroids").resolve("_SUCCESS"))) {
      dir =>
        val (c, a) = Similarity.ivfIndex(emb, "vec_id", "embedding", nCells)
        Similarity.ivfWriteIndex(c, a, dir.toString)
    }()
    val hnswDir = graft.FixtureCache.resolve(
      s"graft-servebench-hnsw-v4-$anchors", sfDir, "embeddings.parquet")(
      dir => Files.exists(dir.resolve("graph").resolve("_SUCCESS"))) {
      dir =>
        val (g, a) = Hnsw.index(emb, "vec_id", "embedding",
          m = 8, sampleSize = anchors)
        Hnsw.writeIndex(g, a, dir.toString)
    }()

    def minOf3(f: => DataFrame): (Double, DataFrame) = {
      var best = Double.MaxValue
      var last: DataFrame = null
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        val df = f
        df.count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        last = df
      }
      (best, last)
    }
    val (tExact, truthDf) = minOf3(
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, 10))
    val truth = truthDf.cache()
    val nTruth = truth.count()
    def recall(approx: DataFrame): Double =
      truth.join(approx.select("query_id", "id"),
        Seq("query_id", "id"), "left_semi").count().toDouble / nTruth
    println(f"corpus=$n @ $sfDir  nCells=$nCells anchors=$anchors  " +
      f"exact-scan=$tExact%.2f s (the brute-force floor every probe beats)")
    for (pct <- Seq(0.0625, 0.125, 0.25)) {
      val nProbe = math.max(1, (nCells * pct).round.toInt)
      val (t, df) = minOf3(
        Similarity.ivfTopKIndexed(spark, ivfDir, queries, 10, nProbe))
      println(f"ivf  nProbe=$nProbe%4d/$nCells (${pct * 100}%5.2f%% read)  " +
        f"${t}%.2f s  recall@10=${recall(df)}%.3f")
    }
    for (pct <- Seq(0.015625, 0.03125, 0.0625, 0.125)) {
      val ef = math.max(1, (anchors * pct).round.toInt)
      val (t, df) = minOf3(
        Hnsw.topKIndexed(spark, hnswDir, queries, 10, ef))
      println(f"hnsw ef=$ef%4d/$anchors (${pct * 100}%5.2f%% read)  " +
        f"${t}%.2f s  recall@10=${recall(df)}%.3f")
    }

    // IVF+PQ persisted serving (q_s12's architecture as an on-disk
    // layout): the PQ codes joined with their IVF cell, written
    // partitionBy(cell) — a probe partition-prunes to nProbe cell
    // directories of COMPRESSED codes (~64x smaller reads than the raw
    // float layout) and scores them with ADC table lookups. Codebook +
    // the auto-sized model ride alongside; a fresh session reads both
    // back (pqModelFromCodebook) and serves without retraining.
    //
    // COSINE SERVING RECIPE: PQ's ADC machinery ranks by squared
    // Euclidean; against a cosine truth on a corpus with varying norms
    // that is the wrong metric (measured here: recall 0.19–0.22 at any
    // probe width on the raw 200k derivative). The standard fix is to
    // L2-NORMALIZE vectors once at index time (and queries at probe
    // time) — on the unit sphere L2 ranking ≡ cosine ranking — so this
    // stage builds its own normalized IVF+PQ layout end to end.
    Similarity.init(spark)
    def normalized(df: DataFrame, vc: String): DataFrame = df
      .withColumn("_nrm", Similarity.norm(col(vc)))
      .withColumn(vc, when(col("_nrm") === 0.0, col(vc))
        .otherwise(expr(s"transform($vc, x -> CAST(x / _nrm AS FLOAT))")))
      .drop("_nrm")
    val nEmb = normalized(emb, "embedding").cache()
    val pqDir = graft.FixtureCache.resolve(
      s"graft-servebench-ivfpqn-$nCells", sfDir, "embeddings.parquet")(
      dir => Files.exists(dir.resolve("codebook").resolve("_SUCCESS"))) {
      dir =>
        val (c, a) = Similarity.ivfIndex(nEmb, "vec_id", "embedding",
          nCells)
        val (_, codebook, codes) = Similarity.pqIndex(nEmb, "vec_id",
          "embedding", nSub = 0, kCodes = 0)
        codes.join(a.select("id", "cell"), Seq("id"))
          .write.mode("overwrite").partitionBy("cell")
          .parquet(dir.resolve("codes_by_cell").toString)
        c.write.mode("overwrite")
          .parquet(dir.resolve("centroids").toString)
        codebook.coalesce(1).write.mode("overwrite")
          .parquet(dir.resolve("codebook").toString)
    }()
    val model = Similarity.pqModelFromCodebook(
      spark.read.parquet(s"$pqDir/codebook"))
    val cents = spark.read.parquet(s"$pqDir/centroids")
      .orderBy("cell").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("centroid").toArray)
    println(f"ivfpq model: nSub=${model.nSub} kCodes=${model.kCodes} " +
      f"(auto-sized, L2-normalized layout)")
    val nQueries = normalized(queries, "qvec").cache()
    for (pct <- Seq(0.0625, 0.125, 0.25)) {
      val nProbe = math.max(1, (nCells * pct).round.toInt)
      // driver-side probe-cell resolution (same rule as ivfPqTopK), then
      // a partition-pruned read of ONLY those cell directories
      val qRows = nQueries.collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1)))
      val probedCells = qRows.flatMap { case (_, q) =>
        cents.indices.sortBy(c => {
          var acc = 0.0; var i = 0
          val cv = cents(c)
          while (i < cv.length) {
            val d = q(i).toDouble - cv(i); acc += d * d; i += 1
          }
          (acc, c)
        }).take(nProbe)
      }.distinct.toSeq
      val (t, df) = minOf3 {
        val pruned = spark.read.parquet(s"$pqDir/codes_by_cell")
          .filter(col("cell").isin(probedCells: _*))
        Similarity.ivfPqTopK(cents, pruned.select("id", "cell"), model,
          pruned.select("id", "codes"), nQueries, 10, nProbe)
      }
      println(f"ivfpq nProbe=$nProbe%4d/$nCells (${pct * 100}%5.2f%% read, " +
        f"coded)  ${t}%.2f s  recall@10=${recall(df)}%.3f")
      // Production PQ serving is two-stage: ADC shortlist (cheap, coded
      // reads) -> EXACT rerank of the bounded shortlist (raw vectors
      // for ~10k rows, not the corpus). Recall@10 is then bounded by
      // "true top-10 inside the ADC top-100", which survives
      // quantization noise that scrambles the top-10 ORDER.
      val (tR, rer) = minOf3 {
        val pruned = spark.read.parquet(s"$pqDir/codes_by_cell")
          .filter(col("cell").isin(probedCells: _*))
        val short = Similarity.ivfPqTopK(cents, pruned.select("id", "cell"),
          model, pruned.select("id", "codes"), nQueries, 100, nProbe)
        val cand = short.select("query_id", "id")
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("query_id")
          .orderBy(col("cosine_sim").desc, col("id").asc)
        emb.withColumnRenamed("vec_id", "id")
          .join(broadcast(cand), "id")
          .join(broadcast(queries), "query_id")
          .withColumn("cosine_sim",
            Similarity.cosine(col("embedding"), col("qvec")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .select("query_id", "rank", "id")
      }
      println(f"ivfpq+rerank nProbe=$nProbe%4d (ADC top-100 -> exact " +
        f"top-10)  ${tR}%.2f s  recall@10=${recall(rer)}%.3f")
    }
    spark.stop()
  }
}
