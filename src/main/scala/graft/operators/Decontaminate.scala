package graft.operators

import graft.Barrier.BarrierOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora (pipeline extra, beyond
  * the reference's surface): flag every training document that shares at
  * least `minShared` distinct word n-grams with any benchmark/eval
  * document, then drop the flagged docs. This is the standard leakage
  * guard run before LLM pretraining (n ≈ 8..13 word n-grams).
  *
  * Scale shape (100 TB corpus): the benchmark side is tiny — eval sets are
  * MBs while the corpus is TBs — so its exploded n-gram frame is
  * broadcast and the corpus side streams through a map-side hash join:
  * the corpus is scanned once and never shuffled. Only the matched grams
  * (a vanishingly small fraction) reach the one aggregation shuffle, keyed
  * by (train_id, bench_id). N-grams are the dedup family's materialized
  * hashed shingles ([[Dedup.shingleFrame]] — the token barrier matters:
  * an inlined shingle HOF re-runs the normalize+split subtree per gram,
  * measured 20x slower), distinct per document on both sides, so the join
  * emits each shared gram exactly once per pair and a plain count is the
  * distinct-gram count. Grams match by xxhash64 (8 bytes broadcast per
  * gram instead of a ~50-byte string); a collision needs ~2^32 distinct
  * benchmark grams to matter.
  */
object Decontaminate {

  /** (train_id, bench_id, shared_ngrams) for every contaminated pair. */
  def contaminatedPairs(train: DataFrame, trainId: String, trainText: String,
      bench: DataFrame, benchId: String, benchText: String,
      n: Int = 8, minShared: Long = 1L): DataFrame = {
    val tg = Dedup.shingleFrame(train, trainId, trainText, n)
      .select(col("id").as("train_id"), explode(col("sh")).as("gram"))
    val bg = Dedup.shingleFrame(bench, benchId, benchText, n)
      .select(col("id").as("bench_id"), explode(col("sh")).as("gram"))
    tg.join(broadcast(bg), "gram")
      .groupBy("train_id", "bench_id")
      .agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minShared)
  }

  /** The training frame minus every contaminated document (left-anti on
    * the flagged id set — the id set is small, so the anti join
    * broadcasts too and the clean pass stays shuffle-free).
    */
  def clean(train: DataFrame, trainId: String, trainText: String,
      bench: DataFrame, benchId: String, benchText: String,
      n: Int = 8, minShared: Long = 1L): DataFrame = {
    val bad = contaminatedPairs(train, trainId, trainText,
        bench, benchId, benchText, n, minShared)
      .select(col("train_id")).distinct()
    train.join(broadcast(bad), train(trainId) === bad("train_id"), "left_anti")
  }

  /** Fuzzy decontamination: flag training documents that are NEAR
    * duplicates of a benchmark document — paraphrased or lightly edited
    * eval items that exact n-gram matching ([[contaminatedPairs]]) can
    * miss. Candidates come from MinHash LSH band collisions between the
    * two frames; every emitted pair is verified with the exact n-gram
    * Jaccard, so output rows are exact even though candidate generation
    * is hash-approximate (same contract as the dedup family).
    *
    * Scale shape: the benchmark side is tiny, so its banded signature
    * frame BROADCASTS and the corpus streams through a map-side join —
    * the 100 TB side computes signatures in one scan and never shuffles
    * for candidate generation; only the matched candidates (plus the two
    * narrow shingle-set lookups for verification) move. This mirrors
    * [[contaminatedPairs]]'s asymmetry exactly, one level fuzzier.
    */
  def fuzzyContaminatedPairs(train: DataFrame, trainId: String, trainText: String,
      bench: DataFrame, benchId: String, benchText: String,
      threshold: Double = 0.5, k: Int = 64, bands: Int = 16,
      shingleW: Int = 3): DataFrame = {
    val tsh = Dedup.shingleFrame(train, trainId, trainText, shingleW)
    val bsh = Dedup.shingleFrame(bench, benchId, benchText, shingleW)
    def banded(sh: DataFrame, idAs: String, sigAs: String): DataFrame =
      sh.select(col("id"), Dedup.minhashSignature(col("sh"), k).as("sig"))
        .barrier(true)
        .select(col("id"), col("sig"),
          explode(Dedup.lshBands(col("sig"), k, bands)).as("bb"))
        .select(col("id").as(idAs), col("sig").as(sigAs),
          col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cands = banded(tsh, "train_id", "sig_t")
      .join(broadcast(banded(bsh, "bench_id", "sig_b")), Seq("band", "bucket"))
      .select("train_id", "bench_id").dropDuplicates("train_id", "bench_id")
    cands
      .join(tsh.select(col("id").as("train_id"), col("sh").as("sh_t")), "train_id")
      .join(broadcast(bsh.select(col("id").as("bench_id"), col("sh").as("sh_b"))),
        "bench_id")
      .withColumn("jaccard", round(Dedup.jaccardFast(col("sh_t"), col("sh_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select("train_id", "bench_id", "jaccard")
  }
}
