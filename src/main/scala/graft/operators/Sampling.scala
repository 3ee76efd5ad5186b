package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines: rows are
  * kept or routed by a hash of a stable key, never by `rand()`. That makes
  * every sample reproducible across runs, retries, speculative tasks, and
  * engines (the DuckDB oracle computes the identical md5), and it needs no
  * shuffle — a 100 TB corpus splits in a single scan with filters that
  * Parquet row-group statistics can't help with but codegen makes ~free.
  *
  * The hash bucket is the first 8 hex chars of `md5(key)` compared as a
  * string against a precomputed hex threshold: hex digits sort in ASCII
  * order, so `bucket < threshold` selects a uniform `fraction` of keys with
  * no float conversion at all (string compare in both engines).
  *
  * Reference has no sampling surface; this is a pipeline extra
  * (training-data prep: train/val/test routing, stratified downsampling).
  */
object Sampling {

  /** First 8 hex chars of md5(key) — the uniform [0, 2^32) bucket. */
  def hashBucket(key: Column): Column =
    substring(md5(key.cast("string")), 1, 8)

  /** Hex threshold such that P[bucket < threshold] == fraction. */
  def hexThreshold(fraction: Double): String = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of [0,1]: $fraction")
    val t = math.min((fraction * 4294967296.0).toLong, 4294967295L)
    f"$t%08x"
  }

  /** Keep a deterministic `fraction` of rows by key hash. Uniform within
    * every stratum automatically (md5 is independent of any column), so
    * this IS the stratified sample when the key is unique per row.
    */
  def sampleByKey(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(hashBucket(col(keyCol)) < lit(hexThreshold(fraction)))

  /** Deterministic train/val/test routing: `splits` are (label, weight)
    * pairs; weights must sum to 1. A row's label is the first split whose
    * cumulative-weight threshold exceeds its hash bucket — so splits are
    * disjoint, exhaustive, and stable under re-runs and engine changes.
    */
  def hashSplit(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)], outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"weights must sum to 1, got $total")
    val b = hashBucket(col(keyCol))
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    // Last split catches everything below threshold 1.0 exactly.
    val assign = splits.zip(cum).dropRight(1).foldRight(
        lit(splits.last._1): Column) { case (((label, _), c), rest) =>
      when(b < lit(hexThreshold(c)), lit(label)).otherwise(rest)
    }
    df.withColumn(outCol, assign)
  }

  /** Per-stratum deterministic downsampling to at most `maxPerStratum`
    * rows: rank rows within each stratum by hash bucket (tie-break on the
    * key itself) and keep the lowest `maxPerStratum`. One shuffle on the
    * strata columns; ranking is a window, so skewed strata parallelize to
    * the extent the stratum count allows — for heavy-hitter strata at 100
    * TB scale prefer [[sampleByKey]] with a per-stratum fraction instead
    * (no window, no skew).
    */
  def capPerStratum(df: DataFrame, keyCol: String, strata: Seq[String],
      maxPerStratum: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(hashBucket(col(keyCol)).asc, col(keyCol).asc)
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= maxPerStratum)
      .drop("_rk")
  }
}
