package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification-risk primitives for training-data governance: a
  * corpus that ships with structured metadata (language, length bucket,
  * source, region …) can single out an individual document — or the
  * person behind it — when a quasi-identifier combination is rare.
  * k-anonymity is the standard floor: every released row must share its
  * quasi-identifier tuple with ≥ k−1 others. (PII *content* detection
  * lives in [[TextAnalysis]]/Luhn — this is the complementary
  * metadata-shape risk.)
  *
  * Scale shape: one partial-aggregated groupBy on the quasi columns for
  * the audit; suppression re-joins the (small) at-risk group list
  * broadcast against the corpus — the corpus shuffles once at most,
  * and not at all for the report.
  */
object Privacy {

  /** Per-equivalence-class audit: one row per distinct quasi-identifier
    * tuple with its `group_size` and `at_risk` (size < k) flag.
    */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .withColumn("at_risk", col("group_size") < k)
  }

  /** Rows whose quasi-identifier class has ≥ k members — the released
    * view under suppression. The at-risk class list is computed once
    * and broadcast for the semi join (it is bounded by the class count,
    * not the corpus).
    */
  def suppress(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    val safe = kAnonymityReport(df, quasiCols, k)
      .filter(!col("at_risk")).select(quasiCols.map(col): _*)
    df.join(broadcast(safe), quasiCols, "left_semi")
      .select(df.columns.map(col).toIndexedSeq: _*) // using-join reorders
  }

  /** Generalization helper: numeric → fixed-width bucket label, the
    * standard pre-suppression coarsening (a 1-char-resolution length is
    * a fingerprint; a 100-char bucket usually is not).
    */
  def widthBucket(c: Column, width: Long): Column = {
    require(width >= 1, s"bucket width must be >= 1, got $width")
    (floor(c / width) * width).cast("bigint")
  }

  /** Deterministic keyed pseudonymization: value → `sha2(salt ‖ value)`
    * token prefix. The same (salt, value) maps to the same token in
    * every table and every run — joins, group-bys, and frequency
    * analyses still work on the masked corpus — while reversing a token
    * requires the salt (keep it in a secret store, never in data).
    * Pure codegen scan, no lookup table to build, ship, or leak; a
    * 16-hex-char prefix (64 bits) keeps collisions negligible below
    * ~2^32 distinct values. NULL stays NULL (absence is not an
    * identity).
    */
  def pseudonymize(c: Column, salt: String, hexChars: Int = 16): Column = {
    require(hexChars >= 8 && hexChars <= 64,
      s"hexChars out of [8,64]: $hexChars")
    substring(sha2(concat(lit(salt), lit(":"), c.cast("string")), 256),
      1, hexChars)
  }
}
