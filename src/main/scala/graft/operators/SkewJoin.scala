package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skew that AQE can't fix. Spark's adaptive skew
  * handling splits oversized *partitions*, but a single hot key still
  * lands every row in one task when the build side must shuffle. Salting
  * splits the hot key itself: the skewed side gets a deterministic salt
  * in [0, salts), and the other side is replicated across all salt
  * values, so the hot key fans out over `salts` tasks.
  *
  * Cost model: replication multiplies the small side by `salts` — use for
  * (huge skewed) ⋈ (modest) shapes, with `salts` ≈ the factor by which
  * the hottest key exceeds an average partition. Results are identical to
  * the unsalted join (the salt is an internal column, dropped on output).
  */
object SkewJoin {

  /** Join types whose results are identical to the unsalted join. For
    * `right`/`full_outer` each unmatched `other` row would surface once per
    * salt replica (null-extended `salts` times), so they are rejected.
    * `left`/semi/anti are safe: replication never creates a match that the
    * unsalted join lacks (a skewed row only sees replicas of its own salt),
    * and unmatched skewed rows are emitted exactly once.
    */
  private val SafeJoinTypes =
    Set("inner", "cross", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti")

  /** Equi-join `skewed ⋈ other` on `keys`, salting the skewed side.
    * The salt is derived from a hash of the skewed side's whole row, so
    * it is deterministic (no rand(): retries/speculative tasks agree).
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(SafeJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin does not support joinType=$joinType: unmatched rows of the " +
        "replicated side would be duplicated once per salt (use inner/left/semi/anti)")
    val saltedSide = skewed.withColumn("_salt",
      pmod(xxhash64(skewed.columns.map(col): _*), lit(salts.toLong)))
    val replicated = other.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedSide.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }
}
