package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}

/** Bloom-filter join pre-filter — the standard shuffle-volume reducer when
  * the dimension side is too large to broadcast as a hash relation but its
  * KEY SET fits a few-MB sketch: build a Bloom filter over the small
  * side's join keys, semi-filter the big side *before* its shuffle, then
  * run the exact join on the survivors. False positives only cost wasted
  * shuffle rows — the join itself stays exact — so fpp tunes network
  * volume, never correctness.
  *
  * At 100 TB this is the difference between shuffling the full fact table
  * and shuffling only the ~selectivity fraction that can match. (Spark's
  * own runtime-filter rule injects something similar under AQE for eligible
  * plans; this operator makes it explicit and predictable.)
  */
object BloomJoin {

  /** Build a Bloom filter over `small`'s `key` column and return `big`
    * filtered to rows whose `key` might be present. Exactness: every
    * actually-matching row is retained (Bloom filters have no false
    * negatives); a small fpp fraction of non-matching rows survives.
    */
  def preFilter(big: DataFrame, small: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = small.stat.bloomFilter(key, expectedItems, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    val keyType = big.schema(key).dataType
    val might: Column = keyType match {
      case LongType | IntegerType | ShortType | ByteType =>
        val f = udf((x: Long) => bc.value.mightContainLong(x))
        f(col(key).cast("long"))
      case StringType =>
        val f = udf((x: String) => x != null && bc.value.mightContainString(x))
        f(col(key))
      case other =>
        throw new IllegalArgumentException(
          s"BloomJoin supports integral/string keys, got $other")
    }
    big.filter(might)
  }

  /** Exact equi-join with the big side Bloom-pre-filtered. Result is
    * identical to `big.join(small, key, joinType)` for inner/semi joins
    * (the only types where dropping never-matching big rows is sound).
    */
  def join(big: DataFrame, small: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.01,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "leftsemi", "left_semi", "semi")
        .contains(joinType.toLowerCase),
      s"bloom pre-filter is only sound for inner/semi joins, got $joinType")
    preFilter(big, small, key, expectedItems, fpp).join(small, Seq(key), joinType)
  }
}
