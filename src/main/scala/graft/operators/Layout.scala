package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering, the
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`. A table sorted on
  * one column prunes scans on that column only; interleaving the bits of
  * two columns and range-partitioning on the interleaved value gives every
  * partition (and, once written, every parquet row group) a NARROW min/max
  * range on BOTH columns, so predicate pushdown skips files for filters on
  * either dimension. At 100 TB this is the difference between a
  * two-dimensional needle query reading one file and reading the table.
  *
  * The z-value is pure integer arithmetic over builtins (no UDF, stays in
  * whole-stage codegen) and is bit-replayable in any engine — the driver
  * oracle recomputes it in DuckDB.
  */
object Layout {

  /** Morton/Z-value of two non-negative integer columns: the low `bits`
    * bits of `x` go to even bit positions, `y` to odd. Caller is
    * responsible for mapping raw values into [0, 2^bits) — modulo for
    * synthetic keys, epoch-bucket or rank-scale for real dimensions.
    */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    val terms = (0 until bits).flatMap { b =>
      Seq(
        shiftright(xl, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b)),
        shiftright(yl, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1)))
    }
    terms.reduce(_ + _)
  }

  /** Cluster `df` for two-dimensional locality: range-partition on the
    * z-value into `numPartitions` and sort within each partition, so a
    * subsequent parquet write produces files AND row groups whose min/max
    * stats are tight on both dimensions. The range exchange samples the
    * z-value distribution, so skew in either raw column does not produce
    * skewed partitions.
    */
  def zorderPartitions(df: DataFrame, x: Column, y: Column,
      bits: Int = 16, numPartitions: Int = 0): DataFrame = {
    val withZ = df.withColumn("_zval", zValue2(x, y, bits))
    val parts = if (numPartitions > 0) numPartitions
                else df.sparkSession.sparkContext.defaultParallelism
    withZ.repartitionByRange(parts, col("_zval"))
      .sortWithinPartitions("_zval")
  }
}
