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

  /** Morton/Z-value of N ≥ 2 non-negative integer columns: bit b of
    * column k lands at output bit `b * N + k` (column 0 on the lowest
    * lane). Caller is responsible for mapping raw values into
    * [0, 2^bits) — modulo for synthetic keys, epoch-bucket or rank-scale
    * for real dimensions. `bits * N` must fit a signed long.
    */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, s"zValueN needs >= 2 columns, got ${cols.size}")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits * columns out of range: $bits * ${cols.size}")
    val n = cols.size
    val terms = for {
      b <- 0 until bits
      (c, k) <- cols.zipWithIndex
    } yield shiftright(c.cast("long"), b).bitwiseAND(lit(1L)) *
      lit(1L << (b * n + k))
    terms.reduce(_ + _)
  }

  /** Two-column convenience: `x` on even bit positions, `y` on odd. */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column =
    zValueN(Seq(x, y), bits)

  /** Cluster `df` for two-dimensional locality: range-partition on the
    * z-value into `numPartitions` and sort within each partition, so a
    * subsequent parquet write produces files AND row groups whose min/max
    * stats are tight on both dimensions. The range exchange samples the
    * z-value distribution, so skew in either raw column does not produce
    * skewed partitions.
    */
  def zorderPartitions(df: DataFrame, x: Column, y: Column,
      bits: Int = 16, numPartitions: Int = 0): DataFrame =
    zorderPartitionsN(df, Seq(x, y), bits, numPartitions)

  /** N-column variant of [[zorderPartitions]]. The helper z-value column
    * is internal: it must not clobber caller data (guarded) and is
    * dropped from the result — dropping a column after
    * repartitionByRange + sortWithinPartitions keeps the partitioning
    * and sort order, so the written files still get their tight stats.
    */
  def zorderPartitionsN(df: DataFrame, cols: Seq[Column],
      bits: Int, numPartitions: Int = 0): DataFrame = {
    require(!df.columns.contains("_zval"),
      "input already has a _zval column; rename it before z-ordering")
    val withZ = df.withColumn("_zval", zValueN(cols, bits))
    val parts = if (numPartitions > 0) numPartitions
                else df.sparkSession.sparkContext.defaultParallelism
    withZ.repartitionByRange(parts, col("_zval"))
      .sortWithinPartitions("_zval")
      .drop("_zval")
  }
}
