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

  /** Hilbert-curve index of a 2-D point — the locality-superior sibling
    * of [[zValue2]]: consecutive Hilbert codes are always grid-neighbors
    * (no Z-curve "seam jumps"), so range-partitioning on the code gives
    * strictly tighter per-partition bounding boxes on both dimensions —
    * measurably fewer files touched by a 2-D needle query at 100 TB.
    *
    * The classic top-down transform (per the published xy2d algorithm:
    * read bit `s` of each coordinate, add `s²·((3·rx) XOR ry)` to the
    * code, rotate/reflect the full grid when ry = 0): `bits` staged
    * projections over pure integer builtins — each level's (x, y, d)
    * lands in NAMED columns so the expression tree stays linear in
    * `bits` (a single nested Column would square per level), and no
    * level leaves whole-stage codegen. Inputs must already sit in
    * [0, 2^bits); `2·bits ≤ 62`.
    */
  def hilbertValue2(df: DataFrame, x: Column, y: Column, bits: Int,
      out: String): DataFrame = {
    require(bits >= 1 && 2 * bits <= 62, s"bits out of range: $bits")
    val clash = Seq("_hx", "_hy", "_nx", "_ny", out)
    require(!clash.exists(df.columns.contains),
      s"input already carries one of ${clash.mkString(", ")}")
    val n = 1L << bits
    var cur = df.withColumn("_hx", x.cast("long"))
      .withColumn("_hy", y.cast("long"))
      .withColumn(out, lit(0L))
    for (lvl <- bits - 1 to 0 by -1) {
      val s = 1L << lvl
      val rx = shiftright(col("_hx"), lvl).bitwiseAND(lit(1L))
      val ry = shiftright(col("_hy"), lvl).bitwiseAND(lit(1L))
      cur = cur
        .withColumn(out, col(out) +
          lit(s * s) * (rx * lit(3L)).bitwiseXOR(ry))
        .withColumn("_nx",
          when(ry === 0,
            when(rx === 1, lit(n - 1) - col("_hy")).otherwise(col("_hy")))
            .otherwise(col("_hx")))
        .withColumn("_ny",
          when(ry === 0,
            when(rx === 1, lit(n - 1) - col("_hx")).otherwise(col("_hx")))
            .otherwise(col("_hy")))
        .withColumn("_hx", col("_nx"))
        .withColumn("_hy", col("_ny"))
        .drop("_nx", "_ny")
    }
    cur.drop("_hx", "_hy")
  }

  /** [[zorderPartitions]] with the Hilbert code as the clustering key. */
  def hilbertPartitions(df: DataFrame, x: Column, y: Column,
      bits: Int = 16, numPartitions: Int = 0): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
                else df.sparkSession.sparkContext.defaultParallelism
    hilbertValue2(df, x, y, bits, "_hval")
      .repartitionByRange(parts, col("_hval"))
      .sortWithinPartitions("_hval")
      .drop("_hval")
  }

  /** The DuckDB replay of [[hilbertValue2]] as a chained-CTE fragment:
    * levels land in columns `x{i}/y{i}/d{i}`, the final code in
    * `AS $out`. `from` supplies the source relation exposing `$xExpr`
    * and `$yExpr`. Kept beside the operator so the SQL chain and the
    * Column chain can only drift together.
    */
  def hilbertSqlChain(bits: Int, xExpr: String, yExpr: String,
      from: String, out: String, carry: Seq[String] = Nil): String = {
    val n = 1L << bits
    val carrySel = carry.map(c => s"$c, ").mkString
    val head =
      s"h0 AS (SELECT $carrySel$xExpr AS x0, $yExpr AS y0, " +
        s"CAST(0 AS BIGINT) AS d0 FROM $from)"
    val levels = (0 until bits).map { i =>
      val lvl = bits - 1 - i
      val s = 1L << lvl
      val rx = s"((x$i >> $lvl) & 1)"
      val ry = s"((y$i >> $lvl) & 1)"
      s"""h${i + 1} AS (SELECT $carrySel
         |  d$i + ${s * s} * xor($rx * 3, $ry) AS d${i + 1},
         |  CASE WHEN $ry = 0 THEN
         |    CASE WHEN $rx = 1 THEN ${n - 1} - y$i ELSE y$i END
         |  ELSE x$i END AS x${i + 1},
         |  CASE WHEN $ry = 0 THEN
         |    CASE WHEN $rx = 1 THEN ${n - 1} - x$i ELSE x$i END
         |  ELSE y$i END AS y${i + 1}
         |FROM h$i)""".stripMargin
    }
    val last = s"hf AS (SELECT $carrySel d$bits AS $out FROM h$bits)"
    (head +: levels :+ last).mkString(",\n")
  }
}
