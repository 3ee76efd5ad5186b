package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset profiler — the data-card pass a training corpus gets before
  * anything else consumes it (per-column row/null/distinct counts, numeric
  * bounds and exact means, lexicographic string bounds and average
  * lengths, timestamp bounds as epoch seconds). The reference surfaces
  * per-table schema + row counts through its catalog commands
  * (cmd/corkscrew/main.go `schemas`, internal/db metadata queries); this
  * generalizes that surface to full column statistics as a first-class
  * relational operator.
  *
  * [[profile]] is ONE aggregation pass over the table: Spark plans the
  * multi-column exact `count_distinct` battery via Expand (a single
  * shuffle whose map side grows ×profiled-columns but whose reduce output
  * is one row), and every other statistic rides the same scan. Numeric
  * means sum in decimal(38,6) — exact and addition-order-independent —
  * and emit as DOUBLE, so every emitted cell is engine-replayable
  * bit-for-bit (COVERAGE.md's cross-engine determinism rules; only
  * scalar columns leave the operator).
  *
  * [[approxProfile]] swaps the exact distinct for HLL++
  * `approx_count_distinct`, dropping the Expand entirely: one narrow
  * pass with bounded mergeable sketch state per column — the 100 TB
  * default, verified by a driver-checked relative-error bound instead of
  * a hash compare (the q_a15 pattern).
  */
object Profiler {

  private def isNum(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
         _: FloatType | _: DoubleType | _: DecimalType => true
    case _ => false
  }

  private def dtypeName(dt: DataType): String = dt.simpleString

  private def nullD: Column = lit(null).cast("double")
  private def nullS: Column = lit(null).cast("string")

  /** Per-column statistics in long form, one pass over `df`:
    * `(col_name, dtype, n_rows, n_nulls, n_distinct, min_num, max_num,
    * mean_num, min_str, max_str, avg_len)`. Numeric columns fill the
    * `_num` block (mean via exact decimal-space sums), strings the
    * `_str` block plus `avg_len`, timestamps the `_num` block as epoch
    * seconds, booleans the `_num` block with mean = true-fraction; other
    * types carry counts only. `columns` defaults to every column.
    */
  def profile(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val names =
      if (columns.nonEmpty) columns else df.schema.fieldNames.toSeq
    val fields = names.map(n => df.schema(n))
    val aggs = scala.collection.mutable.ArrayBuffer[Column](
      count(lit(1)).as("__n_rows"))
    fields.foreach { f =>
      val c = col(f.name); val n = f.name
      aggs += count(c).as(s"${n}__nn")
      aggs += count_distinct(c).as(s"${n}__nd")
      f.dataType match {
        case dt if isNum(dt) =>
          aggs += min(c.cast("double")).as(s"${n}__min")
          aggs += max(c.cast("double")).as(s"${n}__max")
          aggs += sum(c.cast("decimal(38,6)")).as(s"${n}__sum")
        case _: TimestampType =>
          aggs += min(unix_timestamp(c)).cast("double").as(s"${n}__min")
          aggs += max(unix_timestamp(c)).cast("double").as(s"${n}__max")
        case _: StringType =>
          aggs += min(c).as(s"${n}__mins")
          aggs += max(c).as(s"${n}__maxs")
          aggs += sum(length(c).cast("long")).as(s"${n}__lensum")
        case _: BooleanType =>
          aggs += min(c.cast("int")).cast("double").as(s"${n}__min")
          aggs += max(c.cast("int")).cast("double").as(s"${n}__max")
          aggs += sum(c.cast("long")).as(s"${n}__tsum")
        case _ => () // opaque (array/struct/binary): counts only
      }
    }
    val row = df.agg(aggs.head, aggs.tail.toSeq: _*)
    val structs = fields.map { f =>
      val n = f.name
      def g(s: String): Column = col(s"${n}__$s")
      val nn = g("nn")
      val (minNum, maxNum, meanNum, minStr, maxStr, avgLen) =
        f.dataType match {
          case dt if isNum(dt) =>
            (g("min"), g("max"),
              when(nn > 0, g("sum").cast("double") / nn.cast("double")),
              nullS, nullS, nullD)
          case _: TimestampType =>
            (g("min"), g("max"), nullD, nullS, nullS, nullD)
          case _: StringType =>
            (nullD, nullD, nullD, g("mins"), g("maxs"),
              when(nn > 0, g("lensum").cast("double") / nn.cast("double")))
          case _: BooleanType =>
            (g("min"), g("max"),
              when(nn > 0, g("tsum").cast("double") / nn.cast("double")),
              nullS, nullS, nullD)
          case _ => (nullD, nullD, nullD, nullS, nullS, nullD)
        }
      struct(
        lit(n).as("col_name"), lit(dtypeName(f.dataType)).as("dtype"),
        (col("__n_rows") - nn).as("n_nulls"), g("nd").as("n_distinct"),
        minNum.cast("double").as("min_num"),
        maxNum.cast("double").as("max_num"),
        meanNum.cast("double").as("mean_num"),
        minStr.cast("string").as("min_str"),
        maxStr.cast("string").as("max_str"),
        avgLen.cast("double").as("avg_len"))
    }
    row.select(col("__n_rows").as("n_rows"),
        explode(array(structs: _*)).as("p"))
      .select(col("p.col_name"), col("p.dtype"), col("n_rows"),
        col("p.n_nulls"), col("p.n_distinct"), col("p.min_num"),
        col("p.max_num"), col("p.mean_num"), col("p.min_str"),
        col("p.max_str"), col("p.avg_len"))
  }

  /** The sketch twin of [[profile]]'s distinct counts: `(col_name,
    * n_distinct_approx)` per column via HLL++ with relative standard
    * deviation `rsd` — no Expand, one narrow pass, mergeable partial
    * state. The driver oracle bounds each estimate against the exact
    * distinct count instead of hash-comparing it. The 0.02 default
    * (~2¹⁶ registers/column) is the 100 TB operating point: register
    * count — and with it sketch update, merge, and shuffle cost —
    * grows 1/rsd², so a 0.01 sketch costs 4× for precision a profiling
    * pass doesn't need (callers with a tighter tolerance pass their
    * own rsd and budget accordingly).
    */
  def approxProfile(df: DataFrame, columns: Seq[String] = Nil,
      rsd: Double = 0.02): DataFrame = {
    val names =
      if (columns.nonEmpty) columns else df.schema.fieldNames.toSeq
    val aggs = names.map(n =>
      approx_count_distinct(col(n), rsd).as(s"${n}__nd"))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val structs = names.map(n => struct(lit(n).as("col_name"),
      col(s"${n}__nd").as("n_distinct_approx")))
    row.select(explode(array(structs: _*)).as("p"))
      .select(col("p.col_name"), col("p.n_distinct_approx"))
  }
}
