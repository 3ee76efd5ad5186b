package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — match each point row to the
  * interval rows that contain it, per key. A naive formulation
  * (`l.key = r.key AND l.ts BETWEEN r.start AND r.end`) plans the
  * inequality part as a nested loop within key groups; at 100 TB with hot
  * keys that's quadratic. The scale path bins time: every interval
  * explodes into the fixed-width bins it covers, points map to their one
  * bin, and the join becomes a plain equi-join on (key, bin) followed by
  * the exact BETWEEN filter. Cost: equi-join shuffle + interval
  * replication by ceil(length/binWidth).
  *
  * Bin width is the fan-out knob. `binSeconds = 0` (the default) derives
  * it from the data: the p99 interval length over a bounded sample, so
  * ~99% of intervals land in ≤2 bins whatever their scale (seconds-long
  * sessions or week-long maintenance windows) — a fixed constant explodes
  * the moment the data's scale and the constant disagree. Pass an explicit
  * width when the generating process pins one analytically (e.g. gap-rule
  * sessions are near-always shorter than the gap, so binSeconds = gap
  * skips the sampling job).
  */
object RangeJoin {

  /** Sample cap for the auto-width quantile: bounded driver cost, and at
    * 10k intervals the p99 estimate is stable to a few percent.
    */
  private val AutoSampleRows = 10000

  /** p99 interval length (seconds, ≥ 1) over a bounded sample — the
    * auto-derived bin width.
    */
  private[operators] def sampledBinSeconds(intervals: DataFrame,
      startCol: String, endCol: String): Long = {
    val lens = intervals
      .select((unix_timestamp(col(endCol)) - unix_timestamp(col(startCol)))
        .cast("double").as("len"))
      .filter(col("len").isNotNull)
      .limit(AutoSampleRows)
    val q = lens.stat.approxQuantile("len", Array(0.99), 0.01)
    math.max(q.headOption.map(_.toLong).getOrElse(1L), 1L)
  }

  /** Inner range join: points (key, ts) ⋈ intervals (key, start, end),
    * inclusive bounds. Interval columns come back nested in `ivalCol`.
    * Intervals must not overlap per key if a unique match is expected
    * (the operator itself supports overlap — one output row per match).
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
      tsCol: String, startCol: String, endCol: String,
      binSeconds: Long = 0L, ivalCol: String = "ival"): DataFrame = {
    val width =
      if (binSeconds > 0) binSeconds
      else sampledBinSeconds(intervals, startCol, endCol)
    val binOf: Column => Column = c => floor(unix_timestamp(c) / width)
    val ivalPayload = struct(
      intervals.columns.filter(_ != key).map(col).toSeq: _*)
    val binned = intervals
      .withColumn("_bin", explode(sequence(
        binOf(col(startCol)), binOf(col(endCol)))))
      .select(col(key), col("_bin"), ivalPayload.as(ivalCol))
    points
      .withColumn("_bin", binOf(col(tsCol)))
      .join(binned, Seq(key, "_bin"))
      .filter(col(tsCol) >= col(s"$ivalCol.$startCol") &&
        col(tsCol) <= col(s"$ivalCol.$endCol"))
      .drop("_bin")
  }
}
