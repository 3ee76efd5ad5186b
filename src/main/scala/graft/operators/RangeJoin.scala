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
  * replication by ceil(length/binWidth) — pick `binSeconds` near the
  * typical interval length.
  */
object RangeJoin {

  /** Inner range join: points (key, ts) ⋈ intervals (key, start, end),
    * inclusive bounds. Interval columns come back nested in `ivalCol`.
    * Intervals must not overlap per key if a unique match is expected
    * (the operator itself supports overlap — one output row per match).
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
      tsCol: String, startCol: String, endCol: String,
      binSeconds: Long, ivalCol: String = "ival"): DataFrame = {
    val binOf: Column => Column = c => floor(unix_timestamp(c) / binSeconds)
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
