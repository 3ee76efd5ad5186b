package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — enrich each left row with the most recent right row at or
  * before its timestamp (per key). The reference has no such operator;
  * training-data and change-tracking pipelines need it constantly
  * ("state of the resource when the event fired").
  *
  * Spark-first formulation (preference (a): compose built-ins, no custom
  * plan node): tag and union both sides, then one window pass per key
  * ordered by (ts, side) carries the last non-null right payload forward
  * onto each left row. Exactly ONE shuffle on the join key — same cost
  * class as a sort-merge join, and Catalyst handles partitioning/AQE.
  * Ties at equal ts: the right side sorts first, so an exact-timestamp
  * match is visible to the left row (DuckDB `ASOF JOIN ... ON l.ts >=
  * r.ts` semantics).
  *
  * At 100 TB both sides shuffle once on the key; the window state is one
  * row (the carried payload), so memory is O(1) per partition stream.
  */
object AsofJoin {

  /** Left as-of join. `right` must be unique per (key, ts) — pre-aggregate
    * if needed (duplicate timestamps would make "the" latest row
    * nondeterministic in any engine). Right columns come back nested in a
    * struct column `asofCol` (null when no right row precedes the left
    * row).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      asofCol: String = "asof"): DataFrame = {
    val rightPayload = struct(
      right.columns.filter(c => c != key && c != tsCol).map(col).toSeq: _*)
    val r = right.select(col(key), col(tsCol), lit(0).as("_side"),
      rightPayload.as("_payload"))
    val leftPayload = struct(left.columns.map(col).toSeq: _*)
    val l = left.select(col(key), col(tsCol), lit(1).as("_side"),
      lit(null).cast(r.schema("_payload").dataType).as("_payload"),
      leftPayload.as("_row"))
    val unioned = r.withColumn("_row", lit(null).cast(l.schema("_row").dataType))
      .unionByName(l)
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(asofCol, last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_row.*"), col(asofCol))
  }
}
