package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a grouped count/sum rollup from a
  * [[graft.catalog.SnapshotDiff]] change feed — the materialized-view
  * maintenance shape: `rollup(v_new) = rollup(v_old) ⊎ delta(changes)`.
  * At 100 TB the rollup refresh after a nightly load then costs
  * O(|changes| + |groups|) instead of a full table rescan, and the result
  * is EXACTLY the recomputed rollup (count/sum are self-maintainable
  * aggregates; the sums run in decimal so incremental and direct
  * arithmetic agree bit-for-bit — no IEEE reassociation drift).
  *
  * Every change row contributes retraction/addition rows:
  * insert → (+1, +value) under the after-key; delete → (−1, −value)
  * under the before-key; update → BOTH (so group-key changes move the
  * row between groups correctly). Groups whose maintained count reaches
  * zero are dropped, matching the recomputed rollup's absent groups.
  *
  * NULL discipline: SQL's SUM over a group with no non-null value is
  * NULL, not 0 — so the rollup carries `n_vals` (the non-null count,
  * itself self-maintainable) and the maintained sum collapses to NULL
  * exactly when `n_vals` reaches 0. Without it, retracting a group's
  * last non-null value while null-valued rows remain would yield 0
  * where the direct recompute yields NULL.
  */
object IncrementalAgg {

  /** Maintain `prev` (schema: keyCol, n, n_vals, sum_value — the
    * [[directRollup]] shape) with `changes` (SnapshotDiff output schema:
    * change_type, keyCol, `keyCol`_prev, valueCol, `valueCol`_prev).
    * Returns the same schema as `prev`.
    */
  def applyChanges(prev: DataFrame, changes: DataFrame,
      keyCol: String, valueCol: String): DataFrame = {
    val dec: Column => Column = _.cast("decimal(18,4)")
    val additions = changes
      .where(col("change_type").isin("insert", "update"))
      .select(col(keyCol).as(keyCol), lit(1L).as("dn"),
        when(col(valueCol).isNotNull, 1L).otherwise(0L).as("dv_n"),
        dec(col(valueCol)).as("dv"))
    val retractions = changes
      .where(col("change_type").isin("delete", "update"))
      .select(col(s"${keyCol}_prev").as(keyCol), lit(-1L).as("dn"),
        when(col(s"${valueCol}_prev").isNotNull, -1L).otherwise(0L).as("dv_n"),
        (-dec(col(s"${valueCol}_prev"))).as("dv"))
    val delta = additions.unionByName(retractions)
    prev.select(col(keyCol), col("n").as("dn"), col("n_vals").as("dv_n"),
        dec(col("sum_value")).as("dv"))
      .unionByName(delta)
      .groupBy(keyCol)
      .agg(sum("dn").as("n"), sum("dv_n").as("n_vals"),
        sum("dv").cast("decimal(18,4)").as("_sum_raw"))
      .where(col("n") > 0)
      .withColumn("sum_value",
        when(col("n_vals") > 0, col("_sum_raw")).otherwise(lit(null)))
      .select(col(keyCol), col("n"), col("n_vals"),
        col("sum_value").cast("decimal(18,4)"))
  }

  /** The direct (non-incremental) rollup with the same output schema —
    * the recompute both the specs and the driver oracle compare against.
    */
  def directRollup(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.groupBy(keyCol)
      .agg(count(lit(1)).as("n"),
        count(col(valueCol)).as("n_vals"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("decimal(18,4)")
          .as("sum_value"))
}
