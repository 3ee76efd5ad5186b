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
  */
object IncrementalAgg {

  /** Maintain `prev` (schema: keyCol, n, sum_value with decimal sum_value)
    * with `changes` (SnapshotDiff output schema: change_type, keyCol,
    * `keyCol`_prev, valueCol, `valueCol`_prev). Returns the same schema
    * as `prev`.
    */
  def applyChanges(prev: DataFrame, changes: DataFrame,
      keyCol: String, valueCol: String): DataFrame = {
    val dec: Column => Column = _.cast("decimal(18,4)")
    val additions = changes
      .where(col("change_type").isin("insert", "update"))
      .select(col(keyCol).as(keyCol), lit(1L).as("dn"),
        dec(col(valueCol)).as("dv"))
    val retractions = changes
      .where(col("change_type").isin("delete", "update"))
      .select(col(s"${keyCol}_prev").as(keyCol), lit(-1L).as("dn"),
        (-dec(col(s"${valueCol}_prev"))).as("dv"))
    val delta = additions.unionByName(retractions)
    prev.select(col(keyCol), col("n").as("dn"), dec(col("sum_value")).as("dv"))
      .unionByName(delta)
      .groupBy(keyCol)
      .agg(sum("dn").as("n"), sum("dv").cast("decimal(18,4)").as("sum_value"))
      .where(col("n") > 0)
  }

  /** The direct (non-incremental) rollup with the same output schema —
    * the recompute both the specs and the driver oracle compare against.
    */
  def directRollup(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.groupBy(keyCol)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("decimal(18,4)")
          .as("sum_value"))
}
