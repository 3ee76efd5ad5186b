package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 history over a
  * [[SnapshotTableStore]]'s commit chain — the warehouse verb that turns
  * "the table's versions" into "each key's attribute timeline": one row
  * per (key, attribute-state run) with `valid_from`/`valid_to` version
  * stamps and an `is_current` flag. The reference keeps only
  * latest-state rows plus a change-event log (base_change_tracker.go);
  * SCD2 is the queryable join-target form of that history — "what
  * segment was this account in when the order landed" joins on
  * `valid_from <= v < valid_to`.
  *
  * Shape: the version frames union with a version stamp (reading N
  * versions costs N manifest reads, no rewrite), then ONE key-keyed
  * window pass finds change points (`lag` of the attribute struct) and
  * a second over the change points assigns `valid_to = lead(valid_from)`
  * — both windows share the same key partitioning, so the whole build
  * is one shuffle. Deletions close a run: a key absent from version v
  * gets `valid_to = v` with no successor row.
  */
object Scd2 {

  def history(spark: SparkSession, store: SnapshotTableStore, table: String,
      keyCol: String, attrCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(attrCols.nonEmpty, "SCD2 needs at least one tracked attribute")
    val versions = store.versions(table)
    require(versions.nonEmpty, s"snapshot table $table does not exist")
    val maxV = versions.max
    val tagged = versions.map { v =>
      store.readVersion(spark, table, v)
        .select((col(keyCol) +: attrCols.map(col)) :+ lit(v).as("_v"): _*)
    }.reduce(_ unionByName _)
    val wKey = Window.partitionBy(keyCol).orderBy("_v")
    val attrStruct = struct(attrCols.map(col): _*)
    // run segmentation: a new run starts on first appearance, on an
    // attribute change, or on reappearance after a version gap (the key
    // was deleted and re-inserted) — attrs are constant within a run by
    // construction, so the grouped first() below is deterministic
    val prev = lag(attrStruct, 1).over(wKey)
    val prevV = lag(col("_v"), 1).over(wKey)
    val flagged = tagged
      .withColumn("_chg",
        when(prev.isNull || prev =!= attrStruct ||
          prevV =!= col("_v") - 1, 1L).otherwise(0L))
      .withColumn("_seg", sum(col("_chg")).over(
        wKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col(keyCol), col("_seg"))
      .agg(attrCols.map(c => first(col(c)).as(c)).head,
        (attrCols.tail.map(c => first(col(c)).as(c)) ++
          Seq(min(col("_v")).cast("bigint").as("valid_from"),
            max(col("_v")).as("_run_last"))): _*)
      .withColumn("valid_to",
        when(col("_run_last") === maxV, lit(null))
          .otherwise(col("_run_last") + 1).cast("bigint"))
      .withColumn("is_current", col("valid_to").isNull)
      .select((col(keyCol) +: attrCols.map(col)) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }
}
