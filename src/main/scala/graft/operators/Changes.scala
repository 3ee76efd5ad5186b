package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-tracking / drift-detection operators (reference:
  * plugins/aws-provider/change_storage.go, plugins/gcp-provider/
  * drift_detector.go:198-316, base_change_tracker.go).
  */
object Changes {

  /** ChangeQuery bounds (base_change_tracker.go:14-24, :66-93). */
  val DefaultLimit = 1000
  val MaxLimit = 10000
  val MaxTimeRangeDays = 30

  /** Dynamic predicate builder (change_storage.go:485-560): optional
    * filters conjoined programmatically.
    */
  def buildFilter(filters: Seq[Column]): Column =
    filters.reduceOption(_ && _).getOrElse(lit(true))

  /** Per-resource change history: filter + desc timeline + cap
    * (change_storage.go:249-272, E13). `orderCols` must end in a unique
    * key for deterministic results.
    */
  def history(events: DataFrame, resourceCol: String, resourceId: Any,
      tsCol: String = "ts", idCol: String = "event_id",
      limit: Int = DefaultLimit): DataFrame =
    events.filter(col(resourceCol) === resourceId)
      .orderBy(col(tsCol).desc, col(idCol).desc)
      .limit(math.min(limit, MaxLimit))

  /** Drift detection (drift_detector.go:198-316): full-outer join baseline
    * vs current on the key, emit one row per differing field with
    * drift_type RESOURCE_ADDED / RESOURCE_REMOVED / FIELD_MODIFIED.
    * `fields` are the comparable columns present in both frames.
    * Distributed: one shuffle on the key, then per-row field explosion.
    */
  def drift(baseline: DataFrame, current: DataFrame, keyCol: String,
      fields: Seq[String]): DataFrame = {
    val b = baseline.select(col(keyCol).as("key"),
      struct(fields.map(f => col(f).cast("string").as(f)): _*).as("b"))
    val c = current.select(col(keyCol).as("key"),
      struct(fields.map(f => col(f).cast("string").as(f)): _*).as("c"))
    diffExplode(b.join(c, Seq("key"), "full_outer"), fields)
  }

  /** Latest-state drift from ONE event log in ONE pass — the shape to
    * prefer when baseline and current are the same log split by a cutoff
    * (the [[drift]] caller's common case). Each side's latest state is a
    * `max_by` over the (orderCols) tuple gated by the side predicate, so
    * the whole comparison is a single partial-aggregated groupBy on the
    * key: one shuffle of (key, two small structs), no window sort, no
    * full-outer join. At 100 TB that is the difference between one
    * map-combined exchange and two window shuffles plus a join; at bench
    * scale it halves the wall-clock (measured 0.43 s → ~0.25 s at
    * sf0.1). A key with no rows on a side yields a NULL struct there —
    * exactly the full-outer semantics ([[drift]] parity pinned in
    * ChangesAnalyticsSpec).
    */
  def driftFromLog(events: DataFrame, keyCol: String, fields: Seq[String],
      orderCols: Seq[String], inBaseline: Column): DataFrame = {
    val latest = struct(fields.map(f => col(f).cast("string").as(f)): _*)
    val ord = struct(orderCols.map(col): _*)
    // max_by ignores rows whose ordering value is NULL, so gating the
    // ordering with the side predicate confines each aggregate to its side.
    val joined = events.groupBy(col(keyCol).as("key")).agg(
      max_by(when(inBaseline, latest), when(inBaseline, ord)).as("b"),
      max_by(when(!inBaseline, latest), when(!inBaseline, ord)).as("c"))
    diffExplode(joined, fields)
  }

  /** Shared diff step over a (key, b, c) frame of latest-state structs. */
  private def diffExplode(joined: DataFrame, fields: Seq[String]): DataFrame = {
    // Generators can't sit inside CASE WHEN, so the per-field diff array is
    // built unconditionally: one null-struct element for ADDED/REMOVED rows
    // (single output row), the differing-fields array for MODIFIED rows
    // (zero rows when nothing changed — the row disappears, as in the
    // reference which only emits DriftItems).
    val nullItem = struct(
      lit(null).cast("string").as("field"),
      lit(null).cast("string").as("baseline_value"),
      lit(null).cast("string").as("current_value"))
    val diffItems = filter(
      array(fields.map(f => struct(
        lit(f).as("field"),
        col("b").getField(f).as("baseline_value"),
        col("c").getField(f).as("current_value"))): _*),
      s => !(s.getField("baseline_value") <=> s.getField("current_value")))
    joined.select(col("key"),
        when(col("c").isNull, lit("RESOURCE_REMOVED"))
          .when(col("b").isNull, lit("RESOURCE_ADDED"))
          .otherwise(lit("FIELD_MODIFIED")).as("drift_type"),
        explode(when(col("b").isNull || col("c").isNull, array(nullItem))
          .otherwise(diffItems)).as("f"))
      .select(col("key"), col("drift_type"),
        col("f.field").as("field"),
        col("f.baseline_value").as("baseline_value"),
        col("f.current_value").as("current_value"))
  }

  /** Tag drift (drift_detector.go:262-316): compare two map<string,string>
    * columns, emit TAG_ADDED / TAG_REMOVED / TAG_CHANGED rows.
    */
  def tagDrift(joined: DataFrame, keyCol: String, baseTags: String,
      curTags: String): DataFrame = {
    val allKeys = array_distinct(concat(
      coalesce(map_keys(col(baseTags)), array()),
      coalesce(map_keys(col(curTags)), array())))
    joined.select(col(keyCol).as("key"),
        explode(allKeys).as("tag_key"),
        col(baseTags).as("bt"), col(curTags).as("ct"))
      .withColumn("baseline_value", element_at(col("bt"), col("tag_key")))
      .withColumn("current_value", element_at(col("ct"), col("tag_key")))
      .filter(!(col("baseline_value") <=> col("current_value")))
      .withColumn("drift_type",
        when(col("baseline_value").isNull, lit("TAG_ADDED"))
          .when(col("current_value").isNull, lit("TAG_REMOVED"))
          .otherwise(lit("TAG_CHANGED")))
      .select("key", "drift_type", "tag_key", "baseline_value", "current_value")
  }

  /** Baseline snapshot with per-row checksum (drift_detector.go:136-182,
    * E12): sha2 of the canonical JSON of all columns.
    */
  def snapshot(df: DataFrame, baselineId: String): DataFrame =
    df.withColumn("baseline_id", lit(baselineId))
      .withColumn("checksum", sha2(to_json(struct(df.columns.map(col): _*)), 256))

  /** Impact assessment (base_change_tracker.go:115-312, E18): field-name
    * keyword heuristics → security/availability/cost/perf weights →
    * risk_score. Weights: security 40/30/15/5, availability 30/20/10/2,
    * cost flat 15, performance flat 15.
    */
  def impactScore(fieldCol: Column): Column = {
    val f = lower(fieldCol)
    val security = when(f.contains("policy") || f.contains("permission") ||
        f.contains("role") || f.contains("security"), 40)
      .when(f.contains("encryption") || f.contains("kms") || f.contains("key"), 30)
      .when(f.contains("public") || f.contains("acl"), 15)
      .otherwise(5)
    val availability = when(f.contains("delete") || f.contains("terminate"), 30)
      .when(f.contains("state") || f.contains("status"), 20)
      .when(f.contains("size") || f.contains("capacity"), 10)
      .otherwise(2)
    val cost = when(f.contains("instance") || f.contains("size") ||
      f.contains("tier") || f.contains("sku"), 15).otherwise(0)
    val perf = when(f.contains("iops") || f.contains("throughput") ||
      f.contains("performance"), 15).otherwise(0)
    least(security + availability + cost + perf, lit(100))
  }

  /** Severity from score (drift_detector.go:322-333). */
  def severityFromScore(score: Column): Column =
    when(score >= 70, "CRITICAL").when(score >= 50, "HIGH")
      .when(score >= 25, "MEDIUM").otherwise("LOW")
}
