package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table layout + unified views + upsert semantics (reference:
  * internal/db/unified_schema.go, internal/db/graph_loader.go:155-279).
  *
  * Storage is plain parquet behind a [[TableStore]] trait so Delta (MERGE,
  * DELETE) can slot in on a real deployment; the upsert semantics the
  * reference gets from `INSERT OR IGNORE` / `ON CONFLICT DO UPDATE` are
  * reproduced deterministically with window dedup — which also works at
  * 100 TB because the dedup shuffles only on the key columns.
  */
object ResourceCatalog {

  /** S6 resource upsert: `INSERT OR IGNORE` = first-write-wins per id
    * (graph_loader.go:189-216). `existing` rows always beat `incoming`;
    * within `incoming`, the earliest scanned_at (tie: stable input order
    * is not observable, so tie-break on scanned_at then all columns via
    * row_number over a deterministic ordering column).
    */
  def upsertResources(existing: DataFrame, incoming: DataFrame,
      idCol: String = "id"): DataFrame = {
    val tagged = existing.withColumn("_pri", lit(0))
      .unionByName(incoming.withColumn("_pri", lit(1)))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("_pri").asc, col("scanned_at").asc)
    tagged.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_pri", "_rn")
  }

  /** S6 edge upsert: `ON CONFLICT ... DO UPDATE` = last-write-wins on the
    * (from_id, to_id, relationship_type, provider) PK
    * (graph_loader.go:218-253, unified_schema.go:224-249).
    */
  def upsertRelationships(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val keys = Seq("from_id", "to_id", "relationship_type", "provider")
    val tagged = existing.withColumn("_pri", lit(0))
      .unionByName(incoming.withColumn("_pri", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_pri").desc, col("discovered_at").desc)
    tagged.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_pri", "_rn")
  }

  /** Cross-provider unification view (unified_schema.go:432-462):
    * `all_cloud_resources` = aligned projections unioned by name.
    * Each input frame supplies its own column mapping.
    */
  def allCloudResources(frames: Seq[(String, DataFrame, Map[String, String])]): DataFrame =
    frames.map { case (provider, df, mapping) =>
      val cols = Seq("id", "name", "type", "service", "region", "account_id",
        "tags", "scanned_at")
      df.select(lit(provider).as("provider") +:
        cols.map(c => col(mapping.getOrElse(c, c)).as(c)): _*)
    }.reduce(_ unionByName _)

  /** Rollup view `resource_counts_by_provider`
    * (unified_schema.go:469-480).
    */
  def resourceCountsByProvider(all: DataFrame): DataFrame =
    all.groupBy("provider").agg(
      count(lit(1)).as("resource_count"),
      countDistinct("service").as("service_count"),
      countDistinct("region").as("location_count"),
      countDistinct("account_id").as("account_count"),
      min("scanned_at").as("first_scanned"),
      max("scanned_at").as("last_scanned"))

  /** Scan-metadata row (S7, graph_loader.go:255-279). */
  def scanMetadataRow(spark: SparkSession, provider: String, scanType: String,
      resourceCount: Long, relationshipCount: Long, durationMs: Long): DataFrame = {
    import spark.implicits._
    Seq((provider, scanType, resourceCount, relationshipCount, durationMs,
      new java.sql.Timestamp(0L)))
      .toDF("provider", "scan_type", "resource_count", "relationship_count",
        "duration_ms", "completed_at")
  }

  /** E14 retention: drop events older than the cutoff — on parquet this is
    * a rewrite (partition drop by date at scale; Delta DELETE when
    * available).
    */
  def applyRetention(events: DataFrame, tsCol: String,
      cutoff: java.sql.Timestamp): DataFrame =
    events.filter(col(tsCol) >= lit(cutoff))
}

/** Pluggable storage behind the catalog (parquet in dev, Delta in prod). */
trait TableStore {
  def read(spark: SparkSession, table: String): DataFrame
  def append(df: DataFrame, table: String): Unit
  def overwrite(df: DataFrame, table: String): Unit
}

final class ParquetTableStore(root: String) extends TableStore {
  private def path(table: String) = s"$root/$table"
  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(path(table))
  def append(df: DataFrame, table: String): Unit =
    df.write.mode("append").parquet(path(table))
  def overwrite(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").parquet(path(table))
}

/** Bucketed catalog tables — the Spark answer to the reference's B-tree
  * indexes on resource_id/from_id (unified_schema.go:129-143): two tables
  * bucketed on the same key join WITHOUT a shuffle (each bucket pair is
  * co-located), and point lookups prune to one bucket. Used for the
  * change-history / graph-edge access paths where the reference indexes.
  */
object Bucketing {
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
}
