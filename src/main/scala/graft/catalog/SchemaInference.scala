package graft.catalog

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sample-N schema inference over a JSON column — the Spark form of the
  * reference's Azure Resource Graph schema discovery, which samples 10
  * live rows and derives a table schema from them
  * (plugins/azure-provider/resource_graph.go:112-128).
  *
  * Spark already owns the hard part: `spark.read.json` over the sampled
  * strings unions the per-document shapes into one merged StructType
  * (numeric widening, nullable everywhere — the same behavior its JSON
  * datasource uses at scale). The sample is a driver-side `limit(n)`, so
  * the inference cost is bounded by n documents regardless of table size.
  */
object SchemaInference {

  /** Infer the payload schema from up to `sampleN` non-null documents. */
  def inferJsonSchema(df: DataFrame, jsonCol: String,
      sampleN: Int = 10): StructType = {
    val spark = df.sparkSession
    val sample = df.select(col(jsonCol).cast("string").as("j"))
      .filter(col("j").isNotNull)
      .limit(sampleN)
      .as(Encoders.STRING)
    spark.read.json(sample).schema
  }

  /** A typed view of `df` using the inferred schema: every discovered
    * field becomes a column of a `parsed` struct (the
    * DiscoverResourceSchema → typed-table flow in one step).
    */
  def inferredView(df: DataFrame, jsonCol: String,
      sampleN: Int = 10): DataFrame =
    df.withColumn("parsed",
      from_json(col(jsonCol), inferJsonSchema(df, jsonCol, sampleN)))
}
