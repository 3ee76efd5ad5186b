package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-Lines corpus interchange: the de-facto training-data shipping
  * format (The Pile, Dolma, RedPajama, FineWeb all distribute JSONL
  * shards). The reference's JSON surface is a dump sink
  * (`cmd/corkscrew/main.go` `--output json`); for a 100 TB pipeline the
  * READ side matters just as much, so both halves live here:
  *
  *  - [[write]] shards deterministically by a key column (hash
  *    repartition + within-shard sort), so re-runs produce stable shard
  *    membership and downstream consumers can route by shard.
  *  - [[read]] takes an EXPLICIT schema — schema inference on JSONL is
  *    a full extra corpus scan at 100 TB, so the contract makes the
  *    caller state the schema and spend one scan, not two. Malformed
  *    lines land in a corrupt-record column (PERMISSIVE) instead of
  *    failing the job: on a billion-line crawl dump a handful of
  *    truncated lines must quarantine, not kill the read.
  */
object JsonlCorpus {

  /** Write `df` as JSONL under `path`, `shards` files, rows routed by
    * hash of `shardBy` and sorted by it within each shard.
    */
  def write(df: DataFrame, path: String, shardBy: String, shards: Int): Unit = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    df.repartition(shards, col(shardBy))
      .sortWithinPartitions(shardBy)
      .write.mode("overwrite").json(path)
  }

  /** Read a JSONL corpus with an explicit schema. Returns the schema's
    * columns plus `corruptCol` (string): NULL for well-formed lines,
    * the raw line for malformed ones (all schema columns NULL on such
    * rows). The caller filters or counts quarantined lines explicitly.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
      corruptCol: String = "_corrupt_record"): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already has a '$corruptCol' column")
    val withCorrupt = StructType(
      schema.fields :+ StructField(corruptCol, StringType, nullable = true))
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }

  /** CSV twin of the JSONL pair — same explicit-schema + quarantine
    * contract (tabular exports and many public datasets ship CSV/TSV).
    * Header on, standard quoting; a row whose parse fails lands in the
    * corrupt column with all schema columns NULL.
    */
  def writeCsv(df: DataFrame, path: String, shardBy: String,
      shards: Int): Unit = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    df.repartition(shards, col(shardBy))
      .sortWithinPartitions(shardBy)
      .write.mode("overwrite").option("header", "true").csv(path)
  }

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      corruptCol: String = "_corrupt_record"): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already has a '$corruptCol' column")
    val withCorrupt = StructType(
      schema.fields :+ StructField(corruptCol, StringType, nullable = true))
    spark.read
      .schema(withCorrupt)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)
  }

  /** ORC twin — the columnar interchange beside parquet (Hive-lineage
    * warehouses ship ORC). Self-describing binary, so the quarantine
    * contract of the text formats doesn't apply; what matters at 100 TB
    * is that ORC keeps the SAME scan economics as parquet — column
    * pruning and predicate pushdown into stripe/row-group indexes —
    * which the IO4 driver query pins as a plan fact.
    */
  def writeOrc(df: DataFrame, path: String, shardBy: String,
      shards: Int): Unit = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    df.repartition(shards, col(shardBy))
      .sortWithinPartitions(shardBy)
      .write.mode("overwrite").orc(path)
  }

  def readOrc(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
