package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registers the driver-provided parquet tables (TESTDATA.md) as temp views
  * so queries can reference them by bare name — the same names the DuckDB
  * oracle sees. Idempotent per (session, dir).
  *
  * Reference model: corkscrew registers provider tables + unified views in
  * DuckDB at open (internal/db/unified_schema.go:94-122, :432-462); here the
  * testdata star schema plays that role.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val registered = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Read one table of the star schema from `dir`, normalizing timestamp
    * physical encodings across testdata generations so every downstream
    * query sees session-zone `TimestampType` columns:
    *   - nanosecond parquet timestamps (older generations; Spark's
    *     vectorized reader rejects them) are read as raw nanos via
    *     `nanosAsLong` and floored to microseconds — lossless, the data
    *     has microsecond resolution;
    *   - `timestamp[us]` without UTC adjustment (current generation) comes
    *     back as TIMESTAMP_NTZ, which is cast to TimestampType — an
    *     identity mapping under the engine's fixed UTC session zone.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTimestamps(spark.read.parquet(s"$dir/$name.parquet"),
      nanosLongCols = if (name == "events") Set("ts") else Set.empty)
  }

  /** Normalize a frame's timestamp physical encodings to session-zone
    * `TimestampType` (see [[load]]). Works on batch AND streaming frames —
    * the streaming queries reading raw fixture parquet reuse it so their
    * event-time columns match what every batch query sees. `nanosLongCols`
    * names columns that are raw nanosecond longs in older testdata
    * generations.
    */
  def normalizeTimestamps(raw: DataFrame,
      nanosLongCols: Set[String] = Set.empty): DataFrame =
    raw.schema.fields.foldLeft(raw) { (df, f) =>
      f.dataType match {
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn(f.name, col(f.name).cast("timestamp"))
        case org.apache.spark.sql.types.LongType if nanosLongCols(f.name) =>
          df.withColumn(f.name,
            timestamp_micros(expr(s"${f.name} div 1000")))
        case _ => df
      }
    }

  /** Register all tables in `dir` as temp views (bare names). Fast no-op if
    * this session already points at `dir`.
    */
  def register(spark: SparkSession, dir: String): Unit = {
    val key = System.identityHashCode(spark).toString
    if (registered.get(key) != dir) {
      names.foreach { n =>
        load(spark, dir, n).createOrReplaceTempView(n)
      }
      registered.put(key, dir)
    }
  }

  /** Register views then run a SQL query — the corkscrew `query "<SQL>"`
    * path (pkg/query/engine.go:130-229) over the star schema.
    */
  def sql(spark: SparkSession, dir: String, q: String): DataFrame = {
    register(spark, dir)
    spark.sql(q)
  }
}
