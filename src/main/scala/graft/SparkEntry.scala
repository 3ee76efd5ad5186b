package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the multi-way join + exact-decimal aggregate (SURVEY.md §2.3 J3).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.j3MultiwayRevenue(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ PipelineQueries.all
  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omitted for approximate (hash-specific) ops —
    * those get rows-only checks and are verified against their exact
    * counterparts in ScalaTest.
    */
  def oracleSql: Map[String, String] =
    Queries.oracles ++ PipelineQueries.oracles
}
