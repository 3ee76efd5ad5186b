package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KQL-surface re-expression (reference S4/J6/G5-azure:
  * plugins/azure-provider/resource_graph.go — `Resources | project ... |
  * order by`, `summarize count() by type, location`, `make_set(location)`,
  * `mv-expand`, `extract_all`, `join kind=leftouter`). Each KQL operator
  * the reference's queries use, as its Spark primitive — so an Azure
  * Resource-Graph-shaped pull can run against DataFrames unchanged in
  * meaning.
  */
object Kql {

  /** `| project a, b, c` */
  def project(df: DataFrame, cols: String*): DataFrame = df.select(cols.map(col): _*)

  /** `| where <predicate>` */
  def where(df: DataFrame, pred: Column): DataFrame = df.filter(pred)

  /** `| order by x asc/desc` */
  def orderBy(df: DataFrame, cols: (String, Boolean)*): DataFrame =
    df.orderBy(cols.map { case (c, asc) => if (asc) col(c).asc else col(c).desc }: _*)

  /** `| summarize count() by k1, k2` (resource_graph.go:84-86) */
  def summarizeCount(df: DataFrame, keys: String*): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("count_"))

  /** `| summarize make_set(x) by k` (resource_graph.go:88-90) */
  def summarizeMakeSet(df: DataFrame, key: String, valueCol: String): DataFrame =
    df.groupBy(col(key)).agg(array_sort(collect_set(col(valueCol))).as(s"set_$valueCol"))

  /** `| mv-expand arrayCol` (resource_graph.go:131-151) */
  def mvExpand(df: DataFrame, arrayCol: String): DataFrame =
    df.withColumn(arrayCol, explode_outer(col(arrayCol)))

  /** `extract_all(regex, text)` → array of matches. */
  def extractAll(c: Column, regex: String): Column =
    call_function("regexp_extract_all", c, lit(regex), lit(1))

  /** `| join kind=leftouter (right) on key` (resource_graph.go:268-277) */
  def joinLeftOuter(left: DataFrame, right: DataFrame, key: String): DataFrame =
    left.join(right, Seq(key), "left")

  /** `| take n` */
  def take(df: DataFrame, n: Int): DataFrame = df.limit(n)
}
