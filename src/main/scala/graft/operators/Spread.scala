package graft.operators

import org.apache.spark.sql.DataFrame

/** Spread a CPU-bound stage across all cores when the input arrives
  * under-partitioned (a single small parquet file reads as one partition,
  * pinning JSON parsing / hashing / shingling to one task). No-op when the
  * source already has enough splits — at cluster scale the scan is already
  * parallel and the extra shuffle would be pure cost.
  */
private[graft] object Spread {
  def apply(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= math.min(p, 8)) df else df.repartition(p)
  }
}
