package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming state-store provider policy — `graft.stateStore`:
  *
  *  - `hdfs` (default): Spark's HDFSBackedStateStoreProvider. Keeps every
  *    store's working map ON-HEAP — fine for fixture-scale replays, but
  *    at production key cardinality the state competes with execution
  *    memory and GC, which undercuts the bounded-state design of the
  *    watermarked operators.
  *  - `rocksdb`: RocksDBStateStoreProvider — state lives off-heap/on-disk
  *    per partition with changelog checkpointing to the checkpoint dir.
  *    This is the provider the 100 TB bounded-state arguments for the
  *    stream-stream joins and `dropDuplicatesWithinWatermark` assume:
  *    state size is bounded by the watermark horizon, not by heap.
  *
  * The provider class is read from the session conf when a streaming
  * query STARTS, so the knob routes through [[withProvider]] around
  * query start rather than patching a running query.
  */
object StateStores {

  val ConfKey = "graft.stateStore"

  val ProviderConf = "spark.sql.streaming.stateStore.providerClass"

  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Session conf wins; `GRAFT_STATE_STORE` in the environment is the
    * spark-submit-friendly fallback (mirrors [[graft.Barrier.policy]]).
    */
  def policy(spark: SparkSession): String =
    spark.conf.getOption(ConfKey)
      .orElse(sys.env.get("GRAFT_STATE_STORE"))
      .getOrElse("hdfs")

  /** Run `body` (which starts and finishes a streaming query) under the
    * session's state-store policy, restoring the previous provider conf
    * afterwards. Under the default `hdfs` policy this is a no-op — an
    * explicitly set providerClass is left untouched.
    */
  def withProvider[A](spark: SparkSession)(body: => A): A =
    policy(spark) match {
      case "rocksdb" =>
        val prev = spark.conf.getOption(ProviderConf)
        spark.conf.set(ProviderConf, RocksDbProvider)
        try body finally prev match {
          case Some(v) => spark.conf.set(ProviderConf, v)
          case None => spark.conf.unset(ProviderConf)
        }
      case _ => body
    }
}
