package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Structured-Streaming change monitor (reference ST1/ST2:
  * plugins/aws-provider/change_types.go:13-20 StreamChanges/MonitorChanges,
  * :91-95 StreamRequest{BufferSize, BatchTimeout}; K8s informer push
  * kubernetes-provider/informer_cache.go:78-110).
  *
  * The reference streams are transport: events flow from scanners to
  * subscribers with buffering and batch timeouts. Spark-first mapping:
  * `readStream` on the event table (file source), `Trigger.ProcessingTime`
  * as the batch timeout, `foreachBatch` as the subscriber callback, and a
  * watermarked windowed aggregation for the live trend view. The K8s
  * ADDED/MODIFIED/DELETED upsert becomes a per-batch merge.
  */
object ChangeMonitor {

  /** ST1: open the event stream from a directory of event files. */
  def changeStream(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  /** ST2: monitor with a callback per micro-batch
    * (MonitorChanges(ctx, callback)); batchTimeout = trigger interval.
    */
  def monitor(events: DataFrame, checkpoint: String,
      batchTimeout: String = "1 second")(
      callback: (DataFrame, Long) => Unit): StreamingQuery =
    StateStores.withProvider(events.sparkSession) {
      events.writeStream
        .trigger(Trigger.ProcessingTime(batchTimeout))
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
          callback(batch.toDF(), id)
        }
        .start()
    }

  /** Live frequency trend: tumbling window + watermark for late events —
    * the streaming twin of Analytics.frequencyTrend (A5).
    */
  def liveFrequencyTrend(events: DataFrame, tsCol: String, dimCol: String,
      window: String = "1 hour", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window)
        .as("bucket"), col(dimCol).as("dim"))
      .agg(count(lit(1)).as("n"))

  /** K8s-style upsert merge (S3): apply a batch of ADDED/MODIFIED/DELETED
    * events to a state frame keyed by `idCol` — last event per key wins,
    * DELETED removes. Used inside foreachBatch.
    */
  def applyWatchBatch(state: DataFrame, batch: DataFrame, idCol: String,
      eventTypeCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol))
      .orderBy(col(tsCol).desc)
    val lastPerKey = batch
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    val survivors = state.join(lastPerKey.select(col(idCol).as("_k")),
      state(idCol) === col("_k"), "left_anti")
    survivors.unionByName(
      lastPerKey.filter(col(eventTypeCol) =!= "DELETED")
        .select(state.columns.map(col): _*))
  }

  /** ST4: incremental pull — rows after the stored checkpoint
    * (azure resourcechanges `where timestamp > datetime(..)`,
    * resource_graph.go:192-219).
    */
  def incrementalSince(events: DataFrame, tsCol: String,
      checkpointTs: java.sql.Timestamp): DataFrame =
    events.filter(col(tsCol) > lit(checkpointTs))

  /** Stream-stream enrichment join (beyond the reference's transport-only
    * streams): join a change-event stream with a resource-update stream on
    * the resource key, accepting only updates within `maxDelay` BEFORE the
    * event. Both sides carry watermarks and the join condition bounds
    * event-time distance, so state is evicted continuously — the two
    * requirements that make a stream-stream join runnable indefinitely at
    * scale (unbounded state otherwise).
    */
  def enrichWithRecent(events: DataFrame, updates: DataFrame, key: String,
      eventTs: String, updateTs: String,
      maxDelay: String = "10 minutes", watermark: String = "10 minutes"): DataFrame = {
    val e = events.withWatermark(eventTs, watermark)
    val u = updates.withWatermark(updateTs, watermark)
    e.join(u,
      e(key) === u(key) &&
        u(updateTs) <= e(eventTs) &&
        u(updateTs) >= e(eventTs) - expr(s"INTERVAL $maxDelay"))
      .drop(u(key))
  }
}
