package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.catalog.SnapshotTableStore

/** Exactly-once streaming sink into the transactional snapshot store.
  *
  * Structured Streaming's `foreachBatch` contract is at-least-once: after
  * a crash between the sink's write and the checkpoint commit, the same
  * (deterministic) batch is re-delivered with the same `batchId` on
  * restart. The sink turns that into exactly-once by committing each
  * batch through [[SnapshotTableStore.appendIdempotent]] keyed on the
  * batch id — a re-delivered batch finds its tag in the current manifest
  * and becomes a no-op, so the table never double-counts no matter how
  * many times the query restarts.
  *
  * This is the standard idempotent-sink recipe (the same batchId-keyed
  * dedup Delta's `txnAppId`/`txnVersion` options implement), built on the
  * store's own atomic manifest claim — no extra coordination state.
  */
object SnapshotSink {

  /** Start an append-mode stream writing `events` into `store`/`table`
    * exactly once per micro-batch.
    */
  def appendStream(events: DataFrame, store: SnapshotTableStore,
      table: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    StateStores.withProvider(events.sparkSession) {
      events.writeStream
        .trigger(trigger)
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
          store.appendIdempotent(batch.toDF(), table, s"b$id"): Unit
        }
        .start()
    }
}
