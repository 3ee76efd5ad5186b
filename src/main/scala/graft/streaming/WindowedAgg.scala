package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The canonical Structured Streaming aggregation: watermarked tumbling
  * event-time windows. In append mode a window emits exactly once, when
  * the watermark passes its end — the cross-engine-checkable contract
  * (a batch replay can compute precisely which windows a bounded run
  * finalizes: those ending at or before max(ts) − delay).
  *
  * Reference model: corkscrew's change analytics bucket by time client-side
  * after a range query (internal/analytics/changes.go); here the bucketing
  * runs incrementally with bounded state — state per (open window, key)
  * only, windows past the watermark are evicted by Spark's own
  * StateStore aging, so an indefinitely running monitor holds one
  * watermark-horizon of groups regardless of stream length.
  */
object WindowedAgg {

  /** Tumbling-window count + exact decimal sum per (`window`, `keyCol`).
    * Works on a streaming frame (watermarked, append-mode finalized
    * windows) and on a batch frame alike (Spark ignores the watermark in
    * batch plans — every window emits, which is the intended batch twin).
    * The sum runs in `decimal(18,4)` so emitted values are
    * order-independent and replayable by an external engine.
    */
  def tumbling(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, windowDur: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,4)")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(keyCol), col("n_events"), col("sum_value"))

  /** Hopping (sliding) windows — each event contributes to
    * windowDur/slideDur overlapping windows, the trailing-period-rate
    * shape ("events in the last hour, updated every 30 minutes"). Same
    * state model and append-mode finalization contract as [[tumbling]];
    * state grows by the overlap factor (windowDur/slideDur open windows
    * per key), still bounded by the watermark horizon.
    */
  def hopping(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, windowDur: String, slideDur: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur, slideDur), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,4)")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(keyCol), col("n_events"), col("sum_value"))

  /** Gap-based session windows (`session_window`) — the third canonical
    * streaming window shape: a session spans events whose inter-arrival
    * gap per key never reaches `gapDur`; its end is last-event time +
    * gap. In append mode a session emits when the watermark passes its
    * end, same contract as [[tumbling]]. State per (key, open session),
    * merged incrementally — bounded by the watermark horizon like the
    * rest of the family.
    */
  def session(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, gapDur: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gapDur), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,4)")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col(keyCol), col("n_events"), col("sum_value"))
}
