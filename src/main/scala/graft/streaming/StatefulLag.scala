package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** Input row of the lag stream: one event with its integer-milli value
  * (callers floor-scale doubles so the carried value is exact cross-engine).
  */
case class LagEvent(event_id: Long, user_id: Long, vmilli: Long)

/** One output row per input event: the key's previous ≤k values
  * (oldest-first, comma-joined — a string so the driver comparator can
  * sort rows; empty when the event is the key's first).
  */
case class LagOut(event_id: Long, user_id: Long, vmilli: Long,
    n_prev: Long, prev: String)

/** Bounded recent-values buffer per key on `ListState`: for every
  * arriving event, emit the key's previous ≤k values, then append the
  * event's own and trim to k. State is exactly min(seen, k) longs per
  * key — the online feature-store "lag features" primitive (prior
  * purchase amounts, previous latencies) with a hard state bound that
  * holds at any stream length.
  */
class LagProcessor(k: Int)
    extends StatefulProcessor[Long, LagEvent, LagOut] {

  @transient private var recent: org.apache.spark.sql.streaming.ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    recent = getHandle.getListState[Long]("recent",
      Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[LagEvent],
      timerValues: TimerValues): Iterator[LagOut] = {
    var cur: Vector[Long] =
      if (recent.exists()) recent.get().toVector else Vector.empty
    val out = rows.toArray.sortBy(_.event_id).map { e =>
      val o = LagOut(e.event_id, key, e.vmilli, cur.length.toLong,
        cur.mkString(","))
      cur = (cur :+ e.vmilli).takeRight(k)
      o
    }
    recent.put(cur.toArray)
    out.iterator
  }
}

/** Streaming per-key lag features on the Spark 4 `transformWithState`
  * API — the `ListState` sibling of [[StatefulQuota]] (which showcases
  * `ValueState`). Rows fold in `event_id` order within each micro-batch,
  * so given a deterministic batch sequence the emitted lag windows are
  * exactly a `(batch, event_id)`-ordered ROWS BETWEEN k PRECEDING AND
  * 1 PRECEDING window — which is how the q_st15 oracle replays it
  * relationally, no recursion needed.
  */
object StatefulLag {

  /** Lag-feature rows for a streaming `events` frame; start the query
    * under [[StatefulQuota.withRocksDb]] (transformWithState is
    * RocksDB-only).
    */
  def lastK(events: DataFrame, idCol: String, keyCol: String,
      vmilliCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(idCol).cast("long").as("event_id"),
        col(keyCol).cast("long").as("user_id"),
        col(vmilliCol).cast("long").as("vmilli"))
      .as[LagEvent]
      .groupByKey(_.user_id)
      .transformWithState(new LagProcessor(k), TimeMode.None(),
        OutputMode.Append())
      .toDF()
  }
}
