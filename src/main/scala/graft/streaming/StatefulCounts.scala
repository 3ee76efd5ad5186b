package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** Input row of the counting stream: one event with its category. */
case class CatEvent(event_id: Long, user_id: Long, category: String)

/** One output row per input event: how many prior events of the same
  * (key, category) the stream has seen — the online "visit count /
  * session depth" feature.
  */
case class CatCount(event_id: Long, user_id: Long, category: String,
    seen_before: Long)

/** Per-(key, category) running counters on `MapState`: for each arriving
  * event, emit the count of the key's PRIOR events in the same category,
  * then increment. State per key is one long per category actually seen —
  * bounded by category cardinality, never by stream length.
  */
class CatCountProcessor
    extends StatefulProcessor[Long, CatEvent, CatCount] {

  @transient private var counts: org.apache.spark.sql.streaming.MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long]("category_counts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[CatEvent],
      timerValues: TimerValues): Iterator[CatCount] = {
    val out = rows.toArray.sortBy(_.event_id).map { e =>
      val prior =
        if (counts.containsKey(e.category)) counts.getValue(e.category)
        else 0L
      counts.updateValue(e.category, prior + 1L)
      CatCount(e.event_id, key, e.category, prior)
    }
    out.iterator
  }
}

/** Streaming per-(key, category) event counters on the Spark 4
  * `transformWithState` API — the `MapState` member of the typed-state
  * trio ([[StatefulQuota]] = ValueState, [[StatefulLag]] = ListState).
  * The running-count contract is a window, so the q_st16 oracle replays
  * it relationally: `COUNT(*) OVER (PARTITION BY key, category ORDER BY
  * (batch, event_id) ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)`.
  */
object StatefulCounts {

  /** Per-event prior-count rows for a streaming `events` frame; start
    * the query under [[StatefulQuota.withRocksDb]].
    */
  def runningCounts(events: DataFrame, idCol: String, keyCol: String,
      catCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(idCol).cast("long").as("event_id"),
        col(keyCol).cast("long").as("user_id"),
        col(catCol).cast("string").as("category"))
      .as[CatEvent]
      .groupByKey(_.user_id)
      .transformWithState(new CatCountProcessor, TimeMode.None(),
        OutputMode.Append())
      .toDF()
  }
}
