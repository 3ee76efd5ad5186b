package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Sessionization — gap-based user sessions over the event stream.
  * Batch form: lag/running-sum windows (one shuffle on user). Streaming
  * form: `flatMapGroupsWithState` with an explicit open-session state —
  * the KeyValueGroupedDataset custom-state path for semantics tumbling
  * windows can't express.
  */
object Sessionize {

  /** Batch: assign session ids where the gap to the previous event of the
    * same user exceeds `gapMinutes`, then aggregate per session.
    * Deterministic total order via (ts, idCol).
    */
  def batch(events: DataFrame, userCol: String, tsCol: String, idCol: String,
      gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val prev = lag(col(tsCol), 1).over(w)
    val newSession = when(
      prev.isNull ||
        col(tsCol) > prev + expr(s"INTERVAL $gapMinutes MINUTE"), 1)
      .otherwise(0)
    events
      .withColumn("_ns", newSession)
      .withColumn("session_id",
        sum(col("_ns")).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("bigint"))
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
  }

  final case class OpenSession(start: Long, last: Long, n: Long)
  final case class ClosedSession(key: Long, sessionStart: Timestamp,
      sessionEnd: Timestamp, nEvents: Long)

  /** Streaming: per-key open-session state; a new event arriving more than
    * `gapMinutes` after the last one closes and emits the previous
    * session. (Sessions that never see a successor stay open — a
    * production deployment adds an event-time timeout to flush them.)
    */
  def streaming(events: Dataset[(Long, Timestamp)],
      gapMinutes: Int): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events.groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Timestamp)],
            state: GroupState[OpenSession]) =>
          val sorted = rows.map(_._2.getTime).toSeq.sorted
          var open = state.getOption
          val closed = Seq.newBuilder[ClosedSession]
          sorted.foreach { ts =>
            open match {
              case Some(s) if ts - s.last > gapMs =>
                closed += ClosedSession(key, new Timestamp(s.start),
                  new Timestamp(s.last), s.n)
                open = Some(OpenSession(ts, ts, 1))
              case Some(s) =>
                open = Some(s.copy(last = math.max(s.last, ts), n = s.n + 1))
              case None =>
                open = Some(OpenSession(ts, ts, 1))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }
}
