package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Watermarked tumbling-window aggregation: append-mode finalization
  * contract and batch-twin parity.
  */
class WindowedAggSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val rows = Seq(
    (ts("2024-01-01 10:05:00"), "click", 1.0),
    (ts("2024-01-01 10:45:00"), "click", 2.0),
    (ts("2024-01-01 10:50:00"), "view", 3.0),
    (ts("2024-01-01 11:10:00"), "click", 4.0),
    (ts("2024-01-01 12:20:00"), "view", 5.0)) // max ts; watermark = 11:50

  test("append mode emits exactly the watermark-finalized windows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = WindowedAgg.tumbling(input.toDS().toDF("ts", "et", "value"),
      "ts", "et", "value", "1 hour", "30 minutes")
    val q = agg.writeStream.format("memory").queryName("wagg_test")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      // one no-data batch advances the watermark and flushes final state
      input.addData()
      q.processAllAvailable()
      val out = spark.table("wagg_test")
        .select("window_start", "et", "n_events", "sum_value")
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2), r.getDecimal(3).doubleValue))
        .toSet
      // watermark 11:50 finalizes only windows ENDING at or before it:
      // the 10:00 window (end 11:00). The 11:00 window ends 12:00 > 11:50
      // and stays open — exactly the predicate the q_st4 oracle replays.
      assert(out == Set(
        ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
        ("2024-01-01 10:00:00.0", "view", 1L, 3.0)), out.toString)
    } finally q.stop()
  }

  test("the batch twin emits every window, watermark ignored") {
    val out = WindowedAgg.tumbling(rows.toDF("ts", "et", "value"),
        "ts", "et", "value", "1 hour", "30 minutes")
      .select("window_start", "et", "n_events")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      .toSet
    assert(out == Set(
      ("2024-01-01 10:00:00.0", "click", 2L),
      ("2024-01-01 10:00:00.0", "view", 1L),
      ("2024-01-01 11:00:00.0", "click", 1L),
      ("2024-01-01 12:00:00.0", "view", 1L)), out.toString)
  }

  test("hopping: every event lands in exactly window/slide windows") {
    // 1-hour windows sliding every 30 min => each event in 2 windows:
    // starts floor30(ts) and floor30(ts) - 30min.
    val out = WindowedAgg.hopping(rows.toDF("ts", "et", "value"),
        "ts", "et", "value", "1 hour", "30 minutes", "30 minutes")
      .select("window_start", "et", "n_events")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      .toSet
    // 10:05 click -> starts {09:30, 10:00}; 10:45 -> {10:00, 10:30};
    // 11:10 -> {10:30, 11:00}: the 10:30 window catches both later clicks.
    assert(out.contains(("2024-01-01 09:30:00.0", "click", 1L)), out)
    assert(out.contains(("2024-01-01 10:00:00.0", "click", 2L)), out)
    assert(out.contains(("2024-01-01 10:30:00.0", "click", 2L)), out)
    // per-event window membership count is exactly 2
    val totalMemberships = WindowedAgg.hopping(rows.toDF("ts", "et", "value"),
        "ts", "et", "value", "1 hour", "30 minutes", "30 minutes")
      .agg(org.apache.spark.sql.functions.sum("n_events")).collect()(0).getLong(0)
    assert(totalMemberships == rows.size * 2L, s"$totalMemberships")
  }

  test("session: gap merges and breaks; end = last event + gap") {
    // key a: events at 10:00, 10:20, 10:39 chain (gaps < 30m) then 11:30
    // breaks (gap 51m); exact-boundary probe: key b at 10:00 and 10:30
    // (gap == 30m exactly) pins Spark's strict/non-strict merge choice.
    val rows = Seq(
      (ts("2024-01-01 10:00:00"), "a", 1.0),
      (ts("2024-01-01 10:20:00"), "a", 2.0),
      (ts("2024-01-01 10:39:00"), "a", 3.0),
      (ts("2024-01-01 11:30:00"), "a", 4.0),
      (ts("2024-01-01 10:00:00"), "b", 5.0),
      (ts("2024-01-01 10:30:00"), "b", 6.0))
    val out = WindowedAgg.session(rows.toDF("ts", "et", "value"),
        "ts", "et", "value", "30 minutes", "30 minutes")
      .select("session_start", "session_end", "et", "n_events")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString,
        r.getString(2), r.getLong(3)))
      .toSet
    assert(out.contains(
      ("2024-01-01 10:00:00.0", "2024-01-01 11:09:00.0", "a", 3L)), out)
    assert(out.contains(
      ("2024-01-01 11:30:00.0", "2024-01-01 12:00:00.0", "a", 1L)), out)
    // Boundary semantics: an event at EXACTLY prev_end merges (touching
    // sessions coalesce) — so the relational replay breaks strictly on
    // gap > gapDur, which the q_st8 oracle mirrors. This assert pins it.
    assert(out.filter(_._3 == "b") ==
      Set(("2024-01-01 10:00:00.0", "2024-01-01 11:00:00.0", "b", 2L)), out)
  }
}
