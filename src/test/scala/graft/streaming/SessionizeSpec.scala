package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("batch sessionize splits on gap, aggregates per session") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:10:00"), 2L),
      (1L, ts("2024-01-01 12:00:00"), 3L), // > 30 min gap → new session
      (2L, ts("2024-01-01 09:00:00"), 4L))
      .toDF("user_id", "ts", "event_id")
    val out = Sessionize.batch(events, "user_id", "ts", "event_id", 30)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getTimestamp(3), r.getTimestamp(4))).toMap
    assert(out((1L, 1L)) == (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")))
    assert(out((1L, 2L)) == (1L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00")))
    assert(out((2L, 1L)) == (1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:00:00")))
  }

  test("streaming sessionize closes sessions across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = Sessionize.streaming(input.toDS(), gapMinutes = 30)
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_test").outputMode("append").start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      assert(spark.table("sessions_test").count() == 0) // still open
      input.addData((1L, ts("2024-01-01 12:00:00"))) // closes the first
      q.processAllAvailable()
      val closed = spark.table("sessions_test")
        .as[Sessionize.ClosedSession].collect()
      assert(closed.length == 1)
      assert(closed(0) == Sessionize.ClosedSession(1L,
        ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"), 2L))
    } finally q.stop()
  }
}
