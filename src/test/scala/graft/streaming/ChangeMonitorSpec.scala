package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class ChangeMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("monitor delivers micro-batches to the callback (ST1/ST2)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Double)]
    val events = input.toDF().toDF("event_id", "event_type", "value")
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val checkpoint = tempDir("graft-ck").toString
    val q = ChangeMonitor.monitor(events, checkpoint, "100 milliseconds") {
      (batch, id) => seen.synchronized { seen += ((id, batch.count())) }
    }
    try {
      input.addData((1L, "CREATE", 1.0), (2L, "UPDATE", 2.0))
      q.processAllAvailable()
      input.addData((3L, "DELETE", 3.0))
      q.processAllAvailable()
      val total = seen.synchronized(seen.map(_._2).sum)
      assert(total == 3, s"saw $seen")
    } finally q.stop()
  }

  test("live frequency trend aggregates with watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val trend = ChangeMonitor.liveFrequencyTrend(
      input.toDF().toDF("ts", "service"), "ts", "service", "1 hour", "10 minutes")
    val q = trend.writeStream.format("memory")
      .queryName("trend_test").outputMode("update").start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "s3"),
        (ts("2024-01-01 10:45:00"), "s3"),
        (ts("2024-01-01 11:05:00"), "ec2"))
      q.processAllAvailable()
      val rows = spark.table("trend_test")
        .select(col("bucket.start").cast("string"), col("dim"), col("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(rows == Set(
        ("2024-01-01 10:00:00", "s3", 2L),
        ("2024-01-01 11:00:00", "ec2", 1L)))
    } finally q.stop()
  }

  test("watch-batch upsert: ADDED/MODIFIED apply, DELETED removes (S3)") {
    val state = Seq(("r1", "v1"), ("r2", "v2")).toDF("id", "value")
    val batch = Seq(
      ("r2", "v2b", "MODIFIED", ts("2024-01-01 00:00:01")),
      ("r2", "v2c", "MODIFIED", ts("2024-01-01 00:00:02")), // later wins
      ("r3", "v3", "ADDED", ts("2024-01-01 00:00:01")),
      ("r1", "", "DELETED", ts("2024-01-01 00:00:01")))
      .toDF("id", "value", "event_type", "ts")
    val out = ChangeMonitor.applyWatchBatch(state, batch, "id", "event_type", "ts")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("r2" -> "v2c", "r3" -> "v3"))
  }

  test("incremental pull after checkpoint (ST4)") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-02 00:00:00")))
      .toDF("id", "ts")
    val out = ChangeMonitor.incrementalSince(events, "ts", ts("2024-01-01 12:00:00"))
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(2L))
  }

  test("stream-stream enrichment joins only recent updates (bounded state)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evIn = MemoryStream[(String, Timestamp, String)]
    val upIn = MemoryStream[(String, Timestamp, String)]
    val events = evIn.toDF().toDF("rid", "ets", "action")
    val updates = upIn.toDF().toDF("rid", "uts", "detail")
    val joined = ChangeMonitor.enrichWithRecent(
      events, updates, "rid", "ets", "uts", maxDelay = "10 minutes")
    val q = joined.writeStream.format("memory")
      .queryName("enrich_test").outputMode("append").start()
    try {
      upIn.addData(
        ("r1", ts("2024-01-01 10:00:00"), "recent"),   // 5 min before event
        ("r1", ts("2024-01-01 09:00:00"), "stale"),    // 65 min before: dropped
        ("r2", ts("2024-01-01 10:04:00"), "other-key"))
      evIn.addData(("r1", ts("2024-01-01 10:05:00"), "delete"))
      q.processAllAvailable()
      // advance both watermarks so the join emits
      upIn.addData(("zz", ts("2024-01-01 11:00:00"), "wm"))
      evIn.addData(("zz2", ts("2024-01-01 11:00:00"), "wm"))
      q.processAllAvailable()
      val rows = spark.table("enrich_test")
        .select("rid", "action", "detail")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(rows == Set(("r1", "delete", "recent")), rows.toString)
    } finally q.stop()
  }
}
