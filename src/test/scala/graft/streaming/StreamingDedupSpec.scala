package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming exact dedup drops repeats across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val deduped = StreamingDedup.exact(
      input.toDS().toDF("doc_id", "text"), "text")
    val q = deduped.writeStream.format("memory")
      .queryName("sdedup_test").outputMode("append").start()
    try {
      input.addData((1L, "Hello, World!"), (2L, "hello world")) // same normalized
      q.processAllAvailable()
      input.addData((3L, "HELLO WORLD"), (4L, "something else")) // 3 is a dup
      q.processAllAvailable()
      val kept = spark.table("sdedup_test").select("doc_id")
        .as[Long].collect().toSet
      assert(kept.intersect(Set(1L, 2L)).size == 1) // one of the first batch
      assert(!kept.contains(3L))
      assert(kept.contains(4L))
    } finally q.stop()
  }

  test("watermark-bounded dedup evicts old fingerprints") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val deduped = StreamingDedup.exactWithinWatermark(
      input.toDS().toDF("doc_id", "text", "ts"), "text", "ts", "10 minutes")
    val q = deduped.writeStream.format("memory")
      .queryName("sdedup_wm_test").outputMode("append").start()
    try {
      input.addData((1L, "doc a", ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // inside the horizon → suppressed
      input.addData((2L, "doc a", ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      // advance event time far past the watermark, state for "doc a" evicts
      input.addData((3L, "advance", ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      input.addData((4L, "doc a", ts("2024-01-01 12:00:30")))
      q.processAllAvailable()
      val kept = spark.table("sdedup_wm_test").select("doc_id")
        .as[Long].collect().toSet
      assert(kept.contains(1L) && !kept.contains(2L), kept)
      assert(kept.contains(4L), s"re-seen after eviction should pass: $kept")
    } finally q.stop()
  }
}
