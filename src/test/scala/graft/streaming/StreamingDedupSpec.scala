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

  test("streaming simhash near-dup flags close docs across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    val input = MemoryStream[(Long, String)]
    val hits = StreamingDedup.nearSimhash(input.toDS(), maxHamming = 3)
    val q = hits.writeStream.format("memory")
      .queryName("snear_test").outputMode("append").start()
    try {
      input.addData((1L, base),
        (5L, "a completely different document on spark physical planning"))
      q.processAllAvailable()
      // near-identical doc arrives in a LATER batch → must match doc 1
      input.addData((2L, base.toUpperCase))
      q.processAllAvailable()
      // and an unrelated doc must not match anything
      input.addData((6L, "unrelated text about graph traversal analytics"))
      q.processAllAvailable()
      val pairs = spark.table("snear_test")
        .select("docId", "dupOfId").as[(Long, Long)].collect().toSet
      assert(pairs.contains((2L, 1L)), s"cross-batch near-dup missed: $pairs")
      assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L), pairs.toString)
      // identical docs share all 4 quarters → up to 4 emissions, all (2,1)
      val dupEmits = spark.table("snear_test").as[StreamingDedup.NearDupHit]
        .collect().filter(_.docId == 2L)
      assert(dupEmits.nonEmpty && dupEmits.forall(h => h.dupOfId == 1L && h.hamming == 0))
    } finally q.stop()
  }

  test("simhash near-dup within horizon evicts bucket keys by event time") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = "a long enough stable document about state store eviction " +
      "horizons in structured streaming with many ordinary english tokens"
    val input = MemoryStream[(Long, String, Timestamp)]
    val hits = StreamingDedup.nearSimhashWithinHorizon(input.toDS(),
      horizon = "10 minutes", maxHamming = 3)
    val q = hits.writeStream.format("memory")
      .queryName("snear_horizon_test").outputMode("append").start()
    try {
      input.addData((1L, base, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // within the horizon a duplicate is still flagged
      input.addData((2L, base, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      // advance event time far past the horizon; the watermark (12:00 -
      // 10 min = 11:50) passes the bucket's timeout (10:05 + 10 min =
      // 10:15), so the NEXT batch sweeps the key out of the state store
      input.addData((60L, "unrelated content to push the watermark along",
        ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      input.addData((61L, "more unrelated advancing filler text here",
        ts("2024-01-01 12:01:00")))
      q.processAllAvailable()
      // the same text again: its bucket state is gone, so no hit
      input.addData((3L, base, ts("2024-01-01 12:02:00")))
      q.processAllAvailable()
      val pairs = spark.table("snear_horizon_test")
        .select("docId", "dupOfId").as[(Long, Long)].collect().toSet
      assert(pairs.contains((2L, 1L)), s"within-horizon dup missed: $pairs")
      assert(!pairs.exists(_._1 == 3L),
        s"doc 3 matched evicted state — horizon eviction not working: $pairs")
    } finally q.stop()
  }

  test("horizon eviction keys off the bucket's newest event, not the last batch's") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = "an ordinary document with a comfortable number of english " +
      "tokens that keeps its simhash signature perfectly stable"
    val input = MemoryStream[(Long, String, Timestamp)]
    val hits = StreamingDedup.nearSimhashWithinHorizon(input.toDS(),
      horizon = "10 minutes", maxHamming = 3)
    val q = hits.writeStream.format("memory")
      .queryName("snear_newest_test").outputMode("append").start()
    try {
      input.addData((1L, base, ts("2024-01-01 10:20:00")))
      q.processAllAvailable()
      // an OLDER-but-not-late duplicate arrives in a later batch; the
      // eviction deadline must stay at newest-ever (10:20) + horizon,
      // not shrink to this batch's max (10:12) + horizon
      input.addData((2L, base, ts("2024-01-01 10:12:00")))
      q.processAllAvailable()
      // two filler batches push the watermark to 10:23+ — past the
      // batch-max deadline (10:22) but inside the correct one (10:30);
      // the second batch is where a wrongly-timed-out bucket would sweep
      input.addData((60L, "unrelated filler advancing the watermark now",
        ts("2024-01-01 10:33:00")))
      q.processAllAvailable()
      input.addData((61L, "more unrelated filler text for the sweep batch",
        ts("2024-01-01 10:33:30")))
      q.processAllAvailable()
      // still within horizon of the bucket's newest event → must hit
      input.addData((3L, base, ts("2024-01-01 10:28:00")))
      q.processAllAvailable()
      val pairs = spark.table("snear_newest_test")
        .select("docId", "dupOfId").as[(Long, Long)].collect().toSet
      assert(pairs.contains((2L, 1L)), s"older in-horizon dup missed: $pairs")
      assert(pairs.exists(_._1 == 3L),
        s"in-horizon signature evicted early — deadline keyed off batch max: $pairs")
    } finally q.stop()
  }

  test("streaming simhash near-dup matches within one micro-batch too") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = "spark structured streaming keyed state dedup operator test " +
      "with enough tokens to make the signature stable across variants"
    val input = MemoryStream[(Long, String)]
    val hits = StreamingDedup.nearSimhash(input.toDS(), maxHamming = 3)
    val q = hits.writeStream.format("memory")
      .queryName("snear_batch_test").outputMode("append").start()
    try {
      input.addData((10L, base), (11L, base)) // same batch
      q.processAllAvailable()
      val pairs = spark.table("snear_batch_test")
        .select("docId", "dupOfId").as[(Long, Long)].collect().toSet
      assert(pairs.contains((11L, 10L)), s"same-batch pair missed: $pairs")
      assert(!pairs.contains((10L, 11L)), "lower id must be the keeper")
    } finally q.stop()
  }

  test("q_st2 availableNow replay is pair-set identical to the batch operator (q_d5)") {
    val sf = "/root/testdata/sf0.001"
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "hamming")
        .as[(Long, Long, Int)].collect().toSet
    val streamed = pairSet(graft.PipelineQueries.st2StreamNearDup(spark, sf))
    val batch = pairSet(graft.PipelineQueries.d5SimhashNearDup(spark, sf))
    assert(streamed.nonEmpty, "fixture produced no near-dup pairs")
    assert(streamed == batch,
      s"stream-minus-batch: ${(streamed -- batch).take(5)}; " +
        s"batch-minus-stream: ${(batch -- streamed).take(5)}")
  }
}
