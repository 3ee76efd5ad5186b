package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[StatefulQuota]] — per-key token-budget admission on the Spark 4
  * `transformWithState` API. Pins the three contracts the q_st14 oracle
  * fold assumes: greedy budget arithmetic (rejected rows consume
  * nothing), doc_id ordering within a micro-batch, and ValueState
  * carry-over across micro-batches.
  */
class StatefulQuotaSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory reference fold: greedy admission in (batch, doc_id)
    * order per key.
    */
  private def reference(batches: Seq[Seq[(Long, String, Long)]], budget: Long)
      : Map[Long, (Boolean, Long)] = {
    val totals = scala.collection.mutable.Map[String, Long]()
    val out = scala.collection.mutable.Map[Long, (Boolean, Long)]()
    batches.foreach { b =>
      b.groupBy(_._2).foreach { case (k, rows) =>
        var t = totals.getOrElse(k, 0L)
        rows.sortBy(_._1).foreach { case (id, _, n) =>
          val ok = t + n <= budget
          if (ok) t += n
          out(id) = (ok, t)
        }
        totals(k) = t
      }
    }
    out.toMap
  }

  private def runQuota(dir: java.nio.file.Path,
      batches: Seq[Seq[(Long, String, Long)]], budget: Long)
      : Map[Long, (Boolean, Long)] = {
    val schema = batches.flatten.toDF("doc_id", "source", "n_tokens").schema
    batches.foreach { b =>
      b.toDF("doc_id", "source", "n_tokens")
        .coalesce(1).write.mode("append").parquet(dir.toString)
      Thread.sleep(5) // distinct mtimes: maxFilesPerTrigger order is by file age
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
    val decided = StatefulQuota.admit(stream, "doc_id", "source",
      "n_tokens", budget)
    StatefulQuota.withRocksDb(spark) {
      Replay.availableNow(decided)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Boolean]("admitted"), r.getAs[Long]("admitted_total"))))
        .toMap
    }
  }

  test("greedy admission: rejected rows consume no budget; a later " +
    "smaller row still fits") {
    val dir = java.nio.file.Files.createTempDirectory("quota-greedy")
    // key a, budget 10: 6 admitted (6), 7 rejected (still 6), 3 admitted (9)
    val got = runQuota(dir,
      Seq(Seq((1L, "a", 6L), (2L, "a", 7L), (3L, "a", 3L))), budget = 10L)
    assert(got(1L) == ((true, 6L)))
    assert(got(2L) == ((false, 6L)))
    assert(got(3L) == ((true, 9L)))
  }

  test("state carries across micro-batches and keys are independent") {
    val dir = java.nio.file.Files.createTempDirectory("quota-batches")
    val batches = Seq(
      Seq((1L, "a", 5L), (10L, "b", 9L)),
      Seq((2L, "a", 4L), (11L, "b", 9L), (3L, "a", 2L)))
    val got = runQuota(dir, batches, budget = 10L)
    assert(got == reference(batches, 10L))
    // the cross-batch facts the map equality is made of, spelled out:
    assert(got(2L) == ((true, 9L)), "batch-2 row must see batch-1 total")
    assert(got(11L) == ((false, 9L)), "key b exhausted in batch 1")
    assert(got(3L) == ((false, 9L)), "within-batch doc_id order: id 2 first")
  }

  test("kill-and-resume endurance: a RocksDB-backed quota stream stopped " +
      "mid-stream and restarted from its checkpoint yields exactly-once " +
      "decisions equal to the one-shot run") {
    val in = java.nio.file.Files.createTempDirectory("quota-kill-in")
    val ck = java.nio.file.Files.createTempDirectory("quota-kill-ck")
    val out = java.nio.file.Files.createTempDirectory("quota-kill-out")
    // two batches before the kill, two after; budget 20 per key, and the
    // post-kill decisions DEPEND on pre-kill totals (a: 8+9=17, b: 12+5=17)
    val b12 = Seq(
      Seq((1L, "a", 8L), (2L, "b", 12L)),
      Seq((3L, "a", 9L), (4L, "b", 5L)))
    val b34 = Seq(
      Seq((5L, "a", 4L), (6L, "b", 2L)),
      Seq((7L, "a", 3L), (8L, "b", 2L)))
    val budget = 20L
    val schema = b12.flatten.toDF("doc_id", "source", "n_tokens").schema
    def writeBatches(bs: Seq[Seq[(Long, String, Long)]]): Unit =
      bs.foreach { b =>
        b.toDF("doc_id", "source", "n_tokens")
          .coalesce(1).write.mode("append").parquet(in.toString)
        Thread.sleep(5) // distinct mtimes: file-source order is by age
      }
    def start(trigger: org.apache.spark.sql.streaming.Trigger) = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in.toString)
      StatefulQuota.admit(stream, "doc_id", "source", "n_tokens", budget)
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ck.toString)
        .outputMode("append").trigger(trigger).start()
    }
    StatefulQuota.withRocksDb(spark) {
      writeBatches(b12)
      val q1 = start(org.apache.spark.sql.streaming.Trigger.ProcessingTime(25))
      val deadline = System.currentTimeMillis() + 120000
      def seen(): Long = q1.recentProgress.map(_.numInputRows).sum
      while (seen() < 4 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(seen() == 4, "first run never committed its two micro-batches")
      q1.stop(); q1.awaitTermination() // the kill — batches 3/4 never seen
      writeBatches(b34)
      // resume from the SAME checkpoint: the offset log must skip the
      // already-committed files and the RocksDB ValueState must carry
      val q2 = start(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q2.awaitTermination()
    }
    // the file sink's _spark_metadata commit log IS the exactly-once
    // contract: this read lists only committed files
    val got = spark.read.parquet(out.toString).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("admitted"), r.getAs[Long]("admitted_total"))))
    assert(got.length == got.map(_._1).distinct.length,
      "duplicate decisions across the restart: not exactly-once")
    // resumed totals equal the reference fold over ALL batches — state
    // loss at the kill would shift every batch-3/4 decision…
    assert(got.toMap == reference(b12 ++ b34, budget))
    // …and the whole run equals a one-shot (never-killed) execution
    val oneIn = java.nio.file.Files.createTempDirectory("quota-oneshot")
    assert(got.toMap == runQuota(oneIn, b12 ++ b34, budget))
    // spot-pin the cross-kill state dependencies
    val m = got.toMap
    assert(m(5L) == ((false, 17L)), "batch-3 must see a's pre-kill total")
    assert(m(7L) == ((true, 20L)))
    assert(m(8L) == ((false, 19L)), "batch-4 must see b's pre-kill total")
  }

  test("randomized parity with the reference fold") {
    val rnd = new scala.util.Random(7)
    val keys = Seq("a", "b", "c")
    var id = 0L
    val batches = Seq.fill(3) {
      Seq.fill(40) {
        id += 1
        (id, keys(rnd.nextInt(keys.length)), (1 + rnd.nextInt(9)).toLong)
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("quota-rand")
    val got = runQuota(dir, batches, budget = 25L)
    assert(got == reference(batches, 25L))
    assert(got.values.exists(_._1) && got.values.exists(!_._1),
      "fixture must exercise both admissions and rejections")
  }
}
