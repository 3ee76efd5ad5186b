package graft.streaming

import graft.SparkSpec

/** [[StatefulCounts]] — per-(key, category) running counters on
  * `MapState`. Pins the window contract the q_st16 oracle replays plus
  * cross-batch carry and key/category independence.
  */
class StatefulCountsSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[(Long, Long, String)]])
      : Map[Long, Long] = {
    val dir = java.nio.file.Files.createTempDirectory("counts-spec")
    val schema = batches.flatten.toDF("event_id", "user_id", "category")
      .schema
    batches.foreach { b =>
      b.toDF("event_id", "user_id", "category")
        .coalesce(1).write.mode("append").parquet(dir.toString)
      Thread.sleep(5) // distinct mtimes: maxFilesPerTrigger order is by age
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
    StatefulQuota.withRocksDb(spark) {
      Replay.availableNow(StatefulCounts.runningCounts(
          stream, "event_id", "user_id", "category"))
        .collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("seen_before"))
        .toMap
    }
  }

  /** Reference: prior-count over (batch, event_id) per (key, category). */
  private def reference(batches: Seq[Seq[(Long, Long, String)]])
      : Map[Long, Long] =
    batches.zipWithIndex
      .flatMap { case (b, i) => b.map(r => (i, r._1, r._2, r._3)) }
      .groupBy(r => (r._3, r._4)).values.flatMap { rows =>
        rows.sortBy(r => (r._1, r._2)).zipWithIndex
          .map { case (r, n) => r._2 -> n.toLong }
      }.toMap

  test("counts are per (key, category), carry across batches, start at 0") {
    val batches = Seq(
      Seq((1L, 7L, "click"), (2L, 7L, "buy"), (3L, 8L, "click")),
      Seq((4L, 7L, "click"), (5L, 7L, "click"), (6L, 8L, "click")))
    val got = run(batches)
    assert(got == reference(batches))
    assert(got(1L) == 0L && got(2L) == 0L, "each category starts at 0")
    assert(got(4L) == 1L, "batch-2 row must see batch-1's click")
    assert(got(5L) == 2L, "within-batch event_id order: id 4 first")
    assert(got(6L) == 1L, "user 8's counter is independent of user 7's")
  }

  test("randomized parity with the window reference") {
    val rnd = new scala.util.Random(13)
    var id = 0L
    val cats = Seq("a", "b", "c")
    val batches = Seq.fill(3) {
      Seq.fill(60) {
        id += 1
        (id, (1 + rnd.nextInt(3)).toLong, cats(rnd.nextInt(cats.length)))
      }
    }
    val got = run(batches)
    assert(got == reference(batches))
    assert(got.values.max >= 5L, "must exercise deep counters")
  }
}
