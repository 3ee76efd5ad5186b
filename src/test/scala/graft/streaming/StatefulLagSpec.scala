package graft.streaming

import graft.SparkSpec

/** [[StatefulLag]] — bounded per-key lag features on `ListState`. Pins
  * the window contract the q_st15 oracle replays: oldest-first previous
  * ≤k values over (batch, event_id) order, buffer trimmed to k, state
  * carried across micro-batches, keys independent.
  */
class StatefulLagSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[(Long, Long, Long)]], k: Int)
      : Map[Long, (Long, String)] = {
    val dir = java.nio.file.Files.createTempDirectory("lag-spec")
    val schema = batches.flatten.toDF("event_id", "user_id", "vmilli").schema
    batches.foreach { b =>
      b.toDF("event_id", "user_id", "vmilli")
        .coalesce(1).write.mode("append").parquet(dir.toString)
      Thread.sleep(5) // distinct mtimes: maxFilesPerTrigger order is by age
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
    StatefulQuota.withRocksDb(spark) {
      Replay.availableNow(
          StatefulLag.lastK(stream, "event_id", "user_id", "vmilli", k))
        .collect()
        .map(r => r.getAs[Long]("event_id") ->
          ((r.getAs[Long]("n_prev"), r.getAs[String]("prev"))))
        .toMap
    }
  }

  /** Reference: k-bounded lag window over (batch, event_id) per key. */
  private def reference(batches: Seq[Seq[(Long, Long, Long)]], k: Int)
      : Map[Long, (Long, String)] =
    batches.zipWithIndex
      .flatMap { case (b, i) => b.map(r => (i, r._1, r._2, r._3)) }
      .groupBy(_._3 /* user */).values.flatMap { rows =>
        rows.sortBy(r => (r._1, r._2)).foldLeft(
          (Vector.empty[Long], List.empty[(Long, (Long, String))])) {
          case ((buf, acc), (_, id, _, v)) =>
            ((buf :+ v).takeRight(k),
              (id -> ((buf.length.toLong, buf.mkString(",")))) :: acc)
        }._2
      }.toMap

  test("first event has empty prev; buffer trims to k; oldest-first order") {
    val got = run(Seq(Seq(
      (1L, 7L, 10L), (2L, 7L, 20L), (3L, 7L, 30L),
      (4L, 7L, 40L), (5L, 7L, 50L))), k = 3)
    assert(got(1L) == ((0L, "")))
    assert(got(2L) == ((1L, "10")))
    assert(got(4L) == ((3L, "10,20,30")))
    assert(got(5L) == ((3L, "20,30,40")), "buffer must trim the oldest")
  }

  test("state carries across micro-batches; keys are independent") {
    val batches = Seq(
      Seq((1L, 7L, 10L), (10L, 8L, 99L)),
      Seq((2L, 7L, 20L), (11L, 8L, 88L)))
    val got = run(batches, k = 3)
    assert(got == reference(batches, 3))
    assert(got(2L) == ((1L, "10")), "batch-2 row must see batch-1 value")
    assert(got(11L) == ((1L, "99")), "key 8's buffer never mixes with key 7")
  }

  test("randomized parity with the window reference") {
    val rnd = new scala.util.Random(11)
    var id = 0L
    val batches = Seq.fill(3) {
      Seq.fill(50) {
        id += 1
        (id, (1 + rnd.nextInt(4)).toLong, rnd.nextInt(1000).toLong)
      }
    }
    val got = run(batches, k = 3)
    assert(got == reference(batches, 3))
    assert(got.values.exists(_._1 == 3L), "must exercise full buffers")
  }
}
