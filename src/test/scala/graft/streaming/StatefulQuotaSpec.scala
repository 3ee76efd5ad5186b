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
