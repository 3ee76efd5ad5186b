package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("points land in containing intervals, across bin boundaries") {
    val intervals = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:30:00"), "w1"),
      (1L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:10:00"), "w2"),
      (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"), "w3"))
      .toDF("key", "start_ts", "end_ts", "name")
    val points = Seq(
      (1L, ts("2024-01-01 10:59:59"), "p1"), // inside w1 (crosses hour bins)
      (1L, ts("2024-01-01 11:30:00"), "p2"), // inclusive end of w1
      (1L, ts("2024-01-01 11:59:59"), "p3"), // in no interval
      (1L, ts("2024-01-01 12:00:00"), "p4"), // inclusive start of w2
      (2L, ts("2024-01-01 10:04:00"), "p5"), // w3
      (2L, ts("2024-01-01 12:05:00"), "p6")) // key 2 has no w2
      .toDF("key", "ts", "p")
    val out = RangeJoin.rangeJoin(points, intervals, "key", "ts",
        "start_ts", "end_ts", binSeconds = 600)
      .select($"p", $"ival.name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("p1" -> "w1", "p2" -> "w1", "p4" -> "w2", "p5" -> "w3"))
  }

  test("auto bin width: p99-derived, same matches, bounded fan-out") {
    // interval lengths cluster near 100 s with one 1000 s outlier; the
    // sampled p99 must land near the cluster scale, NOT at a fixed
    // constant that would explode week-long intervals into thousands of
    // bins. Fan-out bound: ~99% of intervals span ≤ 2 bins.
    val intervals = (0 until 200).map { i =>
      val start = 1704100000L + i * 5000L
      val len = if (i == 199) 1000L else 90L + (i % 21)
      (1L, new Timestamp(start * 1000), new Timestamp((start + len) * 1000),
        s"w$i")
    }.toDF("key", "start_ts", "end_ts", "name")
    val width = RangeJoin.sampledBinSeconds(intervals, "start_ts", "end_ts")
    assert(width >= 90 && width <= 1000, s"p99 width $width out of range")
    val points = (0 until 200).map { i =>
      (1L, new Timestamp((1704100000L + i * 5000L + 50L) * 1000), s"p$i")
    }.toDF("key", "ts", "p")
    val auto = RangeJoin.rangeJoin(points, intervals, "key", "ts",
        "start_ts", "end_ts")
      .select($"p", $"ival.name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val fixed = RangeJoin.rangeJoin(points, intervals, "key", "ts",
        "start_ts", "end_ts", binSeconds = 600)
      .select($"p", $"ival.name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(auto == fixed && auto.size == 200)
    // no row explosion: replicated-bin row count stays within 2x + outlier
    val bins = intervals.select(
      (floor(unix_timestamp($"end_ts") / width) -
        floor(unix_timestamp($"start_ts") / width) + 1).as("nb"))
      .agg(sum($"nb")).as[Long].collect()(0)
    assert(bins <= intervals.count() * 2 + 1000 / width + 1,
      s"bin fan-out $bins rows for ${intervals.count()} intervals")
  }

  test("overlapping intervals yield one row per match") {
    val intervals = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"), "outer"),
      (1L, ts("2024-01-01 10:30:00"), ts("2024-01-01 11:00:00"), "inner"))
      .toDF("key", "start_ts", "end_ts", "name")
    val points = Seq((1L, ts("2024-01-01 10:45:00"), "p")).toDF("key", "ts", "p")
    val names = RangeJoin.rangeJoin(points, intervals, "key", "ts",
        "start_ts", "end_ts", binSeconds = 3600)
      .select($"ival.name").as[String].collect().toSet
    assert(names == Set("outer", "inner"))
  }
}
