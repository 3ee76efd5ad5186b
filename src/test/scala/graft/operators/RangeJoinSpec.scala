package graft.operators

import graft.SparkSpec
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
