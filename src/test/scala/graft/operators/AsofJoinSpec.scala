package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join picks the latest right row at or before each left ts") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (2L, ts("2024-01-01 10:02:00"), 200.0))
      .toDF("key", "ts", "px")
    val trades = Seq(
      (1L, ts("2024-01-01 09:59:00"), "t0"), // before any quote → null
      (1L, ts("2024-01-01 10:00:00"), "t1"), // exact match → 100
      (1L, ts("2024-01-01 10:04:59"), "t2"), // between → 100
      (1L, ts("2024-01-01 11:00:00"), "t3"), // after both → 101
      (2L, ts("2024-01-01 10:30:00"), "t4"), // → 200
      (3L, ts("2024-01-01 10:00:00"), "t5")) // no quotes for key 3 → null
      .toDF("key", "ts", "trade")
    val out = AsofJoin.asofJoin(trades, quotes, "key", "ts")
      .select($"trade", $"asof.px")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out("t0") == null)
    assert(out("t1") == 100.0)
    assert(out("t2") == 100.0)
    assert(out("t3") == 101.0)
    assert(out("t4") == 200.0)
    assert(out("t5") == null)
  }
}
