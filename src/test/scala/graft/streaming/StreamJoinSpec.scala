package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def sides(df: org.apache.spark.sql.DataFrame) = {
    val ev = graft.Tables.normalizeTimestamps(df, nanosLongCols = Set("ts"))
    (ev.filter(col("event_type") === "purchase")
       .select(col("event_id"), col("user_id"), col("ts")),
     ev.filter(col("event_type") === "click")
       .select(col("event_id"), col("user_id"), col("ts")))
  }

  test("interval join: streaming replay equals the batch twin pair-for-pair") {
    val batch = spark.read.parquet(s"$sf/events.parquet")
    val (bp, bc) = sides(batch)
    val expected = StreamJoin.intervalJoin(bp, bc, "user_id", "ts",
        "30 minutes", "10 minutes")
      .select(col("l_event_id"), col("r_event_id"))
      .as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty, "fixture yields no joined pairs — vacuous")

    val sch = batch.schema
    val stream = spark.readStream.schema(sch).option("basePath", sf)
      .parquet(s"$sf/events.parque*")
    val (sp, sc) = sides(stream)
    val streamed = Replay.availableNow(
        StreamJoin.intervalJoin(sp, sc, "user_id", "ts",
          "30 minutes", "10 minutes"))
      .select(col("l_event_id"), col("r_event_id"))
      .as[(Long, Long)].collect().toSet
    assert(streamed == expected,
      s"stream/batch divergence: ${streamed.size} vs ${expected.size} pairs")
  }

  test("interval join bounds: every match is same-key within the lookback") {
    val (p, c) = sides(spark.read.parquet(s"$sf/events.parquet"))
    val rows = StreamJoin.intervalJoin(p, c, "user_id", "ts",
        "30 minutes", "10 minutes")
      .select(col("l_user_id"), col("r_user_id"),
        col("l_ts").cast("long"), col("r_ts").cast("long"))
      .as[(Long, Long, Long, Long)].collect()
    rows.foreach { case (lu, ru, lt, rt) =>
      assert(lu == ru)
      assert(rt <= lt && rt >= lt - 1800)
    }
  }
}
