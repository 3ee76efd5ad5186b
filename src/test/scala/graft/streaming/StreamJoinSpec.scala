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

  test("staticEnrich: stateless broadcast left join keeps unmatched events") {
    val batch = spark.read.parquet(s"$sf/events.parquet")
    val ev = graft.Tables.normalizeTimestamps(batch, nanosLongCols = Set("ts"))
    // dim deliberately missing some keys: only even user_ids present
    val dim = ev.select(col("user_id").as("k")).distinct()
      .filter(col("k") % 2 === 0).withColumn("tag", concat(lit("u"), col("k")))
    val enriched = StreamJoin.staticEnrich(ev, dim, "user_id", "k")
    // LEFT semantics: row count preserved, odd users NULL-tagged
    assert(enriched.count() == ev.count())
    assert(enriched.filter(col("user_id") % 2 === 1 && col("tag").isNotNull)
      .count() == 0)
    assert(enriched.filter(col("user_id") % 2 === 0 && col("tag").isNull)
      .count() == 0)
    // the static side must be broadcast: the STREAM side stays
    // exchange-free (the dim's own distinct may shuffle inside the
    // broadcast build — that's the bounded side, fine)
    val p = enriched.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Exchange hashpartitioning(user_id"), p)
    // streaming replay composes with a downstream stateful agg and
    // equals the batch twin window-for-window
    val sch = batch.schema
    val stream = spark.readStream.schema(sch).option("basePath", sf)
      .parquet(s"$sf/events.parque*")
    val sev = graft.Tables.normalizeTimestamps(stream, nanosLongCols = Set("ts"))
    def agg(in: org.apache.spark.sql.DataFrame) =
      WindowedAgg.tumbling(
        StreamJoin.staticEnrich(in, dim, "user_id", "k")
          .withColumn("seg", coalesce(col("tag"), lit("none"))),
        "ts", "seg", "value", "1 hour", "30 minutes")
    val streamed = Replay.availableNow(agg(sev))
      .select(col("window_start").cast("long"), col("seg"), col("n_events"))
      .as[(Long, String, Long)].collect().toSet
    assert(streamed.nonEmpty)
    // batch twin emits ALL windows; the stream emits the finalized subset
    val batchAll = agg(ev)
      .select(col("window_start").cast("long"), col("seg"), col("n_events"))
      .as[(Long, String, Long)].collect().toSet
    assert(streamed.subsetOf(batchAll),
      s"stream emitted a window the batch twin doesn't have: ${streamed -- batchAll}")
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
