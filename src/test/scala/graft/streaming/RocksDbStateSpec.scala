package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `graft.stateStore=rocksdb` — the three stateful streaming families
  * whose bounded-state-at-100TB arguments assume the RocksDB provider
  * (state off-heap/on-disk, not in the executor heap the HDFS-backed
  * provider uses), re-run under it and pinned equal to the default.
  */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def withRocksDb[A](body: => A): A = {
    spark.conf.set(StateStores.ConfKey, "rocksdb")
    try body finally spark.conf.unset(StateStores.ConfKey)
  }

  private def events() = {
    val batch = spark.read.parquet(s"$sf/events.parquet")
    val sch = batch.schema
    val stream = spark.readStream.schema(sch).option("basePath", sf)
      .parquet(s"$sf/events.parque*")
    (graft.Tables.normalizeTimestamps(batch, nanosLongCols = Set("ts")),
      graft.Tables.normalizeTimestamps(stream, nanosLongCols = Set("ts")))
  }

  private def sides(ev: org.apache.spark.sql.DataFrame) =
    (ev.filter(col("event_type") === "purchase")
       .select(col("event_id"), col("user_id"), col("ts")),
     ev.filter(col("event_type") === "click")
       .select(col("event_id"), col("user_id"), col("ts")))

  test("stream-stream interval join (q_st5 shape) is provider-invariant") {
    val (_, sev) = events()
    val (sp, sc) = sides(sev)
    def run() = Replay.availableNow(
        StreamJoin.intervalJoin(sp, sc, "user_id", "ts",
          "30 minutes", "10 minutes"))
      .select(col("l_event_id"), col("r_event_id"))
      .as[(Long, Long)].collect().toSet
    val default = run()
    assert(default.nonEmpty, "fixture yields no pairs — vacuous")
    val rocks = withRocksDb { run() }
    assert(rocks == default,
      s"RocksDB diverged: ${rocks.size} vs ${default.size} pairs")
  }

  test("LEFT OUTER interval join (q_st11 shape) is provider-invariant") {
    val (_, sev) = events()
    val (sp, sc) = sides(sev)
    def run() = Replay.availableNow(
        StreamJoin.intervalJoin(sp, sc, "user_id", "ts",
          "30 minutes", "10 minutes", joinType = "leftOuter"))
      .select(col("l_event_id"), col("r_event_id"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val default = run()
    assert(default.exists(_._1._2 == -1L), "no unmatched left rows — vacuous")
    val rocks = withRocksDb { run() }
    assert(rocks == default)
  }

  test("dropDuplicatesWithinWatermark (q_st12 shape) is provider-invariant") {
    val (_, sev) = events()
    val docs = sev.select(col("event_id"), col("ts"),
      concat(lit("p"), (col("event_id") % 500).cast("string")).as("payload"))
    def run() = Replay.availableNow(
        StreamingDedup.exactWithinWatermark(docs, "payload", "ts", "10 minutes"))
      .select("event_id").as[Long].collect().sorted.toSeq
    val default = run()
    assert(default.nonEmpty && default.size < 6000,
      s"dedup kept ${default.size} — fixture gives no dedup pressure")
    val rocks = withRocksDb { run() }
    assert(rocks == default)
  }
}
