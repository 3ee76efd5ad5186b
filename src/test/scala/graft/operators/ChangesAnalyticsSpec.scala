package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class ChangesAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("drift: ADDED / REMOVED / FIELD_MODIFIED (drift_detector.go:198-316)") {
    val baseline = Seq(("r1", "running", "m1"), ("r2", "stopped", "m2"),
      ("r3", "running", "m3")).toDF("id", "state", "size")
    val current = Seq(("r1", "running", "m1"), ("r2", "running", "m2"),
      ("r4", "new", "m4")).toDF("id", "state", "size")
    val d = Changes.drift(baseline, current, "id", Seq("state", "size"))
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)).orNull)).toSet
    assert(d == Set(
      ("r2", "FIELD_MODIFIED", "state"),
      ("r3", "RESOURCE_REMOVED", null),
      ("r4", "RESOURCE_ADDED", null)))
  }

  test("driftFromLog: one-pass latest-state drift equals two-frame drift") {
    import org.apache.spark.sql.expressions.Window
    def ts(s: String) = Timestamp.valueOf(s)
    val cutoff = ts("2024-01-15 00:00:00")
    // a log with: key 1 modified across the cutoff, key 2 removed (no
    // rows after), key 3 added (no rows before), key 4 unchanged, and
    // multiple events per side so the latest-state pick matters
    val log = Seq(
      (1L, 10L, ts("2024-01-10 00:00:00"), "a", 1.0),
      (1L, 11L, ts("2024-01-14 00:00:00"), "b", 2.0),  // baseline latest
      (1L, 12L, ts("2024-01-16 00:00:00"), "c", 3.0),  // current latest
      (2L, 20L, ts("2024-01-01 00:00:00"), "x", 9.0),
      (3L, 30L, ts("2024-02-01 00:00:00"), "y", 4.0),
      (4L, 40L, ts("2024-01-02 00:00:00"), "z", 5.0),
      (4L, 41L, ts("2024-02-02 00:00:00"), "z", 5.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    def lastState(df: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("user_id", "event_type", "value")
    }
    val two = Changes.drift(
      lastState(log.filter(col("ts") < lit(cutoff))),
      lastState(log.filter(col("ts") >= lit(cutoff))),
      "user_id", Seq("event_type", "value")).collect().toSet
    val one = Changes.driftFromLog(log, "user_id",
      Seq("event_type", "value"), Seq("ts", "event_id"),
      col("ts") < lit(cutoff)).collect().toSet
    assert(one == two, s"one-pass drift diverged:\none=$one\ntwo=$two")
    assert(one.exists(_.getString(1) == "RESOURCE_ADDED"))
    assert(one.exists(_.getString(1) == "RESOURCE_REMOVED"))
    assert(one.exists(_.getString(1) == "FIELD_MODIFIED"))
    // one shuffle, no join, no window sort in the one-pass plan
    val plan = Changes.driftFromLog(log, "user_id",
      Seq("event_type", "value"), Seq("ts", "event_id"),
      col("ts") < lit(cutoff)).queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"), plan)
  }

  test("tag drift add/remove/change (drift_detector.go:262-316)") {
    val joined = Seq(
      ("r1", Map("a" -> "1", "b" -> "2"), Map("a" -> "1", "c" -> "3")))
      .toDF("id", "bt", "ct")
    val d = Changes.tagDrift(joined, "id", "bt", "ct")
      .collect().map(r => (r.getString(2), r.getString(1))).toMap
    assert(d == Map("b" -> "TAG_REMOVED", "c" -> "TAG_ADDED"))
  }

  test("impact score keyword rules (base_change_tracker.go:115-312)") {
    val scores = Seq("iam_policy_document", "kms_key_id", "instance_size",
      "random_note").toDF("f")
      .select(Changes.impactScore(col("f"))).as[Int].collect()
    assert(scores(0) == 40 + 2 + 0 + 0)  // policy → security 40
    assert(scores(1) == 30 + 2 + 0 + 0)  // kms → 30
    assert(scores(2) == 5 + 10 + 15 + 0) // size → avail 10 + cost 15
    assert(scores(3) == 5 + 2)
  }

  test("severity thresholds (drift_detector.go:322-333)") {
    val sev = Seq(75, 55, 30, 5).toDF("s")
      .select(Changes.severityFromScore(col("s"))).as[String].collect().toSeq
    assert(sev == Seq("CRITICAL", "HIGH", "MEDIUM", "LOW"))
  }

  test("granularity auto-pick (change_analytics.go:775-789)") {
    assert(Analytics.pickGranularity(1.5) == "minute")
    assert(Analytics.pickGranularity(24) == "hour")
    assert(Analytics.pickGranularity(24 * 10) == "day")
    assert(Analytics.pickGranularity(24 * 100) == "week")
    assert(Analytics.pickGranularity(24 * 400) == "month")
  }

  test("compliance scoring (change_analytics.go:506-582)") {
    assert(Analytics.complianceScore(Map()) == (85.0, "stable"))
    assert(Analytics.complianceScore(Map("CRITICAL" -> 2L, "HIGH" -> 1L))._1 == 60.0)
    assert(Analytics.complianceScore(Map("CRITICAL" -> 20L))._1 == 0.0)
    assert(Analytics.complianceScore(Map("MEDIUM" -> 1L)) == (83.0, "stable"))
  }

  test("anomaly rules fire on thresholds (change_analytics.go:715-771)") {
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    val events = (1 to 60).map(i => (ts, "svcA", "hot"))
      .toDF("ts", "service", "resource")
    val a = Analytics.anomalies(events, "service", "resource",
        spikeThreshold = 50, hotspotThreshold = 50)
      .select("anomaly_type").as[String].collect().toSet
    assert(a == Set("frequency_spike", "service_concentration", "resource_hotspot"))
  }

  test("history caps and orders desc (change_storage.go:249-272)") {
    val events = (1 to 30).map(i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 00:00:00"), "u1"))
      .toDF("event_id", "ts", "user_id")
    val h = Changes.history(events, "user_id", "u1", limit = 5).collect()
    assert(h.length == 5)
    val tss = h.map(_.getTimestamp(1).getTime)
    assert(tss.sameElements(tss.sorted.reverse))
  }

  test("gapFill densifies the span, zero-counts gaps, carries the last sum") {
    import java.sql.Timestamp
    // type a: events at hours 0 and 3 (gap at 1, 2); type b: hour 1 only
    val events = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:10:00"), "a", 10.0),
      (2L, Timestamp.valueOf("2024-01-01 00:50:00"), "a", 5.0),
      (3L, Timestamp.valueOf("2024-01-01 03:20:00"), "a", 7.0),
      (4L, Timestamp.valueOf("2024-01-01 01:00:00"), "b", 2.0))
      .toDF("event_id", "ts", "event_type", "value")
    val out = Analytics.gapFill(events, "ts", "event_type", "value", "hour")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getLong(2), Option(r.get(3)).map(_.toString)))
      .sortBy(r => (r._1, r._2))
    val a = out.filter(_._1 == "a")
    assert(a.length == 4, s"span 00..03 must give 4 hourly rows: ${a.toSeq}")
    assert(a.map(_._3).toSeq == Seq(2L, 0L, 0L, 1L))
    // carried_sum: 15.0 at hour 0, carried through the gap, 7.0 at hour 3
    assert(a.map(_._4).toSeq ==
      Seq(Some("15.0"), Some("15.0"), Some("15.0"), Some("7.0")))
    val b = out.filter(_._1 == "b")
    assert(b.length == 1 && b.head._3 == 1L && b.head._4 == Some("2.0"))
  }

  test("keySkew: heavy key ranks first with exact share and skew factor") {
    import spark.implicits._
    // key 7 carries 10 of 16 rows; keys 1..6 carry one each
    val df = (Seq.fill(10)(7) ++ (1 to 6)).map(k => (k, "x"))
      .toDF("k", "payload")
    val out = Analytics.keySkew(df, "k", topN = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getDouble(6),
        r.getDouble(7)))
    assert(out.length == 3)
    val top = out.head
    assert(top._1 == 1L && top._2 == "7" && top._3 == 10L)
    assert(math.abs(top._4 - 10.0 / 16) < 1e-12)
    assert(top._5 == 7L && top._6 == 16L)
    assert(math.abs(top._7 - 16.0 / 7) < 1e-12)
    assert(math.abs(top._8 - 10.0 / (16.0 / 7)) < 1e-12)
    // ties among the singleton keys break lexicographically
    assert(out(1)._2 == "1" && out(2)._2 == "2")
  }

  test("funnel: greedy earliest path, stalls NULL, horizon gates converted") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val ev = Seq(
      // user 1: clean conversion inside the horizon
      (1L, "view", ts(0)), (1L, "click", ts(100)), (1L, "purchase", ts(500)),
      // user 2: purchase happens BEFORE the chosen click -> stalls at 2
      (2L, "view", ts(0)), (2L, "purchase", ts(50)), (2L, "click", ts(100)),
      // user 3: never views -> excluded from the funnel frame
      (3L, "click", ts(10)),
      // user 4: view only -> 1 step
      (4L, "view", ts(0)),
      // user 5: completes but outside the horizon
      (5L, "view", ts(0)), (5L, "click", ts(10)), (5L, "purchase", ts(5000)))
      .toDF("user_id", "event_type", "ts")
    val out = Analytics.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), horizonSeconds = 1000L)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (Option(r.getAs[java.lang.Long]("ts_2")).map(_.toLong),
         Option(r.getAs[java.lang.Long]("ts_3")).map(_.toLong),
         r.getAs[Long]("steps_completed"), r.getAs[Boolean]("converted")))
      .toMap
    assert(out(1L) == ((Some(100L), Some(500L), 3L, true)))
    assert(out(2L) == ((Some(100L), None, 2L, false)))
    assert(!out.contains(3L))
    assert(out(4L) == ((None, None, 1L, false)))
    assert(out(5L) == ((Some(10L), Some(5000L), 3L, false)))
  }

  test("transitionMatrix: ordered pairs, tie-break, row shares sum to 1") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, 10L, "a", ts(0)), (2L, 10L, "b", ts(1)), (3L, 10L, "a", ts(2)),
      // user 20: equal timestamps -> order by event_id (4 then 5)
      (4L, 20L, "b", ts(7)), (5L, 20L, "c", ts(7)),
      (6L, 30L, "a", ts(0))) // singleton user -> no pair
      .toDF("event_id", "user_id", "event_type", "ts")
    val m = Analytics.transitionMatrix(ev, "user_id", "ts", "event_type",
        "event_id")
      .collect().map(r => (r.getAs[String]("from_type"),
        r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("row_share"))).toMap
    assert(m(("a", "b")) == ((1L, 1.0)))
    assert(m(("b", "a")) == ((1L, 0.5)))
    assert(m(("b", "c")) == ((1L, 0.5)))
    assert(m.size == 3)
  }

  test("cohortRetention: first-week cohorts, distinct users per cell") {
    import java.sql.Timestamp
    val wk = 604800L
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val ev = Seq(
      (10L, ts(0)), (10L, ts(1)), (10L, ts(wk + 5)),   // cohort 0: wk 0, 1
      (20L, ts(10)), (20L, ts(2 * wk)),                 // cohort 0: wk 0, 2
      (30L, ts(wk)), (30L, ts(wk + 100)))               // cohort 1: wk 0 only
      .toDF("user_id", "ts")
    val cells = Analytics.cohortRetention(ev, "user_id", "ts")
      .collect().map(r => (r.getAs[Long]("cohort_week"),
        r.getAs[Long]("weeks_since")) -> r.getAs[Long]("n_users")).toMap
    assert(cells((0L, 0L)) == 2L)
    assert(cells((0L, 1L)) == 1L)
    assert(cells((0L, 2L)) == 1L)
    assert(cells((1L, 0L)) == 1L)
    assert(cells.size == 4)
  }

  test("conversationQa: role repeats, stale gaps, empty content, clean") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      // conv 1: user,user (repeat), then a 2h stale gap, one empty turn
      (1L, ts("2024-01-01 10:00:00"), 1L, "user", "hi"),
      (1L, ts("2024-01-01 10:00:10"), 2L, "user", "still me"),
      (1L, ts("2024-01-01 12:30:00"), 3L, "assistant", ""),
      // conv 2: clean alternation, tight timing, non-empty
      (2L, ts("2024-01-01 09:00:00"), 4L, "user", "q"),
      (2L, ts("2024-01-01 09:00:05"), 5L, "assistant", "a"))
      .toDF("conv_id", "ts", "turn_id", "role", "content")
    val out = Analytics.conversationQa(df, "conv_id", "ts", "turn_id",
        "role", "content", staleGapSec = 3600L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap
    assert(out(1L) == ((3L, 1L, 1L, 1L, false)))
    assert(out(2L) == ((2L, 0L, 0L, 0L, true)))
  }
}
