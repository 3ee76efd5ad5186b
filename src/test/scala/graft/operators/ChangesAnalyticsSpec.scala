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
}
