package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def recs = Seq(
    // cluster A: two single-edit variants of the same name + the original
    (10L, "Ada Lovelace", 1L, "VIP", 100.0),
    (11L, "Ada Lovelce", 1L, "VIP", 99.5),    // deletion at pos 9
    (12L, "Ada Lovelacx", 1L, "VIP", 101.0),  // substitution at pos 12
    // singleton: same name, different block → never a candidate
    (20L, "Ada Lovelace", 2L, "VIP", 100.0),
    // cluster B: deletion inside the range
    (30L, "Grace Hopper", 1L, "STD", 50.0),
    (31L, "Grace Hoper", 1L, "STD", 51.0),
    // near-name but attribute disagreement → verify rejects
    (40L, "Grace Hopped", 1L, "VIP", 500.0)
  ).toDF("rid", "name", "nation", "segment", "acctbal")

  test("deletion-neighborhood keys cover every single-edit pair") {
    val keys = EntityResolution.deletionKeys(recs, "rid", "name",
      Seq("nation"), delFrom = 4, delTo = 12)
    // identity key + one key per deletion position ≤ name length
    val perRec = keys.groupBy("_rid").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perRec(10L) == 10) // positions 3(identity sentinel)..12
    // every single-edit pair shares a key: check (10,11) and (30,31)
    val cand = EntityResolution.candidatePairs(recs, "rid", "name",
      Seq("nation"), 4, 12).as[(Long, Long)].collect().toSet
    assert(cand.contains((10L, 11L)))
    assert(cand.contains((30L, 31L)))
    // different block never pairs, even with identical names
    assert(!cand.exists { case (a, b) => Set(a, b).contains(20L) &&
      Set(a, b).exists(Set(10L, 11L, 12L)) })
  }

  test("resolve clusters verified pairs and leaves rejects as singletons") {
    val out = EntityResolution.resolve(recs, "rid", "name", Seq("nation"),
      delFrom = 4, delTo = 12, maxDist = 1,
      extraVerify = col("l.segment") === col("r.segment") &&
        abs(col("l.acctbal") - col("r.acctbal")) <= 2.5)
    val byId = out.select("rid", "cluster_id").as[(Long, Long)]
      .collect().toMap
    assert(byId(10L) == 10L && byId(11L) == 10L && byId(12L) == 10L)
    assert(byId(30L) == 30L && byId(31L) == 30L)
    // attribute disagreement (segment + balance) keeps 40 out of cluster B
    assert(byId(40L) == 40L)
    // cross-block twin stays its own cluster
    assert(byId(20L) == 20L)
  }

  test("goldenRecords picks longest-name survivor with min-id tiebreak") {
    val resolved = EntityResolution.resolve(recs, "rid", "name",
      Seq("nation"), 4, 12, maxDist = 1,
      extraVerify = col("l.segment") === col("r.segment") &&
        abs(col("l.acctbal") - col("r.acctbal")) <= 2.5)
    val golden = EntityResolution.goldenRecords(resolved, "rid", "name",
      valueAggs = Seq(max(col("acctbal")).as("acctbal")))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4))).toMap
    // cluster 10: survivors "Ada Lovelace" (12) vs "Ada Lovelacx" (12) →
    // min-id tiebreak picks rid 10's name; n=3; max balance 101.0
    assert(golden(10L) == ((10L, "Ada Lovelace", 3L, 101.0)))
    assert(golden(30L) == ((30L, "Grace Hopper", 2L, 51.0)))
    assert(golden(40L)._3 == 1L)
  }

  test("hot-key fan-out controls: duplicate-run keys dedupe exactly and " +
      "maxKeyGroup drops oversized key groups") {
    val runs = Seq(
      // a zero-run: deleting ANY of the zeros yields the same key, so the
      // (rid, key) dedupe collapses 7 emissions to a handful — and the
      // single-edit pair (1,2) must still be found afterwards
      (1L, "Cust#000000012", 1L),
      (2L, "Cust#00000012", 1L),
      (3L, "Cust#000000099", 1L),
      // an adversarial low-entropy name: 4 records, one shared key
      (4L, "zz", 1L), (5L, "zz", 1L), (6L, "zz", 1L), (7L, "zz", 1L)
    ).toDF("rid", "name", "nation")
    val cand = EntityResolution.candidatePairs(runs, "rid", "name",
      Seq("nation"), 4, 12).as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 2L)), cand)
    assert(cand.count { case (a, _) => a >= 4L } == 6) // C(4,2) zz pairs
    // frequency cutoff at 3: the zz key group (4 records) drops entirely,
    // the small run-groups are untouched
    val capped = EntityResolution.candidatePairs(runs, "rid", "name",
      Seq("nation"), 4, 12, maxKeyGroup = 3)
      .as[(Long, Long)].collect().toSet
    assert(capped.contains((1L, 2L)), capped)
    assert(!capped.exists { case (a, _) => a >= 4L }, capped)
    intercept[IllegalArgumentException] {
      EntityResolution.candidatePairs(runs, "rid", "name",
        Seq("nation"), 4, 12, maxKeyGroup = 1)
    }
  }

  test("non-numeric id fails loudly") {
    val strIds = recs.withColumn("rid", concat(lit("r"), col("rid")))
    intercept[IllegalArgumentException] {
      EntityResolution.candidatePairs(strIds, "rid", "name",
        Seq("nation"), 4, 12)
    }
  }
}
