package graft.catalog

import graft.SparkSpec
import java.sql.Timestamp

class ResourceCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resource upsert is first-write-wins (INSERT OR IGNORE, S6)") {
    val existing = Seq(("r1", "old-name", ts("2024-01-01 00:00:00")))
      .toDF("id", "name", "scanned_at")
    val incoming = Seq(
      ("r1", "new-name", ts("2024-02-01 00:00:00")),
      ("r2", "fresh", ts("2024-02-01 00:00:00")))
      .toDF("id", "name", "scanned_at")
    val out = ResourceCatalog.upsertResources(existing, incoming)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("r1" -> "old-name", "r2" -> "fresh"))
  }

  test("relationship upsert is last-write-wins on the 4-col PK") {
    val base = Seq(
      ("a", "b", "contained_in", "aws", "{}", ts("2024-01-01 00:00:00")),
      ("a", "c", "assumes", "aws", "{}", ts("2024-01-01 00:00:00")))
      .toDF("from_id", "to_id", "relationship_type", "provider",
        "properties", "discovered_at")
    val update = Seq(
      ("a", "b", "contained_in", "aws", """{"x":"1"}""", ts("2024-02-01 00:00:00")))
      .toDF("from_id", "to_id", "relationship_type", "provider",
        "properties", "discovered_at")
    val out = ResourceCatalog.upsertRelationships(base, update)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(4)))
    assert(out.length == 2)
    assert(out.contains(("a", "b", """{"x":"1"}""")))
    assert(out.contains(("a", "c", "{}")))
  }

  test("all_cloud_resources union + provider rollup (unified_schema views)") {
    val aws = Seq(("a1", "n1", "t", "s3", "us-east-1", "acct1", "{}",
      ts("2024-01-01 00:00:00"))).toDF(
      "id", "name", "type", "service", "region", "account_id", "tags", "scanned_at")
    val azure = Seq(("z1", "n2", "t", "storage", "eastus", "sub1", "{}",
      ts("2024-01-02 00:00:00"))).toDF(
      "id", "name", "type", "service", "location", "subscription_id", "tags", "scanned_at")
    val all = ResourceCatalog.allCloudResources(Seq(
      ("aws", aws, Map.empty[String, String]),
      ("azure", azure, Map("region" -> "location", "account_id" -> "subscription_id"))))
    assert(all.columns.toSeq == Seq("provider", "id", "name", "type",
      "service", "region", "account_id", "tags", "scanned_at"))
    assert(all.count() == 2)
    val counts = ResourceCatalog.resourceCountsByProvider(all)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("aws" -> 1L, "azure" -> 1L))
  }

  test("retention filter drops old events (E14)") {
    val events = Seq(("e1", ts("2023-01-01 00:00:00")),
      ("e2", ts("2024-06-01 00:00:00"))).toDF("id", "ts")
    val kept = ResourceCatalog.applyRetention(events, "ts",
      ts("2024-01-01 00:00:00")).select("id").as[String].collect().toSeq
    assert(kept == Seq("e2"))
  }

  test("parquet table store round-trips") {
    val dir = tempDir("graft-store").toString
    val store = new ParquetTableStore(dir)
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    store.overwrite(df, "t")
    store.append(df, "t")
    assert(store.read(spark, "t").count() == 4)
  }

  test("co-bucketed tables join without a shuffle exchange") {
    val a = (1 to 2000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 2000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Bucketing.writeBucketed(a, "bkt_join_a", "k", 8)
    Bucketing.writeBucketed(b, "bkt_join_b", "k", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bkt_join_a").join(spark.table("bkt_join_b"), "k")
      assert(j.count() == 2000)
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"), p)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_join_a")
      spark.sql("DROP TABLE IF EXISTS bkt_join_b")
    }
  }
}
