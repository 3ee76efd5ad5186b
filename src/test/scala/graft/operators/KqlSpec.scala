package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KQL-surface mapping (resource_graph.go queries re-expressed). */
class KqlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val resources = Seq(
    ("r1", "vm", "eastus", """ids: /sub/1 /sub/2"""),
    ("r2", "vm", "westus", """ids: /sub/3"""),
    ("r3", "storage", "eastus", "")).toDF("id", "type", "location", "props")

  test("project | where | order by | take") {
    val out = Kql.take(Kql.orderBy(
      Kql.where(Kql.project(resources, "id", "type"), col("type") === "vm"),
      ("id", false)), 1).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("r2"))
  }

  test("summarize count() by type, location (resource_graph.go:84-86)") {
    val out = Kql.summarizeCount(resources, "type", "location")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("vm", "eastus") -> 1L, ("vm", "westus") -> 1L,
      ("storage", "eastus") -> 1L))
  }

  test("summarize make_set(location) by type (resource_graph.go:88-90)") {
    val out = Kql.summarizeMakeSet(resources, "type", "location")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("vm") == Seq("eastus", "westus"))
    assert(out("storage") == Seq("eastus"))
  }

  test("extract_all + mv-expand (resource_graph.go:131-151)") {
    val expanded = Kql.mvExpand(
      resources.withColumn("refs", Kql.extractAll(col("props"), "(/sub/\\d+)")),
      "refs")
    val refs = expanded.filter(col("refs").isNotNull)
      .select("id", "refs").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(refs == Set(("r1", "/sub/1"), ("r1", "/sub/2"), ("r2", "/sub/3")))
  }

  test("join kind=leftouter on key (resource_graph.go:268-277)") {
    val groups = Seq(("eastus", "rg-east")).toDF("location", "resourceGroup")
    val out = Kql.joinLeftOuter(resources, groups, "location")
      .select("id", "resourceGroup").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out == Map("r1" -> Some("rg-east"), "r3" -> Some("rg-east"),
      "r2" -> None))
  }
}
