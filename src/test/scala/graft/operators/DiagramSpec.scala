package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DiagramSpec extends SparkSpec {
  import spark.implicits._

  // tiny containment graph: region r1 <- nations n1,n2 <- customers c1..c3;
  // order o1 -> c1; c3 hangs off n2 which hangs off r2 (outside r1's 2-hop)
  private lazy val edges = Seq(
    ("n1", "r1"), ("n2", "r2"), ("c1", "n1"), ("c2", "n1"), ("c3", "n2"),
    ("o1", "c1"))
    .toDF("from_id", "to_id")
  private lazy val vertices = Seq(
    ("r1", "AMERICA"), ("r2", "ASIA"), ("n1", "BRAZIL"), ("n2", "JAPAN"),
    ("c1", "Customer One"), ("c2", "Customer\"Two"), ("c3", "Customer Three"),
    ("o1", "order-1"))
    .toDF("id", "name")

  test("neighborhoodGraph: k-hop node set with induced edges only") {
    val (nodes, sub) = Diagram.neighborhoodGraph(vertices, edges, "n1", 1)
    val ids = nodes.select("id").as[String].collect().toSet
    assert(ids == Set("n1", "r1", "c1", "c2"))
    val es = sub.as[(String, String)].collect().toSet
    assert(es == Set(("n1", "r1"), ("c1", "n1"), ("c2", "n1")),
      "edges leaving the neighborhood must not appear")
  }

  test("filteredGraph: deterministic type/name order with limit") {
    val (nodes, _) = Diagram.filteredGraph(vertices, edges,
      filter = col("id") =!= "o1", typeOf = substring(col("id"), 1, 1),
      limit = 3)
    val ids = nodes.select("id").as[String].collect().toSeq
    assert(ids == Seq("c1", "c3", "c2"),
      s"expected name-ordered customers first, got $ids") // One < Three < "Two
  }

  test("mermaid render: declaration, typed shapes, cleaned ids, escaping") {
    val (nodes, sub) = Diagram.neighborhoodGraph(vertices, edges, "n1", 2)
    val m = Diagram.toMermaid(nodes, sub)
    assert(m.startsWith("graph TD\n"))
    assert(m.contains("""    n1(["BRAZIL"])"""), m) // nation: stadium shape
    assert(m.contains("""    r1[["AMERICA"]]"""), m) // region: subroutine
    assert(m.contains("""    c2["Customer'Two"]"""), m) // quote escaped
    assert(m.contains("    c1 --> n1"))
    assert(m.contains("    o1 --> c1"))
    assert(!m.contains("c3"), "node outside the neighborhood rendered")
  }

  test("dot render: digraph with typed fills; bounded guard trips") {
    val (nodes, sub) = Diagram.neighborhoodGraph(vertices, edges, "n1", 1)
    val d = Diagram.toDot(nodes, sub)
    assert(d.startsWith("digraph G {"))
    assert(d.contains("n1 [label=\"BRAZIL\", fillcolor=lightyellow];"), d)
    assert(d.contains("  c1 -> n1;"))
    val big = spark.range(600).select(concat(lit("c"), col("id")).as("id"))
      .withColumn("name", col("id"))
    val err = intercept[IllegalArgumentException] {
      Diagram.toMermaid(big, edges, maxNodes = 500)
    }
    assert(err.getMessage.contains("exceeds 500"))
  }

  test("sanitization collisions get distinct render ids, edges follow") {
    // 'a.b' and 'a-b' both sanitize to a_b: the renderer must keep them
    // apart or the diagram silently merges two different nodes.
    val vs = Seq(("a.b", "Dot"), ("a-b", "Dash")).toDF("id", "name")
    val es = Seq(("a.b", "a-b")).toDF("from_id", "to_id")
    val m = Diagram.toMermaid(vs, es)
    // sorted node order assigns render ids: 'a-b' < 'a.b' lexicographically
    assert(m.contains("""a_b["Dash"]""") && m.contains("""a_b_1["Dot"]"""), m)
    assert(m.contains("    a_b_1 --> a_b"), m)
  }
}
