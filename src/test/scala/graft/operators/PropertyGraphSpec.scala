package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PGQ-shaped registration ([[PropertyGraph]]): DDL parse, referential
  * validation, edge-view normalization, and traversal routing parity with
  * the bare [[Graph]] facade.
  */
class PropertyGraphSpec extends SparkSpec {
  import spark.implicits._

  private def fixture() = {
    val vertices = Seq(("a", "app"), ("b", "db"), ("c", "vpc"), ("d", "acct"))
      .toDF("id", "name")
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"))
      .toDF("src", "dst")
    (vertices, edges)
  }

  test("register validates keys and references eagerly") {
    val (v, e) = fixture()
    val err1 = intercept[IllegalArgumentException] {
      PropertyGraph.register("bad1",
        Map("res" -> PropertyGraph.VertexTable(v, "nope")), Map.empty)
    }
    assert(err1.getMessage.contains("no key column 'nope'"))
    val err2 = intercept[IllegalArgumentException] {
      PropertyGraph.register("bad2",
        Map("res" -> PropertyGraph.VertexTable(v, "id")),
        Map("dep" -> PropertyGraph.EdgeTable(e, "src", "dst", "res", "ghost")))
    }
    assert(err2.getMessage.contains("unknown vertex table 'ghost'"))
    val err3 = intercept[IllegalArgumentException] {
      PropertyGraph.graph("never_registered")
    }
    assert(err3.getMessage.contains("no property graph"))
  }

  test("edge/vertex views normalize to labeled string ids") {
    val (v, e) = fixture()
    val g = PropertyGraph.register("pg_views",
      Map("res" -> PropertyGraph.VertexTable(v, "id")),
      Map("dep" -> PropertyGraph.EdgeTable(e, "src", "dst", "res", "res")))
    assert(g.edgeView.columns.toSeq ==
      Seq("from_id", "to_id", "edge_label"))
    assert(g.edgeView.where(col("edge_label") === "dep").count() == 4)
    assert(g.vertexView.columns.toSeq == Seq("id", "vertex_label"))
    assert(g.vertexView.count() == 4)
    PropertyGraph.drop("pg_views")
  }

  test("matchPath(2) equals the manual two-join expansion") {
    val (v, e) = fixture()
    val g = PropertyGraph.register("pg_match",
      Map("res" -> PropertyGraph.VertexTable(v, "id")),
      Map("dep" -> PropertyGraph.EdgeTable(e, "src", "dst", "res", "res")))
    val got = g.matchPath(2).as[(String, String, String)].collect().toSet
    // a->b->c, a->c->d, b->c->d
    assert(got == Set(("a", "b", "c"), ("a", "c", "d"), ("b", "c", "d")))
    PropertyGraph.drop("pg_match")
  }

  test("matchSteps constrains hops by edge label and validates labels") {
    val v = Seq(("a", "x"), ("b", "x"), ("c", "x")).toDF("id", "name")
    val owns = Seq(("a", "b")).toDF("src", "dst")
    val uses = Seq(("b", "c"), ("a", "c")).toDF("src", "dst")
    val g = PropertyGraph.register("pg_steps",
      Map("res" -> PropertyGraph.VertexTable(v, "id")),
      Map("owns" -> PropertyGraph.EdgeTable(owns, "src", "dst", "res", "res"),
        "uses" -> PropertyGraph.EdgeTable(uses, "src", "dst", "res", "res")))
    // (a)-[:owns]->(b)-[:uses]->(c): exactly one path
    val got = g.matchSteps(Seq(Some("owns"), Some("uses")))
      .as[(String, String, String)].collect().toSet
    assert(got == Set(("a", "b", "c")))
    // unconstrained second hop adds nothing here; unconstrained both hops
    // equals matchPath
    assert(g.matchSteps(Seq(None, None)).count() == g.matchPath(2).count())
    val bad = intercept[IllegalArgumentException] {
      g.matchSteps(Seq(Some("ghost")))
    }
    assert(bad.getMessage.contains("no edge table 'ghost'"))
    PropertyGraph.drop("pg_steps")
  }

  test("routed reach matches the bare Graph facade") {
    val (v, e) = fixture()
    val g = PropertyGraph.register("pg_reach",
      Map("res" -> PropertyGraph.VertexTable(v, "id")),
      Map("dep" -> PropertyGraph.EdgeTable(e, "src", "dst", "res", "res")))
    val viaGraph = Graph.reachFrom(
      e.select(col("src").as("from_id"), col("dst").as("to_id")),
      Seq("a").toDF("id"), 10)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    val viaPg = g.reach(Seq("a"), 10)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(viaPg == viaGraph && viaPg.contains(("d", 2)))
    PropertyGraph.drop("pg_reach")
  }

  test("matchQuantified: pairwise min-distance band, label pruning") {
    val (v, _) = fixture()
    // a->b->c->d plus shortcut a->c: from a, c is at 1 (shortcut), d at 2
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"))
      .toDF("src", "dst")
    val g = PropertyGraph.register("pg_quant",
      Map("res" -> PropertyGraph.VertexTable(v, "id")),
      Map("dep" -> PropertyGraph.EdgeTable(e, "src", "dst", "res", "res")))
    val got = g.matchQuantified(Seq("a", "b"), 1, 2)
      .as[(String, String, Int)].collect().toSet
    assert(got == Set(
      ("a", "b", 1), ("a", "c", 1), ("a", "d", 2),
      ("b", "c", 1), ("b", "d", 2)))
    // lower bound prunes: {2,2} keeps only the distance-2 pairs
    assert(g.matchQuantified(Seq("a", "b"), 2, 2)
      .as[(String, String, Int)].collect().toSet ==
      Set(("a", "d", 2), ("b", "d", 2)))
    // bad label fails eagerly
    val bad = intercept[IllegalArgumentException] {
      g.matchQuantified(Seq("a"), 1, 2, Some("ghost"))
    }
    assert(bad.getMessage.contains("no edge table 'ghost'"))
    PropertyGraph.drop("pg_quant")
  }

  test("matchPattern routes quantified, ANY SHORTEST, and fixed forms") {
    val (v, e) = fixture()
    val g = PropertyGraph.register("pg_pat",
      Map("res" -> PropertyGraph.VertexTable(v, "id")),
      Map("dep" -> PropertyGraph.EdgeTable(e, "src", "dst", "res", "res")))
    // {1,2} band
    assert(g.matchPattern("(a)-[e:dep]->{1,2}(b)", Seq("a"))
      .as[(String, String, Int)].collect().toSet ==
      Set(("a", "b", 1), ("a", "c", 1), ("a", "d", 2)))
    // + = {1,maxHops}; * = {0,maxHops} (self binding at 0)
    assert(g.matchPattern("(a)-[]->+(b)", Seq("b")).count() == 2) // c@1, d@2
    assert(g.matchPattern("(a)-[]->*(b)", Seq("b"))
      .filter(col("path_len") === 0).count() == 1)
    // ANY SHORTEST keeps one min-length row per pair incl. (a,a,0)
    val sp = g.matchPattern("ANY SHORTEST (a)-[e]->*(b)", Seq("a"))
      .as[(String, String, Int)].collect().toSet
    assert(sp == Set(("a", "a", 0), ("a", "b", 1), ("a", "c", 1), ("a", "d", 2)))
    // fixed chain still routes to matchSteps
    assert(g.matchPattern("(x)-[]->(y)-[]->(z)").columns.toSeq ==
      Seq("v0", "v1", "v2"))
    // unparseable fails with the pattern text
    val bad = intercept[IllegalArgumentException] {
      g.matchPattern("(a)-[e]->{1,2}(b)-[]->(c)", Seq("a"))
    }
    assert(bad.getMessage.contains("unparseable MATCH pattern"))
    PropertyGraph.drop("pg_pat")
  }

  test("registerDdl parses the reference's simplified DDL") {
    val (v, e) = fixture()
    v.createOrReplaceTempView("pg_spec_vertices")
    e.withColumnRenamed("src", "from_id").withColumnRenamed("dst", "to_id")
      .createOrReplaceTempView("pg_spec_edges")
    val g = PropertyGraph.registerDdl(spark,
      """CREATE OR REPLACE PROPERTY GRAPH spec_infra
        |VERTEX TABLES (
        |  pg_spec_vertices KEY (id)
        |)
        |EDGE TABLES (
        |  pg_spec_edges
        |  SOURCE KEY (from_id) REFERENCES pg_spec_vertices (id)
        |  DESTINATION KEY (to_id) REFERENCES pg_spec_vertices (id)
        |)""".stripMargin)
    assert(g.name == "spec_infra")
    assert(g.edgeView.count() == 4)
    // re-register replaces (OR REPLACE semantics)
    assert(PropertyGraph.graph("spec_infra").edges.contains("pg_spec_edges"))
    val bad = intercept[IllegalArgumentException] {
      PropertyGraph.registerDdl(spark, "CREATE GRAPH nope")
    }
    assert(bad.getMessage.contains("unparseable"))
    PropertyGraph.drop("spec_infra")
  }
}
