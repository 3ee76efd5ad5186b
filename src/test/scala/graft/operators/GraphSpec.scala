package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BFS semantics vs the recursive CTEs of graph_loader.go:402-464:
  * bounded depth, cycle safety, min-distance dedup, undirected option.
  * Graph: a→b→c→d→a (cycle), c→e, isolated f, hub h→{x,y,z}.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private lazy val edges = Seq(
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("c", "e"),
    ("h", "x"), ("h", "y"), ("h", "z"))
    .toDF("from_id", "to_id")

  private def distances(df: org.apache.spark.sql.DataFrame): Map[String, Int] =
    df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap

  test("directed reach with cycle termination") {
    val d = distances(Graph.reach(edges, Seq("a"), 10, undirected = false))
    assert(d == Map("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 3, "e" -> 3))
  }

  test("maxHops bound (reference depth ≤ 10 → here 2)") {
    val d = distances(Graph.reach(edges, Seq("a"), 2, undirected = false))
    assert(d == Map("a" -> 0, "b" -> 1, "c" -> 2))
  }

  test("shortest path length and unreachable") {
    assert(Graph.shortestPathLength(edges, "a", "e") == Some(3))
    assert(Graph.shortestPathLength(edges, "a", "f") == None)
    assert(Graph.shortestPathLength(edges, "x", "a") == None)
    assert(Graph.shortestPathLength(edges, "d", "c", maxDepth = 2) == None)
    assert(Graph.shortestPathLength(edges, "d", "c", maxDepth = 3) == Some(3))
  }

  test("undirected k-hop neighborhood keeps min distance") {
    val d = distances(Graph.neighborhood(edges, "e", 2))
    assert(d == Map("e" -> 0, "c" -> 1, "b" -> 2, "d" -> 2))
  }

  test("multi-source reach takes min over sources") {
    val d = distances(Graph.reachFrom(edges,
      Seq("a", "c").toDF("id"), 10))
    assert(d == Map("a" -> 0, "c" -> 0, "b" -> 1, "d" -> 1, "e" -> 1))
  }

  test("1-hop dependencies/dependents join vertices") {
    val vertices = Seq(("a", "A"), ("b", "B"), ("x", "X"), ("h", "H"))
      .toDF("id", "name")
    val dep = Graph.dependencies(edges, vertices, "a")
      .select("name").as[String].collect().toSet
    assert(dep == Set("B"))
    val deps = Graph.dependents(edges, vertices, "x")
      .select("name").as[String].collect().toSet
    assert(deps == Set("H"))
  }
}
