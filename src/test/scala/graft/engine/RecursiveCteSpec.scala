package graft.engine

import graft.SparkSpec
import graft.operators.Graph

/** The reference's graph queries are DuckDB recursive CTEs
  * (internal/db/graph_loader.go:402-464). Spark 4 executes WITH RECURSIVE
  * natively, so those queries run VERBATIM through QueryEngine — this spec
  * pins that capability (guard admits it, results match the BFS operator
  * family). The operator family still uses contracted/iterative BFS
  * because it benchmarks ~10x faster at local SF (measured 3.0 s native
  * recursion vs 0.2-0.5 s BFS on the sf0.1 graph; see SCALE.md) and
  * bounds frontier growth on cyclic graphs via the visited set, which
  * UNION ALL recursion lacks.
  */
class RecursiveCteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val edges = Seq(
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("c", "e"),
    ("h", "x"), ("h", "y"), ("h", "z"))
    .toDF("from_id", "to_id")

  test("reference-shaped recursive CTE runs through the guarded engine") {
    edges.createOrReplaceTempView("rc_edges")
    try {
      val sql =
        """WITH RECURSIVE walk AS (
          |  SELECT 'a' AS id, 0 AS distance
          |  UNION ALL
          |  SELECT e.to_id, w.distance + 1 FROM walk w
          |  JOIN rc_edges e ON e.from_id = w.id WHERE w.distance < 10)
          |SELECT id, CAST(MIN(distance) AS INT) AS distance
          |FROM walk GROUP BY id""".stripMargin
      assert(QueryEngine.validate(spark, sql).isRight)
      val viaEngine = QueryEngine.execute(spark, sql).rows
        .map(r => r.getString(0) -> r.getInt(1)).toMap
      val viaBfs = Graph.reach(edges, Seq("a"), 10, undirected = false)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(viaEngine == viaBfs)
      assert(viaBfs("e") == 3) // cycle-safe: d->a must not extend paths
    } finally spark.catalog.dropTempView("rc_edges")
  }

  test("undirected k-hop recursive CTE matches the neighborhood operator") {
    edges.createOrReplaceTempView("rc_edges")
    try {
      val sql =
        """WITH RECURSIVE sym AS (
          |  SELECT from_id AS a, to_id AS b FROM rc_edges
          |  UNION SELECT to_id, from_id FROM rc_edges),
          |walk AS (
          |  SELECT 'h' AS id, 0 AS distance
          |  UNION ALL
          |  SELECT sy.b, w.distance + 1 FROM walk w
          |  JOIN sym sy ON sy.a = w.id WHERE w.distance < 2)
          |SELECT id, CAST(MIN(distance) AS INT) AS distance
          |FROM walk GROUP BY id""".stripMargin
      val viaEngine = QueryEngine.execute(spark, sql).rows
        .map(r => r.getString(0) -> r.getInt(1)).toMap
      val viaBfs = Graph.neighborhood(edges, "h", 2)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(viaEngine == viaBfs)
    } finally spark.catalog.dropTempView("rc_edges")
  }
}
