package graft

import org.apache.spark.sql.functions._

import graft.engine.QueryEngine
import graft.operators.Graph

/** Native `WITH RECURSIVE` through the guarded SQL engine (q_g19): the
  * reference's FindResourcePath text (graph_loader.go:402-433) runs
  * verbatim (dialect-mapped functions only) as a Spark 4.1 UnionLoop —
  * and answers exactly what the Graph facade answers.
  */
class RecursiveSqlSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("statement-class guard admits WITH RECURSIVE (it is a query, " +
      "not a command)") {
    assert(QueryEngine.validate(spark, Queries.g19SparkSql).isRight)
  }

  test("the optimized plan is a native UnionLoop (recursive CTE executed " +
      "by Spark, not routed to a facade)") {
    Tables.register(spark, sf)
    val df = QueryEngine.frame(spark, Queries.g19SparkSql)
    val nodes = df.queryExecution.optimizedPlan
      .collect { case n => n.nodeName }.toSet
    assert(nodes.contains("UnionLoop"), s"plan nodes: $nodes")
  }

  test("facade parity: the recursive path's depth and node chain equal " +
      "Graph.reach over the same edge set") {
    import spark.implicits._
    Tables.register(spark, sf)
    val row = QueryEngine.frame(spark, Queries.g19SparkSql).collect()
    assert(row.length == 1)
    val (path, depth) = (row(0).getString(0), row(0).getInt(1))
    val hops = path.split("->")
    assert(depth == hops.length, s"depth $depth vs path $path")
    assert(hops.head == "o1")
    // reach from o1: distance of the path's target region must equal
    // depth (the star chain is functional, so the walk IS the shortest)
    val edges = Tables.sql(spark, sf, Queries.g19RelSql)
      .select(col("from_id"), col("to_id"))
    val reach = Graph.reachFrom(edges, Seq("o1").toDF("id"), 10)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // the last path node's successor is the region; its reach distance
    // equals depth, and every path node sits at its index's distance
    hops.zipWithIndex.foreach { case (node, i) =>
      assert(reach(node) == i, s"node $node at hop $i has reach ${reach(node)}")
    }
    val region = reach.collect { case (id, dist) if id.startsWith("r") &&
      dist == depth => id }
    assert(region.nonEmpty, s"no region at reach distance $depth")
    assert(row(0).getString(2) == "part_of") // final edge n->r
  }

  test("guard still rejects commands even when spelled with a CTE") {
    val bad = "WITH x AS (SELECT 1) INSERT INTO t SELECT * FROM x"
    assert(QueryEngine.validate(spark, bad).isLeft)
  }
}
