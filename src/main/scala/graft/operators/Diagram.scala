package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** G6: graph→diagram conversion (diagrams/pkg/graph/converter.go:25-300 +
  * renderer/mermaid.go:44-120 in the reference). The ENGINE half —
  * neighborhood selection, induced-edge computation, filtered top-N — runs
  * as Spark plans on the same vertex/edge frames as the rest of the graph
  * family; only the final render collects, and it renders a subgraph that
  * is BOUNDED by construction (k-hop neighborhood or LIMIT n), never the
  * full graph — the reference's own design ("get neighborhood / LIMIT 50,
  * then draw"), which is why the collect is sound at 100 TB.
  */
object Diagram {

  /** Induced subgraph around `resourceId` at `depth`
    * (converter.go:42-77): nodes are the undirected k-hop neighborhood
    * (with hop distance), edges are those with BOTH endpoints inside it.
    */
  def neighborhoodGraph(vertices: DataFrame, edges: DataFrame,
      resourceId: String, depth: Int = 2): (DataFrame, DataFrame) = {
    val nodes = Graph.neighborhood(edges, resourceId, depth)
      .join(vertices, Seq("id"), "left")
    val ids = nodes.select("id")
    val induced = edges
      .join(ids.withColumnRenamed("id", "from_id"), Seq("from_id"), "left_semi")
      .join(ids.withColumnRenamed("id", "to_id"), Seq("to_id"), "left_semi")
      .select("from_id", "to_id")
    (nodes, induced)
  }

  /** Filtered top-N node selection (converter.go:82-110: `WHERE` filters
    * `ORDER BY type, name LIMIT 50`) plus its induced edges.
    */
  def filteredGraph(vertices: DataFrame, edges: DataFrame,
      filter: Column, typeOf: Column, limit: Int = 50): (DataFrame, DataFrame) = {
    val nodes = vertices.filter(filter)
      .withColumn("node_type", typeOf)
      .orderBy(col("node_type"), col("name"), col("id"))
      .limit(limit)
    val ids = nodes.select("id")
    val induced = edges
      .join(ids.withColumnRenamed("id", "from_id"), Seq("from_id"), "left_semi")
      .join(ids.withColumnRenamed("id", "to_id"), Seq("to_id"), "left_semi")
      .select("from_id", "to_id")
    (nodes, induced)
  }

  private def cleanId(s: String): String = s.replaceAll("[^A-Za-z0-9_]", "_")
  private def escapeLabel(s: String): String =
    Option(s).getOrElse("").replace("\"", "'").replace("\n", " ")

  /** Bounded driver materialization shared by both renderers: nodes are
    * limited BEFORE the collect (an over-limit frame trips the guard on
    * maxNodes+1 rows, never an unbounded pull), edges are filtered to the
    * collected id set BEFORE their collect, and raw ids map to render ids
    * through one collision-safe table (sanitizing distinct raw ids to the
    * same cleaned string would silently merge nodes in the diagram).
    */
  private def collectBounded(nodes: DataFrame, edges: DataFrame,
      maxNodes: Int): (Seq[(String, String, String)], Seq[(String, String)],
        Map[String, String]) = {
    val n = nodes.select(col("id"),
        coalesce(col("name"), col("id")).as("label"),
        substring(col("id"), 1, 1).as("tpe"))
      .limit(maxNodes + 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(t => (t._3, t._1)).toSeq
    require(n.length <= maxNodes,
      s"diagram subgraph exceeds $maxNodes nodes; " +
        "select a neighborhood or filtered subset first")
    val rawIds = n.map(_._1)
    val render = scala.collection.mutable.LinkedHashMap[String, String]()
    val used = scala.collection.mutable.HashSet[String]()
    rawIds.foreach { raw =>
      val base = cleanId(raw)
      var cand = base
      var k = 1
      while (!used.add(cand)) { cand = s"${base}_$k"; k += 1 }
      render(raw) = cand
    }
    val idSet = rawIds.toSet
    val e = edges.select("from_id", "to_id")
      .filter(col("from_id").isin(rawIds: _*) && col("to_id").isin(rawIds: _*))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .filter(p => idSet.contains(p._1) && idSet.contains(p._2))
      .distinct.sorted.toSeq
    (n, e, render.toMap)
  }

  /** Node shape by type, mirroring the reference's type→shape switch
    * (mermaid.go:64-88) with the test graph's type letters.
    */
  private def mermaidNode(id: String, label: String, tpe: String): String = {
    val l = escapeLabel(label)
    tpe match {
      case "r" => s"""    $id[["$l"]]"""   // region: subroutine box
      case "n" => s"""    $id(["$l"])"""   // nation: stadium
      case "c" => s"""    $id["$l"]"""     // customer: box
      case "s" => s"""    $id{"$l"}"""     // supplier: rhombus
      case "o" => s"""    $id[("$l")]"""   // order: cylinder
      case _   => s"""    $id["$l"]"""
    }
  }

  /** Render a bounded subgraph as Mermaid `graph TD` text. Deterministic:
    * nodes sort by (type, id), edges by (from, to). Refuses unbounded
    * input — the caller selects the subgraph, the renderer only draws.
    */
  def toMermaid(nodes: DataFrame, edges: DataFrame,
      maxNodes: Int = 500): String = {
    val (n, e, render) = collectBounded(nodes, edges, maxNodes)
    val sb = new StringBuilder("graph TD\n")
    n.foreach { case (id, label, tpe) =>
      sb.append(mermaidNode(render(id), label, tpe)).append('\n')
    }
    e.foreach { case (f, t) =>
      sb.append(s"    ${render(f)} --> ${render(t)}\n")
    }
    sb.result()
  }

  /** Render as Graphviz DOT (`digraph`), colors keyed by type. */
  def toDot(nodes: DataFrame, edges: DataFrame, maxNodes: Int = 500): String = {
    val (n, e, render) = collectBounded(nodes, edges, maxNodes)
    val fill = Map("r" -> "lightblue", "n" -> "lightyellow",
      "c" -> "lightgrey", "s" -> "lightpink", "o" -> "lightgreen")
    val sb = new StringBuilder("digraph G {\n  rankdir=LR;\n  node [style=filled];\n")
    n.foreach { case (id, label, tpe) =>
      sb.append(s"""  ${render(id)} [label="${escapeLabel(label)}", """ +
        s"""fillcolor=${fill.getOrElse(tpe, "white")}];\n""")
    }
    e.foreach { case (f, t) => sb.append(s"  ${render(f)} -> ${render(t)};\n") }
    sb.append("}\n").result()
  }
}
