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
    val n = nodes.select(col("id"),
        coalesce(col("name"), col("id")).as("label"),
        substring(col("id"), 1, 1).as("tpe"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(t => (t._3, t._1))
    require(n.length <= maxNodes,
      s"diagram subgraph has ${n.length} nodes (max $maxNodes); " +
        "select a neighborhood or filtered subset first")
    val idSet = n.map(_._1).toSet
    val e = edges.select("from_id", "to_id").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter(p => idSet.contains(p._1) && idSet.contains(p._2))
      .distinct.sorted
    val sb = new StringBuilder("graph TD\n")
    n.foreach { case (id, label, tpe) =>
      sb.append(mermaidNode(cleanId(id), label, tpe)).append('\n')
    }
    e.foreach { case (f, t) =>
      sb.append(s"    ${cleanId(f)} --> ${cleanId(t)}\n")
    }
    sb.result()
  }

  /** Render as Graphviz DOT (`digraph`), colors keyed by type. */
  def toDot(nodes: DataFrame, edges: DataFrame, maxNodes: Int = 500): String = {
    val n = nodes.select(col("id"),
        coalesce(col("name"), col("id")).as("label"),
        substring(col("id"), 1, 1).as("tpe"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(t => (t._3, t._1))
    require(n.length <= maxNodes,
      s"diagram subgraph has ${n.length} nodes (max $maxNodes)")
    val idSet = n.map(_._1).toSet
    val e = edges.select("from_id", "to_id").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter(p => idSet.contains(p._1) && idSet.contains(p._2))
      .distinct.sorted
    val fill = Map("r" -> "lightblue", "n" -> "lightyellow",
      "c" -> "lightgrey", "s" -> "lightpink", "o" -> "lightgreen")
    val sb = new StringBuilder("digraph G {\n  rankdir=LR;\n  node [style=filled];\n")
    n.foreach { case (id, label, tpe) =>
      sb.append(s"""  ${cleanId(id)} [label="${escapeLabel(label)}", """ +
        s"""fillcolor=${fill.getOrElse(tpe, "white")}];\n""")
    }
    e.foreach { case (f, t) => sb.append(s"  ${cleanId(f)} -> ${cleanId(t)};\n") }
    sb.append("}\n").result()
  }
}
