package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PGQ-shaped property-graph registration — the Spark re-expression of
  * the reference's `CREATE PROPERTY GRAPH` DDL
  * (internal/db/graph_loader.go:281-295: vertex tables, edge tables with
  * `SOURCE KEY (col) REFERENCES table (key)` / `DESTINATION KEY ...`).
  * Spark has no SQL/PGQ dialect, so the registration is a typed catalog
  * object: vertex tables each carry a KEY column, edge tables carry
  * source/destination key columns validated against their referenced
  * vertex tables, and GRAPH_TABLE-lite entry points route the declared
  * traversals (reach, k-hop neighborhood, fixed-length MATCH paths,
  * components, PageRank, triangles) through the [[Graph]] facade over
  * the graph's normalized edge view.
  *
  * Scale notes: registration stores only plan references — nothing is
  * materialized or collected. The edge view is a `unionByName` of the
  * edge tables projected to `(from_id, to_id, edge_label)` (narrow,
  * pushdown-friendly), so every routed traversal inherits the Graph
  * facade's partitioned-BFS / pointer-doubling / degree-orientation
  * shapes unchanged.
  */
object PropertyGraph {

  /** A vertex table: any DataFrame plus its key column (`KEY (col)`;
    * the reference's implicit key is `id`).
    */
  final case class VertexTable(df: DataFrame, key: String = "id")

  /** An edge table: `SOURCE KEY (sourceKey) REFERENCES sourceRef` /
    * `DESTINATION KEY (destinationKey) REFERENCES destinationRef`, where
    * the refs name registered vertex tables.
    */
  final case class EdgeTable(df: DataFrame, sourceKey: String,
      destinationKey: String, sourceRef: String, destinationRef: String)

  /** A registered graph. Key values are compared as strings (the
    * reference's resource ids are VARCHAR; mixed-type keys must not
    * equi-join by accident).
    */
  final case class GraphDef(name: String,
      vertices: Map[String, VertexTable], edges: Map[String, EdgeTable]) {

    /** All vertices as `(id, vertex_label)` — label = table name. */
    def vertexView: DataFrame =
      vertices.toSeq.sortBy(_._1).map { case (label, vt) =>
        vt.df.select(col(vt.key).cast("string").as("id"),
          lit(label).as("vertex_label"))
      }.reduce(_.unionByName(_))

    /** All edges as `(from_id, to_id, edge_label)` — label = table name.
      * This is the frame every routed traversal runs on.
      */
    def edgeView: DataFrame =
      edges.toSeq.sortBy(_._1).map { case (label, et) =>
        et.df.select(col(et.sourceKey).cast("string").as("from_id"),
          col(et.destinationKey).cast("string").as("to_id"),
          lit(label).as("edge_label"))
      }.reduce(_.unionByName(_))

    private def e: DataFrame = edgeView.select("from_id", "to_id")

    // ---- GRAPH_TABLE-lite traversal entry points ----------------------

    /** Directed min-distance reach from `sources` (≤ `maxHops`) — the
      * registered-graph route into [[Graph.reachFrom]].
      */
    def reach(sources: Seq[String], maxHops: Int,
        undirected: Boolean = false): DataFrame = {
      val spark = e.sparkSession
      import spark.implicits._
      Graph.reachFrom(e, sources.toDF("id"), maxHops, undirected)
    }

    /** Undirected k-hop neighborhood of `source` with min distance. */
    def neighborhood(source: String, k: Int): DataFrame =
      Graph.neighborhood(e, source, k)

    /** Fixed-length path MATCH — the GRAPH_TABLE-lite core:
      * `(v0)-[]->(v1)-[]->...-[]->(v_hops)` as `hops` self-equi-joins of
      * the edge view, one output column per pattern variable. Cycles are
      * allowed (PGQ default walk semantics). Each join is a plain
      * equi-join on a vertex id — broadcast/shuffle per Catalyst's
      * choice, never an OR-join.
      */
    def matchPath(hops: Int): DataFrame = {
      require(hops >= 1 && hops <= 10, s"matchPath hops out of [1,10]: $hops")
      matchSteps(Seq.fill(hops)(None))
    }

    /** Label-constrained MATCH — PGQ's `(a)-[:label1]->(b)-[:label2]->…`:
      * one entry per hop, `Some(edgeLabel)` restricting that hop to one
      * edge table, `None` matching any. Labels are validated against the
      * registration eagerly (a typo'd label fails here, not as an empty
      * result). Each constrained hop prunes to its single edge table
      * BEFORE the join — at scale that is the difference between joining
      * one relationship type and the whole edge union.
      */
    def matchSteps(steps: Seq[Option[String]]): DataFrame = {
      require(steps.nonEmpty && steps.size <= 10,
        s"matchSteps wants 1..10 hops, got ${steps.size}")
      steps.flatten.foreach(l => require(edges.contains(l),
        s"no edge table '$l' in graph '$name' " +
          s"(has: ${edges.keys.toSeq.sorted.mkString(", ")})"))
      def hop(label: Option[String]): DataFrame = label match {
        case Some(l) =>
          val et = edges(l)
          et.df.select(col(et.sourceKey).cast("string").as("from_id"),
            col(et.destinationKey).cast("string").as("to_id"))
        case None => e
      }
      var acc = hop(steps.head)
        .select(col("from_id").as("v0"), col("to_id").as("v1"))
      var i = 2
      while (i <= steps.size) {
        val step = hop(steps(i - 1))
          .select(col("from_id").as(s"_j$i"), col("to_id").as(s"v$i"))
        acc = acc.join(step, col(s"v${i - 1}") === col(s"_j$i")).drop(s"_j$i")
        i += 1
      }
      acc
    }

    /** Quantified path MATCH — PGQ's `(a)-[:label]->{minHops,maxHops}(b)`
      * (the duckpgq quantifier surface corkscrew's pinned DuckDB ships,
      * corkscrew.yaml:57-58; graph_loader.go:402-433 is its consumer):
      * pairs (a, b) whose MINIMUM walk length from a lies in
      * [minHops, maxHops] — BFS min-distance semantics, the
      * recursive-CTE contract every routed traversal here shares.
      *
      * SEMANTIC DEVIATION from standard SQL/PGQ quantifiers (which ask
      * "does ANY walk of length in [m,n] exist?"): when `minHops > 1`, a
      * pair whose shortest path is below `minHops` but which also has a
      * longer walk inside the band is EXCLUDED here, because only the
      * minimum distance is tracked. The two semantics coincide for
      * `minHops <= 1` (every reachable pair has a walk at its min
      * distance) — the common `*`/`+`/`{1,n}` forms are unaffected.
      * `sources` binds the pattern's left endpoint (the MATCH WHERE
      * clause); an unbound quantified pattern would be an all-pairs
      * reachability and is deliberately not offered. Routed onto
      * [[Graph.pairReach]]; a `Some(label)` prunes to that single edge
      * table BEFORE the traversal.
      */
    def matchQuantified(sources: Seq[String], minHops: Int, maxHops: Int,
        label: Option[String] = None,
        undirected: Boolean = false): DataFrame = {
      require(minHops >= 0 && maxHops >= math.max(minHops, 1) && maxHops <= 20,
        s"matchQuantified wants 0 <= min <= max <= 20, got {$minHops,$maxHops}")
      require(sources.nonEmpty, "matchQuantified needs a bound source set")
      label.foreach(l => require(edges.contains(l),
        s"no edge table '$l' in graph '$name' " +
          s"(has: ${edges.keys.toSeq.sorted.mkString(", ")})"))
      val ev = label.map { l =>
        val et = edges(l)
        et.df.select(col(et.sourceKey).cast("string").as("from_id"),
          col(et.destinationKey).cast("string").as("to_id"))
      }.getOrElse(e)
      val spark = ev.sparkSession
      import spark.implicits._
      Graph.pairReach(ev, sources.toDF("id"), maxHops, undirected)
        .filter(col("distance") >= minHops)
        .select(col("src").as("a"), col("id").as("b"),
          col("distance").as("path_len"))
    }

    /** `ANY SHORTEST (a)-[:label]->*(b)` — one shortest path length per
      * (a, b) pair from each seed, including the zero-length (a, a)
      * binding, depth-capped at `maxHops`.
      */
    def anyShortest(sources: Seq[String], label: Option[String] = None,
        maxHops: Int = 10): DataFrame =
      matchQuantified(sources, 0, maxHops, label)

    private val AnyShortestRe = """(?is)^\s*ANY\s+SHORTEST\s+(.*)$""".r
    private val QuantPatternRe =
      ("""(?is)^\s*\(\s*\w*\s*\)\s*-\s*\[\s*\w*\s*(?::\s*(\w+))?\s*\]\s*->""" +
        """\s*(?:(\*)|(\+)|\{\s*(\d+)\s*,\s*(\d+)\s*\})\s*\(\s*\w*\s*\)\s*$""").r
    private val StepRe = """-\s*\[\s*\w*\s*(?::\s*(\w+))?\s*\]\s*->""".r

    /** Text-form MATCH router — the GRAPH_TABLE-lite pattern dialect:
      *
      *  - `(a)-[:l]->{m,n}(b)`, `(a)-[e]->+(b)`, `(a)-[]->*(b)` →
      *    [[matchQuantified]] (`+` = {1,maxHops}, `*` = {0,maxHops});
      *    `sources` must bind the left endpoint.
      *  - `ANY SHORTEST (a)-[:l]->*(b)` → [[anyShortest]].
      *  - `(v0)-[:l1]->(v1)-[:l2]->(v2)` (no quantifier) →
      *    [[matchSteps]]; `sources` is ignored (the fixed chain binds
      *    every variable to a column).
      *
      * Unparseable patterns fail eagerly with the pattern text, not as
      * an empty result.
      *
      * Note: `{m,n}` with `m > 1` carries [[matchQuantified]]'s
      * min-distance-in-band semantics, not PGQ's exists-a-walk — see
      * the deviation note there before relying on a lower bound.
      */
    def matchPattern(pattern: String, sources: Seq[String] = Nil,
        maxHops: Int = 10): DataFrame = {
      val (isShortest, body) = pattern match {
        case AnyShortestRe(rest) => (true, rest)
        case _ => (false, pattern)
      }
      body match {
        case QuantPatternRe(label, star, plus, lo, hi) =>
          val (mn, mx) =
            if (star != null) (0, maxHops)
            else if (plus != null) (1, maxHops)
            else (lo.toInt, hi.toInt)
          matchQuantified(sources, mn, mx, Option(label))
        case _ if !isShortest &&
            !body.contains("{") && !body.contains("*") && !body.contains("+") =>
          val steps = StepRe.findAllMatchIn(body).map(m => Option(m.group(1))).toSeq
          require(steps.nonEmpty, s"unparseable MATCH pattern: '$pattern'")
          matchSteps(steps)
        case _ => throw new IllegalArgumentException(
          s"unparseable MATCH pattern: '$pattern' (quantifiers support a " +
            "single segment: (a)-[:label]->{m,n}(b), ->+, ->*, " +
            "optionally ANY SHORTEST)")
      }
    }

    /** Undirected connected components over the edge view. */
    def components(): DataFrame = Graph.connectedComponents(e)

    /** Exact fixed-point PageRank over the edge view. */
    def pageRank(iters: Int = 10): DataFrame = Graph.pageRank(e, iters)

    /** Per-vertex triangle counts over the (undirected) edge view. */
    def triangles(): DataFrame = Graph.triangles(e)
  }

  // Session-wide named-graph registry, same lifetime model as Spark temp
  // views (single JVM; names are caller-scoped).
  private val registry = new ConcurrentHashMap[String, GraphDef]()

  /** Register (or replace) a named graph. Validates every declared key
    * column exists and every edge REFERENCES a registered vertex table —
    * the DDL's referential checks, done eagerly so a typo fails at
    * registration, not mid-traversal.
    */
  def register(name: String, vertices: Map[String, VertexTable],
      edges: Map[String, EdgeTable]): GraphDef = {
    require(name.nonEmpty && vertices.nonEmpty,
      "property graph needs a name and at least one vertex table")
    vertices.foreach { case (label, vt) =>
      require(vt.df.columns.contains(vt.key),
        s"vertex table '$label' has no key column '${vt.key}'")
    }
    edges.foreach { case (label, et) =>
      require(et.df.columns.contains(et.sourceKey),
        s"edge table '$label' has no SOURCE KEY column '${et.sourceKey}'")
      require(et.df.columns.contains(et.destinationKey),
        s"edge table '$label' has no DESTINATION KEY column " +
          s"'${et.destinationKey}'")
      require(vertices.contains(et.sourceRef),
        s"edge table '$label' SOURCE REFERENCES unknown vertex table " +
          s"'${et.sourceRef}'")
      require(vertices.contains(et.destinationRef),
        s"edge table '$label' DESTINATION REFERENCES unknown vertex " +
          s"table '${et.destinationRef}'")
    }
    val g = GraphDef(name, vertices, edges)
    registry.put(name, g)
    g
  }

  /** Look up a registered graph; unknown names fail with the catalog's
    * registered-name list (the E21 hint discipline).
    */
  def graph(name: String): GraphDef = {
    val g = registry.get(name)
    require(g != null, {
      val known = {
        val it = registry.keys(); val b = Seq.newBuilder[String]
        while (it.hasMoreElements) b += it.nextElement(); b.result().sorted
      }
      s"no property graph '$name' registered" +
        (if (known.isEmpty) "" else s"; known graphs: ${known.mkString(", ")}")
    })
    g
  }

  def drop(name: String): Unit = registry.remove(name)

  // ---- DDL form -------------------------------------------------------

  private val DdlRe =
    ("""(?is)\s*CREATE\s+(?:OR\s+REPLACE\s+)?PROPERTY\s+GRAPH\s+(\w+)\s+""" +
      """VERTEX\s+TABLES\s*\((.*?)\)\s*EDGE\s+TABLES\s*\((.*)\)\s*""").r
  private val VertexRe = """(?is)\s*(\w+)(?:\s+KEY\s*\(\s*(\w+)\s*\))?\s*""".r
  private val EdgeRe =
    ("""(?is)\s*(\w+)\s+SOURCE\s+KEY\s*\(\s*(\w+)\s*\)\s*""" +
      """REFERENCES\s+(\w+)\s*(?:\(\s*\w+\s*\)\s*)?""" +
      """DESTINATION\s+KEY\s*\(\s*(\w+)\s*\)\s*""" +
      """REFERENCES\s+(\w+)\s*(?:\(\s*\w+\s*\)\s*)?""").r

  /** Register a graph from the reference's simplified DDL text
    * (graph_loader.go:281-295) — `CREATE [OR REPLACE] PROPERTY GRAPH g
    * VERTEX TABLES (t [KEY (col)], ...) EDGE TABLES (e SOURCE KEY (c)
    * REFERENCES t (k) DESTINATION KEY (c) REFERENCES t (k), ...)`.
    * Table names resolve through the session catalog; an omitted vertex
    * KEY defaults to `id` like the reference's `aws_resources`.
    * Top-level commas split the table lists (no nesting beyond the key
    * parens, as in the reference dialect).
    */
  def registerDdl(spark: SparkSession, ddl: String): GraphDef = ddl match {
    case DdlRe(name, vparts, eparts) =>
      def splitTop(s: String): Seq[String] = {
        // split on commas not inside parentheses
        val out = Seq.newBuilder[String]; val cur = new StringBuilder
        var depth = 0
        s.foreach {
          case '(' => depth += 1; cur += '('
          case ')' => depth -= 1; cur += ')'
          case ',' if depth == 0 => out += cur.toString; cur.clear()
          case c => cur += c
        }
        if (cur.nonEmpty) out += cur.toString
        out.result().map(_.trim).filter(_.nonEmpty)
      }
      val vs = splitTop(vparts).map {
        case VertexRe(t, key) =>
          t -> VertexTable(spark.table(t), Option(key).getOrElse("id"))
        case other => throw new IllegalArgumentException(
          s"unparseable VERTEX TABLES entry: '$other'")
      }.toMap
      val es = splitTop(eparts).map {
        case EdgeRe(t, sk, sref, dk, dref) =>
          t -> EdgeTable(spark.table(t), sk, dk, sref, dref)
        case other => throw new IllegalArgumentException(
          s"unparseable EDGE TABLES entry: '$other'")
      }.toMap
      register(name, vs, es)
    case _ => throw new IllegalArgumentException(
      "unparseable CREATE PROPERTY GRAPH statement")
  }
}
