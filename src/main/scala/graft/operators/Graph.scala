package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph traversals over an edge DataFrame `(from_id, to_id)` — the Spark
  * re-expression of corkscrew's DuckDB recursive CTEs
  * (internal/db/graph_loader.go:402-433 shortest path, :435-464 k-hop
  * neighborhood). Spark has no recursive CTE, so these are driver-side
  * iterative BFS loops: each hop is one shuffle join frontier⋈edges; the
  * edge table is hash-partitioned once on from_id and persisted so every
  * iteration reuses the same partitioning (no re-shuffle of the big side).
  * Depth is bounded (reference caps at 10), so the loop is cheap and the
  * lineage is truncated per-hop with localCheckpoint to keep plans small.
  *
  * Scale notes (100 TB): edges partitioned by from_id makes the per-hop
  * join a co-partitioned shuffle on the frontier only; frontiers stay small
  * relative to edges in bounded-depth traversals. For undirected semantics
  * we materialize the symmetric edge view once (union of both directions,
  * graph_loader.go:436-456 joins on `to_id OR from_id` — the union form
  * avoids the OR-join nested loop).
  */
object Graph {

  /** Minimum-distance reachability from `sources` within `maxHops`.
    * Returns (id, distance) with distance = fewest hops (sources at 0).
    * Matches the recursive-CTE semantics: cycle-safe (visited nodes are
    * never revisited at larger distance), `DISTINCT` via min-distance
    * aggregation.
    */
  def reach(edges: DataFrame, sources: Seq[String], maxHops: Int,
      undirected: Boolean): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    reachFrom(edges, sources.toDF("id"), maxHops, undirected)
  }

  /** Multi-source variant: `sources` is a DataFrame with a single `id`
    * column — at scale the seed set is itself distributed (e.g. "distance
    * from every order node"), never a driver-side list.
    */
  def reachFrom(edges: DataFrame, sources: DataFrame, maxHops: Int,
      undirected: Boolean = false): DataFrame = {
    val fwd = edges.select(col("from_id").cast("string"), col("to_id").cast("string"))
    val adj0 = if (undirected) {
      fwd.unionByName(fwd.select(col("to_id").as("from_id"), col("from_id").as("to_id")))
    } else fwd
    val adj = adj0.dropDuplicates("from_id", "to_id")
      .repartition(col("from_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // `visited` is only ever a union of per-hop checkpointed frontiers, so
    // it needs no checkpoint of its own (the union plan stays ≤ maxHops
    // branches deep) — one fewer eager job per hop.
    var visited = sources.select(col("id").cast("string"))
      .distinct().withColumn("distance", lit(0))
      .localCheckpoint(eager = true)
    var frontier = visited
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      val next = frontier.join(adj, frontier("id") === adj("from_id"))
        .select(adj("to_id").as("id"))
        .distinct()
        .join(visited.select(col("id").as("vid")), col("id") === col("vid"), "left_anti")
        .withColumn("distance", lit(hop))
        .localCheckpoint(eager = true)
      visited = visited.unionByName(next)
      frontier = next
    }
    adj.unpersist(blocking = false)
    visited
  }

  /** Shortest-path length from `from` to `to`, depth ≤ maxDepth
    * (graph_loader.go:402-433: `WHERE to_id = ? ORDER BY depth LIMIT 1`).
    * None if unreachable within the bound.
    */
  def shortestPathLength(edges: DataFrame, from: String, to: String,
      maxDepth: Int = 10): Option[Int] = {
    val r = reach(edges, Seq(from), maxDepth, undirected = false)
      .filter(col("id") === to)
      .agg(min("distance"))
      .collect()(0)
    if (r.isNullAt(0)) None else Some(r.getInt(0))
  }

  /** k-hop undirected neighborhood with min distance per node
    * (graph_loader.go:435-464: `(from→to) ∪ (to→from)`, DISTINCT, ORDER BY
    * distance). Excludes the start node itself only if the reference does —
    * it includes it at distance 0; we keep that.
    */
  def neighborhood(edges: DataFrame, id: String, k: Int): DataFrame =
    reach(edges, Seq(id), k, undirected = true)
      .orderBy(col("distance"), col("id"))

  /** 1-hop dependencies: outgoing edges joined to the vertex table
    * (graph_loader.go:315-328). `vertices` must carry an `id` column.
    */
  def dependencies(edges: DataFrame, vertices: DataFrame, fromId: String): DataFrame =
    edges.filter(col("from_id") === fromId)
      .join(vertices, edges("to_id") === vertices("id"))

  /** 1-hop dependents: mirror of [[dependencies]] (graph_loader.go:339-351). */
  def dependents(edges: DataFrame, vertices: DataFrame, toId: String): DataFrame =
    edges.filter(col("to_id") === toId)
      .join(vertices, edges("from_id") === vertices("id"))
}
