package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Driver-side cache of collected adjacency maps for the contracted BFS
  * endgame — the Spark analogue of corkscrew's load-once graph: the
  * reference materializes the whole graph in memory up front and serves
  * every traversal from it (internal/db/graph_loader.go builds node/edge
  * maps once per load), so repeated traversals never re-read the store.
  * Here the "load" is the endgame's gating collect; this cache keeps its
  * result so the second and later traversals over the same edge frame skip
  * straight to the in-memory walk.
  *
  * Keyed by the canonicalized optimized plan of the edge projection (plus
  * the direction flag, since undirected adjacency mirrors every edge).
  * Plan canonicalization is content-addressed for local relations (test
  * data) and path-addressed for file scans, so a rewritten parquet file at
  * the same path would hit stale — the TTL (default 60 s,
  * `spark.graft.graphIndex.ttlSeconds`, 0 disables) bounds that window the
  * same way the engine's QueryCache TTL does. Capacity is bounded by total
  * cached edges, LRU-evicted, so the cache can never outgrow the endgame's
  * own driver-memory envelope.
  */
object GraphIndexCache {
  type Adj = java.util.HashMap[String, java.util.ArrayList[String]]

  private case class Key(plan: LogicalPlan, undirected: Boolean)
  private case class Entry(adj: Adj, edges: Long, atNanos: Long)

  /** Total directed-edge budget across all entries (~8M edges ≈ the same
    * few-hundred-MB envelope as one endgame collect at its 4M-edge gate).
    */
  private val MaxTotalEdges = 8L * 1000 * 1000

  private val cache = new java.util.LinkedHashMap[Key, Entry](8, 0.75f, true)

  private def ttlNanos(spark: SparkSession): Long =
    spark.conf.get("spark.graft.graphIndex.ttlSeconds", "60").toLong * 1000L * 1000 * 1000

  def get(spark: SparkSession, plan: LogicalPlan, undirected: Boolean): Option[Adj] =
    cache.synchronized {
      val ttl = ttlNanos(spark)
      if (ttl <= 0) return None
      val e = cache.get(Key(plan, undirected))
      if (e == null) None
      else if (System.nanoTime() - e.atNanos > ttl) {
        cache.remove(Key(plan, undirected)); None
      } else Some(e.adj)
    }

  def put(spark: SparkSession, plan: LogicalPlan, undirected: Boolean,
      adj: Adj, edges: Long): Unit = cache.synchronized {
    if (ttlNanos(spark) <= 0) return
    cache.put(Key(plan, undirected), Entry(adj, edges, System.nanoTime()))
    var total = 0L
    val it = cache.values().iterator()
    while (it.hasNext) total += it.next().edges
    // LinkedHashMap in access order: iteration starts at the least
    // recently used entry, so evict from the front until under budget.
    // (entrySet iteration doesn't touch access order; get() would.)
    val entries = cache.entrySet().iterator()
    while (total > MaxTotalEdges && cache.size() > 1 && entries.hasNext) {
      total -= entries.next().getValue.edges
      entries.remove()
    }
  }

  def size: Int = cache.synchronized(cache.size())

  def clear(): Unit = cache.synchronized(cache.clear())
}
