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
  * the direction flag, since undirected adjacency mirrors every edge) AND
  * a modification-time signature of every file the plan scans. Plan
  * canonicalization alone is content-addressed for local relations (test
  * data) but only path-addressed for file scans (InMemoryFileIndex
  * equality is by root path), so a parquet overwritten in place would hit
  * stale within the TTL; the file signature — (path, mtime, length) per
  * scanned file, "gone" for deleted ones — closes that window: an
  * overwrite changes the signature (new part-file names and mtimes), the
  * lookup misses, and the traversal re-collects. The TTL (default 60 s,
  * `spark.graft.graphIndex.ttlSeconds`, 0 disables) remains the backstop
  * for sources the signature can't see. Capacity is bounded by total
  * cached edges, LRU-evicted, so the cache can never outgrow the
  * endgame's own driver-memory envelope.
  */
object GraphIndexCache {
  type Adj = java.util.HashMap[String, java.util.ArrayList[String]]

  private case class Key(plan: LogicalPlan, filesSig: String, undirected: Boolean)
  private case class Entry(adj: Adj, edges: Long, atNanos: Long)

  /** Total directed-edge budget across all entries (~8M edges ≈ the same
    * few-hundred-MB envelope as one endgame collect at its 4M-edge gate).
    */
  private val MaxTotalEdges = 8L * 1000 * 1000

  /** Per-file stat cap: beyond this, the signature hashes the sorted file
    * list instead of statting each file (overwrites still change part-file
    * names, so the name-list hash catches them; only a byte-identical
    * rename-preserving rewrite of >64 files would need the mtime probe,
    * and the TTL still bounds that).
    */
  private val MaxStatFiles = 64

  private val cache = new java.util.LinkedHashMap[Key, Entry](8, 0.75f, true)

  private def ttlNanos(spark: SparkSession): Long =
    spark.conf.get("spark.graft.graphIndex.ttlSeconds", "60").toLong * 1000L * 1000 * 1000

  /** (path, mtime, length) signature of the plan's file scans. The
    * endgame only engages for collectable graphs (≤ the edge gate), so
    * the file count here is small; the stats are one driver-side RPC
    * each, far cheaper than the collect they guard.
    */
  private def fileSignature(spark: SparkSession, plan: LogicalPlan): String = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    lazy val conf = spark.sessionState.newHadoopConf()
    plan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          val files = fs.location.inputFiles.sorted
          if (files.length <= MaxStatFiles)
            files.map { f =>
              val p = new org.apache.hadoop.fs.Path(f)
              try {
                val st = p.getFileSystem(conf).getFileStatus(p)
                s"$f@${st.getModificationTime}:${st.getLen}"
              } catch { case _: java.io.IOException => s"$f@gone" }
            }.mkString(",")
          else s"n=${files.length}:h=${files.mkString(",").hashCode}"
        case _ => "" // non-file relation: the plan key carries its content
      }
    }.mkString(";")
  }

  def get(spark: SparkSession, plan: LogicalPlan, undirected: Boolean): Option[Adj] =
    cache.synchronized {
      val ttl = ttlNanos(spark)
      if (ttl <= 0) return None
      val key = Key(plan, fileSignature(spark, plan), undirected)
      val e = cache.get(key)
      if (e == null) None
      else if (System.nanoTime() - e.atNanos > ttl) {
        cache.remove(key); None
      } else Some(e.adj)
    }

  def put(spark: SparkSession, plan: LogicalPlan, undirected: Boolean,
      adj: Adj, edges: Long): Unit = cache.synchronized {
    if (ttlNanos(spark) <= 0) return
    cache.put(Key(plan, fileSignature(spark, plan), undirected),
      Entry(adj, edges, System.nanoTime()))
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
