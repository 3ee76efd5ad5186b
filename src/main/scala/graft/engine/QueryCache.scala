package graft.engine

import org.apache.spark.sql.DataFrame
import java.util.concurrent.ConcurrentHashMap

/** TTL result cache keyed by normalized SQL (reference E20:
  * azure-provider/resource_graph.go:64,174-187 — 15-minute KQL result
  * cache; change cache change_types.go:315-329). Caches the *DataFrame*
  * (plan + persisted data), not collected rows — re-use stays distributed.
  */
final class QueryCache(ttlMillis: Long = 15 * 60 * 1000,
    clock: () => Long = System.currentTimeMillis) {

  private final case class Entry(df: DataFrame, at: Long)
  private val entries = new ConcurrentHashMap[String, Entry]()

  /** Normalize SQL for the cache key: collapse whitespace, lowercase
    * keywords-insensitively (simple canonicalization — the reference keys
    * on the raw KQL string; this is strictly better).
    */
  def normalize(sql: String): String =
    sql.trim.replaceAll("\\s+", " ").toLowerCase

  def get(sql: String): Option[DataFrame] = {
    val k = normalize(sql)
    Option(entries.get(k)).flatMap { e =>
      if (clock() - e.at <= ttlMillis) Some(e.df)
      else { invalidateEntry(k, e); None }
    }
  }

  def put(sql: String, df: DataFrame): DataFrame = {
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val prev = entries.put(normalize(sql), Entry(cached, clock()))
    // Unpersist a displaced entry so repeated puts don't leak blocks.
    if (prev != null && (prev.df ne cached)) prev.df.unpersist(blocking = false)
    cached
  }

  def getOrElseUpdate(sql: String)(compute: => DataFrame): DataFrame =
    get(sql).getOrElse(put(sql, compute))

  private def invalidateEntry(k: String, e: Entry): Unit = {
    entries.remove(k, e)
    e.df.unpersist(blocking = false)
  }

  def invalidateAll(): Unit = {
    entries.forEach((k, e) => invalidateEntry(k, e))
  }

  def size: Int = entries.size
}
