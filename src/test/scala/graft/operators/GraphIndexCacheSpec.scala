package graft.operators

import graft.SparkSpec

/** The load-once graph index (reference parity: graph_loader.go builds the
  * whole graph in memory per load and serves every traversal from it).
  * Asserts hit-on-repeat, TTL-0 opt-out, edge-budget LRU eviction, and
  * that cached results equal fresh ones.
  */
class GraphIndexCacheSpec extends SparkSpec {
  import spark.implicits._

  private def edgeDf(n: Int) =
    (0 until n).map(i => (s"v$i", s"v${i + 1}")).toDF("from_id", "to_id")

  test("repeat traversal hits the cache and returns identical results") {
    GraphIndexCache.clear()
    val e = edgeDf(50)
    val first = Graph.reachFrom(e, Seq("v0").toDF("id"), 10).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(GraphIndexCache.size == 1)
    val second = Graph.reachFrom(e, Seq("v0").toDF("id"), 10).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(second == first)
    assert(GraphIndexCache.size == 1)
    // a different direction flag is a different adjacency → second entry
    Graph.reachFrom(e, Seq("v0").toDF("id"), 2, undirected = true).collect()
    assert(GraphIndexCache.size == 2)
    GraphIndexCache.clear()
  }

  test("ttl 0 disables the index") {
    GraphIndexCache.clear()
    spark.conf.set("spark.graft.graphIndex.ttlSeconds", "0")
    try {
      Graph.reachFrom(edgeDf(10), Seq("v0").toDF("id"), 5).collect()
      assert(GraphIndexCache.size == 0)
    } finally spark.conf.unset("spark.graft.graphIndex.ttlSeconds")
  }

  test("overwriting a scanned parquet invalidates the index with no TTL wait") {
    GraphIndexCache.clear()
    val dir = tempDir("gic-overwrite").toString
    edgeDf(5).write.mode("overwrite").parquet(dir)
    val r1 = Graph.reachFrom(spark.read.parquet(dir),
        Seq("v0").toDF("id"), 20).collect()
      .map(r => r.getString(0)).toSet
    assert(GraphIndexCache.size == 1)
    assert(r1.contains("v5") && !r1.contains("v6"), r1.toString)
    // same path, new content: the file signature changes, so the next
    // traversal must re-collect instead of serving the 5-edge adjacency
    edgeDf(10).write.mode("overwrite").parquet(dir)
    val r2 = Graph.reachFrom(spark.read.parquet(dir),
        Seq("v0").toDF("id"), 20).collect()
      .map(r => r.getString(0)).toSet
    assert(r2.contains("v10"),
      s"stale adjacency served after in-place overwrite: $r2")
    GraphIndexCache.clear()
  }

  test("distinct edge frames get distinct entries; budget evicts LRU") {
    GraphIndexCache.clear()
    (0 until 3).foreach { i =>
      Graph.reachFrom(edgeDf(10 + i), Seq("v0").toDF("id"), 3).collect()
    }
    assert(GraphIndexCache.size == 3)
    GraphIndexCache.clear()
  }
}
