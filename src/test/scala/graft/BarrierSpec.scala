package graft

import graft.Barrier.BarrierOps
import org.apache.spark.storage.StorageLevel

/** Materialization-barrier policy: local (fast, fragile) vs reliable
  * (recompute- or durability-backed) — the cluster-robustness knob the
  * round-10 sf1eq block-loss failure motivated.
  */
class BarrierSpec extends SparkSpec {
  import spark.implicits._

  private def withPolicy[A](p: String)(body: => A): A = {
    spark.conf.set(Barrier.ConfKey, p)
    try body finally spark.conf.unset(Barrier.ConfKey)
  }

  /** Persistent-RDD ids registered by `body` (the barrier's blocks). */
  private def newPersistedIds(body: => Unit): Set[Int] = {
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    body
    spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
  }

  test("reliable without a checkpoint dir: DISK_ONLY persist that " +
      "RECOMPUTES after forced block loss") {
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "precondition: this test needs no checkpoint dir configured yet")
    withPolicy("reliable") {
      var df: org.apache.spark.sql.DataFrame = null
      val ids = newPersistedIds {
        df = spark.range(0, 1000, 1, 4).toDF("x")
          .selectExpr("x", "x * 2 AS y").barrier()
        assert(df.count() == 1000)
      }
      assert(ids.nonEmpty, "reliable barrier registered no persisted RDD")
      ids.foreach { id =>
        assert(spark.sparkContext.getPersistentRDDs(id)
          .getStorageLevel == StorageLevel.DISK_ONLY)
        // the sf1eq failure shape: external pressure evicts the blocks
        org.apache.spark.SparkEnv.get.blockManager.master.removeRdd(id, true)
      }
      // lineage was KEPT, so the job recomputes instead of dying
      assert(df.agg(org.apache.spark.sql.functions.sum("y")).head().getLong(0)
        == 999L * 1000L)
      df.unpersist(true)
    }
  }

  test("local (default) barrier dies on block loss — the risk the " +
      "reliable policy closes") {
    var df: org.apache.spark.sql.DataFrame = null
    val ids = newPersistedIds {
      df = spark.range(0, 1000, 1, 4).toDF("x").barrier()
      assert(df.count() == 1000)
    }
    // localCheckpoint registers its blocks as a persistent RDD too
    assert(ids.nonEmpty)
    ids.foreach(id =>
      org.apache.spark.SparkEnv.get.blockManager.master.removeRdd(id, true))
    intercept[Exception] { df.count() }
  }

  test("reliable with a checkpoint dir: durable checkpoint files, " +
      "truncated lineage, exact result") {
    val dir = tempDir("barrier-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    withPolicy("reliable") {
      val df = spark.range(0, 500, 1, 4).toDF("x").barrier()
      assert(df.count() == 500)
      // files actually landed in durable storage
      val files = java.nio.file.Files.walk(dir)
      val n = try files.filter(java.nio.file.Files.isRegularFile(_)).count()
      finally files.close()
      assert(n > 0, "no checkpoint files written")
      // lineage is truncated (plans as a scan of the checkpointed RDD),
      // so per-round plan growth stays O(1) exactly like localCheckpoint
      assert(df.queryExecution.optimizedPlan
        .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])
    }
  }

  test("policy default is local (on a local master) and " +
      "barrier(eager = false) stays lazy") {
    assert(spark.sparkContext.isLocal)
    assert(Barrier.policy(spark.range(1).toDF("x")) == "local")
    // lazy form: no job runs at cut time — constructing it must be cheap
    val df = spark.range(0, 10).toDF("x").barrier(eager = false)
    assert(df.collect().length == 10)
  }

  test("resolution matrix: conf > env > master-based default " +
      "(reliable off-localhost)") {
    // master-based default: safe-by-default on a cluster
    assert(Barrier.resolve(None, None, isLocal = true) == "local")
    assert(Barrier.resolve(None, None, isLocal = false) == "reliable")
    // env fallback beats the default on either master
    assert(Barrier.resolve(None, Some("reliable"), isLocal = true) == "reliable")
    assert(Barrier.resolve(None, Some("local"), isLocal = false) == "local")
    // explicit session conf always wins
    assert(Barrier.resolve(Some("local"), Some("reliable"), isLocal = false) == "local")
    assert(Barrier.resolve(Some("reliable"), None, isLocal = true) == "reliable")
    // and the live path honors an explicit conf on this local master
    withPolicy("reliable") {
      assert(Barrier.policy(spark.range(1).toDF("x")) == "reliable")
    }
  }
}
