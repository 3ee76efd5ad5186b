package graft

import org.apache.spark.sql.functions._

/** Pins the session-hygiene contract the bench and the query server rely
  * on: `Hygiene.release` must actually drop localCheckpoint/persist
  * blocks (they are invisible to `spark.catalog.clearCache()` alone,
  * which only covers the cache manager's datasets).
  */
class HygieneSpec extends SparkSpec {

  test("release drops checkpoint blocks and cached datasets") {
    import spark.implicits._
    val sc = spark.sparkContext
    Hygiene.release(spark) // start from a clean slate

    val ckpt = (1 to 1000).toDF("x").localCheckpoint(true)
    assert(ckpt.count() == 1000)
    val cached = (1 to 500).toDF("y").cache()
    assert(cached.count() == 500)
    val before = sc.getPersistentRDDs.keySet
    assert(before.nonEmpty)

    Hygiene.release(spark)
    // everything persisted at release time is gone (another suite may
    // have created new blocks since — only the captured set must vanish)
    val after = sc.getPersistentRDDs.keySet
    assert(before.intersect(after).isEmpty,
      s"still persisted: ${before.intersect(after)}")
  }

  test("release is safe to call repeatedly on an idle session") {
    Hygiene.release(spark)
    Hygiene.release(spark)
    // and the session still works afterwards
    import spark.implicits._
    assert(Seq(1, 2, 3).toDF("a").count() == 3)
  }
}
