package graft.catalog

import graft.SparkSpec
import graft.engine.QueryEngine

class SnapshotViewsSpec extends SparkSpec {
  import spark.implicits._

  test("register exposes current + versioned views; versions stay pinned") {
    val store = new SnapshotTableStore(tempDir("graft-views").toString)
    store.overwrite(Seq((1L, "a")).toDF("id", "v"), "t")
    store.overwrite(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), "t")
    val names = SnapshotViews.register(spark, store, "t")
    assert(names == Seq("t", "t_v1", "t_v2"))
    assert(spark.table("t").count() == 2)
    assert(spark.table("t_v1").as[(Long, String)].collect().toSet ==
      Set((1L, "a")))
    // a later commit does not move the registered current view until
    // re-registration (immutability contract)
    store.overwrite(Seq((9L, "z")).toDF("id", "v"), "t")
    assert(spark.table("t").count() == 2)
    val names2 = SnapshotViews.register(spark, store, "t")
    assert(names2.contains("t_v3") && spark.table("t").count() == 1)
  }

  test("the guarded engine queries snapshot views like any table") {
    val store = new SnapshotTableStore(tempDir("graft-views").toString)
    store.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "s")
    SnapshotViews.register(spark, store, "s", withVersions = false)
    val res = QueryEngine.execute(spark, "SELECT COUNT(*) AS n FROM s")
    assert(res.rows.head.getLong(0) == 2L)
    // guard still applies: a write statement against the view is rejected
    assert(QueryEngine.validate(spark, "DROP TABLE s").isLeft)
  }
}
