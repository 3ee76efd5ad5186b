package graft.catalog

import graft.SparkSpec
import graft.operators.IncrementalAgg
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def l(v: Long): java.lang.Long = java.lang.Long.valueOf(v)
  private val nl: java.lang.Long = null

  test("diff classifies insert / delete / update, including NULL transitions") {
    val o = Seq((1L, "a", l(10L)), (2L, "b", l(20L)), (3L, "c", nl),
      (4L, "d", l(40L))).toDF("id", "k", "x")
    val n = Seq((2L, "b", l(20L)), (3L, "c", l(30L)), (4L, "d", nl),
      (5L, "e", l(50L))).toDF("id", "k", "x")
    val d = SnapshotDiff.diff(o, n, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(1L -> "delete", 3L -> "update", 4L -> "update",
      5L -> "insert"))
    // id=2 is identical → absent from the feed
  }

  test("before/after images ride on every change row") {
    val o = Seq((1L, "a", 10L)).toDF("id", "k", "x")
    val n = Seq((1L, "b", 11L)).toDF("id", "k", "x")
    val r = SnapshotDiff.diff(o, n, "id").head
    assert(r.getAs[String]("k") == "b" && r.getAs[String]("k_prev") == "a")
    assert(r.getAs[Long]("x") == 11L && r.getAs[Long]("x_prev") == 10L)
  }

  test("changesBetween reads committed store versions") {
    val store = new SnapshotTableStore(tempDir("graft-diff").toString)
    store.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "t")
    store.overwrite(Seq((2L, "B"), (3L, "c")).toDF("id", "v"), "t")
    val d = SnapshotDiff.changesBetween(spark, store, "t", 1, 2, "id")
      .select("id", "change_type").as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "delete", 2L -> "update", 3L -> "insert"))
  }

  test("applyChanges equals directRollup, including group-key moves and emptied groups") {
    // v1: groups a(2 rows), b(1), c(1); v2: a loses one to b (key move),
    // c's only row is deleted (group must vanish), d appears
    val v1 = Seq((1L, "a", 1.5), (2L, "a", 2.5), (3L, "b", 3.0),
      (4L, "c", 4.0)).toDF("id", "g", "v")
    val v2 = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "b", 3.25),
      (5L, "d", 5.0)).toDF("id", "g", "v")
    val changes = SnapshotDiff.diff(v1, v2, "id")
    val prev = IncrementalAgg.directRollup(v1, "g", "v")
    val maintained = IncrementalAgg.applyChanges(prev, changes, "g", "v")
      .as[(String, Long, Long, java.math.BigDecimal)].collect().toSet
    val direct = IncrementalAgg.directRollup(v2, "g", "v")
      .as[(String, Long, Long, java.math.BigDecimal)].collect().toSet
    assert(maintained == direct)
    assert(!maintained.exists(_._1 == "c"), "emptied group must be dropped")
    assert(maintained.find(_._1 == "b").get._2 == 2L)
  }

  test("retracting a group's last non-null value yields NULL, not 0 (SQL SUM semantics)") {
    val nd: java.lang.Double = null
    val v1 = Seq((1L, "a", java.lang.Double.valueOf(5.0)), (2L, "a", nd))
      .toDF("id", "g", "v")
    // update nulls out id=1's value; id=2 stays null → group 'a' has
    // rows but NO non-null values in v2
    val v2 = Seq((1L, "a", nd), (2L, "a", nd)).toDF("id", "g", "v")
    val changes = SnapshotDiff.diff(v1, v2, "id")
    val prev = IncrementalAgg.directRollup(v1, "g", "v")
    val m = IncrementalAgg.applyChanges(prev, changes, "g", "v").head
    val d = IncrementalAgg.directRollup(v2, "g", "v").head
    assert(m.getAs[Any]("sum_value") == null, "maintained sum must be NULL")
    assert(d.getAs[Any]("sum_value") == null)
    assert(m.getAs[Long]("n") == 2L && m.getAs[Long]("n_vals") == 0L)
  }

  test("an empty feed maintains the rollup unchanged") {
    val v1 = Seq((1L, "a", 1.0)).toDF("id", "g", "v")
    val changes = SnapshotDiff.diff(v1, v1, "id")
    assert(changes.isEmpty)
    val prev = IncrementalAgg.directRollup(v1, "g", "v")
    val maintained = IncrementalAgg.applyChanges(prev, changes, "g", "v")
    assert(maintained.as[(String, Long, Long, java.math.BigDecimal)].collect().toSet ==
      prev.as[(String, Long, Long, java.math.BigDecimal)].collect().toSet)
  }

  test("diff rejects mismatched schemas") {
    val o = Seq((1L, "a")).toDF("id", "k")
    val n = Seq((1L, "a")).toDF("id", "other")
    assertThrows[IllegalArgumentException](SnapshotDiff.diff(o, n, "id"))
  }
}
