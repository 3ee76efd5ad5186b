package graft.catalog

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.operators.Changes

class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def freshStore() = {
    val dir = Files.createTempDirectory("graft-snap").toString
    (dir, new SnapshotTableStore(dir))
  }

  test("overwrite commits versions; old snapshots stay time-travel readable") {
    val (_, store) = freshStore()
    store.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "t")
    store.overwrite(Seq((3L, "c")).toDF("id", "v"), "t")
    assert(store.versions("t") == Seq(1, 2))
    assert(store.currentVersion("t").contains(2))
    assert(store.read(spark, "t").as[(Long, String)].collect().toSet ==
      Set((3L, "c")))
    assert(store.readVersion(spark, "t", 1).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
  }

  test("append writes only the new rows — prior data dirs are untouched") {
    val (dir, store) = freshStore()
    store.overwrite(Seq((1L, "a")).toDF("id", "v"), "t")
    val d1 = Paths.get(dir, "t", "data", "d00001")
    def listing() = Files.walk(d1).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
      .toList.sortBy(_._1)
    val before = listing()
    store.append(Seq((2L, "b")).toDF("id", "v"), "t")
    assert(listing() == before, "append rewrote version-1 data files")
    assert(store.read(spark, "t").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    // the v2 manifest carries d00001 forward by name and adds d00002
    val m2 = new String(Files.readAllBytes(
      Paths.get(dir, "t", "_versions", "v00002.manifest"))).trim
    assert(m2.split("\n").toSeq == Seq("d00001", "d00002"), m2)
  }

  test("a half-commit (manifest written, pointer not swapped) is invisible") {
    val (dir, store) = freshStore()
    store.overwrite(Seq((1L, "a")).toDF("id", "v"), "t")
    // simulate a writer that crashed after the data+manifest writes
    Seq((9L, "torn")).toDF("id", "v").write
      .parquet(Paths.get(dir, "t", "data", "d00002").toString)
    Files.write(Paths.get(dir, "t", "_versions", "v00002.manifest"),
      "d00002".getBytes)
    assert(store.currentVersion("t").contains(1))
    assert(store.versions("t") == Seq(1))
    assert(store.read(spark, "t").as[(Long, String)].collect().toSet ==
      Set((1L, "a")))
  }

  test("upsertLoad merges first-write-wins and reads+writes the same table safely") {
    val (_, store) = freshStore()
    val v1 = store.upsertLoad(spark, "resources",
      Seq(("r1", "orig", ts("2024-01-01 00:00:00")))
        .toDF("id", "name", "scanned_at"))
    assert(v1 == 1)
    val v2 = store.upsertLoad(spark, "resources",
      Seq(("r1", "rescan", ts("2024-02-01 00:00:00")),
          ("r2", "fresh", ts("2024-02-01 00:00:00")))
        .toDF("id", "name", "scanned_at"))
    assert(v2 == 2)
    val now = store.read(spark, "resources")
      .select("id", "name").as[(String, String)].collect().toMap
    assert(now == Map("r1" -> "orig", "r2" -> "fresh"))
    // time travel back to the first load
    assert(store.readVersion(spark, "resources", 1)
      .select("id").as[String].collect().toSeq == Seq("r1"))
  }

  test("E13 change history reads the store like any frame") {
    val (_, store) = freshStore()
    store.overwrite(Seq(
      ("e1", "r1", ts("2024-01-01 00:00:00")),
      ("e2", "r1", ts("2024-01-02 00:00:00")),
      ("e3", "r2", ts("2024-01-03 00:00:00")))
      .toDF("event_id", "resource_id", "ts"), "events")
    val h = Changes.history(store.read(spark, "events"), "resource_id", "r1")
      .select("event_id").as[String].collect().toSeq
    assert(h == Seq("e2", "e1"))
  }

  test("vacuum drops only dirs unreachable from kept versions") {
    val (dir, store) = freshStore()
    store.overwrite(Seq((1L, "a")).toDF("id", "v"), "t") // v1: d1
    store.append(Seq((2L, "b")).toDF("id", "v"), "t")    // v2: d1,d2
    store.overwrite(Seq((3L, "c")).toDF("id", "v"), "t") // v3: d3
    store.vacuum("t", keepFrom = 2)
    // v2 still references d1, so d1 must survive even though v1 is gone
    assert(store.versions("t") == Seq(2, 3))
    assert(store.readVersion(spark, "t", 2).count() == 2)
    assert(store.read(spark, "t").count() == 1)
    assert(!Files.exists(Paths.get(dir, "t", "_versions", "v00001.manifest")))
  }
}
