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
    val dir = tempDir("graft-snap").toString
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

  private def manifest(dir: String, table: String, v: Int): Seq[String] =
    new String(Files.readAllBytes(
      Paths.get(dir, table, "_versions", f"v$v%05d.manifest"))).trim
      .split("\n").toSeq.filterNot(_.startsWith("#")) // data dirs only

  test("append writes only the new rows — prior data dirs are untouched") {
    val (dir, store) = freshStore()
    store.overwrite(Seq((1L, "a")).toDF("id", "v"), "t")
    val d1 = Paths.get(dir, "t", "data", manifest(dir, "t", 1).head)
    def listing() = Files.walk(d1).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
      .toList.sortBy(_._1)
    val before = listing()
    store.append(Seq((2L, "b")).toDF("id", "v"), "t")
    assert(listing() == before, "append rewrote version-1 data files")
    assert(store.read(spark, "t").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    // the v2 manifest carries version 1's dir forward by NAME and adds one
    val m2 = manifest(dir, "t", 2)
    assert(m2.size == 2 && m2.head == manifest(dir, "t", 1).head
      && m2(1).startsWith("d00002-"), m2)
  }

  test("data dirs are writer-unique: racing commits never share a directory") {
    val (dir, store) = freshStore()
    store.overwrite(Seq((1L, "a")).toDF("id", "v"), "t")
    store.overwrite(Seq((2L, "b")).toDF("id", "v"), "t")
    val names = Seq(1, 2).map(manifest(dir, "t", _).head)
    assert(names.distinct.size == 2, names)
    // the random token is what disambiguates, not just the version prefix
    assert(names.forall(_.matches("d\\d{5}-[0-9a-f-]{8}")), names)
  }

  test("crash after the manifest claim: version is committed, pointer rolls forward") {
    val (dir, store) = freshStore()
    store.overwrite(Seq((1L, "a")).toDF("id", "v"), "t")
    // simulate a writer that died between the manifest claim (the commit
    // point: data + manifest both complete) and the pointer move
    Seq((9L, "late")).toDF("id", "v").write
      .parquet(Paths.get(dir, "t", "data", "d00002-deadbeef").toString)
    Files.write(Paths.get(dir, "t", "_versions", "v00002.manifest"),
      "d00002-deadbeef".getBytes)
    assert(store.currentVersion("t").contains(2))
    assert(store.versions("t") == Seq(1, 2))
    assert(store.read(spark, "t").as[(Long, String)].collect().toSet ==
      Set((9L, "late")))
    // REGRESSION (round-6 ADVICE): the next commit must claim v3, not
    // collide with the orphan v2 manifest forever
    store.overwrite(Seq((3L, "c")).toDF("id", "v"), "t")
    assert(store.currentVersion("t").contains(3))
    assert(store.read(spark, "t").as[(Long, String)].collect().toSet ==
      Set((3L, "c")))
  }

  test("crash before the manifest claim: orphan data dir is invisible and GC-able") {
    val (dir, store) = freshStore()
    store.overwrite(Seq((1L, "a")).toDF("id", "v"), "t")
    val orphan = Paths.get(dir, "t", "data", "d00002-0badc0de")
    Seq((9L, "torn")).toDF("id", "v").write.parquet(orphan.toString)
    assert(store.currentVersion("t").contains(1))
    assert(store.read(spark, "t").as[(Long, String)].collect().toSet ==
      Set((1L, "a")))
    store.overwrite(Seq((2L, "b")).toDF("id", "v"), "t") // lands at v2, no clash
    assert(store.currentVersion("t").contains(2))
    store.vacuumOrphans("t", olderThanMillis = -1000) // everything is "old"
    assert(!Files.exists(orphan), "orphan dir survived vacuumOrphans")
    // referenced dirs are never swept, however old
    assert(store.read(spark, "t").count() == 1)
    assert(store.readVersion(spark, "t", 1).count() == 1)
  }

  test("upsertLoad merges against a claimed-but-unpointed version, not the stale pointer") {
    val (dir, store) = freshStore()
    store.upsertLoad(spark, "r",
      Seq(("r1", "orig", ts("2024-01-01 00:00:00"))).toDF("id", "name", "scanned_at"))
    // simulate a concurrent writer that claimed v2 (content: r1+rX)
    val d2 = Paths.get(dir, "r", "data", "d00002-cafebabe")
    Seq(("r1", "orig", ts("2024-01-01 00:00:00")),
        ("rX", "racer", ts("2024-01-15 00:00:00")))
      .toDF("id", "name", "scanned_at").write.parquet(d2.toString)
    Files.write(Paths.get(dir, "r", "_versions", "v00002.manifest"),
      "d00002-cafebabe".getBytes)
    // our upsert must land at v3 and keep the racer's row in the merge base
    val v = store.upsertLoad(spark, "r",
      Seq(("r2", "fresh", ts("2024-02-01 00:00:00"))).toDF("id", "name", "scanned_at"))
    assert(v == 3)
    assert(store.read(spark, "r").select("id").as[String].collect().toSet ==
      Set("r1", "rX", "r2"))
  }

  test("two concurrent upsertLoads both commit; neither's rows are lost") {
    val (_, store) = freshStore()
    store.upsertLoad(spark, "r",
      Seq(("r0", "base", ts("2024-01-01 00:00:00"))).toDF("id", "name", "scanned_at"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = Seq("rA" -> "a", "rB" -> "b").map { case (id, n) =>
      Future(store.upsertLoad(spark, "r",
        Seq((id, n, ts("2024-02-01 00:00:00"))).toDF("id", "name", "scanned_at")))
    }
    val vs = Await.result(Future.sequence(fs), 120.seconds)
    // one writer gets v2, the other loses the claim race (or serializes)
    // and lands at v3 — and the final state contains BOTH writers' rows
    assert(vs.toSet == Set(2, 3), vs)
    assert(store.currentVersion("r").contains(3))
    assert(store.read(spark, "r").select("id").as[String].collect().toSet ==
      Set("r0", "rA", "rB"))
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

  test("compact bin-packs many small commits into one identical version") {
    val (dir, store) = freshStore()
    (1 to 5).foreach(i =>
      if (i == 1) store.overwrite(Seq((i.toLong, s"v$i")).toDF("id", "v"), "t")
      else store.append(Seq((i.toLong, s"v$i")).toDF("id", "v"), "t"))
    def parquetFiles(v: Int): Int = manifest(dir, "t", v)
      .map(d => Files.walk(Paths.get(dir, "t", "data", d)).iterator().asScala
        .count(p => p.toString.endsWith(".parquet"))).sum
    val before = store.read(spark, "t").as[(Long, String)].collect().toSet
    val nBefore = parquetFiles(5)
    assert(nBefore >= 5, s"expected >=5 small files, saw $nBefore")
    // huge target => everything packs into a single file
    val v = store.compact(spark, "t", targetFileBytes = 1L << 30)
    assert(v.contains(6))
    assert(store.read(spark, "t").as[(Long, String)].collect().toSet == before,
      "compaction changed table content")
    assert(parquetFiles(6) == 1, "compaction did not bin-pack to one file")
    // prior version untouched and still time-travel readable
    assert(store.readVersion(spark, "t", 5)
      .as[(Long, String)].collect().toSet == before)
    // the manifest references exactly one fresh dir
    assert(manifest(dir, "t", 6).size == 1)
  }

  test("appendIdempotent commits a tag once; retries are no-ops") {
    val (_, store) = freshStore()
    assert(store.appendIdempotent(Seq((1L, "a")).toDF("id", "v"), "t", "b0"))
    assert(!store.appendIdempotent(Seq((1L, "a")).toDF("id", "v"), "t", "b0"),
      "re-delivered batch must not commit again")
    assert(store.appendIdempotent(Seq((2L, "b")).toDF("id", "v"), "t", "b1"))
    assert(!store.appendIdempotent(Seq((2L, "b")).toDF("id", "v"), "t", "b1"))
    assert(store.versions("t") == Seq(1, 2))
    assert(store.read(spark, "t").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    // out-of-order redelivery of an OLD batch after newer commits: still a no-op
    assert(!store.appendIdempotent(Seq((1L, "a")).toDF("id", "v"), "t", "b0"))
    assert(store.versions("t") == Seq(1, 2))
  }

  test("appendIdempotent survives compaction: tags found in older manifests") {
    val (_, store) = freshStore()
    assert(store.appendIdempotent(Seq((1L, "a")).toDF("id", "v"), "t", "b0"))
    assert(store.appendIdempotent(Seq((2L, "b")).toDF("id", "v"), "t", "b1"))
    // compaction rewrites the manifest WITHOUT the -t markers...
    assert(store.compact(spark, "t", targetFileBytes = 1L << 30).contains(3))
    // ...but a re-delivered batch must STILL be a no-op (older manifests
    // retain the tags until vacuumed)
    assert(!store.appendIdempotent(Seq((1L, "a")).toDF("id", "v"), "t", "b0"),
      "compaction erased exactly-once history")
    assert(!store.appendIdempotent(Seq((2L, "b")).toDF("id", "v"), "t", "b1"))
    assert(store.read(spark, "t").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
  }

  test("SnapshotSink: rerunning a stream from a fresh checkpoint adds nothing") {
    val (dir, store) = freshStore()
    val src = tempDir("graft-sink-src")
    Seq((1L, "x"), (2L, "y")).toDF("id", "v")
      .coalesce(1).write.parquet(s"$src/part1")
    val sch = spark.read.parquet(s"$src/part1").schema
    def runOnce(ck: String): Unit = {
      val stream = spark.readStream.schema(sch).parquet(s"$src/part1")
      val q = graft.streaming.SnapshotSink.appendStream(stream, store, "t",
        s"$dir/$ck", org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
    }
    runOnce("ck1")
    runOnce("ck2") // lost checkpoint: same batch, same id, must be a no-op
    assert(store.versions("t").size == 1, store.versions("t"))
    assert(store.read(spark, "t").as[(Long, String)].collect().toSet ==
      Set((1L, "x"), (2L, "y")))
  }

  test("compact never drops a concurrent append's rows") {
    // The non-clobbering invariant: whatever interleaving the scheduler
    // produces, every appended row must survive — a compaction that loses
    // its claim race returns None and changes nothing; one that wins has
    // committed a version whose content includes every prior commit.
    val (dir, store) = freshStore()
    store.overwrite(Seq((0L, "seed")).toDF("id", "v"), "t")
    val racer = new SnapshotTableStore(dir)
    val appender = new Thread(() =>
      (1 to 4).foreach(i =>
        racer.append(Seq((i.toLong, s"r$i")).toDF("id", "v"), "t")))
    appender.start()
    val outcomes = (1 to 3).map(_ =>
      store.compact(spark, "t", targetFileBytes = 1L << 30))
    appender.join()
    val finalRows = store.read(spark, "t").select("id").as[Long].collect().toSet
    assert((0L to 4L).toSet.subsetOf(finalRows),
      s"lost rows: ${(0L to 4L).toSet -- finalRows}; compact outcomes $outcomes")
  }

  test("schema evolution: appended column reads as NULL in old files") {
    val (_, store) = freshStore()
    store.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "t")
    store.append(Seq((3L, "c", 9L)).toDF("id", "v", "extra"), "t")
    // v1 keeps its original width via its own logged schema
    assert(store.readVersion(spark, "t", 1).columns.toSeq == Seq("id", "v"))
    assert(store.manifestSchema("t", 1).get.fieldNames.toSeq == Seq("id", "v"))
    // v2: evolved log schema, old rows NULL-filled in the new column
    val v2 = store.readVersion(spark, "t", 2)
    assert(v2.columns.toSeq == Seq("id", "v", "extra"))
    val got = v2.select("id", "extra").as[(Long, Option[Long])]
      .collect().toMap
    assert(got == Map(1L -> None, 2L -> None, 3L -> Some(9L)), got)
  }

  test("schema evolution: same-name type change is rejected loudly") {
    val (_, store) = freshStore()
    store.overwrite(Seq((1L, 5L)).toDF("id", "v"), "t")
    val ex = intercept[IllegalArgumentException] {
      store.append(Seq((2L, "str")).toDF("id", "v"), "t")
    }
    assert(ex.getMessage.contains("type mismatch"), ex.getMessage)
  }

  test("schema evolution: compact and upsertLoad carry the log schema") {
    val (_, store) = freshStore()
    store.overwrite(Seq((1L, "a")).toDF("id", "v"), "t")
    store.append(Seq((2L, "b", 7L)).toDF("id", "v", "extra"), "t")
    store.compact(spark, "t", targetFileBytes = 1L << 30)
    val v3 = store.readVersion(spark, "t", 3)
    assert(v3.columns.toSeq == Seq("id", "v", "extra"))
    assert(v3.select("id", "extra").as[(Long, Option[Long])].collect().toMap
      == Map(1L -> None, 2L -> Some(7L)))
    // upsertLoad logs the merged frame's schema (upsert semantics need
    // the resource-shape scanned_at ordering column)
    val (_, us) = freshStore()
    us.overwrite(Seq((1L, "a", ts("2026-01-01 00:00:00")))
      .toDF("id", "v", "scanned_at"), "r")
    us.upsertLoad(spark, "r",
      Seq((9L, "z", ts("2026-01-02 00:00:00")))
        .toDF("id", "v", "scanned_at"))
    assert(us.manifestSchema("r", 2).get.fieldNames.toSeq ==
      Seq("id", "v", "scanned_at"))
  }

  test("deleteWhere tombstones rows without rewriting any content file") {
    import org.apache.spark.sql.functions.col
    val (_, store) = freshStore()
    store.overwrite((1L to 20L).map(i => (i, s"v$i"))
      .toDF("id", "v").repartition(3), "t")
    val v2 = store.deleteWhere(spark, "t", col("id") % 5 === 0)
    assert(v2 == 2 && store.deletionVectors("t", 2) == 1)
    // merge-on-read: content dirs are byte-identical to v1's
    assert(store.versionDataDirs("t", 2) == store.versionDataDirs("t", 1))
    assert(store.read(spark, "t").select("id").as[Long].collect().toSet ==
      (1L to 20L).filter(_ % 5 != 0).toSet)
    // time travel to v1 still sees the deleted rows
    assert(store.readVersion(spark, "t", 1).count() == 20)
  }

  test("appends carry deletion vectors forward; deleted rows stay deleted") {
    import org.apache.spark.sql.functions.col
    val (_, store) = freshStore()
    store.overwrite((1L to 10L).map(i => (i, "x")).toDF("id", "v"), "t")
    store.deleteWhere(spark, "t", col("id") <= 3)
    store.append(Seq((100L, "new")).toDF("id", "v"), "t")
    assert(store.deletionVectors("t", 3) == 1)
    assert(store.read(spark, "t").select("id").as[Long].collect().toSet ==
      ((4L to 10L).toSet + 100L))
    // idempotent tagged append keeps them too
    store.appendIdempotent(Seq((200L, "tag")).toDF("id", "v"), "t", "b1")
    assert(store.deletionVectors("t", 4) == 1)
    assert(!store.read(spark, "t").select("id").as[Long]
      .collect().toSet.contains(1L))
  }

  test("stacked deletes compose; compact materializes and retires vectors") {
    import org.apache.spark.sql.functions.col
    val (_, store) = freshStore()
    store.overwrite((1L to 12L).map(i => (i, "x")).toDF("id", "v"), "t")
    store.deleteWhere(spark, "t", col("id") % 2 === 0)
    store.deleteWhere(spark, "t", col("id") % 3 === 0) // overlaps id=6,12: no-op twice
    assert(store.deletionVectors("t", 3) == 2)
    val live = Set(1L, 5L, 7L, 11L)
    assert(store.read(spark, "t").select("id").as[Long].collect().toSet == live)
    val v4 = store.compact(spark, "t").get
    assert(store.deletionVectors("t", v4) == 0)
    assert(store.readVersion(spark, "t", v4).select("id").as[Long]
      .collect().toSet == live)
    // vacuum keeps DV dirs of retained versions, drops the retired chain
    store.vacuum("t", keepFrom = v4)
    assert(store.readVersion(spark, "t", v4).count() == 4)
  }

  test("cloneTo preserves live deletion vectors (relative tombstone paths)") {
    import org.apache.spark.sql.functions.col
    val (_, store) = freshStore()
    store.overwrite((1L to 20L).map(i => (i, "x"))
      .toDF("id", "v").repartition(3), "t")
    store.deleteWhere(spark, "t", col("id") % 5 === 0)
    val (_, target) = freshStore()
    val v = store.cloneTo(target, "t")
    assert(v == 2 && target.deletionVectors("t", 2) == 1)
    // the table root moved — tombstones must still match their files
    assert(target.read(spark, "t").select("id").as[Long].collect().toSet ==
      (1L to 20L).filterNot(_ % 5 == 0).toSet,
      "deleted rows resurrected in the clone")
    // time travel in the clone still sees the pre-delete content
    assert(target.readVersion(spark, "t", 1).count() == 20)
  }

  test("legacy absolute-path deletion vectors are still honored") {
    import org.apache.spark.sql.functions.col
    val (dir, store) = freshStore()
    store.overwrite((1L to 10L).map(i => (i, "x")).toDF("id", "v"), "t")
    val d1 = manifest(dir, "t", 1)
    // hand-write a vector in the pre-relative format (absolute URIs in a
    // `file_path` column) and reference it from a v2 manifest
    spark.read.parquet(Paths.get(dir, "t", "data", d1.head).toString)
      .filter(col("id") <= 3)
      .select(col("_metadata.file_path").as("file_path"),
        col("_metadata.row_index").as("row_index"))
      .write.parquet(Paths.get(dir, "t", "data", "dv00002-legacy").toString)
    Files.write(Paths.get(dir, "t", "_versions", "v00002.manifest"),
      (d1 :+ "#dv=dv00002-legacy").mkString("\n").getBytes)
    assert(store.read(spark, "t").select("id").as[Long].collect().toSet ==
      (4L to 10L).toSet)
  }

  test("mixed legacy + relative deletion vectors apply together") {
    import org.apache.spark.sql.functions.col
    val (dir, store) = freshStore()
    store.overwrite((1L to 10L).map(i => (i, "x")).toDF("id", "v"), "t")
    val d1 = manifest(dir, "t", 1)
    // a legacy-format vector (absolute file_path) from an older commit...
    spark.read.parquet(Paths.get(dir, "t", "data", d1.head).toString)
      .filter(col("id") <= 3)
      .select(col("_metadata.file_path").as("file_path"),
        col("_metadata.row_index").as("row_index"))
      .write.parquet(Paths.get(dir, "t", "data", "dv00002-legacy").toString)
    Files.write(Paths.get(dir, "t", "_versions", "v00002.manifest"),
      (d1 :+ "#dv=dv00002-legacy").mkString("\n").getBytes)
    // ...then a NEW deleteWhere writes a rel_path vector on top: the
    // version now references both formats at once, the state every
    // upgraded table enters. A single multi-dir read would resolve one
    // footer's schema and NULL out the other's key column — both delete
    // sets must stay live.
    store.deleteWhere(spark, "t", col("id") >= 9)
    assert(store.read(spark, "t").select("id").as[Long].collect().toSet ==
      (4L to 8L).toSet,
      "one deletion-vector format's tombstones were silently dropped")
  }

  test("deleteWhere racing compact: the delete is never lost") {
    import org.apache.spark.sql.functions.col
    val (dir, store) = freshStore()
    store.overwrite((1L to 40L).map(i => (i, "x"))
      .toDF("id", "v").repartition(4), "t")
    val racer = new SnapshotTableStore(dir)
    val compactor = new Thread(() =>
      (1 to 3).foreach { _ => racer.compact(spark, "t", 1L << 30); () })
    compactor.start()
    // if a compact claims first, the scanned files were RETIRED — the
    // stale vector would match nothing, so deleteWhere must recompute
    // against the rewritten version rather than re-aim the manifest
    store.deleteWhere(spark, "t", col("id") % 4 === 0)
    compactor.join()
    assert(store.read(spark, "t").select("id").as[Long].collect().toSet ==
      (1L to 40L).filterNot(_ % 4 == 0).toSet,
      "a racing compact silently swallowed the delete")
  }

  test("mergeInto rejects duplicate source keys loudly") {
    val (_, store) = freshStore()
    store.overwrite(Seq((1L, "a")).toDF("id", "v"), "t")
    val ex = intercept[IllegalArgumentException] {
      store.mergeInto(spark, "t",
        Seq((1L, "x"), (1L, "y")).toDF("id", "v"), "id")
    }
    assert(ex.getMessage.contains("at most one source match"), ex.getMessage)
    // target untouched by the failed merge
    assert(store.currentVersion("t").contains(1))
  }

  test("Scd2.history: runs, deletion closure, reinsert gap, current flag") {
    val (_, store) = freshStore()
    // v1: a=x, b=y, c=z ; v2: a=x2, b deleted, c=z ; v3: a=x2, b=y2 (re-
    // inserted), c=z
    store.overwrite(Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "attr"), "t")
    store.overwrite(Seq((1L, "x2"), (3L, "z")).toDF("id", "attr"), "t")
    store.overwrite(Seq((1L, "x2"), (2L, "y2"), (3L, "z")).toDF("id", "attr"), "t")
    val h = Scd2.history(spark, store, "t", "id", Seq("attr"))
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(h == Set(
      (1L, "x", 1L, Some(2L), false),
      (1L, "x2", 2L, None, true),
      (2L, "y", 1L, Some(2L), false),   // deletion closes the run
      (2L, "y2", 3L, None, true),       // gap reinsert opens a new run
      (3L, "z", 1L, None, true)         // unchanged: one open run
    ))
  }

  test("mergeInto: update + delete + insert in one statement") {
    import org.apache.spark.sql.functions.col
    val (_, store) = freshStore()
    store.overwrite(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "v", "n"), "t")
    val source = Seq(
      (2L, "b2", 200L),              // matched -> update (source wins)
      (3L, "c", 30L),                // matched + deleteWhen -> delete
      (9L, "new", 90L)               // not matched -> insert
    ).toDF("id", "v", "n")
    val v2 = store.mergeInto(spark, "t", source, "id",
      deleteWhen = Some(col("id") === 3L))
    assert(v2 == 2)
    assert(store.read(spark, "t").as[(Long, String, Long)].collect().toSet ==
      Set((1L, "a", 10L), (2L, "b2", 200L), (9L, "new", 90L)))
    // v1 still time-travels
    assert(store.readVersion(spark, "t", 1).count() == 3)
    // a NULL source value UPDATES to NULL (no value-coalesce resurrection)
    val s2 = Seq((1L, null.asInstanceOf[String], 11L)).toDF("id", "v", "n")
    store.mergeInto(spark, "t", s2, "id")
    val row1 = store.read(spark, "t").filter(col("id") === 1L)
      .select("v", "n").collect().head
    assert(row1.isNullAt(0) && row1.getLong(1) == 11L)
    // schema mismatch fails loudly
    intercept[IllegalArgumentException] {
      store.mergeInto(spark, "t", Seq((1L, "x")).toDF("id", "v"), "id")
    }
  }
}
