package graft.catalog

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() = {
    val dir = tempDir("graft-skip").toString
    (dir, new SnapshotTableStore(dir))
  }

  /** 0..999 range-partitioned on k into 8 files: tight per-file ranges. */
  private def rangedTable(store: SnapshotTableStore, table: String): Unit = {
    val df = spark.range(0, 1000).toDF("k")
      .withColumn("v", col("k") * 7)
      .repartitionByRange(8, col("k"))
    store.overwrite(df, table)
  }

  test("readRange equals the unpruned filtered read and actually skips files") {
    val (_, store) = freshStore()
    rangedTable(store, "t")
    assert(DataSkipping.ensureStats(spark, store, "t", Seq("k", "v")) == 1)
    val scan = DataSkipping.readRange(spark, store, "t", "k", "100", "220")
    assert(scan.filesTotal == 8)
    assert(scan.filesRead < scan.filesTotal,
      s"no pruning: read ${scan.filesRead}/${scan.filesTotal}")
    val expected = store.read(spark, "t")
      .where(col("k").between(100, 220)).as[(Long, Long)].collect().toSet
    assert(scan.df.as[(Long, Long)].collect().toSet == expected)
    assert(expected.size == 121)
  }

  test("a directory without a sidecar is fully kept — stats never gate correctness") {
    val (_, store) = freshStore()
    rangedTable(store, "t")
    // no ensureStats call
    val scan = DataSkipping.readRange(spark, store, "t", "k", "0", "10")
    assert(scan.filesRead == scan.filesTotal)
    assert(scan.df.count() == 11)
  }

  test("appended stat-less dir is read in full while the statted dir still prunes") {
    val (_, store) = freshStore()
    rangedTable(store, "t")
    DataSkipping.ensureStats(spark, store, "t", Seq("k"))
    // append rows INSIDE the queried range from a new (stat-less) dir
    store.append(Seq((150L, -1L)).toDF("k", "v").coalesce(1), "t")
    val scan = DataSkipping.readRange(spark, store, "t", "k", "140", "160")
    assert(scan.df.as[(Long, Long)].collect().toSet ==
      ((140L to 160L).map(k => k -> k * 7).toSet + (150L -> -1L)))
    // second ensureStats covers only the new dir; a range that excludes its
    // single row (k=150) then prunes the appended file too
    assert(DataSkipping.ensureStats(spark, store, "t", Seq("k")) == 1)
    val scan2 = DataSkipping.readRange(spark, store, "t", "k", "300", "320")
    assert(scan2.filesRead < scan.filesRead)
    assert(scan2.df.count() == 21)
  }

  test("an empty intersection prunes every file and yields an empty frame") {
    val (_, store) = freshStore()
    rangedTable(store, "t")
    DataSkipping.ensureStats(spark, store, "t", Seq("k"))
    val scan = DataSkipping.readRange(spark, store, "t", "k", "5000", "6000")
    assert(scan.filesRead == 0)
    assert(scan.df.count() == 0)
    assert(scan.df.schema.fieldNames.toSeq == Seq("k", "v"))
  }

  test("string columns prune lexicographically") {
    val (_, store) = freshStore()
    val df = spark.range(0, 260).toDF("i")
      .withColumn("s", concat(lit("key-"), format_string("%03d", col("i"))))
      .repartitionByRange(4, col("s"))
    store.overwrite(df, "s")
    DataSkipping.ensureStats(spark, store, "s", Seq("s"))
    val scan = DataSkipping.readRange(spark, store, "s", "s", "key-100", "key-120")
    assert(scan.filesRead < scan.filesTotal)
    assert(scan.df.count() == 21)
  }

  test("all-NULL files are skipped for range predicates (NULL-excluding) ") {
    val (_, store) = freshStore()
    val withVals = Seq((1L, java.lang.Long.valueOf(10L)),
      (2L, java.lang.Long.valueOf(20L))).toDF("id", "x").coalesce(1)
    val allNull = Seq((3L, null.asInstanceOf[java.lang.Long]),
      (4L, null.asInstanceOf[java.lang.Long])).toDF("id", "x").coalesce(1)
    store.overwrite(withVals, "n")
    store.append(allNull, "n")
    DataSkipping.ensureStats(spark, store, "n", Seq("x"))
    val scan = DataSkipping.readRange(spark, store, "n", "x",
      java.lang.Long.MIN_VALUE.toString, java.lang.Long.MAX_VALUE.toString)
    assert(scan.filesRead == 1, "the all-NULL file must be skipped")
    assert(scan.df.select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("compact produces a stat-less dir; ensureStats re-covers it") {
    val (dir, store) = freshStore()
    rangedTable(store, "t")
    DataSkipping.ensureStats(spark, store, "t", Seq("k"))
    assert(store.compact(spark, "t", targetFileBytes = 4096).nonEmpty)
    assert(DataSkipping.ensureStats(spark, store, "t", Seq("k")) == 1)
    val scan = DataSkipping.readRange(spark, store, "t", "k", "100", "220")
    assert(scan.df.count() == 121)
    // sidecar rides in the data dir, never read as table data
    assert(store.read(spark, "t").columns.toSeq == Seq("k", "v"))
    assert(Files.list(Paths.get(dir, "t", "data")).count() >= 2)
  }

  test("metadataAggs answers count/min/max from sidecars alone and matches the scan") {
    val (_, store) = freshStore()
    rangedTable(store, "t")
    assert(DataSkipping.metadataAggs(store, "t", "k").isEmpty,
      "no sidecar yet: must refuse, never guess")
    DataSkipping.ensureStats(spark, store, "t", Seq("k"))
    val Some(a) = DataSkipping.metadataAggs(store, "t", "k")
    assert(a.count == 1000L && a.min.get.toLong == 0L && a.max.get.toLong == 999L)
    // appended stat-less dir poisons the metadata answer until re-statted
    store.append(Seq((-5L, 0L)).toDF("k", "v").coalesce(1), "t")
    assert(DataSkipping.metadataAggs(store, "t", "k").isEmpty)
    DataSkipping.ensureStats(spark, store, "t", Seq("k"))
    val Some(b) = DataSkipping.metadataAggs(store, "t", "k")
    assert(b.count == 1001L && b.min.get.toLong == -5L)
    // count is the NON-NULL count; all-null files contribute 0 and
    // never perturb min/max
    val nulls = Seq((null.asInstanceOf[java.lang.Long], 1L))
      .toDF("k", "v").coalesce(1)
    store.append(nulls, "t")
    DataSkipping.ensureStats(spark, store, "t", Seq("k"))
    val Some(c) = DataSkipping.metadataAggs(store, "t", "k")
    assert(c.count == 1001L && c.min.get.toLong == -5L && c.max.get.toLong == 999L)
  }

  test("metadataAggs on an earlier version ignores later appends") {
    val (_, store) = freshStore()
    rangedTable(store, "t")
    DataSkipping.ensureStats(spark, store, "t", Seq("k"))
    store.append(Seq((5000L, 0L)).toDF("k", "v").coalesce(1), "t")
    DataSkipping.ensureStats(spark, store, "t", Seq("k"))
    val Some(v1) = DataSkipping.metadataAggs(store, "t", "k", Some(1))
    val Some(v2) = DataSkipping.metadataAggs(store, "t", "k", Some(2))
    assert(v1.count == 1000L && v1.max.get.toLong == 999L)
    assert(v2.count == 1001L && v2.max.get.toLong == 5000L)
  }

  test("randomized: pruned reads equal full filtered reads on every range (seeded)") {
    val (_, store) = freshStore()
    val rnd = new scala.util.Random(20260814L)
    // clustered-but-messy data: three value clusters, written as three
    // commits with different partitioners, one dir left stat-less
    val a = spark.createDataFrame(
      (1 to 400).map(_ => (rnd.nextInt(300).toLong, rnd.nextLong() % 100)))
      .toDF("k", "v").repartitionByRange(3, col("k"))
    val b = spark.createDataFrame(
      (1 to 400).map(_ => (500L + rnd.nextInt(300), rnd.nextLong() % 100)))
      .toDF("k", "v").repartition(2)
    val c = spark.createDataFrame(
      (1 to 200).map(_ => (900L + rnd.nextInt(50), rnd.nextLong() % 100)))
      .toDF("k", "v").coalesce(1)
    store.overwrite(a, "r"); store.append(b, "r")
    DataSkipping.ensureStats(spark, store, "r", Seq("k"))
    store.append(c, "r") // stays stat-less on purpose
    val full = store.read(spark, "r")
    var anyPruned = false
    for (_ <- 1 to 25) {
      val x = rnd.nextInt(1100) - 50
      val y = x + rnd.nextInt(400)
      val scan = DataSkipping.readRange(spark, store, "r", "k",
        x.toString, y.toString)
      val expect = full.where(col("k").between(x.toLong, y.toLong))
        .groupBy("k").count().as[(Long, Long)].collect().toMap
      val got = scan.df.groupBy("k").count().as[(Long, Long)].collect().toMap
      assert(got == expect, s"range [$x,$y]")
      if (scan.filesRead < scan.filesTotal) anyPruned = true
    }
    assert(anyPruned, "no range ever pruned — stats are dead")
  }

  test("unparseable bounds disable pruning and fall through to the residual filter") {
    val (_, store) = freshStore()
    rangedTable(store, "t")
    DataSkipping.ensureStats(spark, store, "t", Seq("k"))
    val scan = DataSkipping.readRange(spark, store, "t", "k", "abc", "200")
    assert(scan.filesRead == scan.filesTotal, "must not prune on a bad bound")
    assert(scan.df.count() == 0, "residual filter: NULL bound matches nothing")
    // scientific notation is not canonical long text either — same path
    val sci = DataSkipping.readRange(spark, store, "t", "k", "1e2", "200")
    assert(sci.filesRead == sci.filesTotal)
  }

  test("ensureStats extends column coverage without dropping existing columns") {
    val (_, store) = freshStore()
    rangedTable(store, "t")
    assert(DataSkipping.ensureStats(spark, store, "t", Seq("k")) == 1)
    assert(DataSkipping.metadataAggs(store, "t", "v").isEmpty)
    // second pass with a NEW column re-collects and unions coverage
    assert(DataSkipping.ensureStats(spark, store, "t", Seq("v")) == 1)
    assert(DataSkipping.metadataAggs(store, "t", "v").nonEmpty)
    assert(DataSkipping.metadataAggs(store, "t", "k").nonEmpty,
      "extending coverage must not drop previously statted columns")
    assert(DataSkipping.ensureStats(spark, store, "t", Seq("k", "v")) == 0)
  }

  test("a stale-format sidecar acts exactly like a missing one") {
    val (dir, store) = freshStore()
    rangedTable(store, "t")
    DataSkipping.ensureStats(spark, store, "t", Seq("k"))
    // corrupt the sidecar into a pre-v2 (headerless) format
    val dd = store.versionDataDirs("t", 1).head
    val sc = Paths.get(dd, DataSkipping.StatsFile)
    Files.write(sc, "part-x\tx\t1\t-\t-".getBytes)
    val scan = DataSkipping.readRange(spark, store, "t", "k", "100", "220")
    assert(scan.filesRead == scan.filesTotal, "stale stats must not prune")
    assert(scan.df.count() == 121)
    assert(DataSkipping.metadataAggs(store, "t", "k").isEmpty)
    // maintenance re-collects it
    assert(DataSkipping.ensureStats(spark, store, "t", Seq("k")) == 1)
    assert(DataSkipping.readRange(spark, store, "t", "k", "100", "220")
      .filesRead < scan.filesRead)
    assert(dir.nonEmpty)
  }

  test("z-ordered write gives two-dimensional skipping on the same sidecars") {
    val (_, store) = freshStore()
    val df = spark.range(0, 4096).toDF("i")
      .withColumn("x", col("i") % 64)
      .withColumn("y", floor(col("i") / 64))
    val z = graft.operators.Layout.zorderPartitions(df, col("x"), col("y"),
      bits = 6, numPartitions = 16)
    store.overwrite(z, "z")
    DataSkipping.ensureStats(spark, store, "z", Seq("x", "y"))
    val sx = DataSkipping.readRange(spark, store, "z", "x", "0", "7")
    val sy = DataSkipping.readRange(spark, store, "z", "y", "0", "7")
    assert(sx.filesRead < sx.filesTotal, "no x-skipping under z-order")
    assert(sy.filesRead < sy.filesTotal, "no y-skipping under z-order")
    assert(sx.df.count() == 4096 / 8 && sy.df.count() == 4096 / 8)
  }

  /** 0..999 HASH-partitioned on k into 8 files: every file spans the full
    * key domain, so min/max stats cannot prune a mid-domain needle — the
    * layout the Bloom sidecar exists for.
    */
  private def hashedTable(store: SnapshotTableStore, table: String): Unit = {
    val df = spark.range(0, 1000).toDF("k")
      .withColumn("v", col("k") * 7)
      .repartition(8, col("k"))
    store.overwrite(df, table)
  }

  test("readNeedle prunes under a hash layout where range stats cannot") {
    val (_, store) = freshStore()
    hashedTable(store, "h")
    DataSkipping.ensureStats(spark, store, "h", Seq("k"))
    assert(DataSkipping.ensureBloom(spark, store, "h", Seq("k")) == 1)
    val bloom = DataSkipping.readNeedle(spark, store, "h", "k", "500")
    val range = DataSkipping.readRange(spark, store, "h", "k", "500", "500")
    assert(range.filesRead == range.filesTotal,
      "control: min/max should NOT prune a mid-domain needle under hash layout")
    assert(bloom.filesRead < bloom.filesTotal,
      s"bloom did not prune: ${bloom.filesRead}/${bloom.filesTotal}")
    assert(bloom.df.as[(Long, Long)].collect().toSeq == Seq((500L, 3500L)))
  }

  test("bloom has no false negatives: every present key is found") {
    val (_, store) = freshStore()
    hashedTable(store, "h")
    DataSkipping.ensureBloom(spark, store, "h", Seq("k"))
    // deterministic sample across the domain; each hit must survive pruning
    for (k <- 0 until 1000 by 67) {
      val scan = DataSkipping.readNeedle(spark, store, "h", "k", k.toString)
      assert(scan.df.count() == 1, s"lost key $k (read ${scan.filesRead} files)")
    }
  }

  test("an absent needle prunes every file (modulo rare false positives)") {
    val (_, store) = freshStore()
    hashedTable(store, "h")
    DataSkipping.ensureBloom(spark, store, "h", Seq("k"))
    val scan = DataSkipping.readNeedle(spark, store, "h", "k", "123456")
    // 8 filters at 8192 bits / ~125 keys each: P(any FP) is negligible,
    // and the residual predicate keeps the answer exact regardless
    assert(scan.filesRead <= 1, s"absent key read ${scan.filesRead} files")
    assert(scan.df.count() == 0)
  }

  test("a directory without a bloom sidecar is fully kept") {
    val (_, store) = freshStore()
    hashedTable(store, "h")
    val scan = DataSkipping.readNeedle(spark, store, "h", "k", "500")
    assert(scan.filesRead == scan.filesTotal)
    assert(scan.df.count() == 1)
  }

  test("appended bloom-less dir is read in full; ensureBloom re-covers it") {
    val (_, store) = freshStore()
    hashedTable(store, "h")
    DataSkipping.ensureBloom(spark, store, "h", Seq("k"))
    store.append(Seq((500L, -1L)).toDF("k", "v").coalesce(1), "h")
    val scan = DataSkipping.readNeedle(spark, store, "h", "k", "500")
    assert(scan.df.as[(Long, Long)].collect().toSet ==
      Set(500L -> 3500L, 500L -> -1L))
    assert(DataSkipping.ensureBloom(spark, store, "h", Seq("k")) == 1)
    val scan2 = DataSkipping.readNeedle(spark, store, "h", "k", "0")
    // the appended file holds only k=500: its filter must exclude k=0
    assert(scan2.filesRead < scan.filesRead + 1)
    assert(scan2.df.count() == 1)
  }

  test("an unparseable probe value disables pruning and matches nothing") {
    val (_, store) = freshStore()
    hashedTable(store, "h")
    DataSkipping.ensureBloom(spark, store, "h", Seq("k"))
    val scan = DataSkipping.readNeedle(spark, store, "h", "k", "not-a-long")
    assert(scan.filesRead == scan.filesTotal)
    assert(scan.df.count() == 0)
  }

  test("a stale-format bloom sidecar acts exactly like a missing one") {
    val (dir, store) = freshStore()
    hashedTable(store, "h")
    DataSkipping.ensureBloom(spark, store, "h", Seq("k"))
    val v = store.currentVersion("h").get
    val dataDir = Paths.get(store.versionDataDirs("h", v).head)
    val sidecar = dataDir.resolve(DataSkipping.BloomFile)
    Files.write(sidecar, "#graftbloom\tv0\ngarbage".getBytes)
    val scan = DataSkipping.readNeedle(spark, store, "h", "k", "500")
    assert(scan.filesRead == scan.filesTotal) // stale = keep everything
    assert(scan.df.count() == 1)
    assert(DataSkipping.ensureBloom(spark, store, "h", Seq("k")) == 1)
    assert(DataSkipping.readNeedle(spark, store, "h", "k", "500")
      .filesRead < scan.filesTotal)
    assert(dir.nonEmpty)
  }

  test("all-NULL column files carry an empty filter — definite negative") {
    val (_, store) = freshStore()
    val df = Seq((Option.empty[java.lang.Long], 1L),
      (Option.empty[java.lang.Long], 2L)).toDF("k", "v").coalesce(1)
    store.overwrite(df, "n")
    DataSkipping.ensureBloom(spark, store, "n", Seq("k"))
    val scan = DataSkipping.readNeedle(spark, store, "n", "k", "5")
    assert(scan.filesRead == 0 && scan.filesTotal == 1)
    assert(scan.df.count() == 0)
  }

  test("string columns probe through the same canonical cast") {
    val (_, store) = freshStore()
    val df = spark.range(0, 200).toDF("i")
      .select(concat(lit("id-"), col("i")).as("s"), col("i").as("v"))
      .repartition(4, col("s"))
    store.overwrite(df, "s")
    DataSkipping.ensureBloom(spark, store, "s", Seq("s"))
    val scan = DataSkipping.readNeedle(spark, store, "s", "s", "id-137")
    assert(scan.filesRead < scan.filesTotal)
    assert(scan.df.select("v").as[Long].collect().toSeq == Seq(137L))
  }
}
