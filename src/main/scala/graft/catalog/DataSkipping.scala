package graft.catalog

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import java.util.Base64
import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-level min/max statistics + stats-pruned reads for
  * [[SnapshotTableStore]] tables — the data-skipping half of the
  * lakehouse maintenance pair ([[graft.operators.Layout]] z-ordering
  * makes per-file ranges tight; this module makes the reader exploit
  * them). Delta and Iceberg keep per-file column stats in the commit
  * log and prune the file list before the scan ever reaches the engine;
  * parquet row-group stats alone cannot do that job at 100 TB because
  * the engine still has to OPEN every footer (one S3 round trip per
  * file — millions of requests for a needle query). Here each immutable
  * data directory carries one tiny sidecar (`_graftstats.tsv`, ignored
  * by Spark's scans like any underscore file) and [[readRange]] prunes
  * to the intersecting files with driver-side metadata only.
  *
  * Correctness contract: stats ONLY prune — the residual predicate is
  * always applied to whatever survives, files lacking stats are always
  * kept, and a range predicate `lo <= c <= hi` is NULL-excluding, so a
  * file whose non-null [min,max] misses the range can hold no matching
  * row regardless of its null count. Wrong answers therefore cannot come
  * from stale or missing stats, only lost pruning.
  */
object DataSkipping {

  /** Sidecar name inside a data directory. Underscore prefix keeps every
    * parquet scan from reading it as data.
    */
  val StatsFile = "_graftstats.tsv"

  /** First line of every sidecar. A sidecar whose header does not match
    * (older format, foreign file, torn write) is treated exactly like a
    * MISSING sidecar everywhere: reads keep all files, [[metadataAggs]]
    * refuses, [[ensureStats]] re-collects — format evolution can
    * therefore never produce a wrong answer, only lost pruning until the
    * next maintenance pass.
    */
  val StatsHeader = "#graftstats\tv2"

  /** A sidecar exists AND is the current format. */
  def hasCurrentStats(dir: Path): Boolean = {
    val p = dir.resolve(StatsFile)
    Files.exists(p) && {
      val txt = new String(Files.readAllBytes(p), UTF_8)
      txt.startsWith(StatsHeader + "\n") || txt.trim == StatsHeader
    }
  }

  /** Per-file, per-column stats. `min`/`max` are the column values cast
    * to string (Spark's cast, so numerics are plain decimal text and
    * timestamps are minimal-digit session-zone text); `None` means the
    * file has no non-null value in the column. `dt` is the column's
    * Spark type in DDL form, recorded at collect time so every later
    * consumer ([[metadataAggs]], pruning) compares with the right
    * semantics without opening a single parquet footer.
    */
  final case class ColStats(min: Option[String], max: Option[String],
      nonNull: Long, dt: String)

  /** Compute per-file min/max for `cols` over the parquet files of `dir`
    * and write the sidecar. One Spark job over the directory: grouping on
    * `input_file_name()` gives exactly one row per physical file with
    * partial aggregation, so the stats pass reads each byte once and
    * shuffles one row per (file, column set). Re-running overwrites the
    * sidecar (idempotent).
    */
  def collectStats(spark: SparkSession, dir: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "collectStats needs at least one column")
    val df = spark.read.parquet(dir)
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"),
        count(col(c)).as(s"n_$c"))
    }
    val rows = df.groupBy(input_file_name().as("_file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // one row per parquet file in ONE directory: bounded
    val b64 = Base64.getEncoder
    def enc(s: String): String = b64.encodeToString(s.getBytes(UTF_8))
    val ddl = cols.map(c => c -> df.schema(c).dataType.sql).toMap
    val lines = rows.flatMap { r =>
      val file = Paths.get(new java.net.URI(r.getAs[String]("_file")).getPath)
        .getFileName.toString
      cols.map { c =>
        val mn = Option(r.getAs[String](s"min_$c")).map(enc).getOrElse("-")
        val mx = Option(r.getAs[String](s"max_$c")).map(enc).getOrElse("-")
        s"$file\t${enc(c)}\t${enc(ddl(c))}\t${r.getAs[Long](s"n_$c")}\t$mn\t$mx"
      }
    }
    // temp-write + atomic move: a torn write must look like a MISSING
    // sidecar (the class-doc contract), never a current-format file with
    // truncated lines that parse wrong or crash the reader
    val target = Paths.get(dir, StatsFile)
    val tmp = Paths.get(dir, s".${StatsFile}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, (StatsHeader +: lines).mkString("\n").getBytes(UTF_8))
    Files.move(tmp, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Collect stats for every data directory of the CURRENT version of
    * `table` whose sidecar is missing, stale-format, or does not cover
    * every requested column — the idempotent maintenance entry point to
    * run after appends, [[SnapshotTableStore.compact]] (whose rewritten
    * directory is new and therefore stat-less until this runs), or when
    * extending stats to more columns. Returns the number of directories
    * processed.
    */
  def ensureStats(spark: SparkSession, store: SnapshotTableStore,
      table: String, cols: Seq[String]): Int = {
    val v = store.currentVersion(table).getOrElse(
      throw new IllegalArgumentException(s"snapshot table $table does not exist"))
    val missing = store.versionDataDirs(table, v).map(Paths.get(_))
      .filterNot(d => hasCurrentStats(d) && statsCover(d, cols))
    missing.foreach { d =>
      // a re-collect must EXTEND coverage, not shrink it: keep columns an
      // earlier maintenance pass already statted
      val existing =
        if (hasCurrentStats(d))
          parseSidecar(d).values.flatMap(_.keySet).toSeq.distinct
        else Nil
      collectStats(spark, d.toString, (existing ++ cols).distinct)
    }
    missing.size
  }

  /** Every file entry of `dir`'s sidecar carries every column in `cols`
    * (vacuously true for an empty sidecar — an empty directory has
    * nothing to stat).
    */
  private def statsCover(dir: Path, cols: Seq[String]): Boolean =
    parseSidecar(dir).values.forall(m => cols.forall(m.contains))

  private def parseSidecar(dir: Path): Map[String, Map[String, ColStats]] = {
    val b64 = Base64.getDecoder
    def dec(s: String): String = new String(b64.decode(s), UTF_8)
    val txt = new String(Files.readAllBytes(dir.resolve(StatsFile)), UTF_8)
    txt.split("\n").filter(l => l.nonEmpty && !l.startsWith("#")).toSeq.map { ln =>
      val Array(f, c, d, n, mn, mx) = ln.split("\t", -1)
      (f, dec(c), ColStats(if (mn == "-") None else Some(dec(mn)),
        if (mx == "-") None else Some(dec(mx)), n.toLong, dec(d)))
    }.groupBy(_._1).map { case (f, es) =>
      f -> es.map(e => e._2 -> e._3).toMap
    }
  }

  /** Typed driver-side compare of two stat strings under the column's
    * Spark type. Timestamps/dates compare correctly as text because
    * Spark's cast emits fixed-order `yyyy-MM-dd[ HH:mm:ss[.S*]]` with
    * minimal fractional digits (no trailing zeros), which makes
    * lexicographic order chronological.
    */
  private def cmp(dt: DataType, a: String, b: String): Int = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      java.lang.Long.compare(a.toLong, b.toLong)
    case FloatType | DoubleType => java.lang.Double.compare(a.toDouble, b.toDouble)
    case _: DecimalType => BigDecimal(a).compare(BigDecimal(b))
    case _ => a.compareTo(b)
  }

  /** The data files of one directory (sidecars and markers excluded). */
  private def allParquets(dir: Path): List[Path] =
    Using.resource(Files.list(dir)) { ls =>
      ls.iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
        }.toList
    }

  /** Pruning decision for one directory's files. Files absent from the
    * sidecar map (or whole directories without a sidecar) are kept —
    * skipping is an optimization, never a correctness dependency.
    */
  private def keptFiles(dir: Path, column: String, dt: DataType,
      lo: String, hi: String): (Seq[Path], Int) = {
    val parquets = allParquets(dir)
    if (!hasCurrentStats(dir)) return (parquets, parquets.size)
    val stats = parseSidecar(dir)
    val kept = parquets.filter { p =>
      stats.get(p.getFileName.toString).flatMap(_.get(column)) match {
        case None => true // no stats for this file/column: must read it
        case Some(ColStats(Some(mn), Some(mx), _, _)) =>
          cmp(dt, mx, lo) >= 0 && cmp(dt, mn, hi) <= 0
        case Some(_) => false // all-NULL column: a range predicate excludes NULLs
      }
    }
    (kept, parquets.size)
  }

  /** Metadata-only aggregates: COUNT / MIN / MAX over a whole snapshot
    * version answered purely from the sidecars — zero data files opened
    * (the Delta "answer COUNT(*) from the log" fast path; at 100 TB the
    * difference between a catalog lookup and a full scan). Returns None
    * when any data directory of the version lacks a sidecar or any
    * sidecar lacks the column — the caller falls back to a real scan;
    * metadata answers are only ever exact-or-absent, never approximate.
    *
    * Semantics match SQL aggregates over the column: `count` is the
    * non-null count, min/max are None for an all-null table.
    */
  final case class ColumnAggs(count: Long, min: Option[String], max: Option[String])

  def metadataAggs(store: SnapshotTableStore, table: String, column: String,
      version: Option[Int] = None): Option[ColumnAggs] = {
    val v = version.orElse(store.currentVersion(table)).getOrElse(
      throw new IllegalArgumentException(s"snapshot table $table does not exist"))
    val dirs = store.versionDataDirs(table, v).map(Paths.get(_))
    if (!dirs.forall(hasCurrentStats)) return None
    var total = 0L
    var mn: Option[String] = None
    var mx: Option[String] = None
    for (dir <- dirs) {
      val stats = parseSidecar(dir)
      for (f <- allParquets(dir).map(_.getFileName.toString)) {
        stats.get(f).flatMap(_.get(column)) match {
          case None => return None // a file without stats: cannot answer
          case Some(cs) =>
            total += cs.nonNull
            if (cs.min.isDefined) {
              val d = DataType.fromDDL(cs.dt) // recorded at collect time
              if (mn.forall(m => cmp(d, cs.min.get, m) < 0)) mn = cs.min
              if (mx.forall(m => cmp(d, cs.max.get, m) > 0)) mx = cs.max
            }
        }
      }
    }
    Some(ColumnAggs(total, mn, mx))
  }

  /** Result of a pruned read: the DataFrame (residual filter applied) plus
    * the file accounting that makes "skipping engaged" an observable,
    * driver-checkable fact rather than an asserted one.
    */
  final case class PrunedScan(df: DataFrame, filesRead: Int, filesTotal: Int)

  // ---------------------------------------------------------------------
  // Bloom-filter file skipping — the needle-query half min/max stats
  // cannot serve. Range stats prune when the layout clusters the column;
  // a high-cardinality column that the layout scatters (hash-distributed
  // ids, join keys under a different sort) spans the full domain in every
  // file, so [min,max] never excludes anything. Delta's answer is a
  // per-file Bloom index; same here: each data directory carries a
  // `_graftbloom.tsv` sidecar with one fixed-width bitset per (file,
  // column), built by ONE distributed pass whose shuffle is bounded by
  // files × bits (never by rows), and [[readNeedle]] prunes to the
  // files whose filter might contain the probe. Same correctness
  // contract as min/max stats: Bloom negatives are definite under the
  // shared canonical value text, missing/stale sidecars keep the file,
  // and the residual equality predicate is always applied — a false
  // positive costs one extra file read, never a wrong row.
  // ---------------------------------------------------------------------

  /** Bloom sidecar name inside a data directory. */
  val BloomFile = "_graftbloom.tsv"

  /** Format marker; mismatch = treated as missing (see [[StatsHeader]]). */
  val BloomHeader = "#graftbloom\tv1"

  /** A Bloom sidecar exists AND is the current format. */
  def hasCurrentBloom(dir: Path): Boolean = {
    val p = dir.resolve(BloomFile)
    Files.exists(p) && {
      val txt = new String(Files.readAllBytes(p), UTF_8)
      txt.startsWith(BloomHeader + "\n") || txt.trim == BloomHeader
    }
  }

  /** The k bit positions of one canonical value — THE shared hash
    * schedule: build and probe both go through this expression, so the
    * filter is consistent by construction. xxhash64 is a fixed published
    * algorithm (stable across Spark versions and sessions); salting with
    * the slot index yields k independent streams.
    */
  private def bloomPositions(v: Column, bits: Int, k: Int): Seq[Column] =
    (0 until k).map(i => pmod(xxhash64(lit(i), v), lit(bits.toLong)))

  /** Build per-file Bloom filters for `cols` over the parquet files of
    * `dir` and write the sidecar. One job per column: rows project to
    * (file, bit position), and the DISTINCT collapses the shuffle to at
    * most `bits` rows per file BEFORE the driver sees anything — the
    * collect is bounded by files × bits regardless of row count or
    * column cardinality, which is what lets this run against a 100 TB
    * directory. NULLs set no bits (an equality needle excludes NULLs).
    */
  def collectBloom(spark: SparkSession, dir: String, cols: Seq[String],
      bits: Int = 8192, hashes: Int = 5): Unit = {
    require(cols.nonEmpty, "collectBloom needs at least one column")
    require(bits >= 64 && (bits & (bits - 1)) == 0, s"bits must be a power of two: $bits")
    require(hashes >= 1 && hashes <= 16, s"hashes out of range: $hashes")
    val df = spark.read.parquet(dir)
    val b64 = Base64.getEncoder
    def enc(s: String): String = b64.encodeToString(s.getBytes(UTF_8))
    val lines = cols.flatMap { c =>
      val perFile = df
        .select(input_file_name().as("_file"), col(c).cast("string").as("_v"))
        .where(col("_v").isNotNull)
        .select(col("_file"),
          explode(array(bloomPositions(col("_v"), bits, hashes): _*)).as("_p"))
        .distinct()
        .groupBy("_file").agg(collect_set("_p").as("_ps"))
        .collect() // one row per file, each <= bits positions: bounded
      val byFile = perFile.map { r =>
        val file = Paths.get(new java.net.URI(r.getAs[String]("_file")).getPath)
          .getFileName.toString
        val bs = new java.util.BitSet(bits)
        r.getSeq[Long](1).foreach(p => bs.set(p.toInt))
        file -> b64.encodeToString(bs.toByteArray)
      }.toMap
      // files whose column is all-NULL produce no row above but still
      // need an entry (empty filter = definite negative for any needle)
      allParquets(Paths.get(dir)).map(_.getFileName.toString).map { f =>
        val payload = byFile.getOrElse(f, "")
        s"$f\t${enc(c)}\t$bits\t$hashes\t$payload"
      }
    }
    val target = Paths.get(dir, BloomFile)
    val tmp = Paths.get(dir,
      s".${BloomFile}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, (BloomHeader +: lines).mkString("\n").getBytes(UTF_8))
    Files.move(tmp, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Idempotent Bloom maintenance over the current version of `table` —
    * the [[ensureStats]] twin: (re)collects any directory whose sidecar
    * is missing, stale-format, or lacks a requested column, extending
    * (never shrinking) existing coverage. Returns directories processed.
    */
  def ensureBloom(spark: SparkSession, store: SnapshotTableStore,
      table: String, cols: Seq[String], bits: Int = 8192,
      hashes: Int = 5): Int = {
    val v = store.currentVersion(table).getOrElse(
      throw new IllegalArgumentException(s"snapshot table $table does not exist"))
    val missing = store.versionDataDirs(table, v).map(Paths.get(_))
      .filterNot(d => hasCurrentBloom(d) &&
        parseBloom(d).values.forall(m => cols.forall(m.contains)))
    missing.foreach { d =>
      val existing =
        if (hasCurrentBloom(d))
          parseBloom(d).values.flatMap(_.keySet).toSeq.distinct
        else Nil
      collectBloom(spark, d.toString, (existing ++ cols).distinct, bits, hashes)
    }
    missing.size
  }

  /** One file's Bloom entry for one column. */
  private final case class BloomEntry(bits: Int, hashes: Int,
      set: java.util.BitSet)

  private def parseBloom(dir: Path): Map[String, Map[String, BloomEntry]] = {
    val b64 = Base64.getDecoder
    def dec(s: String): String = new String(b64.decode(s), UTF_8)
    val txt = new String(Files.readAllBytes(dir.resolve(BloomFile)), UTF_8)
    txt.split("\n").filter(l => l.nonEmpty && !l.startsWith("#")).toSeq.map { ln =>
      val Array(f, c, bits, k, payload) = ln.split("\t", -1)
      val bs =
        if (payload.isEmpty) new java.util.BitSet()
        else java.util.BitSet.valueOf(b64.decode(payload))
      (f, dec(c), BloomEntry(bits.toInt, k.toInt, bs))
    }.groupBy(_._1).map { case (f, es) =>
      f -> es.map(e => e._2 -> e._3).toMap
    }
  }

  /** Read `table@version` with `column = value`, pruning files whose
    * Bloom filter proves the value absent — the needle-query scan path:
    * at 100 TB an id lookup touches the one file (plus the rare false
    * positive) instead of listing millions. The probe value goes through
    * the SAME engine cast that built the filter (canonical string text),
    * and the probe's bit positions come from the SAME expression — a
    * value the column type cannot parse matches nothing, with pruning
    * disabled for honest accounting. The residual equality predicate is
    * always applied, so the result equals the unpruned filtered read.
    */
  def readNeedle(spark: SparkSession, store: SnapshotTableStore, table: String,
      column: String, value: String,
      version: Option[Int] = None): PrunedScan = {
    val v = version.orElse(store.currentVersion(table)).getOrElse(
      throw new IllegalArgumentException(s"snapshot table $table does not exist"))
    val dirs = store.versionDataDirs(table, v)
    val schema = spark.read.parquet(dirs: _*).schema
    val dt = schema(column).dataType
    val canon = spark.range(1)
      .select(lit(value).try_cast(dt).cast("string").as("v")).head
    val perDir: Seq[(Seq[Path], Int)] = Option(canon.getString(0)) match {
      case Some(canonV) =>
        // probe positions per (bits, hashes) config actually present in
        // the sidecars, computed by the shared expression in ONE tiny job
        val configs = dirs.flatMap { d =>
          val p = Paths.get(d)
          if (hasCurrentBloom(p))
            parseBloom(p).values.flatMap(_.get(column))
              .map(e => (e.bits, e.hashes))
          else Nil
        }.distinct
        val probes: Map[(Int, Int), Seq[Int]] = configs.map { case (b, k) =>
          val row = spark.range(1).select(
            bloomPositions(lit(canonV), b, k).zipWithIndex
              .map { case (c, i) => c.as(s"p$i") }: _*).head
          (b, k) -> (0 until k).map(i => row.getLong(i).toInt)
        }.toMap
        dirs.map { d =>
          val p = Paths.get(d)
          val parquets = allParquets(p)
          if (!hasCurrentBloom(p)) (parquets, parquets.size)
          else {
            val entries = parseBloom(p)
            val kept = parquets.filter { f =>
              entries.get(f.getFileName.toString).flatMap(_.get(column)) match {
                case None => true // no filter for this file/column: read it
                case Some(e) =>
                  probes((e.bits, e.hashes)).forall(e.set.get)
              }
            }
            (kept, parquets.size)
          }
        }
      case None => // unparseable probe: no pruning, residual decides
        dirs.map { d =>
          val all = allParquets(Paths.get(d)); (all, all.size)
        }
    }
    val files = perDir.flatMap(_._1)
    val total = perDir.map(_._2).sum
    val pred = col(column) === lit(value).try_cast(dt)
    val df =
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(files.map(_.toString): _*).where(pred)
    PrunedScan(df, files.size, total)
  }

  /** Read `table@version` (current version when `version` is empty) with
    * `lo <= column <= hi` (inclusive, column-typed via cast from the
    * string bounds), pruning non-intersecting files by sidecar stats
    * before Spark ever lists them. The residual filter is always applied,
    * so the result equals the unpruned filtered read by construction.
    *
    * Bounds are canonicalized through the SAME Spark cast that produced
    * the stats before any comparison — a timestamp given as ISO
    * `2020-01-01T00:00:00` or a long given as `1e3` would otherwise
    * compare wrongly (or crash) against canonical stat text. Casting is
    * `try_cast` on both the probe and the residual predicate, so a bound
    * the type cannot parse yields a NULL comparison → an empty result,
    * with pruning disabled (all files listed) for honest accounting —
    * never an ANSI cast error from inside a metadata step.
    */
  def readRange(spark: SparkSession, store: SnapshotTableStore, table: String,
      column: String, lo: String, hi: String,
      version: Option[Int] = None): PrunedScan = {
    val v = version.orElse(store.currentVersion(table)).getOrElse(
      throw new IllegalArgumentException(s"snapshot table $table does not exist"))
    val dirs = store.versionDataDirs(table, v)
    val schema = spark.read.parquet(dirs: _*).schema
    val dt = schema(column).dataType
    val canon = spark.range(1).select(
      lit(lo).try_cast(dt).cast("string"), lit(hi).try_cast(dt).cast("string")).head
    val perDir = (Option(canon.getString(0)), Option(canon.getString(1))) match {
      case (Some(loC), Some(hiC)) =>
        dirs.map(d => keptFiles(Paths.get(d), column, dt, loC, hiC))
      case _ => // unparseable bound: no pruning, residual filter decides
        dirs.map { d =>
          val all = allParquets(Paths.get(d)); (all, all.size)
        }
    }
    val files = perDir.flatMap(_._1)
    val total = perDir.map(_._2).sum
    val pred = col(column).between(lit(lo).try_cast(dt), lit(hi).try_cast(dt))
    val df =
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(files.map(_.toString): _*).where(pred)
    PrunedScan(df, files.size, total)
  }
}
