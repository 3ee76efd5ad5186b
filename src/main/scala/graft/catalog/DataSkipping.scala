package graft.catalog

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import java.util.Base64
import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.spark.sql.{DataFrame, SparkSession}
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
