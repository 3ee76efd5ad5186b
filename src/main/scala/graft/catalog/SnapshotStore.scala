package graft.catalog

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot store for the S6/S7 catalog load path.
  *
  * The reference commits every scan load transactionally (SQLite/DuckDB
  * transactions around the upsert batches, graph_loader.go:155-187);
  * rewrite-in-place parquet loses that — a crashed writer leaves a torn
  * table and a concurrent reader sees partial files. This store reproduces
  * commit semantics with the minimum viable version-directory + manifest
  * layout (the same shape as a Delta/Iceberg commit log, reduced to its
  * core):
  *
  * {{{
  *   root/<table>/data/d<n>/...parquet     immutable data directories
  *   root/<table>/_versions/v<n>.manifest  newline-separated data dirs
  *   root/<table>/_latest                  pointer file: current version
  * }}}
  *
  * Commit = write the new data dir, write the manifest with CREATE_NEW
  * (optimistic concurrency: two writers racing for version n+1 — one
  * wins, the other gets FileAlreadyExistsException and retries on the
  * new current), then ATOMIC_MOVE a temp pointer over `_latest`. A
  * crashed half-commit is invisible: its data dir and manifest exist but
  * the pointer still names the previous version, and the orphan is
  * overwritten by the next successful commit of that version number.
  *
  * Why this is the 100 TB layout:
  *  - `append` writes ONLY the appended bytes — the new manifest carries
  *    the prior data dirs forward by name; nothing is rewritten or moved.
  *  - Old versions stay readable (`readVersion`) until vacuumed: cheap
  *    time travel for E12-style baselines.
  *  - Read-modify-write on the SAME table is safe: the merge plan reads
  *    version n's files while the commit writes a fresh `d<n+1>` dir, so
  *    the classic Spark "cannot overwrite a path being read" failure
  *    cannot happen (see [[SnapshotTableStore.upsertLoad]]).
  *  - Path-addressed caches ([[graft.operators.GraphIndexCache]])
  *    invalidate for free: a new version is a new path set, no TTL or
  *    mtime probe needed.
  */
final class SnapshotTableStore(root: String) extends TableStore {

  private def tableDir(table: String): Path = Paths.get(root, table)
  private def latestPtr(table: String): Path = tableDir(table).resolve("_latest")
  private def manifestPath(table: String, v: Int): Path =
    tableDir(table).resolve("_versions").resolve(f"v$v%05d.manifest")
  private def dataDir(table: String, name: String): Path =
    tableDir(table).resolve("data").resolve(name)

  /** Current committed version, if the table exists. */
  def currentVersion(table: String): Option[Int] = {
    val p = latestPtr(table)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), UTF_8).trim.toInt)
    else None
  }

  /** All committed versions, ascending (half-commits excluded: only
    * versions at or below the pointer are committed).
    */
  def versions(table: String): Seq[Int] = currentVersion(table) match {
    case None => Seq.empty
    case Some(cur) =>
      val dir = tableDir(table).resolve("_versions")
      Files.list(dir).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") && s.endsWith(".manifest") =>
          s.stripPrefix("v").stripSuffix(".manifest").toInt }
        .filter(_ <= cur).toSeq.sorted
  }

  private def manifestDirs(table: String, v: Int): Seq[String] = {
    val p = manifestPath(table, v)
    require(Files.exists(p), s"snapshot $table@v$v does not exist")
    new String(Files.readAllBytes(p), UTF_8).split("\n").map(_.trim)
      .filter(_.nonEmpty).toSeq
  }

  /** Time-travel read of a specific committed version. */
  def readVersion(spark: SparkSession, table: String, v: Int): DataFrame = {
    val cur = currentVersion(table)
    require(cur.exists(v <= _), s"snapshot $table@v$v is not committed (latest: $cur)")
    val dirs = manifestDirs(table, v).map(d => dataDir(table, d).toString)
    spark.read.parquet(dirs: _*)
  }

  def read(spark: SparkSession, table: String): DataFrame = {
    val v = currentVersion(table).getOrElse(
      throw new IllegalArgumentException(s"snapshot table $table does not exist"))
    readVersion(spark, table, v)
  }

  /** One commit attempt; FileAlreadyExistsException on the manifest means
    * a concurrent writer claimed this version number first.
    */
  private def commit(df: DataFrame, table: String, carryForward: Boolean): Int = {
    val cur = currentVersion(table)
    val next = cur.getOrElse(0) + 1
    val dname = f"d$next%05d"
    val target = dataDir(table, dname)
    // A previous crashed attempt at this version may have left an orphan
    // data dir (never referenced: its manifest write is what claims the
    // version). Overwrite it.
    df.write.mode("overwrite").parquet(target.toString)
    val prior = if (carryForward) cur.map(manifestDirs(table, _)).getOrElse(Nil)
                else Nil
    val mp = manifestPath(table, next)
    Files.createDirectories(mp.getParent)
    Files.write(mp, (prior :+ dname).mkString("\n").getBytes(UTF_8),
      StandardOpenOption.CREATE_NEW)
    val tmp = tableDir(table).resolve(s"_latest.tmp$next")
    Files.write(tmp, next.toString.getBytes(UTF_8))
    Files.move(tmp, latestPtr(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** New snapshot containing exactly `df` (prior versions stay readable). */
  def overwrite(df: DataFrame, table: String): Unit = commit(df, table, carryForward = false)

  /** New snapshot = prior snapshot + `df`; writes only the new rows. */
  def append(df: DataFrame, table: String): Unit = commit(df, table, carryForward = true)

  /** Committed version of an overwrite — exposed for callers that want the
    * version number (e.g. to record in scan metadata, S7).
    */
  def commitOverwrite(df: DataFrame, table: String): Int = commit(df, table, carryForward = false)

  /** S6 transactional upsert load: merge `incoming` into the current
    * snapshot with first-write-wins semantics
    * ([[ResourceCatalog.upsertResources]], graph_loader.go:189-216) and
    * commit the merge as a new version. The merge plan reads version n's
    * immutable files while writing `d<n+1>` — safe even though source and
    * destination are "the same table".
    */
  def upsertLoad(spark: SparkSession, table: String, incoming: DataFrame,
      idCol: String = "id"): Int = {
    val merged = currentVersion(table) match {
      case Some(_) =>
        ResourceCatalog.upsertResources(read(spark, table), incoming, idCol)
      case None => incoming
    }
    commit(merged, table, carryForward = false)
  }

  /** Drop data dirs referenced only by versions below `keepFrom` and their
    * manifests — the GC half of time travel. Never touches dirs the
    * current manifest chain still references.
    */
  def vacuum(table: String, keepFrom: Int): Unit = {
    val keep = versions(table).filter(_ >= keepFrom)
      .flatMap(manifestDirs(table, _)).toSet
    val dropVs = versions(table).filter(_ < keepFrom)
    val drop = dropVs.flatMap(manifestDirs(table, _)).toSet -- keep
    drop.foreach { d =>
      val dir = dataDir(table, d)
      Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    dropVs.foreach(v => Files.deleteIfExists(manifestPath(table, v)))
  }
}
