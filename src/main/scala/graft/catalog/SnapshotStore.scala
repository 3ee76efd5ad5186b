package graft.catalog

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.spark.sql.{DataFrame, SparkSession, types}

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
  *   root/<table>/data/d<n>-<token>/...parquet  immutable, writer-unique dirs
  *   root/<table>/_versions/v<n>.manifest       newline-separated data dirs
  *   root/<table>/_latest                       pointer file: roll-forward hint
  * }}}
  *
  * **The manifest is the commit point.** A commit writes its data to a
  * writer-unique directory first, then claims `v<n>.manifest` atomically:
  * the manifest content is written to a unique temp file and published
  * with `Files.createLink` (hard link), which fails with
  * [[FileAlreadyExistsException]] if version n is already claimed and —
  * unlike a direct write — makes the manifest appear with its FULL content
  * or not at all. Because the data dir is complete before the claim, a
  * manifest's existence implies a complete, readable version. The
  * `_latest` pointer is only a roll-forward hint updated after the claim:
  * [[currentVersion]] reads the pointer and then scans upward while
  * `v<ptr+1>.manifest` exists, so a writer that crashed between claim and
  * pointer move leaves a version that is still visible and the next
  * commit simply claims n+1 — the table can never wedge on an orphan
  * manifest. (Pointer writes may race and briefly regress; the scan-up
  * self-heals, and the next commit rewrites it.)
  *
  * **Concurrency.** Data dirs carry a per-attempt random token, so racing
  * writers for version n+1 never touch each other's files; the manifest
  * hard-link claim is the only contended resource. The loser's claim
  * throws, it re-reads the (now advanced) current version and retries;
  * its already-written data dir becomes an unreferenced orphan — garbage,
  * never corruption (see [[vacuumOrphans]]).
  *
  * Why this is the 100 TB layout:
  *  - `append` writes ONLY the appended bytes — the new manifest carries
  *    the prior data dirs forward by name; nothing is rewritten or moved.
  *  - Old versions stay readable (`readVersion`) until vacuumed: cheap
  *    time travel for E12-style baselines.
  *  - Read-modify-write on the SAME table is safe: the merge plan reads
  *    version n's files while the commit writes a fresh unique dir, so
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

  /** Pointer file value, if present — a lower bound on the committed
    * version, not the committed version itself (see class doc).
    */
  private def pointer(table: String): Option[Int] = {
    val p = latestPtr(table)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), UTF_8).trim.toInt)
    else None
  }

  /** Current committed version: the pointer rolled forward over any
    * claimed-but-not-yet-pointed manifests (a manifest is the commit
    * point, so each one found is a complete version).
    */
  def currentVersion(table: String): Option[Int] = {
    var v = pointer(table).getOrElse(0)
    while (Files.exists(manifestPath(table, v + 1))) v += 1
    if (v == 0) None else Some(v)
  }

  /** All committed versions, ascending. */
  def versions(table: String): Seq[Int] = currentVersion(table) match {
    case None => Seq.empty
    case Some(cur) =>
      val dir = tableDir(table).resolve("_versions")
      Using.resource(Files.list(dir)) { ls =>
        ls.iterator().asScala
          .map(_.getFileName.toString)
          .collect { case s if s.startsWith("v") && s.endsWith(".manifest") =>
            s.stripPrefix("v").stripSuffix(".manifest").toInt }
          .filter(_ <= cur).toSeq.sorted
      }
  }

  private def manifestLines(table: String, v: Int): Seq[String] = {
    val p = manifestPath(table, v)
    require(Files.exists(p), s"snapshot $table@v$v does not exist")
    new String(Files.readAllBytes(p), UTF_8).split("\n").map(_.trim)
      .filter(_.nonEmpty).toSeq
  }

  private def manifestDirs(table: String, v: Int): Seq[String] =
    manifestLines(table, v).filterNot(_.startsWith("#"))

  /** Deletion-vector header lines of version `v` (possibly empty) —
    * each references a data dir holding (file_path, row_index) tombstone
    * positions that [[readVersion]] anti-joins away. Prefixed lines are
    * invisible to [[manifestDirs]], so pre-DV readers of the same layout
    * degrade to seeing undeleted rows rather than failing.
    */
  private def dvHeaderLines(table: String, v: Int): Seq[String] =
    manifestLines(table, v).filter(_.startsWith(DvPrefix))

  private def dvDirs(table: String, v: Int): Seq[String] =
    dvHeaderLines(table, v).map(_.stripPrefix(DvPrefix))

  private val DvPrefix = "#dv="

  /** Number of deletion vectors version `v` carries — 0 means the
    * version's files ARE its logical content (audit/observability hook;
    * compaction retires vectors, so a persistently high count is the
    * signal to OPTIMIZE).
    */
  def deletionVectors(table: String, v: Int): Int = dvDirs(table, v).size

  /** Every data dir version `v` references — content dirs AND deletion
    * vectors. GC must treat both as live.
    */
  private def referencedDirs(table: String, v: Int): Seq[String] =
    manifestDirs(table, v) ++ dvDirs(table, v)

  /** Version `v`'s carry-forward manifest lines: content dirs plus DV
    * header lines (schema header excluded — the next commit logs its
    * own evolved schema).
    */
  private def referencedLines(table: String, v: Int): Seq[String] =
    manifestDirs(table, v) ++ dvHeaderLines(table, v)

  /** The version's logged schema, if the manifest carries one (versions
    * committed before schema logging don't — readers fall back to
    * parquet footer inference for those).
    */
  def manifestSchema(table: String, v: Int): Option[types.StructType] =
    manifestLines(table, v).find(_.startsWith(SchemaPrefix))
      .map(l => types.DataType.fromJson(l.stripPrefix(SchemaPrefix))
        .asInstanceOf[types.StructType])

  private val SchemaPrefix = "#schema="

  private def nullableAll(s: types.StructType): types.StructType =
    types.StructType(s.fields.map(_.copy(nullable = true)))

  /** Delta-style additive schema evolution: columns keep their logged
    * order, appended frames may ADD columns (they read as NULL in older
    * files), and a same-name column must keep its exact type — silent
    * widening would flip the bytes under existing readers.
    */
  private def evolveSchema(prior: types.StructType,
      next: types.StructType): types.StructType = {
    val priorByName = prior.fields.map(f => f.name -> f).toMap
    next.fields.foreach { f =>
      priorByName.get(f.name).foreach { p =>
        require(p.dataType == f.dataType,
          s"schema evolution: column '${f.name}' type mismatch: " +
            s"${p.dataType.simpleString} (logged) vs " +
            s"${f.dataType.simpleString} (incoming)")
      }
    }
    nullableAll(types.StructType(
      prior.fields ++ next.fields.filter(f => !priorByName.contains(f.name))))
  }

  /** Schema to log for the NEXT version when `df` lands on top of
    * current version `cur` with carry-forward semantics.
    */
  private def evolvedFor(df: DataFrame, table: String,
      cur: Option[Int]): types.StructType = cur match {
    case None => nullableAll(df.schema)
    case Some(v) =>
      val prior = manifestSchema(table, v).getOrElse(
        nullableAll(df.sparkSession.read
          .parquet(versionDataDirs(table, v): _*).schema))
      evolveSchema(prior, df.schema)
  }

  /** Absolute data-directory paths backing committed version `v` — the
    * file-listing entry point for maintenance that operates beside the
    * read path ([[DataSkipping]] stats collection and pruning).
    */
  def versionDataDirs(table: String, v: Int): Seq[String] = {
    val cur = currentVersion(table)
    require(cur.exists(v <= _), s"snapshot $table@v$v is not committed (latest: $cur)")
    manifestDirs(table, v).map(d => dataDir(table, d).toString)
  }

  /** Time-travel read of a specific committed version. When the
    * manifest logs a schema, the read applies it explicitly: older
    * files missing later-added columns yield NULLs (by-name parquet
    * resolution), and no footer-merge scan is ever needed — the log is
    * the source of schema truth, the Delta/Iceberg contract.
    */
  def readVersion(spark: SparkSession, table: String, v: Int): DataFrame = {
    val dirs = versionDataDirs(table, v)
    val base = manifestSchema(table, v) match {
      case Some(st) => spark.read.schema(st).parquet(dirs: _*)
      case None => spark.read.parquet(dirs: _*)
    }
    val dvs = dvDirs(table, v)
    if (dvs.isEmpty) base
    else {
      // Merge-on-read: drop tombstoned (file, position) pairs. The DV
      // set is tiny relative to the corpus by construction (deletes are
      // the exception path), so AQE broadcasts it under the anti-join —
      // the 100 TB read pays no extra shuffle for carrying deletes.
      //
      // Tombstones address files RELATIVE to the table root (the dir
      // name under data/ plus the parquet file name) so that a cloned
      // or relocated table root keeps its deletes — an absolute-URI
      // vector would match nothing after [[cloneTo]] and silently
      // resurrect deleted rows. Pre-relative vectors (column
      // `file_path`, absolute URIs) are still honored for tables
      // written by older commits of this store.
      //
      // Each DV dir is read and normalized SEPARATELY before the union:
      // a table upgraded mid-life carries both formats at once, and a
      // single multi-dir parquet read would resolve the schema from one
      // footer — the other format's key column would read NULL and its
      // tombstones would silently stop matching. Per-dir normalization
      // (legacy file_path → rel_path via the same root-relative
      // extraction the writer uses) makes the union homogeneous, so one
      // anti-join on rel_path honors every vector regardless of vintage.
      import org.apache.spark.sql.functions.{col, regexp_extract}
      val dv = dvs.map { d =>
        val one = spark.read.parquet(dataDir(table, d).toString)
        if (one.columns.contains("rel_path"))
          one.select(col("rel_path"), col("row_index"))
        else
          one.select(
            regexp_extract(col("file_path"), RelPathRegex, 1).as("rel_path"),
            col("row_index"))
      }.reduce(_ unionAll _)
      val outCols = base.columns.toSeq
      base
        .withColumn("_dv_pos", col("_metadata.row_index"))
        .withColumn("_dv_rel",
          regexp_extract(col("_metadata.file_path"), RelPathRegex, 1))
        .join(dv, col("_dv_rel") === dv("rel_path") &&
          col("_dv_pos") === dv("row_index"), "left_anti")
        .select(outCols.map(col): _*)
    }
  }

  /** Greedy prefix match → captures everything after the LAST `/data/`
    * segment: `<dir-name>/<parquet-file>`, the table-root-relative file
    * address deletion vectors are keyed on.
    */
  private val RelPathRegex = ".*/data/(.*)$"

  def read(spark: SparkSession, table: String): DataFrame = {
    val v = currentVersion(table).getOrElse(
      throw new IllegalArgumentException(s"snapshot table $table does not exist"))
    readVersion(spark, table, v)
  }

  /** Write `df` to a fresh writer-unique data dir and return its name.
    * The numeric prefix is advisory (the version the writer was aiming
    * for); the random token is what guarantees no two attempts — racing
    * writers or retries — ever share a directory.
    */
  private def writeData(df: DataFrame, table: String, aimedVersion: Int): String = {
    val tok = java.util.UUID.randomUUID().toString.take(8)
    val name = f"d$aimedVersion%05d-$tok"
    df.write.mode("errorifexists").parquet(dataDir(table, name).toString)
    name
  }

  /** Atomically claim version `v` with the given data-dir list. Returns
    * false if a concurrent writer already claimed it. The temp-write +
    * hard-link publish makes the claim all-or-nothing: readers never see
    * a partial manifest, and a crash before the link leaves only an
    * unreferenced temp file.
    */
  private def tryClaim(table: String, v: Int, dirs: Seq[String],
      schema: Option[types.StructType] = None): Boolean = {
    val mp = manifestPath(table, v)
    Files.createDirectories(mp.getParent)
    val tmp = mp.getParent.resolve(
      s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    // schema header rides IN the manifest so it publishes atomically
    // with the dir list (StructType json is single-line by contract)
    val header = schema.map(SchemaPrefix + _.json).toSeq
    Files.write(tmp, (header ++ dirs).mkString("\n").getBytes(UTF_8))
    try { Files.createLink(mp, tmp); true }
    catch { case _: FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  /** Best-effort pointer advance after a successful claim. Losing a race
    * here is harmless: [[currentVersion]] scans upward from whatever the
    * pointer says.
    */
  private def advancePointer(table: String, v: Int): Unit =
    if (!pointer(table).exists(_ >= v)) {
      val tmp = tableDir(table).resolve(s"_latest.tmp$v")
      Files.write(tmp, v.toString.getBytes(UTF_8))
      Files.move(tmp, latestPtr(table), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }

  /** Commit `df` as the next version. The data is written ONCE (its
    * content does not depend on the version number); only the manifest
    * claim retries under contention, recomputing the carried-forward dir
    * list against each new current version.
    */
  private def commit(df: DataFrame, table: String, carryForward: Boolean): Int = {
    val cur0 = currentVersion(table)
    val dname = writeData(df, table, cur0.getOrElse(0) + 1)
    while (true) {
      val cur = currentVersion(table)
      val next = cur.getOrElse(0) + 1
      // carry-forward keeps BOTH the prior content dirs and the prior
      // deletion vectors — an append must not resurrect deleted rows
      val prior = if (carryForward) cur.map(referencedLines(table, _)).getOrElse(Nil)
                  else Nil
      val schema = if (carryForward) evolvedFor(df, table, cur)
                   else nullableAll(df.schema)
      if (tryClaim(table, next, prior :+ dname, Some(schema))) {
        advancePointer(table, next)
        return next
      }
      // claimed by a concurrent writer: currentVersion now sees (at
      // least) `next`, so the loop always makes progress
    }
    -1 // unreachable
  }

  /** Idempotent tagged append — the exactly-once primitive for streaming
    * sinks. `foreachBatch` delivers at-least-once (a crash between the
    * sink write and the checkpoint commit re-runs the batch on restart);
    * tagging the commit with the batch id makes the retry a no-op: if any
    * data dir referenced by ANY retained manifest carries `tag`, the
    * batch already committed and this returns false without writing. The
    * tag rides in the immutable data-dir name, so the check costs only
    * manifest reads — no side table. The current manifest is checked
    * first (the hit path for append-only chains), then older manifests
    * newest-first — which is what keeps the guarantee across
    * [[compact]]: the rewritten manifest drops the tag markers, but the
    * pre-compaction manifests retain them until [[vacuum]]ed.
    *
    * Retention contract (same as Delta's txnAppId/txnVersion): vacuum
    * must keep at least one manifest horizon longer than the stream's
    * maximum possible re-delivery window (crash-to-restart gap).
    * Vacuuming history younger than that can resurrect an already-
    * committed batch — pick `keepFrom` accordingly. An [[overwrite]]
    * also resets history, which is correct only when the stream's
    * checkpoint restarts with the new table generation.
    */
  def appendIdempotent(df: DataFrame, table: String, tag: String): Boolean = {
    require(tag.nonEmpty && tag.forall(c => c.isLetterOrDigit || c == '_'),
      s"tag must be [A-Za-z0-9_]+: '$tag'")
    val marker = s"-t$tag"
    def committed(): Boolean = versions(table).reverseIterator
      .exists(v => manifestDirs(table, v).exists(_.endsWith(marker)))
    if (committed()) return false
    val cur0 = currentVersion(table)
    val tok = java.util.UUID.randomUUID().toString.take(8)
    val dname = f"d${cur0.getOrElse(0) + 1}%05d-$tok$marker"
    df.write.mode("errorifexists").parquet(dataDir(table, dname).toString)
    while (true) {
      val cur = currentVersion(table)
      val prior = cur.map(referencedLines(table, _)).getOrElse(Nil)
      if (committed()) return false // racing retry won
      if (tryClaim(table, cur.getOrElse(0) + 1, prior :+ dname,
          Some(evolvedFor(df, table, cur)))) {
        advancePointer(table, cur.getOrElse(0) + 1)
        return true
      }
    }
    false // unreachable
  }

  /** New snapshot containing exactly `df` (prior versions stay readable). */
  def overwrite(df: DataFrame, table: String): Unit = commit(df, table, carryForward = false)

  /** New snapshot = prior snapshot + `df`; writes only the new rows. */
  def append(df: DataFrame, table: String): Unit = commit(df, table, carryForward = true)

  /** Merge-on-read DELETE via deletion vectors (the Delta DV shape,
    * position-based): rows of the current version matching `predicate`
    * are recorded as (file_path, row_index) tombstones — via the parquet
    * source's `_metadata` columns — in a fresh data dir referenced by a
    * `#dv=` manifest line. NO content file is rewritten or moved: at
    * 100 TB a delete touching 0.1% of rows costs one pruned scan plus a
    * tombstone write measured in MB, not a table rewrite measured in
    * hours. Readers apply the vectors ([[readVersion]]'s anti-join);
    * prior versions still time-travel to the undeleted state; appends
    * carry the vectors forward; [[compact]] (or any overwrite) commits a
    * data-only manifest, materializing the deletes and retiring the
    * vectors. Positions are computed against the raw files, so deleting
    * an already-deleted row is a harmless no-op under anti-join
    * semantics. Returns the committed version.
    */
  def deleteWhere(spark: SparkSession, table: String,
      predicate: org.apache.spark.sql.Column, maxRetries: Int = 5): Int = {
    import org.apache.spark.sql.functions.{col, regexp_extract}
    var attempt = 0
    while (true) {
      val cur = currentVersion(table).getOrElse(
        throw new IllegalArgumentException(s"snapshot table $table does not exist"))
      val scannedDirs = manifestDirs(table, cur)
      val dirs = versionDataDirs(table, cur)
      val base = manifestSchema(table, cur) match {
        case Some(st) => spark.read.schema(st).parquet(dirs: _*)
        case None => spark.read.parquet(dirs: _*)
      }
      val tok = java.util.UUID.randomUUID().toString.take(8)
      val dname = f"dv${cur + 1}%05d-$tok"
      base.filter(predicate)
        .select(
          regexp_extract(col("_metadata.file_path"), RelPathRegex, 1)
            .as("rel_path"),
          col("_metadata.row_index").as("row_index"))
        .write.mode("errorifexists").parquet(dataDir(table, dname).toString)
      var recompute = false
      while (!recompute) {
        val c = currentVersion(table).get
        if (c != cur && !scannedDirs.forall(manifestDirs(table, c).contains)) {
          // The racing commit was an overwrite/compact: it retired file
          // dirs our tombstones address, so re-aiming the manifest would
          // silently LOSE the delete (stale vectors match nothing).
          // Recompute against the new version — the recompute-on-race
          // discipline [[upsertLoad]] documents. The abandoned vector
          // dir is an orphan, never corruption.
          recompute = true
        } else {
          // append/delete raced in: every scanned file is still carried
          // forward, so the (file, position) tombstones stay valid —
          // re-aim the manifest at the advanced version.
          val lines = referencedLines(table, c) :+ (DvPrefix + dname)
          if (tryClaim(table, c + 1, lines, manifestSchema(table, c))) {
            advancePointer(table, c + 1)
            return c + 1
          }
        }
      }
      attempt += 1
      if (attempt > maxRetries)
        throw new IllegalStateException(
          s"deleteWhere($table): lost the commit race $attempt times " +
            "against content-rewriting commits; giving up")
    }
    -1 // unreachable
  }

  /** Committed version of an overwrite — exposed for callers that want the
    * version number (e.g. to record in scan metadata, S7).
    */
  def commitOverwrite(df: DataFrame, table: String): Int = commit(df, table, carryForward = false)

  /** Three-clause MERGE INTO (the Delta/Iceberg upsert verb):
    *
    * {{{
    *   MERGE INTO <table> USING source ON table.key = source.key
    *   WHEN MATCHED AND deleteWhen THEN DELETE
    *   WHEN MATCHED THEN UPDATE SET * (source row wins)
    *   WHEN NOT MATCHED THEN INSERT *
    * }}}
    *
    * `deleteWhen` is evaluated against the SOURCE row's columns.
    * Implementation is one full-outer id-keyed join classifying every
    * row (insert / update / delete / carry), committed as a new version
    * — the read-modify-write is race-safe for the same reason as
    * [[upsertLoad]] (reads version n's immutable files, writes a fresh
    * dir). This is the full-rewrite merge; at 100 TB pair it with
    * partition-scoped sources (merge one day's partition, not the
    * table) or use [[deleteWhere]]'s vectors for pure deletes. Requires
    * `source` to carry exactly the target's columns. Returns the
    * committed version.
    */
  def mergeInto(spark: SparkSession, table: String, source: DataFrame,
      keyCol: String,
      deleteWhen: Option[org.apache.spark.sql.Column] = None): Int = {
    import org.apache.spark.sql.functions.{col, lit, coalesce, when}
    val target = read(spark, table)
    require(source.columns.sorted.sameElements(target.columns.sorted),
      s"mergeInto: source columns ${source.columns.mkString(",")} != " +
        s"target columns ${target.columns.mkString(",")}")
    // The Delta/Iceberg MERGE contract errors when multiple source rows
    // match one target row; without this check the full-outer join would
    // silently fan the target row out into duplicates. One partial-agg
    // job over the (small) source side, short-circuited at the first
    // offender.
    val dup = source.groupBy(col(keyCol)).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"mergeInto: source has ${dup.head.getLong(1)} rows for key " +
        s"$keyCol=${dup.head.get(0)}; MERGE requires at most one source " +
        "match per target row — deduplicate the source first")
    val cols = target.columns.toSeq
    val s = source
      .withColumn("_del", deleteWhen.getOrElse(lit(false)))
      .select((col(keyCol).as("_sk") +: col("_del") +:
        cols.map(c => col(c).as(s"_s_$c"))): _*)
    val joined = target.join(s, col(keyCol) === col("_sk"), "full_outer")
    val merged = joined
      // WHEN MATCHED AND deleteWhen THEN DELETE (also drops a
      // source-only row flagged for delete — deleting a non-existent
      // key is a no-op, the MERGE contract)
      .filter(!coalesce(col("_del"), lit(false)))
      // source row wins whole (UPDATE SET * / INSERT *) — keyed on the
      // source's presence, NOT value-coalesce, so a legitimately NULL
      // source value updates to NULL instead of resurrecting the old one
      .select(cols.map(c =>
        when(col("_sk").isNotNull, col(s"_s_$c")).otherwise(col(c))
          .as(c)): _*)
    commitOverwrite(merged, table)
  }

  /** S6 transactional upsert load: merge `incoming` into the current
    * snapshot with first-write-wins semantics
    * ([[ResourceCatalog.upsertResources]], graph_loader.go:189-216) and
    * commit the merge as a new version. The merge plan reads version n's
    * immutable files while writing a fresh unique dir — safe even though
    * source and destination are "the same table".
    *
    * Unlike [[append]], the DATA depends on the version it was merged
    * against, so a lost claim race must recompute the merge from the new
    * current version, not just re-aim the manifest — otherwise the racing
    * writer's rows would be silently dropped from the merge base.
    */
  def upsertLoad(spark: SparkSession, table: String, incoming: DataFrame,
      idCol: String = "id", maxRetries: Int = 5): Int = {
    var attempt = 0
    while (true) {
      val cur = currentVersion(table)
      val merged = cur match {
        case Some(v) =>
          ResourceCatalog.upsertResources(readVersion(spark, table, v), incoming, idCol)
        case None => incoming
      }
      val next = cur.getOrElse(0) + 1
      val dname = writeData(merged, table, next)
      // the merge rewrites full content, so the version's schema IS the
      // merged frame's schema
      if (tryClaim(table, next, Seq(dname), Some(nullableAll(merged.schema)))) {
        advancePointer(table, next)
        return next
      }
      attempt += 1
      if (attempt > maxRetries)
        throw new IllegalStateException(
          s"upsertLoad($table): lost the commit race $attempt times; giving up")
    }
    -1 // unreachable
  }

  /** OPTIMIZE-style compaction: rewrite the current snapshot's files into
    * ~`targetFileBytes`-sized ones and commit the rewrite as a new version
    * with IDENTICAL logical content. Every [[append]]/[[upsertLoad]]
    * leaves its own file set, so after N nightly loads a reader opens N
    * commits' worth of small files — at 100 TB the footer/open overhead
    * and lost row-group pruning dominate scan cost; bin-packing restores
    * ~one-file-per-128MB layout. The rewrite reads version n's immutable
    * files and writes a fresh writer-unique dir (never in place), then
    * claims version n+1 ONLY if no other commit landed meanwhile —
    * compaction must not silently drop a concurrent append, so on a lost
    * race it returns None (the orphaned rewrite dir is [[vacuumOrphans]]
    * fodder, never corruption) and the caller retries when quiet.
    *
    * The rewritten dir carries no `-t<tag>` batch markers; exactly-once
    * idempotence survives because [[appendIdempotent]] checks ALL
    * retained manifests, where the pre-compaction chain still records
    * them (see its retention contract before vacuuming aggressively).
    */
  def compact(spark: SparkSession, table: String,
      targetFileBytes: Long = 128L << 20): Option[Int] = {
    val cur = currentVersion(table).getOrElse(
      throw new IllegalArgumentException(s"snapshot table $table does not exist"))
    val totalBytes = manifestDirs(table, cur).map { d =>
      Using.resource(Files.walk(dataDir(table, d))) { walk =>
        walk.iterator().asScala
          .filter(Files.isRegularFile(_)).map(Files.size).sum
      }
    }.sum
    val nFiles = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val compacted = readVersion(spark, table, cur).repartition(nFiles)
    val dname = writeData(compacted, table, cur + 1)
    // logical content is identical, so the schema carries over verbatim
    val schema = manifestSchema(table, cur)
      .getOrElse(nullableAll(compacted.schema))
    if (tryClaim(table, cur + 1, Seq(dname), Some(schema))) {
      advancePointer(table, cur + 1)
      Some(cur + 1)
    } else None
  }

  /** Drop data dirs referenced only by versions below `keepFrom` and their
    * manifests — the GC half of time travel. Never touches dirs the
    * current manifest chain still references.
    */
  def vacuum(table: String, keepFrom: Int): Unit = {
    val keep = versions(table).filter(_ >= keepFrom)
      .flatMap(referencedDirs(table, _)).toSet
    val dropVs = versions(table).filter(_ < keepFrom)
    val drop = dropVs.flatMap(referencedDirs(table, _)).toSet -- keep
    drop.foreach(d => deleteRecursively(dataDir(table, d)))
    dropVs.foreach(v => Files.deleteIfExists(manifestPath(table, v)))
  }

  /** GC for data dirs no manifest references — crashed pre-claim writers
    * and lost-race retries leave these behind. Only dirs whose last
    * modification is older than `olderThanMillis` are removed, so an
    * IN-FLIGHT writer's freshly written (not yet claimed) dir is never
    * swept; pick a horizon comfortably above the longest plausible
    * write-to-claim gap (e.g. hours).
    */
  /** Clone `table` — full version history — into `target`: every
    * REFERENCED data dir (content + deletion vectors; orphans are
    * garbage and stay behind), every manifest, and the pointer. Because
    * dirs are immutable and the manifest is the commit point, a clone
    * is pure file copy with the manifests copied LAST — a reader of the
    * half-copied target sees only whole versions. This is the
    * migration/DR verb (at 100 TB the dir copy is a distcp-style bulk
    * transfer; the protocol is the same). Returns the cloned current
    * version.
    */
  def cloneTo(target: SnapshotTableStore, table: String): Int = {
    val cur = currentVersion(table).getOrElse(
      throw new IllegalArgumentException(s"snapshot table $table does not exist"))
    val vs = versions(table)
    val dirs = vs.flatMap(referencedDirs(table, _)).distinct
    def copyTree(from: Path, to: Path): Unit = {
      Files.createDirectories(to.getParent)
      Using.resource(Files.walk(from)) { walk =>
        walk.forEach { p =>
          val dest = to.resolve(from.relativize(p))
          if (Files.isDirectory(p)) Files.createDirectories(dest)
          else Files.copy(p, dest, StandardCopyOption.REPLACE_EXISTING)
        }
      }
    }
    dirs.foreach(dn =>
      copyTree(dataDir(table, dn), target.dataDir(table, dn)))
    // manifests last: each version becomes visible only complete
    vs.foreach { v =>
      Files.createDirectories(target.manifestPath(table, v).getParent)
      Files.copy(manifestPath(table, v), target.manifestPath(table, v),
        StandardCopyOption.REPLACE_EXISTING)
    }
    target.advancePointer(table, cur)
    cur
  }

  /** Data dirs under `table` that NO retained manifest references —
    * crashed pre-claim writers and lost-race retries. The audit half of
    * [[vacuumOrphans]] (same discovery, no deletion, no age filter):
    * a monitoring job alerts on growth, the GC sweeps with the age
    * guard.
    */
  def orphans(table: String): Seq[String] = {
    val dd = tableDir(table).resolve("data")
    if (!Files.isDirectory(dd)) return Seq.empty
    val referenced = versions(table).flatMap(referencedDirs(table, _)).toSet
    Using.resource(Files.list(dd)) { ls =>
      ls.iterator().asScala.map(_.getFileName.toString)
        .filter(!referenced.contains(_)).toList.sorted
    }
  }

  def vacuumOrphans(table: String, olderThanMillis: Long): Unit = {
    val dd = tableDir(table).resolve("data")
    if (!Files.isDirectory(dd)) return
    val referenced = versions(table).flatMap(referencedDirs(table, _)).toSet
    val cutoff = System.currentTimeMillis() - olderThanMillis
    val orphans = Using.resource(Files.list(dd)) { ls =>
      ls.iterator().asScala
        .filter(p => !referenced.contains(p.getFileName.toString))
        .filter(p => Files.getLastModifiedTime(p).toMillis < cutoff)
        .toList
    }
    orphans.foreach(deleteRecursively)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Using.resource(Files.walk(p)) { walk =>
        walk.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(q => Files.deleteIfExists(q))
      }
}
