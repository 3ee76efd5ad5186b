package graft.catalog

import org.apache.spark.sql.SparkSession

/** SQL surface for [[SnapshotTableStore]] tables: registers the current
  * version as a temp view named `<table>` and (optionally) every
  * committed version as `<table>_v<N>` — so the guarded query engine,
  * compliance packs, and ad-hoc SQL can query snapshot state and
  * time-travel across versions with plain identifiers (`@`-style
  * suffixes are not valid SQL identifiers without quoting, so versions
  * use the `_vN` convention).
  *
  * Views are lazy plans over the version's immutable file list, so
  * registration costs only a schema read; a later commit does NOT move
  * an already-registered view (immutability is the point of reading a
  * pinned version) — re-register to pick up the new current version.
  */
object SnapshotViews {

  /** Register `table`'s current version as `<table>` plus each committed
    * version `v` as `<table>_v<v>`. Returns the registered view names,
    * current-version view first.
    */
  def register(spark: SparkSession, store: SnapshotTableStore, table: String,
      withVersions: Boolean = true): Seq[String] = {
    store.read(spark, table).createOrReplaceTempView(table)
    val versioned = if (withVersions) store.versions(table).map { v =>
      val name = s"${table}_v$v"
      store.readVersion(spark, table, v).createOrReplaceTempView(name)
      name
    } else Nil
    table +: versioned
  }
}
