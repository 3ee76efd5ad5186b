package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // driver contract: (sfDir, outDir). Extra args are an optional query-name
    // filter for fast local iteration (tools/check.py --skip-verify pairing).
    val (sfDir, outDir, only) = (args(0), args(1), args.drop(2).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          failed += name
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Approximate operators' oracles verify the *emitted* rows: their SQL
    // reads the Spark result parquet this run just wrote, via the
    // __SPARK_OUT__ placeholder resolved to wherever the driver pointed us.
    val outAbs = Paths.get(outDir).toAbsolutePath.toString
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace("__SPARK_OUT__", outAbs))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Coverage high-water guard (round-7 lesson #2): the checked-query
    // count must never silently shrink. VERIFY_HIGHWATER in the repo root
    // records the best-known count; a full run below it fails loudly, and
    // a run above it is the signal to commit a raised file.
    Files.writeString(Paths.get(s"$outDir/verify_meta.json"),
      s"""{"n_queries": ${SparkEntry.queries.size}, """ +
        s""""n_oracles": ${SparkEntry.oracleSql.size}, """ +
        s""""n_failed": ${failed.size}}""")
    // The guard must not silently no-op when the process cwd isn't the
    // repo root — try cwd, then the repo anchor, and WARN loudly if the
    // committed file is findable nowhere (a missing guard is itself the
    // silent-shrink failure mode this exists to catch).
    if (only.isEmpty) {
      val hwPath = Seq(Paths.get("VERIFY_HIGHWATER"),
        Paths.get("/root/repo/VERIFY_HIGHWATER")).find(Files.exists(_))
      hwPath match {
        case Some(p) =>
          val hw = Files.readString(p).trim.toInt
          if (SparkEntry.queries.size < hw) {
            System.err.println(
              s"[verify] query count ${SparkEntry.queries.size} " +
                s"fell below the committed high-water $hw — coverage shrank")
            spark.stop()
            sys.exit(1)
          }
        case None => System.err.println(
          "[verify] WARNING: VERIFY_HIGHWATER not found from cwd " +
            s"${sys.props("user.dir")} — coverage-shrink guard skipped")
      }
    }
    spark.stop()
    // A query that cannot even dump must fail the run visibly: round 7's
    // sweep lost 95 dumps to a testdata schema change yet exited 0, so the
    // driver recorded an all-green 2-query correctness file as success.
    if (failed.nonEmpty) {
      System.err.println(
        s"[verify] ${failed.size} queries failed: ${failed.mkString(", ")}")
      sys.exit(1)
    }
  }
}
