package graft.compliance

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.engine.QueryEngine
import graft.functions.JsonMacros

import scala.concurrent.{Await, Future, TimeoutException}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global
import scala.util.Try

/** Pack execution pipeline (reference: pkg/query/compliance/executor.go:
  * 129-244): per enabled query — parameter check + substitution (incl.
  * list→IN expansion), guarded execution with per-query timeout, row →
  * ComplianceResult mapping with status/severity domain validation,
  * progress events, continue-on-error.
  */
object ComplianceExecutor {

  final case class QueryRun(
      queryId: String,
      title: String,
      results: Seq[ComplianceResult],
      error: Option[String],
      durationMs: Long,
      truncated: Boolean = false)

  final case class PackRun(pack: String, runs: Seq[QueryRun]) {
    def passed: Int = runs.flatMap(_.results).count(_.status == "PASS")
    def failed: Int = runs.flatMap(_.results).count(_.status == "FAIL")
    def errors: Int = runs.count(_.error.isDefined)
  }

  /** Dry-run: validate + explain each query without executing (E3,
    * executor.go:247-306). Returns queryId → plan text or error.
    */
  def dryRun(spark: SparkSession, pack: PackManifest,
      params: Map[String, Any]): Map[String, Either[String, String]] = {
    JsonMacros.register(spark)
    pack.queries.filter(_.enabled).map { q =>
      val bound = QueryEngine.bindParams(q.sql, withDefaults(pack, params),
        QueryEngine.escapedLiterals(spark))
      q.id -> (QueryEngine.validate(spark, bound) match {
        case Left(err) => Left(err.message)
        case Right(()) => Try(QueryEngine.explain(spark.sql(bound)))
          .toEither.left.map(_.getMessage)
      })
    }.toMap
  }

  /** Run a pack. `parallelism = 1` (the default) preserves the
    * reference's sequential continue-on-error contract
    * (executor.go:129-244). `parallelism > 1` is the opt-in Spark-native
    * mode: independent pack queries run as CONCURRENT Spark jobs on a
    * bounded pool — the scheduler interleaves their stages across
    * executor slots, so a pack of N small queries stops paying N× the
    * per-job scheduling floor. Result order, per-query timeout,
    * continue-on-error, and the result contract are identical in both
    * modes (asserted in ComplianceSpec); progress events may interleave
    * across queries but are delivered mutually excluded.
    */
  def run(spark: SparkSession, pack: PackManifest,
      params: Map[String, Any],
      onProgress: ProgressEvent => Unit = _ => (),
      timeout: Duration = 30.seconds,
      parallelism: Int = 1): PackRun = {
    JsonMacros.register(spark)
    val allParams = withDefaults(pack, params)
    val enabled = pack.queries.filter(_.enabled)
    val lock = new Object
    val prog: ProgressEvent => Unit =
      if (parallelism <= 1) onProgress
      else e => lock.synchronized(onProgress(e))
    def runOne(q: PackQuery, i: Int): QueryRun = {
      prog(ProgressEvent.QueryStarted(q.id, i + 1, enabled.size))
      val t0 = System.nanoTime()
      val missing = q.parameters.filterNot(allParams.contains)
      if (missing.nonEmpty) {
        val err = s"missing required parameters: ${missing.mkString(", ")}"
        prog(ProgressEvent.QueryFailed(q.id, err))
        QueryRun(q.id, q.title, Nil, Some(err), elapsedMs(t0))
      } else {
        val bound = QueryEngine.bindParams(q.sql, allParams,
          QueryEngine.escapedLiterals(spark))
        try {
          val rows = executeWithTimeout(spark, bound, timeout, q.id)
          val truncated = rows.size > MaxResultRows
          val results = rows.take(MaxResultRows).map(toResult(_, q))
          prog(ProgressEvent.QueryFinished(q.id, results.size, elapsedMs(t0)))
          QueryRun(q.id, q.title, results, None, elapsedMs(t0), truncated)
        } catch {
          case e: Throwable =>
            val msg = categorize(e)
            prog(ProgressEvent.QueryFailed(q.id, msg))
            QueryRun(q.id, q.title, Nil, Some(msg), elapsedMs(t0))
        }
      }
    }
    val runs =
      if (parallelism <= 1) enabled.zipWithIndex.map { case (q, i) => runOne(q, i) }
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
        val ec = scala.concurrent.ExecutionContext.fromExecutorService(pool)
        try enabled.zipWithIndex
          .map { case (q, i) => Future(runOne(q, i))(ec) }
          .map(Await.result(_, Duration.Inf))
        finally pool.shutdown()
      }
    PackRun(pack.fullName, runs)
  }

  private def elapsedMs(t0: Long): Long = (System.nanoTime() - t0) / 1000000

  private def withDefaults(pack: PackManifest,
      params: Map[String, Any]): Map[String, Any] =
    pack.parameters.flatMap(p => p.default.map(p.name -> _)).toMap ++ params

  /** Reference result cap: queries collect at most this many rows
    * (base_change_tracker.go:76-82 caps query limits at 10000), so a
    * runaway pack query cannot OOM the driver. We fetch one row past the
    * cap so the run can tell "exactly at the cap" from "silently cut" and
    * surface [[QueryRun.truncated]] instead of returning an arbitrary,
    * run-dependent subset with no indicator.
    */
  val MaxResultRows = 10000

  /** Per-query timeout via job-group cancellation (executor.go:167-172). */
  private def executeWithTimeout(spark: SparkSession, sql: String,
      timeout: Duration, group: String): Seq[Row] = {
    QueryEngine.validate(spark, sql).left.foreach(e => throw e)
    val sc = spark.sparkContext
    val fut = Future {
      sc.setJobGroup(group, s"compliance:$group", interruptOnCancel = true)
      try spark.sql(sql).limit(MaxResultRows + 1).collect().toSeq
      finally sc.clearJobGroup()
    }
    try Await.result(fut, timeout)
    catch {
      case _: TimeoutException =>
        sc.cancelJobGroup(group)
        throw new RuntimeException(s"query timeout after $timeout")
    }
  }

  /** Row → ComplianceResult with domain validation and contract fallbacks
    * (executor.go:490-567). Unknown status/severity degrade to
    * ERROR/INFO rather than being dropped.
    */
  private[compliance] def toResult(row: Row, q: PackQuery): ComplianceResult = {
    def get(names: String*): String =
      names.iterator
        .flatMap(n => Try(row.getAs[Any](n)).toOption.flatMap(Option(_)))
        .map(String.valueOf)
        .nextOption().getOrElse("")
    val status0 = get("status").toUpperCase
    val severity0 = get("severity").toUpperCase
    ComplianceResult(
      resourceId = get("resource_id", "id"),
      resourceName = get("resource_name", "bucket_name", "name"),
      resourceType = get("resource_type", "type") match {
        case "" => "resource"
        case t => t
      },
      controlId = get("control_id") match { case "" => q.id; case c => c },
      controlName = get("control_name") match { case "" => q.title; case c => c },
      status = if (ComplianceResult.ValidStatuses.contains(status0)) status0 else "ERROR",
      severity = if (ComplianceResult.ValidSeverities.contains(severity0)) severity0
        else q.severity,
      details = get("details", "issue_description"))
  }

  /** Error categorization (executor.go:570-584). */
  private def categorize(e: Throwable): String = {
    val m = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
    if (m.contains("timeout")) s"timeout: $m"
    else if (m.contains("syntax")) s"syntax: $m"
    else if (m.toLowerCase.contains("parameter")) s"parameter: $m"
    else s"execution: $m"
  }
}
