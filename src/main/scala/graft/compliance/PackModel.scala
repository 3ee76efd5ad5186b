package graft.compliance

/** Compliance query-pack model (reference: pkg/query/compliance/pack.go:
  * 202-536 — YAML manifest with metadata / parameters / queries; result
  * contract compliance/executor.go:371-394, :490-567).
  */
final case class PackParameter(
    name: String,
    description: String,
    paramType: String, // string | int | float | bool | list
    required: Boolean,
    default: Option[Any])

final case class PackQuery(
    id: String,
    title: String,
    severity: String,
    category: String,
    queryFile: String,
    parameters: Seq[String],
    enabled: Boolean,
    sql: String)

final case class PackManifest(
    name: String,
    namespace: String,
    version: String,
    description: String,
    provider: String,
    dependsOn: Seq[String],
    parameters: Seq[PackParameter],
    queries: Seq[PackQuery]) {
  /** `publisher/framework/name` id (loader.go namespace scheme). */
  def fullName: String = s"$namespace/$name"
}

/** E7 result contract: required columns + status/severity domains. */
final case class ComplianceResult(
    resourceId: String,
    resourceName: String,
    resourceType: String,
    controlId: String,
    controlName: String,
    status: String,
    severity: String,
    details: String)

object ComplianceResult {
  val ValidStatuses: Set[String] = Set("PASS", "FAIL", "WARNING", "ERROR")
  val ValidSeverities: Set[String] = Set("CRITICAL", "HIGH", "MEDIUM", "LOW", "INFO")
  /** Ordered severities, LOW < MEDIUM < HIGH < CRITICAL
    * (change_analytics.go:821 comparison).
    */
  val SeverityOrdinal: Map[String, Int] =
    Map("INFO" -> 0, "LOW" -> 1, "MEDIUM" -> 2, "HIGH" -> 3, "CRITICAL" -> 4)
}

final case class PackValidationError(errors: Seq[String])
    extends RuntimeException(errors.mkString("; "))

sealed trait ProgressEvent
object ProgressEvent {
  final case class QueryStarted(id: String, index: Int, total: Int) extends ProgressEvent
  final case class QueryFinished(id: String, rows: Long, durationMs: Long) extends ProgressEvent
  final case class QueryFailed(id: String, error: String) extends ProgressEvent
}
