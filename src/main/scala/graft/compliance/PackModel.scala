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
    default: Option[Any],
    // validation rules (pack.go:378-436): pattern / min_length /
    // max_length / min_value / max_value / allowed_values
    validation: Map[String, Any] = Map.empty,
    examples: Seq[Any] = Nil)

final case class PackQuery(
    id: String,
    title: String,
    severity: String,
    category: String,
    queryFile: String,
    parameters: Seq[String],
    enabled: Boolean,
    sql: String,
    // descriptive metadata (pack.go:51-75) — parsed and round-tripped so a
    // reference manifest loses nothing
    description: String = "",
    objective: String = "",
    controlFamily: String = "",
    nistCsf: String = "",
    tags: Seq[String] = Nil,
    threats: Seq[String] = Nil)

/** A spec.depends_on entry — either a bare fullName string or the
  * structured {name, namespace, version, required} map form the reference
  * manifests use (packs/cfi/ccc-storage/manifest.yaml depends_on block).
  */
final case class PackDependency(
    name: String,
    namespace: String,
    versionConstraint: String,
    required: Boolean) {
  def ref: String = if (namespace.nonEmpty) s"$namespace/$name" else name
}

final case class PackManifest(
    name: String,
    namespace: String,
    version: String,
    description: String,
    provider: String,
    dependsOn: Seq[String],
    parameters: Seq[PackParameter],
    queries: Seq[PackQuery],
    // PackMetadata fidelity fields (pack.go:29-47)
    author: String = "",
    maintainers: Seq[String] = Nil,
    tags: Seq[String] = Nil,
    resources: Seq[String] = Nil,
    frameworks: Seq[String] = Nil,
    minEngineVersion: String = "",
    labels: Map[String, String] = Map.empty,
    annotations: Map[String, String] = Map.empty,
    includes: Seq[String] = Nil,
    dependencies: Seq[PackDependency] = Nil) {
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
