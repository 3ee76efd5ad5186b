package graft.compliance

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** YAML pack loader (reference: pkg/query/compliance/pack.go:202-536 parse
  * + validate, loader.go:136-667 discovery / dependency resolution / cycle
  * detection). Engine-agnostic: produces [[PackManifest]] values with SQL
  * text loaded from `query_file` paths relative to the manifest.
  */
object PackLoader {

  private val semverRe = """^\d+\.\d+\.\d+$""".r

  /** Discover every pack under the search paths (a pack = a directory
    * containing manifest.yaml), keyed by fullName (loader.go:177-216).
    */
  def discover(searchPaths: Seq[String]): Map[String, PackManifest] =
    searchPaths.flatMap { root =>
      val p = Paths.get(root)
      if (!Files.isDirectory(p)) Nil
      else scala.util.Using.resource(Files.walk(p)) { walk =>
        walk.iterator().asScala
          .filter(f => f.getFileName.toString == "manifest.yaml")
          .map(load)
          .toList
      }
    }.map(m => m.fullName -> m).toMap

  /** Parse + validate one manifest (pack.go:215-253, :256-375). */
  def load(manifestPath: Path): PackManifest = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = yaml.load[java.util.Map[String, Object]](
      Files.readString(manifestPath))
    def section(m: java.util.Map[String, Object], k: String): Map[String, Object] =
      Option(m.get(k)).map(_.asInstanceOf[java.util.Map[String, Object]].asScala.toMap)
        .getOrElse(Map.empty)
    def str(m: Map[String, Object], k: String, dflt: String = ""): String =
      m.get(k).map(String.valueOf).getOrElse(dflt)

    val meta = section(root, "metadata")
    val spec = section(root, "spec")

    val params = Option(spec.getOrElse("parameters", null))
      .map(_.asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala.toSeq)
      .getOrElse(Nil)
      .map { pm =>
        val p = pm.asScala.toMap
        PackParameter(
          name = str(p, "name"),
          description = str(p, "description"),
          paramType = str(p, "type", "string"),
          required = p.get("required").exists(_ == java.lang.Boolean.TRUE),
          default = p.get("default"))
      }

    val queries = Option(spec.getOrElse("queries", null))
      .map(_.asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala.toSeq)
      .getOrElse(Nil)
      .map { qm =>
        val q = qm.asScala.toMap
        val file = str(q, "query_file")
        val sqlPath = manifestPath.getParent.resolve(file)
        PackQuery(
          id = str(q, "id"),
          title = str(q, "title"),
          severity = str(q, "severity", "MEDIUM"),
          category = str(q, "category", "general"),
          queryFile = file,
          parameters = Option(q.getOrElse("parameters", null))
            .map(_.asInstanceOf[java.util.List[Object]].asScala.toSeq.map(String.valueOf))
            .getOrElse(Nil),
          enabled = !q.get("enabled").contains(java.lang.Boolean.FALSE),
          sql = if (Files.exists(sqlPath)) Files.readString(sqlPath) else "")
      }

    val manifest = PackManifest(
      name = str(meta, "name"),
      namespace = str(meta, "namespace"),
      version = str(meta, "version"),
      description = str(meta, "description"),
      provider = str(meta, "provider"),
      dependsOn = Option(spec.getOrElse("depends_on", null))
        .map(_.asInstanceOf[java.util.List[Object]].asScala.toSeq.map(String.valueOf))
        .getOrElse(Nil),
      parameters = params,
      queries = queries)
    val errors = validate(manifest)
    if (errors.nonEmpty) throw PackValidationError(errors)
    manifest
  }

  /** Validation rules from pack.go:256-375. */
  def validate(m: PackManifest): Seq[String] = {
    val errs = Seq.newBuilder[String]
    if (m.name.isEmpty) errs += "metadata.name is required"
    if (m.namespace.isEmpty) errs += "metadata.namespace is required"
    if (m.version.isEmpty) errs += "metadata.version is required"
    else if (semverRe.findFirstIn(m.version).isEmpty)
      errs += s"metadata.version '${m.version}' is not semver (x.y.z)"
    if (m.queries.isEmpty) errs += "spec.queries must not be empty"
    m.queries.foreach { q =>
      if (q.id.isEmpty) errs += "query id is required"
      if (q.title.isEmpty) errs += s"query ${q.id}: title is required"
      if (q.queryFile.isEmpty) errs += s"query ${q.id}: query_file is required"
      else if (q.sql.isEmpty) errs += s"query ${q.id}: query_file ${q.queryFile} not readable"
      if (!ComplianceResult.ValidSeverities.contains(q.severity))
        errs += s"query ${q.id}: invalid severity ${q.severity}"
    }
    val validTypes = Set("string", "int", "float", "bool", "list")
    m.parameters.foreach { p =>
      if (p.name.isEmpty) errs += "parameter name is required"
      if (!validTypes.contains(p.paramType))
        errs += s"parameter ${p.name}: invalid type ${p.paramType}"
      if (p.required && p.default.isDefined)
        errs += s"parameter ${p.name}: required parameters cannot have defaults"
    }
    errs.result()
  }

  /** Resolve a pack and its depends_on closure in topological order, with
    * cycle detection (loader.go:226-307). Dependency refs are fullNames.
    */
  def resolveWithDeps(name: String,
      available: Map[String, PackManifest]): Seq[PackManifest] = {
    val out = Seq.newBuilder[PackManifest]
    val visiting = scala.collection.mutable.Set[String]()
    val done = scala.collection.mutable.Set[String]()
    def visit(n: String, chain: List[String]): Unit = {
      if (done.contains(n)) return
      if (visiting.contains(n))
        throw PackValidationError(Seq(
          s"dependency cycle: ${(chain.reverse :+ n).mkString(" -> ")}"))
      val m = available.getOrElse(n,
        throw PackValidationError(Seq(s"unknown pack dependency: $n")))
      visiting += n
      m.dependsOn.foreach(d => visit(d, n :: chain))
      visiting -= n
      done += n
      out += m
    }
    visit(name, Nil)
    out.result()
  }
}
