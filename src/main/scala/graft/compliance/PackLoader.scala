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
    def strs(m: Map[String, Object], k: String): Seq[String] =
      Option(m.getOrElse(k, null))
        .map(_.asInstanceOf[java.util.List[Object]].asScala.toSeq.map(String.valueOf))
        .getOrElse(Nil)
    def anys(m: Map[String, Object], k: String): Seq[Any] =
      Option(m.getOrElse(k, null))
        .map(_.asInstanceOf[java.util.List[Object]].asScala.toSeq: Seq[Any])
        .getOrElse(Nil)
    def strMap(m: Map[String, Object], k: String): Map[String, String] =
      Option(m.getOrElse(k, null))
        .map(_.asInstanceOf[java.util.Map[String, Object]].asScala
          .map { case (kk, vv) => kk -> String.valueOf(vv) }.toMap)
        .getOrElse(Map.empty)

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
          default = p.get("default"),
          validation = Option(p.getOrElse("validation", null))
            .map(_.asInstanceOf[java.util.Map[String, Object]].asScala.toMap
              .map { case (k, v) => k -> (v: Any) })
            .getOrElse(Map.empty),
          examples = anys(p, "examples"))
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
          parameters = strs(q, "parameters"),
          enabled = !q.get("enabled").contains(java.lang.Boolean.FALSE),
          sql = if (Files.exists(sqlPath)) Files.readString(sqlPath) else "",
          description = str(q, "description"),
          objective = str(q, "objective"),
          controlFamily = str(q, "control_family"),
          nistCsf = str(q, "nist_csf"),
          tags = strs(q, "tags"),
          threats = strs(q, "threats"))
      }

    // spec.depends_on: bare fullName strings, or the structured
    // {name, namespace, version, required} maps of reference manifests.
    val dependencies = Option(spec.getOrElse("depends_on", null))
      .map(_.asInstanceOf[java.util.List[Object]].asScala.toSeq)
      .getOrElse(Nil)
      .map {
        case s: String => PackDependency(s, "", "", required = true)
        case m: java.util.Map[_, _] =>
          val d = m.asInstanceOf[java.util.Map[String, Object]].asScala.toMap
          PackDependency(
            name = str(d, "name"),
            namespace = str(d, "namespace"),
            versionConstraint = str(d, "version"),
            required = !d.get("required").contains(java.lang.Boolean.FALSE))
        case other => PackDependency(String.valueOf(other), "", "", required = true)
      }

    val manifest = PackManifest(
      name = str(meta, "name"),
      namespace = str(meta, "namespace"),
      version = str(meta, "version"),
      description = str(meta, "description"),
      provider = str(meta, "provider"),
      dependsOn = dependencies.map(_.ref),
      parameters = params,
      queries = queries,
      author = str(meta, "author"),
      maintainers = strs(meta, "maintainers"),
      tags = strs(meta, "tags"),
      resources = strs(meta, "resources"),
      frameworks = strs(meta, "frameworks"),
      minEngineVersion = str(meta, "min_engine_version"),
      labels = strMap(meta, "labels"),
      annotations = strMap(meta, "annotations"),
      includes = strs(spec, "includes"),
      dependencies = dependencies)
    val errors = validate(manifest)
    if (errors.nonEmpty) throw PackValidationError(errors)
    manifest
  }

  /** Validation rules from pack.go:256-436. */
  def validate(m: PackManifest): Seq[String] = {
    val errs = Seq.newBuilder[String]
    if (m.name.isEmpty) errs += "metadata.name is required"
    if (m.namespace.isEmpty) errs += "metadata.namespace is required"
    else if (m.namespace.split("/", -1) match {
        case Array(a, b) => a.isEmpty || b.isEmpty
        case _ => true
      }) errs += s"metadata.namespace '${m.namespace}' is not publisher/framework"
    if (m.provider.isEmpty) errs += "metadata.provider is required"
    if (m.version.isEmpty) errs += "metadata.version is required"
    else if (semverRe.findFirstIn(m.version).isEmpty)
      errs += s"metadata.version '${m.version}' is not semver (x.y.z)"
    if (m.queries.isEmpty) errs += "spec.queries must not be empty"
    val seenIds = scala.collection.mutable.Set[String]()
    m.queries.foreach { q =>
      if (q.id.isEmpty) errs += "query id is required"
      else if (!seenIds.add(q.id)) errs += s"duplicate query id ${q.id}"
      if (q.title.isEmpty) errs += s"query ${q.id}: title is required"
      if (q.queryFile.isEmpty) errs += s"query ${q.id}: query_file is required"
      else if (q.sql.isEmpty) errs += s"query ${q.id}: query_file ${q.queryFile} not readable"
      if (!ComplianceResult.ValidSeverities.contains(q.severity))
        errs += s"query ${q.id}: invalid severity ${q.severity}"
    }
    val validTypes = Set("string", "int", "float", "bool", "list")
    val seenParams = scala.collection.mutable.Set[String]()
    m.parameters.foreach { p =>
      if (p.name.isEmpty) errs += "parameter name is required"
      else if (!seenParams.add(p.name)) errs += s"duplicate parameter name ${p.name}"
      if (!validTypes.contains(p.paramType))
        errs += s"parameter ${p.name}: invalid type ${p.paramType}"
      if (p.required && p.default.isDefined)
        errs += s"parameter ${p.name}: required parameters cannot have defaults"
      // validation-rule sanity (pack.go:378-436)
      def num(k: String): Option[Double] =
        p.validation.get(k).collect { case n: Number => n.doubleValue }
      num("min_length").foreach(v => if (v < 0)
        errs += s"parameter ${p.name}: min_length cannot be negative")
      num("max_length").foreach(v => if (v < 0)
        errs += s"parameter ${p.name}: max_length cannot be negative")
      for (lo <- num("min_length"); hi <- num("max_length"); if lo > hi)
        errs += s"parameter ${p.name}: min_length cannot be greater than max_length"
      for (lo <- num("min_value"); hi <- num("max_value"); if lo > hi)
        errs += s"parameter ${p.name}: min_value cannot be greater than max_value"
      p.validation.get("pattern").foreach { pat =>
        try java.util.regex.Pattern.compile(String.valueOf(pat))
        catch { case _: java.util.regex.PatternSyntaxException =>
          errs += s"parameter ${p.name}: invalid regex pattern" }
      }
    }
    errs.result()
  }

  /** Resolve a pack and its depends_on closure in topological order, with
    * cycle detection (loader.go:226-307). Dependency refs are fullNames;
    * a structured dependency marked `required: false` that is absent from
    * `available` is skipped (the reference ships manifests that declare
    * optional deps the installation may not have).
    */
  def resolveWithDeps(name: String,
      available: Map[String, PackManifest]): Seq[PackManifest] = {
    val out = Seq.newBuilder[PackManifest]
    val visiting = scala.collection.mutable.Set[String]()
    val done = scala.collection.mutable.Set[String]()
    def visit(n: String, chain: List[String], required: Boolean): Unit = {
      if (done.contains(n)) return
      if (visiting.contains(n))
        throw PackValidationError(Seq(
          s"dependency cycle: ${(chain.reverse :+ n).mkString(" -> ")}"))
      available.get(n) match {
        case None if !required => return
        case None =>
          throw PackValidationError(Seq(s"unknown pack dependency: $n"))
        case Some(m) =>
          visiting += n
          val deps: Seq[(String, Boolean)] =
            if (m.dependencies.nonEmpty) m.dependencies.map(d => d.ref -> d.required)
            else m.dependsOn.map(_ -> true)
          deps.foreach { case (d, req) => visit(d, n :: chain, req) }
          visiting -= n
          done += n
          out += m
      }
    }
    visit(name, Nil, required = true)
    out.result()
  }
}
