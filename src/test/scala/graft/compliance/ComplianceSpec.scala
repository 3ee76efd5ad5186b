package graft.compliance

import graft.SparkSpec
import graft.fixtures.CorkscrewFixtures
import java.nio.file.Paths

/** End-to-end pack execution over the canonical bucket fixtures — the
  * golden acceptance queries of the reference
  * (packs/cfi/ccc-storage/queries, SURVEY.md §5).
  */
class ComplianceSpec extends SparkSpec {

  private lazy val pack = PackLoader.load(
    Paths.get("packs/cfi/ccc-storage/manifest.yaml"))

  test("manifest loads and validates") {
    assert(pack.fullName == "cfi/ccc/ccc-storage")
    assert(pack.version == "1.0.0")
    assert(pack.queries.map(_.id) == Seq(
      "CCC.ObjStor.C01", "CCC.ObjStor.C02", "CCC.ObjStor.C03"))
    assert(pack.queries.forall(_.sql.nonEmpty))
    assert(pack.parameters.find(_.name == "retention_period_days")
      .flatMap(_.default).contains(90))
  }

  test("validation rejects bad manifests") {
    val bad = pack.copy(version = "not-semver", queries = Seq(
      pack.queries.head.copy(severity = "BOGUS")))
    val errs = PackLoader.validate(bad)
    assert(errs.exists(_.contains("semver")))
    assert(errs.exists(_.contains("invalid severity")))
    assert(PackLoader.validate(pack.copy(queries = Nil))
      .exists(_.contains("queries")))
  }

  test("dependency resolution orders deps first and detects cycles") {
    val a = pack.copy(name = "a", dependsOn = Seq("cfi/ccc/b"))
    val b = pack.copy(name = "b", dependsOn = Nil)
    val order = PackLoader.resolveWithDeps("cfi/ccc/a",
      Map("cfi/ccc/a" -> a, "cfi/ccc/b" -> b))
    assert(order.map(_.name) == Seq("b", "a"))
    val cy1 = pack.copy(name = "a", dependsOn = Seq("cfi/ccc/b"))
    val cy2 = pack.copy(name = "b", dependsOn = Seq("cfi/ccc/a"))
    intercept[PackValidationError] {
      PackLoader.resolveWithDeps("cfi/ccc/a",
        Map("cfi/ccc/a" -> cy1, "cfi/ccc/b" -> cy2))
    }
  }

  test("pack runs end-to-end with expected per-bucket verdicts") {
    CorkscrewFixtures.register(spark)
    val run = ComplianceExecutor.run(spark, pack, Map(
      "trusted_kms_keys" ->
        "arn:aws:kms:us-east-1:123456789012:key/trusted-key-123"))
    assert(run.errors == 0, run.runs.flatMap(_.error).mkString("; "))

    def statuses(id: String): Map[String, String] =
      run.runs.find(_.queryId == id).get.results
        .map(r => r.resourceName -> r.status).toMap

    // C01: only KMS-encrypted buckets appear; trusted passes, rogue fails
    assert(statuses("CCC.ObjStor.C01") == Map(
      "compliant-bucket-001" -> "PASS",
      "untrusted-bucket-004" -> "FAIL"))

    // C02: full PublicAccessBlock passes
    assert(statuses("CCC.ObjStor.C02") == Map(
      "compliant-bucket-001" -> "PASS",
      "partial-bucket-003" -> "PASS",
      "insecure-bucket-002" -> "FAIL",
      "untrusted-bucket-004" -> "FAIL",
      "test-bucket" -> "FAIL"))

    // C03: versioning + (lifecycle or deny-delete policy)
    assert(statuses("CCC.ObjStor.C03") == Map(
      "compliant-bucket-001" -> "PASS",
      "insecure-bucket-002" -> "FAIL",
      "partial-bucket-003" -> "FAIL",
      "untrusted-bucket-004" -> "FAIL",
      "test-bucket" -> "FAIL"))

    // contract fields filled from query defs where rows lack them
    val r = run.runs.head.results.head
    assert(r.controlId == "CCC.ObjStor.C01")
    assert(ComplianceResult.ValidSeverities.contains(r.severity))
  }

  test("parallel mode returns byte-identical results in pack order") {
    CorkscrewFixtures.register(spark)
    val params = Map[String, Any]("trusted_kms_keys" ->
      "arn:aws:kms:us-east-1:123456789012:key/trusted-key-123")
    val seq = ComplianceExecutor.run(spark, pack, params)
    val par = ComplianceExecutor.run(spark, pack, params, parallelism = 4)
    assert(par.runs.map(_.queryId) == seq.runs.map(_.queryId), "order changed")
    assert(par.runs.map(r => (r.queryId, r.results, r.error, r.truncated)) ==
      seq.runs.map(r => (r.queryId, r.results, r.error, r.truncated)))
    // continue-on-error survives concurrency: a missing param in one
    // query must not poison its siblings
    val par2 = ComplianceExecutor.run(spark, pack, Map.empty, parallelism = 4)
    assert(par2.runs.find(_.queryId == "CCC.ObjStor.C01").get.error.isDefined)
    assert(par2.runs.find(_.queryId == "CCC.ObjStor.C02").get.error.isEmpty)
  }

  test("missing required parameter is a per-query error, run continues") {
    CorkscrewFixtures.register(spark)
    val run = ComplianceExecutor.run(spark, pack, Map.empty)
    val c01 = run.runs.find(_.queryId == "CCC.ObjStor.C01").get
    assert(c01.error.exists(_.contains("missing required parameters")))
    // C02 has no parameters and still ran
    assert(run.runs.find(_.queryId == "CCC.ObjStor.C02").get.error.isEmpty)
  }

  test("dry run explains without executing") {
    CorkscrewFixtures.register(spark)
    val plans = ComplianceExecutor.dryRun(spark, pack, Map(
      "trusted_kms_keys" -> "arn:aws:kms:us-east-1:123456789012:key/trusted-key-123"))
    assert(plans.size == 3)
    plans.values.foreach(p => assert(p.isRight, p))
    assert(plans("CCC.ObjStor.C02").toOption.get.contains("Physical Plan"))
  }

  test("manifest metadata fidelity fields round-trip (pack.go:29-47)") {
    assert(pack.author == "Cloud Foundry Initiative")
    assert(pack.maintainers == Seq("security-team@example.org"))
    assert(pack.tags == Seq("ccc", "storage", "security", "compliance"))
    assert(pack.resources == Seq("s3", "kms"))
    assert(pack.frameworks == Seq("ccc", "iso27001", "nist"))
    assert(pack.minEngineVersion == "1.0.0")
    assert(pack.labels == Map("category" -> "security", "domain" -> "storage"))
    assert(pack.annotations.get("documentation")
      .exists(_.contains("common-cloud-controls")))
    val c01 = pack.queries.find(_.id == "CCC.ObjStor.C01").get
    assert(c01.controlFamily == "Data" && c01.nistCsf == "PR.DS-1")
    assert(c01.tags.contains("kms") && c01.threats == Seq("CCC.TH01", "CCC.TH06"))
    assert(c01.description.contains("untrusted KMS keys"))
    assert(c01.objective.contains("trusted KMS keys"))
  }

  test("reference manifest parses verbatim when SQL files are present") {
    // Replica of the reference manifest's structural surface
    // (pkg/query/compliance/packs/cfi/ccc-storage/manifest.yaml):
    // structured depends_on maps, parameter validation + examples blocks.
    val dir = tempDir("graft-manifest")
    java.nio.file.Files.createDirectories(dir.resolve("queries"))
    java.nio.file.Files.writeString(dir.resolve("queries/q.sql"), "SELECT 1")
    java.nio.file.Files.writeString(dir.resolve("manifest.yaml"),
      """apiVersion: v1
        |kind: QueryPack
        |metadata:
        |  name: ccc-storage
        |  namespace: cfi/ccc
        |  version: 1.0.0
        |  description: Common Cloud Controls (CCC) for Object Storage
        |  author: Cloud Foundry Initiative
        |  maintainers:
        |    - security-team@example.org
        |  tags: [ccc, storage]
        |  provider: aws
        |  resources: [s3, kms]
        |  frameworks: [ccc, iso27001, nist]
        |  min_engine_version: 1.0.0
        |spec:
        |  parameters:
        |    - name: trusted_kms_keys
        |      description: List of trusted KMS key ARNs
        |      type: list
        |      required: true
        |      validation:
        |        min_length: 1
        |      examples:
        |        - ["arn:aws:kms:us-east-1:123456789012:key/k"]
        |  queries:
        |    - id: CCC.ObjStor.C01
        |      title: Untrusted KMS keys
        |      severity: HIGH
        |      category: security
        |      control_family: Data
        |      nist_csf: PR.DS-1
        |      query_file: queries/q.sql
        |      parameters: [trusted_kms_keys]
        |      threats: [CCC.TH01, CCC.TH06]
        |      enabled: true
        |  depends_on:
        |    - name: ccc-common
        |      namespace: cfi/ccc
        |      version: ">=1.0.0"
        |      required: false
        |  includes:
        |    - ccc-iam-common.yaml
        |""".stripMargin)
    val m = PackLoader.load(dir.resolve("manifest.yaml"))
    assert(m.dependencies ==
      Seq(PackDependency("ccc-common", "cfi/ccc", ">=1.0.0", required = false)))
    assert(m.includes == Seq("ccc-iam-common.yaml"))
    assert(m.parameters.head.validation == Map("min_length" -> 1))
    assert(m.parameters.head.examples.size == 1)
    // optional missing dependency is skipped, not an error (loader.go:226-307)
    val order = PackLoader.resolveWithDeps(m.fullName, Map(m.fullName -> m))
    assert(order.map(_.name) == Seq("ccc-storage"))
  }

  test("results past MaxResultRows cap are flagged truncated") {
    val cap = ComplianceExecutor.MaxResultRows
    def probe(id: String, n: Int) = PackQuery(id, "truncation probe", "LOW",
      "test", "inline", Nil, enabled = true,
      sql = s"""SELECT CAST(id AS STRING) AS resource_id,
                CAST(id AS STRING) AS resource_name,
                'bucket' AS resource_type, '$id' AS control_id,
                'truncation probe' AS control_name, 'PASS' AS status,
                'LOW' AS severity, '' AS details
                FROM range($n)""")
    val p = pack.copy(parameters = Nil,
      queries = Seq(probe("T.Trunc.Over", cap + 5), probe("T.Trunc.At", cap)))
    val run = ComplianceExecutor.run(spark, p, Map.empty)
    val over = run.runs.find(_.queryId == "T.Trunc.Over").get
    assert(over.error.isEmpty, over.error)
    assert(over.truncated, "over-cap query must surface the truncation")
    assert(over.results.size == cap)
    val at = run.runs.find(_.queryId == "T.Trunc.At").get
    assert(!at.truncated, "exactly-at-cap query must NOT be flagged")
    assert(at.results.size == cap)
  }

  test("validation: provider, namespace format, duplicate ids, rule sanity") {
    assert(PackLoader.validate(pack.copy(provider = ""))
      .exists(_.contains("provider")))
    assert(PackLoader.validate(pack.copy(namespace = "noslash"))
      .exists(_.contains("publisher/framework")))
    assert(PackLoader.validate(
      pack.copy(queries = Seq(pack.queries.head, pack.queries.head)))
      .exists(_.contains("duplicate query id")))
    val p0 = pack.parameters.head
    assert(PackLoader.validate(pack.copy(parameters = Seq(p0, p0)))
      .exists(_.contains("duplicate parameter name")))
    assert(PackLoader.validate(pack.copy(parameters = Seq(p0.copy(
      validation = Map("min_value" -> 10, "max_value" -> 1)))))
      .exists(_.contains("min_value cannot be greater")))
    assert(PackLoader.validate(pack.copy(parameters = Seq(p0.copy(
      validation = Map("pattern" -> "[unclosed")))))
      .exists(_.contains("invalid regex")))
  }
}
