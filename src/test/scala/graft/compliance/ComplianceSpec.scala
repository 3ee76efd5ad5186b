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
}
