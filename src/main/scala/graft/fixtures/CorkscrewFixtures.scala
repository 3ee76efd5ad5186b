package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.sql.Timestamp

/** Corkscrew-shaped fixture tables (FIXTURES.md A1/A3): the canonical S3
  * bucket profiles from the reference's insert_test_data.sql, shaped for
  * the pack queries' own JSON paths, plus the macro-test row
  * (json_helpers_test.go:272-282) and a small relationship graph.
  * `scanned_at` is frozen — never now().
  */
object CorkscrewFixtures {

  val scannedAt: Timestamp = Timestamp.valueOf("2025-06-20 00:00:00")

  final case class AwsResource(
      id: String, arn: String, name: String, `type`: String, service: String,
      region: String, account_id: String, parent_id: Option[String],
      tags: String, attributes: String, raw_data: String,
      state: Option[String], created_at: Option[Timestamp],
      modified_at: Option[Timestamp], scanned_at: Timestamp)

  private def bucket(name: String, rawData: String,
      tags: String = """{"Environment":"Production"}""",
      attributes: String = "{}"): AwsResource =
    AwsResource(
      id = s"arn:aws:s3:::$name", arn = s"arn:aws:s3:::$name", name = name,
      `type` = "AWS::S3::Bucket", service = "s3", region = "us-east-1",
      account_id = "123456789012", parent_id = None,
      tags = tags, attributes = attributes, raw_data = rawData,
      state = Some("available"), created_at = Some(scannedAt),
      modified_at = Some(scannedAt), scanned_at = scannedAt)

  /** compliant-bucket-001: trusted KMS, full PAB, versioning + lifecycle +
    * deny-delete policy.
    */
  val compliantBucket: AwsResource = bucket("compliant-bucket-001",
    """{"Versioning":{"Status":"Enabled","MfaDelete":"Disabled"},
      |"ServerSideEncryptionConfiguration":{"Rules":[{"ApplyServerSideEncryptionByDefault":{"SSEAlgorithm":"aws:kms","KMSMasterKeyID":"arn:aws:kms:us-east-1:123456789012:key/trusted-key-123"}}]},
      |"PublicAccessBlockConfiguration":{"BlockPublicAcls":"true","BlockPublicPolicy":"true","IgnorePublicAcls":"true","RestrictPublicBuckets":"true"},
      |"LifecycleConfiguration":{"Rules":[{"ID":"expire-old","Status":"Enabled"}]},
      |"Policy":"{\"Statement\":[{\"Effect\":\"Deny\",\"Action\":\"s3:DeleteBucket\",\"Principal\":\"*\"}]}"}"""
      .stripMargin.replace("\n", ""),
    tags = """{"Environment":"Production","Security":"High","Compliance":"Required"}""")

  /** insecure-bucket-002: versioning Suspended, nothing else configured. */
  val insecureBucket: AwsResource = bucket("insecure-bucket-002",
    """{"Versioning":{"Status":"Suspended"}}""",
    tags = """{"Environment":"Development"}""")

  /** partial-bucket-003: versioning + AES256 + PAB, no policy/lifecycle. */
  val partialBucket: AwsResource = bucket("partial-bucket-003",
    """{"Versioning":{"Status":"Enabled"},
      |"ServerSideEncryptionConfiguration":{"Rules":[{"ApplyServerSideEncryptionByDefault":{"SSEAlgorithm":"AES256"}}]},
      |"PublicAccessBlockConfiguration":{"BlockPublicAcls":"true","BlockPublicPolicy":"true","IgnorePublicAcls":"true","RestrictPublicBuckets":"true"}}"""
      .stripMargin.replace("\n", ""))

  /** untrusted-bucket-004: KMS-encrypted with a key outside the trusted
    * list (drives the C01 FAIL path).
    */
  val untrustedBucket: AwsResource = bucket("untrusted-bucket-004",
    """{"Versioning":{"Status":"Enabled"},
      |"ServerSideEncryptionConfiguration":{"Rules":[{"ApplyServerSideEncryptionByDefault":{"SSEAlgorithm":"aws:kms","KMSMasterKeyID":"arn:aws:kms:us-east-1:999999999999:key/rogue-key-999"}}]}}"""
      .stripMargin.replace("\n", ""))

  /** Macro-test row (json_helpers_test.go:272-282). */
  val macroTestBucket: AwsResource = bucket("test-bucket",
    """{"BucketPolicy":{"Statement":[{"Effect":"Allow","Principal":"*","Action":"s3:GetObject"}]}}""",
    tags = """{"Environment":"production","Team":"platform"}""")

  def awsResources(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(compliantBucket, insecureBucket, partialBucket, untrustedBucket,
      macroTestBucket).toDF()
  }

  /** Register `aws_resources` (and edges) as temp views. */
  def register(spark: SparkSession): Unit = {
    awsResources(spark).createOrReplaceTempView("aws_resources")
    relationships(spark).createOrReplaceTempView("cloud_relationships")
  }

  /** Fixture parquet location: inside the repo so the driver's DuckDB
    * oracle can `read_parquet` the very same rows the Spark side queried
    * (the fixtures are otherwise in-memory and invisible to the oracle).
    */
  val parquetDir = "/root/repo/target/fixtures/aws_resources"

  /** Materialize the fixture rows as parquet (idempotent overwrite; rows
    * are deterministic, so every writer produces identical content).
    */
  def writeParquet(spark: SparkSession): Unit =
    awsResources(spark).coalesce(1).write.mode("overwrite").parquet(parquetDir)

  final case class Relationship(
      from_id: String, to_id: String, relationship_type: String,
      provider: String, properties: String, direction: String,
      created_at: Timestamp, discovered_at: Timestamp)

  /** Edge fixture (FIXTURES.md A3): path of length ≥3, a cycle, fan-out. */
  def relationships(spark: SparkSession): DataFrame = {
    import spark.implicits._
    def rel(f: String, t: String, ty: String) =
      Relationship(f, t, ty, "aws", "{}", "outbound", scannedAt, scannedAt)
    Seq(
      rel("arn:aws:s3:::compliant-bucket-001",
        "arn:aws:kms:us-east-1:123456789012:key/trusted-key-123", "encrypted_with"),
      rel("arn:aws:kms:us-east-1:123456789012:key/trusted-key-123",
        "arn:aws:iam::123456789012:role/kms-admin", "governed_by"),
      rel("arn:aws:iam::123456789012:role/kms-admin",
        "arn:aws:iam::123456789012:policy/admin", "governed_by"),
      rel("arn:aws:iam::123456789012:policy/admin",
        "arn:aws:iam::123456789012:role/kms-admin", "assumes"), // cycle
      rel("arn:aws:s3:::insecure-bucket-002", "vpc-1", "contained_in"),
      rel("arn:aws:s3:::partial-bucket-003", "vpc-1", "contained_in"),
      rel("arn:aws:s3:::untrusted-bucket-004", "vpc-1", "contained_in"))
      .toDF()
  }
}
