package graft.catalog

import graft.SparkSpec
import graft.fixtures.CorkscrewFixtures
import org.apache.spark.sql.functions._

/** Typed service views (schema_generator.go:189-360, db_schema.go:499-509)
  * and sample-N schema inference (resource_graph.go:112-128).
  */
class ServiceViewsSpec extends SparkSpec {

  private def s3View = {
    CorkscrewFixtures.register(spark)
    ServiceViews.s3Buckets(spark.table("aws_resources"))
  }

  test("aws_s3_buckets typed view derives per-bucket flags") {
    val rows = s3View
      .select("name", "versioning_status", "encryption_enabled",
        "public_access_blocked")
      .collect().map(r => r.getString(0) ->
        ((Option(r.getString(1)), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(rows("compliant-bucket-001") == ((Some("Enabled"), true, true)))
    assert(rows("insecure-bucket-002") == ((Some("Suspended"), false, false)))
    assert(rows("partial-bucket-003") == ((Some("Enabled"), true, true)))
    assert(rows("untrusted-bucket-004") == ((Some("Enabled"), true, false)))
    assert(rows("test-bucket") == ((None, false, false)))
  }

  test("registerAll exposes SELECT * FROM aws_s3_buckets") {
    CorkscrewFixtures.register(spark)
    ServiceViews.registerAll(spark)
    assert(spark.sql("SELECT * FROM aws_s3_buckets").count() == 5)
    // the other service views exist and are empty over an S3-only fixture
    Seq("aws_ec2_instances", "aws_lambda_functions", "aws_rds_instances",
      "aws_dynamodb_tables").foreach { v =>
      assert(spark.sql(s"SELECT * FROM $v").count() == 0, v)
    }
  }

  test("ec2 / lambda / rds / dynamodb views parse their payloads") {
    import spark.implicits._
    val mk = (t: String, raw: String) =>
      ("id-1", "r1", t, "us-east-1", raw, "{}",
        java.sql.Timestamp.valueOf("2025-06-20 00:00:00"))
    val cols = Seq("id", "name", "type", "region", "raw_data", "tags",
      "scanned_at")

    val ec2 = ServiceViews.ec2Instances(Seq(mk("AWS::EC2::Instance",
      """{"InstanceType":"m5.large","State":{"Name":"running"},
        |"VpcId":"vpc-1","Placement":{"AvailabilityZone":"us-east-1a"},
        |"SecurityGroups":[{"GroupId":"sg-1","GroupName":"default"}]}"""
        .stripMargin.replace("\n", ""))).toDF(cols: _*)).head()
    assert(ec2.getAs[String]("instance_type") == "m5.large")
    assert(ec2.getAs[String]("state") == "running")
    assert(ec2.getAs[String]("availability_zone") == "us-east-1a")
    assert(ec2.getAs[String]("security_groups").contains("sg-1"))

    val lam = ServiceViews.lambdaFunctions(Seq(mk("AWS::Lambda::Function",
      """{"FunctionName":"fn","Runtime":"java17","MemorySize":512,
        |"CodeSize":1024,"Environment":{"Variables":{"K":"V"}}}"""
        .stripMargin.replace("\n", ""))).toDF(cols: _*)).head()
    assert(lam.getAs[String]("function_name") == "fn")
    assert(lam.getAs[Int]("memory_size") == 512)
    assert(lam.getAs[Long]("code_size") == 1024L)
    assert(lam.getAs[String]("environment").contains("\"K\":\"V\""))

    val rds = ServiceViews.rdsInstances(Seq(mk("AWS::RDS::DBInstance",
      """{"DBInstanceIdentifier":"db1","Engine":"postgres",
        |"MultiAZ":true,"StorageEncrypted":true,
        |"Endpoint":{"Address":"db1.example","Port":5432}}"""
        .stripMargin.replace("\n", ""))).toDF(cols: _*)).head()
    assert(rds.getAs[String]("db_instance_identifier") == "db1")
    assert(rds.getAs[Boolean]("multi_az"))
    assert(rds.getAs[Int]("endpoint_port") == 5432)

    val dyn = ServiceViews.dynamodbTables(Seq(mk("AWS::DynamoDB::Table",
      """{"TableName":"t1","TableStatus":"ACTIVE","ItemCount":42,
        |"BillingModeSummary":{"BillingMode":"PAY_PER_REQUEST"}}"""
        .stripMargin.replace("\n", ""))).toDF(cols: _*)).head()
    assert(dyn.getAs[String]("table_name") == "t1")
    assert(dyn.getAs[Long]("item_count") == 42L)
    assert(dyn.getAs[String]("billing_mode") == "PAY_PER_REQUEST")
  }

  test("missing payload keys surface as NULL columns (schema-on-read)") {
    import spark.implicits._
    val df = Seq(("id-1", "r1", "AWS::EC2::Instance", "us-east-1",
      """{"InstanceType":"t3.micro"}""", "{}",
      java.sql.Timestamp.valueOf("2025-06-20 00:00:00")))
      .toDF("id", "name", "type", "region", "raw_data", "tags", "scanned_at")
    val row = ServiceViews.ec2Instances(df).head()
    assert(row.getAs[String]("instance_type") == "t3.micro")
    assert(row.getAs[String]("vpc_id") == null)
    assert(row.getAs[String]("state") == null)
  }

  test("gcp_iam_analysis counts distinct resources and sorts types") {
    import spark.implicits._
    val sa = Seq(("sa-1", "a@p.iam", "p1"), ("sa-2", "b@p.iam", "p1"))
      .toDF("id", "email", "project_id")
    val res = Seq(("r1", "compute", "Instance"), ("r2", "storage", "Bucket"))
      .toDF("id", "service", "type")
    // r1 reaches sa-1 twice (duplicate edge) — distinct count must be 2
    val rel = Seq(("r1", "sa-1"), ("r1", "sa-1"), ("r2", "sa-1"))
      .toDF("source_id", "target_id")
    val out = ServiceViews.gcpIamAnalysis(sa, rel, res)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getSeq[String](3)))).toMap
    assert(out("a@p.iam") == ((2L, Seq("compute:Instance", "storage:Bucket"))))
    assert(out("b@p.iam") == ((0L, Seq.empty[String]))) // no edges
  }

  test("inferred schema matches the typed view on fixture data") {
    CorkscrewFixtures.register(spark)
    val resources = spark.table("aws_resources")
    val schema = SchemaInference.inferJsonSchema(resources, "raw_data")
    // the sampled inference discovers the nested fields the hand-written
    // typed view exposes
    assert(schema.fieldNames.contains("Versioning"))
    assert(schema.fieldNames.contains("PublicAccessBlockConfiguration"))
    val inferred = SchemaInference.inferredView(resources, "raw_data")
      .select(col("name"), col("parsed.Versioning.Status").as("vs"))
    val typed = ServiceViews.s3Buckets(resources)
      .select(col("name"), col("versioning_status").as("vs"))
    assert(inferred.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      typed.collect().map(r => (r.getString(0), r.getString(1))).toSet)
  }
}
