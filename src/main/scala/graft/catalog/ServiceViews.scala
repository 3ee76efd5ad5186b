package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-service typed views over the generic `aws_resources` table — the
  * Spark-native form of the reference's generated service tables
  * (plugins/aws-provider/schema_generator.go:189-360: aws_s3_buckets,
  * aws_ec2_instances, aws_lambda_functions, aws_rds_instances,
  * aws_dynamodb_tables) and the GCP analysis views
  * (plugins/gcp-provider/db_schema.go:481-509).
  *
  * The reference materializes per-service tables and has scanners populate
  * them; on Spark the idiomatic equivalent is schema-on-read: each view is
  * a `from_json(raw_data, payloadSchema)` projection of the one generic
  * table, so `SELECT * FROM aws_s3_buckets` works with no second copy of
  * the data and no load pipeline. Keys absent from a payload surface as
  * NULL columns (exactly how the reference's nullable columns behave), and
  * Catalyst prunes the JSON parse to the fields a query actually reads.
  *
  * Scale: a view is a projection — predicate pushdown, partition pruning,
  * and column pruning all apply to the underlying scan; at 100 TB the
  * typed layer adds zero storage and the JSON parse is the only cost,
  * paid per referenced field.
  */
object ServiceViews {

  /** S3 bucket payload schema (the fields generator.go's table exposes,
    * as they appear under raw_data).
    */
  val s3Payload: StructType = StructType.fromDDL(
    """Versioning STRUCT<Status: STRING, MfaDelete: STRING>,
      |ServerSideEncryptionConfiguration STRUCT<Rules: ARRAY<STRUCT<
      |  ApplyServerSideEncryptionByDefault: STRUCT<
      |    SSEAlgorithm: STRING, KMSMasterKeyID: STRING>>>>,
      |PublicAccessBlockConfiguration STRUCT<
      |  BlockPublicAcls: STRING, BlockPublicPolicy: STRING,
      |  IgnorePublicAcls: STRING, RestrictPublicBuckets: STRING>,
      |LifecycleConfiguration STRUCT<Rules: ARRAY<STRUCT<
      |  ID: STRING, Status: STRING>>>,
      |Policy STRING""".stripMargin)

  /** EC2 instance payload (schema_generator.go:222-246). */
  val ec2Payload: StructType = StructType.fromDDL(
    """InstanceType STRING,
      |State STRUCT<Name: STRING>,
      |VpcId STRING, SubnetId STRING,
      |SecurityGroups ARRAY<STRUCT<GroupId: STRING, GroupName: STRING>>,
      |KeyName STRING, LaunchTime STRING,
      |Placement STRUCT<AvailabilityZone: STRING>,
      |PrivateIpAddress STRING, PublicIpAddress STRING""".stripMargin)

  /** Lambda function payload (schema_generator.go:262-287). */
  val lambdaPayload: StructType = StructType.fromDDL(
    """FunctionName STRING, Runtime STRING, Handler STRING, Role STRING,
      |CodeSize BIGINT, Description STRING, Timeout INT, MemorySize INT,
      |LastModified STRING, Version STRING,
      |VpcConfig STRUCT<VpcId: STRING, SubnetIds: ARRAY<STRING>>,
      |Environment STRUCT<Variables: MAP<STRING, STRING>>""".stripMargin)

  /** RDS instance payload (schema_generator.go:300-330). */
  val rdsPayload: StructType = StructType.fromDDL(
    """DBInstanceIdentifier STRING, DBName STRING, Engine STRING,
      |EngineVersion STRING, DBInstanceClass STRING,
      |DBInstanceStatus STRING, AllocatedStorage INT,
      |DBSubnetGroup STRUCT<VpcId: STRING, DBSubnetGroupName: STRING>,
      |Endpoint STRUCT<Address: STRING, Port: INT>,
      |BackupRetentionPeriod INT, MultiAZ BOOLEAN,
      |PubliclyAccessible BOOLEAN, StorageEncrypted BOOLEAN""".stripMargin)

  /** DynamoDB table payload (schema_generator.go:344-360). */
  val dynamoPayload: StructType = StructType.fromDDL(
    """TableName STRING, TableStatus STRING, CreationDateTime STRING,
      |ItemCount BIGINT, TableSizeBytes BIGINT,
      |BillingModeSummary STRUCT<BillingMode: STRING>,
      |ProvisionedThroughput STRUCT<
      |  ReadCapacityUnits: BIGINT, WriteCapacityUnits: BIGINT>""".stripMargin)

  private def payloadFor(resources: DataFrame, resourceType: String,
      schema: StructType): DataFrame =
    resources.filter(col("type") === resourceType)
      .withColumn("p", from_json(col("raw_data"), schema))

  /** `aws_s3_buckets`: typed S3 view. `encryption_enabled` = an SSE config
    * is present; `public_access_blocked` = all four PAB flags true (the
    * C02 compliance predicate); JSON-typed columns re-emit their subtree.
    */
  def s3Buckets(resources: DataFrame): DataFrame = {
    val pab = col("p.PublicAccessBlockConfiguration")
    payloadFor(resources, "AWS::S3::Bucket", s3Payload).select(
      col("id"), col("name"), col("region"),
      col("p.Versioning.Status").as("versioning_status"),
      col("p.ServerSideEncryptionConfiguration").isNotNull
        .as("encryption_enabled"),
      (coalesce(pab.getField("BlockPublicAcls"), lit("false")) === "true" &&
        coalesce(pab.getField("BlockPublicPolicy"), lit("false")) === "true" &&
        coalesce(pab.getField("IgnorePublicAcls"), lit("false")) === "true" &&
        coalesce(pab.getField("RestrictPublicBuckets"), lit("false")) === "true")
        .as("public_access_blocked"),
      to_json(col("p.LifecycleConfiguration")).as("lifecycle_configuration"),
      col("tags"), col("scanned_at").as("discovered_at"))
  }

  /** `aws_ec2_instances` (schema_generator.go:222-246). */
  def ec2Instances(resources: DataFrame): DataFrame =
    payloadFor(resources, "AWS::EC2::Instance", ec2Payload).select(
      col("id"), col("name"),
      col("p.InstanceType").as("instance_type"),
      col("p.State.Name").as("state"),
      col("p.VpcId").as("vpc_id"),
      col("p.SubnetId").as("subnet_id"),
      to_json(col("p.SecurityGroups")).as("security_groups"),
      col("p.KeyName").as("key_name"),
      col("p.LaunchTime").as("launch_time"),
      col("p.Placement.AvailabilityZone").as("availability_zone"),
      col("p.PrivateIpAddress").as("private_ip_address"),
      col("p.PublicIpAddress").as("public_ip_address"),
      col("tags"), col("scanned_at").as("discovered_at"))

  /** `aws_lambda_functions` (schema_generator.go:262-287). */
  def lambdaFunctions(resources: DataFrame): DataFrame =
    payloadFor(resources, "AWS::Lambda::Function", lambdaPayload).select(
      col("id"),
      col("p.FunctionName").as("function_name"),
      col("p.Runtime").as("runtime"),
      col("p.Handler").as("handler"),
      col("p.Role").as("role"),
      col("p.CodeSize").as("code_size"),
      col("p.Description").as("description"),
      col("p.Timeout").as("timeout"),
      col("p.MemorySize").as("memory_size"),
      col("p.LastModified").as("last_modified"),
      col("p.Version").as("version"),
      to_json(col("p.VpcConfig")).as("vpc_config"),
      to_json(col("p.Environment")).as("environment"),
      col("tags"), col("scanned_at").as("discovered_at"))

  /** `aws_rds_instances` (schema_generator.go:300-330). */
  def rdsInstances(resources: DataFrame): DataFrame =
    payloadFor(resources, "AWS::RDS::DBInstance", rdsPayload).select(
      col("id"),
      col("p.DBInstanceIdentifier").as("db_instance_identifier"),
      col("p.DBName").as("db_name"),
      col("p.Engine").as("engine"),
      col("p.EngineVersion").as("engine_version"),
      col("p.DBInstanceClass").as("instance_class"),
      col("p.DBInstanceStatus").as("status"),
      col("p.AllocatedStorage").as("allocated_storage"),
      col("p.DBSubnetGroup.VpcId").as("vpc_id"),
      col("p.DBSubnetGroup.DBSubnetGroupName").as("subnet_group"),
      col("p.Endpoint.Address").as("endpoint_address"),
      col("p.Endpoint.Port").as("endpoint_port"),
      col("p.BackupRetentionPeriod").as("backup_retention_period"),
      col("p.MultiAZ").as("multi_az"),
      col("p.PubliclyAccessible").as("publicly_accessible"),
      col("p.StorageEncrypted").as("encrypted"),
      col("tags"), col("scanned_at").as("discovered_at"))

  /** `aws_dynamodb_tables` (schema_generator.go:344-360). */
  def dynamodbTables(resources: DataFrame): DataFrame =
    payloadFor(resources, "AWS::DynamoDB::Table", dynamoPayload).select(
      col("id"),
      col("p.TableName").as("table_name"),
      col("p.TableStatus").as("status"),
      col("p.CreationDateTime").as("creation_date_time"),
      col("p.ItemCount").as("item_count"),
      col("p.TableSizeBytes").as("table_size_bytes"),
      col("p.BillingModeSummary.BillingMode").as("billing_mode"),
      to_json(col("p.ProvisionedThroughput")).as("provisioned_throughput"),
      col("tags"), col("scanned_at").as("discovered_at"))

  /** Register every typed view over the session's `aws_resources` view. */
  def registerAll(spark: SparkSession): Unit = {
    val r = spark.table("aws_resources")
    s3Buckets(r).createOrReplaceTempView("aws_s3_buckets")
    ec2Instances(r).createOrReplaceTempView("aws_ec2_instances")
    lambdaFunctions(r).createOrReplaceTempView("aws_lambda_functions")
    rdsInstances(r).createOrReplaceTempView("aws_rds_instances")
    dynamodbTables(r).createOrReplaceTempView("aws_dynamodb_tables")
  }

  /** The `gcp_iam_analysis` view (db_schema.go:499-509): per service
    * account, how many distinct resources reach it through relationship
    * edges and which service:type combinations they are. `resource_types`
    * is emitted sorted (the reference's array_agg order is
    * engine-incidental; a deterministic order is required for stable
    * results on any engine).
    *
    * Scale: two shuffled joins keyed on ids + one aggregation — the
    * service-account side is usually small enough to broadcast, which
    * Spark does by stats; the edge table is the big side and streams.
    */
  def gcpIamAnalysis(serviceAccounts: DataFrame, relationships: DataFrame,
      resources: DataFrame): DataFrame =
    serviceAccounts.as("sa")
      .join(relationships.as("rel"), col("rel.target_id") === col("sa.id"),
        "left")
      .join(resources.as("r"), col("rel.source_id") === col("r.id"), "left")
      .groupBy(col("sa.email").as("service_account"),
        col("sa.project_id").as("project_id"))
      .agg(
        countDistinct(col("rel.source_id")).as("attached_resources"),
        array_sort(collect_set(
          concat(col("r.service"), lit(":"), col("r.type"))))
          .as("resource_types"))
}
