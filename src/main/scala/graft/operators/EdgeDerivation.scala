package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relationship inference — derive graph edges from raw JSON payloads by
  * field-name patterns (reference: plugins/aws-provider/relationships.go:
  * 94-136 — `vpc…id → contained_in`, `…role arn → assumes`,
  * `…key id/arn → encrypted_with`, etc.; K8s ownerReferences → `owned-by`,
  * kubernetes-provider/relationships.go:18-52).
  *
  * Spark re-expression: parse the payload ONCE as map<string,string>
  * (from_json coerces exactly like get_json_object: numbers to their
  * text, nested objects to their JSON text, nulls to NULL) and explode
  * (field, value) pairs together, match each field against the rule
  * table, and emit one edge per (row, matching field). One parse + one
  * generator + filter — fully distributed, no UDFs, no re-parse per
  * matched field (the previous keys-then-get_json_object shape parsed
  * the payload once for the key list and once more per matching field);
  * the rule table is a literal decision chain inside the expression.
  */
object EdgeDerivation {

  /** Field-name suffix → relationship type, in reference priority order
    * (relationships.go:106-135 vocabulary).
    */
  val defaultRules: Seq[(String, String)] = Seq(
    "vpc_id" -> "contained_in",
    "subnet_id" -> "deployed_in",
    "security_group_id" -> "protected_by",
    "role_arn" -> "assumes",
    "policy_arn" -> "governed_by",
    "kms_key_id" -> "encrypted_with",
    "key_arn" -> "encrypted_with",
    "target_group_arn" -> "targets",
    "load_balancer_arn" -> "load_balanced_by",
    "customer_id" -> "belongs_to",
    "bucket_name" -> "stores_data_in",
    "topic_arn" -> "publishes_to",
    "queue_url" -> "sends_messages_to",
    "stream_arn" -> "streams_to",
    "owner_id" -> "owned-by")

  /** Derive edges from `df`: one row per JSON field of `jsonCol` whose name
    * ends with a rule suffix and whose value is non-null. Output:
    * (from_id, to_id, relationship_type, field).
    */
  def derive(df: DataFrame, idCol: Column, jsonCol: Column,
      rules: Seq[(String, String)] = defaultRules): DataFrame = {
    import org.apache.spark.sql.types.{MapType, StringType}
    val keyed = Spread(df.select(idCol.cast("string").as("from_id"), jsonCol.as("j")))
      .select(col("from_id"),
        explode(from_json(col("j"), MapType(StringType, StringType)))
          .as(Seq("field", "to_id")))
    val relType = rules.foldLeft(lit(null).cast("string")) { case (acc, (suffix, rel)) =>
      when(lower(col("field")).endsWith(suffix), rel).otherwise(acc)
    }
    keyed.withColumn("relationship_type", relType)
      .filter(col("relationship_type").isNotNull && col("to_id").isNotNull)
      .select("from_id", "to_id", "relationship_type", "field")
  }
}
