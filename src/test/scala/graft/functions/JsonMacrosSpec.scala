package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Port of the reference macro validation probes
  * (pkg/query/json_helpers.go:108-152) and the end-to-end canonical query
  * (pkg/query/json_helpers_test.go:247-323 TestComplexQueryExample).
  */
class JsonMacrosSpec extends SparkSpec {
  import JsonMacros._

  private def one(colExpr: org.apache.spark.sql.Column): Any =
    spark.range(1).select(colExpr).collect()(0).get(0)

  private val valid = """{"name":"test","env":"prod","nested":{"key":"value"}}"""

  test("extract_json: valid path") {
    assert(one(extract_json(lit(valid), lit("$.name"))) == "test")
    assert(one(extract_json(lit(valid), lit("$.nested.key"))) == "value")
  }

  test("extract_json: NULL guards (json_helpers.go:27-33)") {
    assert(one(extract_json(lit(null).cast("string"), lit("$.a"))) == null)
    assert(one(extract_json(lit(valid), lit(null).cast("string"))) == null)
    assert(one(extract_json(lit(""), lit("$.a"))) == null)
    assert(one(extract_json(lit("null"), lit("$.a"))) == null)
    assert(one(extract_json(lit("{invalid json"), lit("$.a"))) == null)
    assert(one(extract_json(lit(valid), lit("$.missing"))) == null)
  }

  test("json_path returns fragments (strings keep quotes)") {
    assert(one(json_path(lit(valid), lit("$.name"))) == "\"test\"")
    assert(one(json_path(lit(valid), lit("$.nested"))) == """{"key":"value"}""")
    assert(one(json_path(lit("{bad"), lit("$.a"))) == null)
  }

  test("has_tag: equality / key-exists / guards (json_helpers.go:47-56)") {
    val tags = """{"Environment":"production","Team":"platform"}"""
    assert(one(has_tag(lit(tags), lit("Environment"), lit("production"))) == true)
    assert(one(has_tag(lit(tags), lit("Environment"), lit("dev"))) == false)
    assert(one(has_tag(lit(tags), lit("Environment"), lit(null).cast("string"))) == true)
    assert(one(has_tag(lit(tags), lit("Missing"), lit(null).cast("string"))) == false)
    assert(one(has_tag(lit(null).cast("string"), lit("k"), lit("v"))) == false)
    assert(one(has_tag(lit(""), lit("k"), lit("v"))) == false)
    assert(one(has_tag(lit("{bad"), lit("k"), lit("v"))) == false)
  }

  test("count_tags (json_helpers.go:77-83)") {
    assert(one(count_tags(lit("""{"a":"1","b":"2","c":"3"}"""))) == 3)
    assert(one(count_tags(lit("{}"))) == 0)
    assert(one(count_tags(lit(null).cast("string"))) == 0)
    assert(one(count_tags(lit(""))) == 0)
    assert(one(count_tags(lit("{invalid"))) == 0)
  }

  test("safe_json_extract default (json_helpers.go:87-95)") {
    assert(one(safe_json_extract(lit(valid), lit("$.name"), lit("dflt"))) == "test")
    assert(one(safe_json_extract(lit(valid), lit("$.missing"), lit("dflt"))) == "dflt")
    assert(one(safe_json_extract(lit(null).cast("string"), lit("$.a"), lit("d"))) == "d")
  }

  test("canonical end-to-end query (json_helpers_test.go:247-323)") {
    JsonMacros.register(spark)
    import spark.implicits._
    Seq(
      ("arn:aws:s3:::test-bucket", "test-bucket", "Bucket",
        """{"BucketPolicy":{"Statement":[{"Effect":"Allow","Principal":"*","Action":"s3:GetObject"}]}}""",
        """{"Environment":"production","Team":"platform"}"""))
      .toDF("id", "name", "type", "raw_data", "tags")
      .createOrReplaceTempView("aws_resources")
    val r = spark.sql(
      """SELECT name,
        |  extract_json(raw_data, '$.BucketPolicy.Statement[0].Effect') AS policy_effect,
        |  has_tag(tags, 'Environment', 'production') AS is_prod
        |FROM aws_resources WHERE type = 'Bucket'""".stripMargin).collect()
    assert(r.toSeq == Seq(Row("test-bucket", "Allow", true)))
  }

  test("variant path is value-identical to the extract macro") {
    JsonMacros.register(spark)
    import spark.implicits._
    val inputs = Seq(
      """{"k": 69, "s": "txt", "nested": {"a": 1}}""",
      """{"other": 1}""",
      "{bad json", "", "null", null)
    val df = inputs.zipWithIndex.map { case (j, i) => (i, j) }.toDF("id", "j")
    df.createOrReplaceTempView("vparity")
    val rows = spark.sql(
      """SELECT id,
        |  extract_json(j, '$.k') AS via_macro,
        |  CASE WHEN is_variant_null(try_parse_json(j)) THEN NULL
        |       ELSE variant_get(try_parse_json(j), '$.k', 'string') END AS via_variant
        |FROM vparity""".stripMargin).collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"id=${r.get(0)}: macro=${r.get(1)} variant=${r.get(2)}")
    }
  }
}
