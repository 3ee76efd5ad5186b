package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** The five corkscrew SQL macros (reference: pkg/query/json_helpers.go:20-105,
  * registered at pkg/query/engine.go:97-102) re-expressed as Catalyst column
  * expressions. They are part of the public query dialect: user SQL and pack
  * SQL may call them by name, so [[register]] installs SQL-callable versions.
  *
  * NULL semantics (must match the reference exactly — the DuckDB oracle
  * checks them):
  *  - extract_json(j, p): NULL when j or p is NULL, j in ('', 'null'), or j
  *    is not valid JSON; else the string value at path p.
  *  - json_path(j, p): same guards, but returns the JSON *fragment* (strings
  *    keep their quotes) like DuckDB's json_extract.
  *  - has_tag(tags, k, v): FALSE on NULL/empty/invalid tags or NULL key;
  *    v = NULL means "key exists"; else string equality.
  *  - count_tags(tags): 0 on bad input, else number of top-level keys.
  *  - safe_json_extract(j, p, d): extract_json with default d on NULL.
  *
  * Everything is built from codegen'd builtins (`get_json_object`,
  * `json_object_keys`, variant functions) — no Scala UDF in the hot path.
  */
object JsonMacros {

  /** j parses as JSON (corkscrew guards with DuckDB json_valid,
    * json_helpers.go:31). `get_json_object(j, '$')` is NULL exactly when the
    * input is unparseable; the literal-'null' case is guarded separately.
    */
  private def jsonValid(j: Column): Column =
    call_function("get_json_object", j, lit("$")).isNotNull || j === "null"

  private def badJson(j: Column): Column =
    j.isNull || j === "" || j === "null" || !jsonValid(j)

  /** json_helpers.go:27-33. Guard note: the full badJson() validity parse
    * is REDUNDANT here — get_json_object natively returns NULL exactly
    * when its own (same) parser fails, so only the literal cases that
    * Jackson would accept ('null', p='$' round-trips) need guarding. One
    * JSON parse per call instead of two; this macro sits in every pack
    * query's hot path.
    */
  def extract_json(j: Column, p: Column): Column =
    when(j.isNull || j === "" || j === "null" || p.isNull,
        lit(null).cast("string"))
      .otherwise(call_function("get_json_object", j, p))

  /** json_helpers.go:37-43 — returns the JSON fragment (DuckDB
    * json_extract): strings stay quoted, objects/arrays are JSON text.
    * `try_parse_json` + `variant_get(.., 'variant')` + `to_json` reproduces
    * that shape with native expressions.
    */
  def json_path(j: Column, p: Column): Column =
    when(badJson(j) || p.isNull, lit(null).cast("string"))
      .otherwise(to_json(call_function(
        "try_variant_get", call_function("try_parse_json", j), p, lit("variant"))))

  /** json_helpers.go:47-56. v NULL => key-exists; else equality. */
  def has_tag(tags: Column, k: Column, v: Column): Column = {
    val extracted = call_function("get_json_object", tags, concat(lit("$."), k))
    when(badJson(tags) || k.isNull, lit(false))
      .otherwise(when(v.isNull, extracted.isNotNull)
        .otherwise(extracted.isNotNull && extracted === v))
  }

  /** json_helpers.go:77-83. 0 on bad input else top-level key count. */
  def count_tags(tags: Column): Column =
    when(badJson(tags), lit(0))
      .otherwise(coalesce(size(call_function("json_object_keys", tags)), lit(0)))
      .cast("int")

  /** json_helpers.go:87-95. */
  def safe_json_extract(j: Column, p: Column, d: Column): Column =
    coalesce(extract_json(j, p), d)

  /** Register SQL-callable versions so `spark.sql` text can use the macro
    * names, mirroring engine.go:97-102. Spark 4 SQL UDFs (`CREATE FUNCTION
    * ... RETURN <expr>`) stay inside Catalyst — the body is inlined and
    * optimized like any expression.
    */
  def register(spark: SparkSession): Unit = {
    val validGuard =
      "j IS NULL OR j = '' OR j = 'null' OR (get_json_object(j, '$') IS NULL AND j <> 'null')"
    // extract_json: literal-only guard — see the scaladoc on the Column
    // twin for why the validity parse is redundant for this macro.
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY FUNCTION extract_json(j STRING, p STRING)
         |RETURNS STRING RETURN
         |CASE WHEN j IS NULL OR j = '' OR j = 'null' OR p IS NULL THEN NULL
         |     ELSE get_json_object(j, p) END""".stripMargin)
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY FUNCTION json_path(j STRING, p STRING)
         |RETURNS STRING RETURN
         |CASE WHEN $validGuard OR p IS NULL THEN NULL
         |     ELSE to_json(try_variant_get(try_parse_json(j), p, 'variant')) END""".stripMargin)
    val tagsGuard =
      "tags IS NULL OR tags = '' OR tags = 'null' OR (get_json_object(tags, '$') IS NULL AND tags <> 'null')"
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY FUNCTION has_tag(tags STRING, k STRING, v STRING)
         |RETURNS BOOLEAN RETURN
         |CASE WHEN $tagsGuard OR k IS NULL THEN false
         |     WHEN v IS NULL THEN get_json_object(tags, concat('$$.', k)) IS NOT NULL
         |     ELSE coalesce(get_json_object(tags, concat('$$.', k)) = v, false) END""".stripMargin)
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY FUNCTION count_tags(tags STRING)
         |RETURNS INT RETURN
         |CASE WHEN $tagsGuard THEN 0
         |     ELSE coalesce(size(json_object_keys(tags)), 0) END""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION safe_json_extract(j STRING, p STRING, d STRING)
        |RETURNS STRING RETURN coalesce(extract_json(j, p), d)""".stripMargin)
  }
}
