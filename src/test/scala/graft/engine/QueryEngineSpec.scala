package graft.engine

import graft.SparkSpec

/** Mirrors pkg/query/engine_test.go: validate/execute/params/dangerous-op
  * rejection, plus the missing-table suggestion (main.go:1238-1330).
  */
class QueryEngineSpec extends SparkSpec {
  import spark.implicits._

  test("dangerous operations are rejected (engine.go:368-386)") {
    Seq(
      "DROP TABLE t", "DELETE FROM t", "UPDATE t SET a = 1",
      "INSERT INTO t VALUES (1)", "ALTER TABLE t ADD COLUMN c INT",
      "CREATE TABLE t (a INT)", "TRUNCATE TABLE t"
    ).foreach { q =>
      assert(QueryEngine.validate(spark, q).isLeft, s"should reject: $q")
    }
  }

  test("SELECT and CTE queries validate") {
    assert(QueryEngine.validate(spark, "SELECT 1").isRight)
    assert(QueryEngine.validate(spark,
      "WITH x AS (SELECT 1 AS a) SELECT a FROM x").isRight)
  }

  test("syntax errors are reported, not thrown") {
    val r = QueryEngine.validate(spark, "SELEC 1 FROMM")
    assert(r.isLeft)
    assert(r.left.exists(_.message.contains("syntax error")))
  }

  test("named params bind with escaping and IN-list expansion") {
    val bound = QueryEngine.bindParams(
      "SELECT * FROM t WHERE a = :name AND b IN :ids AND c > :min",
      Map("name" -> "o'brien", "ids" -> Seq(1, 2, 3), "min" -> 1.5))
    assert(bound ==
      "SELECT * FROM t WHERE a = 'o\\'brien' AND b IN (1, 2, 3) AND c > 1.5")
  }

  test("string params with quotes/backslashes round-trip through the parser") {
    // Adversarial values: trailing backslash, embedded \', quote+backslash
    // combos. Each must come back byte-identical — i.e. the literal can't
    // escape its quotes and alter statement structure.
    Seq("o'brien", "back\\slash\\", "\\'", "a\\'b''c", "\\\\'", "plain")
      .foreach { v =>
        val bound = QueryEngine.bindParams("SELECT :v AS v", Map("v" -> v))
        val got = spark.sql(bound).collect().head.getString(0)
        assert(got == v, s"round-trip failed for <$v>: bound=<$bound> got=<$got>")
      }
  }

  test("params inside string literals, comments, and casts are untouched") {
    val m = Map("p" -> "X")
    assert(QueryEngine.bindParams("SELECT ':p' AS a, :p AS b", m) ==
      "SELECT ':p' AS a, 'X' AS b")
    assert(QueryEngine.bindParams("SELECT :p -- :p comment\n, 1", m) ==
      "SELECT 'X' -- :p comment\n, 1")
    assert(QueryEngine.bindParams("SELECT /* :p */ :p", m) ==
      "SELECT /* :p */ 'X'")
    assert(QueryEngine.bindParams("SELECT a::int, :p FROM t", m) ==
      "SELECT a::int, 'X' FROM t")
    assert(QueryEngine.bindParams("SELECT `col:p`, :p FROM t", m) ==
      "SELECT `col:p`, 'X' FROM t")
  }

  test("native parameterized execution: typed args, no escaping surface") {
    Seq("o'brien", "back\\slash\\", "\\'", "a\\'b''c", "; DROP TABLE x; --")
      .foreach { v =>
        val r = QueryEngine.executeParameterized(spark,
          "SELECT :v AS v, :n + 1 AS n", Map("v" -> v, "n" -> 41))
        assert(r.rows.head.getString(0) == v, s"round-trip failed for <$v>")
        assert(r.rows.head.getInt(1) == 42)
      }
  }

  test("native parameterized path still rejects dangerous statements") {
    intercept[QueryEngine.QueryValidationError] {
      QueryEngine.executeParameterized(spark,
        "DROP TABLE t", Map("x" -> 1))
    }
  }

  test("Seq params fall back to textual IN-list expansion") {
    val r = QueryEngine.executeParameterized(spark,
      "SELECT id FROM range(10) WHERE id IN :ids ORDER BY id",
      Map("ids" -> Seq(2, 5)))
    assert(r.rows.map(_.getLong(0)) == Seq(2L, 5L))
  }

  test("longest-name-first binding avoids prefix capture") {
    val bound = QueryEngine.bindParams(
      "SELECT :region, :region_list", Map("region" -> "us", "region_list" -> Seq("a")))
    assert(bound == "SELECT 'us', ('a')")
  }

  test("execute returns rows, columns, stats") {
    val r = QueryEngine.execute(spark,
      "SELECT 1 AS a, 'x' AS b UNION ALL SELECT 2, 'y'")
    assert(r.rowCount == 2)
    assert(r.columns.map(_.name) == Seq("a", "b"))
    assert(r.columns.map(_.dataType) == Seq("int", "string"))
  }

  test("execute rejects dangerous SQL with typed error") {
    intercept[QueryEngine.QueryValidationError] {
      QueryEngine.execute(spark, "DROP TABLE x")
    }
  }

  test("streaming execute yields iterator") {
    val (cols, it) = QueryEngine.executeStreaming(spark,
      "SELECT id FROM range(10)")
    assert(cols.map(_.name) == Seq("id"))
    assert(it.size == 10)
  }

  test("missing-table suggestion via Levenshtein (main.go:1238-1330)") {
    Seq((1, "a")).toDF("id", "v").createOrReplaceTempView("lineitems_test")
    assert(QueryEngine.suggestTable(spark, "lineitem_test") == Some("lineitems_test"))
    assert(QueryEngine.suggestTable(spark, "zzzzzzzzz") == None)
  }
}
