package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructField
import scala.jdk.CollectionConverters._

/** Ad-hoc SQL engine facade mirroring corkscrew's query engine surface
  * (reference: pkg/query/engine.go:16-34 — Execute, ExecuteWithParams,
  * ExecuteStreaming, Validate; column metadata + stats). Catalyst replaces
  * DuckDB for parse/optimize/execute; this layer adds the corkscrew
  * behaviors around it: named-parameter binding with IN-list expansion,
  * statement-class guarding, streaming delivery, result metadata.
  */
object QueryEngine {

  /** engine.go:36-47 ColumnInfo. */
  final case class ColumnInfo(name: String, dataType: String, nullable: Boolean)

  /** engine.go:49-65 QueryStats/QueryResult. */
  final case class QueryResult(
      columns: Seq[ColumnInfo],
      rows: Seq[Row],
      rowCount: Long,
      durationMs: Long)

  final case class QueryValidationError(message: String)
      extends RuntimeException(message)

  /** Statement-class guard (engine.go:368-386 deny-lists DROP/DELETE/
    * UPDATE/INSERT/ALTER/CREATE/TRUNCATE by substring). Robust version:
    * parse the plan and reject anything that is not a pure query. SQL UDF
    * registration done by the engine itself is exempt (it happens before
    * user SQL reaches this guard).
    */
  def validate(spark: SparkSession, sql: String): Either[QueryValidationError, Unit] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    try {
      val plan = spark.sessionState.sqlParser.parsePlan(sql)
      val bad = plan.collectFirst {
        case c: Command              => c.nodeName
        case p: ParsedStatement      => p.nodeName
        case i: InsertIntoStatement  => i.nodeName
      }
      bad match {
        case Some(node) => Left(QueryValidationError(
          s"dangerous operation rejected: statement class $node is not allowed"))
        case None => Right(())
      }
    } catch {
      case e: org.apache.spark.sql.catalyst.parser.ParseException =>
        Left(QueryValidationError(s"syntax error: ${e.getMessage}"))
    }
  }

  /** EXPLAIN probe without execution (engine.go:389-413; dry-run plan text
    * compliance/executor.go:291-297).
    */
  def explain(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  /** Build the validated, parameter-bound DataFrame WITHOUT executing it
    * — the `EXPLAIN <sql>` path. Raw `EXPLAIN` can't ride through
    * [[execute]]: the statement-class guard rejects `ExplainCommand`
    * (it's a Command), so the CLI strips the keyword and formats the
    * inner query's plan itself.
    */
  def frame(spark: SparkSession, sql: String,
      params: Map[String, Any] = Map.empty): DataFrame = {
    val needsTextual = params.values.exists {
      case _: Seq[_] | _: Array[_] => true
      case _ => false
    }
    if (params.isEmpty || needsTextual) {
      val bound = if (params.isEmpty) sql
        else bindParams(sql, params, escapedLiterals(spark))
      validate(spark, bound) match {
        case Left(err) => throw err
        case Right(()) => spark.sql(bound)
      }
    } else validate(spark, sql) match {
      case Left(err) => throw err
      case Right(()) => spark.sql(sql, params)
    }
  }

  /** The plan-level facts PlanQualitySpec pins — filter pushdown reaching
    * the scan, join strategies, shuffle/broadcast exchanges, codegen —
    * extracted from the formatted plan so the CLI's `explain` shows a
    * user exactly what the engine's scale guards assert. Node counts
    * come from the plan TREE (each operator appears once there; the
    * details section would double-count); the pushed-filter count reads
    * the details, where `PushedFilters:` lives.
    */
  def planFacts(df: DataFrame): Seq[(String, String)] = {
    val p = explain(df)
    val tree = p.linesIterator
      .takeWhile(l => !l.trim.startsWith("(")).mkString("\n")
    def occ(tok: String): Int = {
      var i = 0; var c = 0
      while ({ i = tree.indexOf(tok, i); i >= 0 }) { c += 1; i += tok.length }
      c
    }
    val pushed = p.linesIterator.map(_.trim)
      .filter(_.startsWith("PushedFilters:"))
      .count(l => !l.replace(" ", "").contains("PushedFilters:[]"))
    Seq(
      "parquet_scans" -> occ("Scan parquet").toString,
      "scans_with_pushed_filters" -> pushed.toString,
      "broadcast_hash_joins" -> occ("BroadcastHashJoin").toString,
      "sort_merge_joins" -> occ("SortMergeJoin").toString,
      "shuffled_hash_joins" -> occ("ShuffledHashJoin").toString,
      "broadcast_nested_loop_joins" ->
        occ("BroadcastNestedLoopJoin").toString,
      "cartesian_products" -> occ("CartesianProduct").toString,
      "shuffle_exchanges" ->
        (occ("Exchange") - occ("BroadcastExchange")
          - occ("ReusedExchange")).toString,
      "broadcast_exchanges" -> occ("BroadcastExchange").toString,
      "take_ordered_and_project" -> occ("TakeOrderedAndProject").toString,
      // FormattedMode marks operators inside a WholeStageCodegen span
      // with a leading `*` in the tree
      "codegen_operators" ->
        tree.linesIterator.count(_.contains("* ")).toString)
  }

  /** Named-parameter substitution `:name` → literal, with IN-list expansion
    * for Seq values (engine.go:441-456 + compliance/executor.go:397-436).
    * String literals are SQL-escaped; Seq[..] becomes `(a, b, c)`.
    *
    * The substitution is literal-aware: the SQL is scanned once and `:name`
    * markers inside single-quoted strings, backquoted identifiers, or
    * comments are left untouched (a regex replace would rewrite them), and
    * `::` (cast-style) is never treated as a marker. Unknown `:name`
    * markers pass through unchanged so Spark reports them.
    *
    * `escapedLiterals` must mirror the target session's
    * `spark.sql.parser.escapedStringLiterals`: when true, `\` is a literal
    * character to the parser, so string values escape quotes by doubling
    * (`''`) and backslashes pass through untouched; when false (default
    * parser), both `\` and `'` are backslash-escaped. [[execute]] /
    * [[executeParameterized]] read the conf themselves.
    */
  def bindParams(sql: String, params: Map[String, Any],
      escapedLiterals: Boolean = false): String = {
    val sb = new StringBuilder(sql.length + 32)
    val n = sql.length
    var i = 0
    while (i < n) {
      sql.charAt(i) match {
        case '\'' => // string literal: copy verbatim, honoring '' and \' escapes
          sb.append('\''); i += 1
          var open = true
          while (open && i < n) {
            val c = sql.charAt(i)
            sb.append(c)
            if (c == '\\' && i + 1 < n) { sb.append(sql.charAt(i + 1)); i += 2 }
            else if (c == '\'') {
              if (i + 1 < n && sql.charAt(i + 1) == '\'') { sb.append('\''); i += 2 }
              else { open = false; i += 1 }
            } else i += 1
          }
        case '`' => // backquoted identifier
          sb.append('`'); i += 1
          while (i < n && sql.charAt(i) != '`') { sb.append(sql.charAt(i)); i += 1 }
          if (i < n) { sb.append('`'); i += 1 }
        case '-' if i + 1 < n && sql.charAt(i + 1) == '-' => // line comment
          while (i < n && sql.charAt(i) != '\n') { sb.append(sql.charAt(i)); i += 1 }
        case '/' if i + 1 < n && sql.charAt(i + 1) == '*' => // block comment
          sb.append("/*"); i += 2
          while (i < n && !(sql.charAt(i) == '*' && i + 1 < n && sql.charAt(i + 1) == '/')) {
            sb.append(sql.charAt(i)); i += 1
          }
          if (i < n) { sb.append("*/"); i += 2 }
        case ':' if i + 1 < n &&
            (sql.charAt(i + 1).isLetter || sql.charAt(i + 1) == '_') &&
            (i == 0 || { val p = sql.charAt(i - 1)
              p != ':' && !p.isLetterOrDigit && p != '_' }) =>
          var j = i + 1
          while (j < n && (sql.charAt(j).isLetterOrDigit || sql.charAt(j) == '_')) j += 1
          params.get(sql.substring(i + 1, j)) match {
            case Some(v) => sb.append(toLiteral(v, escapedLiterals)); i = j
            case None    => sb.append(':'); i += 1
          }
        case c => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  /** SQL literal for a parameter value. With the default parser, strings
    * escape both the quote AND the backslash (`\` is an escape inside
    * string literals, so a value ending in `\` or containing `\'` would
    * otherwise swallow the closing quote and change statement structure).
    * With `spark.sql.parser.escapedStringLiterals=true` the backslash is
    * literal, so ONLY quotes are escaped — by ANSI `''` doubling, which
    * both parser modes accept.
    */
  private def toLiteral(v: Any, escapedLiterals: Boolean): String = v match {
    case null            => "NULL"
    case s: String =>
      if (escapedLiterals) "'" + s.replace("'", "''") + "'"
      else "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case seq: Seq[_]     => seq.map(toLiteral(_, escapedLiterals))
      .mkString("(", ", ", ")")
    case arr: Array[_]   => toLiteral(arr.toSeq, escapedLiterals)
    case b: Boolean      => b.toString
    case n: java.lang.Number => n.toString
    case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
    case d: java.sql.Date      => s"DATE '$d'"
    case other           => toLiteral(other.toString, escapedLiterals)
  }

  /** The session's `spark.sql.parser.escapedStringLiterals` (bindParams
    * must escape string literals to match the parser that will read them).
    */
  def escapedLiterals(spark: SparkSession): Boolean =
    spark.conf.get("spark.sql.parser.escapedStringLiterals", "false").toBoolean

  private val ExplainRe = "(?is)^\\s*explain\\s+(.*)$".r

  /** EXPLAIN shortcut shared by every execute path (so the remote query
    * API gets it too, not just the CLI): `ExplainCommand` is a Command
    * the statement guard rejects, so the keyword is stripped and the
    * inner query's formatted plan + plan facts come back as a one-row,
    * one-column result under the normal wire contract.
    */
  private def explainResult(spark: SparkSession, sql: String,
      params: Map[String, Any]): Option[QueryResult] = sql match {
    case ExplainRe(inner) =>
      val t0 = System.nanoTime()
      val df = frame(spark, inner, params)
      val text = explain(df) + "\n== Plan Facts ==\n" +
        planFacts(df).map { case (k, v) => s"$k = $v" }.mkString("\n")
      Some(QueryResult(Seq(ColumnInfo("plan", "string", nullable = false)),
        Seq(Row(text)), 1L, (System.nanoTime() - t0) / 1000000))
    case _ => None
  }

  /** Execute guarded SQL, returning corkscrew-shaped result+stats
    * (engine.go:130-229). For large results prefer [[executeStreaming]].
    */
  def execute(spark: SparkSession, sql: String,
      params: Map[String, Any] = Map.empty): QueryResult = {
    explainResult(spark, sql, params).foreach(r => return r)
    val bound = if (params.isEmpty) sql
      else bindParams(sql, params, escapedLiterals(spark))
    validate(spark, bound) match {
      case Left(err) => throw err
      case Right(()) =>
        val t0 = System.nanoTime()
        val df = spark.sql(bound)
        val rows = df.collect().toSeq
        QueryResult(columnsOf(df), rows, rows.size.toLong,
          (System.nanoTime() - t0) / 1000000)
    }
  }

  /** Spark-native parameterized execution (Spark 4 named parameter
    * markers): values are passed to the engine as typed args and never
    * enter the SQL text, so there is no escaping surface at all. This is
    * the preferred path for scalar params. Seq/Array params fall back to
    * [[execute]]'s textual binding — the reference's pack dialect relies
    * on `IN :list` expansion and `split(:csv)` string semantics that
    * markers don't express.
    */
  def executeParameterized(spark: SparkSession, sql: String,
      params: Map[String, Any]): QueryResult = {
    explainResult(spark, sql, params).foreach(r => return r)
    val needsTextual = params.values.exists {
      case _: Seq[_] | _: Array[_] => true
      case _ => false
    }
    if (needsTextual) execute(spark, sql, params)
    else {
      // The statement-class guard parses the raw text; Spark 4's parser
      // accepts named parameter markers, so no pre-binding is needed.
      validate(spark, sql) match {
        case Left(err) => throw err
        case Right(()) =>
          val t0 = System.nanoTime()
          val df = spark.sql(sql, params)
          val rows = df.collect().toSeq
          QueryResult(columnsOf(df), rows, rows.size.toLong,
            (System.nanoTime() - t0) / 1000000)
      }
    }
  }

  def columnsOf(df: DataFrame): Seq[ColumnInfo] =
    df.schema.fields.toSeq.map { case StructField(n, t, nullable, _) =>
      ColumnInfo(n, t.simpleString, nullable)
    }

  /** Streaming result delivery (engine.go:232-365): column info up front,
    * rows via iterator (`toLocalIterator` — one partition in memory at a
    * time), stats in the footer closure. Mirrors the reference's
    * channel-with-EOF-sentinel shape without materializing the result.
    */
  def executeStreaming(spark: SparkSession, sql: String,
      params: Map[String, Any] = Map.empty): (Seq[ColumnInfo], Iterator[Row]) = {
    explainResult(spark, sql, params)
      .foreach(r => return (r.columns, r.rows.iterator))
    val bound = if (params.isEmpty) sql
      else bindParams(sql, params, escapedLiterals(spark))
    validate(spark, bound) match {
      case Left(err) => throw err
      case Right(()) =>
        val df = spark.sql(bound)
        (columnsOf(df), df.toLocalIterator().asInstanceOf[java.util.Iterator[Row]]
          .asScala)
    }
  }

  /** Missing-table hint (cmd/corkscrew/main.go:1238-1330): list catalog
    * tables, suggest nearest by Levenshtein distance ≤ 3.
    */
  def suggestTable(spark: SparkSession, missing: String): Option[String] = {
    val names = spark.catalog.listTables().collect().map(_.name)
    if (names.isEmpty) None
    else {
      val (best, d) = names.map(n => (n, levenshtein(missing.toLowerCase, n.toLowerCase)))
        .minBy(_._2)
      if (d <= 3) Some(best) else None
    }
  }

  private def levenshtein(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val tmp = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = tmp
      }
    }
    dp(b.length)
  }
}
