package graft.engine

import org.apache.spark.sql.{Row, SparkSession}

/** The remote query API's wire contract, shared by both transports
  * (HTTP+JSON [[QueryServer]] and gRPC [[GrpcQueryServer]]): one JSON
  * rendering of `{columns, rows, rowCount, durationMs}` / `{error,
  * hint?}`, so the reference's single result shape
  * (internal/server/api_server.go:127-180) is identical no matter which
  * wire carried it.
  */
private[engine] object QueryWire {

  def render(r: QueryEngine.QueryResult): String =
    s"""{"columns":${renderColumns(r.columns)},"rows":${renderRows(r.rows)},""" +
      s""""rowCount":${r.rowCount},"durationMs":${r.durationMs}}"""

  def renderColumns(cols: Seq[QueryEngine.ColumnInfo]): String =
    cols.map(c =>
      s"""{"name":${jstr(c.name)},"type":${jstr(c.dataType)},"nullable":${c.nullable}}""")
      .mkString("[", ",", "]")

  def renderRows(rows: Iterable[Row]): String =
    rows.map(renderRow).mkString("[", ",", "]")

  def renderRow(row: Row): String =
    (0 until row.length).map { i =>
      if (row.isNullAt(i)) "null"
      else row.get(i) match {
        // NaN/Infinity have no JSON representation — emit null.
        case d: java.lang.Double if d.isNaN || d.isInfinite => "null"
        case f: java.lang.Float if f.isNaN || f.isInfinite  => "null"
        case n: java.lang.Number  => n.toString
        case b: java.lang.Boolean => b.toString
        case other                => jstr(other.toString)
      }
    }.mkString("[", ",", "]")

  /** `{"error": …}` with the E21 did-you-mean hint when the failure is a
    * missing table (cmd/corkscrew/main.go:1238-1330).
    */
  def renderError(spark: SparkSession, e: Throwable): String = {
    val hint = Option(e.getMessage)
      .flatMap(m => "TABLE_OR_VIEW_NOT_FOUND.*?`(\\w+)`".r
        .findFirstMatchIn(m).map(_.group(1)))
      .flatMap(QueryEngine.suggestTable(spark, _))
      .map(s => s""","hint":${jstr(s"did you mean $s?")}""")
      .getOrElse("")
    s"""{"error":${jstr(String.valueOf(e.getMessage))}$hint}"""
  }

  def jstr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c    => sb.append(c)
    }
    sb.append('"').toString
  }
}
