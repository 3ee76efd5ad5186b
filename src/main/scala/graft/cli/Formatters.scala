package graft.cli

import org.apache.spark.sql.{DataFrame, Row}

/** Result formatters (reference: pkg/query/formatter.go — CSV :138-206,
  * JSON :209-292, width-aware table :294-433; batch + streaming variants).
  * Pure presentation: operates on collected rows or a row iterator, never
  * triggers distributed work beyond what the caller hands it.
  */
object Formatters {

  val MaxColumnWidth = 50 // formatter.go table width cap

  private def cell(v: Any): String = v match {
    case null => "NULL" // formatter.go renders NULL explicitly
    case arr: Array[_] => arr.mkString("[", ", ", "]")
    case s: Seq[_] => s.mkString("[", ", ", "]")
    case other => other.toString
  }

  private def truncate(s: String, max: Int): String =
    if (s.length <= max) s else s.take(max - 3) + "..."

  /** CSV with proper quoting (formatter.go:138-206). */
  def csv(columns: Seq[String], rows: Iterator[Row]): String = {
    def esc(s: String): String =
      if (s.contains(",") || s.contains("\"") || s.contains("\n"))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    val sb = new StringBuilder(columns.map(esc).mkString(","))
    rows.foreach { r =>
      sb.append('\n')
      sb.append((0 until r.length).map(i => esc(cell(r.get(i)))).mkString(","))
    }
    sb.toString
  }

  /** JSON array-of-objects (formatter.go:209-292). */
  def json(columns: Seq[String], rows: Iterator[Row]): String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def jval(v: Any): String = v match {
      case null => "null"
      case b: Boolean => b.toString
      case n: Byte => n.toString
      case n: Short => n.toString
      case n: Int => n.toString
      case n: Long => n.toString
      // NaN/Infinity have no JSON representation — emit null.
      case n: Float => if (n.isNaN || n.isInfinite) "null" else n.toString
      case n: Double => if (n.isNaN || n.isInfinite) "null" else n.toString
      case n: java.math.BigDecimal => n.toPlainString
      case other => q(cell(other))
    }
    rows.map { r =>
      columns.indices.map(i => s"${q(columns(i))}: ${jval(r.get(i))}")
        .mkString("{", ", ", "}")
    }.mkString("[", ",\n", "]")
  }

  /** Width-aware ASCII table (formatter.go:294-433): column width =
    * max(header, widest cell) capped at MaxColumnWidth, cells truncated
    * with an ellipsis.
    */
  def table(columns: Seq[String], rowSeq: Seq[Row],
      maxWidth: Int = MaxColumnWidth): String = {
    val cells = rowSeq.map(r => columns.indices.map(i => cell(r.get(i))))
    val widths = columns.indices.map { i =>
      math.min(maxWidth,
        (columns(i).length +: cells.map(_(i).length)).max)
    }
    def fmtRow(vals: Seq[String]): String =
      vals.zip(widths).map { case (v, w) =>
        truncate(v, w).padTo(w, ' ')
      }.mkString("| ", " | ", " |")
    val sep = widths.map("-" * _).mkString("+-", "-+-", "-+")
    val sb = new StringBuilder
    sb.append(sep).append('\n')
    sb.append(fmtRow(columns)).append('\n')
    sb.append(sep).append('\n')
    cells.foreach(c => sb.append(fmtRow(c)).append('\n'))
    sb.append(sep)
    sb.append(s"\n${rowSeq.size} row(s)")
    sb.toString
  }

  /** Streaming-friendly table over a DataFrame: caps driver memory by
    * taking at most `maxRows` (formatter streaming threshold,
    * corkscrew.yaml:69).
    */
  def tableOf(df: DataFrame, maxRows: Int = 10000): String =
    table(df.columns.toSeq, df.take(maxRows).toSeq)

  def format(kind: String, df: DataFrame): String = kind match {
    case "csv" => csv(df.columns.toSeq, df.toLocalIterator().asScala())
    case "json" => json(df.columns.toSeq, df.toLocalIterator().asScala())
    case _ => tableOf(df)
  }

  private implicit class JIter[T](it: java.util.Iterator[T]) {
    def asScala(): Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }
}
