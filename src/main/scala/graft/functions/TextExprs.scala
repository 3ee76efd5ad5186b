package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row text statistics as native expressions. The t8/t11/d8 family
  * previously derived per-document n-gram structure with posexplode +
  * window functions — correct and codegen'd, but the window forces a
  * shuffle keyed on the doc id BEFORE any aggregation, and the row count
  * explodes to one per token. These expressions compute the same values
  * in one pass over the token array per document (the HOF formulation was
  * rejected earlier for the lambda-inlining trap: these are ordinary
  * expressions, so the token-array child is evaluated exactly once).
  * The per-doc shuffle disappears; what reaches the aggregation is
  * vocabulary-sized. At 100 TB this turns the bigram/winnow jobs from
  * (explode n tokens → shuffle n rows) into (scan → map → shuffle only
  * distinct grams).
  *
  * Value compatibility with the window formulation (and the DuckDB
  * oracles) is exact: same token filtering, same separator, same md5-hex
  * lexicographic minima.
  */
object TextExprs {

  private[functions] def nonEmptyTokens(arr: ArrayData): Array[UTF8String] = {
    val n = arr.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (s.numBytes > 0) out += s
      }
      i += 1
    }
    out.toArray
  }

  private val Space = UTF8String.fromString(" ")

  /** Adjacent-token bigrams of the non-empty tokens ("a b"), in order. */
  def bigrams(arr: ArrayData): ArrayData = {
    val toks = nonEmptyTokens(arr)
    if (toks.length < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - 1)
    var i = 1
    while (i < toks.length) {
      out(i - 1) = UTF8String.concat(toks(i - 1), Space, toks(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** (top_bigram_n, n_bigrams, n_distinct_bigrams) over the bigram bag. */
  def repetitionStats(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val bg = bigrams(arr)
    val n = bg.numElements()
    val counts = new java.util.HashMap[UTF8String, Long](n * 2)
    var top = 0L
    var i = 0
    while (i < n) {
      val b = bg.getUTF8String(i)
      val c = counts.merge(b, 1L, (a, x) => a + x)
      if (c > top) top = c
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(top, n.toLong, counts.size.toLong)
  }

  /** Term → occurrence-count map of the non-empty tokens, insertion-
    * ordered. The per-row half of TF-IDF: tf depends only on the row's own
    * text, so counting here (then exploding the map) removes the
    * (doc, term) aggregation shuffle entirely — what leaves the scan is
    * already one row per (doc, term, tf). Keys are cloned on first insert
    * so the returned map never aliases reusable input buffers.
    */
  def termCounts(arr: ArrayData): org.apache.spark.sql.catalyst.util.MapData = {
    val n = arr.numElements()
    val counts = new java.util.LinkedHashMap[UTF8String, java.lang.Long]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (s.numBytes > 0) {
          val prev = counts.get(s)
          if (prev == null) counts.put(s.clone(), java.lang.Long.valueOf(1L))
          else counts.put(s, java.lang.Long.valueOf(prev.longValue() + 1L))
        }
      }
      i += 1
    }
    val k = new Array[Any](counts.size)
    val v = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      k(j) = e.getKey; v(j) = e.getValue.longValue(); j += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new GenericArrayData(k), new GenericArrayData(v))
  }

  /** Winnowing fingerprints: md5-hex of each k-gram (space-joined), then
    * the lexicographic minimum of every complete window of `win`
    * consecutive gram hashes, distinct. Mirrors the posexplode+window
    * formulation exactly (tail positions without k-1 successors and
    * incomplete windows are dropped; tokens are NOT empty-filtered,
    * matching the original).
    */
  def winnowFps(arr: ArrayData, k: Int, win: Int): ArrayData = {
    val n = arr.numElements()
    val nGrams = n - k + 1
    if (nGrams < win) return new GenericArrayData(Array.empty[Any])
    // k-gram md5 hex strings
    val md = java.security.MessageDigest.getInstance("MD5")
    val gh = new Array[UTF8String](nGrams)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        if (!arr.isNullAt(i + j)) sb.append(arr.getUTF8String(i + j).toString)
        j += 1
      }
      md.reset()
      val dig = md.digest(sb.toString.getBytes("UTF-8"))
      val hex = new Array[Byte](32)
      var b = 0
      while (b < 16) {
        val v = dig(b) & 0xff
        hex(b * 2) = Character.forDigit(v >>> 4, 16).toByte
        hex(b * 2 + 1) = Character.forDigit(v & 0xf, 16).toByte
        b += 1
      }
      gh(i) = UTF8String.fromBytes(hex)
      i += 1
    }
    // sliding-window minimum over `win` hashes, distinct, order-stable
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var w0 = 0
    while (w0 + win <= nGrams) {
      var mn = gh(w0)
      var j = 1
      while (j < win) {
        if (gh(w0 + j).compareTo(mn) < 0) mn = gh(w0 + j)
        j += 1
      }
      seen.add(mn)
      w0 += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Unicode NFC canonicalization (java.text.Normalizer). The
    * already-normalized fast path avoids the String round-trip for the
    * common case — web text is overwhelmingly NFC already, so at corpus
    * scale this is a cheap isNormalized scan per row.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `bigrams(array<string>) -> array<string>` */
case class BigramsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bigrams expects array<string>, got ${dt.simpleString}")
  }
  override def nullSafeEval(input: Any): Any =
    TextExprs.bigrams(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TextExprs$$.MODULE$$.bigrams($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `repetition_stats(array<string>) ->
  * struct<top_bigram_n: bigint, n_bigrams: bigint, n_distinct_bigrams: bigint>`
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("top_bigram_n", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct_bigrams", LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects array<string>, got ${dt.simpleString}")
  }
  override def nullSafeEval(input: Any): Any =
    TextExprs.repetitionStats(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TextExprs$$.MODULE$$.repetitionStats($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `term_counts(array<string>) -> map<string,bigint>` (non-empty tokens). */
case class TermCountsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"term_counts expects array<string>, got ${dt.simpleString}")
  }
  override def nullSafeEval(input: Any): Any =
    TextExprs.termCounts(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TextExprs$$.MODULE$$.termCounts($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `winnow_fps(array<string>, k, win) -> array<string>` (distinct). */
case class WinnowExpr(child: Expression, k: Int, win: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects array<string>, got ${dt.simpleString}")
  }
  override def nullSafeEval(input: Any): Any =
    TextExprs.winnowFps(input.asInstanceOf[ArrayData], k, win)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TextExprs$$.MODULE$$.winnowFps($a, $k, $win)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `nfc(string) -> string` — Unicode NFC canonicalization. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"nfc expects string, got ${dt.simpleString}")
  }
  override def nullSafeEval(input: Any): Any =
    TextExprs.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.TextExprs$$.MODULE$$.nfc($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
