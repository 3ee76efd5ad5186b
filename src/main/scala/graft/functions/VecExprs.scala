package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over `array<float>`/`array<double>` — the hot loop
  * of every similarity operator. The `zip_with`+`aggregate` HOF formulation
  * is interpreted (per-element lambda dispatch, boxing); this expression
  * compiles to a tight primitive loop inside whole-stage codegen, ~50×
  * faster at 100 TB scan scale.
  *
  * Accumulation is sequential left-to-right in double precision — bit-
  * compatible with the HOF version and with the DuckDB oracle's
  * SUM-over-UNNEST, so correctness hashes are unchanged.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<float>/array<double>, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getA = if (elemIsFloat(left)) s"(double) $a.getFloat($i)"
        else s"$a.getDouble($i)"
      val getB = if (elemIsFloat(right)) s"(double) $b.getFloat($i)"
        else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ($getA) * ($getB);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Intersection size of two SORTED distinct `array<long>` columns — the
  * Jaccard hot loop as a codegen'd merge (O(n+m), no per-element lambda
  * dispatch, no hash-set allocation). Inputs must be sorted ascending and
  * duplicate-free (see Dedup.hashedShingles).
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"arr_inter expects two array<bigint>, got ${l.simpleString}, ${r.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0L
    while (i < x.numElements() && j < y.numElements()) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { n += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1 else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; long $n = 0L;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $n++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash over a token array — per-bit majority vote of the
  * xxhash64(token) bits. Bit-compatible with the `aggregate`/`zip_with`
  * HOF formulation it replaces (same xxhash64 seed-42 per token, same
  * +1/-1 vote, same `count > 0` bit rule), but one tight loop instead of
  * 64 interpreted lambda evaluations per token (~100× on the documents
  * table). Null tokens vote like the HOF version: xxhash64(NULL) = seed.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${dt.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64Expr.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.SimHash64Expr$$.MODULE$$.simhash($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64Expr {
  /** Static hot loop, shared by interpreted eval and generated code. */
  def simhash(toks: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      // xxhash64(token) with Spark's default seed 42; NULL hashes to seed
      // (HashExpression skips null children, leaving the accumulator).
      val h =
        if (toks.isNullAt(t)) 42L
        else {
          val s = toks.getUTF8String(t)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
        bit += 1
      }
      t += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }
}

/** MinHash signature over an already-hashed shingle array: for each of k
  * seeds, min over xxhash64(shingle, seed). Bit-compatible with the
  * `transform(sequence, array_min(transform(...)))` HOF formulation
  * (XXH64.hashLong per element, seed = band index), but a single k×n
  * primitive loop. Empty input yields an array of xxhash-of-nothing =
  * seed-hash? — matches HOF: array_min([]) is NULL, so we return nulls.
  */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${dt.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSigExpr.signature(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.MinHashSigExpr$$.MODULE$$.signature($a, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigExpr {
  /** h_i(s) = xxhash64(s, i) exactly as the HOF computed it: the two-column
    * hash chains from base seed 42 — hashInt(i, hashLong(s, 42)) (the seed
    * index is an int element, so the chain uses the int hasher). The
    * element base hash is computed once per element, not once per seed.
    */
  def signature(sh: ArrayData, k: Int): ArrayData = {
    val n = sh.numElements()
    val base = new Array[Long](n)
    var i = 0
    while (i < n) { base(i) = XXH64.hashLong(sh.getLong(i), 42L); i += 1 }
    val out = new Array[Any](k)
    if (n > 0) {
      var seed = 0
      while (seed < k) {
        var mn = Long.MaxValue
        i = 0
        while (i < n) {
          val h = XXH64.hashInt(seed, base(i))
          if (h < mn) mn = h
          i += 1
        }
        out(seed) = mn
        seed += 1
      }
    } // else: all-null array, matching array_min of an empty array
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Multi-table hyperplane LSH buckets: for each of `tables` tables, the
  * bit-packed signs of `nBits` plane projections — one expression instead
  * of tables×nBits literal-array dot products (whose plan build dominates
  * small queries; the plane matrix here is derived DATA, not AST). Values
  * are bit-identical to the literal-plane formulation: same deterministic
  * plane components (the xxhash64 chain of
  * graft.operators.Similarity.planeComponent), same left-to-right double
  * accumulation, same `> 0` sign rule.
  */
case class LshBucketsExpr(child: Expression, nBits: Int, tables: Int,
    dim: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets expects array<float>/array<double>, got ${dt.simpleString}")
  }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // row-major [tables*nBits][dim]; rebuilt lazily per JVM (deterministic)
  @transient private lazy val planes: Array[Double] = {
    val out = new Array[Double](tables * nBits * dim)
    var bb = 0
    while (bb < tables * nBits) {
      var i = 0
      while (i < dim) {
        out(bb * dim + i) = LshBucketsExpr.planeComponent(bb, i)
        i += 1
      }
      bb += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = math.min(vec.numElements(), dim)
    val isF = elemIsFloat
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < nBits) {
        val base = (t * nBits + b) * dim
        var acc = 0.0
        var i = 0
        while (i < n) {
          val v = if (isF) vec.getFloat(i).toDouble else vec.getDouble(i)
          acc += v * planes(base + i)
          i += 1
        }
        if (acc > 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Nearest-centroid assignment for the IVF index: argmin of squared
  * Euclidean distance over the (data-carried) centroid matrix; ties break
  * to the lowest cell index. The per-row hot loop of index assignment —
  * one expression over the scan instead of an MLlib transform.
  */
case class NearestCellExpr(child: Expression,
    centroids: Array[Array[Float]]) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell expects array<float>, got ${dt.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = vec.numElements()
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val len = math.min(n, cen.length)
      var acc = 0.0
      var i = 0
      while (i < len) {
        val d = vec.getFloat(i).toDouble - cen(i)
        acc += d * d
        i += 1
      }
      if (acc < bestD) { bestD = acc; best = c }
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBucketsExpr {
  /** Deterministic pseudo-gaussian plane component in [-1, 1] for LSH bit
    * `bb`, dimension `i` — the canonical formula (Similarity delegates
    * here so literal-plane and expression paths stay bit-identical).
    */
  def planeComponent(bb: Int, i: Int): Double = {
    val h = XXH64.hashInt(i, XXH64.hashInt(bb, 42L))
    val m = 2000001L
    (((h % m) + m) % m).toDouble / 1000000.0 - 1.0
  }
}

object VecExprs {

  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name expects an int literal, got $other")
  }

  /** name → builder for every graft native SQL function — the single
    * source shared by the per-session [[register]] path and the
    * session-build injection path ([[graft.GraftExtensions]]).
    */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (exprs => VecDot(exprs(0), exprs(1))),
    "arr_inter" -> (exprs => SortedLongIntersectCount(exprs(0), exprs(1))),
    "simhash64" -> (exprs => SimHash64Expr(exprs(0))),
    "minhash_sig" -> (exprs =>
      MinHashSigExpr(exprs(0), intLit(exprs(1), "minhash_sig k"))),
    "bigrams" -> (exprs => BigramsExpr(exprs(0))),
    "repetition_stats" -> (exprs => RepetitionStatsExpr(exprs(0))),
    "term_counts" -> (exprs => TermCountsExpr(exprs(0))),
    "nfc" -> (exprs => NfcNormalizeExpr(exprs(0))),
    "winnow_fps" -> (exprs => WinnowExpr(exprs(0),
      intLit(exprs(1), "winnow_fps k"), intLit(exprs(2), "winnow_fps win"))),
    "lsh_buckets" -> (exprs => LshBucketsExpr(exprs(0),
      intLit(exprs(1), "lsh_buckets nBits"),
      intLit(exprs(2), "lsh_buckets tables"),
      intLit(exprs(3), "lsh_buckets dim"))))

  /** Register the custom expressions on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
