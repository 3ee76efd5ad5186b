package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column, in EXACT integer
  * arithmetic — every iteration, the final assignment, and every centroid
  * coordinate replay bit-for-bit in any engine.
  *
  * Floating-point Lloyd is nondeterministic on a cluster: centroid sums
  * depend on reduction order, and an ulp of drift can flip an argmin at a
  * cell boundary, cascading through later iterations. This implementation
  * removes floats entirely:
  *
  *  - coordinates quantize to `floor(x · scale)` with `scale` a power of
  *    two — `float → double` is exact and multiplying a double by 2^n is
  *    exact (exponent shift), so the ONLY rounding is the floor, which
  *    every engine computes identically; no round-half-at-ulp trap;
  *  - per-cell sums are int64 (exact, order-independent — the partial
  *    aggregation can combine in any order);
  *  - centroid coordinates round to the integer grid with the sign-safe
  *    half-up formula `(2·(s + M·n) + n) div (2·n) − M` (all operands
  *    nonnegative after the `M` offset, so truncating and flooring
  *    division agree across engines);
  *  - distances are integer `Σ (q_d − c_d)²`; argmin ties break to the
  *    lowest cell index; empty cells keep their previous centroid.
  *
  * Seeding is data-deterministic: the k points with the smallest
  * `(md5(id), id)` (an order-free uniform draw, same idiom as
  * [[Sampling]]) become cells 0..k−1 in that order.
  *
  * Plan shape (the 100 TB story): per iteration ONE scan of the
  * quantized vectors + ONE k-row shuffle (the per-cell count and 64
  * per-dimension int64 sums partial-aggregate map-side; nothing
  * corpus-sized moves), then a k×dim collect (bounded: k ≤ 64 literal
  * centroids) broadcast back into the next iteration's codegen argmin
  * expression. The reference has no clustering operator (its nearest
  * analogue is SQL GROUP BY — internal/query/executor.go:131); this is
  * part of the added training-data-curation surface (the semantic-dedup /
  * curation cell structure of [[Similarity.semanticDedupManifest]], made
  * exactly reproducible).
  *
  * Quantization error is bounded by 1/scale per coordinate — for corpus
  * curation (SemDeDup cells, diversity buckets) cluster MEMBERSHIP is the
  * product, and a reproducible membership beats a float-exact centroid.
  *
  * Overflow bounds (int64): |q_d| ≤ scale·maxAbs; distances ≤
  * dim·(2·scale·maxAbs)²; sums |s| ≤ scale·maxAbs·n — with the default
  * scale 1024, unit-normalized embeddings (maxAbs ≤ 2), dim ≤ 4096 and
  * n ≤ 10^12 rows everything stays ≥ 100× inside int64.
  */
object Clustering {

  /** Offset making `s + M·n` nonnegative in the centroid rounding; must
    * exceed scale·maxAbs. 4·scale covers |x| ≤ 4 — far beyond any
    * normalized embedding.
    */
  def offsetFor(scale: Int): Long = 4L * scale

  /** `floor(x · scale)` per coordinate, as int64. */
  def quantize(vec: Column, scale: Int): Column =
    transform(vec, x => floor(x.cast("double") * scale).cast("bigint"))

  /** Integer squared L2 distance between a quantized vector column and a
    * literal centroid.
    */
  private def distSq(q: Column, cent: Array[Long]): Column =
    aggregate(
      zip_with(q, typedLit(cent.toSeq), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** Cell assignment (0-based) against literal centroids: argmin of the
    * integer distances, first-minimum tie-break (array_position returns
    * the FIRST index of the minimum).
    */
  private def cellFor(q: Column, cents: Seq[Array[Long]]): Column = {
    val d = array(cents.map(distSq(q, _)): _*)
    (array_position(d, array_min(d)) - 1).cast("int")
  }

  /** Per-label prototype (mean) vectors in the same exact integer
    * arithmetic as [[kmeansExact]] — the class-centroid primitive under
    * prototype-based data selection (pick examples near/far from their
    * class center) and nearest-prototype labeling. ONE partial-agg
    * shuffle of (count + dim int64 sums) per label; output is long-form
    * `(label, n_vecs, dim, c_q)` so the exact coordinates replay
    * engine-for-engine with no float anywhere.
    */
  def labelPrototypes(vectors: DataFrame, labelCol: String, vecCol: String,
      scale: Int = 1024, dim: Int = 64): DataFrame = {
    require(Integer.bitCount(scale) == 1, s"scale must be a power of two, got $scale")
    val m = offsetFor(scale)
    val sums = (0 until dim).map(i =>
      sum(element_at(col("q"), i + 1)).as(s"s_$i"))
    vectors
      .select(col(labelCol).cast("bigint").as("label"),
        quantize(col(vecCol), scale).as("q"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"), sums: _*)
      .select(col("label"), col("n_vecs"),
        posexplode(array((0 until dim).map(i =>
          expr(s"(2 * (s_$i + $m * n_vecs) + n_vecs) div (2 * n_vecs) - $m")): _*))
          .as(Seq("dim", "c_q")))
      .select(col("label"), col("n_vecs"), col("dim").cast("bigint").as("dim"),
        col("c_q"))
  }

  /** Label-outlier mining: the k vectors FARTHEST from their own label's
    * prototype, per label — the mislabel/noise candidates a curation pass
    * sends to review (confident-learning's cheap geometric cousin).
    * Distances are integer (quantized coords vs the integer prototype of
    * [[labelPrototypes]]), so ranking is exact and fully replayable; the
    * prototype side is a tiny broadcast join keyed on label.
    */
  def labelOutliers(vectors: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int, scale: Int = 1024, dim: Int = 64)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = labelPrototypes(vectors, labelCol, vecCol, scale, dim)
      .groupBy("label")
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("c_q")))),
        s => s("c_q")).as("cent"))
    val q = vectors.select(col(idCol).cast("bigint").as("id"),
      col(labelCol).cast("bigint").as("label"),
      quantize(col(vecCol), scale).as("q"))
    val w = Window.partitionBy("label")
      .orderBy(col("dist_sq").desc, col("id").asc)
    q.join(broadcast(cents), "label")
      .withColumn("dist_sq", aggregate(
        zip_with(col("q"), col("cent"), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("label"), col("rank"), col("id"), col("dist_sq"))
  }

  /** Run `iters` Lloyd iterations; returns the final per-point assignment
    * `(id, cell, dist_sq)` with `cell` the 0-based seed-order index and
    * `dist_sq` the integer distance to the final centroid.
    *
    * `centroidLog`, when supplied, receives `(iter, cell, n, centroid)`
    * after every update — iter 0 is the seed state.
    */
  def kmeansExact(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scale: Int = 1024,
      centroidLog: ((Int, Seq[(Int, Long, Array[Long])]) => Unit) = null)
      : DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64] for literal argmin, got $k")
    require(Integer.bitCount(scale) == 1, s"scale must be a power of two, got $scale")
    val m = offsetFor(scale)
    val spark = vectors.sparkSession
    // quantize once; every iteration and the final assignment re-scan this
    val q = vectors.select(col(idCol).cast("bigint").as("id"),
      quantize(col(vecCol), scale).as("q")).cache()
    val dim = q.select(size(col("q"))).first().getInt(0)
    // Deterministic seeds: smallest (md5(id), id); cell = that order.
    val seeds = q
      .orderBy(md5(col("id").cast("string")), col("id"))
      .limit(k)
      .select(col("q")).collect()
      .map(_.getSeq[Long](0).toArray)
    var cents: Seq[Array[Long]] = seeds.toIndexedSeq
    var counts: Seq[Long] = Seq.fill(seeds.length)(0L)
    if (centroidLog != null)
      centroidLog(0, cents.indices.map(c => (c, 0L, cents(c))))
    val sumCols = (0 until dim).map(i =>
      sum(element_at(col("q"), i + 1)).as(s"s_$i"))
    for (it <- 1 to iters) {
      val assigned = q.withColumn("cell", cellFor(col("q"), cents))
      val rows = assigned.groupBy("cell")
        .agg(count(lit(1)).as("n"), sumCols: _*)
        .collect() // k rows × (1 + dim) int64 — bounded by construction
      val byCell = rows.map { r =>
        val cell = r.getInt(0); val n = r.getLong(1)
        val cent = (0 until dim).map { i =>
          val s = r.getLong(2 + i)
          // half-up integer mean, sign-safe via the M offset
          (2L * (s + m * n) + n) / (2L * n) - m
        }.toArray
        cell -> (n, cent)
      }.toMap
      // empty cells keep their previous centroid (and report n = 0)
      cents = cents.indices.map(c => byCell.get(c).map(_._2).getOrElse(cents(c)))
      counts = cents.indices.map(c => byCell.get(c).map(_._1).getOrElse(0L))
      if (centroidLog != null)
        centroidLog(it, cents.indices.map(c => (c, counts(c), cents(c))))
    }
    val finalCents = cents
    q.withColumn("cell", cellFor(col("q"), finalCents).cast("bigint"))
      .withColumn("dist_sq",
        array_min(array(finalCents.map(distSq(col("q"), _)): _*)))
      .select(col("id"), col("cell"), col("dist_sq"))
  }
}
