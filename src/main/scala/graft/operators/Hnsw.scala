package graft.operators

import graft.Barrier.BarrierOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Navigable-graph ANN (the HNSW search shape over a bounded anchor
  * graph, with the SPANN-style serving split: graph on the driver,
  * corpus partitioned into anchor regions for distributed exact
  * scoring). Completes the serving menu next to IVF/PQ/LSH/binary —
  * the one production ANN architecture those families don't cover.
  *
  * Index = two halves:
  *
  *  1. A DETERMINISTIC layered small-world graph over ≤ `sampleSize`
  *     anchor vectors (a hash-uniform draw — smallest (md5, id) — the
  *     same bounded-driver-sample discipline as
  *     [[Similarity.ivfIndex]]'s Lloyd fit).
  *     Layer l contains the first `ceil(s / m^l)` anchors (nested
  *     prefixes, so layer membership needs no RNG and the single
  *     top-layer node is always anchor 0); within a layer every member
  *     links to its `m` nearest co-members by exact cosine, SYMMETRIZED
  *     (back-edges added, ≤ 2m per node) so no anchor is an
  *     in-degree-0 target the expansion can never reach. Build cost
  *     is Σ n_l² ≤ s²·m²/(m²−1) driver flops on a bounded s.
  *  2. The corpus assigned to anchor REGIONS by EXACT nearest anchor
  *     (cosine argmax over the bounded anchor set — true Voronoi
  *     regions; round-13's greedy-descent assignment smeared ~82% of
  *     vectors into non-nearest regions at a 200k corpus, capping
  *     recall at any selection quality). Assignment runs distributed as
  *     a broadcast-graph Catalyst expression ([[HnswAnchorExpr]]) — one
  *     O(anchors·dim) scan per row, no shuffle, exactly the
  *     NearestCellExpr pattern and cost shape.
  *
  * Search (`topK`): BEAM-descend the upper layers (best-first with a
  * small beam per layer — multiple entry basins instead of one greedy
  * path), then a best-first expansion at the bottom layer seeded from
  * all beam survivors keeps the `ef` most similar anchors (the classic
  * SEARCH-LAYER loop, deterministic tie-breaks). The
  * probed set ALWAYS includes the query's EXACT nearest anchor
  * ([[nearestAnchor]] — the assignment rule) — so a query that IS a
  * corpus vector provably probes the region that vector was assigned
  * to (identical floats ⇒ identical argmax), the pigeonhole guarantee
  * q_s26's oracle flag floor pins, now graph-independent. Scoring is
  * [[Similarity]]'s exact-cosine region scan: thin broadcast of
  * (query, region) probes, partition-local ranking — at 100 TB the
  * regions are partition directories and a probe reads ef/s of the
  * corpus, never the whole index.
  */
object Hnsw {

  /** The driver/broadcast half of the index. `layerSizes` is ordered
    * bottom-up (`layerSizes(0)` = anchor count); `neighbors(l)(i)` are
    * the graph links of anchor i inside layer l (defined for
    * i < layerSizes(l)).
    */
  final case class Graph(anchors: Array[Array[Float]],
      layerSizes: Array[Int],
      neighbors: Array[Array[Array[Int]]]) extends Serializable {
    @transient lazy val anchorNorms: Array[Double] = anchors.map { a =>
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * a(i); i += 1 }
      math.sqrt(acc)
    }
  }

  private[operators] def dotSim(g: Graph, q: Array[Float], qn: Double,
      i: Int): Double = {
    val a = g.anchors(i)
    val d = g.anchorNorms(i) * qn
    if (d == 0.0) 0.0
    else {
      var acc = 0.0; var j = 0
      val n = math.min(a.length, q.length)
      while (j < n) { acc += a(j).toDouble * q(j); j += 1 }
      acc / d
    }
  }

  private def vecNorm(q: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < q.length) { acc += q(i).toDouble * q(i); i += 1 }
    math.sqrt(acc)
  }

  /** Greedy walk inside layer `l` from `start`: move to the best
    * improving neighbor until none improves (ties never improve, so the
    * walk terminates; strict improvement makes the path deterministic).
    */
  private def greedyAtLayer(g: Graph, q: Array[Float], qn: Double,
      l: Int, start: Int): Int = {
    var cur = start
    var curSim = dotSim(g, q, qn, cur)
    var improved = true
    while (improved) {
      improved = false
      val nbrs = g.neighbors(l)(cur)
      var k = 0
      var best = -1
      var bestSim = curSim
      while (k < nbrs.length) {
        val s = dotSim(g, q, qn, nbrs(k))
        if (s > bestSim || (s == bestSim && best >= 0 && nbrs(k) < best)) {
          best = nbrs(k); bestSim = s
        }
        k += 1
      }
      if (best >= 0 && bestSim > curSim) {
        cur = best; curSim = bestSim; improved = true
      }
    }
    cur
  }

  /** Full greedy descent (ef = 1): top layer → bottom-layer local
    * optimum — the upper-layer walk [[searchAnchors]] beams over.
    * (Round 14: no longer the assignment rule — see [[nearestAnchor]].)
    */
  def greedyDescend(g: Graph, q: Array[Float]): Int = {
    val qn = vecNorm(q)
    var cur = 0
    var l = g.layerSizes.length - 1
    while (l >= 0) {
      cur = greedyAtLayer(g, q, qn, l, cur)
      l -= 1
    }
    cur
  }

  /** EXACT nearest anchor by cosine (ties to the lowest index) — the
    * corpus-assignment rule since round 14, and the search's guaranteed
    * probe; sharing this code path is what makes the
    * query-is-a-corpus-vector pigeonhole exact (and now graph-
    * independent). Round-13's greedy-descent assignment landed only
    * ~18% of a 200k-corpus sample in its true nearest region (measured,
    * [[HnswDiag]]) — regions were smeared rather than Voronoi, which
    * capped recall at ANY selection quality. Exact assignment is one
    * O(anchors·dim) scan per row inside a broadcast expression — the
    * same cost shape as IVF's NearestCellExpr against an equal cell
    * count; the GRAPH's job is query-side anchor selection
    * (sub-exhaustive at serving time), the SPANN split proper.
    */
  def nearestAnchor(g: Graph, q: Array[Float]): Int = {
    val qn = vecNorm(q)
    var best = 0
    var bestSim = dotSim(g, q, qn, 0)
    var i = 1
    while (i < g.anchors.length) {
      val s = dotSim(g, q, qn, i)
      if (s > bestSim) { best = i; bestSim = s }
      i += 1
    }
    best
  }

  /** Best-first SEARCH-LAYER inside layer `l`: expand from `entries`,
    * keeping the `width` most-similar members seen (the classic HNSW
    * layer search, deterministic tie-breaks: ties order by anchor index
    * on both heaps). Shared by the upper-layer beam descent and the
    * bottom-layer `ef` expansion.
    */
  private def searchLayer(g: Graph, q: Array[Float], qn: Double,
      l: Int, entries: Array[Int], width: Int): Array[Int] = {
    val simOf = scala.collection.mutable.Map[Int, Double]()
    def sim(i: Int): Double = simOf.getOrElseUpdate(i, dotSim(g, q, qn, i))
    // max-heap of frontier candidates, min-heap of current best `width`
    val cand = scala.collection.mutable.PriorityQueue[(Double, Int)]()(
      Ordering.Tuple2(Ordering.Double.TotalOrdering,
        Ordering.Int.reverse))
    val result = scala.collection.mutable.PriorityQueue[(Double, Int)]()(
      Ordering.Tuple2(Ordering.Double.TotalOrdering,
        Ordering.Int.reverse).reverse)
    val visited = scala.collection.mutable.BitSet()
    var e = 0
    while (e < entries.length) {
      val en = entries(e)
      if (!visited(en)) {
        visited += en
        cand.enqueue((sim(en), en))
        result.enqueue((sim(en), en))
        if (result.size > width) result.dequeue()
      }
      e += 1
    }
    var done = false
    while (!done && cand.nonEmpty) {
      val (cs, c) = cand.dequeue()
      if (result.size >= width && cs < result.head._1) done = true
      else {
        val nbrs = g.neighbors(l)(c)
        var k = 0
        while (k < nbrs.length) {
          val nb = nbrs(k)
          if (!visited(nb)) {
            visited += nb
            val s = sim(nb)
            if (result.size < width || s > result.head._1) {
              cand.enqueue((s, nb))
              result.enqueue((s, nb))
              if (result.size > width) result.dequeue()
            }
          }
          k += 1
        }
      }
    }
    result.map(_._2).toArray.sorted
  }

  /** Beam width for the upper-layer descent: a small beam bounded by
    * `ef` — wide enough to escape a wrong greedy basin, cheap against
    * the bottom expansion it feeds.
    */
  private def beamWidth(ef: Int): Int = math.max(2, math.min(32, ef))

  /** The `ef` most-similar bottom-layer anchors found by a BEAM descent
    * (round 14): the upper layers are walked with a small best-first
    * beam ([[beamWidth]]) instead of a single greedy path, and the
    * bottom-layer expansion seeds from ALL beam survivors — multiple
    * entry basins, which is exactly the region-selection failure mode a
    * single greedy path has (the round-13 recall curves showed region
    * SELECTION, not region resolution, limiting HNSW under IVF at equal
    * read fraction). UNIONed with the query's exact nearest anchor, so
    * the result has ≤ ef + 1 anchors and always contains
    * [[nearestAnchor]]'s answer — the assignment rule, so the
    * self-presence pigeonhole (and q_s26/s27/s29/s31's oracle floor)
    * survives any beam or graph shape.
    * Deterministic: ties order by anchor index on every heap.
    */
  def searchAnchors(g: Graph, q: Array[Float], ef: Int): Array[Int] = {
    require(ef >= 1, s"ef must be >= 1, got $ef")
    val qn = vecNorm(q)
    val beam = beamWidth(ef)
    var entries = Array(0)
    var l = g.layerSizes.length - 1
    while (l >= 1) {
      entries = searchLayer(g, q, qn, l, entries, beam)
      l -= 1
    }
    val bottom = searchLayer(g, q, qn, 0, entries, ef)
    val g0 = nearestAnchor(g, q)
    (bottom.toSet + g0).toArray.sorted
  }

  private val fnCounter = new java.util.concurrent.atomic.AtomicInteger()

  /** Build the index: deterministic anchor graph + exact nearest-anchor
    * region assignment ([[nearestAnchor]] — Voronoi regions). Returns (graph, assigned) where `assigned` carries
    * (id, vec, cell) — `cell` the anchor index, ready for
    * `partitionBy("cell")` persistence exactly like the IVF index.
    * `sampleSize = 0` sizes the anchor set from the corpus count
    * ([[autoSampleSize]], ≈√n) — a fixed anchor count dilutes region
    * resolution as the corpus grows (recall floor drops with the
    * corpus/anchor ratio; measured in SCALE.md).
    */
  def index(vectors: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, sampleSize: Int = 1024): (Graph, DataFrame) = {
    require(m >= 2, s"m must be >= 2, got $m")
    Similarity.init(vectors.sparkSession)
    val spark = vectors.sparkSession
    val base = vectors.select(col(idCol).as("id"),
        col(vecCol).cast("array<float>").as("vec"))
      .barrier(true)
    val anchorCount =
      if (sampleSize > 0) sampleSize else autoSampleSize(base.count())
    // Anchor fit (round 14): a hash-uniform candidate pool (the
    // [[Similarity.ivfIndex]] sampling contract — md5 order is
    // deterministic like an id sort but content-uniform), then a
    // bounded driver LLOYD fit — anchors are k-means centroids
    // (farthest-point-seeded, the shared [[Similarity.lloyd]]), not raw
    // corpus members. Measured at a 200k corpus: farthest-point MEMBER
    // anchors over-sample outliers, so dense areas get oversized
    // Voronoi regions and the top-ef regions miss neighbors — centroid
    // anchors recovered the remaining recall gap to the IVF curve at
    // equal read fraction. Fully deterministic in (pool, seed).
    val pool = base
      .sort(md5(concat(lit("hnsw:"), col("id").cast("string"))), col("id"))
      .limit(math.max(anchorCount * 4, Similarity.MaxTrainSample))
      .select("vec").collect()
      .map(_.getSeq[Float](0).toArray)
    val anchors = Similarity.lloyd(pool, anchorCount, seed = 42L, iters = 10)
    val graph = buildGraph(anchors, m)
    val fname = s"hnsw_anchor_${fnCounter.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fname, exprs => HnswAnchorExpr(exprs(0), graph), "built-in")
    val assigned =
      try base.withColumn("cell", call_function(fname, col("vec")))
        .barrier(true)
      finally spark.sessionState.functionRegistry.dropFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(fname))
    base.unpersist(blocking = false)
    (graph, assigned)
  }

  /** Anchor count for `sampleSize = 0` (auto): ⌈√n⌉ clamped to
    * [256, 4096] — the classical region-index sizing (region size ≈ √n,
    * so an ef-probe reads ef·√n rows); the floor keeps tiny corpora at
    * the proven fixture ratio, the cap bounds the driver-side graph
    * build (anchors²·dim flops) and pool collect (4·anchors vectors).
    * Past the cap (n > ~16M regions-worth), size explicitly from the
    * `graft.tools.RecallCurve` output.
    */
  def autoSampleSize(n: Long): Int =
    math.max(256, math.min(4096, math.ceil(math.sqrt(n.toDouble)).toInt))

  /** Greedy farthest-point selection of `k` vectors from a candidate
    * pool by cosine distance (deterministic: seed = pool(0), ties to the
    * lowest index; the shared [[Similarity.farthestPointIndices]]
    * k-center loop, which also guards the zero-norm-vector re-pick).
    * O(k·|pool|·dim) driver flops on bounded inputs.
    */
  private[operators] def farthestPointSelect(pool: Array[Array[Float]],
      k: Int): Array[Array[Float]] = {
    require(pool.nonEmpty, "hnsw: empty anchor pool")
    if (pool.length <= k) return pool
    val norms = pool.map(vecNorm)
    def cosDist(a: Int, b: Int): Double = {
      val d = norms(a) * norms(b)
      if (d == 0.0) 1.0
      else {
        val x = pool(a); val y = pool(b)
        val n = math.min(x.length, y.length)
        var acc = 0.0; var i = 0
        while (i < n) { acc += x(i).toDouble * y(i); i += 1 }
        1.0 - acc / d
      }
    }
    Similarity.farthestPointIndices(pool.length, k, 0, cosDist).map(pool)
  }

  /** The deterministic layered graph over the anchor array (driver-side;
    * bounded by `sampleSize`). Exposed for spec-level property checks.
    */
  private[operators] def buildGraph(anchors: Array[Array[Float]],
      m: Int): Graph = {
    require(anchors.nonEmpty, "hnsw: empty anchor sample")
    val sizes = Iterator.iterate(anchors.length)(n => (n + m - 1) / m)
      .takeWhile(_ > 1).toArray :+ 1
    val g0 = Graph(anchors, sizes, Array.empty)
    val norms = g0.anchorNorms
    def sim(a: Int, b: Int): Double = {
      val d = norms(a) * norms(b)
      if (d == 0.0) 0.0
      else {
        val x = anchors(a); val y = anchors(b)
        var acc = 0.0; var i = 0
        val n = math.min(x.length, y.length)
        while (i < n) { acc += x(i).toDouble * y(i); i += 1 }
        acc / d
      }
    }
    // Within-layer edges (round 14): m-nearest OUT-edges by exact
    // cosine, SYMMETRIZED — if i links to j, j links back to i. A pure
    // kNN digraph leaves hub-shadowed anchors with in-degree 0
    // (unreachable targets for best-first expansion no matter the ef),
    // which caps recall on region selection. Every node KEEPS all m of
    // its kNN out-edges; reverse edges are added on top, capped at 2m
    // total per node by similarity (ties to the lowest index) so hubs
    // stay bounded. An anchor can still only be shadowed if every one
    // of its m nearest co-members drops the back-edge under the cap —
    // and the guaranteed greedy-probe union covers the floor regardless.
    val neighbors = sizes.map { n =>
      val out = Array.tabulate(n) { i =>
        (0 until n).filter(_ != i)
          .sortBy(j => (-sim(i, j), j))
          .take(m).toArray
      }
      val rev = Array.fill(n)(List.empty[Int])
      var i = 0
      while (i < n) {
        out(i).foreach { j => rev(j) = i :: rev(j) }
        i += 1
      }
      Array.tabulate(n) { i =>
        val extra = rev(i).filterNot(out(i).contains)
          .sortBy(j => (-sim(i, j), j))
          .take(math.max(0, 2 * m - out(i).length))
        (out(i) ++ extra).sortBy(j => (-sim(i, j), j))
      }
    }
    Graph(anchors, sizes, neighbors)
  }

  /** HNSW-probed top-k: per query, descend + expand to ≤ ef + 1 anchor
    * regions, then exact-cosine rank the vectors assigned to them
    * (partition-pruned scan; [[Similarity]]'s region scorer). The
    * queries frame is serving-batch-sized by contract and is collected
    * for the driver-side graph walk — the corpus never is.
    */
  def topK(graph: Graph, assigned: DataFrame, queries: DataFrame,
      k: Int, ef: Int = 4): DataFrame = {
    val spark = assigned.sparkSession
    Similarity.init(spark)
    val (probes, _) = probeFrame(spark, graph, queries, ef)
    Similarity.scoreCells(assigned, probes, k)
  }

  /** Driver graph walk for a serving batch of queries → the broadcast
    * probe frame (query_id, qvec, cell) plus the distinct probed cells.
    */
  private def probeFrame(spark: SparkSession, graph: Graph,
      queries: DataFrame, ef: Int): (DataFrame, Seq[Int]) = {
    import spark.implicits._
    val qRows = queries.select(col("query_id").cast("long"),
        col("qvec").cast("array<float>")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val probeRows = qRows.flatMap { case (qid, qv) =>
      searchAnchors(graph, qv, ef).map(cell => (qid, qv.toSeq, cell))
    }.toSeq
    val probes = probeRows.toDF("query_id", "qvec", "cell")
      .withColumn("qvec", col("qvec").cast("array<float>"))
    (probes, probeRows.map(_._3).distinct)
  }

  /** Cluster by cell before the partitioned write (explicit N so AQE
    * cannot coalesce the write to one serial task — the ShardExport
    * lesson): each region becomes exactly ONE file per write instead of
    * one per upstream partition (measured 943 tiny files in the streamed
    * fixture, so a pruned ef-region probe opened dozens of files per
    * cell). Same layout discipline as the IVF writers, guide §6 file
    * sizing.
    */
  private def byCell(assigned: DataFrame): DataFrame =
    assigned.repartition(
      math.max(assigned.sparkSession.sparkContext.defaultParallelism, 1),
      col("cell"))

  /** Persist the index in the IVF on-disk layout: the assigned corpus
    * `partitionBy("cell")` (each region its own partition directory —
    * the partition-pruned serving path), plus the graph halves as two
    * small parquet tables (`anchors`, `graph`) a fresh session can
    * rebuild the driver [[Graph]] from.
    */
  def writeIndex(g: Graph, assigned: DataFrame, path: String): Unit = {
    val spark = assigned.sparkSession
    import spark.implicits._
    byCell(assigned).write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/assigned")
    g.anchors.zipWithIndex.toSeq
      .map { case (v, i) => (i, v.toSeq) }
      .toDF("anchor", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/anchors")
    (for {
      l <- g.layerSizes.indices
      i <- 0 until g.layerSizes(l)
    } yield (l, i, g.neighbors(l)(i).toSeq))
      .toDF("layer", "node", "nbrs")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/graph")
  }

  /** Rebuild the driver graph from a [[writeIndex]] layout. */
  def readGraph(spark: SparkSession, path: String): Graph =
    graphFromFrames(spark.read.parquet(s"$path/anchors"),
      spark.read.parquet(s"$path/graph"))

  /** Rebuild the driver graph from the two small tables [[writeIndex]]
    * persists — `anchors` (anchor, vec) and `graph` (layer, node, nbrs)
    * — wherever they are hosted (a parquet directory, or versioned
    * tables in a [[graft.catalog.SnapshotTableStore]]).
    */
  def graphFromFrames(anchorsDf: DataFrame, graphDf: DataFrame): Graph = {
    val anchors = anchorsDf
      .sort("anchor").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("vec").toArray)
    val nbrRows = graphDf.collect()
      .map(r => (r.getAs[Int]("layer"), r.getAs[Int]("node"),
        r.getAs[scala.collection.Seq[Int]]("nbrs").toArray))
    val nLayers = nbrRows.map(_._1).max + 1
    val layerSizes = Array.tabulate(nLayers)(l =>
      nbrRows.count(_._1 == l))
    val neighbors = Array.tabulate(nLayers) { l =>
      val rows = nbrRows.filter(_._1 == l).sortBy(_._2)
      rows.map(_._3)
    }
    Graph(anchors, layerSizes, neighbors)
  }

  /** Serving-path top-k over a persisted index: driver graph walk picks
    * ≤ ef + 1 regions, and ONLY those partition directories are read
    * (partition pruning on `cell`) — at 100 TB a probe touches ef/s of
    * the index on disk, never the whole corpus.
    */
  def topKIndexed(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, ef: Int = 4): DataFrame = {
    val graph = readGraph(spark, path)
    Similarity.init(spark)
    val (probes, cells) = probeFrame(spark, graph, queries, ef)
    val assigned = spark.read.parquet(s"$path/assigned")
      .filter(col("cell").isin(cells: _*))
    Similarity.scoreCells(assigned, probes, k)
  }

  /** Incremental index maintenance — the [[Similarity.ivfAppendIndex]]
    * twin, making the two serving indexes operationally symmetric: new
    * vectors are assigned against the FROZEN anchor graph (read back
    * from the persisted layout) by the SAME nearest-anchor expression
    * assignment always runs, then appended into the partitioned region
    * directories — no rebuild, no graph mutation. Because search and
    * assignment share one code path, the self-presence pigeonhole
    * (a query that IS a corpus vector probes its own region) extends to
    * appended rows, which is exactly what q_s27's oracle floor pins.
    * Returns the appended row count.
    */
  def appendIndex(spark: SparkSession, path: String, newVectors: DataFrame,
      idCol: String, vecCol: String): Long = {
    val graph = readGraph(spark, path)
    val assigned = assign(graph, newVectors, idCol, vecCol)
    byCell(assigned).write.mode("append").partitionBy("cell")
      .parquet(s"$path/assigned")
    val n = assigned.count()
    assigned.unpersist(blocking = false)
    n
  }

  /** Assign vectors against an EXISTING (frozen) anchor graph — the
    * reusable core of [[appendIndex]], bit-identical to build-time
    * assignment (same nearest-anchor expression, same graph), returned
    * as a materialized (id, vec, cell) frame so callers hosting the
    * region layout inside a transactional store
    * ([[graft.catalog.SnapshotTableStore]]) can commit it themselves —
    * the [[Similarity.ivfAssign]] twin.
    */
  def assign(graph: Graph, vectors: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val spark = vectors.sparkSession
    Similarity.init(spark)
    val base = vectors.select(col(idCol).as("id"),
      col(vecCol).cast("array<float>").as("vec"))
    val fname = s"hnsw_anchor_${fnCounter.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fname, exprs => HnswAnchorExpr(exprs(0), graph), "built-in")
    // eager barrier: the temp function is dead after this returns
    try base.withColumn("cell", call_function(fname, col("vec")))
      .barrier(true)
    finally spark.sessionState.functionRegistry.dropFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(fname))
  }

  /** Compact the region layout after sustained appends — the HNSW
    * `assigned` frame is the SAME `partitionBy("cell")` layout the IVF
    * index uses, so this delegates to the crash-recoverable
    * [[Similarity.ivfCompactIndex]] staging-swap (anchors and the layer
    * graph are untouched; same rows, same regions, one file per cell).
    */
  def compactIndex(spark: SparkSession, path: String): Unit =
    Similarity.ivfCompactIndex(spark, path)

  /** Metadata-filtered serving over the persisted index, with PRE-FILTER
    * semantics (the [[Similarity.ivfTopKIndexedFiltered]] contract): the
    * qualifying-id set restricts the probed regions BEFORE ranking, so
    * the result is the true top-k of the qualifying rows there — never a
    * post-filtered, possibly short, top-k. Partition pruning composes
    * with a broadcast semi join on `id`.
    */
  def topKIndexedFiltered(spark: SparkSession, path: String,
      queries: DataFrame, qualifying: DataFrame, k: Int,
      ef: Int = 4): DataFrame = {
    require(qualifying.columns.contains("id"),
      "qualifying frame must expose an 'id' column")
    val graph = readGraph(spark, path)
    Similarity.init(spark)
    val (probes, cells) = probeFrame(spark, graph, queries, ef)
    val assigned = spark.read.parquet(s"$path/assigned")
      .filter(col("cell").isin(cells: _*))
      .join(broadcast(qualifying.select("id")), Seq("id"), "left_semi")
    Similarity.scoreCells(assigned, probes, k)
  }
}

/** Per-row EXACT nearest-anchor assignment under a broadcast
  * [[Hnsw.Graph]] (interpreted eval; the anchor scan's data-dependent
  * loop doesn't codegen, and assignment is one pass at build/append
  * time, not a hot query path).
  */
case class HnswAnchorExpr(child: Expression, graph: Hnsw.Graph)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"hnsw_anchor expects array<float>, got ${dt.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val v = new Array[Float](arr.numElements())
    var i = 0
    while (i < v.length) { v(i) = arr.getFloat(i); i += 1 }
    Hnsw.nearestAnchor(graph, v)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
