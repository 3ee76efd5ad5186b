package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Hnsw]] — the navigable-graph ANN: deterministic nested-prefix
  * layer construction with symmetrized edges, exact nearest-anchor
  * (Voronoi) assignment shared with the search's guaranteed probe
  * (the q_s26 oracle flag-floor guarantee), beam-descent search
  * contracts, and measured recall against the exact brute-force
  * ranking.
  */
class HnswSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic 8-dim fixture: three rough direction clusters plus
    * per-vector jitter, no RNG.
    */
  private def vecs(n: Int): Seq[(Long, Seq[Float])] = (0L until n).map { i =>
    val c = (i % 3).toInt
    val v = Array.tabulate(8)(d =>
      (if (d % 3 == c) 1.0f else 0.1f) +
        ((i * 31 + d * 7) % 13).toFloat / 50f)
    (i, v.toSeq)
  }

  private def frame(n: Int) = vecs(n).toDF("vec_id", "embedding")
    .withColumn("embedding", col("embedding").cast("array<float>"))

  test("nested-prefix layers: sizes shrink by m, single top node, " +
      "symmetrized edges — kNN out-edges kept, back-edges added under " +
      "the 2m cap, no unreachable (in-degree-0) member") {
    val anchors = vecs(40).map(_._2.toArray).toArray
    val m = 4
    val g = Hnsw.buildGraph(anchors, m)
    assert(g.layerSizes.head == 40 && g.layerSizes.last == 1)
    g.layerSizes.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi == (lo + 3) / 4, g.layerSizes.mkString(","))
    }
    // exact-cosine sim for the kNN-preservation check
    def sim(a: Int, b: Int): Double = {
      val x = anchors(a); val y = anchors(b)
      val na = math.sqrt(x.map(v => v.toDouble * v).sum)
      val nb = math.sqrt(y.map(v => v.toDouble * v).sum)
      x.zip(y).map { case (p, q) => p.toDouble * q }.sum / (na * nb)
    }
    g.layerSizes.zipWithIndex.foreach { case (sz, l) =>
      val indeg = new Array[Int](sz)
      (0 until sz).foreach { i =>
        val nb = g.neighbors(l)(i)
        // bounded at 2m, no self-loop, members only, no duplicates
        assert(nb.length <= 2 * m && !nb.contains(i) && nb.forall(_ < sz))
        assert(nb.distinct.length == nb.length)
        nb.foreach(j => indeg(j) += 1)
        // every one of i's m nearest co-members is still an out-edge
        if (sz > 1) {
          val knn = (0 until sz).filter(_ != i)
            .sortBy(j => (-sim(i, j), j)).take(math.min(m, sz - 1))
          knn.foreach(j => assert(nb.contains(j),
            s"layer $l node $i lost kNN edge to $j"))
        }
        // symmetry under the cap: a dropped back-edge only happens at a
        // full (2m) neighbor list
        nb.foreach { j =>
          assert(g.neighbors(l)(j).contains(i) ||
            g.neighbors(l)(j).length == 2 * m,
            s"layer $l: $i->$j has no back-edge and $j is not full")
        }
      }
      // reachability floor: no member of a multi-node layer is a target
      // nobody links to
      if (sz > 1) (0 until sz).foreach(i =>
        assert(indeg(i) > 0, s"layer $l node $i unreachable"))
    }
    // deterministic: a rebuild is structurally identical
    val g2 = Hnsw.buildGraph(anchors, m)
    assert(g.layerSizes.sameElements(g2.layerSizes))
    assert(g.neighbors.zip(g2.neighbors).forall { case (a, b) =>
      a.zip(b).forall { case (x, y) => x.sameElements(y) } })
  }

  test("beam descent: searchAnchors contains the pure-greedy optimum at " +
      "every ef, stays within ef+1 anchors, and widening ef never loses " +
      "an anchor's similarity floor") {
    val anchors = vecs(60).map(_._2.toArray).toArray
    val g = Hnsw.buildGraph(anchors, m = 4)
    def simTo(q: Array[Float], i: Int): Double = {
      val y = anchors(i)
      val nq = math.sqrt(q.map(v => v.toDouble * v).sum)
      val ny = math.sqrt(y.map(v => v.toDouble * v).sum)
      q.zip(y).map { case (p, r) => p.toDouble * r }.sum / (nq * ny)
    }
    vecs(60).take(10).foreach { case (_, v) =>
      val q = v.toArray
      val g0 = Hnsw.nearestAnchor(g, q)
      Seq(1, 2, 4, 8, 16).foreach { ef =>
        val probed = Hnsw.searchAnchors(g, q, ef)
        assert(probed.contains(g0), s"ef=$ef lost the exact nearest anchor")
        assert(probed.length <= ef + 1, s"ef=$ef size ${probed.length}")
        assert(probed.distinct.length == probed.length)
        // nothing probed can beat the exact nearest anchor
        val best = probed.map(simTo(q, _)).max
        assert(math.abs(best - simTo(q, g0)) < 1e-12)
      }
    }
  }

  test("distributed assignment equals driver nearestAnchor (exact argmax) " +
      "for every vector, and the probe set always contains it") {
    val df = frame(90)
    val (g, assigned) = Hnsw.index(df, "vec_id", "embedding",
      m = 4, sampleSize = 18)
    val rows = assigned.collect().map(r => (r.getAs[Long]("id"),
      r.getAs[Seq[Float]]("vec").toArray, r.getAs[Int]("cell")))
    assert(rows.length == 90)
    rows.foreach { case (id, v, cell) =>
      assert(cell == Hnsw.nearestAnchor(g, v), s"id $id")
      assert(Hnsw.searchAnchors(g, v, ef = 2).contains(cell), s"id $id")
    }
  }

  test("a query that IS a corpus vector is found at rank 1 with " +
      "cosine 1.0 (the q_s26 flag-floor guarantee)") {
    val df = frame(90)
    val (g, assigned) = Hnsw.index(df, "vec_id", "embedding",
      m = 4, sampleSize = 18)
    val queries = frame(90).filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val top = Hnsw.topK(g, assigned, queries, k = 5, ef = 2).collect()
    (0L until 4L).foreach { q =>
      val self = top.find(r => r.getAs[Long]("query_id") == q &&
        r.getAs[Long]("id") == q)
      assert(self.isDefined, s"query $q did not find itself")
      assert(self.get.getAs[Int]("rank") == 1, s"query $q self-rank")
      assert(self.get.getAs[Double]("cosine_sim") == 1.0)
    }
  }

  test("persisted index round-trips: topKIndexed equals in-memory topK " +
      "and the probe read is partition-pruned") {
    val df = frame(90)
    val (g, assigned) = Hnsw.index(df, "vec_id", "embedding",
      m = 4, sampleSize = 18)
    val dir = tempDir("hnsw-idx").toString
    Hnsw.writeIndex(g, assigned, dir)
    val g2 = Hnsw.readGraph(spark, dir)
    assert(g2.layerSizes.sameElements(g.layerSizes))
    assert(g2.neighbors.zip(g.neighbors).forall { case (a, b) =>
      a.zip(b).forall { case (x, y) => x.sameElements(y) } })
    val queries = frame(90).filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    def key(r: org.apache.spark.sql.Row) = (r.getAs[Long]("query_id"),
      r.getAs[Int]("rank"), r.getAs[Long]("id"),
      r.getAs[Double]("cosine_sim"))
    val mem = Hnsw.topK(g, assigned, queries, k = 5, ef = 3)
      .collect().map(key).toSet
    val idx = Hnsw.topKIndexed(spark, dir, queries, k = 5, ef = 3)
    val plan = idx.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan)
    assert(idx.collect().map(key).toSet == mem)
    // pre-filter semantics: top-k of the QUALIFYING rows, so excluded
    // near neighbors are replaced by further qualifying ones (never a
    // short post-filtered list), and every returned id qualifies
    val qualifying = frame(90).filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("id"))
    val filtered = Hnsw.topKIndexedFiltered(spark, dir, queries,
      qualifying, k = 5, ef = 3).collect()
    assert(filtered.forall(r => r.getAs[Long]("id") % 2 == 0))
    // the unfiltered top-5 contains odd ids (so the filter bites), yet
    // every query still gets results — further qualifying rows replace
    // the excluded near ones rather than shortening the list to a
    // post-filter remnant
    assert(mem.exists(_._3 % 2 != 0), "fixture: filter must bite")
    val perQuery = filtered.groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.length).toMap
    assert(perQuery.size == 3 && perQuery.values.forall(_ >= 1),
      perQuery.toString)
  }

  test("appendIndex: frozen-anchor assignment bit-matches the build-time " +
      "descent, appended rows serve through the pruned probe, self-query " +
      "found at rank 1") {
    val all = frame(120)
    val original = all.filter(col("vec_id") % 4 =!= 0)
    val appended = all.filter(col("vec_id") % 4 === 0)
    val (g, assigned) = Hnsw.index(original, "vec_id", "embedding",
      m = 4, sampleSize = 18)
    val dir = tempDir("hnsw-app").toString
    Hnsw.writeIndex(g, assigned, dir)
    val n = Hnsw.appendIndex(spark, dir, appended, "vec_id", "embedding")
    assert(n == appended.count())
    // every appended id lands exactly once, in the cell the SAME frozen
    // graph's descent assigns (bit-parity with a fresh expression pass)
    val onDisk = spark.read.parquet(s"$dir/assigned")
      .filter(col("id") % 4 === 0)
      .select(col("id").cast("long"), col("cell").cast("int"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(onDisk.size == n)
    val expect = appended.collect().map { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding").toArray
      r.getLong(0) -> Hnsw.greedyDescend(g, v)
    }.toMap
    assert(onDisk == expect)
    // serving: each appended vector queried against the mixed layout
    // must find ITSELF at rank 1 (search and assignment share the
    // descent — the q_s27 oracle floor)
    val queries = appended.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val served = Hnsw.topKIndexed(spark, dir, queries, k = 5, ef = 3)
      .collect()
    val self = served.filter(r =>
      r.getAs[Long]("query_id") == r.getAs[Long]("id"))
    assert(self.length == queries.count() &&
      self.forall(_.getAs[Int]("rank") == 1),
      served.take(10).mkString("\n"))
    // compaction (the shared cell-layout staging-swap): the append left
    // >1 file in touched cells; afterwards one file per cell and the
    // served result is bit-identical
    def filesPerCell(): Map[String, Int] =
      new java.io.File(s"$dir/assigned").listFiles()
        .filter(_.getName.startsWith("cell=")).map(c =>
          c.getName -> c.listFiles().count(_.getName.endsWith(".parquet")))
        .toMap
    assert(filesPerCell().values.exists(_ > 1), filesPerCell().toString)
    Hnsw.compactIndex(spark, dir)
    assert(filesPerCell().values.forall(_ == 1), filesPerCell().toString)
    def key2(r: org.apache.spark.sql.Row) = (r.getAs[Long]("query_id"),
      r.getAs[Int]("rank"), r.getAs[Long]("id"))
    val again = Hnsw.topKIndexed(spark, dir, queries, k = 5, ef = 3)
      .collect().map(key2).toSet
    assert(again == served.map(key2).toSet)
  }

  test("farthestPointSelect: deterministic, pool members only, and the " +
      "greedy k-center invariant holds (every unpicked point is nearer " +
      "its seed than any two seeds are to each other)") {
    val pool = vecs(64).map(_._2.toArray).toArray
    val k = 12
    val sel = Hnsw.farthestPointSelect(pool, k)
    assert(sel.length == k)
    // each selected vector IS a pool member (selection, not synthesis)
    sel.foreach(s => assert(pool.exists(_.sameElements(s))))
    // deterministic: a re-run is element-identical
    val sel2 = Hnsw.farthestPointSelect(pool, k)
    assert(sel.zip(sel2).forall { case (a, b) => a.sameElements(b) })
    // pool <= k degenerates to the pool itself
    assert(Hnsw.farthestPointSelect(pool.take(5), 12).length == 5)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      1.0 - dot / (na * nb)
    }
    // greedy farthest-point invariant: the pick distances are
    // non-increasing, so min pairwise seed distance >= the distance of
    // ANY unpicked point to its nearest seed
    val minPairwise = (for (i <- sel.indices; j <- i + 1 until k)
      yield cos(sel(i), sel(j))).min
    val unpicked = pool.filterNot(p => sel.exists(_.sameElements(p)))
    val maxRemaining = unpicked.map(p => sel.map(cos(p, _)).min).max
    assert(maxRemaining <= minPairwise + 1e-9,
      s"k-center invariant violated: $maxRemaining > $minPairwise")
  }

  test("farthestPointSelect: a zero-norm pool vector is picked at most " +
      "once (cosine self-distance is 1, not 0 — the re-pick guard)") {
    val pool = vecs(40).map(_._2.toArray).toArray
    pool(7) = Array.fill(8)(0.0f) // zero vector: cosDist(z, *) = 1.0
    val sel = Hnsw.farthestPointSelect(pool, 12)
    val zeros = sel.count(_.forall(_ == 0.0f))
    assert(zeros <= 1, s"zero vector picked $zeros times")
    assert(sel.length == 12)
  }

  test("autoSampleSize: sqrt-of-corpus rule with floor and cap; " +
      "sampleSize=0 builds the identical graph to the explicit value") {
    assert(Hnsw.autoSampleSize(100) == 256)     // floor
    assert(Hnsw.autoSampleSize(65536) == 256)
    assert(Hnsw.autoSampleSize(1000000) == 1000)
    assert(Hnsw.autoSampleSize(1000000000L) == 4096) // cap
    val df = frame(90)
    // 90 vectors: auto floor (256) > corpus, pool = whole corpus — the
    // degenerate-but-valid small end; graphs must match the explicit call
    val (gAuto, _) = Hnsw.index(df, "vec_id", "embedding",
      m = 4, sampleSize = 0)
    val (gExpl, _) = Hnsw.index(df, "vec_id", "embedding",
      m = 4, sampleSize = Hnsw.autoSampleSize(90))
    assert(gAuto.layerSizes.sameElements(gExpl.layerSizes))
    assert(gAuto.neighbors.zip(gExpl.neighbors).forall { case (a, b) =>
      a.zip(b).forall { case (x, y) => x.sameElements(y) } })
  }

  test("recall vs brute force rises with ef and is measured, not vacuous") {
    val df = frame(150)
    val queries = frame(150).filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val truth = Similarity.bruteForceTopK(df, "vec_id", "embedding",
        queries, k = 10)
      .select("query_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (g, assigned) = Hnsw.index(df, "vec_id", "embedding",
      m = 4, sampleSize = 30)
    def recall(ef: Int): Double = {
      val got = Hnsw.topK(g, assigned, queries, k = 10, ef = ef)
        .select("query_id", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (truth intersect got).size.toDouble / truth.size
    }
    val rLow = recall(2)
    val rHigh = recall(12)
    assert(rHigh >= rLow, s"recall must not fall with ef: $rLow -> $rHigh")
    assert(rHigh >= 0.6, s"ef=12 recall too low: $rHigh")
    assert(rLow > 0.0, s"ef=2 recall vacuously zero")
  }
}
