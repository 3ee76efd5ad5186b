package graft.operators

import graft.Barrier.BarrierOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph traversals over an edge DataFrame `(from_id, to_id)` — the Spark
  * re-expression of corkscrew's DuckDB recursive CTEs
  * (internal/db/graph_loader.go:402-433 shortest path, :435-464 k-hop
  * neighborhood). Spark has no recursive CTE, so these are driver-side
  * iterative BFS loops: each hop is one shuffle join frontier⋈edges; the
  * edge table is hash-partitioned once on from_id and persisted so every
  * iteration reuses the same partitioning (no re-shuffle of the big side).
  * Depth is bounded (reference caps at 10), so the loop is cheap and the
  * lineage is truncated per-hop with localCheckpoint to keep plans small.
  *
  * Scale notes (100 TB): edges partitioned by from_id makes the per-hop
  * join a co-partitioned shuffle on the frontier only; frontiers stay small
  * relative to edges in bounded-depth traversals. For undirected semantics
  * we materialize the symmetric edge view once (union of both directions,
  * graph_loader.go:436-456 joins on `to_id OR from_id` — the union form
  * avoids the OR-join nested loop).
  */
object Graph {

  /** Edge-count gate below which a bounded-depth traversal finishes on the
    * driver (mirrors [[connectedComponents]]'s contracted endgame): collect
    * the adjacency once, walk it locally, return a local relation. A ≤10-hop
    * BFS otherwise costs ~2 driver-sequential jobs per hop, and at local SF
    * that fixed job overhead dominates the whole query (round-4 verdict:
    * q_g2 15×, q_g3 24× the single-node baseline on graphs of ~10^5 edges).
    * The gate itself must not cost a job, so it reads Catalyst's
    * `stats.sizeInBytes` estimate off the optimized plan (file-size-derived
    * for parquet scans — zero execution); only when the estimate fits does
    * the single gating collect run, and a row-count backstop re-checks the
    * estimate after the fact. 4M string edges ≈ a few hundred MB of driver
    * heap, the same envelope as the CC label map; at cluster scale the
    * estimate is orders of magnitude past the cap and the traversal stays
    * fully distributed with no gating work at all.
    */
  private val LocalEdgeLimit = 4L * 1000 * 1000

  /** Plan-estimate ceiling for the gating collect (pre-collect check). */
  private val LocalBytesLimit = BigInt(512L * 1024 * 1024)

  /** Driver-endgame result frame. A plain `Seq.toDF` plans as a
    * LocalTableScan whose row encoding runs single-threaded on the driver
    * at every action (measured 0.7–1.0 s per action for q_g15's 163 k
    * rows); above a small threshold the rows are parallelized so
    * encoding — and every downstream consumer — runs across cores. Row
    * order is preserved either way (ParallelCollectionRDD slices are
    * sequential).
    */
  private def localFrame[T <: Product : scala.reflect.runtime.universe.TypeTag
      : scala.reflect.ClassTag](
      spark: SparkSession, rows: Seq[T], cols: Seq[String]): DataFrame = {
    import spark.implicits._
    if (rows.length < 50000) rows.toDF(cols: _*)
    else spark.createDataFrame(spark.sparkContext.parallelize(
      rows, spark.sparkContext.defaultParallelism)).toDF(cols: _*)
  }

  /** True when the optimizer's size estimate says `df` is collectable.
    * `GRAFT_GRAPH_DISTRIBUTED` in the environment disables every driver
    * endgame — the switch the shuffle-linearity measurements
    * (SCALE.md, [[graft.tools.ProfileShuffle]]) use to profile the
    * cluster-scale path at fixture SFs where the gate would otherwise
    * engage.
    */
  private def fitsDriver(df: DataFrame, localEdgeLimit: Long): Boolean =
    localEdgeLimit > 0 && !sys.env.contains("GRAFT_GRAPH_DISTRIBUTED") &&
      df.queryExecution.optimizedPlan.stats.sizeInBytes <= LocalBytesLimit

  /** Adjacency list of a collected `(from_id, to_id)` edge array. NULL
    * from_ids join nothing in the distributed path and expand nothing
    * here; NULL to_ids are legitimate reachable "nodes" in both. For
    * undirected traversals only the forward edges are collected (half the
    * rows over the wire) and the reverse direction is mirrored here.
    */
  private def localAdjacency(rows: Array[org.apache.spark.sql.Row],
      undirected: Boolean = false)
      : java.util.HashMap[String, java.util.ArrayList[String]] = {
    val adj = new java.util.HashMap[String, java.util.ArrayList[String]]()
    def add(f: String, t: String): Unit = {
      var l = adj.get(f)
      if (l == null) { l = new java.util.ArrayList[String](); adj.put(f, l) }
      l.add(t)
    }
    var i = 0
    while (i < rows.length) {
      val f = if (rows(i).isNullAt(0)) null else rows(i).getString(0)
      val t = if (rows(i).isNullAt(1)) null else rows(i).getString(1)
      if (f != null) add(f, t)
      if (undirected && t != null) add(t, f)
      i += 1
    }
    adj
  }

  /** Per-vertex triangle counts via degree orientation — the standard
    * O(m^1.5)-work scheme: orient every undirected edge from its
    * lower-(degree, id) endpoint to the higher one (a total order, so the
    * oriented graph is acyclic and each triangle has EXACTLY one vertex
    * pointing at the other two), enumerate wedges at that apex (join of
    * the oriented edges with themselves on the source), and close each
    * wedge against the canonical undirected edge set. Orientation is what
    * makes this scale: a celebrity vertex of degree d contributes wedges
    * only from its LOW-degree neighbors' small out-lists, never d² pairs
    * from its own adjacency.
    *
    * Returns `(id, n_triangles)` for vertices in ≥ 1 triangle. All joins
    * are equi-joins on vertex ids; everything replays as plain SQL.
    *
    * Degree annotation runs join-free (round-9 trim): one count-window
    * over the directed edge view puts each endpoint's degree on its
    * outgoing copy, and one pair-aggregation on the canonical edge folds
    * the two copies into `(a, b, da, db)` — two exchanges where the old
    * shape spent three (degree groupBy + two und⋈deg joins). The window
    * partition is a vertex's raw adjacency, the same O(deg) volume the
    * old join materialized per edge; WindowExec spills it instead of
    * partial-aggregating, which is fine because the wedge stage right
    * after is the strictly larger Σ outdeg² cost either way.
    */
  def triangles(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // EAGER barrier, not lazy .cache(): read three times (degree window,
    // pairing, wedge closure) — and the first consumer is a UNION whose
    // two legs run concurrently in one job, so a lazy cache lets both
    // legs race to materialize it and the (expensive — the edge
    // derivation is often a self-join) subtree computes TWICE (measured:
    // twin 64-task stages of 17 s + 13 s task-time at sf0.1). The eager
    // cut materializes once, before any consumer.
    val und = edges
      .select(least(col("from_id"), col("to_id")).as("a"),
        greatest(col("from_id"), col("to_id")).as("b"))
      .filter(col("a") =!= col("b")).distinct().barrier(true)
    val dir = und.select(col("a").as("u"), col("b").as("v"))
      .unionByName(und.select(col("b").as("u"), col("a").as("v")))
    val ann = dir.withColumn("du", count(lit(1)).over(Window.partitionBy("u")))
    val paired = ann.select(
        least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"),
        when(col("u") < col("v"), col("du")).as("dua"),
        when(col("u") > col("v"), col("du")).as("dub"))
      .groupBy("a", "b").agg(max("dua").as("da"), max("dub").as("db"))
    val aLower = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // Same race as `und`: e1 ⋈ e2 consumes `oriented` twice in one job,
    // which without a barrier recomputes the whole window + pair-agg
    // chain (two exchanges) once per join side.
    val oriented = paired.select(
      when(aLower, col("a")).otherwise(col("b")).as("src"),
      when(aLower, col("b")).otherwise(col("a")).as("dst"),
      when(aLower, col("db")).otherwise(col("da")).as("ddeg"))
      .barrier(true)
    val e1 = oriented.select(col("src"), col("dst").as("v"), col("ddeg").as("dv"))
    val e2 = oriented.select(col("src"), col("dst").as("w"), col("ddeg").as("dw"))
    val wedges = e1.join(e2, "src")
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
    val closed = wedges.join(und,
      least(col("v"), col("w")) === col("a") &&
        greatest(col("v"), col("w")) === col("b"))
      .select(col("src"), col("v"), col("w"))
    closed
      .select(explode(array(col("src"), col("v"), col("w"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
  }

  /** PageRank over the dependency edge table — "most-depended-on
    * resource" criticality ranking, the natural next analytics step
    * after 1-hop dependents (G4) and reachability (G2): importance
    * flows along `from_id → to_id` edges, so shared infrastructure
    * (nations/regions in the fixture; VPCs/accounts in a cloud graph)
    * accumulates the mass of everything that transitively depends on it.
    *
    * Arithmetic is EXACT FIXED-POINT: ranks live in bigint units of
    * 10⁻¹² (init = SCALE div N, contribution = pr div outdeg, update =
    * base + (85·inflow) div 100 — integer ops only, dangling mass not
    * redistributed, the standard simplified variant). No float exists
    * anywhere, so any SQL engine replays every iteration bit-for-bit
    * (all operands nonnegative ⇒ truncating and flooring division
    * agree), and results are independent of partitioning, summation
    * order, and retries — the same reproducibility contract as the
    * md5-threshold samplers.
    *
    * Scale shape: one outdeg-annotated edge table built once, then per
    * iteration one join keyed on `from_id` + one partial-agg groupBy on
    * `to_id` — Pregel's message/combine halves as two exchanges over
    * frames partitioned by vertex id; state per iteration is one bigint
    * per vertex. Lineage is truncated with a periodic localCheckpoint so
    * the plan stays iteration-bounded.
    */
  def pageRank(edges: DataFrame, iters: Int = 10,
      localEdgeLimit: Long = LocalEdgeLimit): DataFrame = {
    require(iters >= 1 && iters <= 50, s"pageRank: iters out of [1,50]: $iters")
    val e = edges.select(col("from_id").cast("string").as("from_id"),
      col("to_id").cast("string").as("to_id"))
    // Driver-contracted endgame (the [[reachFrom]] pattern): the exact
    // fixed-point arithmetic is integer-only and order-independent, so
    // replaying the identical iterations over a collected edge array is
    // bit-for-bit the distributed result — at fixture SF it trades
    // ~3 driver-sequential jobs per iteration for one collect. The same
    // gate + fallback keeps cluster-scale graphs fully distributed.
    if (fitsDriver(e, localEdgeLimit)) {
      val rows = e.collect()
      if (rows.length < localEdgeLimit) {
        val spark = edges.sparkSession
        import spark.implicits._
        val Scale = 1000000000000L
        val outdeg = new java.util.HashMap[String, Long]()
        val nodeSet = new java.util.LinkedHashSet[String]()
        rows.foreach { r =>
          val f = if (r.isNullAt(0)) null else r.getString(0)
          val t = if (r.isNullAt(1)) null else r.getString(1)
          nodeSet.add(f); nodeSet.add(t)
          outdeg.merge(f, 1L, (a, b) => a + b)
        }
        val n = nodeSet.size.toLong
        require(n > 0, "pageRank: empty graph")
        val init = Scale / n
        val base = (15L * init) / 100L
        var pr = new java.util.HashMap[String, Long]()
        nodeSet.forEach(v => pr.put(v, init))
        var it = 0
        while (it < iters) {
          val inflow = new java.util.HashMap[String, Long]()
          rows.foreach { r =>
            val f = if (r.isNullAt(0)) null else r.getString(0)
            val t = if (r.isNullAt(1)) null else r.getString(1)
            // null endpoints mirror the distributed equi-joins: a null
            // from_id matches no pr row (contributes nothing), a null
            // to_id's inflow never joins back to a node
            if (f != null) {
              val c = pr.get(f) / outdeg.get(f)
              if (t != null) inflow.merge(t, c, (a, b) => a + b)
            }
          }
          val next = new java.util.HashMap[String, Long]()
          nodeSet.forEach { v =>
            val in = if (v == null) 0L else inflow.getOrDefault(v, 0L)
            next.put(v, base + (85L * in) / 100L)
          }
          pr = next
          it += 1
        }
        val out = new scala.collection.mutable.ArrayBuffer[(String, Long)](nodeSet.size)
        nodeSet.forEach(v => out += ((v, pr.get(v))))
        return localFrame(spark, out.toSeq, Seq("id", "pr"))
      }
    }
    val nodes = e.select(col("from_id").as("id"))
      .unionByName(e.select(col("to_id").as("id")))
      .distinct().barrier(true)
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    val Scale = 1000000000000L // 10^-12 rank units
    val init = Scale / n
    val outdeg = e.groupBy("from_id").agg(count(lit(1)).as("outdeg"))
    // pre-partition the (static) annotated edges on the per-iteration
    // join key so the ten pr-joins reuse one layout instead of
    // re-exchanging the edge table every round
    val eo = e.join(outdeg, "from_id")
      .repartition(col("from_id")).barrier(true)
    var pr = nodes.withColumn("pr", lit(init))
    var it = 0
    while (it < iters) {
      val inflow = eo.join(pr, eo("from_id") === pr("id"))
        .select(col("to_id").as("id"), expr("pr div outdeg").as("c"))
        .groupBy("id").agg(sum("c").as("inflow"))
      pr = nodes.join(inflow, Seq("id"), "left")
        .select(col("id"),
          expr(s"${(15L * init) / 100L} + (85 * coalesce(inflow, 0)) div 100")
            .as("pr"))
      it += 1
      if (it % 3 == 0 && it < iters) pr = pr.barrier(true)
    }
    pr
  }

  /** Synchronous label-propagation community detection (Raghavan et al.
    * 2007) made DETERMINISTIC: labels start as vertex ids; each round
    * every vertex adopts the most frequent label among its neighbors'
    * PREVIOUS labels over the deduped undirected view, ties broken to
    * the smallest label; a vertex with no neighbors keeps its label.
    * Classic LPA randomizes update order — the synchronous min-tie
    * variant trades a little convergence speed for exact replayability
    * (every round is one join + one count aggregation + one per-vertex
    * argmax aggregation, the Pregel shape, unrollable as SQL CTEs).
    *
    * 100 TB shape: per round, the neighbor join shuffles on the vertex
    * key and both aggregations combine map-side (the argmax is a
    * min-over-struct, not a window — no per-vertex sort, and only one
    * candidate row per map partition crosses the wire). The undirected
    * edge view is pre-partitioned once and reused across rounds,
    * mirroring [[pageRank]].
    */
  def labelPropagation(edges: DataFrame, rounds: Int,
      localEdgeLimit: Long = LocalEdgeLimit): DataFrame = {
    require(rounds >= 1 && rounds <= 20,
      s"labelPropagation: rounds out of [1,20]: $rounds")
    val e = edges.select(col("from_id").cast("string").as("a"),
      col("to_id").cast("string").as("b"))
    // Driver-contracted endgame ([[reachFrom]] pattern): the synchronous
    // min-tie update is deterministic, so replaying the identical rounds
    // over a collected deduped adjacency equals the distributed result;
    // at fixture SF it replaces ~3 sequential jobs per round with one
    // collect. Distributed loop below is the cluster-scale path.
    if (fitsDriver(e, localEdgeLimit)) {
      val rows = e.collect()
      if (rows.length < localEdgeLimit) {
        val spark = edges.sparkSession
        import spark.implicits._
        // deduped undirected neighbor sets (the distributed view's
        // union+distinct); null neighbors drop like the equi-join does
        val adj = new java.util.HashMap[String, java.util.HashSet[String]]()
        def add(f: String, t: String): Unit = {
          var s = adj.get(f)
          if (s == null) { s = new java.util.HashSet[String](); adj.put(f, s) }
          if (t != null) s.add(t)
        }
        rows.foreach { r =>
          val f = if (r.isNullAt(0)) null else r.getString(0)
          val t = if (r.isNullAt(1)) null else r.getString(1)
          add(f, t); add(t, f)
        }
        var labels = new java.util.HashMap[String, String]()
        adj.keySet().forEach(v => labels.put(v, v))
        var r = 0
        while (r < rounds) {
          val next = new java.util.HashMap[String, String]()
          adj.forEach { (v, nbs) =>
            var bestLabel: String = null
            var bestCnt = 0L
            // A NULL vertex never receives neighbor labels on the
            // distributed path (the freq join on id is non-null-safe),
            // so its label is frozen there — mirror that here instead
            // of computing one, or the two execution paths diverge.
            if (v != null && !nbs.isEmpty) {
              val cnt = new java.util.HashMap[String, Long]()
              nbs.forEach { nb =>
                val l = labels.get(nb)
                cnt.merge(l, 1L, (a, b) => a + b)
              }
              cnt.forEach { (l, c) =>
                // ties to the smallest label in UTF8 binary order — the
                // ordering Spark's min-over-struct applies distributed
                if (c > bestCnt || (c == bestCnt && (bestLabel == null ||
                    org.apache.spark.unsafe.types.UTF8String.fromString(l)
                      .compareTo(org.apache.spark.unsafe.types.UTF8String
                        .fromString(bestLabel)) < 0))) {
                  bestCnt = c; bestLabel = l
                }
              }
            }
            next.put(v, if (bestLabel == null) labels.get(v) else bestLabel)
          }
          labels = next
          r += 1
        }
        val out = new scala.collection.mutable.ArrayBuffer[(String, String)](labels.size())
        labels.forEach((k, v) => out += ((k, v)))
        return localFrame(spark, out.toSeq, Seq("id", "community"))
      }
    }
    val und = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .repartition(col("b")).barrier(true)
    val nodes = und.select(col("a").as("id")).distinct().barrier(true)
    var labels = nodes.withColumn("label", col("id"))
    var r = 0
    while (r < rounds) {
      val freq = und.join(labels.withColumnRenamed("id", "b"), "b")
        .groupBy(col("a"), col("label")).agg(count(lit(1)).as("cnt"))
      // per-vertex argmax as a partial-aggregable min over
      // struct(-cnt, label): most-frequent first (smallest -cnt), ties to
      // the smallest label — identical to ROW_NUMBER() OVER (ORDER BY cnt
      // DESC, label ASC) = 1, but planned as a HashAggregate whose
      // map-side combine leaves one row per (partition, vertex) before
      // the exchange, where the window form exchanged every (vertex,
      // label) row and then sorted each vertex's group.
      val best = freq
        .groupBy(col("a"))
        .agg(min(struct((-col("cnt")).as("nc"), col("label").as("l"))).as("m"))
        .select(col("a").as("id"), col("m").getField("l").as("nl"))
      labels = labels.join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("nl"), col("label")).as("label"))
      r += 1
      if (r % 3 == 0 && r < rounds) labels = labels.barrier(true)
    }
    labels.select(col("id"), col("label").as("community"))
  }

  /** k-core peeling: iteratively remove vertices with degree < k from
    * the undirected deduped view; after enough rounds the survivors are
    * the k-core (the densely-knit backbone community detection and
    * graph sparsification both start from). `rounds` is FIXED, not
    * run-to-convergence — each round is one degree aggregation + two
    * semi joins, so the plan is round-bounded and an engine replay can
    * unroll the identical rounds (the q_g13 oracle pattern); callers
    * size rounds to the fixture's peel depth. Returns survivors with
    * their degree in the peeled subgraph.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int,
      localEdgeLimit: Long = LocalEdgeLimit): DataFrame = {
    require(k >= 1 && rounds >= 1 && rounds <= 20,
      s"kCore: bad k=$k or rounds=$rounds")
    val e = edges.select(col("from_id").cast("string").as("a"),
      col("to_id").cast("string").as("b"))
    // Driver-contracted endgame ([[reachFrom]] pattern): fixed-round
    // peeling over a collected deduped pair set replays the distributed
    // rounds exactly (degree = surviving-row count per `a`, semi-join
    // survival = both endpoints non-null and kept).
    val dbg = sys.env.contains("GRAFT_GRAPH_DEBUG")
    def tdbg[A](label: String)(f: => A): A =
      if (!dbg) f else {
        val t0 = System.nanoTime(); val r = f
        System.err.println(
          f"[kcore] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
      }
    if (tdbg("fitsDriver")(fitsDriver(e, localEdgeLimit))) {
      val rows = tdbg("collect")(e.collect())
      if (rows.length < localEdgeLimit) {
        val spark = edges.sparkSession
        import spark.implicits._
        // interned int-indexed vertices + packed-long pair dedup: the
        // peel is then pure primitive-array scans (a boxed HashMap peel
        // measured slower than the distributed rounds it replaced).
        // Presized to the collected row count: default-capacity JDK maps
        // rehash ~17× while interning ~1.6 M endpoints (measured ~1 s of
        // the q_g15 endgame).
        val idx = new java.util.HashMap[String, Integer](
          math.min(rows.length.toLong * 2 + 16, 1 << 22).toInt)
        val names = new scala.collection.mutable.ArrayBuffer[String]()
        var nullId = -1
        def intern(s: String): Int = {
          val got = idx.get(s)
          if (got != null) got.intValue
          else {
            val i = names.size
            idx.put(s, Integer.valueOf(i)); names += s
            if (s == null) nullId = i
            i
          }
        }
        val seen = new java.util.HashSet[java.lang.Long](
          math.min(rows.length.toLong * 4 + 16, 1 << 23).toInt)
        val srcB = new scala.collection.mutable.ArrayBuffer[Int]()
        val dstB = new scala.collection.mutable.ArrayBuffer[Int]()
        tdbg("intern+dedup")(rows.foreach { r =>
          val fi = intern(if (r.isNullAt(0)) null else r.getString(0))
          val ti = intern(if (r.isNullAt(1)) null else r.getString(1))
          if (seen.add((fi.toLong << 32) | (ti & 0xffffffffL))) {
            srcB += fi; dstB += ti
          }
          if (seen.add((ti.toLong << 32) | (fi & 0xffffffffL))) {
            srcB += ti; dstB += fi
          }
        })
        val src = srcB.toArray
        val dst = dstB.toArray
        val nv = names.size
        val live = Array.fill(src.length)(true)
        val kept = new Array[Boolean](nv)
        def liveDegrees(): Array[Int] = {
          val deg = new Array[Int](nv)
          var i = 0
          while (i < src.length) { if (live(i)) deg(src(i)) += 1; i += 1 }
          deg
        }
        var r = 0
        while (r < rounds) {
          val deg = liveDegrees()
          var i = 0
          while (i < nv) { kept(i) = deg(i) >= k; i += 1 }
          // a row survives iff BOTH endpoints are non-null (the semi
          // joins are equi-joins) and kept (degree >= k this round)
          i = 0
          while (i < src.length) {
            if (live(i)) {
              val a = src(i); val b = dst(i)
              if (a == nullId || b == nullId || !kept(a) || !kept(b))
                live(i) = false
            }
            i += 1
          }
          r += 1
        }
        val deg = liveDegrees()
        val out = new scala.collection.mutable.ArrayBuffer[(String, Long)]()
        var i = 0
        while (i < nv) {
          if (deg(i) >= k) out += ((names(i), deg(i).toLong))
          i += 1
        }
        return tdbg("toDF")(localFrame(spark, out.toSeq, Seq("id", "deg")))
      }
    }
    // hash-partition the deduped view on `a` up front: every round's
    // degree aggregation groups on `a` (partitioning satisfied — no
    // exchange), and while AQE broadcasts the (|V|-sized, shrinking)
    // keep set the surviving edges KEEP that partitioning across all
    // rounds — one exchange of the edge set total, not one per round.
    // (No broadcast hint: when |V| outgrows the broadcast threshold the
    // semi joins must fall back to shuffle, not OOM the driver.)
    var und = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .distinct().repartition(col("a")).barrier(true)
    var r = 0
    while (r < rounds) {
      val keep = und.groupBy(col("a").as("id"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select("id")
      und = und
        .join(keep.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
      r += 1
      if (r % 2 == 0 && r < rounds) und = und.barrier(true)
    }
    und.groupBy(col("a").as("id")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= k)
  }

  /** Weighted single-source-set shortest paths: min total edge weight
    * over all directed walks of at most `maxIter` edges from any source
    * (sources at 0). Bellman-Ford relaxation rounds — with nonnegative
    * weights and `maxIter` ≥ graph diameter this is exact SSSP; the
    * bounded-walk semantics are what the recursive-CTE oracle replays,
    * so the two sides agree by construction even below the diameter.
    * Weights are summed in bigint, so results are partition- and
    * order-independent (the pageRank exactness contract).
    *
    * Scale shape: the static edge table is pre-partitioned on the
    * per-round join key once; each round is one join + one min
    * partial-agg — Pregel message/combine halves, state one bigint per
    * reached vertex. Lineage truncated every third round.
    */
  def sssp(edges: DataFrame, sources: DataFrame, maxIter: Int,
      localEdgeLimit: Long = LocalEdgeLimit): DataFrame = {
    require(maxIter >= 1 && maxIter <= 50, s"sssp: iters out of [1,50]: $maxIter")
    val eProj = edges.select(col("from_id").cast("string").as("from_id"),
      col("to_id").cast("string").as("to_id"), col("w").cast("long").as("w"))
    // Driver-contracted endgame ([[reachFrom]] pattern): synchronous
    // Bellman-Ford rounds over a collected weighted edge array — bigint
    // arithmetic, so bit-identical to the distributed relaxation.
    if (fitsDriver(eProj, localEdgeLimit)) {
      val rows = eProj.filter(col("w").isNotNull).collect()
      if (rows.length < localEdgeLimit) {
        val spark = edges.sparkSession
        import spark.implicits._
        val earr = rows.map(r => (
          if (r.isNullAt(0)) null else r.getString(0),
          if (r.isNullAt(1)) null else r.getString(1),
          r.getLong(2)))
        var dist = new java.util.HashMap[String, Long]()
        sources.select(col("id").cast("string")).collect().foreach { r =>
          val s0 = if (r.isNullAt(0)) null else r.getString(0)
          dist.merge(s0, 0L, (a, b) => math.min(a, b))
        }
        var it = 0
        while (it < maxIter) {
          val next = new java.util.HashMap[String, Long](dist)
          earr.foreach { case (f, t, w) =>
            // null from_id matches no dist row in the distributed join
            if (f != null && dist.containsKey(f)) {
              val cand = dist.get(f) + w
              next.merge(t, cand, (a, b) => math.min(a, b))
            }
          }
          dist = next
          it += 1
        }
        val out = new scala.collection.mutable.ArrayBuffer[(String, Long)](dist.size())
        dist.forEach((k, v) => out += ((k, v)))
        return localFrame(spark, out.toSeq, Seq("id", "dist"))
      }
    }
    // NULL-weight edges relax to NULL distances; the endgame drops them
    // before collecting, so drop them here too — otherwise a vertex
    // reachable ONLY via a null-weight edge would emit an (id, NULL)
    // row on this path and nothing on the other.
    val e = eProj.filter(col("w").isNotNull)
      .repartition(col("from_id")).barrier(true)
    var dist = sources.select(col("id").cast("string").as("id"),
      lit(0L).as("dist"))
    var it = 0
    while (it < maxIter) {
      val relax = e.join(dist, e("from_id") === dist("id"))
        .select(col("to_id").as("id"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionByName(relax).groupBy("id").agg(min("dist").as("dist"))
      it += 1
      if (it % 3 == 0 && it < maxIter) dist = dist.barrier(true)
    }
    dist.select(col("id"), col("dist").cast("bigint").as("dist"))
  }

  /** Minimum-distance reachability from `sources` within `maxHops`.
    * Returns (id, distance) with distance = fewest hops (sources at 0).
    * Matches the recursive-CTE semantics: cycle-safe (visited nodes are
    * never revisited at larger distance), `DISTINCT` via min-distance
    * aggregation.
    */
  def reach(edges: DataFrame, sources: Seq[String], maxHops: Int,
      undirected: Boolean): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    reachFrom(edges, sources.toDF("id"), maxHops, undirected)
  }

  /** Multi-source variant: `sources` is a DataFrame with a single `id`
    * column — at scale the seed set is itself distributed (e.g. "distance
    * from every order node"), never a driver-side list.
    */
  def reachFrom(edges: DataFrame, sources: DataFrame, maxHops: Int,
      undirected: Boolean = false,
      localEdgeLimit: Long = LocalEdgeLimit): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val debug = sys.env.contains("GRAFT_BFS_DEBUG")
    var tPhase = System.nanoTime()
    def mark(label: String): Unit = if (debug) {
      val now = System.nanoTime()
      println(f"[bfs] $label: ${(now - tPhase) / 1e9}%.2f s")
      tPhase = now
    }
    val fwd = edges.select(col("from_id").cast("string"), col("to_id").cast("string"))
    // No edge-dedup pass: the per-hop distinct() on join targets absorbs
    // duplicate edges, and skipping the dedup saves a full shuffle of the
    // edge set before the first hop.
    val adjBase = if (undirected) {
      fwd.unionByName(fwd.select(col("to_id").as("from_id"), col("from_id").as("to_id")))
    } else fwd

    // Driver-contracted endgame: one collect (no count job, no persist) and
    // O(edges) of driver CPU instead of ~2 jobs per hop. Only the forward
    // edges come over the wire (undirected mirrors them driver-side). An
    // estimate that turns out wrong (too many actual rows) falls back to
    // the distributed loop rather than failing. The collected adjacency is
    // kept in [[GraphIndexCache]] (reference parity: graph_loader.go loads
    // the graph once and serves every traversal from memory), so repeated
    // traversals over the same edge frame skip the collect entirely.
    val canon = fwd.queryExecution.analyzed.canonicalized
    val localAdj: Option[GraphIndexCache.Adj] =
      (if (localEdgeLimit > 0 && !sys.env.contains("GRAFT_GRAPH_DISTRIBUTED")) GraphIndexCache.get(spark, canon, undirected)
       else None).orElse {
        if (fitsDriver(fwd, localEdgeLimit)) {
          val edgeRows = fwd.collect()
          mark(s"endgame collect (${edgeRows.length} edges)")
          if (edgeRows.length < localEdgeLimit) {
            val adj = localAdjacency(edgeRows, undirected)
            GraphIndexCache.put(spark, canon, undirected, adj,
              edgeRows.length.toLong * (if (undirected) 2 else 1))
            Some(adj)
          } else None
        } else None
      }
    if (localAdj.isDefined) {
      val adjMap = localAdj.get
      // no distinct(): that would be a 32-partition shuffle job for a seed
      // list; the visited-map insert below dedups for free
      val srcRows = sources.select(col("id").cast("string")).collect()
      val dist = new java.util.HashMap[String, Integer]()
      var frontier = new scala.collection.mutable.ArrayBuffer[String]()
      srcRows.foreach { r =>
        val s0 = if (r.isNullAt(0)) null else r.getString(0)
        if (!dist.containsKey(s0)) { dist.put(s0, 0); frontier += s0 }
      }
      var hop = 0
      while (hop < maxHops && frontier.nonEmpty) {
        hop += 1
        val next = new scala.collection.mutable.ArrayBuffer[String]()
        frontier.foreach { n =>
          val ts = adjMap.get(n)
          if (ts != null) {
            val it = ts.iterator()
            while (it.hasNext) {
              val t = it.next()
              if (!dist.containsKey(t)) {
                dist.put(t, Integer.valueOf(hop)); next += t
              }
            }
          }
        }
        frontier = next
      }
      val out = new scala.collection.mutable.ArrayBuffer[(String, Int)](dist.size())
      dist.forEach((k, v) => out += ((k, v.intValue())))
      mark(s"endgame walk (${out.size} nodes)")
      return localFrame(spark, out.toSeq, Seq("id", "distance"))
    }

    var adj = adjBase.persist(StorageLevel.MEMORY_AND_DISK)
    // While frontiers fit in a broadcast, the per-hop join streams `adj`
    // in place — partitioning it would be a wasted shuffle. The first time
    // a frontier outgrows the broadcast limit we switch to an adjacency
    // hash-partitioned on from_id, so every later shuffle join moves only
    // the frontier side. That keeps the toy/medium case at zero edge
    // shuffles and the 100 TB case at one.
    var adjPartitioned = false

    // `visited` is only ever a union of per-hop checkpointed frontiers, so
    // it needs no checkpoint of its own (the union plan stays ≤ maxHops
    // branches deep) — one fewer eager job per hop.
    var visited = sources.select(col("id").cast("string"))
      .distinct().withColumn("distance", lit(0))
      .barrier(eager = false)
    // Bounded-depth frontiers/visited sets are narrow (id[, distance]) and
    // usually tiny next to the edge table — broadcast them while they fit
    // so each hop's joins shuffle nothing but the frontier itself. The
    // count doubles as the checkpoint materialization (lazy checkpoint ⇒
    // one job, not two).
    val bcLimit = 5L * 1000 * 1000
    var visitedCount = visited.count()
    mark("init sources")
    def bc(df: DataFrame, n: Long): DataFrame =
      if (n < bcLimit) df.hint("broadcast") else df
    var frontier = visited
    var frontierCount = visitedCount
    var hop = 0
    while (hop < maxHops && frontierCount > 0) {
      hop += 1
      if (!adjPartitioned && frontierCount >= bcLimit) {
        val p = adjBase.repartition(col("from_id")).persist(StorageLevel.MEMORY_AND_DISK)
        adj.unpersist(blocking = false)
        adj = p
        adjPartitioned = true
      }
      val fr = bc(frontier, frontierCount)
      val next = fr.join(adj, fr("id") === adj("from_id"))
        .select(adj("to_id").as("id"))
        .distinct()
        .join(bc(visited.select(col("id").as("vid")), visitedCount),
          col("id") === col("vid"), "left_anti")
        .withColumn("distance", lit(hop))
        .barrier(eager = false)
      frontierCount = next.count()
      mark(s"hop $hop (frontier=$frontierCount)")
      visitedCount += frontierCount
      visited = visited.unionByName(next)
      frontier = next
    }
    adj.unpersist(blocking = false)
    visited
  }

  /** Pairwise min-distance reachability: like [[reachFrom]] but each
    * result row keeps WHICH seed reached the node — the engine half of a
    * quantified path MATCH `(a)-[e]->{m,n}(b)`, where the (a, b) binding
    * must survive the BFS (reachFrom merges the seed set and loses it).
    * Returns (src, id, distance), distance = fewest hops from `src`
    * (each seed pairs with itself at 0).
    *
    * Scale shape: BFS state is keyed on (src, id), so the frontier is
    * the union of per-source frontiers — each hop is one equi-join of
    * the frontier against the adjacency plus a compound-key anti-join,
    * broadcast while the frontier fits, exactly [[reachFrom]]'s
    * discipline. State is O(seeds × reachable) rows: bind the source set
    * (the MATCH WHERE clause) before calling, don't pass every vertex.
    * The driver endgame reuses the [[GraphIndexCache]] adjacency when
    * the edge set fits, walking one BFS per seed in memory.
    */
  def pairReach(edges: DataFrame, sources: DataFrame, maxHops: Int,
      undirected: Boolean = false,
      localEdgeLimit: Long = LocalEdgeLimit): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    require(maxHops >= 1 && maxHops <= 50, s"pairReach hops out of [1,50]: $maxHops")
    val fwd = edges.select(col("from_id").cast("string"), col("to_id").cast("string"))
    val adjBase = if (undirected) {
      fwd.unionByName(fwd.select(col("to_id").as("from_id"), col("from_id").as("to_id")))
    } else fwd
    val canon = fwd.queryExecution.analyzed.canonicalized
    val localAdj: Option[GraphIndexCache.Adj] =
      (if (localEdgeLimit > 0 && !sys.env.contains("GRAFT_GRAPH_DISTRIBUTED")) GraphIndexCache.get(spark, canon, undirected)
       else None).orElse {
        if (fitsDriver(fwd, localEdgeLimit)) {
          val edgeRows = fwd.collect()
          if (edgeRows.length < localEdgeLimit) {
            val adj = localAdjacency(edgeRows, undirected)
            GraphIndexCache.put(spark, canon, undirected, adj,
              edgeRows.length.toLong * (if (undirected) 2 else 1))
            Some(adj)
          } else None
        } else None
      }
    if (localAdj.isDefined) {
      val adjMap = localAdj.get
      val srcs = sources.select(col("id").cast("string")).collect()
        .map(r => if (r.isNullAt(0)) null else r.getString(0)).distinct
      val out = new scala.collection.mutable.ArrayBuffer[(String, String, Int)]()
      srcs.foreach { s0 =>
        val dist = new java.util.HashMap[String, Integer]()
        dist.put(s0, 0); out += ((s0, s0, 0))
        var frontier = scala.collection.mutable.ArrayBuffer(s0)
        var hop = 0
        while (hop < maxHops && frontier.nonEmpty) {
          hop += 1
          val next = new scala.collection.mutable.ArrayBuffer[String]()
          frontier.foreach { n =>
            val ts = adjMap.get(n)
            if (ts != null) {
              val it = ts.iterator()
              while (it.hasNext) {
                val t = it.next()
                if (!dist.containsKey(t)) {
                  dist.put(t, Integer.valueOf(hop))
                  out += ((s0, t, hop)); next += t
                }
              }
            }
          }
          frontier = next
        }
      }
      return localFrame(spark, out.toSeq, Seq("src", "id", "distance"))
    }
    var adj = adjBase.persist(StorageLevel.MEMORY_AND_DISK)
    var adjPartitioned = false
    val bcLimit = 5L * 1000 * 1000
    var visited = sources.select(col("id").cast("string").as("src"))
      .distinct()
      .select(col("src"), col("src").as("id"), lit(0).as("distance"))
      .barrier(eager = false)
    var visitedCount = visited.count()
    def bc(df: DataFrame, n: Long): DataFrame =
      if (n < bcLimit) df.hint("broadcast") else df
    var frontier = visited
    var frontierCount = visitedCount
    var hop = 0
    while (hop < maxHops && frontierCount > 0) {
      hop += 1
      if (!adjPartitioned && frontierCount >= bcLimit) {
        val p = adjBase.repartition(col("from_id")).persist(StorageLevel.MEMORY_AND_DISK)
        adj.unpersist(blocking = false)
        adj = p
        adjPartitioned = true
      }
      val fr = bc(frontier, frontierCount)
      val next = fr.join(adj, fr("id") === adj("from_id"))
        .select(col("src"), adj("to_id").as("id"))
        .distinct()
        .join(bc(visited.select(col("src").as("vsrc"), col("id").as("vid")),
            visitedCount),
          col("src") === col("vsrc") && col("id") === col("vid"), "left_anti")
        .withColumn("distance", lit(hop))
        .barrier(eager = false)
      frontierCount = next.count()
      visitedCount += frontierCount
      visited = visited.unionByName(next)
      frontier = next
    }
    adj.unpersist(blocking = false)
    visited
  }

  /** BFS variant that carries the reference's path-array semantics
    * (the recursive CTE's `path || to_id` + `NOT to_id = ANY(path)`
    * idiom): returns (id, path, distance) where `path` is the
    * lexicographically-smallest shortest path from any source. The lean
    * [[reachFrom]] remains the 100 TB route (visited-set, no per-row
    * arrays); this one exists for reference-exact path output and is
    * bounded the same way (paths cost O(depth) ids per row).
    */
  def reachPaths(edges: DataFrame, sources: Seq[String],
      maxHops: Int, localEdgeLimit: Long = LocalEdgeLimit): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val debug = sys.env.contains("GRAFT_BFS_DEBUG")
    var tPhase = System.nanoTime()
    def mark(label: String): Unit = if (debug) {
      val now = System.nanoTime()
      println(f"[bfs-paths] $label: ${(now - tPhase) / 1e9}%.2f s")
      tPhase = now
    }
    val eBase = edges.select(col("from_id").cast("string"),
      col("to_id").cast("string"))

    // Driver-contracted endgame (see [[reachFrom]]): same gate + cache,
    // plus the distributed path's determinism contract — among equal-length
    // paths to a node keep the array-lexicographic minimum, compared
    // element-wise in UTF8 binary order exactly as Spark's min on
    // array<string> does.
    val canon = eBase.queryExecution.analyzed.canonicalized
    val localAdj: Option[GraphIndexCache.Adj] =
      (if (localEdgeLimit > 0 && !sys.env.contains("GRAFT_GRAPH_DISTRIBUTED")) GraphIndexCache.get(spark, canon, undirected = false)
       else None).orElse {
        if (fitsDriver(eBase, localEdgeLimit)) {
          val rows = eBase.collect()
          mark(s"endgame collect (${rows.length} edges)")
          if (rows.length < localEdgeLimit) {
            val adj = localAdjacency(rows)
            GraphIndexCache.put(spark, canon, undirected = false, adj, rows.length.toLong)
            Some(adj)
          } else None
        } else None
      }
    if (localAdj.isDefined) {
      import org.apache.spark.unsafe.types.UTF8String
      val adjMap = localAdj.get
      def pathLess(a: Array[String], b: Array[String]): Boolean = {
        var i = 0
        while (i < a.length && i < b.length) {
          val c = UTF8String.fromString(a(i)).compareTo(UTF8String.fromString(b(i)))
          if (c != 0) return c < 0
          i += 1
        }
        a.length < b.length
      }
      val best = new java.util.HashMap[String, Array[String]]()
      val out = new scala.collection.mutable.ArrayBuffer[(String, Seq[String], Int)]()
      var frontier = new scala.collection.mutable.ArrayBuffer[String]()
      sources.foreach { s0 =>
        // duplicate seeds keep their duplicate output rows (union parity
        // with the distributed frame) but expand once
        out += ((s0, Seq(s0), 0))
        if (!best.containsKey(s0)) { best.put(s0, Array(s0)); frontier += s0 }
      }
      var hop = 0
      while (hop < maxHops && frontier.nonEmpty) {
        hop += 1
        val cand = new java.util.HashMap[String, Array[String]]()
        frontier.foreach { n =>
          val base = best.get(n)
          val ts = adjMap.get(n)
          if (ts != null) {
            val it = ts.iterator()
            while (it.hasNext) {
              val t = it.next()
              if (!best.containsKey(t)) {
                val p = base :+ t
                val prev = cand.get(t)
                if (prev == null || pathLess(p, prev)) cand.put(t, p)
              }
            }
          }
        }
        val nf = new scala.collection.mutable.ArrayBuffer[String](cand.size())
        cand.forEach { (k, p) =>
          best.put(k, p); out += ((k, p.toSeq, hop)); nf += k
        }
        frontier = nf
      }
      mark(s"endgame walk (${out.size} rows)")
      val res = out.toSeq.toDF("id", "path", "distance")
      mark("endgame encode")
      return res
    }

    val e = eBase.persist(StorageLevel.MEMORY_AND_DISK)
    var visited = sources.toDF("id")
      .withColumn("path", array(col("id")))
      .withColumn("distance", lit(0))
      .barrier(eager = false)
    var frontier = visited
    var n = frontier.count()
    var hop = 0
    while (hop < maxHops && n > 0) {
      hop += 1
      val fr = frontier.hint("broadcast")
      val stepped = fr.join(e, fr("id") === e("from_id"))
        .select(e("to_id").as("nid"),
          concat(col("path"), array(e("to_id"))).as("path"))
        .join(visited.select(col("id").as("vid")).hint("broadcast"),
          col("nid") === col("vid"), "left_anti")
        // shortest-path tree determinism: among equal-length paths keep
        // the array-lexicographic minimum (arrays of equal length, so
        // Spark and any list-ordering engine agree)
        .groupBy(col("nid").as("id")).agg(min("path").as("path"))
        .withColumn("distance", lit(hop))
        .barrier(eager = false)
      n = stepped.count()
      visited = visited.unionByName(stepped)
      frontier = stepped
    }
    e.unpersist(blocking = false)
    visited
  }

  /** Shortest-path length from `from` to `to`, depth ≤ maxDepth
    * (graph_loader.go:402-433: `WHERE to_id = ? ORDER BY depth LIMIT 1`).
    * None if unreachable within the bound.
    */
  def shortestPathLength(edges: DataFrame, from: String, to: String,
      maxDepth: Int = 10): Option[Int] = {
    val r = reach(edges, Seq(from), maxDepth, undirected = false)
      .filter(col("id") === to)
      .agg(min("distance"))
      .collect()(0)
    if (r.isNullAt(0)) None else Some(r.getInt(0))
  }

  /** k-hop undirected neighborhood with min distance per node
    * (graph_loader.go:435-464: `(from→to) ∪ (to→from)`, DISTINCT, ORDER BY
    * distance). Excludes the start node itself only if the reference does —
    * it includes it at distance 0; we keep that.
    */
  def neighborhood(edges: DataFrame, id: String, k: Int): DataFrame =
    reach(edges, Seq(id), k, undirected = true)
      .orderBy(col("distance"), col("id"))

  /** Connected components over an undirected edge set `(from_id, to_id)`:
    * returns (id, component) with component = min id in the component.
    * Min-label propagation with a pointer-doubling step per round, so
    * convergence is O(log diameter) rounds rather than O(diameter) —
    * each round is two co-partitioned joins + an aggregation, no
    * driver-side state. This is the clustering stage of near-dup dedup
    * (pairs → clusters → canonical keeper) and the general CC operator.
    *
    * Three regimes, cheapest first: symmetrized edge rows ≤
    * `localEdgeLimit` (≈8 MB collected at the default) solve as ONE
    * collect + driver union-find — zero further Spark jobs, because at
    * tiny sizes the per-round floor (two jobs/round, broadcast
    * create+destroy) dominates by 10× (measured: 4–5 s for a 5k-edge
    * entity-resolution graph vs ~0.3 s collected). Mid sizes run the
    * driver-contracted label loop; label sets beyond driver memory run
    * the fully distributed join loop. `localEdgeLimit = 0` disables the
    * local endgame (spec hook, mirrors reachFrom's gate).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20,
      localEdgeLimit: Long = 500L * 1000): DataFrame = {
    // Type-preserving: component = MIN(id) in the id column's own type
    // (numeric min for long doc ids, lexicographic for string node ids).
    // No dedup pass: duplicate edges are harmless under min-aggregation,
    // and dropping the extra shuffle pays for itself every round.
    val e0 = edges.select(col("from_id").as("a"), col("to_id").as("b"))
    val symBase = e0.unionByName(e0.select(col("b").as("a"), col("a").as("b")))
    var sym = symBase.persist(StorageLevel.MEMORY_AND_DISK)

    // Contracted-label fast path: when the label map fits on the driver
    // (nodes ≪ edges — the usual CC endgame), each round is ONE shuffle
    // job (neighbor-min aggregation with the current labels applied via a
    // broadcast lookup), and the pointer jumping happens as driver-side
    // path compression — full contraction per round, so chains collapse
    // in a single round instead of log(diameter) join rounds. The edge
    // set itself stays distributed throughout; only the (id → comp) map
    // is collected. This is the standard "solve the contracted problem
    // locally" step of distributed CC; the join path below remains the
    // scale path for label sets beyond driver memory. Gate on the edge
    // count (materializes the persist; nodes ≤ 2·edges) so no separate
    // node-count job is needed.
    val idType = sym.schema("a").dataType
    // One gating job: edge count (materializes the persist) and an approx
    // node count together. The contracted path collects the full
    // (id, comp) map per round, and 8M edges could mean 16M nodes — too
    // much for a default driver — so the node estimate decides near the
    // boundary; below 2M edges the worst case (2 edges/node) is already
    // safe and the sketch value is simply ignored. ±2% sketch error is
    // irrelevant at a 4M threshold (~few hundred MB of collected rows).
    val gate = sym.select(count(lit(1)).as("m"),
      approx_count_distinct(col("a")).as("n")).head
    val nEdges = gate.getLong(0)
    val contractable = nEdges < 8L * 1000 * 1000 &&
      (idType == org.apache.spark.sql.types.LongType ||
       idType == org.apache.spark.sql.types.StringType) &&
      (nEdges < 2L * 1000 * 1000 || gate.getLong(1) < 4L * 1000 * 1000)
    if (contractable) {
      val out =
        if (nEdges <= localEdgeLimit)
          ccLocal(sym).getOrElse(ccContracted(sym, maxIter))
        else ccContracted(sym, maxIter)
      sym.unpersist(blocking = false)
      return out
    }

    // Round 0 fused into the init: label = min(self, neighbors) in one
    // aggregation (also yields the node set — every node has ≥1 edge).
    // Lazy checkpoint: the count below materializes it in the same job.
    var labels = symBase.groupBy(col("a").as("id")).agg(min("b").as("nb"))
      .select(col("id"), least(col("id"), col("nb")).as("comp"))
      .barrier(eager = false)
    // Label frames are narrow (id, comp) pairs — tiny relative to the edge
    // set. Below this row count we hint them broadcast so each round is a
    // single shuffle (the groupBy); above it the hint is withheld, the
    // joins fall back to shuffle joins, and `sym` is re-persisted
    // hash-partitioned on the join key b so per-round shuffles move only
    // the label side.
    val nNodes = labels.count()
    val small = nNodes < 50L * 1000 * 1000
    if (!small) {
      val p = symBase.repartition(col("b")).persist(StorageLevel.MEMORY_AND_DISK)
      sym.unpersist(blocking = false)
      sym = p
    }
    def bc(df: DataFrame): DataFrame = if (small) df.hint("broadcast") else df
    // One pointer jump: follow the current pointer column's own pointer.
    def jump(df: DataFrame, c: String, out: String): DataFrame = {
      val ptr = df.select(col("id").as("pid"), col(c).as("pc"))
      df.join(bc(ptr), df(c) === ptr("pid"), "left")
        .select(col("id"), col("comp"),
          least(col(c), coalesce(col("pc"), col(c))).as(out))
    }
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      iter += 1
      val tRound = System.nanoTime()
      // min label over neighbors, merged with own label
      val nbrMin = sym.join(bc(labels), sym("b") === labels("id"))
        .groupBy(sym("a").as("id")).agg(min("comp").as("nbr_comp"))
      val stepped = labels.join(bc(nbrMin), Seq("id"), "left")
        .select(col("id"), col("comp"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("c1"))
        .barrier(eager = false)
      // Two pointer jumps WITHIN the round — label chains contract ~4×
      // per round, so convergence is ~log4(diameter) rounds. j1 is used
      // twice (as input and as pointer table) but recomputing it from
      // the checkpointed `stepped` is one broadcast join — cheaper than
      // materializing it. The whole round (neighbor-min, both jumps, and
      // the convergence test against the pre-round labels) materializes
      // in the single count() action below.
      val j1 = jump(stepped, "c1", "c2")
      val doubled = jump(j1, "c2", "new_comp").barrier(eager = false)
      // Fixed point iff nothing moved across the whole round (the jumps
      // can only lower labels the neighbor-min pass already lowered).
      converged = doubled.filter(col("new_comp") =!= col("comp")).count() == 0
      labels = doubled.select(col("id"), col("new_comp").as("comp"))
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(s"[cc] round $iter ${(System.nanoTime() - tRound) / 1e9}s converged=$converged")
    }
    sym.unpersist(blocking = false)
    labels
  }

  /** Driver-contracted CC rounds (see [[connectedComponents]]): per round
    * one distributed neighbor-min aggregation over the (still distributed)
    * edge set with current labels applied through a broadcast lookup, then
    * full path compression of the collected label map on the driver.
    * Round 1 runs with identity labels, so it doubles as the
    * min(self, neighbors) init. Ordering semantics are identical to the
    * join path: labels only ever decrease, component = min id.
    */
  /** Driver-local CC endgame: one collect of the (already tiny)
    * symmetrized edge set, min-root union-find with path compression
    * (min-union keeps every root the minimum of its merged roots, and
    * every member starts as a root, so the final root IS the component
    * min — the exact contract of the distributed paths). Edges are
    * PACKED to flat primitive/string arrays on the executors before the
    * collect, so 500k sym rows at the default limit reach the driver as
    * ~8 MB of long[] — not tens of MB of transient Row objects (the
    * union-find map itself holds unboxed long keys via LongMap; only
    * merged-root values box). Returns None on inputs the typed solve
    * can't carry (non-Long/String ids, NULL endpoints) so the caller
    * falls back to the contracted loop.
    */
  private def ccLocal(sym: DataFrame): Option[DataFrame] = {
    val spark = sym.sparkSession
    import spark.implicits._
    val idType = sym.schema("a").dataType
    val isLong = idType == org.apache.spark.sql.types.LongType
    val isString = idType == org.apache.spark.sql.types.StringType
    if (!isLong && !isString) return None
    val t0 = System.nanoTime()

    if (isLong) {
      // (hasNull, packed a0,b0,a1,b1,...) per partition — the repack runs
      // distributed; the driver only ever sees primitive arrays
      val chunks: Array[(Boolean, Array[Long])] = sym.rdd.mapPartitions { it =>
        val buf = new scala.collection.mutable.ArrayBuilder.ofLong
        var hasNull = false
        it.foreach { r =>
          if (r.isNullAt(0) || r.isNullAt(1)) hasNull = true
          else { buf += r.getLong(0); buf += r.getLong(1) }
        }
        Iterator.single((hasNull, buf.result()))
      }.collect()
      if (chunks.exists(_._1)) return None
      val parent = new scala.collection.mutable.LongMap[Long]
      def find(x: Long): Long = {
        var r = x
        var p = parent.getOrElse(r, r)
        while (p != r) { r = p; p = parent.getOrElse(r, r) }
        var c = x
        while (c != r) { val n = parent(c); parent.update(c, r); c = n }
        r
      }
      chunks.foreach { case (_, arr) =>
        var i = 0
        while (i < arr.length) {
          val ra = find(arr(i)); val rb = find(arr(i + 1))
          if (ra != rb) {
            if (ra < rb) parent.update(rb, ra) else parent.update(ra, rb)
          }
          i += 2
        }
      }
      // sym carries both directions, so the `a` slots cover every node
      val nodes = new scala.collection.mutable.LinkedHashSet[Long]
      chunks.foreach { case (_, arr) =>
        var i = 0
        while (i < arr.length) { nodes += arr(i); i += 2 }
      }
      val out = localFrame(spark,
        nodes.iterator.map(n => (n, find(n))).toSeq, Seq("id", "comp"))
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(s"[cc] local union-find: ${chunks.iterator.map(_._2.length / 2).sum} " +
          s"sym rows in ${(System.nanoTime() - t0) / 1e9}s")
      Some(out)
    } else {
      val chunks: Array[(Boolean, Array[String])] = sym.rdd.mapPartitions { it =>
        val buf = scala.collection.mutable.ArrayBuilder.make[String]
        var hasNull = false
        it.foreach { r =>
          if (r.isNullAt(0) || r.isNullAt(1)) hasNull = true
          else { buf += r.getString(0); buf += r.getString(1) }
        }
        Iterator.single((hasNull, buf.result()))
      }.collect()
      if (chunks.exists(_._1)) return None
      val parent = new scala.collection.mutable.HashMap[String, String]
      def find(x: String): String = {
        var r = x
        var p = parent.getOrElse(r, r)
        while (p != r) { r = p; p = parent.getOrElse(r, r) }
        var c = x
        while (c != r) { val n = parent(c); parent.update(c, r); c = n }
        r
      }
      chunks.foreach { case (_, arr) =>
        var i = 0
        while (i < arr.length) {
          val ra = find(arr(i)); val rb = find(arr(i + 1))
          if (ra != rb) {
            if (ra < rb) parent.update(rb, ra) else parent.update(ra, rb)
          }
          i += 2
        }
      }
      val nodes = new scala.collection.mutable.LinkedHashSet[String]
      chunks.foreach { case (_, arr) =>
        var i = 0
        while (i < arr.length) { nodes += arr(i); i += 2 }
      }
      val out = localFrame(spark,
        nodes.iterator.map(n => (n, find(n))).toSeq, Seq("id", "comp"))
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(s"[cc] local union-find: ${chunks.iterator.map(_._2.length / 2).sum} " +
          s"sym rows in ${(System.nanoTime() - t0) / 1e9}s")
      Some(out)
    }
  }

  private def ccContracted(sym: DataFrame, maxIter: Int): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    val isLong = sym.schema("a").dataType ==
      org.apache.spark.sql.types.LongType

    // Path-compress: follow pointer chains to their root, memoizing.
    // Iterative (labels always point to strictly smaller ids, so chains
    // terminate, but they can be as long as a component's diameter).
    def contract[K](m: scala.collection.mutable.HashMap[K, K]): Unit = {
      val seen = new scala.collection.mutable.ArrayBuffer[K]
      m.keys.toSeq.foreach { k0 =>
        seen.clear()
        var cur = k0
        var nxt = m.getOrElse(cur, cur)
        while (nxt != cur) { seen += cur; cur = nxt; nxt = m.getOrElse(cur, cur) }
        seen.foreach(s => m.update(s, cur))
      }
    }

    // The per-round lookup ships as explicitly broadcast sorted key/value
    // arrays (compact, fast to serialize — a closure-captured Map would be
    // Java-serialized into every task binary) and binary-searches per row.
    def run[K: org.apache.spark.sql.Encoder: scala.reflect.ClassTag](
        get: org.apache.spark.sql.Row => (K, K),
        mkLookup: scala.collection.mutable.HashMap[K, K] =>
          (org.apache.spark.sql.Column => org.apache.spark.sql.Column,
           () => Unit))
        (implicit tt: scala.reflect.runtime.universe.TypeTag[K]): DataFrame = {
      var m = new scala.collection.mutable.HashMap[K, K]
      var ids: Array[K] = null
      var iter = 0
      var converged = false
      while (iter < maxIter && !converged) {
        iter += 1
        val tRound = System.nanoTime()
        // Round 1: identity labels (no lookup); this IS the init agg.
        val (lk, releaseLk) =
          if (iter == 1) (identity[org.apache.spark.sql.Column] _, () => ())
          else mkLookup(m)
        val stepped = sym
          .select(col("a"), lk(col("b")).as("nb"))
          .groupBy(col("a").as("id")).agg(min("nb").as("nbr_comp"))
          .select(col("id"), least(lk(col("id")), col("nbr_comp")).as("comp"))
        val rows = stepped.collect()
        // The collect consumed the lookup — free the round's broadcasts
        // now, or a long session accumulates one key+value array pair per
        // round for its lifetime.
        releaseLk()
        if (ids == null) ids = rows.map(r => get(r)._1)
        val next = new scala.collection.mutable.HashMap[K, K]
        rows.foreach { r => val (k, v) = get(r); if (k != v) next.update(k, v) }
        contract(next)
        // Fixed point if the map didn't move — or, usually a full round
        // earlier, if no edge still crosses two labels: with full path
        // compression, label groups then ARE the components (labels only
        // decrease and a component's minimum node is always its own
        // root), so the "run one more round and watch nothing change"
        // confirmation is replaced by a shuffle-free, collect-free scan
        // of the persisted edge set.
        val mapFixed = next == m
        m = next
        if (mapFixed) converged = true
        else {
          val (lkc, releaseC) = mkLookup(m)
          converged = sym
            .select(lkc(col("a")).as("la"), lkc(col("b")).as("lb"))
            .filter(col("la") =!= col("lb")).take(1).isEmpty
          releaseC()
        }
        if (sys.env.contains("GRAFT_CC_DEBUG"))
          println(s"[cc] contracted round $iter ${(System.nanoTime() - tRound) / 1e9}s converged=$converged")
      }
      // Node set = every group key of the aggregation (all nodes have ≥1
      // edge); emit id → root for all nodes including self-rooted ones.
      ids.map(k => (k, m.getOrElse(k, k))).toSeq.toDF("id", "comp")
    }

    val sc = spark.sparkContext
    if (isLong) {
      run[Long](r => (r.getLong(0), r.getLong(1)), m => {
        val keys = m.keysIterator.toArray.sorted
        val vals = keys.map(m)
        val bk = sc.broadcast(keys)
        val bv = sc.broadcast(vals)
        val f = udf((x: Long) => {
          val i = java.util.Arrays.binarySearch(bk.value, x)
          if (i >= 0) bv.value(i) else x
        })
        ((c: org.apache.spark.sql.Column) => f(c),
         () => { bk.destroy(); bv.destroy() })
      })
    } else {
      run[String](r => (r.getString(0), r.getString(1)), m => {
        val keys = m.keysIterator.toArray.sorted
        val vals = keys.map(m)
        val bk = sc.broadcast(keys: Array[String])
        val bv = sc.broadcast(vals: Array[String])
        val f = udf((x: String) => {
          val i = java.util.Arrays.binarySearch(
            bk.value.asInstanceOf[Array[AnyRef]], x)
          if (i >= 0) bv.value(i) else x
        })
        ((c: org.apache.spark.sql.Column) => f(c),
         () => { bk.destroy(); bv.destroy() })
      })
    }
  }

  /** 1-hop dependencies: outgoing edges joined to the vertex table
    * (graph_loader.go:315-328). `vertices` must carry an `id` column.
    */
  def dependencies(edges: DataFrame, vertices: DataFrame, fromId: String): DataFrame =
    edges.filter(col("from_id") === fromId)
      .join(vertices, edges("to_id") === vertices("id"))

  /** 1-hop dependents: mirror of [[dependencies]] (graph_loader.go:339-351). */
  def dependents(edges: DataFrame, vertices: DataFrame, toId: String): DataFrame =
    edges.filter(col("to_id") === toId)
      .join(vertices, edges("from_id") === vertices("id"))
}
