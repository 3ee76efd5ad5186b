package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine matches manual computation") {
    Similarity.init(spark)
    val df = Seq((Array(1f, 0f, 0f), Array(0.6f, 0.8f, 0f)))
      .toDF("a", "b")
    val c = df.select(Similarity.cosine(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(math.abs(c - 0.6) < 1e-6) // float32 inputs bound the precision
    val z = Seq((Array(0f, 0f), Array(1f, 1f))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(z == 0.0)
  }

  private lazy val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 3)
    .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

  test("brute-force top-k: rank 1 is the query itself at sim 1") {
    val top = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, 5)
    val r1 = top.filter(col("rank") === 1)
      .select("query_id", "id", "cosine_sim").collect()
    assert(r1.length == 3)
    r1.foreach { r => assert(r.getLong(0) == r.getLong(1) && r.getDouble(2) == 1.0) }
    assert(top.count() == 15)
  }

  test("truncatedRerank: full-width pool equals brute force; coarse cuts") {
    val n = emb.count().toInt
    // m = corpus size: the pool is everything, so the exact full-dim
    // re-rank must reproduce brute-force top-k row for row
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries, 5)
      .select("query_id", "rank", "id", "cosine_sim")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val rerank = Similarity.truncatedRerank(emb, "vec_id", "embedding",
        queries, prefixDims = 16, m = n, k = 5)
      .select("query_id", "rank", "id", "cosine_sim")
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2),
        r.getDouble(3))).toSet
    assert(rerank == exact,
      s"missing=${exact -- rerank} extra=${rerank -- exact}")
    // tight pool: the query itself survives coarse (t_sim 1.0) → rank 1
    val tight = Similarity.truncatedRerank(emb, "vec_id", "embedding",
        queries, prefixDims = 16, m = 8, k = 5)
    val r1 = tight.filter(col("rank") === 1)
      .select("query_id", "id", "t_sim", "cosine_sim").collect()
    assert(r1.length == 3)
    r1.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0)
    }
  }

  test("LSH top-k achieves reasonable recall vs brute force") {
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, 10)
      .select("query_id", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, "vec_id", "embedding", queries, 10)
      .select("query_id", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall too low")
  }

  test("LSH planes widen to the sampled width: 256-dim recall survives") {
    // Adversarial for prefix truncation: dims 0-127 are per-vector noise,
    // the cluster signal lives ONLY in dims 128-255. Hashing a 128-dim
    // prefix (the old hard cap) would bucket on pure noise and recall
    // would collapse; sampling the width keeps same-cluster vectors in
    // shared buckets.
    val rnd = new scala.util.Random(42)
    val dim = 256
    val centers = Array.fill(4)(Array.fill(dim / 2)(
      (if (rnd.nextBoolean()) 4f else -4f)))
    val vecs = (0L until 200L).map { i =>
      val noise = Array.fill(dim / 2)(rnd.nextGaussian().toFloat)
      (i, noise ++ centers((i % 4).toInt))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val qs = df.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", qs, 10)
      .select("query_id", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(df, "vec_id", "embedding", qs, 10)
      .select("query_id", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"256-dim recall $recall — planes not widened?")
  }

  test("LSH rejects embeddings beyond the plane cap instead of truncating") {
    val wide = Seq((0L, Array.fill(1025)(1f)), (1L, Array.fill(1025)(0.5f)))
      .toDF("vec_id", "embedding")
    val qs = wide.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val e = intercept[IllegalArgumentException] {
      Similarity.lshTopK(wide, "vec_id", "embedding", qs, 5).collect()
    }
    assert(e.getMessage.contains("plane cap"))
  }

  test("IVF index partitions the corpus; top-k recall rises with nProbe") {
    val (centroids, assigned) = Similarity.ivfIndex(emb, "vec_id", "embedding",
      nCells = 8)
    assert(centroids.count() == 8)
    assert(assigned.count() == emb.count())
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, 10)
      .select("query_id", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(nProbe: Int): Double = {
      val approx = Similarity.ivfTopK(assigned, centroids, queries, 10, nProbe)
        .select("query_id", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val r2 = recallAt(2); val r8 = recallAt(8)
    assert(r8 == 1.0, s"full probe must be exact, got $r8") // nProbe = nCells
    assert(r2 >= 0.2 && r2 <= r8, s"recall@2=$r2 recall@8=$r8")
  }

  test("filtered IVF search: pre-filter semantics, exact at full probe") {
    val (centroids, assigned) = Similarity.ivfIndex(emb, "vec_id",
      "embedding", nCells = 8)
    val dir = tempDir("graft-ivf-filtered").toString
    Similarity.ivfWriteIndex(centroids, assigned, dir)
    val qualifying = emb.filter(col("label").isin(2, 3, 4))
      .select(col("vec_id").as("id"))
    val qualIds = qualifying.as[Long].collect().toSet
    // full probe (nProbe = nCells): must equal brute force over the
    // FILTERED corpus — i.e. true pre-filter top-k
    val got = Similarity.ivfTopKIndexedFiltered(spark, dir, queries,
        qualifying, k = 5, nProbe = 8)
      .select("query_id", "rank", "id", "cosine_sim")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val expect = Similarity.bruteForceTopK(
        emb.filter(col("label").isin(2, 3, 4)), "vec_id", "embedding",
        queries, 5)
      .select("query_id", "rank", "id", "cosine_sim")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
    // the filter guarantee: every returned id qualifies
    assert(got.forall(r => qualIds.contains(r._3)))
  }

  test("persisted IVF index partitioned by cell prunes probe reads") {
    // The 100 TB path as a first-class API: ivfWriteIndex lays the
    // assigned frame out partitioned by cell; ivfTopKIndexed probes it
    // with a literal IN filter that Catalyst prunes to the probed
    // partitions, and returns exactly what the in-memory probe returns.
    val (centroids, assigned) = Similarity.ivfIndex(emb, "vec_id",
      "embedding", nCells = 8)
    val dir = tempDir("graft-ivf").toString
    Similarity.ivfWriteIndex(centroids, assigned, dir)
    val queries = emb.limit(5).select(col("vec_id").as("query_id"),
      col("embedding").cast("array<float>").as("qvec"))
    val fromDisk = Similarity.ivfTopKIndexed(spark, dir, queries,
      k = 10, nProbe = 2)
    // partition pruning is visible in the scan's partition filters
    val plan = fromDisk.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      (plan.contains("cell#") || plan.contains("isin") || plan.contains("IN")),
      plan)
    // parity with the in-memory probe (same scoring path)
    val inMem = Similarity.ivfTopK(assigned, centroids, queries,
        k = 10, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val disk = fromDisk
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(disk == inMem)
    // and the pruned scan reads strictly fewer partition dirs than exist
    val allCells = new java.io.File(s"$dir/assigned").listFiles()
      .count(_.getName.startsWith("cell="))
    // the scan sits below an AdaptiveSparkPlanExec leaf — recurse through
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          scans(r.child)
      }.flatten
    val readCells = scans(fromDisk.queryExecution.executedPlan)
      .collectFirst { case f if f.partitionFilters.nonEmpty =>
        f.selectedPartitions.partitionCount }
    assert(readCells.exists(n => n > 0 && n < allCells),
      s"read $readCells of $allCells cells")
  }

  test("ivfAppendIndex: appended rows probe identically to a direct build") {
    // build from 3/4 of the corpus, append the rest against the frozen
    // centroids — the probe result must equal the in-memory probe over
    // the UNION corpus with the SAME centroids (assignment bit-parity)
    val original = emb.filter(col("vec_id") % 4 =!= 0)
    val appended = emb.filter(col("vec_id") % 4 === 0)
    val (centroids, assignedOrig) = Similarity.ivfIndex(
      original, "vec_id", "embedding", nCells = 8)
    val dir = tempDir("graft-ivf-app").toString
    Similarity.ivfWriteIndex(centroids, assignedOrig, dir)
    val n = Similarity.ivfAppendIndex(spark, dir, appended,
      "vec_id", "embedding")
    assert(n == appended.count())
    // every corpus id present exactly once after the append
    val idx = spark.read.parquet(s"$dir/assigned")
    assert(idx.count() == emb.count())
    assert(idx.select("id").distinct().count() == emb.count())
    // queries = appended vectors; disk probe == in-memory union probe
    val queries = appended.limit(5).select(col("vec_id").as("query_id"),
      col("embedding").cast("array<float>").as("qvec"))
    val fromDisk = Similarity.ivfTopKIndexed(spark, dir, queries,
        k = 10, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val assignedUnion = idx.select("id", "vec", "cell")
    val inMem = Similarity.ivfTopK(assignedUnion, centroids, queries,
        k = 10, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(fromDisk == inMem)
    // self-retrieval: each appended query finds itself (rank 1)
    val self = fromDisk.filter { case (q, r, id) => q == id && r == 1 }
    assert(self.size == 5, s"self-matches: $self")

    // compaction: appends left >1 file in touched cells; after
    // ivfCompactIndex every cell is a single file and the probe result
    // is bit-identical
    def filesPerCell(): Map[String, Int] =
      new java.io.File(s"$dir/assigned").listFiles()
        .filter(_.getName.startsWith("cell=")).map(c =>
          c.getName -> c.listFiles().count(_.getName.endsWith(".parquet")))
        .toMap
    assert(filesPerCell().values.exists(_ > 1), filesPerCell().toString)
    Similarity.ivfCompactIndex(spark, dir)
    val after = filesPerCell()
    assert(after.values.forall(_ == 1), after.toString)
    val compacted = Similarity.ivfTopKIndexed(spark, dir, queries,
        k = 10, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(compacted == fromDisk)
    assert(spark.read.parquet(s"$dir/assigned").count() == emb.count())
  }

  test("lloyd farthest-point seeding: deterministic training-set members, " +
      "spread by the greedy k-center invariant") {
    // deterministic 6-dim fixture, 3 coarse clusters + jitter
    val train = Array.tabulate(60) { i =>
      val c = i % 3
      Array.tabulate(6)(d =>
        (if (d % 3 == c) 5.0f else 0.2f) + ((i * 17 + d * 5) % 11) / 20f)
    }
    def d2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x - y) }.sum
    // iters = 0 exposes the raw seeds
    val seeds = Similarity.lloyd(train, k = 9, seed = 42L, iters = 0)
    assert(seeds.length == 9)
    seeds.foreach(s => assert(train.exists(_.sameElements(s))))
    val again = Similarity.lloyd(train, k = 9, seed = 42L, iters = 0)
    assert(seeds.zip(again).forall { case (a, b) => a.sameElements(b) })
    // greedy farthest-point invariant: pick distances are non-increasing,
    // so every unpicked point sits nearer its seed than any two seeds
    // are to each other
    val minPairwise = (for (i <- seeds.indices; j <- i + 1 until 9)
      yield d2(seeds(i), seeds(j))).min
    val unpicked = train.filterNot(p => seeds.exists(_.sameElements(p)))
    val maxRemaining = unpicked.map(p => seeds.map(d2(p, _)).min).max
    assert(maxRemaining <= minPairwise + 1e-9,
      s"k-center invariant violated: $maxRemaining > $minPairwise")
    // full Lloyd stays deterministic under the new init
    val c1 = Similarity.lloyd(train, k = 4, seed = 7L, iters = 10)
    val c2 = Similarity.lloyd(train, k = 4, seed = 7L, iters = 10)
    assert(c1.zip(c2).forall { case (a, b) => a.sameElements(b) })
  }

  test("autoCells: sqrt-of-corpus rule with floor and cap; nCells=0 " +
      "builds the identical index to passing the auto value explicitly") {
    assert(Similarity.autoCells(100) == 16)      // floor
    assert(Similarity.autoCells(256) == 16)
    assert(Similarity.autoCells(10000) == 100)   // sqrt
    assert(Similarity.autoCells(1000000) == 1000)
    assert(Similarity.autoCells(1000000000L) == 4096) // cap
    val n = emb.count()
    val k = Similarity.autoCells(n)
    val (autoC, _) = Similarity.ivfIndex(emb, "vec_id", "embedding",
      nCells = 0)
    val (explC, _) = Similarity.ivfIndex(emb, "vec_id", "embedding",
      nCells = k)
    def cents(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("cell").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toSeq))
    assert(autoC.count() == k)
    assert(cents(autoC).sameElements(cents(explC)))
  }

  test("autoSubspaces / autoCodes / autoBits: deterministic sizing rules " +
      "with floors and caps") {
    // subDim ≈ 8 when divisible, else largest divisor with subDim >= 4
    assert(Similarity.autoSubspaces(64) == 8)
    assert(Similarity.autoSubspaces(128) == 16)
    assert(Similarity.autoSubspaces(256) == 16)   // cap
    assert(Similarity.autoSubspaces(8) == 1)
    assert(Similarity.autoSubspaces(60) == 15)    // 60/15 = 4
    assert(Similarity.autoSubspaces(7) == 1)      // prime fallback
    // smallest power of two >= sqrt(n), clamped [16, 256]
    assert(Similarity.autoCodes(100) == 16)       // floor
    assert(Similarity.autoCodes(10000) == 128)
    assert(Similarity.autoCodes(65536) == 256)
    assert(Similarity.autoCodes(100000000) == 256) // cap
    // ceil(log2(n)/2) clamped [4, 20]
    assert(Similarity.autoBits(1) == 4)
    assert(Similarity.autoBits(2000) == 6)
    assert(Similarity.autoBits(1000000) == 10)
    assert(Similarity.autoBits(1000000000000L) == 20) // cap
  }

  test("PQ sentinels: nSub=0/kCodes=0 resolve to the auto rules and " +
      "build the identical model to passing the values explicitly") {
    val n = emb.count()
    val dim = emb.select(org.apache.spark.sql.functions.size(col("embedding")))
      .head().getInt(0)
    val subs = Similarity.autoSubspaces(dim)
    val codesK = Similarity.autoCodes(math.min(n, 10000L))
    val (autoM, _, autoCodesDf) = Similarity.pqIndex(emb, "vec_id",
      "embedding", nSub = 0, kCodes = 0)
    assert(autoM.nSub == subs && autoM.kCodes == codesK)
    val (explM, _, explCodesDf) = Similarity.pqIndex(emb, "vec_id",
      "embedding", nSub = subs, kCodes = codesK)
    assert(autoM.books.zip(explM.books).forall { case (a, b) =>
      a.zip(b).forall { case (x, y) => x.sameElements(y) } })
    def codeRows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toSeq))
    assert(codeRows(autoCodesDf).sameElements(codeRows(explCodesDf)))
  }

  test("LSH sentinel: nBits=0 resolves to autoBits(corpus) and returns " +
      "the identical result to passing it explicitly") {
    val bits = Similarity.autoBits(emb.count())
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val auto = Similarity.lshTopK(emb, "vec_id", "embedding", queries,
      k = 5, nBits = 0)
    val expl = Similarity.lshTopK(emb, "vec_id", "embedding", queries,
      k = 5, nBits = bits)
    assert(rows(auto).sameElements(rows(expl)))
    // near-dup path shares the sentinel
    val autoP = Similarity.cosineNearDups(emb, "vec_id", "embedding",
      threshold = 0.9, nBits = 0)
    val explP = Similarity.cosineNearDups(emb, "vec_id", "embedding",
      threshold = 0.9, nBits = bits)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs(autoP).sameElements(pairs(explP)))
  }

  test("ivfStaleness reports drift from the _BUILD marker and " +
      "ivfRetrainIndex swaps a consistent retrained pair (crash " +
      "recovery rolls back, never mixes)") {
    val dir = tempDir("ivf-retrain").toString
    val base = emb.filter(col("vec_id") % 4 =!= 0)
    val extra = emb.filter(col("vec_id") % 4 === 0)
    val (c0, a0) = Similarity.ivfIndex(base, "vec_id", "embedding", nCells = 8)
    Similarity.ivfWriteIndex(c0, a0, dir)
    val fresh = Similarity.ivfStaleness(spark, dir).head()
    assert(fresh.getAs[Long]("rows_total") == base.count())
    assert(fresh.getAs[Double]("appended_fraction") == 0.0)
    val appended = Similarity.ivfAppendIndex(spark, dir, extra,
      "vec_id", "embedding")
    val stale = Similarity.ivfStaleness(spark, dir).head()
    assert(stale.getAs[Long]("rows_total") == emb.count())
    assert(stale.getAs[Long]("rows_trained") == base.count())
    assert(math.abs(stale.getAs[Double]("appended_fraction") -
      appended.toDouble / emb.count()) < 1e-12)
    assert(stale.getAs[Double]("cell_skew") >= 1.0)
    // retrain: full corpus re-fit, pair swapped, marker refreshed
    Similarity.ivfRetrainIndex(spark, dir, nCells = 8)
    val after = Similarity.ivfStaleness(spark, dir).head()
    assert(after.getAs[Long]("rows_trained") == emb.count())
    assert(after.getAs[Double]("appended_fraction") == 0.0)
    // retrained index still serves: appended vectors find themselves
    val q = extra.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val top = Similarity.ivfTopKIndexed(spark, dir, q, k = 3, nProbe = 2)
    q.collect().map(_.getLong(0)).foreach { qid =>
      assert(top.filter(col("query_id") === qid && col("id") === qid &&
        col("rank") === 1).count() == 1, s"query $qid lost self-presence")
    }
    // crash simulation: live pair half-swapped — retrain_old holds the
    // full old pair, live 'centroids' missing, live 'assigned' is the
    // (untrusted) new half. Recovery must restore the OLD pair whole.
    val root = new java.io.File(dir)
    val oldDir = new java.io.File(root, "retrain_old")
    assert(oldDir.mkdir())
    def mv(a: java.io.File, b: java.io.File): Unit = assert(a.renameTo(b))
    val liveA = new java.io.File(root, "assigned")
    val liveC = new java.io.File(root, "centroids")
    // stash current pair as the "old" committed state
    mv(liveA, new java.io.File(oldDir, "assigned"))
    mv(liveC, new java.io.File(oldDir, "centroids"))
    // fake a partial new assigned dir in live position
    assert(liveA.mkdir())
    java.nio.file.Files.writeString(liveA.toPath.resolve("junk"), "torn")
    Similarity.ivfRetrainRecover(dir)
    assert(liveA.exists() && liveC.exists() && !oldDir.exists())
    // restored pair is the consistent pre-crash one: serving still works
    val top2 = Similarity.ivfTopKIndexed(spark, dir, q, k = 3, nProbe = 2)
    assert(top2.filter(col("rank") === 1).count() == q.count())
  }

  test("PQ: codes are the argmin assignment; a coded query ranks itself first") {
    val (model, codebook, codes) = Similarity.pqIndex(emb, "vec_id", "embedding")
    assert(model.nSub == 4 && model.kCodes == 16 && model.subDim == 16)
    assert(codebook.count() == 64)
    // re-derive one vector's codes by hand from the model
    val v = emb.filter(col("vec_id") === 7)
      .select(col("embedding").cast("array<float>"))
      .collect().head.getSeq[Float](0)
    val expected = (0 until model.nSub).map { s =>
      (0 until model.kCodes).minBy { c =>
        val cent = model.books(s)(c)
        (0 until model.subDim).map { i =>
          val d = v(s * model.subDim + i).toDouble - cent(i); d * d }.sum
      }
    }
    val got = codes.filter(col("id") === 7).select("codes")
      .collect().head.getSeq[Int](0)
    assert(got == expected, s"$got != $expected")
    // ADC serving: the query's own (identically coded) vector must rank
    // at distance 0 — but ties at 0 break by id, so just require presence
    // in the top-k and rank-1 to have the query's exact code signature
    val top = Similarity.pqTopK(model, codes, queries, 5)
    val byQ = top.collect().groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.values.foreach(rs => assert(rs.map(_.getInt(1)).toSet == (1 to 5).toSet))
    byQ.keys.foreach { qid =>
      assert(byQ(qid).exists(_.getLong(2) == qid),
        s"query $qid not in its own PQ top-5")
    }
  }

  test("IVF+PQ with nProbe = nCells degenerates to exhaustive ADC exactly") {
    val (centroidsDf, assigned) = Similarity.ivfIndex(emb, "vec_id", "embedding")
    val cents = centroidsDf.orderBy("cell").collect()
      .map(_.getSeq[Float](1).toArray)
    val (model, _, codes) = Similarity.pqIndex(emb, "vec_id", "embedding")
    val full = Similarity.pqTopK(model, codes, queries, 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val combined = Similarity.ivfPqTopK(cents, assigned, model, codes,
        queries, 10, nProbe = cents.length)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(combined == full)
    // pruned serving still finds each query's own vector (its nearest
    // cell is probed first, its codes give ADC distance 0)
    val pruned = Similarity.ivfPqTopK(cents, assigned, model, codes,
      queries, 10, nProbe = 4).collect()
    val byQ = pruned.groupBy(_.getLong(0))
    byQ.foreach { case (qid, rs) =>
      assert(rs.exists(_.getLong(2) == qid), s"query $qid lost itself") }
    // pruning can only shrink the candidate pool
    assert(pruned.length <= full.size)
  }

  test("PQ training and encoding are deterministic") {
    val (m1, _, c1) = Similarity.pqIndex(emb, "vec_id", "embedding")
    val (m2, _, c2) = Similarity.pqIndex(emb, "vec_id", "embedding")
    assert(m1.books.flatten.flatten.toSeq == m2.books.flatten.flatten.toSeq)
    assert(c1.orderBy("id").collect().map(_.getSeq[Int](1)).toSeq ==
      c2.orderBy("id").collect().map(_.getSeq[Int](1)).toSeq)
  }

  test("cosineNearDups (LSH-bucketed) recalls exact pairs, no false positives") {
    val exact = Similarity.bruteForcePairs(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.cosineNearDups(emb, "vec_id", "embedding",
        threshold = 0.4, nBits = 4, tables = 12)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification is exact cosine, so every emitted pair is a true pair
    assert(approx.subsetOf(exact), (approx diff exact).take(3))
    if (exact.nonEmpty) {
      val recall = (exact intersect approx).size.toDouble / exact.size
      assert(recall >= 0.5, s"recall $recall too low at nBits=4 x 12 tables")
    }
  }

  test("bruteForcePairs symmetric-free and thresholded") {
    val pairs = Similarity.bruteForcePairs(emb.limit(50), "vec_id", "embedding", 0.2)
      .collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.2)
    }
  }

  test("LSH survives a NULL embedding in the sampled row") {
    // The width sample must skip NULL vectors: a corpus whose FIRST row
    // carries a NULL embedding used to NPE in sampledDim's getInt.
    val rows = (null.asInstanceOf[Array[Float]], -1L) +:
      (0L until 50L).map(i => (Array.fill(16)((i % 5).toFloat + 1f), i))
    val df = rows.toDF("embedding", "vec_id")
      .select(col("vec_id"), col("embedding"))
    val qs = df.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val top = Similarity.lshTopK(df, "vec_id", "embedding", qs, 5)
      .select("id").collect().map(_.getLong(0))
    assert(top.nonEmpty, "non-null corpus rows must still be searchable")
    assert(!top.contains(-1L), "NULL vector must never rank")
    // all-NULL corpus: no width observable — falls back, never throws
    val allNull = Seq((1L, null.asInstanceOf[Array[Float]]),
      (2L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
    val qn = Seq((9L, Array.fill(16)(1f))).toDF("query_id", "qvec")
    assert(Similarity.lshTopK(allNull, "vec_id", "embedding", qn, 5)
      .collect().isEmpty)
  }

  test("ivfIndex drops its temp function: registry stable across 50 builds") {
    val df = (0L until 100L).map(i => (i, Array.fill(8)((i % 7).toFloat)))
      .toDF("vec_id", "embedding")
    Similarity.ivfIndex(df, "vec_id", "embedding", nCells = 4)._2
      .unpersist(blocking = false)
    val before = spark.sessionState.functionRegistry.listFunction().size
    (1 to 50).foreach { _ =>
      val (_, assigned) = Similarity.ivfIndex(df, "vec_id", "embedding",
        nCells = 4)
      assigned.unpersist(blocking = false)
    }
    val after = spark.sessionState.functionRegistry.listFunction().size
    assert(after == before,
      s"function registry grew $before -> $after across ivfIndex calls")
  }

  test("embedding dedup manifest: bijection, keeper rules, witness parity with pairs") {
    val thr = 0.4
    val manifest = Similarity.embeddingDedupManifest(emb, "vec_id",
      "embedding", threshold = thr, nBits = 5, tables = 16)
      .select("id", "keeper_id", "is_survivor", "witness_id", "witness_cosine")
      .as[(Long, Long, Boolean, Option[Long], Option[Double])].collect()
    val pairs = Similarity.cosineNearDups(emb, "vec_id", "embedding",
      threshold = thr, nBits = 5, tables = 16)
      .as[(Long, Long, Double)].collect()
    // bijection with the corpus
    val ids = emb.select("vec_id").as[Long].collect().toSet
    assert(manifest.map(_._1).toSet == ids && manifest.length == ids.size)
    val survivors = manifest.filter(_._3).map(_._1).toSet
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    manifest.foreach { case (id, keeper, surv, wit, wc) =>
      assert(surv == (keeper == id), s"$id: survivor flag inconsistent")
      if (!paired.contains(id)) {
        assert(surv && wit.isEmpty, s"unpaired $id must be a keeper-less survivor")
      } else {
        // witness = smallest direct partner, cosine matches the pair set
        val partners = pairs.collect {
          case (a, b, c) if a == id => (b, c)
          case (a, b, c) if b == id => (a, c)
        }
        val (w, c) = partners.minBy(_._1)
        assert(wit.contains(w) && wc.exists(x => math.abs(x - c) < 1e-9),
          s"$id witness mismatch: got ($wit,$wc) want ($w,$c)")
      }
      if (!surv) {
        assert(keeper < id && survivors.contains(keeper),
          s"dropped $id must point at a smaller surviving keeper")
      }
    }
    // at least one real duplicate exists in the fixture, else vacuous
    assert(manifest.exists(!_._3), "fixture has no near-dup to drop")
  }

  test("semantic dedup manifest: clones share a cell and keeper, witnesses stay in-cell") {
    // corpus + identical-vector clones (ids shifted by 1000): a clone
    // must land in its original's cell and pair with it at cosine 1
    val planted = emb.unionByName(
      emb.filter(col("vec_id") < 5)
        .withColumn("vec_id", col("vec_id") + 1000))
    val nCells = 8
    val m = Similarity.semanticDedupManifest(planted, "vec_id", "embedding",
      threshold = 0.9, nCells = nCells)
      .select("id", "cell", "keeper_id", "is_survivor", "witness_id",
        "witness_cosine")
      .as[(Long, Long, Long, Boolean, Option[Long], Option[Double])].collect()
    val byId = m.map(r => r._1 -> r).toMap
    // bijection with the planted corpus
    val ids = planted.select("vec_id").as[Long].collect().toSet
    assert(m.map(_._1).toSet == ids && m.length == ids.size)
    assert(m.forall(r => r._2 >= 0 && r._2 < nCells))
    val survivors = m.filter(_._4).map(_._1).toSet
    (0L until 5L).foreach { id =>
      val (orig, clone) = (byId(id), byId(id + 1000))
      assert(orig._2 == clone._2, s"clone of $id landed in another cell")
      assert(orig._3 == clone._3, s"clone of $id has a different keeper")
      assert(!(orig._4 && clone._4), s"$id and its clone both survived")
    }
    m.foreach { case (id, cell, keeper, surv, wit, _) =>
      assert(surv == (keeper == id), s"$id: survivor flag inconsistent")
      if (!surv) assert(keeper < id && survivors.contains(keeper),
        s"dropped $id must point at a smaller surviving keeper")
      // candidates are generated per cell: witnesses cannot cross cells
      wit.foreach(w => assert(byId(w)._2 == cell,
        s"$id witnessed by $w from another cell"))
    }
  }

  test("scalar quantization: self-query ranks first, recall near-exact") {
    val top = Similarity.sqTopK(emb, "vec_id", "embedding", queries,
      k = 10, candK = 50)
    val r1 = top.filter(col("rank") === 1)
      .select("query_id", "id", "cosine_sim").collect()
    assert(r1.length == 3)
    r1.foreach { r =>
      assert(r.getLong(0) == r.getLong(1) && r.getDouble(2) == 1.0)
    }
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries, 10)
      .select("query_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq = top.select("query_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect sq).size.toDouble / exact.size
    assert(recall >= 0.8, s"SQ recall $recall below 0.8")
  }

  test("scalar quantization params and codes stay in range") {
    val params = Similarity.sqParams(emb, "embedding").collect()
    assert(params.length == 64)
    params.foreach(r => assert(r.getDouble(1) <= r.getDouble(2)))
    // A constant dimension must code to 0, extremes clamp to [0, 255].
    val df = Seq((1L, Array(0f, -5f, 10f)), (2L, Array(0f, 5f, -10f)))
      .toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") === 1)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val out = Similarity.sqTopK(df, "vec_id", "embedding", q, k = 2)
      .orderBy("rank").collect()
    assert(out.length == 2)
    assert(out(0).getLong(2) == 1L) // self first
    // codes: dim0 constant -> 0 for both, dims 1/2 at the two extremes
    // -> codes 0 and 255; integer L2 = 2 * 255^2
    assert(out(1).getLong(3) == 2L * 255 * 255)
  }

  test("randomProjection preserves pairwise distances within JL tolerance") {
    val dim = 64; val k = 16
    // deterministic pseudo-random unit-ish vectors
    def vec(i: Int): Array[Float] = Array.tabulate(dim)(d =>
      (math.sin(i * 131 + d * 17).toFloat * 0.3f))
    val df = (0 until 40).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val proj = Similarity.randomProjection(df, "embedding", k, dim, "jl")
      .select($"vec_id", $"rp").as[(Long, Array[Double])].collect().toMap
    val orig = (0 until 40).map(i => i.toLong -> vec(i)).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for (i <- 0L until 40L; j <- (i + 1) until 40L) yield {
      val od = d2(orig(i).map(_.toDouble), orig(j).map(_.toDouble))
      d2(proj(i), proj(j)) / od
    }
    // E[ratio] = 1 under the ±1/sqrt(k) construction; individual pairs
    // fluctuate, the mean concentrates
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"JL mean distance ratio $mean")
    assert(ratios.forall(r => r > 0.15 && r < 3.5),
      s"JL tail out of range: ${ratios.min} .. ${ratios.max}")
  }

  test("binaryQuantize packs sign bits into 32-bit words exactly") {
    // dims 0,2,33 positive -> word0 = 1 + 4, word1 = bit 1
    val v = Array.fill(64)(-1.0f)
    v(0) = 0.5f; v(2) = 0.1f; v(33) = 2.0f; v(40) = 0.0f // 0 is NOT set
    val out = Similarity.binaryQuantize(
      Seq((1L, v)).toDF("id", "vec"), "vec", 64)
      .select("code_0", "code_1").as[(Long, Long)].collect().head
    assert(out == ((5L, 2L)))
  }

  test("binary Hamming top-k: self is rank 1, pool cut respected") {
    def vec(i: Int): Array[Float] =
      Array.tabulate(64)(d => math.sin(i * 37 + d * 11).toFloat)
    val corpus = (0 until 30).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val queries = Seq((0L, vec(0)), (7L, vec(7)))
      .toDF("query_id", "qvec")
    val out = Similarity.binaryHammingTopK(corpus, "vec_id", "embedding",
      queries, "query_id", "qvec", dim = 64, m = 10, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(4)) -> r.getLong(1)).toMap
    // identical vector: hamming 0, cosine 1 -> rank 1 for itself
    assert(out((0L, 1L)) == 0L)
    assert(out((7L, 1L)) == 7L)
    assert(out.size == 6) // k per query
  }

  test("jlSigns is deterministic and balanced") {
    val a = Similarity.jlSigns(8, 64, "jl")
    val b = Similarity.jlSigns(8, 64, "jl")
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    val plus = a.flatten.count(_ > 0)
    assert(plus > 180 && plus < 330, s"sign balance off: +$plus of 512")
    // different seed -> different matrix
    assert(Similarity.jlSigns(8, 64, "other").map(_.toSeq).toSeq !=
      a.map(_.toSeq).toSeq)
  }

  test("dimensionDiagnostics: exact floor-scaled integer moments per dim") {
    import spark.implicits._
    val df = Seq(Array(0.5f, -0.25f), Array(1.5f, 0.75f)).toDF("embedding")
    val out = Similarity.dimensionDiagnostics(df, "embedding", scale = 100L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // dim0: q = 50, 150; dim1: q = -25, 75 (floor, not half-up round)
    assert(out(0L) == ((2L, 200L, 25000L, 50L, 150L)))
    assert(out(1L) == ((2L, 50L, 6250L, -25L, 75L)))
  }
}
