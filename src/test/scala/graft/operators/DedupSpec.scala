package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep dark forest tonight"
  private lazy val docs = Seq(
    (1L, base, "s1"),
    (2L, base.toUpperCase, "s1"), // exact dup after normalization
    (3L, base.replace("tonight", "today"), "s1"), // near dup
    (4L, "completely different words about spark query engines and scale", "s1"),
    (5L, "another unrelated document mentioning graphs and analytics work", "s2"))
    .toDF("doc_id", "text", "source")

  test("exact dup groups: normalization folds case/punct") {
    val g = Dedup.exactDupGroups(docs, "doc_id", "text").collect()
    assert(g.length == 1)
    assert(g(0).getAs[Long]("group_size") == 2)
    assert(g(0).getAs[Long]("keep_id") == 1L)
  }

  test("dedupExact keeps min-id per group") {
    val kept = Dedup.dedupExact(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L, 5L))
  }

  test("dedupExactKeepBest keeps the argmax-quality row, min-id on ties") {
    // ids 1/2 are the same normalized text; give 2 the higher quality
    val q = Seq((1L, 10L), (2L, 99L), (3L, 5L), (4L, 5L), (5L, 5L))
      .toDF("doc_id", "qual")
    val withQ = docs.join(q, "doc_id")
    val kept = Dedup.dedupExactKeepBest(withQ, "doc_id", "text", col("qual"))
    assert(kept.select("doc_id").as[Long].collect().toSet ==
      Set(2L, 3L, 4L, 5L)) // 2 beats 1 on quality
    assert(kept.filter("doc_id = 2").select("group_size")
      .as[Long].first() == 2L)
    // equal quality -> min id: make 1 and 2 tie
    val tied = docs.join(Seq((1L, 7L), (2L, 7L), (3L, 1L), (4L, 1L),
      (5L, 1L)).toDF("doc_id", "qual"), "doc_id")
    val keptTied = Dedup.dedupExactKeepBest(tied, "doc_id", "text",
      col("qual")).select("doc_id").as[Long].collect().toSet
    assert(keptTied == Set(1L, 3L, 4L, 5L))
  }

  test("shingles: w-grams of normalized text") {
    val sh = spark.range(1)
      .select(Dedup.shingles(lit("a b c d"), 2).as("s"))
      .collect()(0).getSeq[String](0)
    assert(sh.toSet == Set("a b", "b c", "c d"))
  }

  test("minhash LSH finds the near-dup pair and estimates jaccard") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L))) // identical → jaccard 1
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash candidates est_jaccard=1 for identical docs") {
    val est = Dedup.minhashCandidates(docs, "doc_id", "text")
      .filter(col("id_a") === 1 && col("id_b") === 2)
      .select("est_jaccard").as[Double].collect()
    assert(est.length == 1 && est(0) == 1.0)
  }

  test("ngram jaccard pairs are exact and blocked") {
    val rows = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source",
        w = 3, threshold = 0.5)
      .collect().map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Double]("jaccard"))).toMap
    assert(rows((1L, 2L)) == 1.0)
    assert(rows.contains((1L, 3L)))
    assert(rows((1L, 3L)) > 0.5 && rows((1L, 3L)) < 1.0)
  }

  test("ppjoinPairs: global prefix-filter join finds the known pairs") {
    val rows = Dedup.ppjoinPairs(docs, "doc_id", "text", w = 3,
        threshold = 0.5)
      .collect().map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Double]("jaccard"))).toMap
    assert(rows((1L, 2L)) == 1.0)
    assert(rows.contains((1L, 3L)))
    assert(rows((1L, 3L)) > 0.5 && rows((1L, 3L)) < 1.0)
    // doc 2 is doc 1's normalized clone, so (2,3) mirrors (1,3); nothing
    // else clears 0.5 — exactly these three pairs
    assert(rows((2L, 3L)) == rows((1L, 3L)))
    assert(rows.size == 3, rows)
  }

  test("ppjoinPairs equals brute-force all-pairs (completeness, exactness)") {
    // seeded corpus: shared phrase stock + clones + edits + a sub-3-token
    // doc (empty shingle set) + an empty doc
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "omega", "spark",
      "query", "scale", "data", "join", "graph", "text", "token", "near",
      "dup", "set")
    val stock = Vector.fill(6)(
      Vector.fill(8 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    val corpus = (0 until 60).map { i =>
      val s = stock(rnd.nextInt(stock.size))
      val text = rnd.nextInt(4) match {
        case 0 => s // clone of a stock phrase
        case 1 => s + " " + vocab(rnd.nextInt(vocab.size)) // small append
        case 2 => s.split(" ").drop(1).mkString(" ") // small head cut
        case _ => Vector.fill(6 + rnd.nextInt(12))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      (i.toLong, text, "x")
    } :+ ((60L, "two words", "x")) :+ ((61L, "", "x"))
    val cdf = corpus.toDF("doc_id", "text", "source")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("jaccard"))).toSet
    val pp = pairSet(Dedup.ppjoinPairs(cdf, "doc_id", "text", w = 3,
      threshold = 0.5))
    // ground truth: all-pairs inside a single block = exhaustive
    val brute = pairSet(Dedup.ngramJaccardPairs(cdf, "doc_id", "text",
        "source", w = 3, threshold = 0.5)
      .select("id_a", "id_b", "jaccard"))
    assert(pp == brute,
      s"missing=${brute -- pp} extra=${pp -- brute}")
    assert(pp.nonEmpty) // the fixture must actually exercise the join
  }

  test("incrementalNearDups: cross-batch hits only, exact values, clone certain") {
    // history = docs 1..3; incoming = a clone of 1, a near-dup of 1
    // (tonight→today), an internal incoming dup pair (20/21), and noise
    val hist = docs.filter(col("doc_id") <= 3)
    val incoming = Seq(
      (10L, base, "s9"),                               // exact clone of 1
      (11L, base.replace("tonight", "today"), "s9"),   // near-dup of 1
      (20L, "incoming only text about nothing shared one", "s9"),
      (21L, "incoming only text about nothing shared one", "s9"), // dup of 20
      (30L, "completely unrelated noise row", "s9"))
      .toDF("doc_id", "text", "source")
    val index = Dedup.signatureFrame(hist, "doc_id", "text")
    val rows = Dedup.incrementalNearDups(incoming, "doc_id", "text", index,
        threshold = 0.5)
      .collect().map(r => ((r.getAs[Long]("id_new"), r.getAs[Long]("id_hist")),
        r.getAs[Double]("jaccard"))).toMap
    // the identical clone is certain; orientation is (incoming, history)
    assert(rows((10L, 1L)) == 1.0)
    assert(rows((10L, 2L)) == 1.0) // doc 2 is doc 1's normalized twin
    // within-incoming dup (20,21) must NOT appear — index side only
    assert(!rows.keys.exists { case (n, h) => n >= 20L || h >= 10L }, rows)
    // every emitted value is exact Jaccard ≥ threshold (spot: near-dup)
    rows.get((11L, 1L)).foreach(j => assert(j > 0.5 && j < 1.0))
  }

  test("dupClusters groups transitive near-dup pairs; dedupNear keeps canonicals") {
    // pairs (1,2),(2,3) → one cluster {1,2,3} rooted at 1
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val clusters = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // end-to-end on docs: 1~2 exact, 1~3 near → keep 1, drop 2 and 3
    val kept = Dedup.dedupNear(docs, "doc_id", "text", threshold = 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L))
  }

  test("dedupNearManifest: full coverage, consistent keepers, exact witnesses") {
    val m = Dedup.dedupNearManifest(docs, "doc_id", "text", threshold = 0.3)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("keeper_id"), r.getAs[Boolean]("is_survivor"),
          Option(r.getAs[java.lang.Long]("witness_id")).map(_.longValue),
          Option(r.getAs[java.lang.Double]("witness_jaccard")).map(_.doubleValue))))
      .toMap
    // one row per INPUT doc — the completeness property the driver oracle
    // turns into a bijection guard
    assert(m.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // survivors agree with dedupNear
    assert(m.filter(_._2._2).keySet == Set(1L, 4L, 5L))
    // eliminated rows: keeper < id, keeper is a survivor, witness is a
    // genuine partner above the threshold
    for ((id, (keeper, surv, wit, wj)) <- m if !surv) {
      assert(keeper < id && m(keeper)._2, s"doc $id keeper $keeper")
      assert(wit.nonEmpty && wit.get != id, s"doc $id witness $wit")
      assert(wj.exists(_ >= 0.3), s"doc $id witness jaccard $wj")
    }
    // doc 2 is an exact dup of 1: witness 1 at jaccard 1.0
    assert(m(2L) == ((1L, false, Some(1L), Some(1.0))))
    // unpaired docs carry no witness and keep themselves
    assert(m(4L) == ((4L, true, None, None)))
    assert(m(5L) == ((5L, true, None, None)))
  }

  test("connectedComponents: chains converge via pointer doubling, isolated stay") {
    val chain = (1L until 12L).map(i => (i, i + 1)) :+ (20L, 21L)
    // all THREE regimes agree bit for bit: driver union-find (default at
    // this size), contracted label loop (localEdgeLimit = 0 disables the
    // local endgame), and string ids through both
    Seq(500000L, 0L).foreach { lim =>
      val comp = Graph.connectedComponents(
          chain.toDF("from_id", "to_id"), maxIter = 20, localEdgeLimit = lim)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (1L to 12L).foreach(i => assert(comp(i) == 1L, s"node $i (lim=$lim)"))
      assert(comp(20L) == 20L && comp(21L) == 20L, s"lim=$lim")
    }
    Seq(500000L, 0L).foreach { lim =>
      val comp = Graph.connectedComponents(
          chain.map { case (a, b) => (f"s$a%03d", f"s$b%03d") }
            .toDF("from_id", "to_id"),
          maxIter = 20, localEdgeLimit = lim)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      (1L to 12L).foreach(i =>
        assert(comp(f"s$i%03d") == "s001", s"node $i (lim=$lim)"))
      assert(comp("s020") == "s020" && comp("s021") == "s020", s"lim=$lim")
    }
  }

  test("codegen simhash64 is bit-identical to the HOF formulation") {
    graft.functions.VecExprs.register(spark)
    val rows = docs.select(Dedup.simhash64(col("text")).as("fast"),
      Dedup.simhash64Hof(col("text")).as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("codegen minhash_sig is bit-identical to the HOF formulation") {
    graft.functions.VecExprs.register(spark)
    val sh = docs.select(Dedup.hashedShingles(col("text"), 3).as("sh"))
    val rows = sh.select(Dedup.minhashSignature(col("sh"), 16).as("fast"),
      Dedup.minhashSignatureHof(col("sh"), 16).as("ref")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("simhash: identical docs collide, different docs are far") {
    graft.functions.VecExprs.register(spark)
    val h = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    val far = java.lang.Long.bitCount(h(1L) ^ h(4L))
    assert(far > 3)
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("segmentDedup drops corpus-wide repeated segments, keeps first") {
    // 3-token segments: doc 1 = [a b c][d e f]; doc 2 repeats [a b c] then
    // fresh [g h i]; doc 3 is entirely segments seen before (all dropped);
    // doc 4 repeats its own first segment internally.
    val df = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c g h i"),
      (3L, "a b c d e f"),
      (4L, "x y z x y z"))
      .toDF("doc_id", "text")
    val out = Dedup.segmentDedup(df, "doc_id", "text", segTokens = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 2L, "a b c d e f")))
    assert(out(2L) == ((2L, 1L, "g h i")), "repeat of doc 1's segment dropped")
    assert(out(3L) == ((2L, 0L, "")), "fully-duplicated doc survives empty")
    assert(out(4L) == ((2L, 1L, "x y z")), "within-doc repeat deduped too")
  }

  test("segmentDedup: partial tail segment and reassembly order") {
    val df = Seq(
      (10L, "one two three four five"),          // [one two three][four five]
      (11L, "four five one two three"))          // [four five one][two three]
      .toDF("doc_id", "text")
    val out = Dedup.segmentDedup(df, "doc_id", "text", segTokens = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // no segment string repeats across the two docs (different windows)
    assert(out(10L) == ((2L, 2L, "one two three four five")))
    assert(out(11L) == ((2L, 2L, "four five one two three")))
  }

  test("substringDedupSpans: shared run marks maximal merged spans") {
    // Docs 20 and 21 share the 5-token run "alpha beta gamma delta epsilon"
    // at different offsets; with L=3 the duplicated window starts are the
    // run's 3 window positions, which merge into ONE span covering the run.
    val df = Seq(
      (20L, "alpha beta gamma delta epsilon zz yy xx ww vv"),
      (21L, "qq rr alpha beta gamma delta epsilon ss tt uu"),
      (22L, "totally unrelated words here nothing shared at all"))
      .toDF("doc_id", "text")
    val out = Dedup.substringDedupSpans(df, "doc_id", "text", winTokens = 3)
      .collect().map(r => (r.getLong(0),
        (r.getAs[Long]("span_start"), r.getAs[Long]("span_end_excl"),
          r.getAs[Long]("n_windows")))).toMap
    assert(out(20L) == ((0L, 5L, 3L)), "run at offset 0 covers tokens [0,5)")
    assert(out(21L) == ((2L, 7L, 3L)), "run at offset 2 covers tokens [2,7)")
    assert(!out.contains(22L), "doc with no duplicated window emits nothing")
  }

  test("substringDedupSpans: within-doc repetition and short docs") {
    val df = Seq(
      (30L, "x y z a b c x y z d e f"), // "x y z" repeats inside one doc
      (31L, "too short"))               // < L tokens: no windows at all
      .toDF("doc_id", "text")
    val out = Dedup.substringDedupSpans(df, "doc_id", "text", winTokens = 3)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end_excl"))).toSet
    assert(out == Set((30L, 0L, 3L), (30L, 6L, 9L)),
      "both occurrences of the repeated window are spans; no merge across the gap")
  }

  test("substringDedupSpans: overlapping duplicated windows merge into one span") {
    // Identical docs: every window start 0..2 duplicates; starts are
    // consecutive so they merge into a single [0, 5) span per doc.
    val df = Seq((40L, "p q r s t"), (41L, "p q r s t")).toDF("doc_id", "text")
    val out = Dedup.substringDedupSpans(df, "doc_id", "text", winTokens = 3)
      .collect().map(r => (r.getLong(0),
        (r.getAs[Long]("span_start"), r.getAs[Long]("span_end_excl"),
          r.getAs[Long]("n_windows")))).toMap
    assert(out(40L) == ((0L, 5L, 3L)) && out(41L) == ((0L, 5L, 3L)))
  }

  test("applySpanRemoval excises exactly the span tokens, keeps order") {
    val df = Seq(
      (50L, "alpha beta gamma delta epsilon zz yy xx"),
      (51L, "qq alpha beta gamma delta epsilon rr"),
      (52L, "no duplicated content here at all"))
      .toDF("doc_id", "text")
    val spans = Dedup.substringDedupSpans(df, "doc_id", "text", winTokens = 3)
    val out = Dedup.applySpanRemoval(df, "doc_id", "text", spans)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // shared 5-token run removed from both docs, surroundings intact
    assert(out(50L) == ((8L, 3L, "zz yy xx")), out(50L))
    assert(out(51L) == ((7L, 2L, "qq rr")), out(51L))
    assert(out(52L) == ((6L, 6L, "no duplicated content here at all")))
  }

  test("applySpanRemoval: fully-duplicated doc empties; counts stay exact") {
    val df = Seq((60L, "p q r s t"), (61L, "p q r s t")).toDF("doc_id", "text")
    val spans = Dedup.substringDedupSpans(df, "doc_id", "text", winTokens = 3)
    val out = Dedup.applySpanRemoval(df, "doc_id", "text", spans)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(60L) == ((5L, 0L, "")) && out(61L) == ((5L, 0L, "")), out)
  }

  test("crossBatchDedup flags exact history dupes and nothing else") {
    val history = Seq(
      (100L, "the shared history document text body"),
      (101L, "another archived document from last night"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (200L, "THE SHARED HISTORY DOCUMENT TEXT BODY"), // dup after normalize
      (201L, "a genuinely new document never seen before"),
      (202L, "another archived document from last night")) // verbatim dup
      .toDF("doc_id", "text")
    val out = Dedup.crossBatchDedup(incoming, history, "doc_id", "text",
        expectedIncoming = 10L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(200L -> true, 201L -> false, 202L -> true))
  }

  test("crossBatchDedup is exact even at an absurd Bloom fpp") {
    // fpp 0.5 floods the prefilter with false positives; the exact join
    // must still produce the identical flags (fpp tunes shuffle volume,
    // never correctness).
    val history = (0L until 50L).map(i => (i, s"hist doc number $i"))
      .toDF("doc_id", "text")
    val incoming = Seq((900L, "hist doc number 7"), (901L, "brand new"))
      .toDF("doc_id", "text")
    val out = Dedup.crossBatchDedup(incoming, history, "doc_id", "text",
        expectedIncoming = 2L, fpp = 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(900L -> true, 901L -> false))
  }

  test("lshPlan: S-curve midpoint sits at-or-under the threshold, recall ramps above it") {
    for (k <- Seq(64, 128, 256); thr <- Seq(0.5, 0.7, 0.8, 0.9)) {
      val (b, r) = Dedup.lshPlan(k, thr)
      assert(b * r == k, s"k=$k thr=$thr: $b*$r")
      val mid = math.pow(1.0 - math.pow(0.5, 1.0 / b), 1.0 / r)
      assert(mid <= thr + 1e-9, s"k=$k thr=$thr midpoint $mid above threshold")
      // pairs AT the threshold collide with p >= 1/2; well above it, near 1
      assert(Dedup.lshCollisionProb(thr, b, r) >= 0.5 - 1e-9)
      assert(Dedup.lshCollisionProb(math.min(0.99, thr + 0.15), b, r) > 0.9)
      // well below the threshold the candidate rate collapses
      assert(Dedup.lshCollisionProb(thr - 0.3, b, r) <
        Dedup.lshCollisionProb(thr, b, r))
    }
  }

  test("lshPlan matches the known 16x4 sweet spot for 64-sig near-0.5 thresholds") {
    // the classic MMDS example: k=64, threshold ~0.5 → bands=16, rows=4
    // (midpoint (1/16)^(1/4) ≈ 0.50)
    assert(Dedup.lshPlan(64, 0.55) == (16, 4))
    // collision probability is monotone in similarity for any plan
    val (b, r) = Dedup.lshPlan(128, 0.8)
    val ps = (1 to 9).map(i => Dedup.lshCollisionProb(i / 10.0, b, r))
    assert(ps == ps.sorted)
  }

  test("containmentPairs: full quote scores 1.0 where Jaccard would miss") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),
      (2L, base + " lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (3L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text").withColumn("blk", lit("x"))
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text", "blk",
      w = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(1), r.getLong(2)) ->
        ((r.getDouble(3), r.getDouble(4)))).toMap
    // doc 1 fully contained in doc 2: cont_ab = 1.0, reverse < 0.5
    assert(pairs.keySet == Set((1L, 2L)))
    val (ab, ba) = pairs((1L, 2L))
    assert(ab == 1.0 && ba < 0.5, s"ab=$ab ba=$ba")
    // the same pair is invisible to symmetric Jaccard at 0.9
    assert(Dedup.ngramJaccardPairs(docs, "doc_id", "text", "blk",
      w = 3, threshold = 0.9).count() == 0)
  }

  test("corpusOverlap: exact pair Jaccard over corpus-level shingle sets") {
    val docs = Seq(
      ("s1", "a b c"), ("s1", "b c d"), // s1 grams: {a b, b c, c d}
      ("s2", "b c e"),                  // s2 grams: {b c, c e}
      ("s3", "x y")                     // disjoint from both
    ).toDF("source", "text")
    val rows = Dedup.corpusOverlap(docs, "source", "text", w = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // only the overlapping pair is emitted; inter={b c}, union=4
    assert(rows.keySet == Set(("s1", "s2")))
    assert(rows(("s1", "s2")) == ((1L, 4L, 0.25)))
  }

  test("corpusOverlap counts the corpus-distinct gram once per corpus") {
    // the repeated doc must not inflate s1's set size
    val docs = Seq(("s1", "a b c"), ("s1", "a b c"), ("s2", "a b z"))
      .toDF("source", "text")
    val r = Dedup.corpusOverlap(docs, "source", "text", w = 2).collect()(0)
    assert((r.getLong(2), r.getLong(3)) == ((1L, 3L))) // {a b}; {a b,b c,b z}
  }

  test("LSH recall audit tiers: identical clone is certain; prefix clone " +
    "jaccard is exactly (k-2)/(n-2)") {
    // the q_d18 plant scheme: a clone (every band collides — recall 1 by
    // pigeonhole, not probability) and a 3n/5+1-token prefix whose shingle
    // set is a strict subset, so exact Jaccard is (k-2)/(n-2) ~ 0.6 —
    // above the tau = 0.5 truth cut but mid s-curve for 16x4 banding.
    val n = 20
    val k = n * 3 / 5 + 1 // 13
    val full = (1 to n).map(i => s"w$i").mkString(" ")
    val prefix = (1 to k).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, full, "s"), (2L, full, "s"), (3L, prefix, "s"))
      .toDF("doc_id", "text", "source")
    val truth = Dedup.ngramJaccardPairs(d, "doc_id", "text", "source",
        w = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3))
      .toMap
    assert(truth((1L, 2L)) == 1.0)
    val expect = BigDecimal((k - 2).toDouble / (n - 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(truth((1L, 3L)) == expect) // 11/18 rounded to 6dp
    assert(truth((2L, 3L)) == expect)
    // the identical pair MUST surface as an LSH candidate (equal
    // signatures collide in every band), regardless of seed
    val found = Dedup.minhashNearDups(d, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(found.contains((1L, 2L)))
  }
}
