package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

import graft.operators.{Decontaminate, Multimodal, RangeJoin, Sampling}

/** Property-based hardening over generated inputs. Each property batches
  * its generated cases into ONE DataFrame job (a Spark action per
  * scalacheck sample would be seconds per case), so the whole spec stays
  * fast while covering hundreds of generated rows.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, minSuccessful: Int): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(minSuccessful), p)
    assert(res.passed, res.status.toString)
  }

  private val words =
    Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")

  test("hashSplit is disjoint, exhaustive, and deterministic for any keys") {
    val keysGen = Gen.listOfN(300, Gen.alphaNumStr.map(_.take(12)))
    check(Prop.forAllNoShrink(keysGen) { keys =>
      val df = keys.toDF("k")
      val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      val labeled = Sampling.hashSplit(df, "k", splits)
      val again = Sampling.hashSplit(df, "k", splits)
      val one = labeled.groupBy("k").agg(countDistinct("split").as("d"))
        .filter(col("d") =!= 1).count() == 0
      val total = labeled.count() == keys.size
      val stable = labeled.exceptAll(again).count() == 0
      one && total && stable
    }, minSuccessful = 3)
  }

  test("binned range join equals the naive inequality join on random data") {
    // non-overlapping intervals per key (gap rule) + random points
    val caseGen = for {
      nIvals <- Gen.choose(1, 8)
      starts <- Gen.listOfN(nIvals, Gen.choose(0L, 100000L))
      lens <- Gen.listOfN(nIvals, Gen.choose(1L, 5000L))
      nPts <- Gen.choose(1, 40)
      pts <- Gen.listOfN(nPts, Gen.choose(0L, 110000L))
    } yield (starts.zip(lens), pts)
    check(Prop.forAllNoShrink(Gen.listOfN(5, caseGen)) { cases =>
      val ivals = cases.zipWithIndex.flatMap { case ((sl, _), k) =>
        sl.zipWithIndex.map { case ((s, l), i) =>
          (s"k$k", i.toLong, new java.sql.Timestamp(s * 1000),
            new java.sql.Timestamp((s + l) * 1000))
        }
      }.toDF("key", "ival_id", "start_ts", "end_ts")
      val points = cases.zipWithIndex.flatMap { case ((_, pts), k) =>
        pts.zipWithIndex.map { case (p, i) =>
          (s"k$k", s"p$k-$i", new java.sql.Timestamp(p * 1000))
        }
      }.toDF("key", "pt_id", "ts")
      val binned = RangeJoin.rangeJoin(points, ivals, "key", "ts",
          "start_ts", "end_ts", binSeconds = 600)
        .select(col("pt_id"), col("ival.ival_id"))
        .as[(String, Long)].collect().toSet
      val naive = points.as("p").join(ivals.as("i"),
          col("p.key") === col("i.key") &&
            col("p.ts") >= col("i.start_ts") && col("p.ts") <= col("i.end_ts"))
        .select(col("pt_id"), col("ival_id"))
        .as[(String, Long)].collect().toSet
      binned == naive
    }, minSuccessful = 3)
  }

  test("decontamination equals brute-force shared-gram counting") {
    val docGen = Gen.chooseNum(3, 20)
      .flatMap(n => Gen.listOfN(n, words).map(_.mkString(" ")))
    check(Prop.forAllNoShrink(
        Gen.listOfN(12, docGen), Gen.listOfN(3, docGen)) { (train, bench) =>
      val n = 3
      val tdf = train.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val bdf = bench.zipWithIndex.map { case (t, i) => (1000L + i, t) }
        .toDF("doc_id", "text")
      val got = Decontaminate.contaminatedPairs(
          tdf, "doc_id", "text", bdf, "doc_id", "text", n = n)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      def grams(s: String): Set[String] =
        s.split(" ").toSeq.sliding(n).filter(_.size == n)
          .map(_.mkString(" ")).toSet
      val want = (for {
        (t, i) <- train.zipWithIndex
        (b, j) <- bench.zipWithIndex
        shared = (grams(t) & grams(b)).size
        if shared > 0
      } yield (i.toLong, 1000L + j) -> shared.toLong).toMap
      got == want
    }, minSuccessful = 3)
  }

  test("probeMedia is total: never throws on arbitrary bytes") {
    check(Prop.forAllNoShrink(
        Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bs =>
      Multimodal.probeMedia(bs.toArray) != null
    }, minSuccessful = 200)
  }

  /** Exact in-memory reference for substringDedupSpans: corpus-wide
    * window counts, duplicated starts, interval merge with the operator's
    * strict gap > L rule.
    */
  private def refSpans(docs: Seq[(Long, Vector[String])],
      L: Int): Map[Long, Set[(Long, Long, Long)]] = {
    val counts = scala.collection.mutable.Map[String, Int]()
    val wins = docs.map { case (id, toks) =>
      id -> (0 to toks.length - L)
        .map(i => toks.slice(i, i + L).mkString(" ")).toVector
    }
    wins.foreach(_._2.foreach(w => counts(w) = counts.getOrElse(w, 0) + 1))
    wins.map { case (id, ws) =>
      val dup = ws.zipWithIndex.collect { case (w, i) if counts(w) > 1 => i }
      val spans = scala.collection.mutable.ListBuffer[(Long, Long, Long)]()
      var runStart = -1; var prev = -1; var n = 0
      def flush(): Unit = if (runStart >= 0)
        spans += ((runStart.toLong, (prev + L).toLong, n.toLong))
      for (p <- dup) {
        if (runStart < 0 || p - prev > L) { flush(); runStart = p; n = 0 }
        prev = p; n += 1
      }
      flush()
      id -> spans.toSet
    }.toMap.withDefaultValue(Set.empty)
  }

  private val substrDocsGen = for {
    nDocs <- Gen.choose(3, 6)
    docs <- Gen.listOfN(nDocs, Gen.choose(3, 12).flatMap(k =>
      Gen.listOfN(k, words).map(_.toVector)))
  } yield docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }

  test("substringDedupSpans matches the exact suffix-scan reference") {
    check(Prop.forAllNoShrink(substrDocsGen) { docs =>
      val df = docs.map { case (id, t) => (id, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.operators.Dedup
        .substringDedupSpans(df, "doc_id", "text", winTokens = 3)
        .collect()
        .groupBy(_.getLong(0))
        .map { case (id, rows) => id -> rows.map(r =>
          (r.getLong(1), r.getLong(2), r.getLong(3))).toSet }
      val want = refSpans(docs, 3).filter(_._2.nonEmpty)
      got == want
    }, minSuccessful = 3)
  }

  test("applySpanRemoval equals reference excision; counts reconcile") {
    check(Prop.forAllNoShrink(substrDocsGen) { docs =>
      val df = docs.map { case (id, t) => (id, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val spans = graft.operators.Dedup
        .substringDedupSpans(df, "doc_id", "text", winTokens = 3)
      val got = graft.operators.Dedup
        .applySpanRemoval(df, "doc_id", "text", spans)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      val ref = refSpans(docs, 3)
      docs.forall { case (id, toks) =>
        val covered = ref(id).flatMap { case (s, e, _) => s until e }
        val keptRef = toks.zipWithIndex
          .collect { case (t, i) if !covered.contains(i.toLong) => t }
        got(id) == ((toks.length.toLong, keptRef.length.toLong,
          keptRef.mkString(" ")))
      }
    }, minSuccessful = 3)
  }

  test("triangles match an O(n^3) reference on random graphs, any edge form") {
    // random multigraphs with duplicates, reversals, and self-loops: the
    // degree-oriented count must equal brute-force enumeration over the
    // canonical simple graph
    val edgeGen = Gen.listOfN(60,
      Gen.zip(Gen.choose(0, 11), Gen.choose(0, 11)))
    check(Prop.forAllNoShrink(edgeGen) { raw =>
      val df = raw.map { case (x, y) => (s"v$x", s"v$y") }
        .toDF("from_id", "to_id")
      val got = operators.Graph.triangles(df)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val simple = raw.collect { case (x, y) if x != y =>
        (math.min(x, y), math.max(x, y)) }.toSet
      val verts = simple.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val refCounts = scala.collection.mutable.Map[Int, Long]()
      for {
        Seq(x, y, z) <- verts.combinations(3)
        if simple((x, y)) && simple((x, z)) && simple((y, z))
        v <- Seq(x, y, z)
      } refCounts(v) = refCounts.getOrElse(v, 0L) + 1
      got == refCounts.map { case (v, n) => s"v$v" -> n }.toMap
    }, minSuccessful = 4)
  }

  test("rrfFuse is invariant to input row order") {
    val rowsGen = Gen.listOfN(40, Gen.zip(
      Gen.choose(0L, 2L), Gen.choose(0L, 15L), Gen.oneOf("a", "b")))
    check(Prop.forAllNoShrink(rowsGen) { raw =>
      // build valid rankings: rank = position within (query, source)
      val ranked = raw.distinct
        .groupBy { case (q, _, s) => (q, s) }.toSeq
        .flatMap { case ((q, s), rs) =>
          rs.map(_._2).distinct.zipWithIndex
            .map { case (id, i) => (q, id, i + 1L, s) }
        }
      val df = ranked.toDF("query_id", "id", "rank", "source")
      val fwd = operators.Retrieval.rrfFuse(df, k = 5)
        .collect().map(_.toSeq).toSet
      val rev = operators.Retrieval
        .rrfFuse(ranked.reverse.toDF("query_id", "id", "rank", "source")
          .repartition(7), k = 5)
        .collect().map(_.toSeq).toSet
      fwd == rev
    }, minSuccessful = 4)
  }

  test("kmeansExact is bit-identical under repartitioning (sum-order-free)") {
    val ptsGen = Gen.listOfN(50, Gen.listOfN(4,
      Gen.choose(-1000, 1000).map(_ / 500.0f)))
    check(Prop.forAllNoShrink(ptsGen) { vs =>
      val pts = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val df = pts.toDF("vid", "emb")
      def run(d: org.apache.spark.sql.DataFrame) =
        operators.Clustering.kmeansExact(d, "vid", "emb", k = 3, iters = 2)
          .collect().map(_.toSeq).toSet
      run(df) == run(df.repartition(13))
    }, minSuccessful = 3)
  }

  test("luhnCheckDigit completes any digit payload; any single-digit edit breaks it") {
    val payloadGen = Gen.listOfN(14, Gen.choose(0, 9)).map(_.mkString)
    check(Prop.forAllNoShrink(payloadGen, Gen.choose(0, 13),
      Gen.choose(1, 9)) { (base, pos, delta) =>
      val rows = Seq(base).toDF("b")
        .select(concat(col("b"),
          operators.TextAnalysis.luhnCheckDigit(col("b")).cast("string"))
          .as("pan"))
      val pan = rows.as[String].first()
      val mutated = pan.updated(pos,
        (((pan(pos) - '0') + delta) % 10 + '0').toChar)
      val checks = Seq(pan, mutated).toDF("c")
        .select(operators.TextAnalysis.luhnValid(col("c")))
        .as[Boolean].collect().toSeq
      checks == Seq(true, false) // valid pan; any digit edit detected
    }, minSuccessful = 6)
  }

  test("weightedSystematic keeps at most ceil(W/step) rows and every heavy row") {
    val wGen = Gen.listOfN(120, Gen.choose(1L, 50L))
    check(Prop.forAllNoShrink(wGen) { ws =>
      val df = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("id", "w")
      val out = Sampling.weightedSystematic(df, "id", "w", target = 20L)
        .select("id", "step").as[(Long, Long)].collect()
      val step = out.headOption.map(_._2).getOrElse(1L)
      val totalW = ws.sum
      val heavy = ws.zipWithIndex.collect {
        case (w, i) if w >= step => i.toLong }.toSet
      val ids = out.map(_._1).toSet
      ids.size <= (totalW + step - 1) / step && heavy.subsetOf(ids)
    }, minSuccessful = 4)
  }

  test("ScannerWire: jstr is valid JSON for any string; field round-trips") {
    // driver-side only — no Spark job per sample, so run many
    val strGen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf('"', '\\', '\n', '\t', '\r',
        '', 'é', '∂', ' ', ':', '{', '}'))).map(_.mkString)
    check(Prop.forAllNoShrink(strGen, strGen) { (service, region) =>
      val req = s"""{"service":${graft.sources.ScannerWire.jstr(service)},""" +
        s""""region":${graft.sources.ScannerWire.jstr(region)}}"""
      // the rendered object must parse as JSON at all (Spark's parser)
      val parsed = spark.range(1).select(
        from_json(lit(req), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("service",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("region",
            org.apache.spark.sql.types.StringType)))).as("o"))
        .select("o.service", "o.region").head
      // and the wire's own extractor must round-trip EVERY escape jstr
      // emits, control chars and \uXXXX forms included
      graft.sources.ScannerWire.field(req, "service") == service &&
        graft.sources.ScannerWire.field(req, "region") == region &&
        parsed.getString(0) == service && parsed.getString(1) == region
    }, minSuccessful = 60)
  }

  test("matchPath(2) count equals sum over mid-vertex of indeg*outdeg") {
    val edgeGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(0, 9), Gen.choose(0, 9)))
    check(Prop.forAllNoShrink(edgeGen) { raw =>
      val edges = raw.map { case (a, b) => (s"v$a", s"v$b") }
      val df = edges.toDF("src", "dst")
      val g = operators.PropertyGraph.register("prop_match",
        Map("n" -> operators.PropertyGraph.VertexTable(
          edges.flatMap(e => Seq(e._1, e._2)).distinct.toDF("id"), "id")),
        Map("e" -> operators.PropertyGraph.EdgeTable(df, "src", "dst", "n", "n")))
      val got = g.matchPath(2).count()
      // multiset semantics: every (e1, e2) pair with e1.dst == e2.src
      val expected = edges.groupBy(_._2).map { case (mid, in) =>
        in.size.toLong * edges.count(_._1 == mid) }.sum
      operators.PropertyGraph.drop("prop_match")
      got == expected
    }, minSuccessful = 4)
  }

  test("epochPlan conserves the budget: sum of targets <= budget, exact shares") {
    val rowsGen = Gen.listOfN(60, for {
      src <- Gen.oneOf("a", "b", "c", "d")
      n <- Gen.choose(1L, 5000L)
    } yield (src, n))
    val budgetGen = Gen.choose(0L, 10000000L)
    check(Prop.forAllNoShrink(rowsGen, budgetGen) { (rows, budget) =>
      val df = rows.toDF("src", "n")
      val weights = Map("a" -> 4000L, "b" -> 3000L, "c" -> 3000L) // d unlisted
      val plan = Sampling.epochPlan(df, "src", "n", weights, budget)
        .collect().map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("available_tokens"), r.getAs[Long]("target_tokens"),
           r.getAs[Long]("epochs"))).toMap
      val avail = rows.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      plan.keySet.subsetOf(weights.keySet) &&
        plan.values.map(_._2).sum <= budget &&
        plan.forall { case (src, (a, t, e)) =>
          a == avail(src) && t == budget * weights(src) / 10000 &&
            e == (if (t == 0) 0L else (t - 1) / a + 1)
        }
    }, minSuccessful = 8)
  }

  test("ppjoinPairs threshold monotonicity: higher cut is a subset") {
    val docsGen = Gen.listOfN(30, Gen.listOfN(8, words).map(_.mkString(" ")))
    check(Prop.forAllNoShrink(docsGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      def pairs(thr: Double) =
        operators.Dedup.ppjoinPairs(df, "id", "text", w = 2, threshold = thr)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      pairs(0.8).subsetOf(pairs(0.4))
    }, minSuccessful = 4)
  }

  test("transitionMatrix: pair count conservation and row shares sum to 1") {
    val evGen = Gen.listOfN(120, for {
      u <- Gen.choose(1L, 8L)
      t <- Gen.oneOf("a", "b", "c")
      s <- Gen.choose(0L, 1000L)
    } yield (u, t, s))
    check(Prop.forAllNoShrink(evGen) { evs =>
      val df = evs.zipWithIndex.map { case ((u, t, s), i) =>
        (i.toLong, u, t, new java.sql.Timestamp(s * 1000L)) }
        .toDF("event_id", "user_id", "event_type", "ts")
      val m = operators.Analytics.transitionMatrix(df, "user_id", "ts",
          "event_type", "event_id")
        .collect().map(r => (r.getAs[String]("from_type"),
          r.getAs[Long]("n"), r.getAs[Double]("row_share")))
      val perUser = evs.groupBy(_._1).values.map(_.size - 1).sum.toLong
      val shares = m.groupBy(_._1).values.forall(g =>
        math.abs(g.map(_._3).sum - 1.0) < 1e-9)
      m.map(_._2).sum == perUser && shares
    }, minSuccessful = 6)
  }

  test("cohortRetention: week-0 cells cover every user exactly once") {
    val evGen = Gen.listOfN(80, for {
      u <- Gen.choose(1L, 20L)
      s <- Gen.choose(0L, 4L * 604800L)
    } yield (u, s))
    check(Prop.forAllNoShrink(evGen) { evs =>
      val df = evs.map { case (u, s) =>
        (u, new java.sql.Timestamp(s * 1000L)) }.toDF("user_id", "ts")
      val cells = operators.Analytics.cohortRetention(df, "user_id", "ts")
        .collect().map(r => (r.getAs[Long]("cohort_week"),
          r.getAs[Long]("weeks_since"), r.getAs[Long]("n_users")))
      val nUsers = evs.map(_._1).distinct.size.toLong
      // every user appears in their cohort's weeks_since=0 cell (their
      // first event is in that week), and never with negative offset
      cells.filter(_._2 == 0L).map(_._3).sum == nUsers &&
        cells.forall(_._2 >= 0L)
    }, minSuccessful = 6)
  }
}
