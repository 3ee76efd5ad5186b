package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("normalize / tokenCount / fingerprint") {
    val r = spark.range(1).select(
      TextAnalysis.normalize(lit("  Hello,  WORLD!! 42 ")).as("n"),
      TextAnalysis.tokenCount(lit("a b  c   d")).as("t"))
      .collect()(0)
    assert(r.getString(0) == "hello world 42")
    assert(r.getInt(1) == 4)
    val fp = Seq("Hello World", "hello,   world!")
      .toDF("text").select(TextAnalysis.fingerprint(col("text"))).as[String].collect()
    assert(fp(0) == fp(1)) // normalization folds case/punct/space
  }

  test("term_counts matches the explode-groupBy formulation") {
    graft.functions.VecExprs.register(spark)
    val m = spark.sql(
      "SELECT term_counts(array('a','b','a','','c','b','a')) AS m")
      .collect()(0).getMap[String, Long](0)
    assert(m == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    assert(spark.sql("SELECT term_counts(array('', '')) AS m")
      .collect()(0).getMap[String, Long](0).isEmpty)
    // tfidf end-to-end on a toy corpus: df counts docs, not occurrences
    val docs = Seq((1L, "x x y"), (2L, "x z")).toDF("doc_id", "text")
    val rows = TextAnalysis.tfidf(docs, "doc_id", "text", topN = 3)
      .select("doc_id", "term", "tf", "df").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows((1L, "x")) == ((2L, 2L)))
    assert(rows((1L, "y")) == ((1L, 1L)))
    assert(rows((2L, "z")) == ((1L, 1L)))
  }

  test("quality metrics ranges and monotonicity") {
    val df = Seq(
      (1L, "the cat is on the mat and it is a good cat that sleeps for hours"),
      (2L, "!!! ??? ... ,,, ;;; ::: !!!! ???")).toDF("doc_id", "text")
    val m = TextAnalysis.qualityMetrics(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score")).toMap
    assert(m(1L) > m(2L))
    m.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
  }

  test("langId picks stopword-matching language, und on no evidence") {
    val preds = Seq(
      (1L, "the cat and the dog are in the house that is red"),
      (2L, "der hund und die katze sind nicht mit der maus"),
      (3L, "el perro y la casa es una cosa con los gatos"),
      (4L, "zzz qqq xxx www")).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.langId(col("text")))
      .as[(Long, String)].collect().toMap
    assert(preds(1L) == "en")
    assert(preds(2L) == "de")
    assert(preds(3L) == "es")
    assert(preds(4L) == "und")
  }

  test("multimodal: metadata schema, real decode, feature extraction") {
    // mixed frame: one real PNG payload, one plain-text payload
    val df = Seq((1L, Multimodal.syntheticPng(1L)), (2L, "x".getBytes))
      .toDF("doc_id", "payload")
    val meta = Multimodal.withMediaMeta(df)
      .select("doc_id", "media_meta.n_bytes", "media_meta.media_type",
        "media_meta.width", "media_meta.height")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2),
          Option(r.get(3)), Option(r.get(4)))).toMap
    // the PNG really decodes: dims are the synthesis arithmetic (2x2)
    assert(meta(1L)._2 == "image/png")
    assert(meta(1L)._3 == Some(2) && meta(1L)._4 == Some(2))
    // text payload: probed type, no dimensions, byte count preserved
    assert(meta(2L) == ((1L, "application/octet-stream", None, None)))
    val feats = Multimodal.extractFeatures(df, "doc_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 1 fill is (1, 7, 13): mean luminance is the exact Rec. 601 mix
    val lum = (0.299 * 1 + 0.587 * 7 + 0.114 * 13) / 255.0
    assert(math.abs(feats(1L) - lum) < 1e-12, feats.toString)
    assert(feats(2L) >= 0.0 && feats(2L) <= 1.0)
  }

  test("frame sampling explodes stride indexes") {
    val idx = Seq((1L, 10L)).toDF("id", "n_frames")
    val out = Multimodal.sampleFrameIndexes(idx, col("n_frames"), 3, 100)
      .select("frame_idx").as[Long].collect().toSeq
    assert(out == Seq(0L, 3L, 6L, 9L))
  }

  test("chunking covers all tokens with overlap; short docs give one chunk") {
    val docs = Seq((1L, "a b c d e"), (2L, "x y")).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(docs, "doc_id", "text", size = 3, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    assert(out == Map(
      (1L, 0L) -> ("a b c", 3L),
      (1L, 1L) -> ("c d e", 3L),
      (2L, 0L) -> ("x y", 2L)))
  }

  test("winnowing: shared long substrings guarantee a shared fingerprint") {
    import spark.implicits._
    val common = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"unrelated prefix words here $common and a suffix"),
      (2L, s"$common totally different tail content follows now"),
      (3L, "nothing in common with the others at all whatsoever"),
      (4L, "tiny")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", k = 5, win = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // k+win-1 = 8 ≤ 10 shared tokens ⇒ docs 1 and 2 must share a fingerprint
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)
    assert((byDoc(1L) & byDoc(3L)).isEmpty)
    assert(!byDoc.contains(4L), "sub-k docs produce no fingerprints")
  }

  test("withResized really resamples images; non-images yield NULL") {
    import spark.implicits._
    val df = Seq((1L, Multimodal.syntheticPng(9L)), (2L, "text".getBytes))
      .toDF("id", "payload")
    val rows = Multimodal.withResized(df, width = 6, height = 4)
      .select(col("id"), col("resized.payload").as("p"),
        col("resized.width"), col("resized.height"), col("resized.n_bytes"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val p = rows(1L).getAs[Array[Byte]]("p")
    assert(p != null && rows(1L).getInt(2) == 6 && rows(1L).getInt(3) == 4)
    assert(rows(1L).getLong(4) == p.length.toLong)
    // the resized payload is a real decodable PNG with the original fill
    val m = Multimodal.decodeImage(p).get
    assert((m.width, m.height) == (6, 4))
    assert(m.avg_r == (9 % 256).toDouble && m.avg_g == (63 % 256).toDouble)
    // non-image input: the whole resized struct is NULL
    assert(rows(2L).isNullAt(1) && rows(2L).isNullAt(2))
    // deterministic re-encode
    val again = Multimodal.withResized(df, 6, 4)
      .filter(col("id") === 1).select("resized.payload")
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(p, again))
  }

  test("sharded shard packing: bin bound holds, every doc covered") {
    import spark.implicits._
    val docs = (1L to 2000L).map(i => (i, "all-one-stratum", 100L + (i % 7)))
      .toDF("doc_id", "lang", "n_tokens")
    val packed = TextAnalysis.packByTokenBudgetSharded(
      docs, "doc_id", "lang", "n_tokens", budget = 2048, subSplits = 8)
    assert(packed.count() == 2000) // every doc assigned exactly once
    // streaming bin-packing bound: a shard's tokens never exceed
    // budget + max single-doc tokens
    val maxDoc = 106L
    val over = packed.groupBy("shard_id").agg(sum("n_tokens").as("t"))
      .filter(col("t") > 2048L + maxDoc).count()
    assert(over == 0)
    // parallel shape: the window partitions by (stratum, split), so a
    // single stratum fans out across sub-splits
    val splits = packed.select((col("shard_id") / 1000000000L).cast("long"))
      .distinct().count()
    assert(splits > 1, "expected multiple sub-splits for a giant stratum")
    // deterministic across runs
    val again = TextAnalysis.packByTokenBudgetSharded(
      docs, "doc_id", "lang", "n_tokens", budget = 2048, subSplits = 8)
    assert(packed.collect().toSet == again.collect().toSet)
  }

  test("approx_count_distinct escape hatch lands within HLL error bounds") {
    // SURVEY §2.4: exact countDistinct is the contract; approx is the
    // documented perf escape hatch for 100 TB cardinalities. Spot-check
    // the error envelope on fingerprints so the recommendation is tested.
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(graft.operators.TextAnalysis.fingerprint(col("text")).as("fp"))
    val exact = docs.agg(countDistinct("fp")).collect()(0).getLong(0)
    val approx = docs.agg(approx_count_distinct("fp", 0.02)).collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("cmsHeavyHitters: estimates bound the exact counts") {
    import spark.implicits._
    // 'hot' appears 200x, each filler token once — eps*N < 1 so the CMS
    // estimate for any token must EQUAL its exact count (over-count < 1),
    // which also proves the driver-side estimateCount hashes bytes the
    // same way the count_min_sketch aggregate does.
    val docs = ((1 to 100).map(i => (i.toLong, "hot hot filler" + i)) :+
      (101L, "hot " * 0 + "unique tail words here")).toDF("doc_id", "text")
    val out = TextAnalysis.cmsHeavyHitters(docs, "doc_id", "text",
        eps = 1e-4, confidence = 0.99, seed = 42,
        candidateFraction = 1.0, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val n = out.head._3
    assert(n == 304, s"total token count: $n") // 100*3 + 4
    val exact = Map("hot" -> 200L) // every other token count 1
    out.foreach { case (tok, est, _) =>
      val ex = exact.getOrElse(tok, 1L)
      assert(est == ex, s"eps*N < 1 must make estimates exact: $tok est=$est")
    }
    assert(out.head._1 == "hot" && out.head._2 == 200L,
      s"heavy hitter first: ${out.head}")
  }

  test("cmsHeavyHitters: empty input yields an empty frame, not an NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = TextAnalysis.cmsHeavyHitters(empty, "doc_id", "text")
    assert(out.columns.toSeq == Seq("token", "est_count", "n_total_tokens"))
    assert(out.count() == 0)
  }

  test("gopherRules: each rule rejects its failure mode") {
    import spark.implicits._
    val good = "the quick brown fox jumps over a lazy dog and then it " +
      "runs far away into that deep dark forest for many long nights " +
      "while other animals watch with great interest from their warm dens"
    val docs = Seq(
      (1L, good),                                  // passes all rules
      (2L, "too short a doc"),                     // fails n_tokens >= 30
      (3L, ("spam " * 60).trim),                   // fails distinct ratio + stopwords
      (4L, (Seq.tabulate(40)(i => s"internationalization$i").mkString(" "))))
      .toDF("doc_id", "text")                      // 4 fails mean word len <= 10
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(out(1L), "well-formed doc must pass")
    assert(!out(2L) && !out(3L) && !out(4L), out.toString)
  }

  test("packSequences: per-shard token conservation, span and fill arithmetic") {
    val ctx = 10L
    // token counts straddle every edge: 0, 1, exactly ctx, spanning many
    val docs = Seq(0L -> 3L, 1L -> 0L, 2L -> 10L, 3L -> 27L, 4L -> 1L,
      5L -> 9L, 6L -> 15L, 7L -> 2L, 8L -> 40L, 9L -> 7L)
      .toDF("doc_id", "n_tokens")
    val out = TextAnalysis.packSequences(docs, "doc_id", "n_tokens",
        ctxLen = ctx, prefixChars = 1)
      .select("doc_id", "shard", "n_tokens", "start_off", "first_seq",
        "last_seq", "n_seqs", "head_fill")
      .as[(Long, String, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length == 10 && out.map(_._1).toSet.size == 10)
    out.groupBy(_._2).foreach { case (_, rows) =>
      val inOrder = rows.sortBy(_._1)
      // consecutive docs abut exactly: next start = prev start + n + 1 (EOD)
      inOrder.sliding(2).foreach {
        case Array(a, b) => assert(b._4 == a._4 + a._3 + 1,
          s"gap/overlap between ${a._1} and ${b._1}")
        case _ => ()
      }
      assert(inOrder.head._4 == 0L, "shard stream must start at offset 0")
    }
    out.foreach { case (id, _, n, start, first, last, nSeqs, fill) =>
      assert(first == start / ctx, s"$id first_seq")
      assert(last == math.max(start + n - 1, start) / ctx, s"$id last_seq")
      assert(nSeqs == last - first + 1, s"$id n_seqs")
      assert(fill == math.min(n, ctx - start % ctx), s"$id head_fill")
    }
  }

  test("canonicalizeUrl: fragment/utm stripped, host lowered, path kept") {
    val cases = Seq(
      "https://WWW.Ex.com/Page?lang=en#frag" -> "https://www.ex.com/Page?lang=en",
      "https://a.com/p?lang=en&utm_source=x" -> "https://a.com/p?lang=en",
      "https://a.com/p?lang=en&utm_campaign=x#y" -> "https://a.com/p?lang=en",
      "https://a.com/CaseSensitive/Path" -> "https://a.com/CaseSensitive/Path",
      "http://B.org/x?a=1&utm_a=1&b=2&utm_b=3" -> "http://b.org/x?a=1&b=2")
    val got = cases.map(_._1).toDF("u")
      .select(TextAnalysis.canonicalizeUrl(col("u")))
      .as[String].collect().toSeq
    assert(got == cases.map(_._2), got)
  }

  test("luhnValid: known vectors; luhnCheckDigit completes them") {
    // 4532015112830366 is the canonical valid test PAN; 79927398713 the
    // classic Luhn example; off-by-one check digits must fail
    val cases = Seq("4532015112830366" -> true, "4532015112830367" -> false,
      "79927398713" -> true, "79927398710" -> false,
      "4111111111111111" -> true, "4111111111111112" -> false)
    val got = cases.map(_._1).toDF("c")
      .select(TextAnalysis.luhnValid(col("c"))).as[Boolean].collect().toSeq
    assert(got == cases.map(_._2), got)
    val cds = Seq("453201511283036", "7992739871", "411111111111111")
      .toDF("b").select(TextAnalysis.luhnCheckDigit(col("b")))
      .as[Int].collect().toSeq
    assert(cds == Seq(6, 3, 1))
  }

  test("cardCandidates: standalone 13-19 digit runs only") {
    val got = Seq("pay 4532015112830366 now, order 123456 ts 123456789012" +
      " huge 12345678901234567890x")
      .toDF("t").select(TextAnalysis.cardCandidates(col("t")))
      .as[Seq[String]].first()
    // 6 and 12 digit runs too short; the 20-digit run fails \b…{13,19}\b
    assert(got == Seq("4532015112830366"), got)
  }

  test("sentences: punctuation runs split, decimals survive, newline-terminal safe") {
    val cases = Seq(
      "One. Two sentences! Third?" -> Seq("One", "Two sentences", "Third"),
      // intra-token period is NOT a boundary (3.14 stays whole)
      "Pi is 3.14 about. Next." -> Seq("Pi is 3.14 about", "Next"),
      // runs of terminal punctuation collapse to one boundary
      "Wait!! Really?!" -> Seq("Wait", "Really"),
      // trailing newline after final period (the Java-$ vs RE2-$ trap)
      "Ends with newline.\n" -> Seq("Ends with newline"),
      // no terminal punctuation: the whole text is one sentence
      "no punctuation at all" -> Seq("no punctuation at all"),
      "" -> Seq())
    val got = cases.map(_._1).toDF("t")
      .select(TextAnalysis.sentences(col("t")))
      .as[Seq[String]].collect().toSeq
    assert(got == cases.map(_._2), got)
    val wc = Seq("One two. Three four five!").toDF("t")
      .select(TextAnalysis.sentenceWordCounts(
        TextAnalysis.sentences(col("t"))))
      .as[Seq[Int]].first()
    assert(wc == Seq(2, 3), wc)
  }

  test("extractHtmlText: blocks drop, tags strip, entities decode in order") {
    val cases = Seq(
      // script content with stray < survives non-greedy block removal
      "<p>a</p><script>if (1<2) { x(); }</script><p>b</p>" -> "a b",
      // nav/footer/header/aside chrome drops wholesale, content stays
      "<header>H</header><nav>x | y</nav><div>keep</div><footer>f</footer>" -> "keep",
      // entity decode AFTER tag strip: decoded <raw> is literal text
      "<p>&lt;raw&gt;</p>" -> "<raw>",
      // &amp;lt; must yield literal &lt; (no double decode)
      "<p>&amp;lt;esc&amp;gt; &amp; &quot;q&#39;s&quot;</p>" ->
        "&lt;esc&gt; & \"q's\"",
      // case-insensitive block tags, attribute-bearing open tags
      "<SCRIPT type=\"x\">junk</SCRIPT><p class=\"c\">t</p>" -> "t",
      // whitespace collapse + trim
      "  <p> a   b </p>  " -> "a b",
      // MULTI-LINE blocks: real-world script/style/nav markup spans
      // lines; without DOTALL the payload leaks past the block drop
      "<p>a</p>\n<script>\nvar t = 1;\nif (t<2) {\n  go();\n}\n</script>\n<p>b</p>" -> "a b",
      "<style>\np {\n  margin: 0;\n}\n</style><nav>\n<a href=\"/\">x</a>\n</nav><div>keep</div>" -> "keep")
    val got = cases.map(_._1).toDF("h")
      .select(TextAnalysis.extractHtmlText(col("h")))
      .as[String].collect().toSeq
    assert(got == cases.map(_._2), got)
  }

  test("pmiCollocations: planted phrase outranks frequent-but-independent pair") {
    // "zeta qux" always co-occur (8×); "the cat" / "the dog" are frequent
    // but 'the' pairs with many words, so its lift is diluted.
    val docs = (
      Seq.fill(8)("zeta qux") ++
      Seq.fill(5)("the cat runs") ++ Seq.fill(5)("the dog runs") ++
      Seq.fill(5)("the bird sings") ++ Seq.fill(5)("a cat sings")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, "text",
        minCount = 3, topN = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(8)))
    assert(out.head._2 == "zeta" && out.head._3 == "qux" &&
      out.head._4 == 8L, out.toSeq.toString)
    val lifts = out.map(_._5)
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b },
      "lift must be non-increasing down the ranks")
    // exact count + totals check on the planted pair
    val zq = out.head
    // N = 8*2 + 20*3 + 0 = 76 tokens, M = 8 + 20*2 = 48 bigrams... the
    // operator recomputes both; verify via the lift formula instead
    val n = 8 * 2 + 15 * 3 + 5 * 3
    val m = 8 + 20 * 2
    val expected = ((8.0 * n) * n) / ((m.toDouble * 8) * 8)
    assert(math.abs(zq._5 - expected) < 1e-9, s"${zq._5} vs $expected")
  }

  test("c4LineClean: drop precedence, word floor, punct rule, page floor") {
    val page = Seq(
      "Please enable JavaScript to continue", // banned (case-insensitive)
      "Home | About | Contact",               // 5 words, no terminal punct
      "This line stays here.",                // kept
      "Ok.",                                  // < 3 words (punct ok)
      "Lorem ipsum dolor sit amet.",          // banned phrase
      "{ \"layout\": 1 }",                    // banned curly brace
      "Another keeper sentence!",             // kept
      "",                                     // empty: vanishes pre-count
      "  trailing spaces kept too?  "         // kept (trimmed first)
    ).mkString("\n")
    val out = TextAnalysis.c4LineClean(
      Seq((1L, page)).toDF("doc_id", "page"), "doc_id", "page")
      .collect()(0)
    assert(out.getLong(1) == 8, "empty line must not count") // n_lines
    assert(out.getLong(2) == 3) // n_kept
    assert(out.getLong(3) == 3) // banned
    assert(out.getLong(4) == 1) // short (Ok.) — banned lines not re-counted
    assert(out.getLong(5) == 1) // punct (nav bar)
    assert(out.getString(6) ==
      "This line stays here.\nAnother keeper sentence!\n" +
        "trailing spaces kept too?")
    assert(out.getBoolean(7)) // 3 kept >= 2 floor
    // page floor: a one-keeper page is dropped
    val thin = TextAnalysis.c4LineClean(
      Seq((2L, "Only one real sentence here.\nnope"))
        .toDF("doc_id", "page"), "doc_id", "page")
      .collect()(0)
    assert(thin.getLong(2) == 1 && !thin.getBoolean(7))
  }

  test("hostReputation: integer rollup, rank order, bottom-K blocked") {
    val df = Seq(
      ("good.com", 900L), ("good.com", 800L),   // avg 850
      ("mid.com", 500L), ("mid.com", 700L),     // avg 600
      ("bad.com", 100L), ("bad.com", 200L),     // avg 150
      ("tie.com", 150L))                        // avg 150 — host tiebreak
      .toDF("host", "qmilli")
    val rep = TextAnalysis.hostReputation(df, "host", "qmilli", bottomK = 2)
      .collect().map(r => r.getAs[String]("host") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_qmilli"),
         r.getAs[Long]("reputation_rank"), r.getAs[Boolean]("blocked")))
      .toMap
    assert(rep("bad.com") == ((2L, 300L, 1L, true)))  // 'bad' < 'tie'
    assert(rep("tie.com") == ((1L, 150L, 2L, true)))
    assert(rep("mid.com") == ((2L, 1200L, 3L, false)))
    assert(rep("good.com") == ((2L, 1700L, 4L, false)))
  }

  test("noveltyReport: corpus-wide df, integer-exact group rollup") {
    val docs = Seq(
      (1L, "g1", "a b c"), // grams {a b, b c}: bc common (df 3)
      (2L, "g1", "b c d"), // {b c, c d}
      (3L, "g1", "x y"),   // {x y}: fully novel
      (4L, "g2", "b c"),   // {b c}: df counts ACROSS groups -> common
      (5L, "g1", "z"))     // no 2-gram: excluded from n_docs
      .toDF("doc_id", "source", "text")
    val rep = TextAnalysis.noveltyReport(docs, "doc_id", "source", "text",
        w = 2)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_grams"),
          r.getAs[Long]("sum_common"), r.getAs[Double]("common_share"),
          r.getAs[Long]("n_high_novelty")))).toMap
    // g1: docs 1/2/3 (doc 5 has no gram); common grams: one bc in each
    // of 1/2; novelty per doc 0.5/0.5/1.0 -> all three >= 0.5
    assert(rep("g1") == ((3L, 5L, 2L, 0.4, 3L)))
    // g2: its single gram is corpus-common -> novelty 0, not high
    assert(rep("g2") == ((1L, 1L, 1L, 1.0, 0L)))
  }
}
