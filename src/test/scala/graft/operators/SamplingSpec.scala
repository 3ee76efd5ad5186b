package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic hash sampling/splitting: reproducibility, disjointness,
  * and approximate-fraction properties.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = (1 to 2000).toDF("id")

  test("sampleByKey is deterministic and near the requested fraction") {
    val s1 = Sampling.sampleByKey(ids, "id", 0.25).collect().map(_.getInt(0)).toSet
    val s2 = Sampling.sampleByKey(ids, "id", 0.25).collect().map(_.getInt(0)).toSet
    assert(s1 == s2, "same input must give the same sample")
    assert(math.abs(s1.size - 500) < 100, s"got ${s1.size}, expected ~500")
  }

  test("nested fractions are supersets (hash thresholds are monotone)") {
    val small = Sampling.sampleByKey(ids, "id", 0.1).collect().map(_.getInt(0)).toSet
    val big = Sampling.sampleByKey(ids, "id", 0.5).collect().map(_.getInt(0)).toSet
    assert(small.subsetOf(big))
  }

  test("hashSplit is disjoint, exhaustive, and weight-proportional") {
    val out = Sampling.hashSplit(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000, "every row routed exactly once")
    assert(counts("train") > 1450 && counts("train") < 1750, counts.toString)
    assert(counts("val") > 100 && counts("val") < 300, counts.toString)
    assert(counts("test") > 100 && counts("test") < 300, counts.toString)
  }

  test("hashSplit rejects weights that do not sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(ids, "id", Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("capPerStratum keeps at most N deterministic rows per stratum") {
    val df = (1 to 100).map(i => (i, i % 3)).toDF("id", "g")
    val kept = Sampling.capPerStratum(df, "id", Seq("g"), 5)
    val counts = kept.groupBy("g").count().collect().map(_.getLong(1))
    assert(counts.forall(_ == 5))
    val again = Sampling.capPerStratum(df, "id", Seq("g"), 5)
      .collect().map(_.getInt(0)).toSet
    assert(again == kept.collect().map(_.getInt(0)).toSet)
  }

  test("tfidf ranks distinctive terms above common ones") {
    val docs = Seq(
      (1, "apple apple apple common common"),
      (2, "banana banana common common"),
      (3, "cherry common common")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidf(docs, "doc_id", "text", topN = 1)
      .collect().map(r => r.getInt(0) -> r.getString(2)).toMap
    // 'common' appears in every doc (df=3) so each doc's distinctive term wins.
    assert(top == Map(1 -> "apple", 2 -> "banana", 3 -> "cherry"))
  }

  test("editDistancePairs finds close pairs within blocks only") {
    val docs = Seq(
      (1, "en", "the quick brown fox"),
      (2, "en", "the quick brown fix"),   // dist 1 from doc 1
      (3, "de", "the quick brown fox"),   // identical text, different block
      (4, "en", "completely different words here")).toDF("doc_id", "lang", "text")
    val pairs = TextAnalysis.editDistancePairs(docs, "doc_id", "text",
        Seq(col("lang")), prefixLen = 40, maxDist = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1, 2, 1)), pairs.mkString(","))
  }

  test("mixtureSample keeps per-source rates, deterministically") {
    val df = (1 to 3000).map(i => (i, s"src${i % 3}")).toDF("id", "source")
    val out = Sampling.mixtureSample(df, "id", "source",
      Map("src0" -> 1.0, "src1" -> 0.3), defaultRate = 0.0)
    val counts = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse("src2", 0L) == 0L, "defaultRate 0 drops unmapped source")
    assert(counts("src0") >= 999L, s"rate 1.0 keeps (nearly) all: $counts")
    assert(counts("src1") > 200L && counts("src1") < 400L, counts.toString)
    val again = Sampling.mixtureSample(df, "id", "source",
      Map("src0" -> 1.0, "src1" -> 0.3), defaultRate = 0.0)
      .collect().map(_.getInt(0)).toSet
    assert(again == out.collect().map(_.getInt(0)).toSet, "reruns identical")
    // mixture at rate r is exactly sampleByKey(r, same salt) within that source
    val direct = Sampling.sampleByKey(df.filter(col("source") === "src1"), "id",
        0.3, salt = "mix")
      .collect().map(_.getInt(0)).toSet
    assert(again.filter(_ % 3 == 1) == direct)
  }

  test("mixture + split compose without correlation: val/test stay populated") {
    // Regression: with one unsalted hash, every row surviving a mixture
    // rate r <= 0.9 had bucket < threshold(r) <= threshold(0.9) and was
    // routed to 'train' — val/test were empty for 16 of 20 sources. The
    // per-purpose default salts ("mix" vs "split") decorrelate the stages.
    val df = (1 to 4000).map(i => (i, s"src${i % 4}")).toDF("id", "source")
    val mixed = Sampling.mixtureSample(df, "id", "source",
      Map("src0" -> 0.2, "src1" -> 0.5, "src2" -> 0.8), defaultRate = 0.6)
    val split = Sampling.hashSplit(mixed, "id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val counts = split.groupBy("source", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (src <- Seq("src0", "src1", "src2", "src3"); sp <- Seq("val", "test"))
      assert(counts.getOrElse((src, sp), 0L) > 0L,
        s"$src/$sp empty — mixture and split hashes are correlated: $counts")
    // split proportions hold within each surviving source (~90/5/5)
    for (src <- Seq("src0", "src1", "src2", "src3")) {
      val total = Seq("train", "val", "test")
        .map(sp => counts.getOrElse((src, sp), 0L)).sum.toDouble
      val trainFrac = counts.getOrElse((src, "train"), 0L) / total
      assert(trainFrac > 0.8 && trainFrac < 0.97,
        s"$src train fraction $trainFrac out of range: $counts")
    }
  }

  test("hashSplit and interleave fail fast on output column collisions") {
    val withSplit = (1 to 10).map(i => (i, "x")).toDF("id", "split")
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(withSplit, "id", Seq("a" -> 0.5, "b" -> 0.5))
    }
    val withShard = (1 to 10).map(i => (i, "x")).toDF("id", "shard")
    intercept[IllegalArgumentException] {
      Sampling.interleave(withShard, "id", seed = "s")
    }
  }

  test("interleave: (shard, pos) is a seeded total order, no global window") {
    val df = (1 to 500).toDF("id")
    val out = Sampling.interleave(df, "id", seed = "s1", prefixChars = 1)
    val rows = out.select("id", "shard", "pos").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rows.length == 500)
    // positions within a shard are 1..n with no gaps
    rows.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // the (shard, pos) order equals the order of the full md5 hash
    val byShardPos = rows.sortBy(r => (r._2, r._3)).map(_._1).toSeq
    val byHash = df.select(col("id"),
        md5(concat(lit("s1:"), col("id").cast("string"))).as("h"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
      .sortBy(_._2).map(_._1).toSeq
    assert(byShardPos == byHash, "global order must be recoverable")
    // different seed produces a different permutation
    val other = Sampling.interleave(df, "id", seed = "s2", prefixChars = 1)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(other != rows.toSet)
    // no single-partition exchange anywhere: ranking partitions by shard
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      "interleave must not rank over a global window:\n" + plan)
  }

  // 900 "big" rows + 100 "small" rows for the temperature law
  private def twoSources = ((1 to 900).map(i => (i.toLong, "big")) ++
    (901 to 1000).map(i => (i.toLong, "small"))).toDF("id", "source")

  test("temperatureRates: alpha=1 is the natural distribution, alpha<1 boosts the tail") {
    val nat = Sampling.temperatureRates(twoSources, "source",
      alpha = 1.0, targetFraction = 0.5)
    assert(math.abs(nat("big") - 0.5) < 1e-12 &&
      math.abs(nat("small") - 0.5) < 1e-12)
    val sq = Sampling.temperatureRates(twoSources, "source",
      alpha = 0.5, targetFraction = 0.3)
    // weights sqrt(900)=30, sqrt(100)=10: C = 300/40 = 7.5 ->
    // big 7.5/30 = 0.25, small 7.5/10 = 0.75; no cap binds.
    assert(math.abs(sq("big") - 0.25) < 1e-12, sq.toString)
    assert(math.abs(sq("small") - 0.75) < 1e-12, sq.toString)
    assert(sq("small") > sq("big"), "alpha<1 must upweight the rare source")
    // expected kept mass hits the target exactly
    val kept = sq("big") * 900 + sq("small") * 100
    assert(math.abs(kept - 300.0) < 1e-9)
  }

  test("temperatureRates waterfills when a rate would exceed 1") {
    val r = Sampling.temperatureRates(twoSources, "source",
      alpha = 0.5, targetFraction = 0.5)
    // uncapped solve gives small 12.5/10 = 1.25 -> cap at 1.0 and
    // re-solve big on the remaining mass: (500-100)/30/30 = 0.4444...
    assert(r("small") == 1.0, r.toString)
    assert(math.abs(r("big") - 400.0 / 900.0) < 1e-12, r.toString)
    val kept = r("big") * 900 + r("small") * 100
    assert(math.abs(kept - 500.0) < 1e-9)
  }

  test("temperatureMixture keeps ~rate per source, deterministically") {
    val out = Sampling.temperatureMixture(twoSources, "id", "source",
      alpha = 0.5, targetFraction = 0.3)
    val counts = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // md5-uniformity tolerance on 900/100-row strata
    assert(math.abs(counts("big") - 225.0) < 60, counts.toString)
    assert(math.abs(counts("small") - 75.0) < 35, counts.toString)
    val again = Sampling.temperatureMixture(twoSources, "id", "source",
      alpha = 0.5, targetFraction = 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(again == out.collect().map(_.getLong(0)).toSet)
  }

  test("weightedSystematic: ~target rows, weight-proportional, heavy rows always kept") {
    // 1000 light rows (w=10) + 10 heavy rows (w=5000): totalW=60000,
    // target 30 -> step=2000 < 5000, so every heavy row MUST be kept
    val df = ((1 to 1000).map(i => (i.toLong, 10L)) ++
      (2001 to 2010).map(i => (i.toLong, 5000L))).toDF("id", "w")
    val kept = Sampling.weightedSystematic(df, "id", "w", target = 30L)
    val ids = kept.select("id").as[Long].collect().toSet
    assert((2001L to 2010L).forall(ids.contains), "heavy rows must all survive")
    // heavy rows absorb multiple step boundaries but are kept once, so
    // kept-rows <= target: 10 heavy rows soak up ~25 of the 30
    // boundaries; the light pool (10000 weight) contributes ~5 more
    val n = ids.size
    assert(n >= 12 && n <= 20, s"kept $n (expected ~15 after saturation)")
    // deterministic
    val again = Sampling.weightedSystematic(df, "id", "w", target = 30L)
      .select("id").as[Long].collect().toSet
    assert(again == ids)
  }

  test("weightedSystematic: sharded cumsum equals the single global window") {
    val df = (1 to 500).map(i => (i.toLong, (i % 7 + 1).toLong)).toDF("id", "w")
    val out = Sampling.weightedSystematic(df, "id", "w", target = 40L)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    // independent reference: one global in-memory cumsum in (md5, id) order
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = (1 to 500).map(i => (i.toLong, (i % 7 + 1).toLong))
      .sortBy { case (id, _) => (md5hex(id.toString), id) }
    val totalW = rows.map(_._2).sum
    val step = math.max(totalW / 40L, 1L)
    var cum = 0L
    val expect = rows.flatMap { case (id, w) =>
      cum += w
      if (cum / step > (cum - w) / step) Some(id -> cum) else None
    }.toMap
    assert(out == expect)
  }

  test("epochPlan: integer allocation, ceil-div epochs, unlisted dropped") {
    val df = Seq(
      ("a", 100L), ("a", 150L), // a: 250 tokens
      ("b", 1000L),             // b: 1000 tokens
      ("c", 50L))               // c: unlisted — must not appear
      .toDF("src", "n")
    val plan = Sampling.epochPlan(df, "src", "n",
        Map("a" -> 7500L, "b" -> 2500L), budgetTokens = 1000L)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("available_tokens"), r.getAs[Long]("target_tokens"),
         r.getAs[Long]("epochs"), r.getAs[Long]("partial_epoch_tokens"),
         r.getAs[Double]("repeat_factor"))).toMap
    // a: target 750 of 250 available → 3 full epochs exactly, partial 0
    assert(plan("a") == ((250L, 750L, 3L, 0L, 3.0)))
    // b: target 250 of 1000 → 1 epoch started, partial 250, repeat 0.25
    assert(plan("b") == ((1000L, 250L, 1L, 250L, 0.25)))
    assert(!plan.contains("c"))
    // weights must sum to 10000 bp
    intercept[IllegalArgumentException] {
      Sampling.epochPlan(df, "src", "n", Map("a" -> 1L), 10L)
    }
  }

  test("globalIndex: contiguous 0..N-1 in total order, skewed shards") {
    import org.apache.spark.sql.expressions.Window
    // skewed shard sizes (1, 7, 2) and shuffled input order
    val rows = Seq(("c", 30L), ("a", 5L), ("b", 12L), ("b", 11L),
      ("b", 16L), ("b", 13L), ("b", 14L), ("b", 15L), ("b", 10L),
      ("c", 31L))
    val df = rows.toDF("grp", "id").repartition(4)
    val out = Sampling.globalIndex(df, col("grp"),
      Seq(col("grp"), col("id")))
    val got = out.select("grp", "id", "idx")
      .as[(String, Long, Long)].collect().sortBy(_._3)
    val expected = rows.sortBy(r => (r._1, r._2)).zipWithIndex
      .map { case ((g, i), ix) => (g, i, ix.toLong) }
    assert(got.toSeq == expected)
    // agrees with the single-window reference on a larger frame
    val big = (1L to 500L).map(i => (s"s${i % 7}", i)).toDF("grp", "id")
    val ref = big.withColumn("ridx",
      row_number().over(Window.orderBy(col("grp"), col("id"))).cast("long") - 1)
    val mismatch = Sampling.globalIndex(big, col("grp"),
        Seq(col("grp"), col("id")))
      .join(ref, Seq("grp", "id"))
      .filter(col("idx") =!= col("ridx")).count()
    assert(mismatch == 0)
  }

  test("globalIndex: output column collision fails loudly") {
    val df = Seq((1L, 2L)).toDF("idx", "id")
    intercept[IllegalArgumentException] {
      Sampling.globalIndex(df, col("id"), Seq(col("id")))
    }
  }
}
