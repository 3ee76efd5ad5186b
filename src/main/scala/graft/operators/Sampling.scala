package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines: rows are
  * kept or routed by a hash of a stable key, never by `rand()`. That makes
  * every sample reproducible across runs, retries, speculative tasks, and
  * engines (the DuckDB oracle computes the identical md5), and it needs no
  * shuffle — a 100 TB corpus splits in a single scan with filters that
  * Parquet row-group statistics can't help with but codegen makes ~free.
  *
  * The hash bucket is the first 8 hex chars of `md5(key)` compared as a
  * string against a precomputed hex threshold: hex digits sort in ASCII
  * order, so `bucket < threshold` selects a uniform `fraction` of keys with
  * no float conversion at all (string compare in both engines).
  *
  * Reference has no sampling surface; this is a pipeline extra
  * (training-data prep: train/val/test routing, stratified downsampling).
  */
object Sampling {

  /** First 8 hex chars of md5(key) — the uniform [0, 2^32) bucket. A
    * non-empty `salt` namespaces the hash (`md5(salt || ":" || key)`), so
    * two pipeline stages keyed on the same column draw INDEPENDENT
    * buckets. Stages composed on one unsalted hash are fully correlated:
    * e.g. a mixture filter at rate r followed by an unsalted 90/5/5 split
    * routes every survivor of any source with r <= 0.9 to 'train' and
    * leaves val/test empty. [[hashSplit]] and [[mixtureSample]] therefore
    * default to distinct salts.
    */
  def hashBucket(key: Column, salt: String = ""): Column =
    if (salt.isEmpty) substring(md5(key.cast("string")), 1, 8)
    else substring(md5(concat(lit(salt + ":"), key.cast("string"))), 1, 8)

  private def requireFreshColumns(df: DataFrame, out: Seq[String]): Unit = {
    val clash = out.filter(df.columns.contains)
    require(clash.isEmpty,
      s"output column(s) ${clash.mkString(", ")} already exist on the input; " +
        "rename them or pass different output column names")
  }

  /** Hex threshold such that P[bucket < threshold] == fraction. */
  def hexThreshold(fraction: Double): String = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of [0,1]: $fraction")
    val t = math.min((fraction * 4294967296.0).toLong, 4294967295L)
    f"$t%08x"
  }

  /** Keep a deterministic `fraction` of rows by key hash. Uniform within
    * every stratum automatically (md5 is independent of any column), so
    * this IS the stratified sample when the key is unique per row.
    */
  def sampleByKey(df: DataFrame, keyCol: String, fraction: Double,
      salt: String = ""): DataFrame =
    df.filter(hashBucket(col(keyCol), salt) < lit(hexThreshold(fraction)))

  /** Deterministic train/val/test routing: `splits` are (label, weight)
    * pairs; weights must sum to 1. A row's label is the first split whose
    * cumulative-weight threshold exceeds its hash bucket — so splits are
    * disjoint, exhaustive, and stable under re-runs and engine changes.
    */
  def hashSplit(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)], outCol: String = "split",
      salt: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    requireFreshColumns(df, Seq(outCol))
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"weights must sum to 1, got $total")
    val b = hashBucket(col(keyCol), salt)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    // Last split catches everything below threshold 1.0 exactly.
    val assign = splits.zip(cum).dropRight(1).foldRight(
        lit(splits.last._1): Column) { case (((label, _), c), rest) =>
      when(b < lit(hexThreshold(c)), lit(label)).otherwise(rest)
    }
    df.withColumn(outCol, assign)
  }

  /** Per-stratum deterministic downsampling to at most `maxPerStratum`
    * rows: rank rows within each stratum by hash bucket (tie-break on the
    * key itself) and keep the lowest `maxPerStratum`. One shuffle on the
    * strata columns; ranking is a window, so skewed strata parallelize to
    * the extent the stratum count allows — for heavy-hitter strata at 100
    * TB scale prefer [[sampleByKey]] with a per-stratum fraction instead
    * (no window, no skew).
    */
  def capPerStratum(df: DataFrame, keyCol: String, strata: Seq[String],
      maxPerStratum: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(hashBucket(col(keyCol)).asc, col(keyCol).asc)
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= maxPerStratum)
      .drop("_rk")
  }

  /** Deterministic source-mixture sampling: keep each row with the rate
    * assigned to its source/domain (the "data mixture" step of a training
    * pipeline — upweight books, downsample crawl, etc., expressed as
    * per-source keep rates in [0,1]). The rate map folds into one CASE
    * column, so the whole mixture is a single no-shuffle codegen'd scan;
    * sources missing from the map keep `defaultRate`. Reproducible across
    * runs/engines: same md5-threshold rule as [[sampleByKey]], applied
    * per-source, and uniform within every source automatically.
    */
  def mixtureSample(df: DataFrame, keyCol: String, sourceCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      salt: String = "mix"): DataFrame = {
    // Sort for a deterministic CASE chain (Map order is not stable).
    val threshold = rates.toSeq.sortBy(_._1).foldRight(
        lit(hexThreshold(defaultRate)): Column) { case ((src, r), rest) =>
      when(col(sourceCol) === src, lit(hexThreshold(r))).otherwise(rest)
    }
    df.filter(hashBucket(col(keyCol), salt) < threshold)
  }

  /** Temperature-weighted mixture rates — the standard multinomial
    * source-sampling law of multilingual / multi-source training-data
    * prep (mT5 / XLM-R / LLaMA style): sample source `s` with
    * probability proportional to `n_s^alpha`, so `alpha = 1` keeps the
    * natural distribution, `alpha -> 0` flattens it, and intermediate
    * alphas upweight rare sources without drowning the head.
    *
    * Returns a per-source keep-rate map such that the expected kept
    * fraction of the whole corpus is `targetFraction`:
    * `rate_s = C * n_s^(alpha-1)` with `C` solved so
    * `sum_s rate_s * n_s = targetFraction * N`, waterfilled where the
    * cap binds (a rate can't exceed 1 — capped sources contribute all
    * their rows and the remainder re-solves over the rest;
    * deterministic iteration in source order). Source counts come from
    * one vocabulary-sized aggregate collected to the driver — source
    * cardinality is bounded by design (like the IVF centroid table), so
    * the collect is a few dozen rows at any corpus scale.
    */
  def temperatureRates(df: DataFrame, sourceCol: String,
      alpha: Double = 0.5, targetFraction: Double = 0.3)
      : Map[String, Double] = {
    require(alpha >= 0 && alpha <= 1, s"alpha out of [0,1]: $alpha")
    require(targetFraction > 0 && targetFraction <= 1,
      s"targetFraction out of (0,1]: $targetFraction")
    val counts = df.groupBy(sourceCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    val target = targetFraction * total
    // waterfill: capped sources keep everything; re-solve C on the rest
    var capped = Set.empty[String]
    var rates = Map.empty[String, Double]
    var done = false
    while (!done) {
      val free = counts.keys.toSeq.sorted.filterNot(capped)
      val cappedMass = capped.toSeq.map(counts(_).toDouble).sum
      val freeWeight = free.map(s => math.pow(counts(s).toDouble, alpha)).sum
      val c = (target - cappedMass) / freeWeight
      rates = free.map { s =>
        s -> c * math.pow(counts(s).toDouble, alpha - 1.0)
      }.toMap ++ capped.map(_ -> 1.0)
      val newlyCapped = free.filter(rates(_) >= 1.0)
      if (newlyCapped.isEmpty) done = true
      else capped ++= newlyCapped
    }
    rates
  }

  /** [[temperatureRates]] applied through [[mixtureSample]]: one
    * no-shuffle codegen'd scan keeps each row iff its salted md5 bucket
    * clears its source's temperature-derived threshold.
    */
  def temperatureMixture(df: DataFrame, keyCol: String, sourceCol: String,
      alpha: Double = 0.5, targetFraction: Double = 0.3,
      salt: String = "mix"): DataFrame =
    mixtureSample(df, keyCol, sourceCol,
      temperatureRates(df, sourceCol, alpha, targetFraction),
      defaultRate = 0.0, salt = salt)

  /** Deterministic global interleave (seeded reshuffle) of training rows:
    * order every row by `md5(seed || ":" || key)`, sharded by the first
    * `prefixChars` hex chars of that hash. Returns the input plus
    * `shard` (the hex prefix, 16^prefixChars shards) and `pos` (the row's
    * 1-based position within its shard). The global training order is
    * exactly (shard ASC, pos ASC) — recoverable because a prefix group is
    * a contiguous range of the full hash order — but no global window
    * ever exists: ranking partitions by shard, so a 100 TB corpus
    * interleaves with ONE shuffle across 16^prefixChars independent
    * partitions (raise `prefixChars` until a shard fits an executor; 4
    * hex chars = 65 536 shards). Seed change = completely new order; same
    * seed = byte-identical order across runs, engines, and retries —
    * which is what makes a training run resumable and ablatable.
    */
  /** Weight-proportional systematic sampling: keep ~`target` rows with
    * P[keep] ∝ integer `weight`, deterministically — the
    * quality-weighted downsampling step (keep more of the high-scoring
    * docs) that rand()-based weighted sampling can't make reproducible.
    *
    * Scheme: order rows by `(md5(key), key)` (an order-free uniform
    * permutation), take the running weight sum `cum`, and keep a row iff
    * the interval `(cum − w, cum]` contains a multiple of
    * `step = max(totalW div target, 1)` — classic systematic sampling
    * over the cumulative axis, all int64, no floats, no rand(). Rows
    * with `w ≥ step` are always kept (the heavy-doc guarantee); a heavy
    * row absorbs every boundary in its interval while appearing once, so
    * `target` bounds SELECTIONS and the kept-row count can run below it
    * when heavy rows saturate — the usual deduplicated-systematic
    * semantics.
    *
    * Scale: a global running sum would serialize, so the cumsum is
    * hierarchical — per-shard window (shard = first md5 byte, 256-way)
    * plus broadcast shard-offsets, the same two-pass pattern as
    * [[TextAnalysis.packSequences]]. Because the shard is a PREFIX of
    * the sort key, per-shard order + lexicographic shard offsets equal
    * the one global order, which is exactly what the oracle replays with
    * a single window.
    *
    * @return input rows kept, plus (`cum`, `step`) for audit.
    */
  def weightedSystematic(df: DataFrame, keyCol: String, weightCol: String,
      target: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(target >= 1, s"target must be >= 1, got $target")
    requireFreshColumns(df, Seq("_h", "_shard", "_w", "_off", "cum", "step"))
    val h = df
      .withColumn("_h", md5(col(keyCol).cast("string")))
      .withColumn("_shard", substring(col("_h"), 1, 2))
      // Guard the documented int64 w >= 0 contract distributively: a
      // negative weight makes the cumulative axis non-monotonic (breaking
      // the interval-contains-a-boundary semantics and the target bound),
      // and a null would be silently dropped by sum() — both must fail
      // loudly, not skew the sample.
      .withColumn("_w",
        when(col(weightCol).isNull || col(weightCol) < 0,
          raise_error(concat(
            lit(s"weightedSystematic: weight column '$weightCol' must be " +
              "non-null and >= 0, got "),
            coalesce(col(weightCol).cast("string"), lit("NULL")))))
          .otherwise(col(weightCol)).cast("bigint"))
    val totals = h.groupBy("_shard").agg(sum("_w").as("_sw"))
    val wOff = Window.orderBy("_shard")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    // 256 rows: the offset window is driver-scale by construction
    val offsets = totals.withColumn("_off",
      coalesce(sum("_sw").over(wOff), lit(0L)))
    val wCum = Window.partitionBy("_shard").orderBy(col("_h"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stepDf = h.agg(sum("_w").as("_tw"))
      .select(greatest(expr(s"_tw div ${target}L"), lit(1L)).as("step"))
    h.join(broadcast(offsets.select(col("_shard"), col("_off"))), "_shard")
      .withColumn("cum", col("_off") + sum("_w").over(wCum))
      .crossJoin(broadcast(stepDf))
      .filter(expr("cum div step") > expr("(cum - _w) div step"))
      .drop("_h", "_shard", "_w", "_off")
  }

  /** Contiguous global row index 0..N-1 in total (`shardCol`,
    * `orderCols`) order — the sample-index assignment a training
    * pipeline needs (shard manifests, resumable loaders, deterministic
    * example ids) — WITHOUT the classic scale killer: `row_number()`
    * over an unpartitioned window collapses 100 TB onto one task. Same
    * hierarchical two-pass shape as [[weightedSystematic]]: per-shard
    * counts (one partial-agg shuffle to a bounded shard frame), shard
    * offsets via a window over THAT frame, broadcast back, per-shard
    * `row_number`. `shardCol` must be order-consistent with the total
    * order (every row of a lesser shard sorts before every row of a
    * greater one — an id range bucket, a date, a source prefix); per-
    * shard positions + lexicographic shard offsets then equal the one
    * global order, which is exactly what a single-window oracle
    * replays.
    */
  def globalIndex(df: DataFrame, shardCol: Column,
      orderCols: Seq[Column], outCol: String = "idx"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(orderCols.nonEmpty, "globalIndex needs at least one order column")
    requireFreshColumns(df, Seq(outCol, "_shard", "_n", "_off", "_ln"))
    val h = df.withColumn("_shard", shardCol)
    val totals = h.groupBy("_shard").agg(count(lit(1)).as("_n"))
    val wOff = Window.orderBy("_shard")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    // bounded shard frame: the offset window is driver-scale
    val offsets = totals.withColumn("_off",
      coalesce(sum("_n").over(wOff), lit(0L)))
    val wLocal = Window.partitionBy("_shard").orderBy(orderCols: _*)
    h.join(broadcast(offsets.select(col("_shard"), col("_off"))), "_shard")
      .withColumn("_ln", row_number().over(wLocal).cast("bigint"))
      .withColumn(outCol, col("_off") + col("_ln") - 1)
      .drop("_shard", "_n", "_off", "_ln")
  }

  /** Exact-quota stratified sample: exactly min(quota, |stratum|) rows
    * per stratum, chosen by md5-hash order with a key tie-break — the
    * eval/dev-set construction verb where "about 2%" (md5-threshold
    * sampling) isn't acceptable and the quota must be EXACT per class.
    * Deterministic across runs and engines (no rand()); one window
    * shuffle keyed by the strata, each partition bounded by its stratum.
    */
  def stratifiedQuota(df: DataFrame, strataCols: Seq[String],
      keyCol: String, quota: Int, seed: String = "strata"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(strataCols.nonEmpty, "need at least one stratum column")
    require(quota >= 1, s"quota must be >= 1, got $quota")
    requireFreshColumns(df, Seq("_h", "_rk"))
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(col("_h"), col(keyCol))
    df.withColumn("_h",
        md5(concat(lit(seed + ":"), col(keyCol).cast("string"))))
      .withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= quota)
      .drop("_h", "_rk")
  }

  def interleave(df: DataFrame, keyCol: String, seed: String,
      prefixChars: Int = 2): DataFrame = {
    require(prefixChars >= 1 && prefixChars <= 8,
      s"prefixChars out of [1,8]: $prefixChars")
    requireFreshColumns(df, Seq("shard", "pos"))
    import org.apache.spark.sql.expressions.Window
    val ord = md5(concat(lit(seed + ":"), col(keyCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("_ord"), col(keyCol))
    df.withColumn("_ord", ord)
      .withColumn("shard", substring(col("_ord"), 1, prefixChars))
      .withColumn("pos", row_number().over(w).cast("bigint"))
      .drop("_ord")
  }

  /** Token-budget epoch planner — the curation step that turns a target
    * mixture into per-source repeat plans ("how many epochs of source X
    * does a B-token run consume at weight w?", the data-constrained
    * scaling question of Muennighoff et al. 2023). Weights are given in
    * BASIS POINTS (parts per 10 000) so target allocation is pure
    * integer arithmetic — `budget·bp div 10000` — reproducible in any
    * engine with no float rounding. Returns one row per source:
    * available tokens, target tokens, full epochs consumed (ceil),
    * tokens drawn from the final partial epoch, and the repeat factor
    * (the only IEEE value, a raw division both engines compute
    * identically). One partial-agg shuffle on the source key; the plan
    * is corpus-scan-shaped at any SF.
    */
  def epochPlan(df: DataFrame, sourceCol: String, tokensCol: String,
      weightsBp: Map[String, Long], budgetTokens: Long): DataFrame = {
    require(weightsBp.values.forall(_ >= 0), "weights must be >= 0")
    require(weightsBp.values.sum == 10000L,
      s"weights must sum to 10000 bp, got ${weightsBp.values.sum}")
    require(budgetTokens >= 0, "budget must be >= 0")
    val bp = weightsBp.foldLeft(lit(null).cast("bigint")) {
      case (acc, (src, b)) => // post-agg alias: the grouped key is `source`
        when(col("source") === src, lit(b)).otherwise(acc)
    }
    df.groupBy(col(sourceCol).as("source"))
      .agg(sum(col(tokensCol)).cast("bigint").as("available_tokens"))
      .withColumn("weight_bp", bp.cast("bigint"))
      .filter(col("weight_bp").isNotNull) // unlisted sources get no budget
      .withColumn("target_tokens", // integer DIV — `/` would go double
        expr(s"CAST(${budgetTokens}L * weight_bp DIV 10000 AS BIGINT)"))
      .withColumn("epochs", // integer ceil-div: no IEEE in the count
        expr("CASE WHEN target_tokens = 0 THEN 0 " +
          "ELSE (target_tokens - 1) DIV available_tokens + 1 END")
          .cast("bigint"))
      .withColumn("partial_epoch_tokens",
        (col("target_tokens") % col("available_tokens")).cast("bigint"))
      .withColumn("repeat_factor",
        col("target_tokens").cast("double")
          / col("available_tokens").cast("double"))
      .select("source", "available_tokens", "weight_bp", "target_tokens",
        "epochs", "partial_epoch_tokens", "repeat_factor")
  }
}
