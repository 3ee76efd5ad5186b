package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-bucket analytics suite (reference: plugins/gcp-provider/
  * change_analytics.go:133-494 — frequency trends, impact trends, top-N
  * resources, dimensional breakdowns, anomaly rules, granularity pick).
  * The reference buckets timestamps in a Go loop; here each report section
  * is one windowed aggregation — map-side partial aggregation + a single
  * shuffle on (bucket, dim).
  */
object Analytics {

  /** Granularity auto-pick (change_analytics.go:775-789): ≤2h→minute,
    * ≤48h→hour, ≤30d→day, ≤1y→week, else month.
    */
  def pickGranularity(rangeHours: Double): String =
    if (rangeHours <= 2) "minute"
    else if (rangeHours <= 48) "hour"
    else if (rangeHours <= 24 * 30) "day"
    else if (rangeHours <= 24 * 365) "week"
    else "month"

  /** Frequency trend (A5, change_analytics.go:191-231): counts per
    * time bucket, with per-dimension breakdown.
    */
  def frequencyTrend(events: DataFrame, tsCol: String, dimCol: String,
      granularity: String): DataFrame =
    events.groupBy(date_trunc(granularity, col(tsCol)).as("bucket"),
        col(dimCol).as("dim"))
      .agg(count(lit(1)).as("n"))

  /** Impact trend (A6, change_analytics.go:384-450): per-bucket avg/sum
    * score, high-risk and critical counts.
    */
  /** Double sums are order-sensitive; aggregating in decimal(18,4) makes
    * the result exact and engine-independent (the DuckDB oracle computes
    * the identical value). Rounding happens in *decimal* space (exact
    * HALF_UP in both engines) before the cast to double; averages stay as
    * raw IEEE divisions of exact operands — bit-identical cross-engine,
    * whereas ROUND-of-double can split at half boundaries.
    */
  private def exactSum(c: Column, scale: Int = 2): Column =
    round(sum(c.cast("decimal(18,4)")), scale).cast("double")

  private def exactAvg(c: Column): Column =
    sum(c.cast("decimal(18,4)")).cast("double") / count(lit(1))

  def impactTrend(events: DataFrame, tsCol: String, scoreCol: String,
      granularity: String, highRisk: Double = 70): DataFrame =
    events.groupBy(date_trunc(granularity, col(tsCol)).as("bucket"))
      .agg(exactAvg(col(scoreCol)).as("avg_score"),
        exactSum(col(scoreCol)).as("total_score"),
        count(when(col(scoreCol) > highRisk, 1)).as("high_risk_count"),
        count(lit(1)).as("n"))

  /** Gap-filled time series — the densification step the reference's
    * trend reports imply but compute client-side (a Go loop emits a
    * bucket even when no event fell in it): every (dim, bucket) slot of
    * the dimension's [min, max] event-time span appears exactly once,
    * empty buckets carry n = 0, and `carried_sum` repeats the most
    * recent non-empty bucket's sum (last-observation-carried-forward —
    * the dashboard line that doesn't drop to zero when a quiet hour has
    * no data).
    *
    * Shape: per-dim span from one partial-agg pass; the dense bucket
    * axis is `sequence()` exploded from span rows (one row per dim — a
    * frame of dims × buckets, never corpus-sized); actuals left-join in
    * on (dim, bucket) and the carry-forward is a `last(_, ignoreNulls)`
    * running window per dim, ordered by bucket — one shuffle keyed by
    * dim. Sums are decimal-exact so the carried values replay
    * bit-for-bit in any engine.
    */
  def gapFill(events: DataFrame, tsCol: String, dimCol: String,
      valueCol: String, granularity: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val actual = events
      .groupBy(date_trunc(granularity, col(tsCol)).as("bucket"),
        col(dimCol).as("dim"))
      .agg(count(lit(1)).as("n"),
        round(sum(col(valueCol).cast("decimal(18,4)")), 4).cast("double")
          .as("bucket_sum"))
    val span = events.groupBy(col(dimCol).as("dim"))
      .agg(date_trunc(granularity, min(col(tsCol))).as("lo"),
        date_trunc(granularity, max(col(tsCol))).as("hi"))
    val axis = span.select(col("dim"),
      explode(sequence(col("lo"), col("hi"),
        expr(s"INTERVAL 1 $granularity"))).as("bucket"))
    val w = Window.partitionBy("dim").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    axis.join(actual, Seq("dim", "bucket"), "left")
      .select(col("dim"), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("bucket_sum"), ignoreNulls = true).over(w)
          .as("carried_sum"))
  }

  /** Linear-interpolation gap fill — [[gapFill]]'s other standard mode:
    * an empty bucket between two observed buckets takes the straight-
    * line blend `v_prev + (v_next − v_prev)·(t − t_prev)/(t_next −
    * t_prev)` instead of repeating the last observation (the metric-
    * dashboard "connect the dots" line; LOCF is the "hold the level"
    * line). Same densified-axis shape; the prev/next anchors come from
    * paired ignoreNulls running windows (forward + backward) over the
    * SAME dim-keyed shuffle, so interpolation adds a window pass but no
    * exchange. Leading/trailing gaps (no anchor on one side) stay NULL
    * — extrapolation is a policy, not an interpolation. All blend
    * arithmetic is integer epochs and exact-decimal-rounded doubles in
    * a pinned operation order, so both engines agree bit-for-bit.
    */
  def gapFillInterpolate(events: DataFrame, tsCol: String, dimCol: String,
      valueCol: String, granularity: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val actual = events
      .groupBy(date_trunc(granularity, col(tsCol)).as("bucket"),
        col(dimCol).as("dim"))
      .agg(count(lit(1)).as("n"),
        round(sum(col(valueCol).cast("decimal(18,4)")), 4).cast("double")
          .as("bucket_sum"))
    val span = events.groupBy(col(dimCol).as("dim"))
      .agg(date_trunc(granularity, min(col(tsCol))).as("lo"),
        date_trunc(granularity, max(col(tsCol))).as("hi"))
    val axis = span.select(col("dim"),
      explode(sequence(col("lo"), col("hi"),
        expr(s"INTERVAL 1 $granularity"))).as("bucket"))
    val fwd = Window.partitionBy("dim").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bwd = Window.partitionBy("dim").orderBy("bucket")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val t = col("bucket").cast("long")
    val obsT = when(col("bucket_sum").isNotNull, t)
    axis.join(actual, Seq("dim", "bucket"), "left")
      .withColumn("_pv", last(col("bucket_sum"), ignoreNulls = true).over(fwd))
      .withColumn("_pt", last(obsT, ignoreNulls = true).over(fwd))
      .withColumn("_nv", first(col("bucket_sum"), ignoreNulls = true).over(bwd))
      .withColumn("_nt", first(obsT, ignoreNulls = true).over(bwd))
      .select(col("dim"), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        when(col("bucket_sum").isNotNull, col("bucket_sum"))
          .otherwise(
            col("_pv") + (col("_nv") - col("_pv")) *
              ((t - col("_pt")).cast("double") /
                (col("_nt") - col("_pt")).cast("double")))
          .as("interp_sum"))
  }

  /** Top-N most-changed resources (A7, change_analytics.go:452-494):
    * per-key counts, latest change, avg impact; deterministic order.
    */
  def topResources(events: DataFrame, keyCol: String, tsCol: String,
      scoreCol: String, n: Int): DataFrame =
    events.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("change_count"),
        max(col(tsCol)).as("last_change"),
        exactAvg(col(scoreCol)).as("avg_impact"))
      .orderBy(col("change_count").desc, col("key").asc)
      .limit(n)

  /** Dimensional breakdown (A8, change_analytics.go:325-367): counts per
    * value of each requested dimension, stacked into (dimension, value, n)
    * rows via a single grouping-sets pass instead of one job per dim.
    */
  def dimensionalCounts(events: DataFrame, dims: Seq[String]): DataFrame =
    dims.map { d =>
      events.groupBy(col(d).cast("string").as("value"))
        .agg(count(lit(1)).as("n"))
        .select(lit(d).as("dimension"), col("value"), col("n"))
    }.reduce(_ unionByName _)

  /** Anomaly rules (E16, change_analytics.go:715-771): three fixed rules
    * with confidence scores.
    *  1. frequency spike: total changes in range > spikeThreshold
    *  2. service concentration: one dim value > 50% of all changes
    *  3. resource hotspot: one key with > hotspotThreshold changes
    *
    * One scan, one shuffle: GROUPING SETS ((), (dim), (key)) computes the
    * global count, per-dim counts, and per-key counts in a single
    * partially-aggregated pass (a 3-branch union would scan the input three
    * times, and the corpus total the concentration rule needs was
    * previously a blocking driver-side count — here it is the () row,
    * window-summed over the already-tiny aggregated frame).
    */
  def anomalies(events: DataFrame, dimCol: String, keyCol: String,
      spikeThreshold: Long = 1000, hotspotThreshold: Long = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = events
      .select(col(dimCol).cast("string").as("_dim"),
        col(keyCol).cast("string").as("_key"))
      .groupingSets(Seq(Seq(), Seq(col("_dim")), Seq(col("_key"))),
        col("_dim"), col("_key"))
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
    // gid over (_dim,_key): () = 3, (_dim) = 1, (_key) = 2
    val tot = sum(when(col("gid") === 3, col("n"))).over(Window.partitionBy())
    g.withColumn("tot", tot)
      .withColumn("anomaly_type",
        when(col("gid") === 3, "frequency_spike")
          .when(col("gid") === 1, "service_concentration")
          .otherwise("resource_hotspot"))
      .withColumn("subject",
        when(col("gid") === 1, col("_dim"))
          .when(col("gid") === 2, col("_key")).cast("string"))
      .withColumn("confidence",
        when(col("gid") === 3,
          least(col("n").cast("double") / (spikeThreshold * 2), lit(1.0)))
          .when(col("gid") === 1, col("n").cast("double") / col("tot"))
          .otherwise(
            least(col("n").cast("double") / (hotspotThreshold * 2), lit(1.0))))
      .filter(
        (col("gid") === 3 && col("n") > spikeThreshold) ||
          (col("gid") === 1 && col("n").cast("double") / col("tot") > 0.5) ||
          (col("gid") === 2 && col("n") > hotspotThreshold))
      .select("anomaly_type", "subject", "n", "confidence")
  }

  /** Compliance scoring (E19, change_analytics.go:506-582): score starts at
    * 85, −10 per critical, −5 per high, −2 per medium affected change;
    * floor 0; trend improving/stable/declining at >90/>75.
    */
  def complianceScore(severityCounts: Map[String, Long]): (Double, String) = {
    val score = math.max(0.0,
      85.0 - 10 * severityCounts.getOrElse("CRITICAL", 0L)
        - 5 * severityCounts.getOrElse("HIGH", 0L)
        - 2 * severityCounts.getOrElse("MEDIUM", 0L))
    val trend = if (score > 90) "improving" else if (score > 75) "stable" else "declining"
    (score, trend)
  }

  /** Columnar twin of [[complianceScore]] for scoring many frameworks in
    * one distributed pass: takes per-severity count columns, yields the
    * (score, trend) columns with identical arithmetic.
    */
  def complianceScoreCols(critical: Column, high: Column, medium: Column):
      (Column, Column) = {
    val score = greatest(lit(0.0),
      lit(85.0) - lit(10) * critical - lit(5) * high - lit(2) * medium)
    val trend = when(score > 90, "improving")
      .when(score > 75, "stable").otherwise("declining")
    (score, trend)
  }

  /** Key-skew diagnostic — the pre-flight for [[SkewJoin]] salting and
    * AQE skew thresholds: the heaviest `topN` keys with their counts
    * plus the global shape (key count, row count, mean, max/mean skew
    * factor). One partial-aggregated groupBy(key) produces the count
    * frame; the summary is a scalar aggregate broadcast back; the top-N
    * is orderBy+limit (TakeOrdered); the rank window runs over those
    * `topN` rows only. Divisions are single IEEE ops in a pinned order,
    * so every cell is engine-replayable.
    */
  def keySkew(df: DataFrame, keyCol: String, topN: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    val summary = counts.agg(count(lit(1)).as("n_keys"),
      sum("n").as("n_rows"), max("n").as("max_n"))
    val ord = Seq(col("n").desc, col("key").asc)
    counts.orderBy(ord: _*).limit(topN)
      .crossJoin(broadcast(summary))
      .withColumn("rank",
        row_number().over(Window.orderBy(ord: _*)).cast("bigint"))
      .withColumn("mean_n",
        col("n_rows").cast("double") / col("n_keys").cast("double"))
      .withColumn("skew", col("max_n").cast("double") / col("mean_n"))
      .withColumn("share", col("n").cast("double") / col("n_rows").cast("double"))
      .select("rank", "key", "n", "share", "n_keys", "n_rows", "mean_n",
        "skew")
  }

  /** First-order event-transition matrix — per entity, consecutive
    * event-type pairs in event-time order, counted corpus-wide (the
    * empirical Markov chain of user behavior). The lag window partitions
    * by entity — O(events-per-entity) state, the same volume any
    * per-entity analysis touches — and ties at equal timestamps break on
    * the id column, so the matrix is deterministic. Emits
    * (from_type, to_type, n, row_share): share = n / Σ n over from_type,
    * a raw IEEE division of exact longs.
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val pairs = events
      .withColumn("_next", lead(col(typeCol), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = Window.partitionBy("from_type")
    pairs.withColumn("row_share",
      col("n").cast("double") / sum("n").over(totals).cast("double"))
  }

  /** Weekly cohort retention — users grouped by first-activity week,
    * counted distinct per (cohort week, weeks-since-cohort) cell: the
    * standard retention triangle. Two aggregations (first-seen per user,
    * then the cell counts) and one user-keyed join; week arithmetic is
    * pure integer epoch-day division so any engine replays it.
    */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val weeks = events.select(col(userCol).as("user_id"),
      floor(col(tsCol).cast("long") / lit(604800L)).cast("bigint").as("week"))
    val first = weeks.groupBy("user_id").agg(min("week").as("cohort_week"))
    weeks.join(first, "user_id")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("weeks_since"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Step-wise funnel analysis — per entity, the greedy earliest path
    * through an ordered step sequence: step 1's first occurrence, then
    * each next step's first occurrence AT OR AFTER the previous chosen
    * time (the standard strict-order funnel; deterministic because every
    * choice is a MIN). Emits one row per entity that reached step 1,
    * with each step's epoch-second timestamp (NULL where the funnel
    * stalls), the completed-step count, and a converted flag (all steps
    * within `horizonSeconds` of step 1).
    *
    * Plan shape: one filtered partial-aggregation plus one entity-keyed
    * equi-join per step — k−1 bounded shuffles for a k-step funnel,
    * never a per-entity event sort or a session window over the raw
    * stream. Reference model: corkscrew's change analytics correlate
    * event sequences client-side after range queries
    * (internal/analytics/changes.go); here the sequencing is relational.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], horizonSeconds: Long): DataFrame = {
    require(steps.size >= 2, s"funnel wants >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val base = events.select(col(userCol).as("user_id"),
      col(typeCol).as("_t"), col(tsCol).cast("long").as("_s"))
    var acc = base.filter(col("_t") === steps.head)
      .groupBy("user_id").agg(min("_s").as("ts_1"))
    steps.zipWithIndex.tail.foreach { case (s, i) =>
      val prev = s"ts_$i"
      val cur = s"ts_${i + 1}"
      val next = base.filter(col("_t") === s)
        .join(acc.select(col("user_id"), col(prev)), Seq("user_id"))
        .filter(col("_s") >= col(prev))
        .groupBy("user_id").agg(min("_s").as(cur))
      acc = acc.join(next, Seq("user_id"), "left")
    }
    val stepCols = (1 to steps.size).map(i => col(s"ts_$i"))
    acc
      .withColumn("steps_completed",
        stepCols.map(c => when(c.isNotNull, 1).otherwise(0))
          .reduce(_ + _).cast("bigint"))
      // false-AND-null = false: a stalled funnel is converted = false,
      // never NULL
      .withColumn("converted", stepCols.last.isNotNull &&
        (stepCols.last - stepCols.head) <= horizonSeconds)
  }

  /** Conversation / turn-structure QA — the ingest validation an
    * instruction-tuning corpus of chat transcripts needs before
    * packing: per conversation key, the turn count and the three
    * structural violation counts — consecutive same-role turns
    * (role-alternation break), stale gaps (> `staleGapSec` between
    * turns — two conversations glued under one key), and empty
    * content — plus the derived `clean` flag the downstream filter
    * keys on. All integer counts; the first turn's NULL lag compares
    * to nothing and counts no violation on either engine.
    *
    * 100 TB shape: one exchange on the conversation key serves both
    * the lag window and the rollup (same partitioning); per-key window
    * frames are conversation-sized, never corpus-sized.
    */
  def conversationQa(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, roleCol: String, contentCol: String,
      staleGapSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy(col("ts"), col("tie"))
    df.select(col(keyCol).as("key"), col(tsCol).as("ts"),
        col(tieCol).as("tie"), col(roleCol).as("role"),
        col(contentCol).as("content"))
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .withColumn("gap_s",
        col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long"))
      .groupBy(col("key").as(keyCol))
      .agg(count(lit(1)).as("n_turns"),
        sum(when(col("role") === col("prev_role"), 1L).otherwise(0L))
          .as("n_role_repeats"),
        sum(when(col("gap_s") > staleGapSec, 1L).otherwise(0L))
          .as("n_stale_gaps"),
        sum(when(col("content").isNull || col("content") === "", 1L)
          .otherwise(0L)).as("n_empty"))
      .withColumn("clean", col("n_role_repeats") === 0 &&
        col("n_stale_gaps") === 0 && col("n_empty") === 0)
  }
}
