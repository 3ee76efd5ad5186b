package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Scale proof for the flagship dedup chains (SCALE.md): run each
  * pipeline at two fixture scales and report total shuffle write/read
  * bytes. The claim under test is STRUCTURAL linearity — banded MinHash,
  * one-window ExactSubstr, and cell-blocked SemDeDup shuffle O(input),
  * never O(input²) — so a 10× corpus must move ~10× the shuffle bytes,
  * not 100×. Run: `runMain graft.ProfileDedup [sfA sfB]`.
  */
object ProfileDedup {

  private final class ShuffleMeter extends SparkListener {
    val write = new AtomicLong(0)
    val read = new AtomicLong(0)
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        if (m.shuffleWriteMetrics != null)
          write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        if (m.shuffleReadMetrics != null)
          read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      }
    }
    def reset(): Unit = { write.set(0); read.set(0) }
  }

  private val Pipelines =
    Seq("q_d6_dedup_near", "q_d10_substr_dedup", "q_s13_semantic_dedup")

  def main(args: Array[String]): Unit = {
    val sfs =
      if (args.length >= 2) Seq(args(0), args(1))
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    // (query, sf) -> (rows, shuffleWriteMB, shuffleReadMB, sec)
    val results = for (sf <- sfs; q <- Pipelines) yield {
      // fresh table registrations per sf
      Tables.register(spark, sf)
      meter.reset()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sf).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // let the listener bus drain task-end events
      val wMb = meter.write.get / 1e6
      val rMb = meter.read.get / 1e6
      println(f"$sf%s $q%s: rows=$n%d shuffle_write=$wMb%.1f MB " +
        f"shuffle_read=$rMb%.1f MB time=$sec%.1f s")
      (q, sf, n, wMb, rMb, sec)
    }
    println("\n=== growth factors (B vs A) ===")
    Pipelines.foreach { q =>
      val a = results.find(r => r._1 == q && r._2 == sfs.head).get
      val b = results.find(r => r._1 == q && r._2 == sfs(1)).get
      val rowG = b._3.toDouble / math.max(a._3, 1)
      val wG = b._4 / math.max(a._4, 1e-6)
      println(f"$q%s: rows ×$rowG%.1f shuffle_write ×$wG%.1f " +
        f"(linear iff write-growth ≈ input-growth)")
    }
    spark.stop()
  }
}
