package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Shuffle-volume measurement for named SparkEntry queries: total
  * shuffle WRITE bytes (the exchange cost a cluster actually pays)
  * summed across all tasks of the query's jobs. Running the same query
  * at two SFs turns "this operator's shuffles are linear in its input"
  * from a structural claim into a measured one (SCALE.md's
  * shuffle-linearity table) — a quadratic candidate stage shows up as
  * ~SF² write growth immediately.
  *
  * Usage: runMain graft.tools.ProfileShuffle <sfDir> q_name [q_name…]
  */
object ProfileShuffle {
  private final class Probe extends SparkListener {
    @volatile var bytes = 0L
    @volatile var tasks = 0L
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null && m.shuffleWriteMetrics != null) {
        bytes += m.shuffleWriteMetrics.bytesWritten
        tasks += 1
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: ProfileShuffle <sfDir> q_name…")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val probe = new Probe
      spark.sparkContext.addSparkListener(probe)
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously on the bus; settle before
      // reading (the bus is private API — a short sleep is enough for a
      // measurement tool)
      Thread.sleep(1500)
      spark.sparkContext.removeSparkListener(probe)
      println(f"[shuffle] $name sf=$sfDir rows=$n " +
        f"shuffle_write_mb=${probe.bytes / 1048576.0}%.2f " +
        f"shuffle_tasks=${probe.tasks} sec=$sec%.2f")
      graft.Hygiene.release(spark)
    }
    spark.stop()
  }
}
