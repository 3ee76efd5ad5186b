package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-stage time breakdown for one registered query — the
  * headless stand-in for the Spark UI's Stages tab (guide §7.1; the bench
  * runs with spark.ui.enabled=false). Runs the query `warm` times first
  * (codegen/JIT), then once instrumented, printing every stage of that
  * run sorted by task-time sum with its callsite, task count, and
  * shuffle/spill bytes — which is exactly the evidence needed to decide
  * WHERE an expensive query spends its wall-clock.
  *
  * Usage: runMain graft.tools.StageProfile q_name [warmRuns]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args.headOption.getOrElse(sys.error("usage: StageProfile q_name"))
    val warm = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    for (_ <- 1 to warm) { fn(spark, sfDir).count(); graft.Hygiene.release(spark) }

    final case class St(id: Int, name: String, tasks: Int, wallMs: Long,
        taskMs: Long, shufReadMb: Double, shufWriteMb: Double)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
    val l = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val wall = (for (a <- i.completionTime; b <- i.submissionTime)
          yield a - b).getOrElse(0L)
        val m = i.taskMetrics
        stages.add(St(i.stageId, i.name, i.numTasks, wall,
          m.executorRunTime,
          m.shuffleReadMetrics.totalBytesRead / 1048576.0,
          m.shuffleWriteMetrics.bytesWritten / 1048576.0))
      }
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.add((e.jobId, Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")))
    }
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val secs = (System.nanoTime() - t0) / 1e9
    Thread.sleep(600) // listener bus drain
    import scala.jdk.CollectionConverters._
    val all = stages.asScala.toSeq.sortBy(-_.wallMs)
    println(f"== $name: $secs%.2f s, $n rows, ${jobs.size} jobs, ${all.size} stages")
    println(f"   wall-sum of stages: ${all.map(_.wallMs).sum / 1000.0}%.2f s " +
      f"(sequential-job overhead = query wall minus overlapped stage wall)")
    all.take(30).foreach { s =>
      println(f"  stage ${s.id}%4d wall=${s.wallMs / 1000.0}%6.2fs " +
        f"task=${s.taskMs / 1000.0}%7.2fs n=${s.tasks}%3d " +
        f"sr=${s.shufReadMb}%6.1fMB sw=${s.shufWriteMb}%6.1fMB  ${s.name.take(90)}")
    }
    graft.Hygiene.release(spark)
    spark.stop()
  }
}
