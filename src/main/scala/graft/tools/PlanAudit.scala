package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: print formatted physical plans for registered queries and a
  * one-line summary of scale signals — parquet filter pushdown, pruned
  * read schema, broadcast joins, whole-stage codegen coverage.
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir] [queryName...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.tail.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val verbose = sys.env.contains("PLAN_AUDIT_VERBOSE")
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val pushed = plan.linesIterator
          .filter(_.trim.startsWith("PushedFilters:")).map(_.trim).toSeq
        val readSchema = plan.linesIterator
          .filter(_.trim.startsWith("ReadSchema:")).map(_.trim.take(120)).toSeq
        val nBroadcast = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
        val nSortMerge = plan.linesIterator.count(_.contains("SortMergeJoin"))
        val nBnl = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
        val nWscg = plan.linesIterator.count(_.contains("WholeStageCodegen"))
        val nExchange = plan.linesIterator.count(_.trim.startsWith("Exchange"))
        println(s"== $n  bhj=$nBroadcast smj=$nSortMerge bnl=$nBnl " +
          s"wscg=$nWscg exchange=$nExchange")
        pushed.take(3).foreach(p => println(s"   $p"))
        readSchema.take(3).foreach(r => println(s"   $r"))
        if (verbose) println(plan)
      } catch {
        case e: Throwable => println(s"== $n  ERROR ${e.getMessage.take(100)}")
      }
    }
    spark.stop()
  }
}
