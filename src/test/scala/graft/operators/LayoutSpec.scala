package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue2 interleaves bits exactly") {
    val rows = Seq((5L, 3L), (0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L))
      .toDF("x", "y")
      .select(Layout.zValue2(col("x"), col("y"), 16).as("z"))
      .as[Long].collect().toSeq
    // x=101b at even positions (1+16), y=011b at odd (2+8) => 27
    assert(rows == Seq(27L, 0L, 1L, 2L, (1L << 32) - 1))
  }

  test("zorder partitions are tight on BOTH dimensions; x-sort is not") {
    // 64x64 grid; 16 partitions => each ~a 16x16 z-quadrant (maybe
    // straddling a boundary), so per-partition spans on x AND y stay well
    // below the 63-wide domain. Range-partitioning on x alone leaves the
    // full y domain in every partition — the pruning failure z-order fixes.
    val grid = spark.range(64 * 64)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    def spans(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
        .select("xs", "ys").as[(Long, Long)].collect().toSeq
    val zs = spans(Layout.zorderPartitions(grid, col("x"), col("y"),
      bits = 6, numPartitions = 16))
    assert(zs.nonEmpty && zs.forall { case (xs, ys) => xs <= 32 && ys <= 32 },
      s"z-order spans too wide: $zs")
    val xsorted = spans(grid.repartitionByRange(16, col("x")))
    assert(xsorted.exists(_._2 == 63),
      "x-sorted control should leave the full y domain in some partition")
  }

  test("zValueN interleaves three dimensions exactly") {
    // x=1 (bit0 -> out bit 0), y=1 (bit0 -> out bit 1), z=1 (bit0 -> out
    // bit 2) => 7; x=2 (bit1 -> out bit 3) alone => 8.
    val rows = Seq((1L, 1L, 1L), (2L, 0L, 0L), (0L, 2L, 0L), (0L, 0L, 2L))
      .toDF("x", "y", "z")
      .select(Layout.zValueN(Seq(col("x"), col("y"), col("z")), 4).as("v"))
      .as[Long].collect().toSeq
    assert(rows == Seq(7L, 8L, 16L, 32L), rows)
  }

  test("z-value stays a codegen expression (no UDF)") {
    val df = spark.range(10).select(
      Layout.zValue2(col("id"), col("id") + 1, 8).as("z"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
    df.collect()
  }
}
