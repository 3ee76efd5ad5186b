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

  // Canonical xy2d (the published top-down Hilbert transform) as the
  // independent oracle for hilbertValue2 — note it rotates within the
  // CURRENT quadrant (s-1-x) then swaps, a different formulation from
  // the operator's full-grid reflect; agreement over the whole grid is
  // therefore a real cross-check, not the same code twice.
  private def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbertValue2 matches canonical xy2d over a full 16x16 grid") {
    val bits = 4
    val grid = spark.range(16L * 16)
      .select((col("id") % 16).as("x"), (col("id") / 16).cast("long").as("y"))
    val got = Layout.hilbertValue2(grid, col("x"), col("y"), bits, "h")
      .select("x", "y", "h").as[(Long, Long, Long)].collect()
    assert(got.length == 256)
    got.foreach { case (x, y, h) =>
      assert(h == xy2d(bits, x, y), s"($x,$y): got $h want ${xy2d(bits, x, y)}")
    }
    // bijective onto [0, 256)
    assert(got.map(_._3).sorted.toSeq == (0L until 256L))
  }

  test("consecutive Hilbert codes are always grid neighbors (Z is not)") {
    // THE Hilbert property Z-order lacks: walking the curve in code order
    // never jumps — every step is Manhattan distance 1. The same walk on
    // the Morton code takes seam jumps (distance > 1), which is exactly
    // the locality gap that makes Hilbert range-partitions tighter.
    val grid = spark.range(32L * 32)
      .select((col("id") % 32).as("x"), (col("id") / 32).cast("long").as("y"))
    val byH = Layout.hilbertValue2(grid, col("x"), col("y"), 5, "h")
      .select("h", "x", "y").as[(Long, Long, Long)].collect()
      .sortBy(_._1).map { case (_, x, y) => (x, y) }
    val hSteps = byH.sliding(2).map { case Array((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) }.toSeq
    assert(hSteps.forall(_ == 1), s"non-unit Hilbert steps: ${hSteps.max}")
    val byZ = grid.select(Layout.zValue2(col("x"), col("y"), 5).as("z"),
        col("x"), col("y")).as[(Long, Long, Long)].collect()
      .sortBy(_._1).map { case (_, x, y) => (x, y) }
    val zMax = byZ.sliding(2).map { case Array((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) }.max
    assert(zMax > 1, "control: Morton order should take seam jumps")
  }

  test("hilbertPartitions are tight on BOTH dimensions") {
    val grid = spark.range(64 * 64)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val spans = Layout.hilbertPartitions(grid, col("x"), col("y"),
        bits = 6, numPartitions = 16)
      .withColumn("p", spark_partition_id())
      .groupBy("p")
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .select("xs", "ys").as[(Long, Long)].collect().toSeq
    assert(spans.nonEmpty && spans.forall { case (xs, ys) =>
      xs <= 32 && ys <= 32 }, s"hilbert spans too wide: $spans")
  }

  test("hilbertSqlChain levels mirror the Column chain shape") {
    // The oracle generator and the operator share constants per level:
    // spot-check the emitted SQL carries every level's s² coefficient and
    // the full-grid reflect constant (n-1), so a drift in either half of
    // the pair can't silently survive.
    val sql = Layout.hilbertSqlChain(4, "x", "y", "pts", "hv")
    for (lvl <- 0 until 4) {
      val s = 1L << lvl
      assert(sql.contains(s"${s * s} * xor"), s"missing level s^2=${s * s}")
    }
    assert(sql.contains("15 - y") && sql.contains("15 - x"))
    assert(sql.contains("AS hv"))
  }

  test("z-value stays a codegen expression (no UDF)") {
    val df = spark.range(10).select(
      Layout.zValue2(col("id"), col("id") + 1, 8).as("z"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
    df.collect()
  }
}
