package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mergeable HLL distinct sketches: estimate accuracy and — the property
  * that makes them the 100 TB pattern — build-once/union-later equals
  * build-over-everything.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = (1 to 5000)
    .map(i => (s"v${i % 1200}", s"g${i % 4}")).toDF("v", "g")

  test("per-group estimates land within HLL error of exact") {
    val est = Sketches.estimate(
        Sketches.distinctSketch(rows, Seq("g"), col("v")))
      .select("g", "est_distinct")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy("g").agg(countDistinct("v").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, c) =>
      assert(math.abs(est(g) - c).toDouble / c < 0.05,
        s"group $g: est=${est(g)} exact=$c")
    }
  }

  test("union of per-group sketches matches the single overall sketch") {
    // Build per-group sketches, union them — the estimate must stay
    // inside the same HLL error envelope as one sketch built over the
    // whole frame (the DataSketches union path may move the estimate a
    // few counts — e.g. 1197 vs 1200 here — but never outside the bound).
    val viaUnion = Sketches.unionEstimate(
        Sketches.distinctSketch(rows, Seq("g"), col("v")))
      .collect()(0).getLong(0)
    val direct = Sketches.estimate(
        Sketches.distinctSketch(rows.withColumn("one", lit(1)), Seq("one"), col("v")))
      .collect()(0).getAs[Long]("est_distinct")
    val exact = rows.agg(countDistinct("v")).collect()(0).getLong(0)
    assert(math.abs(viaUnion - exact).toDouble / exact < 0.05,
      s"union=$viaUnion exact=$exact")
    assert(math.abs(viaUnion - direct).toDouble / exact < 0.02,
      s"union=$viaUnion direct=$direct")
  }
}
