package graft.operators

import graft.{Queries, SparkSpec}

/** Bounds the approximate-percentile path (q_a15) against the exact one
  * (q_a13): at accuracy 10000 the sketch's rank error is ≤ 1/10000, so
  * on the events table every reported quantile must land within 5% of
  * the exact value — the measured guarantee that makes the approx query
  * the 100 TB substitute for the exact sort.
  */
class ApproxPercentileSpec extends SparkSpec {

  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

  test("approx percentiles within 5% of exact per event_type") {
    val exact = Queries.a13Percentiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val approx = Queries.a15ApproxPercentiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, (p50, p95)) =>
      val (a50, a95) = approx(k)
      def relErr(e: Double, a: Double): Double =
        if (e == 0.0) math.abs(a) else math.abs(a - e) / math.abs(e)
      assert(relErr(p50, a50) <= 0.05, s"$k p50 exact=$p50 approx=$a50")
      assert(relErr(p95, a95) <= 0.05, s"$k p95 exact=$p95 approx=$a95")
    }
  }
}
