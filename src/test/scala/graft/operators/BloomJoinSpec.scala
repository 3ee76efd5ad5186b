package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloom pre-filtered join equals the plain join (long keys)") {
    val big = (1L to 10000L).map(i => (i % 500, s"row$i")).toDF("k", "v")
    val small = Seq(1L, 7L, 250L, 499L).toDF("k")
      .withColumn("dim", col("k") * 10)
    val expected = big.join(small, Seq("k"), "inner")
      .collect().map(_.toSeq).toSet
    val got = BloomJoin.join(big, small, "k", expectedItems = 10)
      .collect().map(_.toSeq).toSet
    assert(got == expected)
  }

  test("bloom pre-filtered join equals the plain join (string keys)") {
    val big = (1 to 5000).map(i => (s"k${i % 97}", i)).toDF("k", "v")
    val small = Seq("k3", "k42", "k96").toDF("k")
    val expected = big.join(small, Seq("k"), "left_semi")
      .collect().map(_.toSeq).toSet
    val got = BloomJoin.join(big, small, "k", expectedItems = 10,
      joinType = "left_semi").collect().map(_.toSeq).toSet
    assert(got == expected)
  }

  test("pre-filter prunes most non-matching rows, keeps all matches") {
    val big = (1L to 20000L).toDF("k")
    val small = Seq(5L, 10L, 15L).toDF("k")
    val kept = BloomJoin.preFilter(big, small, "k",
      expectedItems = 3, fpp = 0.01).count()
    // All 3 real matches survive; fpp keeps the rest near 1% of 20000.
    assert(kept >= 3 && kept < 1000, s"kept $kept")
  }

  test("outer joins are rejected (pruning would drop null-extended rows)") {
    val df = Seq(1L).toDF("k")
    intercept[IllegalArgumentException] {
      BloomJoin.join(df, df, "k", 1, joinType = "left")
    }
  }

  test("approximate sketches track exact answers (perf escape hatches)") {
    val df = (1 to 20000).map(i => (i % 100, (i % 1357).toLong, i.toDouble))
      .toDF("g", "u", "x")
    val r = df.agg(
      countDistinct("u").as("exact_d"),
      approx_count_distinct("u").as("approx_d"),
      percentile(col("x"), lit(0.5)).as("exact_p50"),
      percentile_approx(col("x"), lit(0.5), lit(1000)).as("approx_p50"))
      .collect()(0)
    val (ed, ad) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(ad - ed) / ed < 0.05, s"approx distinct $ad vs $ed")
    val (ep, ap) = (r.getDouble(2), r.getDouble(3))
    assert(math.abs(ap - ep) / ep < 0.05, s"approx p50 $ap vs $ep")
  }
}
