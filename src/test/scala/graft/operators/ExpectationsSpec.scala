package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations.Rule

  private def df = Seq(
    (1L, Some(10L), "en"),   // all pass
    (2L, Some(500L), "en"),  // fails range
    (3L, None, "en"),        // NULL -> fails range (the SQL trap)
    (4L, Some(20L), "zz"),   // fails lang
    (5L, Some(999L), "zz")   // fails both
  ).toDF("id", "n", "lang")

  private val rules = Seq(
    Rule("in_range", col("n") <= 300),
    Rule("known_lang", col("lang").isin("en", "de")))

  test("annotate flags every rule; NULL predicate is a failure") {
    val ann = Expectations.annotate(df, rules)
      .select($"id", $"ok_in_range", $"ok_known_lang", $"_valid")
      .as[(Long, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(ann(1L) == ((true, true, true)))
    assert(ann(2L) == ((false, true, false)))
    assert(ann(3L) == ((false, true, false))) // NULL n -> failed, not null
    assert(ann(4L) == ((true, false, false)))
    assert(ann(5L) == ((false, false, false)))
  }

  test("split quarantines with violated rule names, keeps originals clean") {
    val (valid, quar) = Expectations.split(df, rules)
    assert(valid.columns.toSeq == Seq("id", "n", "lang"))
    assert(valid.select("id").as[Long].collect().toSet == Set(1L))
    val q = quar.select($"id", $"_failed").as[(Long, Seq[String])]
      .collect().toMap
    assert(q(2L) == Seq("in_range"))
    assert(q(4L) == Seq("known_lang"))
    assert(q(5L) == Seq("in_range", "known_lang")) // declaration order
  }

  test("metrics: one row per rule, exact counts, IEEE rate") {
    val m = Expectations.metrics(df, rules)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m("in_range") == ((2L, 3L, 0.6)))
    assert(m("known_lang") == ((3L, 2L, 0.4)))
  }

  test("duplicate rule names rejected") {
    intercept[IllegalArgumentException] {
      Expectations.annotate(df, Seq(Rule("r", lit(true)), Rule("r", lit(false))))
    }
  }
}
