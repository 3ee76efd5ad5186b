package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "en", 10L), (2L, "en", 10L), (3L, "en", 10L), // class of 3
    (4L, "de", 10L), (5L, "de", 10L),                  // class of 2
    (6L, "fr", 99L)                                    // singleton
  ).toDF("id", "lang", "b")

  test("kAnonymityReport counts classes and flags those below k") {
    val rep = Privacy.kAnonymityReport(df, Seq("lang", "b"), k = 3)
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(rep(("en", 10L)) == ((3L, false)))
    assert(rep(("de", 10L)) == ((2L, true)))
    assert(rep(("fr", 99L)) == ((1L, true)))
  }

  test("suppress releases only rows in classes of size >= k") {
    val out = Privacy.suppress(df, Seq("lang", "b"), k = 3)
    assert(out.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(out.columns.toSeq == Seq("id", "lang", "b")) // original shape
    // generalizing widens classes: bucket 10 and 99 both fold to 0
    val gen = df.withColumn("b", Privacy.widthBucket(col("b"), 100L))
    assert(Privacy.suppress(gen, Seq("b"), k = 6).count() == 6)
  }

  test("guards: k >= 2, width >= 1, nonempty quasi set") {
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityReport(df, Seq("lang"), k = 1)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityReport(df, Seq.empty, k = 3)
    }
    intercept[IllegalArgumentException] { Privacy.widthBucket(col("b"), 0) }
  }
}
