package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic hash sampling/splitting: reproducibility, disjointness,
  * and approximate-fraction properties.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = (1 to 2000).toDF("id")

  test("sampleByKey is deterministic and near the requested fraction") {
    val s1 = Sampling.sampleByKey(ids, "id", 0.25).collect().map(_.getInt(0)).toSet
    val s2 = Sampling.sampleByKey(ids, "id", 0.25).collect().map(_.getInt(0)).toSet
    assert(s1 == s2, "same input must give the same sample")
    assert(math.abs(s1.size - 500) < 100, s"got ${s1.size}, expected ~500")
  }

  test("nested fractions are supersets (hash thresholds are monotone)") {
    val small = Sampling.sampleByKey(ids, "id", 0.1).collect().map(_.getInt(0)).toSet
    val big = Sampling.sampleByKey(ids, "id", 0.5).collect().map(_.getInt(0)).toSet
    assert(small.subsetOf(big))
  }

  test("hashSplit is disjoint, exhaustive, and weight-proportional") {
    val out = Sampling.hashSplit(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000, "every row routed exactly once")
    assert(counts("train") > 1450 && counts("train") < 1750, counts.toString)
    assert(counts("val") > 100 && counts("val") < 300, counts.toString)
    assert(counts("test") > 100 && counts("test") < 300, counts.toString)
  }

  test("hashSplit rejects weights that do not sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(ids, "id", Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("capPerStratum keeps at most N deterministic rows per stratum") {
    val df = (1 to 100).map(i => (i, i % 3)).toDF("id", "g")
    val kept = Sampling.capPerStratum(df, "id", Seq("g"), 5)
    val counts = kept.groupBy("g").count().collect().map(_.getLong(1))
    assert(counts.forall(_ == 5))
    val again = Sampling.capPerStratum(df, "id", Seq("g"), 5)
      .collect().map(_.getInt(0)).toSet
    assert(again == kept.collect().map(_.getInt(0)).toSet)
  }

  test("tfidf ranks distinctive terms above common ones") {
    val docs = Seq(
      (1, "apple apple apple common common"),
      (2, "banana banana common common"),
      (3, "cherry common common")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidf(docs, "doc_id", "text", topN = 1)
      .collect().map(r => r.getInt(0) -> r.getString(2)).toMap
    // 'common' appears in every doc (df=3) so each doc's distinctive term wins.
    assert(top == Map(1 -> "apple", 2 -> "banana", 3 -> "cherry"))
  }

  test("editDistancePairs finds close pairs within blocks only") {
    val docs = Seq(
      (1, "en", "the quick brown fox"),
      (2, "en", "the quick brown fix"),   // dist 1 from doc 1
      (3, "de", "the quick brown fox"),   // identical text, different block
      (4, "en", "completely different words here")).toDF("doc_id", "lang", "text")
    val pairs = TextAnalysis.editDistancePairs(docs, "doc_id", "text",
        Seq(col("lang")), prefixLen = 40, maxDist = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1, 2, 1)), pairs.mkString(","))
  }
}
