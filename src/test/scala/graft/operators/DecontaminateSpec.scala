package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Benchmark decontamination: planted n-gram leakage is caught (with the
  * exact distinct shared-gram count), unrelated docs survive, `clean`
  * drops exactly the flagged ids, and the corpus side never shuffles
  * (benchmark grams broadcast).
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // bench doc b1 is 10 words => three 8-grams; t1 copies its full text
  // (all 3 grams shared), t2 copies an 8-word span (1 gram), t3 is clean.
  private val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private lazy val bench = Seq((100L, benchText)).toDF("doc_id", "text")
  private lazy val train = Seq(
    (1L, benchText),
    (2L, "xx " + benchText.split(" ").take(8).mkString(" ") + " yy"),
    (3L, "totally unrelated words that never appeared in the benchmark set"))
    .toDF("doc_id", "text")

  test("planted leakage flagged with exact shared-gram counts") {
    val pairs = Decontaminate.contaminatedPairs(
        train, "doc_id", "text", bench, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs == Map((1L, 100L) -> 3L, (2L, 100L) -> 1L))
  }

  test("minShared raises the flag threshold") {
    val pairs = Decontaminate.contaminatedPairs(
        train, "doc_id", "text", bench, "doc_id", "text", n = 8, minShared = 2L)
      .select("train_id").as[Long].collect().toSet
    assert(pairs == Set(1L))
  }

  test("clean drops exactly the flagged docs") {
    val kept = Decontaminate.clean(
        train, "doc_id", "text", bench, "doc_id", "text", n = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L))
  }

  test("corpus side joins by broadcast (no shuffle of the train grams)") {
    val df = Decontaminate.contaminatedPairs(
      train, "doc_id", "text", bench, "doc_id", "text", n = 8)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("fuzzy: near-dup of a bench doc is flagged, clean doc is not") {
    val editedCopy = benchText.replace("kappa", "lambda") // light edit
    val ftrain = Seq(
      (1L, benchText),           // identical -> jaccard 1, certain hit
      (2L, editedCopy),          // near dup -> high jaccard
      (3L, "totally unrelated words that never appeared in the benchmark set"))
      .toDF("doc_id", "text")
    val out = Decontaminate.fuzzyContaminatedPairs(
        ftrain, "doc_id", "text", bench, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 100L)) == 1.0)
    assert(out.get((2L, 100L)).exists(j => j > 0.5 && j < 1.0),
      s"edited copy should clear 0.5: $out")
    assert(!out.keySet.exists(_._1 == 3L), "clean doc flagged")
  }

  test("fuzzy: bench side broadcasts; corpus never sort-merge-joins") {
    val df = Decontaminate.fuzzyContaminatedPairs(
      train, "doc_id", "text", bench, "doc_id", "text", threshold = 0.5)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
