package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bigram-LM quality scoring (CCNet-shaped): model determinism, integer
  * coverage stats, and the stupid-backoff log-prob math the DuckDB
  * oracle cannot check (libm log() is not bit-contracted across
  * engines).
  */
class LmSpec extends SparkSpec {
  import spark.implicits._

  // Corpus: "a b" dominates; "z" appears once (falls out of a 3-token
  // vocab); doc 4 is pure OOV; doc 5 is a single token (no bigrams);
  // doc 6 is empty.
  private val docs = Seq(
    (1L, "a b a b a b"),
    (2L, "a b c"),
    (3L, "c a b"),
    (4L, "z z"),
    (5L, "a"),
    (6L, "")).toDF("doc_id", "text")

  private def lm3 = TextAnalysis.bigramLm(docs, "text",
    vocabSize = 3, maxBigrams = 2)

  test("bigramLm keeps top-V unigrams and top-B in-vocab bigrams, deterministic tie-breaks") {
    val lm = lm3
    // counts: a=6, b=5, c=2, z=2 — vocab of 3 keeps a,b and breaks the
    // c/z tie by token asc -> c.
    val uni = lm.unigrams.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni == Map("a" -> 6L, "b" -> 5L, "c" -> 2L))
    assert(lm.totalTokens == 15L)
    // in-vocab pairs: (a,b)=5, (b,a)=2, (b,c)=1, (c,a)=1 — top 2 kept.
    val big = lm.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(big == Map(("a", "b") -> 5L, ("b", "a") -> 2L))
  }

  test("lmScore integer coverage stats are exact") {
    val got = TextAnalysis.lmScore(docs, "doc_id", "text", lm3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got(1L) == ((6L, 0L, 5L, 5L))) // ababab: all pairs are (a,b)/(b,a)
    assert(got(2L) == ((3L, 0L, 2L, 1L))) // ab hit, bc pruned from LM
    assert(got(3L) == ((3L, 0L, 2L, 1L))) // ca pruned, ab hit
    assert(got(4L) == ((2L, 2L, 1L, 0L))) // z is OOV
    assert(got(5L) == ((1L, 0L, 0L, 0L)))
    assert(got(6L) == ((0L, 0L, 0L, 0L)))
  }

  test("stupid-backoff log-prob and perplexity math") {
    val lm = lm3
    val rows = TextAnalysis.lmScore(docs, "doc_id", "text", lm).collect()
      .map(r => r.getLong(0) -> r).toMap
    val n = lm.totalTokens.toDouble
    // doc 2 "a b c": (a,b) hit -> ln(5/6); (b,c) miss, c in vocab ->
    // ln(0.4 * 2 / N). Mean over 2 bigrams.
    val exp2 = (math.log(5.0 / 6.0) + math.log(0.4 * 2.0 / n)) / 2.0
    assert(math.abs(rows(2L).getAs[Double]("lm_logprob") - exp2) < 1e-12)
    assert(math.abs(rows(2L).getAs[Double]("lm_ppl") - math.exp(-exp2)) < 1e-12)
    // doc 4 "z z": (z,z) miss, z OOV -> ln(0.4 / N).
    val exp4 = math.log(0.4 / n)
    assert(math.abs(rows(4L).getAs[Double]("lm_logprob") - exp4) < 1e-12)
    // higher-likelihood text scores higher (doc 1 is pure in-model)
    assert(rows(1L).getAs[Double]("lm_logprob") > rows(4L).getAs[Double]("lm_logprob"))
    // no bigrams -> null score, not NaN
    assert(rows(5L).isNullAt(rows(5L).fieldIndex("lm_logprob")))
    assert(rows(6L).isNullAt(rows(6L).fieldIndex("lm_logprob")))
  }

  test("model lookups broadcast: no shuffle joins in the scoring plan") {
    val plan = TextAnalysis.lmScore(docs, "doc_id", "text", lm3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
