package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rank-list fusion for hybrid retrieval — the step a data-selection
  * pipeline runs after its lexical (BM25, [[TextAnalysis.bm25TopK]]) and
  * dense (ANN, [[Similarity.bruteForceTopK]]/`ivfTopK`) legs each produce
  * a per-query ranking: combine them into one list without having to
  * calibrate the two incomparable score scales against each other.
  *
  * Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
  * each source contributes `1 / (k0 + rank)`; documents found by several
  * sources near the top dominate. The reference exposes retrieval only
  * as single-source SQL ranking (ORDER BY relevance LIMIT k —
  * internal/query/executor.go:131); fusion is part of the added
  * training-data-curation surface, kept in the same deterministic-integer
  * discipline as the rest of the engine: the contribution is
  * `scale div (k0 + rank)` in int64, so fused scores and the fused
  * ranking replay bit-for-bit in any engine — no cross-engine float
  * summation anywhere.
  *
  * Plan shape (the 100 TB story): the inputs are ALREADY top-k lists —
  * `n_queries × k × n_sources` rows, tiny by construction regardless of
  * corpus size — so fusion is one narrow partial-agg shuffle keyed on
  * (query, doc) plus a per-query window over ≤ `n_sources · k` rows.
  * All the heavy lifting stays in the legs, which carry their own scale
  * designs; fusion adds no scan of anything corpus-sized.
  */
object Retrieval {

  /** Default RRF constant from the paper; 60 dampens the head so that
    * deep-but-consistent hits can beat a single rank-1 outlier.
    */
  val DefaultK0 = 60

  /** Integer scale for the reciprocal contributions. 10^9 keeps three
    * significant digits at rank ~1000 while `n_sources · scale` stays
    * 10^5 × inside int64.
    */
  val RrfScale = 1000000000L

  /** Fuse per-source rankings into one top-`k` list per query.
    *
    * @param rankings (query_id, id, rank, source) — `rank` is 1-based
    *                 within (query_id, source); duplicate (query, source,
    *                 doc) rows are invalid input and are guarded against
    *                 by counting per-source contributions.
    * @return (query_id, rank, id, rrf_score, n_sources) — fused rank
    *         1-based by (rrf_score desc, id asc); ties on the integer
    *         score break deterministically on the doc id.
    */
  def rrfFuse(rankings: DataFrame, k: Int, k0: Int = DefaultK0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val contrib: Column = expr(s"${RrfScale}L div (${k0}L + rank)")
    val fused = rankings
      .select(col("query_id"), col("id"), contrib.as("contrib"),
        col("source"))
      .groupBy("query_id", "id")
      .agg(sum("contrib").as("rrf_score"),
        count(lit(1)).as("n_sources"),
        countDistinct("source").as("n_distinct_sources"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_score").desc, col("id").asc)
    fused
      // a source emitting the same doc twice for one query would double
      // its vote; surface it as a hard error rather than a silent boost.
      // assert_true lives in a filter so column pruning cannot elide it.
      .filter(assert_true(col("n_sources") === col("n_distinct_sources"),
        concat(lit("duplicate (query,source,doc) vote for query="),
          col("query_id").cast("string"), lit(" id="),
          col("id").cast("string"))).isNull)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("bigint").as("rank"),
        col("id"), col("rrf_score"), col("n_sources"))
  }
}
