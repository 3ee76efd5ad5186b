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

  /** Hard-negative mining for contrastive training: for each query
    * (anchor embedding + its label), the top-k most-similar vectors whose
    * label DIFFERS — the near-miss negatives that make a contrastive
    * batch informative (easy random negatives teach nothing). Same
    * broadcast-queries × corpus-scan plan as brute-force top-k with the
    * label inequality pushed below the ranking window; similarity is the
    * engine's round-6 cosine, so every emitted row replays exactly.
    *
    * @param queries (query_id, qvec, qlabel)
    * @return (query_id, rank, id, neg_label, cosine_sim)
    */
  def hardNegativeTopK(vectors: DataFrame, idCol: String, vecCol: String,
      labelCol: String, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = vectors.sparkSession
    Similarity.init(spark)
    val v = vectors.select(col(idCol).cast("bigint").as("id"),
      col(vecCol).as("vec"), col(labelCol).cast("bigint").as("neg_label"),
      Similarity.norm(col(vecCol)).as("nrm"))
    val q = queries.select(col("query_id").cast("bigint").as("query_id"),
      col("qvec"), col("qlabel").cast("bigint").as("qlabel"),
      Similarity.norm(col("qvec")).as("qnrm"))
    val d = col("nrm") * col("qnrm")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine_sim").desc, col("id").asc)
    v.crossJoin(broadcast(q))
      .filter(col("neg_label") =!= col("qlabel"))
      .withColumn("cosine_sim", round(when(d === 0, lit(0.0))
        .otherwise(Similarity.dot(col("vec"), col("qvec")) / d), 6))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id", "neg_label", "cosine_sim")
  }

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein, SIGIR
    * 1998) of a per-query candidate head: greedily pick k items maximizing
    * `λ·relevance − (1−λ)·max-similarity-to-already-picked` — the
    * diversity step a curation pipeline runs so its selected training
    * docs aren't k near-copies of the single best hit.
    *
    * Determinism: relevance is rank-based (`(nCand − rank + 1) / nCand`),
    * similarity is the engine's round-6 cosine (the q_s1 idiom), and the
    * combination uses only IEEE `+ − × /` in a fixed operation order —
    * bit-reproducible in any IEEE engine, so an oracle can unroll the
    * greedy steps in SQL and match scores exactly. Ties break to the
    * lowest id.
    *
    * Plan shape (the 100 TB story): candidate generation (the corpus-
    * sized work) happens upstream in the ANN/BM25 legs; MMR itself runs
    * on the bounded head — `queries × nCand` rows and `queries × nCand²`
    * pairwise sims, both collected to the driver (the same bounded-
    * serving-path pattern as the IVF probe-cell set). The greedy loop is
    * inherently sequential in k; distributing it would serialize on the
    * same dependency anyway.
    *
    * @param ranked  (query_id, id, rank) — rank 1-based; rows with
    *                rank > nCand are ignored.
    * @param vectors (idCol, vecCol) — embeddings for the similarity term.
    * @return (query_id, pick, id, mmr_score): pick 1..k in selection
    *         order; the first pick's score is pure λ-scaled relevance.
    */
  def mmrSelect(ranked: DataFrame, vectors: DataFrame, idCol: String,
      vecCol: String, k: Int, nCand: Int, lambdaPct: Int = 70): DataFrame = {
    require(k >= 1 && nCand >= k, s"need nCand >= k >= 1, got k=$k nCand=$nCand")
    require(lambdaPct >= 0 && lambdaPct <= 100, s"lambdaPct: $lambdaPct")
    val spark = vectors.sparkSession
    Similarity.init(spark)
    import spark.implicits._
    val lam = lambdaPct / 100.0
    val mu = (100 - lambdaPct) / 100.0
    // cached: the head feeds TWO bounded collects (pairs and ranks) and
    // upstream may be a whole retrieval pipeline worth recomputing once
    val cand = ranked.filter(col("rank") <= nCand)
      .join(vectors.select(col(idCol).cast("bigint").as("id"),
        col(vecCol).as("_v")), "id")
      .select(col("query_id").cast("bigint"), col("id"),
        col("rank").cast("bigint"), col("_v"),
        Similarity.norm(col("_v")).as("_n"))
      .cache()
    val a = cand.select(col("query_id"), col("id").as("ia"),
      col("_v").as("va"), col("_n").as("na"))
    val b = cand.select(col("query_id"), col("id").as("ib"),
      col("_v").as("vb"), col("_n").as("nb"))
    val d = col("na") * col("nb")
    val pairs = a.join(b, "query_id")
      .select(col("query_id"), col("ia"), col("ib"),
        round(when(d === 0, lit(0.0))
          .otherwise(Similarity.dot(col("va"), col("vb")) / d), 6).as("sim"))
      .collect() // bounded: queries × nCand² rows
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3))
      .toMap
    val heads = cand.select(col("query_id"), col("id"), col("rank"))
      .collect() // bounded: queries × nCand rows
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val picks = heads.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      val rel = rows.map { case (_, id, rank) =>
        id -> lam * ((nCand - rank + 1).toDouble / nCand)
      }.toMap
      var selected = Vector.empty[Long]
      var remaining = rows.map(_._2).sorted.toVector
      (1 to k).flatMap { pick =>
        if (remaining.isEmpty) None
        else {
          val (bestId, bestScore) = remaining.map { id =>
            val s =
              if (selected.isEmpty) rel(id)
              else rel(id) -
                mu * selected.map(sid => pairs((qid, id, sid))).max
            (id, s)
          }.maxBy { case (id, s) => (s, -id) } // ties -> lowest id
          selected :+= bestId
          remaining = remaining.filterNot(_ == bestId)
          Some((qid, pick.toLong, bestId, bestScore))
        }
      }
    }
    picks.toDF("query_id", "pick", "id", "mmr_score")
      .orderBy("query_id", "pick")
  }

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

  /** Rank-list evaluation — the ANN/retrieval quality report: per query,
    * how many of the SYSTEM ranking's ids appear in the exact TRUTH set
    * (`hits_at_k`, the recall@k numerator), the system rank of the first
    * relevant id (`first_hit_rank`, the MRR denominator; NULL when the
    * system missed everything), and the emitted system-row count
    * (`n_system`, the completeness guard). Deliberately integer-only —
    * recall/MRR averages divide these exact longs downstream, so the
    * report itself never carries an accumulation-order-dependent float.
    *
    * 100 TB shape: both inputs are top-k frames (k × query-count rows,
    * already reduced by their rankers) — truth broadcasts, the join
    * never shuffles the corpus.
    */
  def rankEval(truth: DataFrame, truthIdCol: String, system: DataFrame,
      sysIdCol: String, sysRankCol: String,
      queryCol: String = "query_id"): DataFrame = {
    val t = truth.select(col(queryCol).as("tquery"),
      col(truthIdCol).as("tid"))
    val sys = system.select(col(queryCol).as("query_id"),
      col(sysIdCol).as("sid"), col(sysRankCol).cast("bigint").as("srank"))
    sys
      .join(broadcast(t),
        col("query_id") === col("tquery") && col("sid") === col("tid"),
        "left")
      .groupBy("query_id")
      .agg(sum(when(col("tid").isNotNull, 1L).otherwise(0L)).as("hits_at_k"),
        min(when(col("tid").isNotNull, col("srank"))).as("first_hit_rank"),
        count(lit(1)).as("n_system"))
  }
}
