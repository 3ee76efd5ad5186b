package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def rankings(rows: (Long, Long, Long, String)*) =
    rows.toDF("query_id", "id", "rank", "source")

  test("rrfFuse matches hand-computed integer RRF scores and ordering") {
    // query 0: doc 7 is rank 1 lexical + rank 2 dense; doc 5 rank 1 dense
    // only; doc 9 rank 2 lexical only.
    val in = rankings(
      (0L, 7L, 1L, "lexical"), (0L, 9L, 2L, "lexical"),
      (0L, 5L, 1L, "dense"), (0L, 7L, 2L, "dense"))
    val out = Retrieval.rrfFuse(in, k = 10)
      .orderBy("query_id", "rank")
      .select("rank", "id", "rrf_score", "n_sources")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val s = Retrieval.RrfScale
    val c1 = s / 61; val c2 = s / 62 // contributions at ranks 1 and 2
    assert(out === Seq(
      (1L, 7L, c1 + c2, 2L), // both sources -> dominates
      (2L, 5L, c1, 1L),      // single rank-1 beats single rank-2
      (3L, 9L, c2, 1L)))
  }

  test("score ties break on id ascending, deterministically") {
    val in = rankings((1L, 30L, 1L, "a"), (1L, 10L, 1L, "b"))
    val out = Retrieval.rrfFuse(in, k = 2)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    assert(out === Seq(10L, 30L))
  }

  test("k truncates per query, not globally") {
    val in = rankings(
      (0L, 1L, 1L, "a"), (0L, 2L, 2L, "a"), (0L, 3L, 3L, "a"),
      (1L, 4L, 1L, "a"))
    val out = Retrieval.rrfFuse(in, k = 2)
    assert(out.count() === 3) // 2 for query 0 + 1 for query 1
    assert(out.filter(col("query_id") === 0).count() === 2)
  }

  test("a duplicate (query, source, doc) vote is a hard error") {
    val in = rankings((0L, 7L, 1L, "lexical"), (0L, 7L, 3L, "lexical"))
    val e = intercept[Exception] {
      Retrieval.rrfFuse(in, k = 10).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("duplicate")))
  }

  test("the same doc from two sources is fine and counted once per source") {
    val in = rankings((0L, 7L, 1L, "lexical"), (0L, 7L, 1L, "dense"))
    val out = Retrieval.rrfFuse(in, k = 10)
      .select("n_sources").as[Long].collect().toSeq
    assert(out === Seq(2L))
  }

  // --- MMR ---------------------------------------------------------------

  /** 4 candidates in 2D: ids 1/2 nearly identical direction, 3 orthogonal,
    * 4 opposite. Ranked 1,2,3,4.
    */
  private def mmrFixture = {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.999f, 0.01f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(-1.0f, 0.0f)))
      .toDF("vid", "emb")
    val ranked = Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L), (0L, 4L, 4L))
      .toDF("query_id", "id", "rank")
    (ranked, vecs)
  }

  test("mmrSelect prefers diversity over a redundant higher-ranked item") {
    val (ranked, vecs) = mmrFixture
    val picks = Retrieval.mmrSelect(ranked, vecs, "vid", "emb",
        k = 3, nCand = 4)
      .select("pick", "id").as[(Long, Long)].collect().toSeq
    // pick 1 = rank 1 (pure relevance). pick 2: id 2 is nearly identical
    // to id 1 (sim ~1) so its score collapses to 0.225; id 4's OPPOSITE
    // direction earns a diversity bonus (0.175 − 0.3·(−1) = 0.475) that
    // beats orthogonal id 3 (0.35). pick 3: id 3 (0.35, max-sim 0) beats
    // the near-duplicate id 2 (0.225).
    assert(picks === Seq((1L, 1L), (2L, 4L), (3L, 3L)))
  }

  test("mmrSelect with lambda = 100 is pure relevance order") {
    val (ranked, vecs) = mmrFixture
    val picks = Retrieval.mmrSelect(ranked, vecs, "vid", "emb",
        k = 4, nCand = 4, lambdaPct = 100)
      .select("pick", "id").as[(Long, Long)].collect().toSeq
    assert(picks === Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)))
  }

  test("hardNegativeTopK never returns the anchor's own label") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.9f, 0.1f), 0),
      (3L, Seq(0.8f, 0.2f), 1), (4L, Seq(0.0f, 1.0f), 1),
      (5L, Seq(-1.0f, 0.0f), 2))
      .toDF("vid", "emb", "lab")
    val q = Seq((1L, Seq(1.0f, 0.0f), 0)).toDF("query_id", "qvec", "qlabel")
    val out = Retrieval.hardNegativeTopK(vecs, "vid", "emb", "lab", q, k = 3)
      .select("rank", "id", "neg_label").as[(Long, Long, Long)]
      .collect().toSeq
    // same-label 1 and 2 excluded; 3 (closest different-label) leads
    assert(out.map(_._2) === Seq(3L, 4L, 5L))
    assert(out.forall(_._3 != 0L))
  }

  test("mmrSelect first pick score is the pure scaled relevance") {
    val (ranked, vecs) = mmrFixture
    val s = Retrieval.mmrSelect(ranked, vecs, "vid", "emb", k = 1, nCand = 4)
      .select("mmr_score").as[Double].first()
    assert(s === 0.7 * (4.0 / 4)) // rank 1 of nCand 4
  }

  test("rankEval: hits, first-relevant rank, and the row-count guard") {
    val truth = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 1L))
      .toDF("query_id", "id")
    val system = Seq(
      (0L, 5L, 1L), (0L, 2L, 2L), (0L, 3L, 3L), // first relevant at rank 2
      (1L, 9L, 1L), (1L, 8L, 2L))               // total miss
      .toDF("query_id", "vec_id", "rank")
    val out = Retrieval.rankEval(truth, "id", system, "vec_id", "rank")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
          r.getLong(3)))).toMap
    assert(out(0L) == ((2L, Some(2L), 3L)))
    assert(out(1L) == ((0L, None, 2L)))
  }
}
