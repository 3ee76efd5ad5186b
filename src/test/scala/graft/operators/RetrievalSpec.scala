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
}
