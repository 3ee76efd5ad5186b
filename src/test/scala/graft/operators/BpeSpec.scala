package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real BPE: merge-table training on a corpus histogram, greedy
  * rank-ordered encoding, concatenation-exact round-trip.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower newer newer newer newer"),
    (3L, "newest newest widest"))
    .toDF("doc_id", "text")

  test("training learns the classic merge sequence deterministically") {
    val m = Bpe.train(corpus, "text", nMerges = 4)
    // histogram: low×5 lower×2 newer×4 newest×2 widest×1.
    // round-1 pair counts: (w,e) = lower×2 + newer×4 + newest×2 = 8 wins
    // over (e,r) = 6 and (l,o) = 7; the full 4-merge sequence is pinned
    // so any drift in counting/tie-break fails here.
    assert(m.nMerges == 4)
    assert(m.ranks == Map(("w", "e") -> 0, ("l", "o") -> 1,
      ("e", "we") -> 2, ("n", "ewe") -> 3), m.ranks.toString)
    // determinism: retraining yields the identical table
    assert(Bpe.train(corpus, "text", nMerges = 4).ranks == m.ranks)
  }

  test("encoding merges by rank and round-trips exactly") {
    val m = Bpe.train(corpus, "text", nMerges = 8)
    for (w <- Seq("low", "lower", "newer", "newest", "widest", "lowest",
        "news", "x", "")) {
      val toks = Bpe.encodeWord(w, m.ranks)
      assert(toks.mkString == w, s"round-trip broke for '$w': $toks")
      assert(toks.forall(_.nonEmpty))
    }
    // a word made of trained merges compresses below character count
    assert(Bpe.encodeWord("newer", m.ranks).length < 5)
    // untrained characters stay single symbols
    assert(Bpe.encodeWord("qqq", Bpe.train(corpus, "text", 2).ranks)
      .length == 3)
  }

  test("merge exhaustion stops early instead of looping") {
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val m = Bpe.train(tiny, "text", nMerges = 50)
    // only one pair exists, then the word is a single symbol: 1 merge
    assert(m.nMerges == 1 && m.ranks.head._1 == ("a", "b"))
  }

  test("withBpeStats: exact accounting, narrow plan, memo-safe") {
    val m = Bpe.train(corpus, "text", nMerges = 8)
    val stats = Bpe.withBpeStats(corpus, "doc_id", "text", m)
    val rows = stats.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1: "low low low low low" -> 5 pretokens, 15 chars
    assert(rows(1L)._1 == 5 && rows(1L)._3 == 15)
    // token count bounded by [n_pretokens, n_chars] and compresses here
    rows.values.foreach { case (pre, tok, chr) =>
      assert(tok >= pre && tok <= chr, rows.toString) }
    assert(rows(1L)._2 < rows(1L)._3)
    // per-doc totals equal a direct word-by-word encode
    val direct = corpus.collect().map { r =>
      val words = r.getString(1).split(" ").filter(_.nonEmpty)
      r.getLong(0) -> words.map(w => Bpe.encodeWord(w, m.ranks).length.toLong).sum
    }.toMap
    assert(rows.map { case (k, v) => k -> v._2 } == direct)
    // encode path adds no exchange
    val plan = stats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("heavy-hitter cap keeps rare words out of training but encodable") {
    val m = Bpe.train(corpus, "text", nMerges = 8, maxWords = 2)
    // trained only on the top-2 words; rare words still encode/round-trip
    val toks = Bpe.encodeWord("widest", m.ranks)
    assert(toks.mkString == "widest")
  }
}
