package graft.operators

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "hash hash table"), // len 3, tf(hash)=2
    (2L, "hash"),            // len 1, tf(hash)=1
    (3L, "scan vector"))     // len 2, tf(vector)=1
    .toDF("doc_id", "text")

  test("scores match the hand-computed integer arithmetic exactly") {
    // n_docs=3 tot=6 avgdl=2; df(hash)=2 idf=(2*1e6)div 3=666666;
    // df(vector)=1 idf=(3*1e6)div 2=1500000
    // d1: (666666*2*88*2) div (40*2*2+12*2+36*3=292) = 803652
    // d2: (666666*1*88*2) div (80+24+36=140)        = 838094
    // d3: (1500000*1*88*2) div (80+24+72=176)       = 1500000
    val out = TextAnalysis.bm25TopK(corpus, "doc_id", "text",
      Seq("hash", "vector"), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((3L, 1500000L, 1L), (2L, 838094L, 1L),
      (1L, 803652L, 1L)))
  }

  test("shorter documents outrank longer ones at equal raw tf (length normalization)") {
    val df = Seq((1L, "x y z w q r s t u v"), (2L, "x y"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(df, "doc_id", "text", Seq("x"), 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(2L, 1L))
  }

  test("terms absent from the corpus contribute nothing; all-absent yields empty") {
    val out = TextAnalysis.bm25TopK(corpus, "doc_id", "text",
      Seq("zzz", "qqq"), 10)
    assert(out.count() == 0)
    val mixed = TextAnalysis.bm25TopK(corpus, "doc_id", "text",
      Seq("vector", "zzz"), 10).as[(Long, Long, Long)].collect().toSeq
    assert(mixed.map(_._1) == Seq(3L) && mixed.head._3 == 1L)
  }

  test("score ties break on doc_id ascending") {
    val df = Seq((2L, "a b"), (1L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(df, "doc_id", "text", Seq("a"), 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L))
  }

  test("bm25TopKMulti is bit-identical to per-query bm25TopK calls") {
    val queries = Seq(0 -> Seq("hash"), 1 -> Seq("vector", "scan"),
      2 -> Seq("hash", "vector")) // overlapping terms across queries
    val multi = TextAnalysis.bm25TopKMulti(corpus, "doc_id", "text",
        queries, k = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val single = queries.flatMap { case (qid, terms) =>
      TextAnalysis.bm25TopK(corpus, "doc_id", "text", terms, k = 10)
        .as[(Long, Long, Long)].collect().toSeq.zipWithIndex
        .map { case ((id, score, nt), i) =>
          (qid.toLong, id, i + 1L, score, nt) }
    }.sorted
    assert(multi == single)
  }

  test("bm25TopKMulti: a query whose terms are all absent emits no rows") {
    val out = TextAnalysis.bm25TopKMulti(corpus, "doc_id", "text",
      Seq(0 -> Seq("zzz"), 1 -> Seq("hash")), k = 10)
    assert(out.filter("query_id = 0").count() == 0)
    assert(out.filter("query_id = 1").count() == 2) // docs 1 and 2 contain "hash"
  }

  test("plan: no sort-merge join, corpus stats broadcast, top-k take-ordered") {
    val plan = TextAnalysis.bm25TopK(corpus, "doc_id", "text",
      Seq("hash", "vector"), 5).queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("Broadcast"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
