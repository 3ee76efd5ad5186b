package graft.operators

import graft.SparkSpec

class PostingsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "red fish blue fish red fish"),      // "red fish" at 0 and 4
    (2L, "fish red blue"),                    // reversed order: no phrase
    (3L, "red tuna blue fish"),               // gap: no phrase
    (4L, "RED, fish!"))                       // normalization -> phrase at 0
    .toDF("doc_id", "text")
  private lazy val post = Postings.build(docs, "doc_id", "text")

  test("build: positional postings with sorted positions and tf") {
    assert(post.filter("term = 'fish' AND doc_id = 1")
      .select("positions").as[Seq[Long]].first() == Seq(1L, 3L, 5L))
    assert(post.filter("term = 'fish' AND doc_id = 1")
      .select("tf").as[Long].first() == 3L)
  }

  test("phrase: adjacency in order, counts every occurrence") {
    val m = Postings.phrase(post, Seq("red", "fish"))
      .as[(Long, Long)].collect().toMap
    assert(m === Map(1L -> 2L, 4L -> 1L)) // docs 2 (reversed) and 3 (gap) excluded
  }

  test("three-word phrase chains the shifted overlap") {
    val m = Postings.phrase(post, Seq("blue", "fish", "red"))
      .as[(Long, Long)].collect().toMap
    assert(m === Map(1L -> 1L)) // "blue fish red" at position 2 in doc 1
  }

  test("conjunctive: all terms required, total tf emitted") {
    val m = Postings.conjunctive(post, Seq("red", "blue"))
      .as[(Long, Long)].collect().toMap
    // doc 1: red x2 + blue x1 = 3; doc 2: 2; doc 3: 2; doc 4 has no blue
    assert(m === Map(1L -> 3L, 2L -> 2L, 3L -> 2L))
  }
}
