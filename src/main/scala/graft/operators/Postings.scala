package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Positional inverted index + boolean/phrase retrieval — the classic
  * search-index pair of primitives a corpus-curation stack runs when BM25
  * scoring (ranked, bag-of-words) is too loose: conjunctive filtering
  * ("docs containing ALL of …") and exact phrase matching ("docs
  * containing the words ADJACENT, in order"). The reference's nearest
  * analogue is `LIKE '%…%'` SQL filtering (internal/query/executor.go:131
  * pushdown path); positional postings are part of the added
  * training-data-curation surface.
  *
  * Everything is exact integer/array work on the engine's normalized
  * tokenization, so results replay verbatim in any engine with list
  * functions.
  *
  * Plan shape (the 100 TB story): the postings build is ONE corpus scan →
  * posexplode → ONE (term, doc) partial-agg shuffle; a term's posting
  * rows shard naturally by (term, doc) hash, so a stop-word's postings
  * spread across reducers instead of melting one (no collect_list per
  * TERM — per (term, doc) only, bounded by document length). Query
  * evaluation touches ONLY the queried terms' postings (a pushed-down
  * `isin` filter prunes everything else at the scan), and phrase
  * adjacency is a row-local `arrays_overlap` on shifted position lists —
  * a co-partitioned doc-keyed join chain, never a corpus scan.
  */
object Postings {

  /** Positional postings: one row per (term, doc) with the 0-based token
    * positions (sorted) and term frequency. Positions index the
    * normalized token array, so adjacency is well defined corpus-wide.
    */
  def build(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(TextAnalysis.normalize(col(textCol)), " "))
          .as(Seq("pos", "tok")))
      .where(length(col("tok")) > 0)
      .groupBy(col("tok").as("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos").cast("bigint")))
        .as("positions"), count(lit(1)).as("tf"))
      .select(col("term"), col("doc_id"), col("positions"), col("tf"))

  /** Docs containing ALL `terms`: an n-way posting intersection as one
    * (doc-keyed) aggregation over the pruned postings — emits per-doc
    * total tf so the match can rank.
    */
  def conjunctive(postings: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty && terms.size <= 16, s"bounded term set, got ${terms.size}")
    postings.filter(col("term").isin(terms: _*))
      .groupBy("doc_id")
      .agg(countDistinct("term").as("n_terms"), sum("tf").as("total_tf"))
      .filter(col("n_terms") === terms.size)
      .select(col("doc_id"), col("total_tf"))
  }

  /** Docs containing the exact phrase (adjacent, in order): chained
    * doc-keyed joins of the phrase terms' postings; adjacency is the
    * row-local overlap of each term's positions shifted by its phrase
    * offset with the first term's start set. Emits the number of phrase
    * occurrences (distinct start positions).
    */
  def phrase(postings: DataFrame, words: Seq[String]): DataFrame = {
    require(words.size >= 2 && words.size <= 8, s"phrase of 2..8 words, got ${words.size}")
    val legs = words.zipWithIndex.map { case (w, i) =>
      postings.filter(col("term") === w)
        .select(col("doc_id"), col("positions").as(s"p_$i"))
    }
    val joined = legs.reduce((l, r) => l.join(r, "doc_id"))
    // starts = positions of word 0 whose every successor appears shifted
    val starts = words.indices.tail.foldLeft(col("p_0")) { (acc, i) =>
      filter(acc, p => array_contains(col(s"p_$i"), p + i))
    }
    joined
      .withColumn("n_matches", size(starts).cast("bigint"))
      .filter(col("n_matches") > 0)
      .select(col("doc_id"), col("n_matches"))
  }
}
