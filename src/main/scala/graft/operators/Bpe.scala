package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding tokenizer: the real merge-table algorithm (train on
  * a corpus, greedily encode by merge rank), not the BPE-ish regex
  * approximation in [[TextAnalysis]]. Mirrors how production tokenizer
  * trainers scale: the corpus is reduced to a distinct-word histogram in
  * ONE distributed aggregation pass (vocabulary-sized after a
  * deterministic heavy-hitter cap), and the merge loop runs on the driver
  * over that bounded table — the same bounded-driver-solve shape as the
  * IVF Lloyd's step ([[Similarity]]). Encoding broadcasts the rank table
  * inside a narrow map stage with a per-partition word memo, so a 100 TB
  * corpus pays one scan for training counts and one scan for encoding,
  * with no shuffle in the encode path.
  */
object Bpe {

  /** A trained model: adjacent-symbol pair → merge rank (0 = first/most
    * frequent merge; lower rank merges first at encode time).
    */
  final case class BpeModel(ranks: Map[(String, String), Int]) {
    def nMerges: Int = ranks.size
  }

  /** Train `nMerges` merges. One distributed pass builds the distinct
    * pre-token histogram of the normalized corpus (pre-token =
    * whitespace-split word of [[TextAnalysis.normalize]] output), capped
    * to the `maxWords` most frequent words (count desc, word asc — a
    * deterministic heavy-hitter cap, so two runs over the same corpus
    * train identical models). The classic merge loop then runs on the
    * driver: count adjacent symbol pairs weighted by word frequency, merge
    * the most frequent pair (ties broken lexicographically), repeat.
    * Driver cost is O(maxWords × avgLen × nMerges) — bounded by
    * configuration, independent of corpus size.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int = 20000): BpeModel = {
    val words: Array[(String, Long)] = docs
      .select(explode(split(TextAnalysis.normalize(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("w")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    var seqs: Array[(Array[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val ranks = Map.newBuilder[(String, String), Int]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap[(String, String), Long]()
      seqs.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // most frequent pair; ties -> lexicographically smallest, so the
        // trained model is a pure function of the histogram
        val best = pairCounts.foldLeft((("", ""), -1L)) {
          case (acc @ (bk, bc), (k, c)) =>
            if (c > bc || (c == bc && (k._1 < bk._1 ||
                (k._1 == bk._1 && k._2 < bk._2)))) (k, c) else acc
        }._1
        ranks += best -> rank
        val merged = best._1 + best._2
        seqs = seqs.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = scala.collection.mutable.ArrayBuffer[String]()
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == best._1 &&
                  syms(i + 1) == best._2) { out += merged; i += 2 }
              else { out += syms(i); i += 1 }
            }
            (out.toArray, c)
          }
        }
        rank += 1
      }
    }
    BpeModel(ranks.result())
  }

  /** Encode one word with the greedy lowest-rank-first merge loop (the
    * standard BPE inference): repeatedly find the adjacent pair with the
    * lowest merge rank present in the word and merge every occurrence,
    * until no adjacent pair is in the table. Concatenating the returned
    * tokens always reproduces the word exactly.
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): List[String] = {
    if (word.isEmpty) return Nil
    var syms: List[String] = word.map(_.toString).toList
    var done = false
    while (!done && syms.lengthCompare(1) > 0) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var it = syms
      while (it.lengthCompare(1) > 0) {
        val k = (it.head, it.tail.head)
        ranks.get(k).foreach { r =>
          if (r < bestRank) { bestRank = r; bestPair = k } }
        it = it.tail
      }
      if (bestPair == null) done = true
      else {
        val merged = bestPair._1 + bestPair._2
        val out = scala.collection.mutable.ListBuffer[String]()
        var rest = syms
        while (rest.nonEmpty) {
          if (rest.lengthCompare(1) > 0 && rest.head == bestPair._1 &&
              rest.tail.head == bestPair._2) { out += merged; rest = rest.tail.tail }
          else { out += rest.head; rest = rest.tail }
        }
        syms = out.toList
      }
    }
    syms
  }

  /** Per-document BPE accounting over the normalized text: pre-token
    * count, total BPE token count, and total character count (the sum of
    * token lengths — concatenation-exact, so an external oracle can replay
    * it from the text alone). A narrow mapPartitions stage: the rank table
    * rides the closure (broadcast-sized: `nMerges` entries) and a
    * per-partition memo caches each distinct word's token count, so
    * repeated words — the common case in any corpus — encode once per
    * partition.
    */
  def withBpeStats(docs: DataFrame, idCol: String, textCol: String,
      model: BpeModel, memoCap: Int = 100000): DataFrame = {
    val ranks = model.ranks
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_pretokens", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("n_chars", LongType, nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    docs
      .select(col(idCol).cast("long").as("id"),
        split(TextAnalysis.normalize(col(textCol)), " ").as("words"))
      .mapPartitions { rows =>
        val memo = new java.util.HashMap[String, java.lang.Integer]()
        rows.map { r =>
          val words = r.getSeq[String](1)
          var nPre = 0L; var nTok = 0L; var nChr = 0L
          words.foreach { w =>
            if (w.nonEmpty) {
              nPre += 1; nChr += w.length
              val cached = memo.get(w)
              val t =
                if (cached != null) cached.intValue
                else {
                  val v = encodeWord(w, ranks).length
                  if (memo.size < memoCap) memo.put(w, v)
                  v
                }
              nTok += t
            }
          }
          Row(r.getLong(0), nPre, nTok, nChr)
        }
      }(encoder)
  }
}
