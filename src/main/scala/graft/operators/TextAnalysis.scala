package graft.operators

import graft.Barrier.BarrierOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over the `documents`
  * table: tokenization, quality scoring, language ID, fingerprinting.
  * All pure column expressions (codegen'd, fully distributed, no UDFs) so
  * they survive a 100 TB scan: one pass, no shuffle unless aggregated.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** GPT-2-style pre-tokenizer pattern: contractions, space-prefixed
    * letter runs, digit runs, punctuation runs, residual whitespace — the
    * segmentation a byte-pair tokenizer applies BEFORE merges, so its
    * match count is the standard cheap proxy for "BPE token count".
    * Lookaround-free, so Java (Spark) and RE2 (DuckDB) agree match for
    * match and the count is oracle-checkable.
    */
  val bpePretokenRe: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+"

  /** BPE-ish token count: pre-tokenizer segments that carry content
    * (pure-whitespace runs excluded).
    */
  def bpeTokenCount(text: Column): Column =
    size(filter(regexp_extract_all(text, lit(bpePretokenRe), lit(0)),
      t => t.rlike("\\S")))

  /** Canonical URL for URL-level dedup (the RefinedWeb/CCNet pre-filter
    * that folds scrape-time variants of one page): strip the fragment,
    * strip `utm_*` tracking parameters, lowercase the scheme+host
    * (paths stay case-sensitive per RFC 3986). Pure regexp chain —
    * lookaround-free so Java and RE2 agree, codegen'd, oracle-checkable.
    * Limitation (documented, not guessed around): a `?utm_x=1&a=2` query
    * whose FIRST parameter is tracking leaves a leading `&`; full RFC
    * query re-assembly needs a parser, not a regex.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val noUtm = regexp_replace(noFrag, "[?&]utm_[^&#]*", "")
    concat(
      lower(regexp_extract(noUtm, "^(https?://[^/]+)", 1)),
      regexp_extract(noUtm, "^https?://[^/]+(.*)$", 1))
  }

  /** Deterministic sentence segmentation: split on terminal-punctuation
    * runs (`[.!?]+`) followed by whitespace or end-of-text, trim, drop
    * empties. The pattern lives in the Java-regex ∩ RE2 common subset
    * (NO lookbehind — RE2 has none), so a DuckDB
    * `regexp_split_to_array` replays the segmentation byte-exact. Pure
    * codegen'd array expressions: one narrow scan, no UDF, no shuffle —
    * the sentence-level feeder for chunking and quality scoring.
    */
  def sentences(text: Column): Column =
    // sentinel trailing space instead of a `$` alternative: Java's `$`
    // also matches before a final newline, RE2's does not — the sentinel
    // keeps the whole pattern inside byte-identical split semantics
    filter(transform(split(concat(trim(text), lit(" ")), "[.!?]+\\s+"),
      s => trim(s)), s => length(s) > 0)

  /** Per-sentence word counts (whitespace tokens) for a [[sentences]]
    * array — row-local, shuffle-free.
    */
  def sentenceWordCounts(sents: Column): Column =
    transform(sents, st =>
      size(filter(split(st, "\\s+"), t => length(t) > 0)))

  /** Normalized text: lowercase, punctuation stripped, whitespace
    * collapsed — the canonical form used for exact-dup hashing and
    * fingerprints.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Document fingerprint: md5 of the normalized text (md5 so the DuckDB
    * oracle computes the identical value).
    */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Quality scoring: length, token stats, punctuation / stopword /
    * alphabetic ratios — the standard cheap pre-filter signals. Returns the
    * input plus metric columns and a composite `quality_score` in [0,1].
    */
  def qualityMetrics(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = split(trim(t), "\\s+")
    val nTok = size(toks)
    val stop = Seq("the", "a", "of", "to", "and", "in", "is", "it", "that", "for")
    // Ratios stay as raw IEEE divisions (bit-identical across engines);
    // ROUND-of-double is avoided because engines disagree at half
    // boundaries.
    df.withColumn("n_chars_m", length(t))
      .withColumn("n_tokens", nTok)
      .withColumn("avg_token_len",
        length(regexp_replace(t, "\\s+", "")).cast("double") / nTok)
      .withColumn("punct_ratio",
        length(regexp_replace(t, "[^.,;:!?]", "")).cast("double") / length(t))
      .withColumn("alpha_ratio",
        length(regexp_replace(t, "[^A-Za-z]", "")).cast("double") / length(t))
      .withColumn("stopword_ratio",
        size(filter(toks, w => lower(w).isin(stop: _*))).cast("double") / nTok)
      .withColumn("quality_score",
        least(lit(1.0), greatest(lit(0.0),
          lit(0.30) * least(nTok.cast("double") / lit(50.0), lit(1.0)) +
          lit(0.25) * col("alpha_ratio") +
          lit(0.25) * least(col("stopword_ratio") * lit(5.0), lit(1.0)) +
          lit(0.20) * (lit(1.0) - least(col("punct_ratio") * lit(5.0), lit(1.0))))))
  }

  /** Language-ID by stopword evidence: scores each candidate language by
    * distinct-stopword hits in the document and picks the argmax
    * (deterministic tie-break on language code). An n-gram-free heuristic
    * that is one `transform`/`aggregate` HOF chain — no shuffle, no UDF.
    */
  private[graft] val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "por", "que", "una", "con"),
    "it" -> Seq("il", "la", "che", "e", "di", "non", "per", "una", "sono", "con"))

  /** Chunk documents into overlapping token windows — the standard
    * training-data prep step (context-window packing). One generator per
    * row: chunk i covers tokens [i·stride, i·stride + size); the last
    * chunk may be shorter; every token is covered. No shuffle — a 100 TB
    * corpus chunks in a single scan.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(stride > 0 && size >= stride, "need size >= stride > 0")
    val toks = split(normalize(col(textCol)), " ")
    val nChunks = when(org.apache.spark.sql.functions.size(toks) <= size, lit(1))
      .otherwise(ceil((org.apache.spark.sql.functions.size(toks) - size)
        .cast("double") / stride).cast("int") + 1)
    // chunk_tokens is pure arithmetic over the doc's token count — the
    // former size(split(chunk_text)) re-tokenized every emitted chunk.
    df.select(col(idCol), toks.as("_toks"),
        org.apache.spark.sql.functions.size(toks).as("_n"), nChunks.as("_nc"))
      .withColumn("chunk_idx", explode(sequence(lit(0), col("_nc") - 1)))
      .select(col(idCol), col("chunk_idx").cast("bigint").as("chunk_idx"),
        concat_ws(" ", slice(col("_toks"), col("chunk_idx") * stride + 1, lit(size)))
          .as("chunk_text"),
        least(lit(size), col("_n") - col("chunk_idx") * stride)
          .cast("bigint").as("chunk_tokens"))
  }

  /** Top-`topN` TF-IDF terms per document. Zero aggregations, two windows:
    * tf depends only on a document's own text, so the `term_counts` native
    * expression (functions.TextExprs) counts terms per row and exploding
    * the map yields (doc, term, tf) directly — the raw token stream never
    * shuffles. `df` is then a count-over-term window ON that frame (one
    * row per (doc, term) means rows-per-term IS the document frequency),
    * and the rank is the usual per-doc window.
    * The idf is the RAW ratio `N / df` (no logarithm): logs differ in the
    * last ulp across libm implementations and would break cross-engine
    * hash checks, and the ranking it induces per document is identical
    * (log is monotone). Score = tf · N / df as left-associated double ops.
    *
    * Scale: the only shuffles are the two windows over the already
    * (doc, term, tf)-shaped frame (vocabulary × docs rows, ≪ token
    * count); term-frequency skew is bounded because a window count needs
    * no per-row state beyond the partition count itself.
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String, topN: Int,
      assumeUniqueIds: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VecExprs.register(docs.sparkSession)
    val tf = docs
      .select(col(idCol),
        explode(call_function("term_counts",
          split(normalize(col(textCol)), " "))).as(Seq("term", "tf")))
    // Corpus size as a broadcast 1-row frame, not a driver-side
    // distinct().count(): the old form was a blocking job per call (a
    // driver sync point); this way N is computed inside the same job and
    // cross-joined (broadcast) onto the scored frame. Under the standard
    // TF-IDF contract the id column is the document key (unique), so N is
    // a plain count — one exchange instead of countDistinct's two; pass
    // assumeUniqueIds = false for frames where ids may repeat.
    val nDf =
      if (assumeUniqueIds) docs.select(count(lit(1)).as("n"))
      else docs.select(countDistinct(col(idCol)).as("n"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("tfidf").desc, col("term").asc)
    tf.withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .crossJoin(broadcast(nDf))
      .withColumn("tfidf",
        col("tf").cast("double") * col("n").cast("double") / col("df").cast("double"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col(idCol), col("rank").cast("bigint").as("rank"),
        col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** Edit-distance near-dup pairs: block by (`blockCols`), enumerate pairs
    * within a block, keep pairs whose Levenshtein distance over the first
    * `prefixLen` chars is ≤ `maxDist`. The verify stage of a dedup
    * pipeline when shingle methods are too coarse — exact, integer-valued,
    * so the oracle (DuckDB `levenshtein`) agrees bit-for-bit.
    *
    * Scale: the pair join is per-block (equi-join on the block key, never
    * a cross join); block sizing is the operator's contract — at 100 TB
    * feed it MinHash-band blocks, not coarse language buckets.
    */
  def editDistancePairs(docs: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[Column], prefixLen: Int, maxDist: Int): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val base = docs.select(
      struct(blockCols: _*).as("blk"),
      col(idCol).as("id"),
      substring(col(textCol), 1, prefixLen).as("prefix"))
    docs.schema(idCol).dataType match {
      case LongType | IntegerType =>
        // Per-block primitive loop (the blocked all-pairs shape): one
        // collect_list row per block, pairs enumerated in a tight loop
        // calling UTF8String.levenshteinDistance — the SAME banded DP the
        // 3-arg levenshtein expression runs, so distances are identical,
        // without a self-join materializing both prefixes per pair.
        val spark = docs.sparkSession
        import spark.implicits._
        val intIds = docs.schema(idCol).dataType == IntegerType
        val grouped = base
          .select(col("blk"), struct(col("id").cast("long").as("id"),
            col("prefix")).as("r"))
          .groupBy("blk").agg(collect_list(col("r")).as("rows"))
          .repartition(spark.sparkContext.defaultParallelism)
        val pairs = grouped.flatMap { row =>
          import org.apache.spark.unsafe.types.UTF8String
          val rows = row.getSeq[org.apache.spark.sql.Row](1)
          val n = rows.length
          val ids = new Array[Long](n)
          val ps = new Array[UTF8String](n)
          var i = 0
          rows.foreach { r =>
            ids(i) = r.getLong(0)
            ps(i) = UTF8String.fromString(
              if (r.isNullAt(1)) "" else r.getString(1))
            i += 1
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
          i = 0
          while (i < n) {
            var j = i + 1
            while (j < n) {
              val d = ps(i).levenshteinDistance(ps(j), maxDist)
              if (d >= 0) {
                if (ids(i) < ids(j)) out += ((ids(i), ids(j), d))
                else out += ((ids(j), ids(i), d))
              }
              j += 1
            }
            i += 1
          }
          out
        }.toDF("id_a", "id_b", "edit_dist")
        if (intIds)
          pairs.select(col("id_a").cast("int"), col("id_b").cast("int"),
            col("edit_dist"))
        else pairs
      case _ =>
        val a = base.select(col("blk"), col("id").as("id_a"), col("prefix").as("p_a"))
        val b = base.select(col("blk"), col("id").as("id_b"), col("prefix").as("p_b"))
        a.join(b, Seq("blk"))
          .filter(col("id_a") < col("id_b"))
          // 3-arg levenshtein computes a banded DP and bails out at the
          // threshold (-1 when exceeded) — O(len·maxDist) per pair
          // instead of O(len²), and most pairs exit early.
          .withColumn("edit_dist", levenshtein(col("p_a"), col("p_b"), maxDist))
          .filter(col("edit_dist") >= 0)
          .select(col("id_a"), col("id_b"), col("edit_dist"))
    }
  }

  /** Winnowing document fingerprints (the rolling-hash fingerprint scheme
    * of Schleimer et al.'s MOSS): hash every k-gram, slide a window of
    * `win` hashes, keep each window's minimum, emit the distinct set.
    * Guarantees any shared substring of length ≥ k+win-1 yields a shared
    * fingerprint — the standard local-similarity sketch for plagiarism /
    * near-dup detection. Hashes are md5 strings (min = lexicographic) so
    * the DuckDB oracle computes identical values. Pure HOF chain — one
    * scan, no shuffle until the (doc, fp) explode.
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int, win: Int): DataFrame = {
    // One pass, no per-doc shuffle: the k-gram md5 chain and the
    // sliding-window minima run inside the `winnow_fps` native
    // expression (functions.TextExprs) — value-identical to the former
    // posexplode + window formulation (same tail/completeness drops,
    // same lexicographic md5-hex minima, per-doc distinct), but the only
    // rows that leave the scan are the (doc, fingerprint) pairs.
    // (The earlier HOF rewrite was rejected for the lambda-inlining
    // trap; a native expression evaluates its token-array child once.)
    graft.functions.VecExprs.register(df.sparkSession)
    df.select(col(idCol),
      explode(call_function("winnow_fps",
        split(normalize(col(textCol)), " "), lit(k), lit(win))).as("fp"))
  }

  /** Pack documents into fixed-token-budget training shards: within each
    * stratum, the running (exclusive) token total divided by the budget
    * is the shard id — the standard streaming approximation of
    * bin-packing for context-window shard assembly. One window over the
    * stratum; deterministic order by the id column.
    *
    * Scale: the window partitions by stratum, so parallelism = stratum
    * count; for a single giant stratum, pre-split by a hash prefix and
    * treat (stratum, prefix) as the shard key.
    */
  def packByTokenBudget(df: DataFrame, idCol: String, strataCol: String,
      tokenCol: String, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strataCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("_before",
        coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      // integer floor-division: exact past 2^53 tokens, where a double
      // quotient would lose ulps (and truncate-vs-floor diverges if a
      // caller ever feeds negative token counts)
      .withColumn("shard_id", expr(s"_before div ${budget}"))
      .drop("_before")
  }

  /** Skew-safe shard packing: a single giant stratum serializes
    * [[packByTokenBudget]]'s window into one task, so here each stratum is
    * pre-split into `subSplits` deterministic sub-strata by an id-hash
    * prefix and packed independently — parallelism becomes
    * strata x subSplits, at the cost of up to one underfilled shard per
    * sub-stratum. Shard ids are namespaced `split * 1e9 + local` so they
    * stay unique within the stratum but do NOT match the serial
    * numbering (packing quality and determinism are the contract, not
    * shard order).
    */
  def packByTokenBudgetSharded(df: DataFrame, idCol: String,
      strataCol: String, tokenCol: String, budget: Long,
      subSplits: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val split = pmod(xxhash64(col(idCol)), lit(subSplits))
    val w = Window.partitionBy(col(strataCol), col("_split"))
      .orderBy(idCol).rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("_split", split)
      .withColumn("_before", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("shard_id",
        col("_split") * lit(1000000000L) + expr(s"_before div ${budget}"))
      .drop("_split", "_before")
  }

  /** Fixed-context sequence packing — the dataloader's final step before
    * training: order documents deterministically, concatenate their
    * token streams with one EOD separator token after each document, and
    * cut the stream into training sequences of exactly `ctxLen` tokens.
    * Emits each document's packing coordinates within its shard's
    * stream: `start_off` (token offset of the doc's first token),
    * `first_seq`/`last_seq` (the sequence indexes the doc spans),
    * `n_seqs`, and `head_fill` (how many of its tokens land in the first
    * of those sequences) — everything a loader needs to locate any
    * document in the packed dataset, and everything an auditor needs to
    * verify no token was dropped or double-packed.
    *
    * Scale shape: an md5-prefix shard column + ONE cumulative-sum window
    * partitioned by shard — the [[Sampling.interleave]] sharding trick,
    * so a 100 TB corpus packs with a single shuffle across
    * 16^prefixChars independent partitions and no global order ever
    * exists (each shard is an independent token stream, exactly how
    * multi-worker loaders shard in practice). Determinism: same inputs ⇒
    * byte-identical packing on any engine (md5 sharding, doc-id order),
    * which is what makes a packed dataset resumable and reproducible.
    */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
      ctxLen: Long, prefixChars: Int = 2): DataFrame = {
    require(ctxLen > 0, s"packSequences: ctxLen must be positive: $ctxLen")
    require(prefixChars >= 1 && prefixChars <= 8,
      s"packSequences: prefixChars out of [1,8]: $prefixChars")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard",
        substring(graft.operators.Sampling.hashBucket(col(idCol), "pack"),
          1, prefixChars))
      // +1 per doc = the EOD separator; integer div/mod throughout so the
      // arithmetic stays exact past 2^53 stream tokens
      .withColumn("start_off",
        coalesce(sum(col(tokenCol).cast("long") + lit(1L)).over(w), lit(0L)))
      .withColumn("first_seq", expr(s"start_off div ${ctxLen}"))
      .withColumn("last_seq", expr(
        s"greatest(start_off + ${tokenCol} - 1, start_off) div ${ctxLen}"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + lit(1L))
      .withColumn("head_fill", least(col(tokenCol).cast("long"),
        lit(ctxLen) - pmod(col("start_off"), lit(ctxLen))))
  }

  /** Gopher-style repetition signals per document: the dominant bigram's
    * share of all bigrams and the duplicate-bigram fraction — the cheap
    * filters that catch boilerplate/spam in pre-training corpora.
    *
    * One pass, NO shuffle: per-document bigram counting happens inside
    * the `repetition_stats` native expression (functions.TextExprs), so
    * the per-token explode + two grouping shuffles of the window
    * formulation are gone — a pure map over the corpus. (An ordinary
    * expression's child is evaluated once per row, so the HOF
    * lambda-inlining trap doesn't apply.) Documents with no bigram
    * (fewer than two tokens) are absent, as before.
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.VecExprs.register(df.sparkSession)
    df.select(col(idCol),
        call_function("repetition_stats",
          split(normalize(col(textCol)), " ")).as("s"))
      .filter(col("s.n_bigrams") > 0)
      .select(col(idCol),
        col("s.top_bigram_n").as("top_bigram_n"),
        col("s.n_bigrams").as("n_bigrams"),
        col("s.n_distinct_bigrams").as("n_distinct_bigrams"))
      // fractions derived from the emitted integer columns, double/double
      // on both engines — no engine-specific wide-int promotion in the
      // division path (the integer columns stay authoritative)
      .withColumn("top_bigram_frac",
        col("top_bigram_n").cast("double") / col("n_bigrams").cast("double"))
      .withColumn("dup_bigram_frac",
        (col("n_bigrams") - col("n_distinct_bigrams")).cast("double") /
          col("n_bigrams").cast("double"))
  }

  def langId(text: Column): Column = {
    val toks = split(normalize(text), " ")
    // struct(score DESC via negation, lang ASC) → array_min = argmax.
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      val score = size(array_intersect(toks, array(words.map(lit): _*)))
      struct((-score).as("negScore"), lit(lang).as("lang"))
    }
    val best = array_min(array(scored: _*))
    when(best.getField("negScore") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Gopher-style quality rule battery — the standard document-level
    * pretraining filters that are deterministic and cheap: token-count
    * range, mean word length range, minimum distinct-stopword hits, and
    * a distinct-token ratio (the repetition guard). Pure column
    * expressions over one scan — no shuffle, no UDF; every metric is
    * engine-reproducible (mean word length via
    * `length(concat(tokens))/n`, raw IEEE division) so the whole battery
    * is DuckDB-oracle-checkable.
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 30, maxTokens: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      minStopHits: Int = 2, minDistinctRatio: Double = 0.5): DataFrame = {
    val toks = split(normalize(col(textCol)), " ")
    val stop = Seq("the", "a", "of", "to", "and", "in", "is", "it", "that", "for")
    val n = size(toks)
    val out = df.select(
      col(idCol),
      n.cast("bigint").as("n_tokens"),
      size(array_intersect(toks, array(stop.map(lit): _*)))
        .cast("bigint").as("stop_hits"),
      (length(concat_ws("", toks)).cast("double") / n).as("mean_word_len"),
      (size(array_distinct(toks)).cast("double") / n).as("distinct_ratio"))
    out.withColumn("passes",
      col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens &&
      col("mean_word_len") >= minMeanWordLen &&
      col("mean_word_len") <= maxMeanWordLen &&
      col("stop_hits") >= minStopHits &&
      col("distinct_ratio") > minDistinctRatio)
  }

  /** Sketch-based heavy hitters: a Count-Min sketch over EVERY token
    * (Spark's mergeable `count_min_sketch` aggregate — partial sketches
    * merge map-side, so the full corpus contributes through tiny
    * fixed-size partials and only one sketch ever reaches the driver),
    * with candidate tokens drawn from a deterministic hash-sample of
    * documents. This is the 100 TB twin of the exact top-k (q_t3): the
    * exact path shuffles every distinct token; this path shuffles
    * nothing but a `ceil(2/eps) * depth` counter grid regardless of
    * corpus size.
    *
    * Emits (token, est_count, n_total_tokens). CMS guarantees
    * `exact <= est_count` always (counters only over-count), and
    * `est_count <= exact + eps * n_total_tokens` with probability
    * `confidence` — both bounds are driver-oracle-checkable because the
    * fixed seed makes the sketch deterministic.
    */
  def cmsHeavyHitters(df: DataFrame, idCol: String, textCol: String,
      eps: Double = 1e-4, confidence: Double = 0.99, seed: Int = 42,
      candidateFraction: Double = 0.2, topN: Int = 50): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(
      explode(split(normalize(col(textCol)), " ")).as("token"))
    val agg = toks.agg(
      count_min_sketch(col("token"), lit(eps), lit(confidence), lit(seed))
        .as("sk"),
      count(lit(1)).as("n")).head()
    // Zero input rows yield a NULL sketch (count_min_sketch is a typed
    // agg with no zero value) — return the empty result, don't NPE.
    if (agg.isNullAt(agg.fieldIndex("sk")))
      return Seq.empty[(String, Long, Long)]
        .toDF("token", "est_count", "n_total_tokens")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(agg.getAs[Array[Byte]]("sk")))
    val nTotal = agg.getAs[Long]("n")
    // Candidates: exact counts over a bounded hash-sample only — the
    // full-corpus frequency comes from the sketch, never from a global
    // distinct-token shuffle. topN is small by contract (driver-safe).
    val candidates = Sampling.sampleByKey(df, idCol, candidateFraction)
      .select(explode(split(normalize(col(textCol)), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token").asc)
      .limit(topN)
      .select("token").as[String].collect()
    candidates.toSeq
      .map(t => (t, cms.estimateCount(t), nTotal))
      .toDF("token", "est_count", "n_total_tokens")
  }

  /** A bounded bigram language model trained on the corpus itself — the
    * CCNet-shaped LM-quality stage of a pretraining pipeline (train a
    * small LM, score every document against it, filter/ bucket on the
    * score; cf. Wenzek et al., CCNet).
    *
    * Bounded by construction: the `vocabSize` most frequent unigrams
    * and the `maxBigrams` most frequent in-vocab bigrams, both with
    * fully deterministic tie-breaks (count desc, token asc) so any
    * engine reproduces the exact same model. Both selections are
    * sort + global limit (TakeOrdered — only kept rows survive the
    * plan), so at any corpus scale the model is a fixed-size pair of
    * tables that BROADCASTS to the scorer. Training cost: one token
    * explode + two two-phase aggregations whose shuffles are
    * vocabulary-sized (map-side combine carries (token, count) pairs,
    * never raw token rows).
    */
  case class BigramLm(unigrams: DataFrame, bigrams: DataFrame,
      totalTokens: Long)

  /** Normalized non-empty token array (shared by train and score). */
  private def lmToks(textCol: String): Column =
    filter(split(normalize(col(textCol)), " "), t => length(t) > 0)

  /** Materialized (carry, toks) LM-token frame — the same HOF barrier as
    * [[Dedup.tokenFrame]]: CollapseProject inlines the
    * normalize+split+filter subtree into every downstream explode and
    * into [[lmPairs]]'s slice/size references (~5 evaluations inside the
    * pair build alone), so without the barrier one LM pass re-tokenizes
    * the corpus ~7×. The localCheckpoint truncates lineage so consumers
    * see an in-memory array attribute; the repartition spreads the
    * CPU-bound tokenize across all cores first.
    */
  private def lmTokenFrame(df: DataFrame, carry: Seq[String],
      textCol: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(carry.map(col) :+ lmToks(textCol).as("toks"): _*)
      .barrier(true)

  /** Adjacent (w1, w2) pairs of a token array; empty for < 2 tokens. */
  private def lmPairs(toks: Column): Column = {
    val n = greatest(size(toks) - 1, lit(0))
    zip_with(slice(toks, lit(1), n), slice(toks, lit(2), n),
      (a, b) => struct(a.as("w1"), b.as("w2")))
  }

  def bigramLm(docs: DataFrame, textCol: String = "text",
      vocabSize: Int = 1000, maxBigrams: Int = 5000): BigramLm = {
    val spark = docs.sparkSession
    val base = lmTokenFrame(docs, Nil, textCol)
    // totalTokens without exploding: Σ size(toks) ≡ count(explode(toks))
    // (explode of an empty array emits 0 rows and size() = 0; a NULL toks
    // explodes to nothing and greatest(NULL, 0) = 0) — one narrow
    // partial-agg pass instead of the old full token-row explode count().
    val totalTokens = {
      val r = base.agg(sum(greatest(size(col("toks")), lit(0)))).head
      if (r.isNullAt(0)) 0L else r.getLong(0) // SUM of zero rows is NULL
    }
    // Pin the unigram top-k as a LOCAL relation (bounded: vocabSize rows).
    // As a lazy plan, every downstream broadcast of it — the scorer alone
    // takes three, the bigram build two more — re-ran the full-corpus
    // token explode + aggregation (measured as three extra ~10-CPU-s
    // stages in q_t37). Collected once, every re-use is free, and the
    // bigram build below can stay LAZY (it runs exactly once, inside the
    // consumer's own job, overlapped — its inputs are now local).
    val unigramsQ = base.select(explode(col("toks")).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("uni_cnt"))
      .orderBy(col("uni_cnt").desc, col("tok").asc)
      .limit(vocabSize)
    val unigrams = spark.createDataFrame(
      java.util.Arrays.asList(unigramsQ.collect(): _*), unigramsQ.schema)
    val inVocab = unigrams.select("tok")
    val bigrams = base
      .select(explode(lmPairs(col("toks"))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .join(broadcast(inVocab.withColumnRenamed("tok", "w1")), "w1")
      .join(broadcast(inVocab.withColumnRenamed("tok", "w2")), "w2")
      .groupBy("w1", "w2").agg(count(lit(1)).as("big_cnt"))
      .orderBy(col("big_cnt").desc, col("w1").asc, col("w2").asc)
      .limit(maxBigrams)
    BigramLm(unigrams, bigrams, totalTokens)
  }

  /** Score documents against a [[BigramLm]]: exact integer coverage
    * stats (n_tokens, n_oov, n_bigrams, n_bigram_hits — the
    * DuckDB-oracle-checkable part) plus a stupid-backoff mean
    * log-probability and perplexity (doubles; ScalaTest-verified and
    * kept out of the driver oracle because cross-engine libm log() is
    * not bit-contracted).
    *
    *   p(w2 | w1) = big_cnt / uni_cnt(w1)   bigram in the LM
    *              = 0.4 * uni_cnt(w2) / N   backoff, w2 in vocab
    *              = 0.4 / N                 backoff, w2 OOV
    *
    * Plan shape: the corpus explodes once for unigram coverage and once
    * for pairs; every model lookup is a broadcast hash join (the LM is
    * bounded); both re-aggregations are doc-keyed sums with map-side
    * partial aggregation, so their shuffles carry one row per
    * (partition, doc), never token rows. Nothing in the path holds
    * unbounded state — the 100 TB cost is two corpus scans.
    */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
      lm: BigramLm): DataFrame = {
    val base = lmTokenFrame(docs, Seq(idCol), textCol)
    val uniB = broadcast(lm.unigrams)
    val oov = base.select(col(idCol), explode(col("toks")).as("tok"))
      .join(uniB, Seq("tok"), "left")
      .groupBy(idCol)
      .agg(sum(when(col("uni_cnt").isNull, 1L).otherwise(0L)).as("n_oov"))
    val n = lit(lm.totalTokens.toDouble)
    val lp = when(col("big_cnt").isNotNull,
        log(col("big_cnt").cast("double") / col("u1_cnt")))
      .when(col("u2_cnt").isNotNull,
        log(lit(0.4) * col("u2_cnt").cast("double") / n))
      .otherwise(log(lit(0.4) / n))
    val big = base.select(col(idCol), explode(lmPairs(col("toks"))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .join(broadcast(lm.bigrams), Seq("w1", "w2"), "left")
      .join(broadcast(lm.unigrams.select(col("tok").as("w1"),
        col("uni_cnt").as("u1_cnt"))), Seq("w1"), "left")
      .join(broadcast(lm.unigrams.select(col("tok").as("w2"),
        col("uni_cnt").as("u2_cnt"))), Seq("w2"), "left")
      .groupBy(idCol).agg(
        sum(when(col("big_cnt").isNotNull, 1L).otherwise(0L))
          .as("n_bigram_hits"),
        sum(lp).as("lp_sum"))
    base.select(col(idCol),
        size(col("toks")).cast("bigint").as("n_tokens"),
        greatest(size(col("toks")) - 1, lit(0)).cast("bigint")
          .as("n_bigrams"))
      .join(oov, Seq(idCol), "left")
      .join(big, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        col("n_bigrams"),
        coalesce(col("n_bigram_hits"), lit(0L)).as("n_bigram_hits"),
        when(col("n_bigrams") > 0, col("lp_sum") / col("n_bigrams"))
          .as("lm_logprob"))
      .withColumn("lm_ppl",
        when(col("lm_logprob").isNotNull, exp(-col("lm_logprob"))))
  }

  /** BM25 top-k retrieval scoring over the corpus for a bounded literal
    * term set — the lexical-relevance primitive a data-selection pipeline
    * runs to pull target-domain documents (the sparse sibling of the
    * DSIR importance weights and the ANN dense path).
    *
    * Arithmetic is ENTIRELY integer, so ranks and scores are
    * bit-identical across engines and the driver oracle replays every
    * score: k1 = 1.2 and b = 0.75 are folded into the integer constants
    * of score = idf · tf·(k1+1) / (tf + k1·(1−b+b·len/avgdl)) multiplied
    * through by 40·avgdl:
    *
    * {{{ (idf · tf · 88 · avgdl) div (40·avgdl·tf + 12·avgdl + 36·len) }}}
    *
    * with avgdl = totalTokens div nDocs and the RSJ-shaped integer idf
    * surrogate ((nDocs − df + 1) · idfScale) div (df + 1) — monotone in
    * df like the log form and, like Lucene's ln(1 + ·) floor, strictly
    * positive even for a term present in EVERY document; deterministic
    * unlike either (cross-engine ln() at
    * half-ulp boundaries is exactly the float trap the oracle rules ban).
    * Magnitudes: idf ≤ nDocs·idfScale, so the product stays far inside
    * int64 up to ~10⁷ docs at the default scale; beyond that lower
    * idfScale or lift the expressions to decimal(38,0) — the shape is
    * unchanged.
    *
    * Plan shape (the 100 TB story): ONE corpus scan + ONE doc-keyed
    * partial-agg shuffle. Per-term tf and doc length come from the same
    * groupBy (conditional sums over the literal term list — no per-term
    * join, no second scan); corpus stats (nDocs, avgdl, per-term df)
    * reduce to ONE row broadcast back; top-k is TakeOrderedAndProject.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int, idfScale: Long = 1000000L): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.size <= 64,
      s"bm25TopK wants a bounded literal term set, got ${queryTerms.size}")
    val toks = docs.select(col(idCol),
        explode(split(normalize(col(textCol)), " ")).as("tok"))
      .where(length(col("tok")) > 0)
    val tfCols = queryTerms.indices.map(i =>
      sum(when(col("tok") === queryTerms(i), 1L).otherwise(0L)).as(s"tf_$i"))
    val perDoc = toks.groupBy(col(idCol))
      .agg(count(lit(1)).as("len"), tfCols: _*)
    val dfCols = queryTerms.indices.flatMap(i => Seq(
      sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i")))
    val corpusAggs = Seq(sum("len").as("tot_len")) ++ dfCols
    val corpus = perDoc.agg(count(lit(1)).as("n_docs"), corpusAggs: _*)
      // exact integer avgdl: float division then truncation could round
      // up across an integer boundary on a huge corpus; div cannot
      .withColumn("avgdl", expr("tot_len div n_docs"))
    val termScore: Int => Column = { i =>
      when(col(s"tf_$i") > 0,
        expr(s"(((n_docs - df_$i + 1) * ${idfScale}L) div (df_$i + 1))" +
          s" * tf_$i * 88L * avgdl div " +
          s"(40L * avgdl * tf_$i + 12L * avgdl + 36L * len)"))
        .otherwise(lit(0L))
    }
    perDoc.crossJoin(broadcast(corpus))
      .withColumn("score", queryTerms.indices.map(termScore).reduce(_ + _))
      .withColumn("n_terms", queryTerms.indices
        .map(i => when(col(s"tf_$i") > 0, 1L).otherwise(0L)).reduce(_ + _))
      .where(col("score") > 0)
      .select(col(idCol), col("score"), col("n_terms"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Luhn mod-10 checksum over an all-digit string — validated PII
    * detection (is this 16-digit run an actual card number or a phone
    * number / timestamp?) instead of t9's shape-only regex redaction.
    * Pure integer HOF arithmetic (sequence + aggregate over the reversed
    * digit string), codegen'd, engine-portable: position i (1-based from
    * the right) doubles when even, a doubled digit > 9 subtracts 9, and
    * the total must divide by 10.
    */
  def luhnValid(c: Column): Column = {
    val chars = split(reverse(c), "")
    val s = aggregate(sequence(lit(1), length(c)), lit(0), (acc, i) => {
      val d = ascii(element_at(chars, i)) - lit(48)
      val dbl = d * 2
      acc + when(i % 2 === 0,
        when(dbl > 9, dbl - 9).otherwise(dbl)).otherwise(d)
    })
    s % 10 === 0
  }

  /** The check digit completing `base` (a digit string WITHOUT its final
    * check digit) to a Luhn-valid number: with the check digit occupying
    * position 1 from the right, payload position j doubles when odd.
    */
  def luhnCheckDigit(base: Column): Column = {
    val chars = split(reverse(base), "")
    val s = aggregate(sequence(lit(1), length(base)), lit(0), (acc, i) => {
      val d = ascii(element_at(chars, i)) - lit(48)
      val dbl = d * 2
      acc + when(i % 2 === 1,
        when(dbl > 9, dbl - 9).otherwise(dbl)).otherwise(d)
    })
    (lit(10) - s % 10) % 10
  }

  /** Card-number candidates: standalone 13-19 digit runs. */
  def cardCandidates(text: Column): Column =
    regexp_extract_all(text, lit("\\b\\d{13,19}\\b"), lit(0))

  /** Boilerplate-stripping text extraction from HTML — the WET-style
    * web-corpus cleaning step (drop script/style payloads and nav/footer
    * chrome, strip tags, decode the common entities, collapse
    * whitespace). Pure codegen'd regexp chain: one narrow scan, no UDF,
    * no shuffle — at 100 TB this runs at parquet-read speed and
    * pipelines into the quality/langid/dedup stages.
    *
    * Pattern discipline (cross-engine determinism): every pattern stays
    * in the Java-regex ∩ RE2 common subset — inline `(?i)`, non-greedy
    * `.*?`, character classes — so the DuckDB oracle replays the chain
    * verbatim. Order matters and is load-bearing: containers drop before
    * the generic tag strip (else their inner text leaks), and `&amp;`
    * decodes LAST so `&amp;lt;` yields the literal `&lt;` rather than
    * double-decoding — the classic extractor ordering bug, spec-pinned.
    */
  def extractHtmlText(html: Column): Column = {
    // (?is): DOTALL is load-bearing — neither Java regex nor RE2 lets `.`
    // cross newlines by default, and real-world script/style/nav blocks
    // are virtually always multi-line; without it their payload leaks
    // into the extracted text after the generic tag strip.
    val dropBlocks = Seq("script", "style", "nav", "footer", "header", "aside")
      .foldLeft(html)((c, tag) =>
        regexp_replace(c, s"(?is)<$tag[^>]*>.*?</$tag>", " "))
    val noTags = regexp_replace(dropBlocks, "<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&") // &amp; last: no double-decode
      .foldLeft(noTags)((c, e) => regexp_replace(c, e._1, e._2))
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Multi-query [[bm25TopK]]: score Q independent term-set queries in
    * ONE corpus pass. Running `bm25TopK` per query costs Q corpus scans +
    * Q doc-keyed shuffles; here the per-doc tf columns for the UNION of
    * all query terms come from a single groupBy, corpus stats reduce to
    * one broadcast row, and per-query scores fan out row-locally (an
    * array-of-structs explode AFTER the aggregation, so the exploded
    * width is Q × matched docs, never Q × corpus). Identical integer
    * arithmetic to `bm25TopK` — per-query results are bit-identical to Q
    * separate calls (spec-pinned), so the same DuckDB replay applies.
    *
    * @param queries (query_id, terms) — term sets may overlap; the
    *                union is bounded like `bm25TopK`'s single set.
    * @return (query_id, id, rank, score, n_terms), rank 1-based within
    *         query by (score desc, id asc), `rank <= k`, score > 0.
    */
  def bm25TopKMulti(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Int, Seq[String])], k: Int,
      idfScale: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val allTerms = queries.flatMap(_._2).distinct
    require(queries.nonEmpty && allTerms.nonEmpty && allTerms.size <= 64,
      s"bm25TopKMulti wants a bounded union term set, got ${allTerms.size}")
    val termIdx = allTerms.zipWithIndex.toMap
    val toks = docs.select(col(idCol),
        explode(split(normalize(col(textCol)), " ")).as("tok"))
      .where(length(col("tok")) > 0)
    val tfCols = allTerms.indices.map(i =>
      sum(when(col("tok") === allTerms(i), 1L).otherwise(0L)).as(s"tf_$i"))
    val perDoc = toks.groupBy(col(idCol))
      .agg(count(lit(1)).as("len"), tfCols: _*)
    val dfCols = allTerms.indices.map(i =>
      sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val corpus = perDoc
      .agg(count(lit(1)).as("n_docs"),
        (Seq(sum("len").as("tot_len")) ++ dfCols): _*)
      .withColumn("avgdl", expr("tot_len div n_docs"))
    val termScore: Int => Column = { i =>
      when(col(s"tf_$i") > 0,
        expr(s"(((n_docs - df_$i + 1) * ${idfScale}L) div (df_$i + 1))" +
          s" * tf_$i * 88L * avgdl div " +
          s"(40L * avgdl * tf_$i + 12L * avgdl + 36L * len)"))
        .otherwise(lit(0L))
    }
    val perQuery = queries.map { case (qid, terms) =>
      val idx = terms.map(termIdx)
      struct(lit(qid.toLong).as("query_id"),
        idx.map(termScore).reduce(_ + _).as("score"),
        idx.map(i => when(col(s"tf_$i") > 0, 1L).otherwise(0L))
          .reduce(_ + _).as("n_terms"))
    }
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("id").asc)
    perDoc.crossJoin(broadcast(corpus))
      // docs containing none of the union terms cannot score for any
      // query — drop them BEFORE the fan-out so the exploded width is
      // Q × matched docs, not Q × corpus
      .where(allTerms.indices.map(i => col(s"tf_$i") > 0).reduce(_ || _))
      .select(col(idCol).as("id"), explode(array(perQuery: _*)).as("qs"))
      .select(col("qs.query_id"), col("id"), col("qs.score"),
        col("qs.n_terms"))
      .where(col("score") > 0)
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("query_id", "id", "rank", "score", "n_terms")
  }

  /** PMI-style collocation mining: the corpus' strongest two-word
    * associations (phrase/term extraction for vocab curation and quality
    * probes). Ranks bigrams by the exact lift ratio
    * `(c_xy * N * N) / (M * c_x * c_y)` — PMI is `log(lift)` and log is
    * monotonic, so the ranking is identical while every emitted value
    * stays in the bit-contracted integer/÷ subset (COVERAGE.md: `log()`
    * never leaves an oracle-checked frame).
    *
    * Shape at scale: two token-explode scans feed partial-aggregated
    * unigram and bigram counts; the `minCount` filter trims the bigram
    * frame BEFORE its two vocabulary joins; scalar totals broadcast; the
    * final top-N is orderBy+limit (TakeOrdered, no global sort) and the
    * rank window runs over those `topN` rows only.
    */
  def pmiCollocations(df: DataFrame, textCol: String,
      minCount: Long = 5, topN: Int = 40): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = lmTokenFrame(df, Nil, textCol)
    val uni = base.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val totals = uni.agg(sum("c").as("n_tokens"))
    val bi = base.select(explode(lmPairs(col("toks"))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c_xy"))
    val mTotal = bi.agg(sum("c_xy").as("m_bigrams"))
    val joined = bi.filter(col("c_xy") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c").as("c_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_y")), "w2")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(mTotal))
    val lift = ((col("c_xy").cast("double") * col("n_tokens").cast("double"))
        * col("n_tokens").cast("double")) /
      ((col("m_bigrams").cast("double") * col("c_x").cast("double"))
        * col("c_y").cast("double"))
    val ord = Seq(col("lift").desc, col("w1").asc, col("w2").asc)
    joined.withColumn("lift", lift)
      .orderBy(ord: _*)
      .limit(topN)
      .withColumn("rank",
        row_number().over(Window.orderBy(ord: _*)).cast("bigint"))
      .select(col("rank"), col("w1"), col("w2"), col("c_xy"), col("c_x"),
        col("c_y"), col("n_tokens"), col("m_bigrams"), col("lift"))
  }

  /** C4-style line-level page cleaning (Raffel et al. 2020, the "C4"
    * pipeline): split a page on newlines, trim, and keep only lines that
    * (a) contain no banned phrase (case-insensitive substring — the
    * paper's "javascript"/"lorem ipsum"/curly-brace rules), (b) have at
    * least `minWords` words, and (c) end in terminal punctuation
    * (`.`/`!`/`?`). Drop counters follow that precedence (banned >
    * short > punctuation) so each dropped line is counted exactly once.
    * The page survives only if at least `minKeptLines` lines remain —
    * the paper's page-level sentence floor.
    *
    * Everything is higher-order array functions over one narrow codegen
    * scan: no shuffle, no UDF, no explode — per-row work is linear in
    * page bytes, so the operator is a pure map at 100 TB.
    */
  def c4LineClean(df: DataFrame, idCol: String, pageCol: String,
      minWords: Int = 3, minKeptLines: Int = 2,
      banned: Seq[String] = Seq("javascript", "lorem ipsum", "{"))
      : DataFrame = {
    require(banned.nonEmpty, "c4LineClean wants at least one banned phrase")
    val lines = filter(
      transform(split(col(pageCol), "\n"), l => trim(l)),
      l => length(l) > 0)
    def isBanned(l: Column): Column =
      banned.map(p => lower(l).contains(lit(p))).reduce(_ || _)
    def nWords(l: Column): Column =
      size(filter(split(l, "\\s+"), w => length(w) > 0))
    def endsPunct(l: Column): Column = l.rlike("[.!?]$")
    val keepPred = (l: Column) =>
      !isBanned(l) && nWords(l) >= minWords && endsPunct(l)
    df.select(col(idCol), lines.as("lines"))
      .select(
        col(idCol),
        size(col("lines")).cast("bigint").as("n_lines"),
        size(filter(col("lines"), keepPred)).cast("bigint").as("n_kept"),
        size(filter(col("lines"), l => isBanned(l))).cast("bigint")
          .as("n_dropped_banned"),
        size(filter(col("lines"),
          l => !isBanned(l) && nWords(l) < minWords)).cast("bigint")
          .as("n_dropped_short"),
        size(filter(col("lines"),
          l => !isBanned(l) && nWords(l) >= minWords && !endsPunct(l)))
          .cast("bigint").as("n_dropped_punct"),
        array_join(filter(col("lines"), keepPred), "\n").as("cleaned"))
      .withColumn("page_kept", col("n_kept") >= minKeptLines)
  }

  /** Per-host reputation and blocklist derivation — the domain-level
    * curation pass of C4/RefinedWeb-style web pipelines: aggregate a
    * per-document quality signal by host, rank hosts, and flag the
    * bottom `bottomK` as blocked (the derived blocklist an anti-join
    * then applies to the corpus). The quality signal must arrive as an
    * INTEGER proxy (`qmilliCol`, e.g. `floor(quality_score * 1000)`) so
    * the per-host aggregation is an order-independent BIGINT sum — a
    * double sum would be reassociation-sensitive across engines. The
    * only double is the final one-division average. The ranking window
    * runs over the HOST frame, bounded by host cardinality (domain
    * counts are many orders below document counts), not the corpus.
    */
  def hostReputation(df: DataFrame, hostCol: String, qmilliCol: String,
      bottomK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bottomK >= 0, s"bottomK must be >= 0, got $bottomK")
    val byHost = df.groupBy(col(hostCol).as("host"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(qmilliCol)).cast("bigint").as("sum_qmilli"))
      .withColumn("avg_qmilli",
        col("sum_qmilli").cast("double") / col("n_docs").cast("double"))
    // bounded frame: one row per host; the global window is deliberate
    val w = Window.orderBy(col("avg_qmilli"), col("host"))
    byHost
      .withColumn("reputation_rank", row_number().over(w).cast("bigint"))
      .withColumn("blocked", col("reputation_rank") <= bottomK)
  }

  /** N-gram novelty / memorization-risk report: per group (source,
    * domain, split), how much of its documents' distinct w-gram mass is
    * CORPUS-COMMON (appears in >= 2 documents anywhere) vs novel. High
    * common-share groups are boilerplate/template farms that inflate
    * memorization; `n_high_novelty` counts documents whose novel share
    * is >= 0.5. Deliberately integer-exact: per-document gram counts are
    * summed as longs and the single ratio is one double division, so the
    * cross-engine replay is bit-stable (no float accumulation order).
    *
    * 100 TB shape: the (doc, gram) frame shuffles once on `gram` for the
    * document-frequency aggregate, joins back on the SAME key (no second
    * gram shuffle under AQE-reused exchange), then reduces per doc and
    * per group — the (token, id, df) join shape PPJoin already proves
    * out. Documents too short to carry a w-gram drop out on both
    * engines (explode of an empty array).
    */
  def noveltyReport(df: DataFrame, idCol: String, groupCol: String,
      textCol: String, w: Int = 5): DataFrame = {
    val dg = Dedup.tokenFrame(df, Seq(idCol -> "id", groupCol -> "grp"),
        textCol)
      .select(col("id"), col("grp"),
        explode(Dedup.shinglesFromTokens(col("toks"), w)).as("gram"))
    val gramDf = dg.groupBy("gram").agg(count(lit(1)).as("gdf"))
    val perDoc = dg.join(gramDf, "gram")
      .groupBy("id", "grp")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("gdf") >= 2, 1L).otherwise(0L)).as("n_common"))
    perDoc.groupBy(col("grp").as(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_grams").as("sum_grams"),
        sum("n_common").as("sum_common"),
        round(sum("n_common") / sum("n_grams"), 6).as("common_share"),
        sum(when(lit(2) * (col("n_grams") - col("n_common")) >= col("n_grams"),
          1L).otherwise(0L)).as("n_high_novelty"))
  }
}
