package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.{Dedup, TextAnalysis}

/** Streaming deduplication — the ingest-time twin of the batch dedup
  * operators: documents arriving on a stream are dropped if a document
  * with the same normalized-text fingerprint was already seen.
  *
  * Built on Structured Streaming's keyed dedup state:
  *  - [[exact]] keeps fingerprint state forever (bounded only by the
  *    corpus's distinct-document count — at 100 TB that state lives in
  *    the state store, hash-partitioned by fingerprint across executors);
  *  - [[exactWithinWatermark]] bounds the state with an event-time
  *    watermark — the production setting when "duplicate" only matters
  *    within a time horizon (e.g. re-crawls land within days).
  */
object StreamingDedup {

  /** First-seen wins by exact normalized-text fingerprint, unbounded
    * state. `df` must be a streaming DataFrame with `textCol`.
    */
  def exact(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("_fp", TextAnalysis.fingerprint(col(textCol)))
      .dropDuplicates("_fp")
      .drop("_fp")

  /** Watermark-bounded exact dedup: duplicates are only suppressed while
    * their fingerprint is within `delay` of the stream's max event time;
    * state older than the watermark is evicted.
    */
  def exactWithinWatermark(df: DataFrame, textCol: String, tsCol: String,
      delay: String): DataFrame =
    df.withColumn("_fp", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")

  /** Per-bucket signature state: the (docId, simhash) pairs seen so far
    * in one (quarter, value) bucket, newest first, capped by the caller.
    * `newestTs` is the newest event time EVER seen in the bucket (epoch
    * millis; 0 for the non-timestamped variant) — the horizon eviction
    * deadline must key off it, not off any single batch's max.
    */
  final case class BucketState(sigs: List[(Long, Long)], newestTs: Long = 0L)

  /** A streaming near-dup candidate: `docId` matched an earlier-seen
    * `dupOfId` at the given full-signature Hamming distance. The hit
    * carries both 64-bit signatures as evidence, so downstream
    * verification (q_st2) never re-derives them from the corpus.
    */
  final case class NearDupHit(docId: Long, dupOfId: Long, hamming: Int,
      docSh: Long, dupOfSh: Long)

  /** Streaming SimHash near-dup — the ingest-time twin of the batch
    * [[graft.operators.Dedup.simhashNearDups]]: each arriving document's
    * 64-bit SimHash is blocked on its four 16-bit quarters (pigeonhole:
    * any pair within Hamming distance 3 shares an exact quarter), and the
    * keyed state store holds the signatures previously seen per
    * (quarter, value) bucket. A new document compares against ONLY its
    * four buckets' state — never the whole stream — so state is
    * hash-partitioned across executors by bucket exactly like the batch
    * self-join partitions by (q, part), and per-event work is bounded by
    * `maxBucket`.
    *
    * Emits one [[NearDupHit]] per (new doc, earlier doc) pair with full
    * Hamming distance ≤ `maxHamming`. A pair sharing several quarters
    * emits from each — candidate-pair semantics, same as the batch LSH
    * paths; downstream consumers dedup by (docId, dupOfId). Within one
    * micro-batch, documents compare against earlier ids of the same batch
    * (processed in ascending doc-id order), so batch boundaries don't
    * change the candidate set. `maxBucket` caps per-bucket state
    * (newest-first eviction) — the streaming analogue of LSH bucket-size
    * caps, bounding both memory and per-event compare cost at 100 TB
    * ingest rates.
    *
    * `maxBucket` bounds each bucket's list but NOT the number of bucket
    * keys, which grows with the distinct signatures ever seen (≈4× per
    * signature) — unbounded over an infinite stream. This variant is
    * therefore for finite backfills where full-history dedup is
    * intended; an indefinitely-running ingest should use
    * [[nearSimhashWithinHorizon]], which evicts buckets whose newest
    * event has aged past an event-time horizon.
    */
  def nearSimhash(docs: Dataset[(Long, String)], maxHamming: Int = 3,
      maxBucket: Int = 64): Dataset[NearDupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.VecExprs.register(spark)
    val bucketed = docs.toDF("doc_id", "text")
      .withColumn("sh", Dedup.simhash64(col("text")))
      .select(col("doc_id"), col("sh"), explodedQuarters)
      .as[(Long, Long, String)]
    bucketed.groupByKey(_._3)
      .flatMapGroupsWithState[BucketState, NearDupHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[(Long, Long, String)],
            state: GroupState[BucketState]) =>
          compareAndUpdate(rows.map(r => (r._1, r._2)), state,
            maxHamming, maxBucket)
      }
  }

  /** The bounded-state twin of [[nearSimhash]] for indefinitely running
    * streams: rows carry an event timestamp, the stream is watermarked by
    * `horizon`, and a bucket whose NEWEST event has aged past the horizon
    * is evicted from the state store entirely (event-time timeout +
    * `state.remove()`). Total state is therefore bounded by one horizon's
    * worth of distinct signatures (≈4 bucket keys each), not the stream's
    * full history — the same 30-day-style cap the reference applies to
    * every monitor (base_change_tracker.go:66-93). Semantics within the
    * horizon are identical to [[nearSimhash]]; duplicates farther apart
    * than the horizon are intentionally not flagged (that is the
    * contract, exactly like [[exactWithinWatermark]]).
    */
  def nearSimhashWithinHorizon(
      docs: Dataset[(Long, String, java.sql.Timestamp)],
      horizon: String, maxHamming: Int = 3,
      maxBucket: Int = 64): Dataset[NearDupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.VecExprs.register(spark)
    val bucketed = docs.toDF("doc_id", "text", "ts")
      .withWatermark("ts", horizon)
      .withColumn("sh", Dedup.simhash64(col("text")))
      .select(col("doc_id"), col("sh"), explodedQuarters, col("ts"))
      .as[(Long, Long, String, java.sql.Timestamp)]
    bucketed.groupByKey(_._3)
      .flatMapGroupsWithState[BucketState, NearDupHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, rows: Iterator[(Long, Long, String, java.sql.Timestamp)],
            state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // bucket idle past the horizon: drop its key entirely
            state.remove()
            Iterator.empty
          } else {
            val rowSeq = rows.toSeq
            // Evict when the watermark passes newest-event + horizon.
            // "Newest" is across the bucket's WHOLE history, not just
            // this batch: a later batch delivering older-but-not-late
            // rows must not move the deadline earlier and evict
            // still-in-horizon signatures.
            val newest = math.max(
              state.getOption.map(_.newestTs).getOrElse(0L),
              rowSeq.iterator.map(_._4.getTime).max)
            val out = compareAndUpdate(
              rowSeq.iterator.map(r => (r._1, r._2)), state,
              maxHamming, maxBucket, newest)
            state.setTimeoutTimestamp(newest, horizon)
            out
          }
      }
  }

  /** The four 16-bit quarter buckets of `sh` as "q:value" strings. */
  private def explodedQuarters: Column =
    explode(transform(sequence(lit(0), lit(3)),
      q => concat_ws(":", q,
        call_function("shiftright", col("sh"), q * 16)
          .bitwiseAND(0xFFFFL)))).as("bucket")

  /** Shared bucket-state step: compare arriving (id, simhash) rows against
    * the bucket's remembered signatures, emit hits, keep the newest
    * `maxBucket` signatures.
    */
  private def compareAndUpdate(rows: Iterator[(Long, Long)],
      state: GroupState[BucketState], maxHamming: Int,
      maxBucket: Int, newestTs: Long = 0L): Iterator[NearDupHit] = {
    var sigs = state.getOption.map(_.sigs).getOrElse(Nil)
    val hits = Seq.newBuilder[NearDupHit]
    // ascending doc id so same-batch comparisons are deterministic
    rows.toSeq.sortBy(_._1).foreach { case (id, sh) =>
      sigs.foreach { case (oldId, oldSh) =>
        if (oldId != id) {
          val d = java.lang.Long.bitCount(oldSh ^ sh)
          if (d <= maxHamming) hits += NearDupHit(id, oldId, d, sh, oldSh)
        }
      }
      sigs = ((id, sh) :: sigs).take(maxBucket)
    }
    state.update(BucketState(sigs, newestTs))
    hits.result().iterator
  }
}
