package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

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
}
