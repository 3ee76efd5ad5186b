package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the attribution shape: each
  * left-stream row matched to right-stream rows with the same key whose
  * event time falls inside a bounded lookback window ending at the left
  * row's time. This is the one join class Structured Streaming can run
  * with BOUNDED state: the time-range conjunct plus both watermarks lets
  * Spark evict right-side state older than `left.ts − lookback − delay`
  * and left-side state past the watermark, so an indefinitely running
  * join holds one lookback+delay horizon of rows per side regardless of
  * stream length (without the range conjunct the state is unbounded —
  * that formulation is rejected here).
  *
  * Emission contract (what makes this batch-replayable): an INNER join
  * emits every match in the micro-batch where it forms, with no
  * watermark finalization wait — so a one-shot AvailableNow replay over
  * a bounded fixture emits exactly the batch inner join with the same
  * predicates, provided the watermark delay covers the fixture's
  * event-time disorder (state for a key is only evicted once the
  * watermark passes it; a delay ≥ the disorder means no match's partner
  * is evicted before the match forms).
  *
  * Reference model: corkscrew correlates change events to API actions
  * client-side after two range queries (internal/analytics/changes.go);
  * here the correlation runs incrementally with bounded state.
  */
object StreamJoin {

  /** Inner interval join: rows `(l.*, r.*)` where
    * `l.keyCol == r.keyCol` and `r.tsCol ∈ [l.tsCol − lookback, l.tsCol]`.
    * Column names are prefixed `l_`/`r_` so the two sides never clash.
    * Works identically on batch frames (watermarks are ignored in batch
    * plans — the intended batch twin).
    */
  /** Stream-static enrichment LEFT join — the other canonical streaming
    * join class: a high-volume event stream joined to a bounded
    * dimension table. STATELESS by construction (no state store at
    * all): the static side is re-planned inside every micro-batch, and
    * the explicit broadcast keeps the stream side exchange-free — at
    * production stream rates the enrichment adds zero shuffles and zero
    * state, so it composes freely in front of the stateful windowed
    * aggregations ([[WindowedAgg]]). LEFT (not inner) so an event whose
    * dimension row is missing survives with NULLs — dropping events on
    * dim gaps is the classic silent-loss bug in enrichment pipelines.
    * Batch-identical semantics: the same call on two batch frames is
    * the plain broadcast left join, which is what the oracle replays.
    *
    * Reference model: corkscrew enriches scanned resources against
    * typed service views at query time (pkg/query/engine.go join
    * surface); here the same enrichment runs incrementally.
    */
  def staticEnrich(stream: DataFrame, dim: DataFrame, streamKey: String,
      dimKey: String): DataFrame =
    stream.join(broadcast(dim), col(streamKey) === col(dimKey), "left")

  /** `joinType = "leftOuter"` adds the OUTER streaming contract: a left
    * row with no match emits ONCE, null-padded, when the watermark
    * proves no future right row can still join it (here: once
    * `wm > l.ts`, since admissible partners satisfy `r.ts <= l.ts` and
    * rights at or below the watermark are closed). Inner matches still
    * emit in the batch they form; only the null emission waits on the
    * watermark — which is why the AvailableNow replay of a bounded
    * fixture emits exactly (batch inner join) ∪ (unmatched lefts with
    * ts ≤ final watermark), and lefts above the final watermark are
    * still open state, emitted by neither engine.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, lookback: String, watermarkDelay: String,
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(tsCol, watermarkDelay)
      .select(left.columns.map(c => col(c).as(s"l_$c")).toIndexedSeq: _*)
    val r = right.withWatermark(tsCol, watermarkDelay)
      .select(right.columns.map(c => col(c).as(s"r_$c")).toIndexedSeq: _*)
    l.join(r,
      col(s"l_$keyCol") === col(s"r_$keyCol") &&
        col(s"r_$tsCol") >= col(s"l_$tsCol") - expr(s"INTERVAL $lookback") &&
        col(s"r_$tsCol") <= col(s"l_$tsCol"),
      joinType)
  }
}
