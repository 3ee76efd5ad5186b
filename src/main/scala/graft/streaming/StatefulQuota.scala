package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** Input row of the quota stream: one document with its token cost. */
case class QuotaDoc(doc_id: Long, source: String, n_tokens: Long)

/** Per-document admission decision. `admitted_total` is the key's
  * admitted-token running total AFTER this row's decision (unchanged on a
  * rejection — rejected documents consume no budget).
  */
case class QuotaDecision(doc_id: Long, source: String, n_tokens: Long,
    admitted: Boolean, admitted_total: Long)

/** Greedy per-key token-budget admission, one decision per arriving row:
  * admit while the key's admitted-token total stays within `budget`. The
  * single piece of state is that total — a `ValueState[Long]` per key —
  * so state size is O(keys), independent of stream length: the bounded
  * shape an ingest-quota gate needs at 100 TB.
  *
  * Rows within one micro-batch are folded in `doc_id` order (the batch's
  * iterator arrives in partition order, which is not a contract), so the
  * decision sequence is deterministic given the batch sequence — the
  * sort is per (key, batch) and bounded by batch size, not stream size.
  */
class QuotaProcessor(budget: Long)
    extends StatefulProcessor[String, QuotaDoc, QuotaDecision] {

  @transient private var total: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    total = getHandle.getValueState[Long]("admitted_total",
      Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[QuotaDoc],
      timerValues: TimerValues): Iterator[QuotaDecision] = {
    var t = if (total.exists()) total.get() else 0L
    val out = rows.toArray.sortBy(_.doc_id).map { d =>
      val ok = t + d.n_tokens <= budget
      if (ok) t += d.n_tokens
      QuotaDecision(d.doc_id, d.source, d.n_tokens, ok, t)
    }
    total.update(t)
    out.iterator
  }
}

/** Streaming per-key token-budget admission on the Spark 4
  * `transformWithState` arbitrary-state API (the successor to
  * `mapGroupsWithState`: typed per-key state handles + TTL + timers,
  * RocksDB-backed). This is the ingest-time quota/curation gate of a
  * training-data pipeline — cap each source's token contribution while
  * the corpus streams in, without ever holding more than one long per
  * source.
  */
object StatefulQuota {

  /** Admission decisions for a streaming `docs` frame. The caller's
    * query start must run under [[withRocksDb]] — `transformWithState`
    * supports only the RocksDB state-store provider.
    */
  def admit(docs: DataFrame, idCol: String, keyCol: String, nCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(keyCol).cast("string").as("source"),
        col(nCol).cast("long").as("n_tokens"))
      .as[QuotaDoc]
      .groupByKey(_.source)
      .transformWithState(new QuotaProcessor(budget), TimeMode.None(),
        OutputMode.Append())
      .toDF()
  }

  /** `transformWithState` rejects every provider except RocksDB, so this
    * forces it for the wrapped query start UNCONDITIONALLY (unlike
    * [[StateStores.withProvider]], which only honours an explicit
    * `graft.stateStore=rocksdb` policy) and restores the previous
    * provider conf afterwards.
    */
  def withRocksDb[A](spark: org.apache.spark.sql.SparkSession)(body: => A): A = {
    val prev = spark.conf.getOption(StateStores.ProviderConf)
    spark.conf.set(StateStores.ProviderConf, StateStores.RocksDbProvider)
    try body finally prev match {
      case Some(v) => spark.conf.set(StateStores.ProviderConf, v)
      case None => spark.conf.unset(StateStores.ProviderConf)
    }
  }
}
