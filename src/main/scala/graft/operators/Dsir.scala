package graft.operators

import graft.Barrier.BarrierOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection with importance resampling (after Xie et
  * al. 2023, arXiv:2302.03169): score every raw document by how much
  * more likely its hashed-n-gram bag is under a TARGET-domain model than
  * under the RAW-corpus model — `log w(x) = Σ_grams log p_t(g) −
  * log p_r(g)` with add-one smoothing — then feed the weights to the
  * md5-threshold samplers for the actual selection. This is the modern
  * "pick pretraining data that looks like the domain you care about"
  * method, the learned sibling of the heuristic quality filters (q_t19)
  * and the bigram-LM perplexity scorer (q_t20).
  *
  * Spark-first shape, same architecture as [[Classifier]] and the IVF
  * Lloyd step: the MODELS are bounded by construction — hashed bigram
  * dims are fixed (256 here; DSIR's 10k changes nothing structural), so
  * each model is one integer aggregation collapsing map-side to ≤ dims
  * rows, and the log-ratio table is computed once on the driver (the
  * only place a transcendental runs — cross-engine float discipline) and
  * embedded as a literal array. SCORING is then one exchange-free
  * codegen scan: per-doc `aggregate` over its bigram array, summed in
  * document order, so weights are bit-deterministic under any
  * partitioning. Total cost at 100 TB: two corpus scans (model + score)
  * and one dims-sized collect — the q_t20 budget.
  */
object Dsir {

  val Dims = 256

  /** Per-document importance weights: `(idCol, is_target, n_bigrams,
    * log_weight)` for EVERY input row (corpus bijection). `isTargetCol`
    * marks the target-domain sample (true rows train p_t, false rows
    * train p_r); both models are hashed-bigram bags with add-`smoothing`
    * Laplace smoothing. The gram dim is the md5 hex-prefix trick
    * (`conv(substr(md5(gram),1,2),16,10)`), portable to any engine.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTargetCol: Column, smoothing: Double = 1.0): DataFrame = {
    graft.functions.VecExprs.register(docs.sparkSession)
    def dimE(b: Column): Column =
      conv(substring(md5(b), 1, 2), 16, 10).cast("int")
    // bigram arrays are consumed twice (model pass + scoring pass);
    // checkpoint so the normalize/split/bigram work runs once
    val base = docs.select(col(idCol), isTargetCol.as("is_target"),
        call_function("bigrams",
          split(TextAnalysis.normalize(col(textCol)), " ")).as("bg"))
      .barrier(true)
    // fixed-dim models: one partial-agg aggregation, ≤ 2·Dims rows out
    val counts = base
      .select(col("is_target"), explode(col("bg")).as("b"))
      .select(col("is_target"), dimE(col("b")).as("dim"))
      .groupBy("is_target", "dim").agg(count(lit(1)).as("n"))
      .collect()
    val ct = Array.fill(Dims)(0L)
    val cr = Array.fill(Dims)(0L)
    counts.foreach { r =>
      (if (r.getBoolean(0)) ct else cr)(r.getInt(1)) = r.getLong(2)
    }
    val nt = ct.sum.toDouble
    val nr = cr.sum.toDouble
    // driver-only transcendentals; the executors see a literal table
    val lr = Array.tabulate(Dims) { d =>
      math.log((ct(d) + smoothing) / (nt + smoothing * Dims)) -
        math.log((cr(d) + smoothing) / (nr + smoothing * Dims))
    }
    val lrLit = array(lr.map(lit).toIndexedSeq: _*)
    base.select(col(idCol), col("is_target"),
      size(col("bg")).cast("bigint").as("n_bigrams"),
      round(aggregate(col("bg"), lit(0.0d), (acc, b) =>
        acc + element_at(lrLit, dimE(b) + 1)), 6).as("log_weight"))
  }
}
