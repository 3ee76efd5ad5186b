package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fastText-shaped linear text classifier — the trainable quality /
  * domain filter of CCNet-style pipelines (CCNet and RefinedWeb train a
  * fastText model on a curated-vs-crawl sample, then score the whole
  * corpus and keep the high-scoring tail). Spark-first split of the
  * work, mirroring [[Similarity.ivfIndex]]'s bounded-sample Lloyd
  * precedent and fastText's own single-node reality:
  *
  *   - TRAINING runs on the driver over a deterministic bounded sample
  *     (sort-by-id `limit`): hashed bag-of-tokens features (md5-prefix
  *     dims — the same engine-portable trick as the md5 split
  *     thresholds), full-batch logistic-regression gradient descent,
  *     sequential loops ⇒ bit-deterministic weights for a given corpus,
  *     independent of partitioning. A labeled training sample is small
  *     by construction at any corpus size (CCNet's fastText trains on a
  *     wiki sample, not the crawl).
  *   - SCORING is the corpus-scale side and stays fully distributed:
  *     the model is a 2 KB literal array embedded in ONE codegen'd
  *     column expression (split → md5-dim → weight lookup → mean →
  *     sigmoid), so scoring 100 TB is a narrow exchange-free scan — no
  *     join, no UDF, no shuffle.
  *
  * Feature map: token → dim = first byte of md5(token) (0..255 for the
  * default 256 dims); document vector = per-dim token frequencies
  * normalized by token count, so the margin is mean-over-tokens of
  * `w(dim(token))` plus bias and long documents don't saturate the
  * sigmoid.
  */
object Classifier {

  val Dims = 256

  /** Trained model: `weights(dimOf(token))`; probability of the positive
    * class = sigmoid(bias + mean over tokens of its weight).
    */
  final case class Model(bias: Double, weights: Array[Double])

  /** Driver twin of [[TextAnalysis.normalize]] (lower, strip non-alnum,
    * collapse spaces). ASCII-exact; training tolerates unicode edge
    * divergence (features are hashed noise either way).
    */
  private[operators] def normalizeStr(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim

  /** First md5 byte = the value of the hex prefix `substr(md5(t),1,2)` —
    * what [[scoreProb]] computes with `conv` in SQL.
    */
  private[operators] def dimOf(token: String): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8"))
    h(0) & 0xff
  }

  private def sigmoid(m: Double): Double = 1.0 / (1.0 + math.exp(-m))

  /** Train on a deterministic bounded sample: the `maxSample` smallest
    * rows by `(md5("clf:" + id), id)` (stable under partitioning AND
    * content-uniform — the [[Similarity.ivfIndex]] sampling contract; an
    * id-prefix sample would train only on the first corpus slice when
    * ids correlate with content). Batch GD sums the gradient over the
    * sample, so in-sample ORDER never affects the fit — only selection
    * does. `labelCol` must evaluate to 0.0/1.0.
    */
  def trainOnSample(docs: DataFrame, idCol: String, textCol: String,
      labelCol: Column, maxSample: Int = 10000, iters: Int = 300,
      lr: Double = 2.0): Model = {
    val sample = docs
      .sort(md5(concat(lit("clf:"), col(idCol).cast("string"))), col(idCol))
      .limit(maxSample)
      .select(col(textCol).cast("string"), labelCol.cast("double"))
      .collect()
      .map(r => (Option(r.getString(0)).getOrElse(""), r.getDouble(1)))
    require(sample.nonEmpty, "classifier: empty training sample")
    // sparse per-doc features, built once
    val feats = sample.map { case (text, y) =>
      val toks = normalizeStr(text).split(" ", -1)
      val m = new java.util.TreeMap[Int, Double]() // sorted ⇒ stable order
      toks.foreach { t =>
        val d = dimOf(t)
        m.put(d, m.getOrDefault(d, 0.0) + 1.0)
      }
      val n = toks.length.toDouble
      val dims = new Array[Int](m.size)
      val xs = new Array[Double](m.size)
      var i = 0
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next(); dims(i) = e.getKey; xs(i) = e.getValue / n; i += 1
      }
      (dims, xs, y)
    }
    val w = new Array[Double](Dims)
    var b = 0.0
    val inv = 1.0 / feats.length
    var it = 0
    while (it < iters) {
      val gw = new Array[Double](Dims)
      var gb = 0.0
      feats.foreach { case (dims, xs, y) =>
        var m = b
        var i = 0
        while (i < dims.length) { m += xs(i) * w(dims(i)); i += 1 }
        val err = sigmoid(m) - y
        gb += err
        i = 0
        while (i < dims.length) { gw(dims(i)) += err * xs(i); i += 1 }
      }
      var d = 0
      while (d < Dims) { w(d) -= lr * gw(d) * inv; d += 1 }
      b -= lr * gb * inv
      it += 1
    }
    Model(b, w)
  }

  /** P(positive) per row as ONE codegen'd expression over `textCol`: the
    * 256 weights ride as a literal array, the token dim is
    * `conv(substr(md5(token),1,2),16,10)` (== [[dimOf]]), the margin is
    * the token-mean weight plus bias. No UDF, no join, no shuffle.
    */
  def scoreProb(model: Model, textCol: Column): Column = {
    require(model.weights.length == Dims, "model dimensionality mismatch")
    val toks = split(TextAnalysis.normalize(textCol), " ")
    val wlit = array(model.weights.map(lit).toIndexedSeq: _*)
    val summed = aggregate(toks, lit(0.0d), (acc, t) =>
      acc + element_at(wlit,
        conv(substring(md5(t), 1, 2), 16, 10).cast("int") + 1))
    val margin = lit(model.bias) + summed / size(toks).cast("double")
    lit(1.0) / (lit(1.0) + exp(-margin))
  }
}
