package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha beta gamma delta", true),
    (2L, "alpha beta epsilon zeta", true),
    (3L, "noise words only here", false),
    (4L, "other raw tokens again", false),
    (5L, "alpha beta mixed raw", false))
    .toDF("id", "text", "is_t")

  /** Driver replay of the exact operator arithmetic (same formulas, same
    * per-doc left-to-right sum), used to pin the Spark result.
    */
  private def expected: Map[Long, Double] = {
    val rows = Seq(
      (1L, "alpha beta gamma delta", true),
      (2L, "alpha beta epsilon zeta", true),
      (3L, "noise words only here", false),
      (4L, "other raw tokens again", false),
      (5L, "alpha beta mixed raw", false))
    def grams(t: String): Seq[String] =
      t.split(" ").toSeq.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
    def dim(g: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
      h(0) & 0xff
    }
    val ct = Array.fill(Dsir.Dims)(0L)
    val cr = Array.fill(Dsir.Dims)(0L)
    rows.foreach { case (_, t, isT) =>
      grams(t).foreach(g => (if (isT) ct else cr)(dim(g)) += 1)
    }
    val nt = ct.sum.toDouble
    val nr = cr.sum.toDouble
    val lr = Array.tabulate(Dsir.Dims) { d =>
      math.log((ct(d) + 1.0) / (nt + Dsir.Dims)) -
        math.log((cr(d) + 1.0) / (nr + Dsir.Dims))
    }
    rows.map { case (id, t, _) =>
      var acc = 0.0
      grams(t).foreach(g => acc = acc + lr(dim(g)))
      id -> BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }.toMap
  }

  test("importance weights match the hand-computed log-likelihood ratios") {
    val out = Dsir.importanceWeights(corpus, "id", "text", col("is_t"))
      .select("id", "is_target", "n_bigrams", "log_weight")
      .as[(Long, Boolean, Long, Double)].collect()
    assert(out.length == 5)
    val exp = expected
    out.foreach { case (id, _, nb, lw) =>
      assert(nb == 3, s"doc $id bigram count")
      assert(math.abs(lw - exp(id)) < 1e-9, s"doc $id: $lw vs ${exp(id)}")
    }
    // target-model grams score positive for target docs, negative for raw
    val byId = out.map(r => r._1 -> r._4).toMap
    assert(byId(1L) > 0 && byId(2L) > 0)
    assert(byId(3L) < 0 && byId(4L) < 0)
  }

  test("weights are deterministic and partitioning-independent") {
    val a = Dsir.importanceWeights(corpus, "id", "text", col("is_t"))
      .select("id", "log_weight").as[(Long, Double)].collect().toMap
    val b = Dsir.importanceWeights(corpus.repartition(7), "id", "text",
        col("is_t"))
      .select("id", "log_weight").as[(Long, Double)].collect().toMap
    assert(a == b)
  }
}
