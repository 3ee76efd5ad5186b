package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def toy = Seq(
    (1L, "spam spam offer offer deal", 1.0),
    (2L, "offer spam deal spam spam", 1.0),
    (3L, "cheap offer spam deal now", 1.0),
    (4L, "report meeting agenda notes", 0.0),
    (5L, "quarterly meeting report notes", 0.0),
    (6L, "agenda notes report meeting", 0.0),
    (7L, "spam deal offer cheap now", 1.0),
    (8L, "meeting quarterly agenda report", 0.0))
    .toDF("id", "text", "y")

  test("separable toy corpus: trained scorer splits the classes at 0.5") {
    val model = Classifier.trainOnSample(toy, "id", "text", col("y"),
      iters = 2000, lr = 10.0)
    val probs = toy.select(col("y"),
        Classifier.scoreProb(model, col("text")).as("p"))
      .as[(Double, Double)].collect()
    probs.foreach { case (y, p) =>
      if (y > 0.5) assert(p > 0.5, s"positive scored $p")
      else assert(p < 0.5, s"negative scored $p")
    }
  }

  test("training is deterministic and partitioning-independent") {
    val m1 = Classifier.trainOnSample(toy, "id", "text", col("y"))
    val m2 = Classifier.trainOnSample(toy.repartition(7), "id", "text", col("y"))
    assert(m1.bias == m2.bias)
    assert(m1.weights.sameElements(m2.weights))
  }

  test("SQL scoring expression matches the driver-side arithmetic") {
    val model = Classifier.trainOnSample(toy, "id", "text", col("y"),
      iters = 500, lr = 5.0)
    val fromSql = toy.select(col("text"),
        Classifier.scoreProb(model, col("text")).as("p"))
      .as[(String, Double)].collect()
    fromSql.foreach { case (text, p) =>
      val toks = text.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .replaceAll(" +", " ").trim.split(" ", -1)
      val margin = model.bias +
        toks.map(t => model.weights(Classifier.dimOf(t))).sum / toks.length
      val expected = 1.0 / (1.0 + math.exp(-margin))
      assert(math.abs(p - expected) < 1e-9, s"'$text': $p vs $expected")
    }
  }

  test("bounded sample: training sees exactly the maxSample md5-smallest " +
      "ids (hash-uniform draw, not an id prefix)") {
    val extra = toy.unionByName(
      Seq((100L, "noise tokens here", 0.0)).toDF("id", "text", "y"))
    // replicate the sampling contract: smallest (md5("clf:"+id), id)
    val kept = extra
      .sort(md5(concat(lit("clf:"), col("id").cast("string"))), col("id"))
      .limit(8).select("id").as[Long].collect().toSet
    assert(kept.size == 8) // selection is some 8 of the 9 ids
    val m1 = Classifier.trainOnSample(extra, "id", "text", col("y"),
      maxSample = 8)
    val m2 = Classifier.trainOnSample(
      extra.filter(col("id").isin(kept.toSeq: _*)), "id", "text", col("y"))
    assert(m1.bias == m2.bias && m1.weights.sameElements(m2.weights))
    // and the 9th id is genuinely excluded: training on all 9 differs
    val mAll = Classifier.trainOnSample(extra, "id", "text", col("y"))
    assert(mAll.bias != m1.bias || !mAll.weights.sameElements(m1.weights))
  }
}
