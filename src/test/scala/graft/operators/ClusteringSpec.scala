package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  /** Independent plain-Scala reference: same spec (floor-quantize, md5
    * seed order, integer argmin with lowest-cell ties, half-up integer
    * centroid means, empty cells keep their centroid) implemented as
    * driver loops with no Spark involvement.
    */
  private def refKmeans(points: Seq[(Long, Array[Float])], k: Int,
      iters: Int, scale: Int): Map[Long, (Int, Long)] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val m = Clustering.offsetFor(scale)
    val q = points.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * scale).toLong)
    }
    var cents: IndexedSeq[Array[Long]] = q
      .sortBy { case (id, _) => (md5hex(id.toString), id) }
      .take(k).map(_._2).toIndexedSeq
    def dist(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign(v: Array[Long]): Int =
      cents.indices.minBy(c => (dist(v, cents(c)), c))
    for (_ <- 1 to iters) {
      val groups = q.groupBy { case (_, v) => assign(v) }
      cents = cents.indices.map { c =>
        groups.get(c) match {
          case Some(vs) =>
            val n = vs.size.toLong
            Array.tabulate(cents(c).length) { d =>
              val s = vs.map(_._2(d)).sum
              (2L * (s + m * n) + n) / (2L * n) - m
            }
          case None => cents(c)
        }
      }
    }
    q.map { case (id, v) =>
      val c = assign(v); id -> (c, dist(v, cents(c)))
    }.toMap
  }

  private def mkPoints(n: Int, dim: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      // deterministic spread with negatives and exact-boundary values
      i.toLong -> Array.tabulate(dim)(d =>
        (((i * 31 + d * 7) % 41) - 20) / 10.0f)
    }

  test("kmeansExact matches the independent driver reference exactly") {
    val pts = mkPoints(60, 8)
    val df = pts.map { case (id, v) => (id, v.toSeq) }.toDF("vid", "emb")
    val out = Clustering.kmeansExact(df, "vid", "emb", k = 4, iters = 3)
      .as[(Long, Long, Long)].collect()
      .map { case (id, c, ds) => id -> (c.toInt, ds) }.toMap
    assert(out === refKmeans(pts, k = 4, iters = 3, scale = 1024))
  }

  test("deterministic across runs") {
    val pts = mkPoints(40, 6)
    val df = pts.map { case (id, v) => (id, v.toSeq) }.toDF("vid", "emb")
    def run() = Clustering.kmeansExact(df, "vid", "emb", k = 3, iters = 2)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(run() === run())
  }

  test("an emptied cell keeps its previous centroid and reports n = 0") {
    // two tight groups + one seed that immediately loses all points:
    // with k = 3 over 2 distinct locations, some cell must go empty
    val pts = (0L to 9L).map(i =>
      i -> Array.fill(4)(if (i < 5) 0.0f else 1.0f))
    val df = pts.map { case (id, v) => (id, v.toSeq) }.toDF("vid", "emb")
    val log = scala.collection.mutable.Map[Int, Seq[(Int, Long, Array[Long])]]()
    Clustering.kmeansExact(df, "vid", "emb", k = 3, iters = 2,
      centroidLog = (it, st) => log(it) = st).collect()
    val last = log(2)
    val empty = last.filter(_._2 == 0L)
    assert(empty.nonEmpty) // at least one cell starved
    // a starved cell's centroid equals its value in the previous iteration
    empty.foreach { case (c, _, cent) =>
      assert(cent.toSeq === log(1).find(_._1 == c).get._3.toSeq)
    }
    assert(out2CellCount(log(2)) == 10L)
  }

  private def out2CellCount(st: Seq[(Int, Long, Array[Long])]): Long =
    st.map(_._2).sum

  test("labelPrototypes: exact integer means per label, long-form") {
    // label 0: q-vectors [1024,0] and [0,1024] -> mean (512, 512)
    // label 1: [-1024,-1024] alone -> itself
    // label 2: [0,0] and [1,0] (from 0.001*1024=1.024 -> floor 1):
    //   dim0 sum 1, n 2 -> half-up mean of 0.5 -> 1
    val df = Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(0.0f, 1.0f)),
      (1, Seq(-1.0f, -1.0f)),
      (2, Seq(0.0f, 0.0f)), (2, Seq(0.001f, 0.0f)))
      .toDF("label", "emb")
    val out = Clustering.labelPrototypes(df, "label", "emb", dim = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (0L, 2L, 0L, 512L), (0L, 2L, 1L, 512L),
      (1L, 1L, 0L, -1024L), (1L, 1L, 1L, -1024L),
      (2L, 2L, 0L, 1L), (2L, 2L, 1L, 0L)))
  }

  test("labelOutliers ranks by distance to the label's own prototype") {
    // label 0: three points at x=1.0 and one stray at x=-1.0 -> the
    // stray is rank 1; label 1: two symmetric points tie -> min id first
    val df = Seq(
      (10L, 0, Seq(1.0f, 0.0f)), (11L, 0, Seq(1.0f, 0.0f)),
      (12L, 0, Seq(1.0f, 0.0f)), (13L, 0, Seq(-1.0f, 0.0f)),
      (20L, 1, Seq(0.0f, 1.0f)), (21L, 1, Seq(0.0f, -1.0f)))
      .toDF("vid", "lab", "emb")
    val out = Clustering.labelOutliers(df, "vid", "emb", "lab",
        k = 2, dim = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val l0 = out.filter(_._1 == 0L)
    assert(l0.head == (0L, 1L, 13L, l0.head._4)) // stray leads
    assert(l0.head._4 > l0(1)._4)
    val l1 = out.filter(_._1 == 1L).map(r => (r._2, r._3))
    assert(l1 == Seq((1L, 20L), (2L, 21L))) // symmetric tie -> min id
  }

  test("quantize floors (not rounds) and is exact on negatives") {
    val df = Seq((1L, Seq(-0.0001f, 0.5f, -0.5f, 0.9999f))).toDF("vid", "emb")
    val q = df.select(Clustering.quantize(col("emb"), 1024).as("q"))
      .as[Seq[Long]].first()
    assert(q === Seq(-1L, 512L, -512L, 1023L))
  }
}
