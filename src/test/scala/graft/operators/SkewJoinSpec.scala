package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join matches the plain join and fans the hot key out") {
    // 10k rows of hot key 1, a tail of other keys
    val skewed = ((1 to 10000).map(i => (1L, s"v$i")) ++
      (2 to 50).map(i => (i.toLong, s"t$i"))).toDF("k", "payload")
    val dim = (1 to 50).map(i => (i.toLong, s"name$i")).toDF("k", "name")

    val plain = skewed.join(dim, Seq("k")).select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(skewed, dim, Seq("k"), salts = 8)
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)

    // the hot key's rows spread over >1 salt value
    val saltSpread = skewed
      .withColumn("_salt", pmod(xxhash64(skewed.columns.map(col): _*), lit(8L)))
      .filter(col("k") === 1L).select("_salt").distinct().count()
    assert(saltSpread > 4, s"hot key only hit $saltSpread salts")
  }

  test("left join preserves unmatched rows exactly once") {
    val skewed = Seq((1L, "a"), (1L, "b"), (99L, "nomatch")).toDF("k", "payload")
    val dim = Seq((1L, "one")).toDF("k", "name")
    val out = SkewJoin.saltedJoin(skewed, dim, Seq("k"), salts = 4, "left")
      .select("k", "payload", "name").collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) null else r.getString(2)))
    assert(out.length == 3)
    assert(out.count(_._1 == 99L) == 1 && out.find(_._1 == 99L).get._3 == null)
  }
}
