package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  private def byCol(rows: Array[Row]): Map[String, Row] =
    rows.map(r => r.getString(0) -> r).toMap

  test("profile: exact per-column stats over a mixed-type frame") {
    val df = Seq(
      (1L, Some(2.0), Some("aa"), Some(true)),
      (2L, Some(4.0), Some("bbbb"), Some(false)),
      (3L, None, None, None),
      (4L, Some(4.0), Some("aa"), Some(true))
    ).toDF("id", "x", "s", "b")
    val p = Profiler.profile(df).collect()
    assert(p.length == 4)
    val m = byCol(p)
    // schema: col_name dtype n_rows n_nulls n_distinct min_num max_num
    //         mean_num min_str max_str avg_len
    val id = m("id")
    assert(id.getString(1) == "bigint" && id.getLong(2) == 4 &&
      id.getLong(3) == 0 && id.getLong(4) == 4)
    assert(id.getDouble(5) == 1.0 && id.getDouble(6) == 4.0 &&
      id.getDouble(7) == 2.5)
    val x = m("x")
    assert(x.getLong(3) == 1 && x.getLong(4) == 2)
    assert(x.getDouble(5) == 2.0 && x.getDouble(6) == 4.0)
    assert(math.abs(x.getDouble(7) - 10.0 / 3) < 1e-9)
    val s = m("s")
    assert(s.getLong(3) == 1 && s.getLong(4) == 2)
    assert(s.isNullAt(5) && s.isNullAt(7))
    assert(s.getString(8) == "aa" && s.getString(9) == "bbbb")
    assert(math.abs(s.getDouble(10) - 8.0 / 3) < 1e-9)
    val b = m("b")
    assert(b.getString(1) == "boolean" && b.getLong(4) == 2)
    assert(b.getDouble(5) == 0.0 && b.getDouble(6) == 1.0 &&
      math.abs(b.getDouble(7) - 2.0 / 3) < 1e-9)
  }

  test("profile: column subset and all-null column") {
    val df = Seq((1L, Option.empty[Double]), (2L, Option.empty[Double]))
      .toDF("id", "x")
    val p = byCol(Profiler.profile(df, Seq("x")).collect())
    assert(p.keySet == Set("x"))
    val x = p("x")
    assert(x.getLong(3) == 2 && x.getLong(4) == 0)
    assert(x.isNullAt(5) && x.isNullAt(6) && x.isNullAt(7))
  }

  test("approxProfile: estimates land within the rsd band") {
    val df = (1 to 5000).map(i => (i.toLong, (i % 97).toString))
      .toDF("id", "s")
    val rows = Profiler.approxProfile(df, rsd = 0.01).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("id", "s"))
    assert(math.abs(rows("id") - 5000.0) <= 0.05 * 5000)
    assert(math.abs(rows("s") - 97.0) <= 0.05 * 97 + 1)
  }
}
