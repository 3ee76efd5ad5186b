package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardExportSpec extends SparkSpec {
  import spark.implicits._

  test("write: per-value file count is ceil(n/max), rows round-trip") {
    val dir = Files.createTempDirectory("graft-shard-spec").toString
    // 1000 'a' rows, 513 'b', 3 'c', over an 8-partition input frame so
    // the repartition-by-value is actually exercised
    val df = ((1 to 1000).map(i => (i.toLong, "a")) ++
      (2001 to 2513).map(i => (i.toLong, "b")) ++
      (3001 to 3003).map(i => (i.toLong, "c")))
      .toDF("id", "k").repartition(8)
    ShardExport.write(df, s"$dir/out", "k", maxRecordsPerFile = 512)
    val m = ShardExport.manifest(spark, s"$dir/out", "k", "id", 512)
      .collect().map(r => r.getAs[String]("k") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_files"),
         r.getAs[Long]("min_id"), r.getAs[Long]("max_id"),
         r.getAs[Boolean]("files_ok"))).toMap
    assert(m("a") == ((1000L, 2L, 1L, 1000L, true)))
    assert(m("b") == ((513L, 2L, 2001L, 2513L, true)))
    assert(m("c") == ((3L, 1L, 3001L, 3003L, true)))
    // the physical file cap holds: no file carries more than 512 rows
    val perFile = spark.read.parquet(s"$dir/out")
      .groupBy(input_file_name()).count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(perFile <= 512L, s"a shard file has $perFile rows")
  }
}
