package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JsonlCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha text", "en"), (2L, "beta \"quoted\" & <raw>", "en"),
    (3L, "newline\nand\ttab", "de"), (4L, null.asInstanceOf[String], "fr"))
    .toDF("doc_id", "text", "lang")

  test("round-trip preserves values incl. escapes, newlines, nulls") {
    val dir = tempDir("jsonl-rt").toString
    JsonlCorpus.write(docs, dir, "doc_id", shards = 2)
    val back = JsonlCorpus.read(spark, dir, docs.schema)
      .where(col("_corrupt_record").isNull)
      .select("doc_id", "text", "lang")
    val got = back.collect().map(r =>
      (r.getLong(0), Option(r.getString(1)), r.getString(2))).toSet
    val want = docs.collect().map(r =>
      (r.getLong(0), Option(r.getString(1)), r.getString(2))).toSet
    assert(got == want, got)
  }

  test("deterministic sharding: same file count, stable membership") {
    val d1 = tempDir("jsonl-s1").toString
    val d2 = tempDir("jsonl-s2").toString
    JsonlCorpus.write(docs, d1, "doc_id", shards = 3)
    JsonlCorpus.write(docs.repartition(7), d2, "doc_id", shards = 3)
    def shardOf(dir: String): Map[Long, String] =
      spark.read.schema(docs.schema).json(dir)
        .select(col("doc_id"), expr("substring_index(input_file_name(), '/', -1)"))
        .collect().map(r => r.getLong(0) -> r.getString(1).split("-")(1)).toMap
    assert(shardOf(d1) == shardOf(d2),
      "hash sharding must be input-partitioning independent")
  }

  test("malformed lines quarantine; schema columns NULL on those rows") {
    val dir = tempDir("jsonl-bad")
    JsonlCorpus.write(docs, dir.toString, "doc_id", shards = 1)
    java.nio.file.Files.writeString(dir.resolve("extra.json"),
      "{\"doc_id\": 9, \"text\": \"ok\", \"lang\": \"en\"}\n" +
        "{\"doc_id\": 10, \"text\": \"broken\n" + "not json at all\n")
    // Spark refuses plans that prune to ONLY the corrupt column
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize full rows first,
    // the same shape the q_io1 driver query uses.
    val rows = JsonlCorpus.read(spark, dir.toString, docs.schema, "bad")
      .collect()
    val bad = rows.filter(!_.isNullAt(3))
    assert(bad.length == 2, rows.mkString("\n"))
    assert(bad.forall(_.isNullAt(0)),
      "corrupt rows must not carry parsed fields")
    assert(rows.count(_.isNullAt(3)) == 5) // 4 docs + planted 9
  }

  test("guards: corrupt column clash and shard floor") {
    intercept[IllegalArgumentException] {
      JsonlCorpus.read(spark, "/nonexistent", docs.schema, "text")
    }
    intercept[IllegalArgumentException] {
      JsonlCorpus.write(docs, "/tmp/never", "doc_id", shards = 0)
    }
  }
}
