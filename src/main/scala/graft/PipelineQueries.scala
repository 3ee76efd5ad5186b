package graft

import graft.Barrier.BarrierOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Training-data pipeline queries over `documents` / `embeddings`:
  * deduplication, text analysis, multimodal plumbing, similarity search.
  * Oracles follow the same determinism rules as [[Queries]]. Approximate
  * operators (MinHash, SimHash, LSH, IVF) get *emitted-row* oracles: the
  * candidate set is hash-specific (recall vs the exact counterpart is
  * asserted in ScalaTest), but every emitted row must carry an exact,
  * recomputable similarity — the oracle SQL reads the dumped Spark result
  * back (via the `__SPARK_OUT__` placeholder Verify resolves) and
  * recomputes each pair's metric from the raw tables, so wrong values,
  * threshold violations, and fabricated ids all fail the driver's compare.
  */
object PipelineQueries {

  import Queries.Q

  private def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    Tables.register(spark, dir)
    spark.table(name)
  }

  /** Staging root for cross-engine replay fixtures, keyed on the md5 of
    * the FULL dataset path — not `String.hashCode`, whose 32-bit space
    * collides across paths (and `abs(Int.MinValue)` is negative), so two
    * concurrent runs over different SFs could delete each other's
    * in-flight input. Always wiped before reuse.
    */
  private def stagingRoot(tag: String, d: String): java.nio.file.Path = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val root = java.nio.file.Paths.get(graft.Scratch.dir, tag, key)
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
    root
  }

  /** Spread a NARROW frame (ids + small scalars only) across all cores
    * before CPU-dense payload synthesis/decode: at fixture SF a table is
    * one small parquet file, so the scan yields ONE input partition and a
    * whole decode pass pins to one task (measured: q_m5's real GIF decode
    * as a single 1.25 s task). The inserted shuffle carries only the ids
    * — payloads are synthesized AFTER the exchange — so it is cheap at
    * every scale (the [[operators.Dedup]] spread-first discipline).
    */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  private def listParts(dir: java.nio.file.Path): Set[java.nio.file.Path] = {
    val walk = java.nio.file.Files.walk(dir)
    try {
      val out = Set.newBuilder[java.nio.file.Path]
      walk.filter(p => p.toString.endsWith(".parquet")
          && java.nio.file.Files.isRegularFile(p))
        .forEach(p => out += p)
      out.result()
    } finally walk.close()
  }

  /** Stage a deterministic two-micro-batch FileStreamSource input:
    * batch0 as an overwrite write, batch1 as an append, then FORCE
    * batch1's part files to strictly later mtimes than batch0's.
    * FileStreamSource orders files by modification time; two
    * sub-millisecond parquet writes can land on the same mtime, making
    * the trigger order — and with it the oracle's `(batch, id)` replay —
    * undefined (flaky red, not silent corruption). Returns the input dir.
    */
  private def stageTwoBatches(tag: String, d: String,
      batch0: DataFrame, batch1: DataFrame): String = {
    val dir = stagingRoot(tag, d).resolve("in")
    batch0.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val firstParts = listParts(dir)
    batch1.coalesce(1).write.mode("append").parquet(dir.toString)
    val maxFirst = firstParts
      .map(f => java.nio.file.Files.getLastModifiedTime(f).toMillis).max
    (listParts(dir) -- firstParts).foreach { f =>
      if (java.nio.file.Files.getLastModifiedTime(f).toMillis <= maxFirst)
        java.nio.file.Files.setLastModifiedTime(f,
          java.nio.file.attribute.FileTime.fromMillis(maxFirst + 2000L))
    }
    dir.toString
  }

  /** Shared DuckDB fragments: normalized text and its word list. */
  private val normSql =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
  private val wordsSql = s"string_split($normSql, ' ')"

  // ===== dedup =========================================================

  /** D1: per-document fingerprint + token count. */
  val d1Fingerprint: Q = (s, d) =>
    t(s, d, "documents").select(
      col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.tokenCount(col("text")).cast("bigint").as("n_tokens"))
  val d1Oracle =
    s"""SELECT doc_id, md5($normSql) AS fp,
       |  len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS n_tokens
       |FROM documents""".stripMargin

  /** D2: exact dedup — keep min-id per normalized-text group. */
  val d2DedupExact: Q = (s, d) =>
    Dedup.dedupExact(t(s, d, "documents"), "doc_id", "text")
      .select("doc_id", "source")
  val d2Oracle =
    s"""SELECT doc_id, source FROM documents
       |WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY md5($normSql))""".stripMargin

  /** D3: exact n-gram (3-shingle) Jaccard pairs within a source block. */
  val d3JaccardPairs: Q = (s, d) =>
    Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
        "source", w = 3, threshold = 0.2)
      .withColumnRenamed("blk", "source")
  val d3Oracle =
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |    list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
       |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       |  FROM (SELECT doc_id, source, $wordsSql AS w FROM documents) z),
       |p AS (
       |  SELECT a.source, a.doc_id AS id_a, b.doc_id AS id_b,
       |    ROUND(CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
       |      ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |           len(list_distinct(list_concat(a.sh, b.sh))) END, 6) AS jaccard
       |  FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id)
       |SELECT source, id_a, id_b, jaccard FROM p WHERE jaccard >= 0.2""".stripMargin

  /** Shared fixture for D16: a bounded corpus slice plus COMPOSITE
    * quote docs — every 20th doc's text concatenated with its
    * successor's — so each composite fully CONTAINS two originals
    * (containment 1.0) while its Jaccard to either is only ~0.5.
    * Identical SQL text runs in both engines.
    */
  private val d16RecsSql =
    """SELECT doc_id, text FROM documents WHERE doc_id < 200
      |UNION ALL
      |SELECT a.doc_id + 1000000, a.text || ' ' || b.text
      |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |WHERE a.doc_id % 20 = 0 AND a.doc_id < 200""".stripMargin

  /** D16: asymmetric containment near-dup ([[Dedup.containmentPairs]])
    * — the quote/subset detector: composites built from two originals
    * must surface with containment 1.0 against each (Jaccard ≈ 0.5
    * would slip any symmetric threshold — that's the operator's reason
    * to exist). Full SQL replay of shingles, the sorted-merge
    * intersect, and both containment directions.
    */
  val d16Containment: Q = (s, d) =>
    Dedup.containmentPairs(
      Tables.sql(s, d, d16RecsSql).select(col("doc_id"), col("text"),
        lit("x").as("blk")),
      "doc_id", "text", "blk", w = 3, threshold = 0.9)
      .select("id_a", "id_b", "cont_ab", "cont_ba")
  val d16Oracle: String =
    s"""WITH recs AS ($d16RecsSql),
       |t AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(
       |      generate_series(1, greatest(len(w) - 2, 0)),
       |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       |  FROM (SELECT doc_id, $wordsSql AS w FROM recs) z),
       |p AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS inter,
       |    len(a.sh) AS na, len(b.sh) AS nb
       |  FROM t a JOIN t b ON a.doc_id < b.doc_id)
       |SELECT id_a, id_b,
       |  ROUND(CASE WHEN na = 0 THEN 0.0 ELSE inter / na END, 6)
       |    AS cont_ab,
       |  ROUND(CASE WHEN nb = 0 THEN 0.0 ELSE inter / nb END, 6)
       |    AS cont_ba
       |FROM p
       |WHERE GREATEST(CASE WHEN na = 0 THEN 0.0 ELSE inter / na END,
       |               CASE WHEN nb = 0 THEN 0.0 ELSE inter / nb END)
       |      >= 0.9""".stripMargin

  /** Shared DuckDB fragment: distinct word 5-grams of the token list `w`
    * — the corpus-overlap / novelty shingle universe ([[Dedup.shingles]]
    * at w = 5; same inclusive generate_series convention as the d3
    * 3-gram fragment).
    */
  // NOTE single line: a continuation line starting with `||` would lose
  // one pipe to the EMBEDDING oracle's stripMargin and turn into bitwise-or.
  private val gram5Sql =
    "list_distinct(list_transform(generate_series(1, greatest(len(w) - 4, 0)), " +
      "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]))"

  /** D17: corpus-granularity overlap report ([[Dedup.corpusOverlap]]) —
    * exact 5-gram Jaccard between SOURCES rather than documents: the
    * train/test-split leakage check at corpus granularity (PaLM/GPT-3
    * style contamination audits report exactly this pair matrix). Full
    * relational replay: both engines build the distinct (corpus, gram)
    * set, intersect by equi-join, and derive union by
    * inclusion-exclusion.
    */
  val d17CorpusOverlap: Q = (s, d) =>
    Dedup.corpusOverlap(t(s, d, "documents"), "source", "text", w = 5)
  val d17Oracle: String =
    s"""WITH docg AS (
       |  SELECT source, $gram5Sql AS sh
       |  FROM (SELECT source, $wordsSql AS w FROM documents) z),
       |g AS (SELECT DISTINCT source AS corpus, gram
       |      FROM docg, UNNEST(sh) AS u(gram)),
       |per AS (SELECT corpus, CAST(COUNT(*) AS BIGINT) AS n
       |        FROM g GROUP BY 1),
       |i AS (SELECT x.corpus AS corpus_a, y.corpus AS corpus_b,
       |        CAST(COUNT(*) AS BIGINT) AS inter
       |      FROM g x JOIN g y ON x.gram = y.gram AND x.corpus < y.corpus
       |      GROUP BY 1, 2)
       |SELECT i.corpus_a, i.corpus_b, i.inter,
       |  CAST(a.n + b.n - i.inter AS BIGINT) AS union_n,
       |  ROUND(i.inter / (a.n + b.n - i.inter), 6) AS jaccard
       |FROM i
       |JOIN per a ON a.corpus = i.corpus_a
       |JOIN per b ON b.corpus = i.corpus_b""".stripMargin

  /** D18 fixture: a deterministic 20% corpus slice (bounds the oracle's
    * within-source quadratic truth join at the endurance SF — the full
    * d3 replay is the one DuckDB chain that DNFs at 10×) carrying
    * planted near-duplicates at two GRADED similarity tiers, because the
    * natural corpus has almost no pairs at the τ = 0.5 operating point
    * (q_d3 finds one): an identical clone (Jaccard 1.0 — every band
    * collides, detection certain) and a prefix clone of the first
    * 3n/5 + 1 tokens (a prefix's shingle set is a subset, so its
    * Jaccard is exactly (k−2)/(n−2) ≈ 0.6 — mid s-curve for the
    * 16-band/4-row scheme, where ~10% of pairs are EXPECTED to be
    * missed and recall is a real measurement, not a tautology; a
    * half-length prefix would land strictly BELOW τ and vanish from
    * the truth set). Both plants are pure integer arithmetic on the
    * normalized token list, so the DuckDB twin rebuilds the exact
    * corpus.
    */
  private val D18Thr = Sampling.hexThreshold(0.2)
  private val D18PlantThr = Sampling.hexThreshold(0.3)
  private def d18Corpus(docs0: DataFrame): DataFrame = {
    val toks = split(TextAnalysis.normalize(col("text")), " ")
    val docs = docs0
      .filter(Sampling.hashBucket(col("doc_id"), "d18") < lit(D18Thr))
      .select("doc_id", "source", "text")
    val eligible = docs.filter(size(toks) >= lit(8) &&
      Sampling.hashBucket(col("doc_id"), "d18plant") < lit(D18PlantThr))
    val full = eligible
      .withColumn("doc_id", col("doc_id") + lit(1000000000L))
    val prefix = eligible
      .withColumn("text", array_join(
        slice(toks, lit(1),
          floor((size(toks) * lit(3)) / lit(5)).cast("int") + lit(1)),
        " "))
      .withColumn("doc_id", col("doc_id") + lit(2000000000L))
    docs.unionByName(full).unionByName(prefix)
  }

  /** D18: LSH recall audit — the dedup-QA report a pipeline runs before
    * trusting MinHash+LSH as its only near-dup pass at 100 TB: the exact
    * within-source Jaccard truth set at the LSH operating threshold
    * (τ = 0.5), each truth pair flagged with whether the banded
    * candidate generation ([[Dedup.minhashNearDups]], the q_d4 system)
    * surfaced it. Truth is the [[Dedup.ngramJaccardPairs]] blocked
    * shingle join (the q_d3 exact engine); recall is then a one-line
    * aggregation over this frame. Oracle: FULL relational replay of the
    * truth side (sampled + planted corpus, shingles, within-source
    * pairs, exact Jaccard) with the hash-specific `lsh_found` flag read
    * back from the emitted rows under a set-equality guard — a missing
    * or invented truth pair, or a wrong Jaccard, empties the oracle and
    * turns the driver red; the flag itself is deterministic (seeded
    * minhash) and rides through the hash compare.
    */
  val d18LshRecall: Q = (s, d) => {
    val corpus = d18Corpus(t(s, d, "documents"))
    val truth = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", "source",
        w = 3, threshold = 0.5)
      .withColumnRenamed("blk", "source")
    val found = Dedup.minhashNearDups(corpus, "doc_id", "text",
        threshold = 0.5)
      .select(col("id_a"), col("id_b"), lit(true).as("_hit"))
    truth.join(found, Seq("id_a", "id_b"), "left")
      .select(col("source"), col("id_a"), col("id_b"), col("jaccard"),
        coalesce(col("_hit"), lit(false)).as("lsh_found"))
  }
  val d18Oracle: String =
    s"""WITH base AS MATERIALIZED (
       |  SELECT doc_id, source, text, $wordsSql AS w FROM documents
       |  WHERE substr(md5('d18:' || CAST(doc_id AS STRING)), 1, 8) < '$D18Thr'),
       |el AS (
       |  SELECT * FROM base WHERE len(w) >= 8
       |    AND substr(md5('d18plant:' || CAST(doc_id AS STRING)), 1, 8)
       |        < '$D18PlantThr'),
       |corpus AS (
       |  SELECT doc_id, source, text FROM base
       |  UNION ALL SELECT doc_id + 1000000000, source, text FROM el
       |  UNION ALL SELECT doc_id + 2000000000, source,
       |    array_to_string(w[1:((len(w) * 3) // 5 + 1)], ' ') FROM el),
       |t AS MATERIALIZED (
       |  SELECT doc_id, source,
       |    list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
       |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       |  FROM (SELECT doc_id, source, $wordsSql AS w FROM corpus) z),
       |tr AS (
       |  SELECT source, id_a, id_b, jaccard FROM (
       |    SELECT a.source, a.doc_id AS id_a, b.doc_id AS id_b,
       |      ROUND(CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0
       |        THEN 0.0
       |        ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |             len(list_distinct(list_concat(a.sh, b.sh))) END, 6)
       |        AS jaccard
       |    FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id) p
       |  WHERE jaccard >= 0.5),
       |sp AS (SELECT id_a, id_b, lsh_found
       |       FROM '__SPARK_OUT__/q_d18_lsh_recall/*.parquet'),
       |-- flag floor: identical-clone plants (id_b = id_a + 1e9, Jaccard
       |-- 1.0) have identical minhash signatures, so the banded join MUST
       |-- surface them regardless of seed — a flag-join regression that
       |-- marks everything false cannot pass silently
       |ok AS (SELECT (SELECT COUNT(*) FROM sp) = (SELECT COUNT(*) FROM tr)
       |         AND NOT EXISTS (SELECT 1 FROM sp
       |                         WHERE id_a < 1000000000
       |                           AND id_b = id_a + 1000000000
       |                           AND NOT lsh_found)
       |         AS complete)
       |SELECT tr.source, tr.id_a, tr.id_b, tr.jaccard, sp.lsh_found
       |FROM tr JOIN sp USING (id_a, id_b)
       |WHERE (SELECT complete FROM ok)""".stripMargin

  /** T44: n-gram novelty / memorization-risk report
    * ([[TextAnalysis.noveltyReport]]) — per source, the share of its
    * documents' distinct 5-grams that are corpus-common (document
    * frequency >= 2): the boilerplate/templating signal that predicts
    * verbatim memorization. Integer-exact by construction (long counts,
    * one final double division), fully replayed relationally.
    */
  val t44Novelty: Q = (s, d) =>
    TextAnalysis.noveltyReport(t(s, d, "documents"), "doc_id", "source",
      "text", w = 5)

  /** T45: conversation / turn-structure QA ([[Analytics.conversationQa]])
    * — chat-transcript ingest validation for instruction-tuning data:
    * per conversation (user stream), role-alternation breaks, stale
    * gaps (> 1 h), empty content, and the derived clean flag. Fully
    * replayed relationally with the a31 epoch idiom (Spark
    * `ts.cast(long)` ≡ DuckDB `epoch_us // 1000000`).
    */
  val t45ConversationQa: Q = (s, d) =>
    Analytics.conversationQa(t(s, d, "events"), "user_id", "ts",
      "event_id", "event_type", "props", staleGapSec = 3600L)
  val t45Oracle: String =
    """WITH o AS (
      |  SELECT user_id, event_type, props,
      |    LAG(event_type) OVER w AS prev_role,
      |    epoch_us(ts) // 1000000 -
      |      LAG(epoch_us(ts) // 1000000) OVER w AS gap_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
      |  CAST(SUM(CASE WHEN event_type = prev_role THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_role_repeats,
      |  CAST(SUM(CASE WHEN gap_s > 3600 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_stale_gaps,
      |  CAST(SUM(CASE WHEN props IS NULL OR props = '' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_empty,
      |  (SUM(CASE WHEN event_type = prev_role THEN 1 ELSE 0 END) = 0
      |   AND SUM(CASE WHEN gap_s > 3600 THEN 1 ELSE 0 END) = 0
      |   AND SUM(CASE WHEN props IS NULL OR props = '' THEN 1 ELSE 0 END)
      |       = 0) AS clean
      |FROM o GROUP BY user_id""".stripMargin
  val t44Oracle: String =
    s"""WITH docg AS (
       |  SELECT doc_id, source, $gram5Sql AS sh
       |  FROM (SELECT doc_id, source, $wordsSql AS w FROM documents) z),
       |dg AS (SELECT doc_id, source, gram FROM docg, UNNEST(sh) AS u(gram)),
       |gdf AS (SELECT gram, COUNT(*) AS gdf FROM dg GROUP BY 1),
       |per AS (
       |  SELECT d.doc_id, d.source, CAST(COUNT(*) AS BIGINT) AS n_grams,
       |    CAST(SUM(CASE WHEN g.gdf >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_common
       |  FROM dg d JOIN gdf g USING (gram) GROUP BY 1, 2)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_grams) AS BIGINT) AS sum_grams,
       |  CAST(SUM(n_common) AS BIGINT) AS sum_common,
       |  ROUND(SUM(n_common) / SUM(n_grams), 6) AS common_share,
       |  CAST(SUM(CASE WHEN 2 * (n_grams - n_common) >= n_grams
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_high_novelty
       |FROM per GROUP BY source""".stripMargin

  /** Planted-duplicate fixture for the near-dup completeness oracles: an
    * identical-text clone (`doc_id + PlantOffset`) of a deterministic ~2%
    * of documents. Identical text makes detection CERTAIN, not
    * probabilistic — MinHash signatures are equal so every band bucket
    * collides, and SimHash hashes are equal so hamming is 0 — which lets
    * the oracle REQUIRE every planted pair among the emitted rows:
    * under-emission (a missing or deleted row) empties the oracle result
    * and turns the driver red, closing the recall blind spot that a pure
    * emitted-row oracle has. Only docs with at least `shingleW` (3)
    * normalized tokens are planted: a shorter doc has an EMPTY 3-shingle
    * set, so its clone pair has Jaccard 0 and minhashNearDups correctly
    * never emits it — planting one would turn the guard spuriously red
    * on a fixture that happens to contain sub-3-token docs. The token
    * predicate is mirrored exactly in the DuckDB plant CTE.
    */
  private val PlantOffset = 1000000000L
  private val PlantThr = Sampling.hexThreshold(0.02)
  private def withPlantedClones(docs: DataFrame): DataFrame =
    docs.unionByName(
      docs.filter(Sampling.hashBucket(col("doc_id"), "plant") < lit(PlantThr)
          && size(split(TextAnalysis.normalize(col("text")), " ")) >= 3)
        .withColumn("doc_id", col("doc_id") + lit(PlantOffset)))
  /** DuckDB twins of the plant: the cloned subset and the augmented corpus. */
  private val plantSql =
    s"""SELECT doc_id, text FROM documents
       |  WHERE substr(md5('plant:' || CAST(doc_id AS STRING)), 1, 8) < '$PlantThr'
       |    AND len($wordsSql) >= 3""".stripMargin
  private val plantedCorpusSql =
    s"""SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + $PlantOffset, text FROM plant""".stripMargin

  /** D4: MinHash+LSH near-dups, verified by exact Jaccard. Candidate
    * generation is hash-specific (recall vs D3 asserted in DedupSpec),
    * but every *emitted* pair is exact — so the oracle reads the emitted
    * pairs back and recomputes their 3-shingle Jaccard from the raw text
    * in DuckDB: a wrong similarity, a below-threshold pair, or a
    * fabricated doc id all turn the row red. Completeness: the corpus
    * carries planted identical clones ([[withPlantedClones]]) and the
    * oracle requires every planted pair to be present.
    */
  val d4MinhashNearDup: Q = (s, d) =>
    Dedup.minhashNearDups(withPlantedClones(t(s, d, "documents")),
        "doc_id", "text", threshold = 0.2)
      .select("id_a", "id_b", "jaccard")
  val d4Oracle =
    s"""WITH sp AS (
       |  SELECT id_a, id_b FROM '__SPARK_OUT__/q_d4_minhash_neardup/*.parquet'),
       |plant AS ($plantSql),
       |corpus AS ($plantedCorpusSql),
       |t AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
       |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       |  FROM (SELECT doc_id, $wordsSql AS w FROM corpus) z
       |  WHERE doc_id IN (SELECT id_a FROM sp UNION SELECT id_b FROM sp)),
       |p AS (
       |  SELECT sp.id_a, sp.id_b,
       |    ROUND(CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
       |      ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |           len(list_distinct(list_concat(a.sh, b.sh))) END, 6) AS jaccard
       |  FROM sp JOIN t a ON a.doc_id = sp.id_a JOIN t b ON b.doc_id = sp.id_b),
       |ok AS (
       |  SELECT NOT EXISTS (SELECT 1 FROM plant pl WHERE NOT EXISTS (
       |    SELECT 1 FROM sp WHERE sp.id_a = pl.doc_id
       |      AND sp.id_b = pl.doc_id + $PlantOffset)) AS complete)
       |SELECT id_a, id_b, jaccard FROM p
       |WHERE jaccard >= 0.2 AND (SELECT complete FROM ok)""".stripMargin

  /** D5: SimHash near-dup pairs. The signature is hash-specific
    * (bit-parity with the HOF twin asserted in DedupSpec), so both
    * signatures ride along and the oracle recomputes
    * hamming = popcount(sh_a XOR sh_b) in DuckDB, enforces the ≤3
    * threshold and id ordering, and joins both ids back to the corpus —
    * wrong arithmetic, threshold violations, and invented ids all fail.
    * Completeness: planted identical clones must all appear with
    * hamming 0 (identical text ⇒ identical simhash ⇒ pigeonhole
    * quarter-block collision is certain).
    */
  val d5SimhashNearDup: Q = (s, d) =>
    Dedup.simhashNearDups(withPlantedClones(t(s, d, "documents")),
      "doc_id", "text", maxHamming = 3)
  val d5Oracle =
    s"""WITH sp AS (
       |  SELECT * FROM '__SPARK_OUT__/q_d5_simhash_neardup/*.parquet'),
       |plant AS ($plantSql),
       |corpus AS ($plantedCorpusSql),
       |ok AS (
       |  SELECT NOT EXISTS (SELECT 1 FROM plant pl WHERE NOT EXISTS (
       |    SELECT 1 FROM sp WHERE sp.id_a = pl.doc_id
       |      AND sp.id_b = pl.doc_id + $PlantOffset
       |      AND sp.hamming = 0)) AS complete)
       |SELECT sp.id_a, sp.id_b, sp.sh_a, sp.sh_b, sp.hamming
       |FROM sp
       |JOIN corpus da ON da.doc_id = sp.id_a
       |JOIN corpus db ON db.doc_id = sp.id_b
       |WHERE bit_count(xor(sp.sh_a, sp.sh_b)) = sp.hamming
       |  AND sp.hamming <= 3 AND sp.id_a < sp.id_b
       |  AND (SELECT complete FROM ok)""".stripMargin

  /** D14: exact global set-similarity join via df-ordered prefix
    * filtering ([[Dedup.ppjoinPairs]]) — no blocking key, no LSH
    * probability: prefix filtering is provably COMPLETE, so the oracle
    * is a FULL REPLAY of the chain (shingle → df rank → Jaccard prefix
    * → length-filtered candidate join → exact verify) over the planted
    * corpus, not an emitted-row echo. The Spark side orders prefixes by
    * (df, shingle-hash) and DuckDB by (df, shingle-string) — different
    * total orders, same final pairs, BECAUSE completeness holds under
    * any global order and the ≥ t verify is exact on both sides; a
    * lost pair, fabricated pair, or wrong similarity is a row/hash
    * mismatch. Planted identical clones guarantee non-empty output.
    */
  val d14PpjoinPairs: Q = (s, d) =>
    Dedup.ppjoinPairs(withPlantedClones(t(s, d, "documents")),
      "doc_id", "text", w = 3, threshold = 0.5)
  val d14Oracle =
    s"""WITH plant AS ($plantSql),
       |corpus AS ($plantedCorpusSql),
       |sh AS (
       |  SELECT doc_id,
       |    list_sort(list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
       |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS sh
       |  FROM (SELECT doc_id, $wordsSql AS w FROM corpus) z),
       |ex AS (SELECT doc_id, unnest(sh) AS tok FROM sh),
       |dfreq AS (SELECT tok, COUNT(*) AS df FROM ex GROUP BY tok),
       |pref AS (
       |  SELECT r.tok, r.doc_id, r.n FROM (
       |    SELECT e.doc_id, e.tok, len(s.sh) AS n,
       |      ROW_NUMBER() OVER (PARTITION BY e.doc_id ORDER BY d.df, e.tok) AS rn
       |    FROM ex e JOIN dfreq d USING (tok) JOIN sh s USING (doc_id)) r
       |  WHERE r.rn <= r.n - CAST(CEIL(0.5 * r.n) AS INT) + 1),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM pref a JOIN pref b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |    AND a.n * 0.5 <= b.n AND b.n * 0.5 <= a.n),
       |p AS (
       |  SELECT id_a, id_b,
       |    ROUND(CASE WHEN len(list_distinct(list_concat(x.sh, y.sh))) = 0 THEN 0.0
       |      ELSE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
       |           len(list_distinct(list_concat(x.sh, y.sh))) END, 6) AS jaccard
       |  FROM cand JOIN sh x ON x.doc_id = cand.id_a
       |             JOIN sh y ON y.doc_id = cand.id_b)
       |SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.5""".stripMargin

  /** D15: incremental near-dup against a PERSISTED MinHash signature
    * index ([[Dedup.incrementalNearDups]]) — the nightly-ingest shape
    * for NEAR duplicates, complementing q_d11's exact cross-batch
    * Bloom: the history corpus is reduced once to a
    * [[Dedup.signatureFrame]] committed in the transactional snapshot
    * store, and the incoming batch band-joins against that index
    * without rescanning any history text. Verification is exact
    * (persisted shingle hashes), so the emitted contract matches q_d4:
    * every emitted pair's Jaccard is recomputed from raw text by the
    * oracle, membership joins pin the orientation (id_new ∈ incoming,
    * id_hist ∈ history), and planted history clones in the incoming
    * batch MUST all be found (identical text ⇒ identical signatures ⇒
    * candidate certain ⇒ exact 1.0).
    */
  val d15IncrementalNearDup: Q = (s, d) => {
    val root = stagingRoot("graft-snap-qd15", d)
    val store = new graft.catalog.SnapshotTableStore(root.toString)
    val docs = t(s, d, "documents")
    val histThr = Sampling.hexThreshold(0.8)
    val hist = docs.filter(
      Sampling.hashBucket(col("doc_id"), "incr") < lit(histThr))
    val incNew = docs.filter(
      Sampling.hashBucket(col("doc_id"), "incr") >= lit(histThr))
    val plants = hist.filter(
        Sampling.hashBucket(col("doc_id"), "plant2")
          < lit(Sampling.hexThreshold(0.05))
        && size(split(TextAnalysis.normalize(col("text")), " ")) >= 3)
      .withColumn("doc_id", col("doc_id") + lit(PlantOffset))
    val incoming = incNew.unionByName(plants)
    store.overwrite(Dedup.signatureFrame(hist, "doc_id", "text")
      .coalesce(4), "minhash_index")
    val index = store.read(s, "minhash_index")
    Dedup.incrementalNearDups(incoming, "doc_id", "text", index,
      threshold = 0.5)
  }
  val d15Oracle: String = {
    val histThr = Sampling.hexThreshold(0.8)
    val plantThr = Sampling.hexThreshold(0.05)
    s"""WITH sp AS (
       |  SELECT id_new, id_hist, jaccard
       |  FROM '__SPARK_OUT__/q_d15_incremental_neardup/*.parquet'),
       |hist AS (SELECT doc_id, text FROM documents
       |  WHERE substr(md5('incr:' || CAST(doc_id AS STRING)), 1, 8) < '$histThr'),
       |incnew AS (SELECT doc_id, text FROM documents
       |  WHERE substr(md5('incr:' || CAST(doc_id AS STRING)), 1, 8) >= '$histThr'),
       |plant AS (SELECT doc_id, text FROM hist
       |  WHERE substr(md5('plant2:' || CAST(doc_id AS STRING)), 1, 8) < '$plantThr'
       |    AND len($wordsSql) >= 3),
       |incoming AS (
       |  SELECT doc_id + $PlantOffset AS doc_id, text FROM plant
       |  UNION ALL SELECT doc_id, text FROM incnew),
       |corpus AS (SELECT doc_id, text FROM hist
       |  UNION ALL SELECT doc_id, text FROM incoming),
       |t AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
       |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       |  FROM (SELECT doc_id, $wordsSql AS w FROM corpus) z
       |  WHERE doc_id IN (SELECT id_new FROM sp UNION SELECT id_hist FROM sp)),
       |p AS (
       |  SELECT sp.id_new, sp.id_hist,
       |    ROUND(CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
       |      ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |           len(list_distinct(list_concat(a.sh, b.sh))) END, 6) AS jaccard
       |  FROM sp
       |  JOIN t a ON a.doc_id = sp.id_new
       |  JOIN t b ON b.doc_id = sp.id_hist
       |  JOIN incoming i ON i.doc_id = sp.id_new
       |  JOIN hist h ON h.doc_id = sp.id_hist),
       |ok AS (
       |  SELECT NOT EXISTS (SELECT 1 FROM plant pl WHERE NOT EXISTS (
       |    SELECT 1 FROM sp WHERE sp.id_new = pl.doc_id + $PlantOffset
       |      AND sp.id_hist = pl.doc_id)) AS complete)
       |SELECT id_new, id_hist, jaccard FROM p
       |WHERE jaccard >= 0.5 AND (SELECT complete FROM ok)""".stripMargin
  }

  /** ST10: cross-micro-batch EXACT streaming dedup
    * ([[graft.streaming.StreamingDedup.exact]], Spark's keyed
    * dropDuplicates state) — the canonical ingest-time dedup: the
    * corpus is staged as one file plus a clone file (a deterministic 5%
    * re-delivered with new ids), the stream processes ONE FILE PER
    * MICRO-BATCH (maxFilesPerTrigger=1), so suppressing the clones
    * requires fingerprint state to survive across batches. The emitted
    * frame is the kept rows' fingerprint set — identical no matter
    * which twin the state keeps — and the oracle is the corpus's
    * distinct normalized-text hash set: a broken or batch-local dedup
    * emits extra rows and goes red on row count.
    */
  val st10StreamDedup: Q = (s, d) => {
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val dir = stageTwoBatches("graft-stream-qst10", d,
      docs,
      docs.filter(Sampling.hashBucket(col("doc_id"), "replant")
          < lit(Sampling.hexThreshold(0.05)))
        .withColumn("doc_id", col("doc_id") + lit(PlantOffset)))
    val stream = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val kept = graft.streaming.StreamingDedup.exact(stream, "text")
    graft.streaming.Replay.availableNow(
      kept.select(TextAnalysis.fingerprint(col("text")).as("fp")))
  }
  val st10Oracle: String =
    s"""SELECT DISTINCT md5($normSql) AS fp FROM documents""".stripMargin

  /** ST14: streaming per-source token-budget admission on the Spark 4
    * `transformWithState` arbitrary-state API
    * ([[graft.streaming.StatefulQuota]]) — the ingest-quota gate of a
    * streaming curation pipeline: each source may contribute at most
    * `budget` tokens; a rejected document consumes nothing, so a later
    * smaller one can still fit (greedy admission, NOT a prefix cut).
    * State is one long per source (`ValueState`, RocksDB-backed — the
    * only provider transformWithState supports), so state size is
    * O(sources) regardless of stream length. The corpus streams in two
    * deterministic micro-batches (hash-split files, one per trigger);
    * decisions inside a batch fold in doc_id order. The oracle replays
    * the ENTIRE admission sequence with a recursive CTE — the greedy
    * fold is inherently sequential, which is exactly what the operator
    * exists to compute incrementally — so a wrong order, a rejection
    * that consumed budget, or state lost between batches all go red.
    */
  private val St14Budget = 800L
  private val St14BatchThr = Sampling.hexThreshold(0.5)
  val st14TokenQuota: Q = (s, d) => {
    val docs = t(s, d, "documents").select(col("doc_id"), col("source"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    val batchKey = Sampling.hashBucket(col("doc_id"), "qb")
    val dir = stageTwoBatches("graft-stream-qst14", d,
      docs.filter(batchKey < lit(St14BatchThr)),
      docs.filter(batchKey >= lit(St14BatchThr)))
    val stream = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val decided = graft.streaming.StatefulQuota.admit(
      stream, "doc_id", "source", "n_tokens", St14Budget)
    graft.streaming.StatefulQuota.withRocksDb(s) {
      graft.streaming.Replay.availableNow(decided)
    }
  }
  val st14Oracle: String =
    s"""WITH RECURSIVE inp AS MATERIALIZED (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '))
       |      AS BIGINT) AS n_tokens,
       |    CASE WHEN substr(md5('qb:' || CAST(doc_id AS STRING)), 1, 8)
       |         < '$St14BatchThr' THEN 0 ELSE 1 END AS batch
       |  FROM documents),
       |ord AS MATERIALIZED (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
       |    ORDER BY batch, doc_id) AS rn FROM inp),
       |fold AS (
       |  SELECT source, rn, doc_id, n_tokens,
       |    (n_tokens <= $St14Budget) AS admitted,
       |    CASE WHEN n_tokens <= $St14Budget THEN n_tokens ELSE 0 END
       |      AS admitted_total
       |  FROM ord WHERE rn = 1
       |  UNION ALL
       |  SELECT o.source, o.rn, o.doc_id, o.n_tokens,
       |    (f.admitted_total + o.n_tokens <= $St14Budget) AS admitted,
       |    CASE WHEN f.admitted_total + o.n_tokens <= $St14Budget
       |         THEN f.admitted_total + o.n_tokens
       |         ELSE f.admitted_total END AS admitted_total
       |  FROM fold f JOIN ord o ON o.source = f.source AND o.rn = f.rn + 1)
       |SELECT doc_id, source, n_tokens, admitted, admitted_total
       |FROM fold""".stripMargin

  /** ST15: streaming per-key lag features on `ListState`
    * ([[graft.streaming.StatefulLag]]) — the online feature-store
    * primitive: for every arriving event, the user's previous ≤3 values
    * (oldest-first), state hard-bounded at 3 longs per key regardless of
    * stream length. Same two-deterministic-micro-batch staging as ST14;
    * values ride as floor-milli longs so the carried string is exact
    * cross-engine. Unlike ST14's inherently-sequential quota fold, the
    * lag contract IS a window — so the oracle replays it relationally as
    * `ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING` over `(batch, event_id)`
    * order: a wrong fold order, a leaked cross-key value, or a buffer
    * that forgot to trim all shift some row's `prev` string and fail the
    * hash compare.
    */
  private val St15BatchThr = Sampling.hexThreshold(0.5)
  val st15LagFeatures: Q = (s, d) => {
    val ev = t(s, d, "events").select(col("event_id"), col("user_id"),
      floor(col("value") * lit(1000)).cast("long").as("vmilli"))
    val batchKey = Sampling.hashBucket(col("event_id"), "lb")
    val dir = stageTwoBatches("graft-stream-qst15", d,
      ev.filter(batchKey < lit(St15BatchThr)),
      ev.filter(batchKey >= lit(St15BatchThr)))
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val lagged = graft.streaming.StatefulLag.lastK(
      stream, "event_id", "user_id", "vmilli", k = 3)
    graft.streaming.StatefulQuota.withRocksDb(s) {
      graft.streaming.Replay.availableNow(lagged)
    }
  }
  val st15Oracle: String =
    s"""WITH inp AS MATERIALIZED (
       |  SELECT event_id, user_id,
       |    CAST(FLOOR(value * 1000) AS BIGINT) AS vmilli,
       |    CASE WHEN substr(md5('lb:' || CAST(event_id AS STRING)), 1, 8)
       |         < '$St15BatchThr' THEN 0 ELSE 1 END AS batch
       |  FROM events),
       |w AS (
       |  SELECT event_id, user_id, vmilli,
       |    list(vmilli) OVER (PARTITION BY user_id ORDER BY batch, event_id
       |      ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS pl
       |  FROM inp)
       |SELECT event_id, user_id, vmilli,
       |  CAST(COALESCE(len(pl), 0) AS BIGINT) AS n_prev,
       |  COALESCE(array_to_string(pl, ','), '') AS prev
       |FROM w""".stripMargin

  /** ST16: streaming per-(user, event_type) running counters on
    * `MapState` ([[graft.streaming.StatefulCounts]]) — the third typed
    * state handle of the transformWithState trio (ST14 = ValueState,
    * ST15 = ListState): for each arriving event, how many prior events
    * of the same (user, type) the stream has seen — the online
    * visit-count / session-depth feature. State per user is one long
    * per event type actually seen (bounded by type cardinality, never
    * stream length). Same staging as ST14/ST15; the oracle replays the
    * count relationally as an unbounded-preceding window over
    * `(batch, event_id)` order.
    */
  private val St16BatchThr = Sampling.hexThreshold(0.5)
  val st16RunningCounts: Q = (s, d) => {
    val ev = t(s, d, "events").select(col("event_id"), col("user_id"),
      col("event_type"))
    val batchKey = Sampling.hashBucket(col("event_id"), "cb")
    val dir = stageTwoBatches("graft-stream-qst16", d,
      ev.filter(batchKey < lit(St16BatchThr)),
      ev.filter(batchKey >= lit(St16BatchThr)))
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val counted = graft.streaming.StatefulCounts.runningCounts(
      stream, "event_id", "user_id", "event_type")
    graft.streaming.StatefulQuota.withRocksDb(s) {
      graft.streaming.Replay.availableNow(counted)
    }
  }
  val st16Oracle: String =
    s"""WITH inp AS MATERIALIZED (
       |  SELECT event_id, user_id, event_type AS category,
       |    CASE WHEN substr(md5('cb:' || CAST(event_id AS STRING)), 1, 8)
       |         < '$St16BatchThr' THEN 0 ELSE 1 END AS batch
       |  FROM events)
       |SELECT event_id, user_id, category,
       |  CAST(COUNT(*) OVER (PARTITION BY user_id, category
       |    ORDER BY batch, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT)
       |    AS seen_before
       |FROM inp""".stripMargin

  /** D6: the full near-dedup pipeline as a MANIFEST — MinHash pairs →
    * connected-component clusters → one row per INPUT doc with its
    * keep/drop decision and evidence ([[Dedup.dedupNearManifest]]).
    * Keeper choice depends on the hash-specific candidate graph
    * (clustering is oracle-checked via q_g6_components and DedupSpec),
    * but the manifest makes the result fully auditable by the driver:
    * the oracle demands a doc_id BIJECTION with the corpus (so a
    * deleted or fabricated row turns it red — this was the one place an
    * under-emitting result could pass vacuously), recomputes every
    * eliminated row's witness Jaccard exactly, and checks keeper
    * consistency (keeper < id, keeper itself a survivor).
    */
  val d6DedupNear: Q = (s, d) => {
    val docs = t(s, d, "documents")
    Dedup.dedupNearManifest(docs, "doc_id", "text", threshold = 0.2)
      .join(docs.select(col("doc_id").as("id"), col("source"), col("lang")),
        Seq("id"))
      .select(col("id").as("doc_id"), col("source"), col("lang"),
        col("keeper_id"), col("is_survivor"),
        col("witness_id"), col("witness_jaccard"))
  }
  val d6Oracle =
    s"""WITH sp AS (
       |  SELECT * FROM '__SPARK_OUT__/q_d6_dedup_near/*.parquet'),
       |ok AS (SELECT
       |    (SELECT COUNT(*) FROM sp) = (SELECT COUNT(*) FROM documents)
       |    AND (SELECT COUNT(DISTINCT doc_id) FROM sp) = (SELECT COUNT(*) FROM sp)
       |    AND NOT EXISTS (SELECT 1 FROM documents d
       |                    WHERE d.doc_id NOT IN (SELECT doc_id FROM sp))
       |    AS complete),
       |t AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
       |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       |  FROM (SELECT doc_id, $wordsSql AS w FROM documents) z
       |  WHERE doc_id IN (
       |    SELECT doc_id FROM sp WHERE witness_id IS NOT NULL
       |    UNION SELECT witness_id FROM sp WHERE witness_id IS NOT NULL)),
       |jw AS (
       |  SELECT sp.doc_id,
       |    ROUND(CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
       |      ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |           len(list_distinct(list_concat(a.sh, b.sh))) END, 6) AS j
       |  FROM sp JOIN t a ON a.doc_id = sp.doc_id
       |          JOIN t b ON b.doc_id = sp.witness_id
       |  WHERE sp.witness_id IS NOT NULL)
       |SELECT sp.doc_id, sp.source, sp.lang, sp.keeper_id, sp.is_survivor,
       |       sp.witness_id, sp.witness_jaccard
       |FROM sp JOIN documents d ON d.doc_id = sp.doc_id
       |LEFT JOIN jw ON jw.doc_id = sp.doc_id
       |WHERE (SELECT complete FROM ok)
       |  AND d.source = sp.source AND d.lang = sp.lang
       |  AND sp.is_survivor = (sp.keeper_id = sp.doc_id)
       |  AND (sp.witness_id IS NULL OR (sp.witness_id <> sp.doc_id
       |       AND jw.j = sp.witness_jaccard AND jw.j >= 0.2))
       |  AND (sp.is_survivor OR (sp.witness_id IS NOT NULL
       |       AND sp.keeper_id < sp.doc_id
       |       AND sp.keeper_id IN (SELECT doc_id FROM sp WHERE is_survivor)))""".stripMargin

  // ===== text analysis =================================================

  /** T1: quality metrics + composite score. */
  val t1Quality: Q = (s, d) =>
    TextAnalysis.qualityMetrics(t(s, d, "documents"))
      .select(col("doc_id"), col("n_tokens").cast("bigint").as("n_tokens"),
        col("avg_token_len"), col("punct_ratio"), col("alpha_ratio"),
        col("stopword_ratio"), col("quality_score"))
  val t1Oracle =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS n_tokens,
       |    CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) /
       |      len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS avg_token_len,
       |    CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) /
       |      length(text) AS punct_ratio,
       |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) /
       |      length(text) AS alpha_ratio,
       |    CAST(len(list_filter(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '),
       |        w -> list_contains(['the','a','of','to','and','in','is','it','that','for'], lower(w))))
       |      AS DOUBLE) /
       |      len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS stopword_ratio
       |  FROM documents)
       |SELECT doc_id, n_tokens, avg_token_len, punct_ratio, alpha_ratio, stopword_ratio,
       |  LEAST(1.0, GREATEST(0.0,
       |    0.30 * LEAST(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) +
       |    0.25 * alpha_ratio +
       |    0.25 * LEAST(stopword_ratio * 5.0, 1.0) +
       |    0.20 * (1.0 - LEAST(punct_ratio * 5.0, 1.0)))) AS quality_score
       |FROM m""".stripMargin

  /** T2: heuristic language ID (stopword evidence). The oracle twin
    * re-expresses the argmax in SQL: per-language distinct-stopword hit
    * counts, greatest-of, tie broken in language-code order — the same
    * total order as the library's struct(negScore, lang) array_min.
    */
  val t2LangId: Q = (s, d) =>
    t(s, d, "documents").select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("lang_pred"))
  val t2Oracle: String = {
    val langs = TextAnalysis.stopwords.toSeq.sortBy(_._1)
    val scores = langs.map { case (lang, ws) =>
      val arr = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_intersect($wordsSql, $arr)) AS s_$lang"
    }.mkString(",\n    ")
    val best = langs.map { case (lang, _) => s"s_$lang" }.mkString("GREATEST(", ", ", ")")
    val pick = langs.map { case (lang, _) =>
      s"WHEN s_$lang = best THEN '$lang'"
    }.mkString("\n    ")
    s"""WITH sc AS (
       |  SELECT doc_id,
       |    $scores
       |  FROM documents),
       |b AS (SELECT doc_id, $best AS best, * FROM sc)
       |SELECT doc_id, CASE WHEN best = 0 THEN 'und'
       |    $pick
       |  END AS lang_pred
       |FROM b""".stripMargin
  }

  /** T3: corpus heavy hitters — token frequencies, top 50. explode →
    * two-phase hash aggregate (map-side combine carries (token, count)
    * pairs, never raw tokens) → TakeOrdered. The everyday vocabulary /
    * n-gram-stats job over a 100 TB corpus.
    */
  val t3TopTokens: Q = (s, d) =>
    t(s, d, "documents")
      .select(explode(split(TextAnalysis.normalize(col("text")), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(50)
  val t3Oracle =
    s"""SELECT w AS token, COUNT(*) AS n
       |FROM (SELECT unnest($wordsSql) AS w FROM documents) z
       |WHERE length(w) > 0
       |GROUP BY w ORDER BY n DESC, token ASC LIMIT 50""".stripMargin

  /** T4: context-window chunking — overlapping token windows (size 16,
    * stride 12), the training-data packing step. Oracle re-derives the
    * same windows with generate_series + list_slice.
    */
  val t4Chunk: Q = (s, d) =>
    TextAnalysis.chunk(t(s, d, "documents"), "doc_id", "text",
      size = 16, stride = 12)
  val t4Oracle =
    s"""WITH t AS (SELECT doc_id, $wordsSql AS w FROM documents),
       |n AS (SELECT doc_id, w,
       |  CASE WHEN len(w) <= 16 THEN 1
       |       ELSE CAST(CEIL(CAST(len(w) - 16 AS DOUBLE) / 12) AS INTEGER) + 1
       |  END AS nc FROM t),
       |e AS (SELECT doc_id, w, unnest(generate_series(0, nc - 1)) AS i FROM n)
       |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       |  array_to_string(list_slice(w, i * 12 + 1, i * 12 + 16), ' ') AS chunk_text,
       |  CAST(len(list_slice(w, i * 12 + 1, i * 12 + 16)) AS BIGINT) AS chunk_tokens
       |FROM e""".stripMargin

  /** T5: top-5 TF-IDF terms per document (raw-ratio idf — see
    * TextAnalysis.tfidf for why no log). Oracle re-derives tf, df, and the
    * identically-associated score expression.
    */
  val t5Tfidf: Q = (s, d) =>
    TextAnalysis.tfidf(t(s, d, "documents"), "doc_id", "text", topN = 5)
  val t5Oracle =
    s"""WITH terms AS (
       |  SELECT doc_id, w AS term
       |  FROM (SELECT doc_id, unnest($wordsSql) AS w FROM documents) z
       |  WHERE length(w) > 0),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
       |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
       |n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
       |sc AS (
       |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
       |    CAST(tf.tf AS DOUBLE) * CAST(n.n AS DOUBLE) / CAST(dfreq.df AS DOUBLE) AS tfidf
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
       |SELECT doc_id, rank, term, tf, df, tfidf FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
       |    ORDER BY tfidf DESC, term ASC) AS rank FROM sc) z
       |WHERE rank <= 5""".stripMargin

  /** T6: deterministic train/val/test split (md5-bucket routing) — split
    * sizes per language. The split assignment is pure hashing, so the
    * oracle reproduces it exactly with the same hex thresholds.
    */
  val t6Split: Q = (s, d) =>
    Sampling.hashSplit(t(s, d, "documents"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split", "lang").agg(count(lit(1)).as("n"))
  val t6Oracle =
    """SELECT CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train'
      |            WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666' THEN 'val'
      |            ELSE 'test' END AS split,
      |  lang, COUNT(*) AS n
      |FROM documents GROUP BY 1, 2""".stripMargin

  /** T7: deterministic 25% sample by key hash (reproducible across runs
    * and engines — no rand()).
    */
  val t7Sample: Q = (s, d) =>
    Sampling.sampleByKey(t(s, d, "documents"), "doc_id", 0.25)
      .select("doc_id", "lang", "source")
  val t7Oracle =
    """SELECT doc_id, lang, source FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '40000000'""".stripMargin

  /** T41: exact-quota stratified sample ([[Sampling.stratifiedQuota]])
    * — exactly 20 docs per language in md5-hash order (the balanced
    * eval-set construction where a proportional threshold sample won't
    * do). The oracle replays the identical hash-ordered window rank.
    */
  val t41StratifiedQuota: Q = (s, d) =>
    Sampling.stratifiedQuota(t(s, d, "documents"), Seq("lang"), "doc_id",
        quota = 20)
      .select("doc_id", "lang", "source")
  val t41Oracle: String =
    """SELECT doc_id, lang, source FROM (
      |  SELECT doc_id, lang, source,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5('strata:' || CAST(doc_id AS VARCHAR)), doc_id)
      |      AS rk
      |  FROM documents) z
      |WHERE rk <= 20""".stripMargin

  /** T43: lexical-diversity profile — distinct-trigram and type-token
    * ratios per source, the curation signal that separates template
    * farms (thousands of pages, hundreds of distinct trigrams) from
    * organic text. One multi-distinct aggregation (a single Expand
    * shuffle); ratios are IEEE divisions of exact counts; the oracle
    * replays the shared normalize + trigram windows byte-for-byte.
    */
  val t43Diversity: Q = (s, d) => {
    val toks = t(s, d, "documents")
      .select(col("source"), col("doc_id"),
        split(TextAnalysis.normalize(col("text")), " ").as("w"))
    // guard: Spark's sequence(1, 0) is DESCENDING [1, 0], not empty —
    // a 2-token doc would emit bogus partial grams without the CASE
    val tri = toks.select(col("source"), col("doc_id"),
      explode(expr(
        "CASE WHEN size(w) >= 3 THEN transform(sequence(1, size(w) - 2), " +
          "i -> concat_ws(' ', w[i-1], w[i], w[i+1])) " +
          "ELSE CAST(array() AS ARRAY<STRING>) END")).as("g"))
    tri.groupBy("source")
      .agg(count(lit(1)).as("n_trigrams"),
        countDistinct(col("g")).as("n_distinct"),
        countDistinct(col("doc_id")).as("n_docs"))
      .withColumn("diversity",
        col("n_distinct").cast("double") / col("n_trigrams").cast("double"))
  }
  val t43Oracle: String =
    s"""WITH w AS (
      |  SELECT source, doc_id, $wordsSql AS toks
      |  FROM documents),
      |g AS (
      |  SELECT source, doc_id,
      |    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
      |  FROM w, (SELECT unnest(generate_series(1, 10000)) AS i) ii
      |  WHERE i <= len(toks) - 2)
      |SELECT source, COUNT(*) AS n_trigrams,
      |  CAST(COUNT(DISTINCT g) AS BIGINT) AS n_distinct,
      |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |  CAST(COUNT(DISTINCT g) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      |    AS diversity
      |FROM g GROUP BY source""".stripMargin

  /** T14: deterministic source-mixture sampling — per-source keep rates
    * (the training-data mixture step: upweight some domains, downsample
    * others) applied as one no-shuffle CASE + md5-threshold scan. The 20
    * fixture sources cycle through rates 0.2/0.4/0.6/0.8/1.0.
    */
  val t14Rates: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> (((i % 5) + 1) / 5.0)).toMap
  val t14Mixture: Q = (s, d) =>
    Sampling.mixtureSample(t(s, d, "documents"), "doc_id", "source",
        t14Rates, defaultRate = 0.5)
      .select("doc_id", "source", "lang")
  val t14Oracle = {
    val cases = t14Rates.toSeq.sortBy(_._1).map { case (src, r) =>
      s"WHEN source = '$src' THEN '${Sampling.hexThreshold(r)}'"
    }.mkString(" ")
    s"""SELECT doc_id, source, lang FROM documents
       |WHERE substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8) <
       |  CASE $cases ELSE '${Sampling.hexThreshold(0.5)}' END""".stripMargin
  }

  /** T21: temperature-weighted source mixture — per-source keep rates
    * `∝ n_s^(alpha-1)` (multinomial alpha-sampling, the mT5/XLM-R law),
    * waterfilled so no rate exceeds 1 and the expected kept fraction is
    * the target. Emits one row per source: exact doc count, the
    * Spark-derived hex threshold (echoed — its alpha-law is pinned in
    * SamplingSpec, deliberately NOT re-derived in SQL because pow() is
    * not bit-contracted across engines), and the kept count, which the
    * oracle RECOUNTS from the raw table using the emitted threshold —
    * so a wrong mixture filter, a wrong count, or a missing source all
    * turn the driver red, and no cross-engine float comparison exists
    * anywhere.
    */
  val t21TempMixture: Q = (s, d) => {
    import s.implicits._
    val docs = t(s, d, "documents")
    val rates = Sampling.temperatureRates(docs, "source",
      alpha = 0.5, targetFraction = 0.3)
    val kept = Sampling.mixtureSample(docs, "doc_id", "source", rates,
      defaultRate = 0.0)
    val th = rates.toSeq.sortBy(_._1)
      .map { case (src, r) => (src, Sampling.hexThreshold(r)) }
      .toDF("source", "threshold")
    docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .join(broadcast(th), Seq("source"))
      .join(kept.groupBy("source").agg(count(lit(1)).as("n_kept")),
        Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("threshold"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }
  val t21Oracle =
    """WITH sp AS (
      |  SELECT source, threshold
      |  FROM '__SPARK_OUT__/q_t21_temperature_mixture/*.parquet'),
      |src AS (SELECT source, COUNT(*) AS n_docs FROM documents
      |        GROUP BY source),
      |ok AS (SELECT (SELECT COUNT(*) FROM sp) = (SELECT COUNT(*) FROM src)
      |        AND NOT EXISTS (SELECT 1 FROM src LEFT JOIN sp USING (source)
      |                        WHERE sp.source IS NULL) AS complete),
      |k AS (SELECT d.source, sp.threshold,
      |        CAST(SUM(CASE WHEN
      |          substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
      |            < sp.threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |      FROM documents d JOIN sp ON d.source = sp.source
      |      GROUP BY d.source, sp.threshold)
      |SELECT src.source, CAST(src.n_docs AS BIGINT) AS n_docs,
      |  k.threshold, k.n_kept
      |FROM src JOIN k ON src.source = k.source
      |WHERE (SELECT complete FROM ok)""".stripMargin

  /** T15: seeded deterministic interleave (global training order) —
    * every row ordered by md5(seed:key), sharded on the hash's first 2
    * hex chars, ranked within its shard. Global order = (shard, pos);
    * no global window exists (rank partitions by shard).
    */
  val t15Interleave: Q = (s, d) =>
    Sampling.interleave(t(s, d, "documents"), "doc_id", seed = "epoch0",
        prefixChars = 2)
      .select("doc_id", "shard", "pos")
  val t15Oracle =
    """WITH o AS (SELECT doc_id,
      |  md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS ord FROM documents)
      |SELECT doc_id, substr(ord, 1, 2) AS shard,
      |  ROW_NUMBER() OVER (PARTITION BY substr(ord, 1, 2)
      |                     ORDER BY ord, doc_id) AS pos
      |FROM o""".stripMargin

  /** D7: edit-distance near-dup verify — Levenshtein over 60-char prefixes
    * within (lang, length-bucket) blocks. Integer-valued, so the DuckDB
    * levenshtein oracle agrees exactly.
    */
  val d7EditDist: Q = (s, d) =>
    TextAnalysis.editDistancePairs(t(s, d, "documents"), "doc_id", "text",
      blockCols = Seq(col("lang"), expr("n_chars div 24")),
      prefixLen = 48, maxDist = 16)
  val d7Oracle =
    """WITH b AS (
      |  SELECT lang, n_chars // 24 AS lb, doc_id, substr(text, 1, 48) AS p
      |  FROM documents)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  levenshtein(a.p, b.p) AS edit_dist
      |FROM b a JOIN b b ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
      |WHERE levenshtein(a.p, b.p) <= 16""".stripMargin

  /** X5: URL parsing battery — regexp_extract host / path / query param
    * over synthesized URLs (both engines run the same regexes), with a
    * per-host rollup. The web-corpus normalization step.
    */
  val x5Url: Q = (s, d) =>
    t(s, d, "documents")
      .withColumn("url", concat(lit("https://"), col("source"),
        lit(".example.com/docs/"), col("doc_id").cast("string"),
        lit("?lang="), col("lang")))
      .select(
        regexp_extract(col("url"), "^https?://([^/]+)", 1).as("host"),
        regexp_extract(col("url"), "^https?://[^/]+(/[^?#]*)", 1).as("path"),
        regexp_extract(col("url"), "[?&]lang=([^&#]*)", 1).as("lang_param"))
      .groupBy("host", "lang_param").agg(count(lit(1)).as("n"))
  val x5Oracle =
    """WITH u AS (
      |  SELECT 'https://' || source || '.example.com/docs/' ||
      |    CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
      |  FROM documents)
      |SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
      |  regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param,
      |  COUNT(*) AS n
      |FROM u GROUP BY 1, 2""".stripMargin

  /** T36: domain reputation + blocklist derivation
    * ([[TextAnalysis.hostReputation]]) — per-host aggregation of the T1
    * quality score (as the integer milli proxy, keeping the host sum a
    * BIGINT), rank-ordered with the bottom 5 hosts flagged blocked; the
    * anti-join a web pipeline then applies is the `blocked` column. The
    * oracle replays quality → proxy → host rollup → ranking in SQL, so
    * a drifted score, a float-sum reassociation, or a rank tie-break
    * change all go red.
    */
  val t36DomainBlocklist: Q = (s, d) => {
    val scored = TextAnalysis.qualityMetrics(t(s, d, "documents"))
      .withColumn("host", concat(col("source"), lit(".example.com")))
      .withColumn("qmilli",
        floor(col("quality_score") * 1000).cast("bigint"))
    TextAnalysis.hostReputation(scored, "host", "qmilli", bottomK = 5)
  }
  val t36Oracle: String =
    s"""WITH m AS (
       |  SELECT source,
       |    len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS n_tokens,
       |    CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) /
       |      length(text) AS punct_ratio,
       |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) /
       |      length(text) AS alpha_ratio,
       |    CAST(len(list_filter(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '),
       |        w -> list_contains(['the','a','of','to','and','in','is','it','that','for'], lower(w))))
       |      AS DOUBLE) /
       |      len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS stopword_ratio
       |  FROM documents),
       |q AS (
       |  SELECT source || '.example.com' AS host,
       |    CAST(FLOOR(LEAST(1.0, GREATEST(0.0,
       |      0.30 * LEAST(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) +
       |      0.25 * alpha_ratio +
       |      0.25 * LEAST(stopword_ratio * 5.0, 1.0) +
       |      0.20 * (1.0 - LEAST(punct_ratio * 5.0, 1.0)))) * 1000)
       |      AS BIGINT) AS qmilli
       |  FROM m),
       |h AS (
       |  SELECT host, COUNT(*) AS n_docs,
       |    CAST(SUM(qmilli) AS BIGINT) AS sum_qmilli,
       |    CAST(SUM(qmilli) AS DOUBLE) / COUNT(*) AS avg_qmilli
       |  FROM q GROUP BY host)
       |SELECT host, n_docs, sum_qmilli, avg_qmilli,
       |  CAST(ROW_NUMBER() OVER (ORDER BY avg_qmilli, host) AS BIGINT)
       |    AS reputation_rank,
       |  ROW_NUMBER() OVER (ORDER BY avg_qmilli, host) <= 5 AS blocked
       |FROM h""".stripMargin

  // ===== multimodal ====================================================

  /** M1: binary payload plumbing — metadata extraction over an opaque
    * binary column (decode stubbed deterministically; see Multimodal).
    */
  /** M1: REAL image decode, oracle-pinned without the oracle decoding
    * anything: every doc gets a deterministic solid-color PNG fixture
    * ([[Multimodal.syntheticPng]] — dims and fill are pure arithmetic in
    * doc_id), Spark encodes and then REALLY decodes it (javax.imageio)
    * and emits the decoded dimensions and exact channel means; DuckDB
    * replays the arithmetic. A fake or broken decoder cannot reproduce
    * the widths/means from the PNG bytes.
    */
  val m1MediaMeta: Q = (s, d) =>
    Multimodal.withImageMeta(
        spread(t(s, d, "documents").select(col("doc_id")))
          .select(col("doc_id"),
            Multimodal.synthPayload(col("doc_id")).as("payload")))
      .select(col("doc_id"),
        col("image_meta.media_type").as("media_type"),
        col("image_meta.width").as("width"),
        col("image_meta.height").as("height"),
        col("image_meta.n_pixels").as("n_pixels"),
        col("image_meta.avg_r").as("avg_r"),
        col("image_meta.avg_g").as("avg_g"),
        col("image_meta.avg_b").as("avg_b"))
  val m1Oracle =
    """SELECT doc_id, 'image/png' AS media_type,
      |  CAST(doc_id % 16 + 1 AS INTEGER) AS width,
      |  CAST(doc_id % 8 + 1 AS INTEGER) AS height,
      |  CAST((doc_id % 16 + 1) * (doc_id % 8 + 1) AS BIGINT) AS n_pixels,
      |  CAST(doc_id % 256 AS DOUBLE) AS avg_r,
      |  CAST((doc_id * 7) % 256 AS DOUBLE) AS avg_g,
      |  CAST((doc_id * 13) % 256 AS DOUBLE) AS avg_b
      |FROM documents""".stripMargin

  /** M3: REAL resample round-trip — synthesize the PNG fixture, resize
    * it to 20×10 with the real nearest-neighbor resampler, re-decode the
    * re-encoded PNG, and emit the decoded facts. Solid fills survive a
    * lossless resample bit-exactly, so DuckDB again replays everything
    * arithmetically: dims pin the resize, channel means pin that the
    * resampled pixels are the original color.
    */
  val m3ResizeRoundtrip: Q = (s, d) =>
    Multimodal.withImageMeta(
        spread(t(s, d, "documents").select(col("doc_id")))
          .select(col("doc_id"),
            Multimodal.resizedPayload(
              Multimodal.synthPayload(col("doc_id")), 20, 10).as("payload")))
      .select(col("doc_id"),
        col("image_meta.width").as("width"),
        col("image_meta.height").as("height"),
        col("image_meta.n_pixels").as("n_pixels"),
        col("image_meta.avg_r").as("avg_r"),
        col("image_meta.avg_g").as("avg_g"),
        col("image_meta.avg_b").as("avg_b"))
  val m3Oracle =
    """SELECT doc_id, CAST(20 AS INTEGER) AS width, CAST(10 AS INTEGER) AS height,
      |  CAST(200 AS BIGINT) AS n_pixels,
      |  CAST(doc_id % 256 AS DOUBLE) AS avg_r,
      |  CAST((doc_id * 7) % 256 AS DOUBLE) AS avg_g,
      |  CAST((doc_id * 13) % 256 AS DOUBLE) AS avg_b
      |FROM documents""".stripMargin

  /** M4: REAL sample-level WAV decode — the audio completion of the M1
    * image pattern: every doc gets a deterministic PCM fixture
    * ([[Multimodal.syntheticWav]] — length and samples are pure
    * arithmetic in doc_id) encoded through the real JDK WAV writer,
    * Spark REALLY decodes it back (`javax.sound.sampled`) and emits the
    * decoded format fields and exact integer sample statistics; DuckDB
    * replays the arithmetic over generate_series. All compared columns
    * are integers (sum-of-squares, not RMS) so there is no cross-engine
    * float compare anywhere; RMS itself is pinned in MediaProbeSpec. A
    * fake or broken decoder cannot reproduce the sums from WAV bytes.
    */
  val m4AudioDecode: Q = (s, d) =>
    Multimodal.withAudioMeta(
        spread(t(s, d, "documents").select(col("doc_id")))
          .select(col("doc_id"),
            Multimodal.synthWavPayload(col("doc_id")).as("payload")))
      .select(col("doc_id"),
        col("audio_meta.media_type").as("media_type"),
        col("audio_meta.sample_rate").as("sample_rate"),
        col("audio_meta.channels").as("channels"),
        col("audio_meta.n_samples").as("n_samples"),
        col("audio_meta.sum_sq").as("sum_sq"),
        col("audio_meta.peak").as("peak"))
  val m4Oracle =
    """WITH z AS (SELECT doc_id, doc_id % 200 + 50 AS n FROM documents),
      |s AS (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM z),
      |v AS (SELECT doc_id, n, (doc_id * 31 + i * 17) % 2001 - 1000 AS x FROM s)
      |SELECT doc_id, 'audio/wav' AS media_type,
      |  CAST(8000 AS INTEGER) AS sample_rate, CAST(1 AS INTEGER) AS channels,
      |  CAST(MAX(n) AS BIGINT) AS n_samples,
      |  CAST(SUM(x * x) AS BIGINT) AS sum_sq,
      |  CAST(MAX(ABS(x)) AS INTEGER) AS peak
      |FROM v GROUP BY doc_id""".stripMargin

  /** M7: frame-energy audio fingerprint dedup
    * ([[Multimodal.wavFingerprint]]) — the audio sibling of q_m6's
    * image dHash: every doc's synthetic WAV is REALLY decoded
    * (javax.sound), cut into 25 frames by the exact integer assignment
    * `(i·25) div n`, per-frame Σx² energies compared pairwise into a
    * 24-bit energy-contour fingerprint, and re-delivered clones (5% of
    * docs re-encoded under a new id from the SAME source id) must land
    * in the same (fingerprint, n_samples) bucket. The oracle replays
    * the whole chain arithmetically — a fake decoder cannot reproduce
    * the energies from the WAV bytes.
    */
  val m7AudioFingerprint: Q = (s, d) => {
    val docs = spread(t(s, d, "documents").select("doc_id"))
    val base = docs.withColumn("payload",
      Multimodal.synthWavPayload(col("doc_id")))
    val clones = docs
      .filter(Sampling.hashBucket(col("doc_id"), "wavdup")
        < lit(Sampling.hexThreshold(0.05)))
      .select((col("doc_id") + lit(PlantOffset)).as("doc_id"),
        Multimodal.synthWavPayload(col("doc_id")).as("payload"))
    import org.apache.spark.sql.expressions.Window
    base.unionByName(clones)
      .withColumn("wfp", Multimodal.wavFingerprintCol(col("payload"), 25))
      .select(col("doc_id"),
        col("wfp._1").as("n_samples"), col("wfp._2").as("fp"))
      .withColumn("group_size",
        count(lit(1)).over(Window.partitionBy("fp", "n_samples"))
          .cast("bigint"))
  }
  val m7Oracle: String = {
    val thr = Sampling.hexThreshold(0.05)
    s"""WITH ids AS (
       |  SELECT doc_id, doc_id AS sid FROM documents
       |  UNION ALL
       |  SELECT doc_id + $PlantOffset, doc_id FROM documents
       |  WHERE substr(md5('wavdup:' || CAST(doc_id AS STRING)), 1, 8) < '$thr'),
       |z AS (SELECT doc_id, sid, sid % 200 + 50 AS n FROM ids),
       |smp AS (SELECT doc_id, sid, n,
       |        unnest(generate_series(0, n - 1)) AS i FROM z),
       |v AS (SELECT doc_id, n, CAST((i * 25) // n AS INT) AS f,
       |        (sid * 31 + i * 17) % 2001 - 1000 AS x FROM smp),
       |e AS (SELECT doc_id, n, f, SUM(x * x) AS en FROM v GROUP BY 1, 2, 3),
       |b AS (SELECT doc_id, n, f, en,
       |        LEAD(en) OVER (PARTITION BY doc_id ORDER BY f) AS en2 FROM e),
       |fp AS (SELECT doc_id, MAX(n) AS n_samples,
       |        CAST(SUM(CASE WHEN en > en2 THEN CAST(1 AS BIGINT) << f
       |                      ELSE 0 END) AS BIGINT) AS fp
       |        FROM b WHERE en2 IS NOT NULL GROUP BY doc_id)
       |SELECT doc_id, CAST(n_samples AS BIGINT) AS n_samples, fp,
       |  COUNT(*) OVER (PARTITION BY fp, n_samples) AS group_size
       |FROM fp""".stripMargin
  }

  /** M5: REAL multi-frame decode + stride sampling — the video completion
    * of the M1/M4 pattern: every doc gets a deterministic animated-GIF
    * fixture ([[Multimodal.syntheticGif]] — frame count, dimensions, and
    * every frame's solid gray are pure arithmetic in doc_id), Spark
    * REALLY parses the container and decodes every 2nd frame up to 4
    * (`javax.imageio` GIF sequence reader; only sampled frames are
    * decoded), and emits the per-frame facts; DuckDB replays the
    * arithmetic, including the stride-sampling index set, over
    * generate_series. A fake or broken decoder cannot reproduce the frame
    * counts/means from GIF bytes.
    */
  val m5VideoFrames: Q = (s, d) =>
    Multimodal.withSampledFrames(
        spread(t(s, d, "documents").select(col("doc_id")))
          .select(col("doc_id"),
            Multimodal.synthGifPayload(col("doc_id")).as("payload")),
        stride = 2, maxFrames = 4)
      .select(col("doc_id"),
        col("frame.n_frames").as("n_frames"),
        col("frame.frame_idx").as("frame_idx"),
        col("frame.width").as("width"),
        col("frame.height").as("height"),
        col("frame.avg_r").as("avg_r"),
        col("frame.avg_g").as("avg_g"),
        col("frame.avg_b").as("avg_b"))
  val m5Oracle =
    """WITH z AS (SELECT doc_id, doc_id % 12 + 2 AS n FROM documents),
      |f AS (SELECT doc_id, n,
      |        unnest(generate_series(0, LEAST(n - 1, 6), 2)) AS i FROM z)
      |SELECT doc_id, CAST(n AS INTEGER) AS n_frames,
      |  CAST(i AS INTEGER) AS frame_idx,
      |  CAST(doc_id % 5 + 2 AS INTEGER) AS width,
      |  CAST(doc_id % 3 + 2 AS INTEGER) AS height,
      |  CAST((doc_id * 11 + i * 37) % 256 AS DOUBLE) AS avg_r,
      |  CAST((doc_id * 11 + i * 37) % 256 AS DOUBLE) AS avg_g,
      |  CAST((doc_id * 11 + i * 37) % 256 AS DOUBLE) AS avg_b
      |FROM f""".stripMargin

  /** T22: REAL BPE tokenizer — train a 128-merge table on the corpus
    * (one distributed word-histogram pass + the vocabulary-bounded driver
    * merge loop, [[Bpe.train]]) and encode every document with the greedy
    * rank-ordered merge algorithm, emitting per-doc integer accounting.
    * Oracle split per the q_t20 pattern: `n_pretokens` and `n_chars` are
    * FULLY replayed by DuckDB from the raw text (BPE concatenation is
    * exact, so the sum of token lengths must equal the normalized
    * character count — a broken encoder that drops or duplicates
    * characters turns this red); `n_tokens` needs the merge loop DuckDB
    * cannot run, so it is bounded per-doc ([n_pretokens, n_chars]) and
    * must compress globally (SUM(n_tokens) < SUM(n_chars) — 128 merges
    * on any natural corpus guarantee it); corpus bijection makes
    * under-emission driver-visible (tamper-tested). Exact merge-table
    * and encode semantics are pinned in BpeSpec.
    */
  val t22BpeStats: Q = (s, d) => {
    val docs = t(s, d, "documents")
    val model = Bpe.train(docs, "text", nMerges = 128, maxWords = 20000)
    Bpe.withBpeStats(docs, "doc_id", "text", model)
  }
  val t22Oracle =
    s"""WITH sp AS (
       |  SELECT * FROM '__SPARK_OUT__/q_t22_bpe_stats/*.parquet'),
       |f AS (SELECT doc_id,
       |    CASE WHEN norm = '' THEN 0
       |         ELSE length(norm) - length(replace(norm, ' ', '')) + 1
       |    END AS n_pretokens,
       |    length(replace(norm, ' ', '')) AS n_chars
       |  FROM (SELECT doc_id, $normSql AS norm FROM documents) z),
       |ok AS (SELECT
       |    (SELECT COUNT(*) FROM sp) = (SELECT COUNT(*) FROM documents)
       |    AND (SELECT COUNT(DISTINCT doc_id) FROM sp)
       |        = (SELECT COUNT(*) FROM sp)
       |    AND NOT EXISTS (SELECT 1 FROM f
       |          WHERE f.doc_id NOT IN (SELECT doc_id FROM sp))
       |    AND NOT EXISTS (SELECT 1 FROM sp JOIN f ON sp.doc_id = f.doc_id
       |          WHERE sp.n_pretokens <> f.n_pretokens
       |             OR sp.n_chars <> f.n_chars
       |             OR sp.n_tokens < sp.n_pretokens
       |             OR sp.n_tokens > sp.n_chars)
       |    AND (SELECT SUM(n_tokens) < SUM(n_chars) FROM sp)
       |    AS complete)
       |SELECT sp.doc_id, sp.n_pretokens, sp.n_tokens, sp.n_chars FROM sp
       |WHERE (SELECT complete FROM ok)""".stripMargin

  /** T8: corpus bigram statistics — top-40 adjacent token pairs, the
    * n-gram LM-data profiling job. One scan, explode of zipped adjacent
    * tokens, two-phase aggregation.
    */
  val t8Bigrams: Q = (s, d) => {
    // bigrams via a native expression (functions.TextExprs.BigramsExpr):
    // one scan, explode straight into the two-phase vocabulary aggregate
    // — the former posexplode + lag-window shape shuffled every token on
    // doc_id first. (A HOF zip_with was rejected earlier for the
    // lambda-inlining trap; a native expression evaluates the token
    // array once per row.)
    graft.functions.VecExprs.register(s)
    t(s, d, "documents")
      .select(explode(call_function("bigrams",
        split(TextAnalysis.normalize(col("text")), " "))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(40)
  }
  val t8Oracle =
    s"""WITH t AS (SELECT $wordsSql AS w FROM documents),
       |b AS (
       |  SELECT w[i] || ' ' || w[i+1] AS bigram
       |  FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i FROM t) z)
       |SELECT bigram, COUNT(*) AS n FROM b
       |GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 40""".stripMargin

  /** M2: frame-sampling plumbing — every 5th frame index per media row,
    * capped; the explode shape of video frame extraction, hash-checked
    * via generate_series.
    */
  val m2Frames: Q = (s, d) =>
    Multimodal.sampleFrameIndexes(
        t(s, d, "documents").select(col("doc_id"),
          (col("n_chars").cast("long") % 240 + 1).as("n_frames")),
        col("n_frames"), stride = 5, maxFrames = 12)
      .select(col("doc_id"), col("n_frames"), col("frame_idx"))
  val m2Oracle =
    """SELECT doc_id, n_frames, unnest(generate_series(0,
      |    LEAST(n_frames - 1, 60), 5)) AS frame_idx
      |FROM (SELECT doc_id, n_chars % 240 + 1 AS n_frames FROM documents) z""".stripMargin

  /** T9: PII-style redaction — the standard pre-training scrub pass.
    * Email / phone / long-digit-run patterns are replaced with typed
    * placeholder tokens in one regexp_replace chain (single scan, no
    * shuffle); the rollup counts affected documents per pattern. URLs are
    * synthesized into the text so the patterns actually fire. Both
    * engines run the same regexes.
    */
  val t9Redact: Q = (s, d) => {
    val decorated = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com or +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\+?[0-9][0-9()\\-\\. ]{6,}[0-9]"
    t(s, d, "documents")
      .withColumn("raw", decorated)
      .withColumn("redacted",
        regexp_replace(regexp_replace(col("raw"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>"))
      .select(col("doc_id"),
        (length(col("raw")) - length(col("redacted"))).cast("bigint")
          .as("chars_removed"),
        col("redacted").contains("<EMAIL>").as("had_email"),
        col("redacted").contains("<PHONE>").as("had_phone"))
  }
  val t9Oracle =
    """WITH r AS (
      |  SELECT doc_id,
      |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
      |      '@example.com or +1-555-' ||
      |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
      |  FROM documents),
      |x AS (
      |  SELECT doc_id, raw,
      |    regexp_replace(
      |      regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |      '\+?[0-9][0-9()\-\. ]{6,}[0-9]', '<PHONE>', 'g') AS redacted
      |  FROM r)
      |SELECT doc_id,
      |  CAST(length(raw) - length(redacted) AS BIGINT) AS chars_removed,
      |  contains(redacted, '<EMAIL>') AS had_email,
      |  contains(redacted, '<PHONE>') AS had_phone
      |FROM x""".stripMargin

  /** T10: token-budget shard packing — running-total bin assignment per
    * language, rolled up to shard manifests (docs + tokens per shard).
    */
  val t10Pack: Q = (s, d) =>
    TextAnalysis.packByTokenBudget(
        t(s, d, "documents").select(col("doc_id"), col("lang"),
          TextAnalysis.tokenCount(col("text")).cast("bigint").as("n_tokens")),
        "doc_id", "lang", "n_tokens", budget = 2048)
      .groupBy("lang", "shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("shard_tokens"))
  // Determinism: DuckDB SUM(BIGINT) yields HUGEINT, which a pandas-based
  // harness fetch coerces to float64 ("14.0" vs Spark's "14" → hash miss).
  // Every SUM is cast to BIGINT *before* any division or output.
  val t10Oracle =
    """WITH tok AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |sh AS (
      |  SELECT lang, n_tokens,
      |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) // 2048 AS shard_id
      |  FROM tok)
      |SELECT lang, shard_id, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
      |FROM sh GROUP BY 1, 2""".stripMargin

  /** T23: fixed-context sequence packing — per-document packing
    * coordinates in the sharded token stream
    * ([[TextAnalysis.packSequences]]; ctx 512, 16 shards, whitespace
    * token counts so the WHOLE computation — sharding, cumulative
    * offsets, sequence spans — is replayed exactly by DuckDB window
    * functions). The +1 in the cumulative sum is the EOD separator.
    */
  val t23SeqPacking: Q = (s, d) =>
    TextAnalysis.packSequences(
        t(s, d, "documents").select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("bigint").as("n_tokens")),
        "doc_id", "n_tokens", ctxLen = 512, prefixChars = 1)
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("start_off"),
        col("first_seq"), col("last_seq"), col("n_seqs"), col("head_fill"))
  val t23Oracle =
    """WITH tok AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens,
      |    substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, shard, n_tokens,
      |    CAST(COALESCE(SUM(n_tokens + 1) OVER (PARTITION BY shard
      |      ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS start_off
      |  FROM tok)
      |SELECT doc_id, shard, n_tokens, start_off,
      |  start_off // 512 AS first_seq,
      |  GREATEST(start_off + n_tokens - 1, start_off) // 512 AS last_seq,
      |  GREATEST(start_off + n_tokens - 1, start_off) // 512
      |    - start_off // 512 + 1 AS n_seqs,
      |  LEAST(n_tokens, 512 - (start_off % 512)) AS head_fill
      |FROM c""".stripMargin

  /** T24: trainable quality classifier (fastText-shaped distillation) —
    * the CCNet/RefinedWeb pattern: an upstream quality signal labels a
    * bounded sample, a cheap linear scorer is trained on it, and the
    * scorer grades the whole corpus with one broadcast codegen scan
    * ([[Classifier]]: driver GD on the md5-hashed bag-of-tokens of a
    * deterministic sort-by-id sample — the ivfIndex bounded-sample
    * precedent — then an exchange-free scoring expression). The fixture
    * has no natural token-level class signal (all langs/sources share
    * one vocabulary), so the upstream signal is synthesized the t9/d4
    * way: a deterministic ~30% of docs get spam-marker tokens appended
    * and the label IS that predicate — which makes separation learnable
    * with certainty and lets the oracle REQUIRE a held-out pairwise
    * ranking stat (AUC) ≥ 0.9 from the emitted probabilities, on top of
    * corpus bijection, exact label/split/token-count replay, and prob
    * range/finiteness. Training is bit-deterministic (sequential driver
    * loops, sorted feature maps), so emitted probs are stable across
    * runs and partitionings; the learned weights themselves are the one
    * non-replayable part, exactly like the k-means centroids of q_s11.
    */
  private val QualMarkThr = Sampling.hexThreshold(0.3)
  private val ClfTrainThr = Sampling.hexThreshold(0.8)
  private val QualMarkers = " lowquality spamtok clickbait"
  val t24QualityClassifier: Q = (s, d) => {
    val mark = Sampling.hashBucket(col("doc_id"), "qual") < lit(QualMarkThr)
    val docs = t(s, d, "documents")
      .withColumn("label_low", mark)
      .withColumn("text2", when(col("label_low"),
        concat(col("text"), lit(QualMarkers))).otherwise(col("text")))
    val isTrain = Sampling.hashBucket(col("doc_id"), "clf") < lit(ClfTrainThr)
    val model = Classifier.trainOnSample(docs.filter(isTrain), "doc_id",
      "text2", col("label_low").cast("double"), iters = 1500, lr = 10.0)
    docs.select(col("doc_id"),
      size(split(TextAnalysis.normalize(col("text2")), " ")).cast("bigint")
        .as("n_feat_tokens"),
      col("label_low"), isTrain.as("is_train"),
      round(Classifier.scoreProb(model, col("text2")), 6).as("prob"))
  }
  val t24Oracle =
    s"""WITH sp AS (
       |  SELECT * FROM '__SPARK_OUT__/q_t24_quality_classifier/*.parquet'),
       |base AS (
       |  SELECT doc_id,
       |    substr(md5('qual:' || CAST(doc_id AS STRING)), 1, 8) < '$QualMarkThr' AS label_low,
       |    substr(md5('clf:' || CAST(doc_id AS STRING)), 1, 8) < '$ClfTrainThr' AS is_train,
       |    text FROM documents),
       |b2 AS (
       |  SELECT doc_id, label_low, is_train,
       |    CAST(len($wordsSql) AS BIGINT) AS n_feat_tokens
       |  FROM (SELECT doc_id, label_low, is_train,
       |        CASE WHEN label_low THEN text || '$QualMarkers'
       |             ELSE text END AS text
       |        FROM base) z),
       |ok AS (SELECT
       |    (SELECT COUNT(*) FROM sp) = (SELECT COUNT(*) FROM b2)
       |    AND (SELECT COUNT(DISTINCT doc_id) FROM sp) = (SELECT COUNT(*) FROM sp)
       |    AND NOT EXISTS (
       |      SELECT 1 FROM b2 LEFT JOIN sp ON sp.doc_id = b2.doc_id
       |      WHERE sp.doc_id IS NULL OR sp.label_low <> b2.label_low
       |        OR sp.is_train <> b2.is_train
       |        OR sp.n_feat_tokens <> b2.n_feat_tokens
       |        OR sp.prob < 0 OR sp.prob > 1 OR NOT isfinite(sp.prob))
       |    AND (SELECT SUM(CASE WHEN p.prob > n.prob THEN 1.0
       |                         WHEN p.prob = n.prob THEN 0.5
       |                         ELSE 0.0 END) / COUNT(*)
       |         FROM sp p, sp n
       |         WHERE p.label_low AND NOT n.label_low
       |           AND NOT p.is_train AND NOT n.is_train) >= 0.9
       |    AS complete)
       |SELECT doc_id, n_feat_tokens, label_low, is_train, prob FROM sp
       |WHERE (SELECT complete FROM ok)""".stripMargin

  /** T25: DSIR importance weights ([[Dsir.importanceWeights]]) — the
    * hashed-bigram log-likelihood-ratio scorer that ranks raw documents
    * by target-domain resemblance. The target sample is synthesized the
    * t24 way (a deterministic ~20% of docs get target-marker tokens
    * appended; markers appear ONLY there, so the weight gap between the
    * classes is certain). Oracle: corpus bijection + exact replay of the
    * label, the split predicate, and each doc's bigram count, weight
    * finiteness, and a REQUIRED mean log-weight gap (target − raw ≥ 2
    * nats, measured ~7) computed from the emitted weights against
    * replayed labels — under-emission, fabricated rows, or a scorer
    * that stopped learning all turn the driver red. The log-ratio table
    * itself is driver-computed (the one transcendental site) and not
    * SQL-replayed, exactly like q_s11's centroids; exact per-doc weight
    * arithmetic is pinned in DsirSpec instead.
    */
  private val DsirTargetThr = Sampling.hexThreshold(0.2)
  private val DsirMarkers = " targetdomain wikitok referencetok"
  val t25DsirWeights: Q = (s, d) => {
    val isT = Sampling.hashBucket(col("doc_id"), "dsir") < lit(DsirTargetThr)
    val docs = t(s, d, "documents")
      .withColumn("is_t", isT)
      .withColumn("text2", when(col("is_t"),
        concat(col("text"), lit(DsirMarkers))).otherwise(col("text")))
    Dsir.importanceWeights(docs, "doc_id", "text2", col("is_t"))
  }
  val t25Oracle =
    s"""WITH sp AS (
       |  SELECT * FROM '__SPARK_OUT__/q_t25_dsir_weights/*.parquet'),
       |base AS (
       |  SELECT doc_id,
       |    substr(md5('dsir:' || CAST(doc_id AS STRING)), 1, 8) < '$DsirTargetThr' AS is_target,
       |    text FROM documents),
       |b2 AS (
       |  SELECT doc_id, is_target,
       |    GREATEST(CAST(len($wordsSql) AS BIGINT) - 1, 0) AS n_bigrams
       |  FROM (SELECT doc_id, is_target,
       |        CASE WHEN is_target THEN text || '$DsirMarkers'
       |             ELSE text END AS text
       |        FROM base) z),
       |ok AS (SELECT
       |    (SELECT COUNT(*) FROM sp) = (SELECT COUNT(*) FROM b2)
       |    AND (SELECT COUNT(DISTINCT doc_id) FROM sp) = (SELECT COUNT(*) FROM sp)
       |    AND NOT EXISTS (
       |      SELECT 1 FROM b2 LEFT JOIN sp ON sp.doc_id = b2.doc_id
       |      WHERE sp.doc_id IS NULL OR sp.is_target <> b2.is_target
       |        OR sp.n_bigrams <> b2.n_bigrams
       |        OR NOT isfinite(sp.log_weight))
       |    AND (SELECT AVG(log_weight) FROM sp WHERE is_target)
       |      - (SELECT AVG(log_weight) FROM sp WHERE NOT is_target) >= 2.0
       |    AS complete)
       |SELECT doc_id, is_target, n_bigrams, log_weight FROM sp
       |WHERE (SELECT complete FROM ok)""".stripMargin

  /** T11: repetition signals (Gopher-style boilerplate filters) — top
    * bigram share and duplicate-bigram fraction per document.
    */
  val t11Repetition: Q = (s, d) =>
    TextAnalysis.repetitionSignals(t(s, d, "documents"), "doc_id", "text")
  val t11Oracle =
    s"""WITH t AS (SELECT doc_id, $wordsSql AS w FROM documents),
       |b AS (
       |  SELECT doc_id, w[i] || ' ' || w[i+1] AS bigram
       |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i FROM t) z),
       |c AS (SELECT doc_id, bigram, COUNT(*) AS c FROM b GROUP BY 1, 2),
       |g AS (SELECT doc_id, MAX(c) AS top_bigram_n,
       |        CAST(SUM(c) AS BIGINT) AS n_bigrams,
       |        COUNT(*) AS n_distinct_bigrams
       |      FROM c GROUP BY doc_id)
       |SELECT doc_id, top_bigram_n, n_bigrams, n_distinct_bigrams,
       |  CAST(top_bigram_n AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS top_bigram_frac,
       |  CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS dup_bigram_frac
       |FROM g""".stripMargin

  /** T12: token accounting — whitespace tokens vs BPE-ish pre-tokenizer
    * segments per document (the budget signal training pipelines size
    * shards and context windows with). Both engines run the identical
    * lookaround-free regex.
    */
  val t12TokenAccounting: Q = (s, d) =>
    t(s, d, "documents").select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("bigint").as("n_ws_tokens"),
      TextAnalysis.bpeTokenCount(col("text")).cast("bigint").as("n_bpe_tokens"))
  val t12Oracle: String = {
    // DuckDB string literals take backslashes literally; only quotes double
    val re = TextAnalysis.bpePretokenRe.replace("'", "''")
    s"""SELECT doc_id,
       |  len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS n_ws_tokens,
       |  len(list_filter(regexp_extract_all(text, '$re'),
       |      t -> regexp_matches(t, '\\S'))) AS n_bpe_tokens
       |FROM documents""".stripMargin
  }

  /** T13: benchmark decontamination — the leakage guard an LLM pipeline
    * runs before pretraining. Bench = the deterministic 5% md5 split of
    * `documents` (stand-in for an eval set), train = the rest; every
    * train doc sharing an 8-word n-gram with a bench doc is flagged with
    * the offending pair and the distinct shared-gram count. Exact op
    * (same shingle normalization as the dedup family) ⇒ full hash
    * oracle: DuckDB rebuilds both gram sets and recounts the join.
    */
  val t13Decontaminate: Q = (s, d) => {
    val docs = t(s, d, "documents")
    val thr = Sampling.hexThreshold(0.05)
    val bench = docs.filter(Sampling.hashBucket(col("doc_id")) < lit(thr))
    val train = docs.filter(Sampling.hashBucket(col("doc_id")) >= lit(thr))
    Decontaminate.contaminatedPairs(train, "doc_id", "text",
      bench, "doc_id", "text", n = 8)
  }
  val t13Oracle: String = {
    val gram8 = (1 to 8).map(k => s"w[i+${k - 1}]").mkString(" || ' ' || ")
    s"""WITH d AS (SELECT doc_id, $wordsSql AS w FROM documents),
       |g AS (SELECT doc_id,
       |  UNNEST(list_distinct(list_transform(
       |    generate_series(1, greatest(len(w) - 7, 0)), i -> $gram8))) AS gram
       |  FROM d),
       |bench AS (SELECT * FROM g
       |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '0ccccccc'),
       |train AS (SELECT * FROM g
       |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) >= '0ccccccc')
       |SELECT t.doc_id AS train_id, b.doc_id AS bench_id,
       |  COUNT(*) AS shared_ngrams
       |FROM train t JOIN bench b USING (gram)
       |GROUP BY 1, 2""".stripMargin
  }

  /** T26: FUZZY benchmark decontamination — near-duplicates of eval items
    * (paraphrased/lightly-edited leakage) that exact n-gram matching
    * misses. Same bench/train split as q_t13, plus planted identical
    * clones of every (≥3-token) bench doc in the train side: identical
    * text collides in every LSH band, so detection of the plants is
    * certain and the oracle can REQUIRE each planted (clone, bench) pair
    * — under-emission turns the driver red (d4 pattern). Every emitted
    * pair's exact 3-shingle Jaccard is recomputed in DuckDB from raw
    * text.
    */
  val t26FuzzyDecontaminate: Q = (s, d) => {
    val docs = t(s, d, "documents")
    val thr = Sampling.hexThreshold(0.05)
    val bench = docs.filter(Sampling.hashBucket(col("doc_id")) < lit(thr))
    val train = docs.filter(Sampling.hashBucket(col("doc_id")) >= lit(thr))
      .unionByName(bench
        .filter(size(split(TextAnalysis.normalize(col("text")), " ")) >= 3)
        .withColumn("doc_id", col("doc_id") + lit(PlantOffset)))
    Decontaminate.fuzzyContaminatedPairs(train, "doc_id", "text",
      bench, "doc_id", "text", threshold = 0.5)
  }
  val t26Oracle: String = {
    val thr = Sampling.hexThreshold(0.05)
    s"""WITH sp AS (SELECT train_id, bench_id, jaccard
       |  FROM '__SPARK_OUT__/q_t26_fuzzy_decontaminate/*.parquet'),
       |benchdocs AS (SELECT doc_id, text FROM documents
       |  WHERE substr(md5(CAST(doc_id AS STRING)), 1, 8) < '$thr'),
       |plant AS (SELECT doc_id, text FROM benchdocs WHERE len($wordsSql) >= 3),
       |corpus AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE substr(md5(CAST(doc_id AS STRING)), 1, 8) >= '$thr'
       |  UNION ALL SELECT doc_id + $PlantOffset, text FROM plant
       |  UNION ALL SELECT doc_id, text FROM benchdocs),
       |t AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
       |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       |  FROM (SELECT doc_id, $wordsSql AS w FROM corpus) z
       |  WHERE doc_id IN (SELECT train_id FROM sp UNION SELECT bench_id FROM sp)),
       |p AS (
       |  SELECT sp.train_id, sp.bench_id,
       |    ROUND(CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
       |      ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |           len(list_distinct(list_concat(a.sh, b.sh))) END, 6) AS jaccard
       |  FROM sp JOIN t a ON a.doc_id = sp.train_id
       |          JOIN t b ON b.doc_id = sp.bench_id),
       |ok AS (
       |  SELECT NOT EXISTS (SELECT 1 FROM plant pl WHERE NOT EXISTS (
       |    SELECT 1 FROM sp WHERE sp.train_id = pl.doc_id + $PlantOffset
       |      AND sp.bench_id = pl.doc_id)) AS complete)
       |SELECT train_id, bench_id, jaccard FROM p
       |WHERE jaccard >= 0.5 AND (SELECT complete FROM ok)""".stripMargin
  }

  /** X6: canonical-URL dedup ([[TextAnalysis.canonicalizeUrl]]) — the
    * URL-level pre-filter web pipelines run before content dedup: fold
    * scrape-time variants of one page (fragment, utm tracking params,
    * host case) to a canonical URL and keep one representative per
    * group. Deterministic variant noise is synthesized per doc_id so
    * the fold does real work; ~doc_count/100 groups of mixed variants.
    * Full DuckDB replay of construction + canonicalization + grouping.
    */
  val x6UrlDedup: Q = (s, d) => {
    val u0 = concat(lit("https://WWW.Example.com/page/"),
      pmod(col("doc_id"), lit(100)).cast("string"), lit("?lang=en"))
    val m = pmod(col("doc_id"), lit(4))
    val url = when(m === 1, concat(u0, lit("#frag")))
      .when(m === 2, concat(u0, lit("&utm_source=feed")))
      .when(m === 3, concat(u0, lit("&utm_campaign=x#y")))
      .otherwise(u0)
    t(s, d, "documents").select(col("doc_id"), url.as("url"))
      .groupBy(TextAnalysis.canonicalizeUrl(col("url")).as("canon_url"))
      .agg(count(lit(1)).as("n_variants"),
        countDistinct("url").as("n_distinct_raw"),
        min("doc_id").as("keep_id"))
  }
  val x6Oracle: String =
    """WITH u AS (
      |  SELECT doc_id,
      |    'https://WWW.Example.com/page/' || CAST(doc_id % 100 AS STRING)
      |      || '?lang=en' ||
      |    CASE doc_id % 4 WHEN 1 THEN '#frag'
      |                    WHEN 2 THEN '&utm_source=feed'
      |                    WHEN 3 THEN '&utm_campaign=x#y'
      |                    ELSE '' END AS url
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, url,
      |    lower(regexp_extract(u2, '^(https?://[^/]+)', 1)) ||
      |      regexp_extract(u2, '^https?://[^/]+(.*)$', 1) AS canon_url
      |  FROM (SELECT doc_id, url,
      |          regexp_replace(regexp_replace(url, '#.*$', ''),
      |            '[?&]utm_[^&#]*', '', 'g') AS u2
      |        FROM u) z)
      |SELECT canon_url, COUNT(*) AS n_variants,
      |  COUNT(DISTINCT url) AS n_distinct_raw, MIN(doc_id) AS keep_id
      |FROM c GROUP BY canon_url""".stripMargin

  /** T27: Unicode NFC canonicalization ([[graft.functions.TextExprs.nfc]]
    * as a native codegen expression) — the text-cleaning step a corpus
    * pipeline runs BEFORE fingerprinting, so that byte-different but
    * canonically-equal strings (decomposed accents from different
    * scrapers) dedup together. The fixture corpus is pure ASCII, so
    * deterministic decomposed suffixes are planted on doc_id % 5 == 0 and
    * the oracle replays the canonicalization with DuckDB's own
    * `nfc_normalize` — two independent Unicode implementations (ICU-less
    * java.text.Normalizer vs utf8proc) must agree byte-for-byte on the
    * md5 of the result, and on the codepoint count saved by the fold.
    */
  val t27Nfc: Q = (s, d) => {
    graft.functions.VecExprs.register(s)
    val aug = t(s, d, "documents").withColumn("_ta",
      when(pmod(col("doc_id"), lit(5)) === 0,
        concat(col("text"), lit(" cafe\u0301 nin\u0303o")))
        .otherwise(col("text")))
    aug.select(col("doc_id"),
      (call_function("nfc", col("_ta")) =!= col("_ta")).as("changed"),
      md5(call_function("nfc", col("_ta"))).as("fp_nfc"),
      (length(col("_ta")) - length(call_function("nfc", col("_ta"))))
        .cast("bigint").as("delta_chars"))
  }
  val t27Oracle: String =
    """WITH aug AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0
      |         THEN text || ' cafe' || chr(769) || ' nin' || chr(771) || 'o'
      |         ELSE text END AS ta
      |  FROM documents)
      |SELECT doc_id, nfc_normalize(ta) != ta AS changed,
      |  md5(nfc_normalize(ta)) AS fp_nfc,
      |  length(ta) - length(nfc_normalize(ta)) AS delta_chars
      |FROM aug""".stripMargin

  /** T28: BM25 top-k retrieval scoring ([[TextAnalysis.bm25TopK]]) — the
    * lexical data-selection primitive (pull target-domain documents by
    * query relevance; the sparse sibling of q_t25's DSIR weights). The
    * integer arithmetic (k1/b folded to the 88/40/12/36 constants,
    * integer idf surrogate, `div` everywhere) makes every score
    * bit-replayable: DuckDB recomputes the full scoring pipeline —
    * tokenize, per-doc tf/len, corpus df/avgdl, score, top-k — and the
    * hash compare pins scores AND ranking. One corpus scan + one
    * doc-keyed partial-agg shuffle + a 1-row broadcast (plan-pinned).
    */
  private val Bm25Terms = Seq("hash", "vector", "stream")
  val t28Bm25: Q = (s, d) =>
    TextAnalysis.bm25TopK(t(s, d, "documents"), "doc_id", "text",
      Bm25Terms, k = 20)
  val t28Oracle: String = {
    val tfDefs = Bm25Terms.indices.map(i =>
      s"SUM(CASE WHEN w = '${Bm25Terms(i)}' THEN 1 ELSE 0 END) AS tf$i")
      .mkString(",\n  ")
    val dfDefs = Bm25Terms.indices.map(i =>
      s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(",\n  ")
    val scoreTerms = Bm25Terms.indices.map(i =>
      s"(CASE WHEN tf$i > 0 THEN ((((n_docs - df$i + 1) * 1000000) // (df$i + 1))" +
        s" * tf$i * 88 * avgdl) // (40 * avgdl * tf$i + 12 * avgdl + 36 * len)" +
        " ELSE 0 END)").mkString(" +\n  ")
    val nTerms = Bm25Terms.indices.map(i =>
      s"(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH tk AS (SELECT doc_id, UNNEST($wordsSql) AS w FROM documents),
       |tk2 AS (SELECT doc_id, w FROM tk WHERE length(w) > 0),
       |perdoc AS (SELECT doc_id, COUNT(*) AS len,
       |  $tfDefs
       |  FROM tk2 GROUP BY doc_id),
       |c AS (SELECT COUNT(*) AS n_docs, SUM(len) // COUNT(*) AS avgdl,
       |  $dfDefs
       |  FROM perdoc),
       |s AS (SELECT doc_id,
       |  CAST($scoreTerms AS BIGINT) AS score,
       |  CAST($nTerms AS BIGINT) AS n_terms
       |FROM perdoc, c)
       |SELECT doc_id, score, n_terms FROM s WHERE score > 0
       |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  }

  /** D13: exact dedup with a QUALITY keeper ([[Dedup.dedupExactKeepBest]])
    * — of each duplicate group keep the highest-quality capture (min id
    * on ties), the curation-grade keeper rule vs q_d2's min-id. The raw
    * fixture has no exact duplicates, so the corpus is the
    * [[withPlantedClones]] one, and each planted clone gets a +1 quality
    * bump: the correct keeper for every planted group is the CLONE
    * (id ≥ [[PlantOffset]]), the exact opposite of the min-id rule — so
    * a keeper-rule regression to min-id flips ~2% of rows red rather
    * than passing vacuously. Fully replayed: DuckDB rebuilds the planted
    * corpus and recomputes the argmax-with-tie-break keeper via an
    * ordered FIRST.
    */
  val d13KeepBest: Q = (s, d) => {
    val corpus = withPlantedClones(t(s, d, "documents"))
      .withColumn("qual", col("n_chars") +
        when(col("doc_id") >= PlantOffset, 1L).otherwise(0L))
    Dedup.dedupExactKeepBest(corpus, "doc_id", "text", col("qual"))
      .select(col("doc_id"), col("qual"), col("group_size"))
  }
  val d13KeepBestOracle =
    s"""WITH plant AS (
       |  SELECT doc_id, text, n_chars FROM documents
       |  WHERE substr(md5('plant:' || CAST(doc_id AS STRING)), 1, 8) < '$PlantThr'
       |    AND len($wordsSql) >= 3),
       |corpus AS (
       |  SELECT doc_id, text, n_chars + 0 AS qual FROM documents
       |  UNION ALL
       |  SELECT doc_id + $PlantOffset, text, n_chars + 1 FROM plant),
       |g AS (SELECT doc_id, qual, md5($normSql) AS fp FROM corpus),
       |k AS (SELECT fp, COUNT(*) AS group_size,
       |        FIRST(doc_id ORDER BY qual DESC, doc_id ASC) AS kid
       |      FROM g GROUP BY fp)
       |SELECT g.doc_id, g.qual, k.group_size
       |FROM g JOIN k ON g.fp = k.fp AND g.doc_id = k.kid""".stripMargin

  /** R1: hybrid retrieval — BM25 lexical rankings and brute-force dense
    * rankings for the same three queries, fused with reciprocal-rank
    * fusion ([[Retrieval.rrfFuse]]). Each query is a (term set, query
    * vector) pair over the aligned documents/embeddings tables
    * (doc_id ≡ vec_id). Every stage is deterministic — BM25 is the
    * integer arithmetic of q_t28, the dense leg is the round-6 cosine
    * ranking of q_s1, and the fusion contribution is
    * `10^9 div (60 + rank)` in int64 — so the oracle replays the ENTIRE
    * hybrid pipeline (both legs + fusion) bit-for-bit from the raw
    * tables: a full-replay ✓ oracle, not an echo.
    */
  private val RrfQueries: Seq[(Int, Seq[String])] = Seq(
    0 -> Seq("hash", "join", "merge"),
    1 -> Seq("vector", "stream", "window"),
    2 -> Seq("filter", "scan", "sort"))
  private val RrfLegK = 20

  val r1HybridRrf: Q = (s, d) => {
    val docs = t(s, d, "documents")
    val emb = t(s, d, "embeddings")
    val qvecs = emb.filter(col("vec_id") < RrfQueries.size)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val dense = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        qvecs, k = RrfLegK)
      .select(col("query_id").cast("bigint").as("query_id"),
        col("id").cast("bigint").as("id"), col("rank").cast("bigint").as("rank"),
        lit("dense").as("source"))
    // all three lexical legs in ONE corpus pass (vs 3 scans + 3 shuffles
    // with per-query bm25TopK — bit-identical results, spec-pinned)
    val lexical = TextAnalysis.bm25TopKMulti(docs, "doc_id", "text",
        RrfQueries, k = RrfLegK)
      .select(col("query_id"), col("id").cast("bigint").as("id"),
        col("rank"), lit("lexical").as("source"))
    Retrieval.rrfFuse(dense.unionByName(lexical), k = 10)
  }

  /** Shared CTE body: both retrieval legs + integer RRF fusion, ending in
    * `fz(query_id, id, rrf_score, n_sources, rank)`. Used by the q_r1
    * oracle and, with the MMR tail stacked on top, by q_r4's.
    */
  private val rrfBodySql: String = {
    val allTerms = RrfQueries.flatMap(_._2)
    val tfDefs = allTerms.indices.map(i =>
      s"SUM(CASE WHEN w = '${allTerms(i)}' THEN 1 ELSE 0 END) AS tf$i")
      .mkString(",\n  ")
    val dfDefs = allTerms.indices.map(i =>
      s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(",\n  ")
    def lexLeg(qid: Int): String = {
      val base = RrfQueries.take(qid).map(_._2.size).sum
      val idx = RrfQueries(qid)._2.indices.map(_ + base)
      val score = idx.map(i =>
        s"(CASE WHEN tf$i > 0 THEN ((((n_docs - df$i + 1) * 1000000) // (df$i + 1))" +
          s" * tf$i * 88 * avgdl) // (40 * avgdl * tf$i + 12 * avgdl + 36 * len)" +
          " ELSE 0 END)").mkString(" +\n    ")
      s"""lex$qid AS (
         |  SELECT query_id, id, rank FROM (
         |    SELECT CAST($qid AS BIGINT) AS query_id, doc_id AS id,
         |      ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
         |    FROM (SELECT doc_id, CAST($score AS BIGINT) AS score
         |          FROM perdoc, c) zs WHERE score > 0) zr
         |  WHERE rank <= $RrfLegK)""".stripMargin
    }
    s"""tk AS (SELECT doc_id, UNNEST($wordsSql) AS w FROM documents),
       |tk2 AS (SELECT doc_id, w FROM tk WHERE length(w) > 0),
       |perdoc AS (SELECT doc_id, COUNT(*) AS len,
       |  $tfDefs
       |  FROM tk2 GROUP BY doc_id),
       |c AS (SELECT COUNT(*) AS n_docs, SUM(len) // COUNT(*) AS avgdl,
       |  $dfDefs
       |  FROM perdoc),
       |${RrfQueries.map { case (qid, _) => lexLeg(qid) }.mkString(",\n")},
       |e AS (
       |  SELECT vec_id, embedding,
       |    SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
       |          FROM (SELECT UNNEST(embedding) AS x) ux)) AS nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qvec, nrm AS qnrm
       |      FROM e WHERE vec_id < ${RrfQueries.size}),
       |dense AS (
       |  SELECT query_id, id, rank FROM (
       |    SELECT q.query_id, e.vec_id AS id,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
       |        ROUND(CASE WHEN e.nrm * q.qnrm = 0 THEN 0.0 ELSE
       |          (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
       |           FROM (SELECT UNNEST(e.embedding) AS x, UNNEST(q.qvec) AS y) u)
       |          / (e.nrm * q.qnrm) END, 6) DESC, e.vec_id) AS rank
       |    FROM e CROSS JOIN q) z WHERE rank <= $RrfLegK),
       |allr AS (
       |  SELECT * FROM dense
       |  ${RrfQueries.map { case (qid, _) => s"UNION ALL SELECT * FROM lex$qid" }.mkString("\n  ")}),
       |f AS (SELECT query_id, id,
       |        CAST(SUM(${Retrieval.RrfScale} // (${Retrieval.DefaultK0} + rank)) AS BIGINT) AS rrf_score,
       |        COUNT(*) AS n_sources
       |      FROM allr GROUP BY query_id, id),
       |fz AS (SELECT query_id, id, rrf_score, n_sources,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY rrf_score DESC, id) AS rank
       |  FROM f)""".stripMargin
  }

  val r1Oracle: String =
    s"""WITH $rrfBodySql
       |SELECT query_id, rank, id, rrf_score, n_sources FROM fz
       |WHERE rank <= 10""".stripMargin

  /** R2: MMR diversity selection ([[Retrieval.mmrSelect]]) over the
    * dense top-20 head of each of the five q_s1 queries — pick 5 docs
    * balancing rank-relevance against redundancy (λ = 0.7). Relevance is
    * rank-arithmetic, similarity the round-6 cosine, and the greedy
    * combination fixed-order IEEE arithmetic, so the oracle unrolls all
    * five greedy steps in SQL and replays every pick and score exactly.
    */
  private val MmrK = 5; private val MmrCand = 20

  val r2Mmr: Q = (s, d) => {
    val emb = t(s, d, "embeddings")
    val dense = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queryVecs(s, d), k = MmrCand)
      .select(col("query_id"), col("id"), col("rank"))
    Retrieval.mmrSelect(dense, emb, "vec_id", "embedding",
      k = MmrK, nCand = MmrCand)
  }

  /** MMR CTE tail: expects `cand(query_id, id, rank)` and `e` (embeddings
    * with norms) to be defined upstream; emits the final pick SELECT.
    * Shared by the q_r2 and q_r4 oracles.
    */
  private def mmrTailSql(nCand: Int, kPick: Int): String = {
    val relSql = s"CAST(0.7 AS DOUBLE) * (CAST(${nCand + 1} - rank AS DOUBLE) / $nCand)"
    def step(t: Int): String =
      if (t == 1)
        """s1 AS (SELECT query_id, id, score, 1 AS pick FROM (
          |  SELECT query_id, id, relterm AS score, ROW_NUMBER() OVER (
          |    PARTITION BY query_id ORDER BY relterm DESC, id) AS rn
          |  FROM relq) z WHERE rn = 1),
          |sel1 AS (SELECT query_id, id FROM s1)""".stripMargin
      else
        s"""p$t AS (SELECT r.query_id, r.id, r.relterm - CAST(0.3 AS DOUBLE) * (
           |    SELECT MAX(p.sim) FROM pairs p
           |    WHERE p.query_id = r.query_id AND p.ia = r.id
           |      AND p.ib IN (SELECT id FROM sel${t - 1} s
           |                   WHERE s.query_id = r.query_id)) AS score
           |  FROM relq r WHERE NOT EXISTS (
           |    SELECT 1 FROM sel${t - 1} s
           |    WHERE s.query_id = r.query_id AND s.id = r.id)),
           |s$t AS (SELECT query_id, id, score, $t AS pick FROM (
           |  SELECT query_id, id, score, ROW_NUMBER() OVER (
           |    PARTITION BY query_id ORDER BY score DESC, id) AS rn
           |  FROM p$t) z WHERE rn = 1),
           |sel$t AS (SELECT query_id, id FROM sel${t - 1}
           |  UNION ALL SELECT query_id, id FROM s$t)""".stripMargin
    s"""cv AS (SELECT c.query_id, c.id, c.rank, e.embedding, e.nrm
       |       FROM cand c JOIN e ON e.vec_id = c.id),
       |pairs AS (
       |  SELECT a.query_id, a.id AS ia, b.id AS ib,
       |    ROUND(CASE WHEN a.nrm * b.nrm = 0 THEN 0.0 ELSE
       |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
       |       FROM (SELECT UNNEST(a.embedding) AS x, UNNEST(b.embedding) AS y) u)
       |      / (a.nrm * b.nrm) END, 6) AS sim
       |  FROM cv a JOIN cv b ON a.query_id = b.query_id),
       |relq AS (SELECT query_id, id, $relSql AS relterm FROM cand),
       |${(1 to kPick).map(step).mkString(",\n")}
       |SELECT query_id, CAST(pick AS BIGINT) AS pick, id, score AS mmr_score
       |FROM (${(1 to kPick).map(t => s"SELECT * FROM s$t").mkString(" UNION ALL ")}) zz""".stripMargin
  }

  val r2Oracle: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |    SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
       |          FROM (SELECT UNNEST(embedding) AS x) ux)) AS nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qvec, nrm AS qnrm
       |      FROM e WHERE vec_id < 5),
       |cand AS (
       |  SELECT query_id, id, rank FROM (
       |    SELECT q.query_id, e.vec_id AS id,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
       |        ROUND(CASE WHEN e.nrm * q.qnrm = 0 THEN 0.0 ELSE
       |          (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
       |           FROM (SELECT UNNEST(e.embedding) AS x, UNNEST(q.qvec) AS y) u)
       |          / (e.nrm * q.qnrm) END, 6) DESC, e.vec_id) AS rank
       |    FROM e CROSS JOIN q) z WHERE rank <= $MmrCand),
       |${mmrTailSql(MmrCand, MmrK)}""".stripMargin

  /** R4: the retrieval-pipeline capstone — lexical BM25 + dense cosine
    * legs, integer RRF fusion (q_r1), then MMR diversity re-ranking of
    * the fused top-10 (relevance = fused rank) picking 5 per query. One
    * oracle replays the ENTIRE composed pipeline: tokenize→BM25, cosine
    * ranking, fusion, and all five greedy picks.
    */
  val r4RetrievalPipeline: Q = (s, d) => {
    val fused = r1HybridRrf(s, d).select("query_id", "id", "rank")
    Retrieval.mmrSelect(fused, t(s, d, "embeddings"), "vec_id", "embedding",
      k = 5, nCand = 10)
  }
  val r4Oracle: String =
    s"""WITH $rrfBodySql,
       |cand AS (SELECT query_id, id, rank FROM fz WHERE rank <= 10),
       |${mmrTailSql(10, 5)}""".stripMargin

  /** R5: ANN recall evaluation ([[Retrieval.rankEval]]) — the quality
    * report every approximate index needs before it replaces the exact
    * scan: the binary-quantized Hamming pipeline (q_s23's system,
    * integer-exact) is scored against the brute-force cosine truth
    * (q_s1's baseline) per query — hits@10 (the recall numerator), the
    * system rank of the first relevant id (the MRR denominator), and
    * the emitted-row count as the completeness guard. Both rankers are
    * deterministic, so the oracle replays BOTH pipelines end-to-end and
    * the eval join on top; integer-only outputs keep the compare
    * bit-stable.
    */
  val r5RankEval: Q = (s, d) => {
    val emb = t(s, d, "embeddings").select("vec_id", "embedding")
    val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queryVecs(s, d), k = 10)
    val sys = Similarity.binaryHammingTopK(emb, "vec_id", "embedding",
      queryVecs(s, d), "query_id", "qvec", dim = 64, m = 50, k = 10)
    Retrieval.rankEval(truth, "id", sys, "vec_id", "rank")
  }
  val r5Oracle: String =
    """WITH codes AS (
      |  SELECT vec_id, embedding,
      |    CAST(list_sum(list_transform(range(1, 33), d ->
      |      CASE WHEN CAST(embedding[d] AS DOUBLE) > 0
      |           THEN CAST(1 AS BIGINT) << (d - 1) ELSE 0 END))
      |      AS BIGINT) AS c0,
      |    CAST(list_sum(list_transform(range(33, 65), d ->
      |      CASE WHEN CAST(embedding[d] AS DOUBLE) > 0
      |           THEN CAST(1 AS BIGINT) << (d - 33) ELSE 0 END))
      |      AS BIGINT) AS c1
      |  FROM embeddings),
      |q AS (SELECT vec_id AS query_id, embedding AS qvec, c0 AS q0,
      |             c1 AS q1
      |      FROM codes WHERE vec_id < 5),
      |h AS (
      |  SELECT q.query_id, c.vec_id, c.embedding, q.qvec,
      |    CAST(bit_count(xor(c.c0, q.q0)) + bit_count(xor(c.c1, q.q1))
      |         AS BIGINT) AS hamming
      |  FROM codes c CROSS JOIN q),
      |pool AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY hamming, vec_id) AS cr
      |  FROM h),
      |fine AS (
      |  SELECT query_id, vec_id,
      |    ROUND(
      |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
      |       FROM (SELECT UNNEST(embedding) AS x, UNNEST(qvec) AS y) u)
      |      / (SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
      |               FROM (SELECT UNNEST(embedding) AS x) ux))
      |       * SQRT((SELECT SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))
      |               FROM (SELECT UNNEST(qvec) AS y) uy))), 6)
      |      AS cosine_sim
      |  FROM pool WHERE cr <= 50),
      |sysr AS (
      |  SELECT query_id, vec_id AS sid, CAST(rnk AS BIGINT) AS srank
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |          ORDER BY cosine_sim DESC, vec_id) AS rnk FROM fine) z
      |  WHERE rnk <= 10),
      |te AS (
      |  SELECT vec_id, embedding,
      |    SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
      |          FROM (SELECT UNNEST(embedding) AS x) ux)) AS nrm
      |  FROM embeddings),
      |tq AS (SELECT vec_id AS query_id, embedding AS qvec, nrm AS qnrm
      |       FROM te WHERE vec_id < 5),
      |tsc AS (
      |  SELECT tq.query_id, te.vec_id AS id,
      |    ROUND(CASE WHEN te.nrm * tq.qnrm = 0 THEN 0.0 ELSE
      |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
      |       FROM (SELECT UNNEST(te.embedding) AS x,
      |                    UNNEST(tq.qvec) AS y) u)
      |      / (te.nrm * tq.qnrm) END, 6) AS cosine_sim
      |  FROM te CROSS JOIN tq),
      |truth AS (
      |  SELECT query_id, id FROM (
      |    SELECT query_id, id, ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY cosine_sim DESC, id) AS rank FROM tsc) z
      |  WHERE rank <= 10)
      |SELECT s.query_id,
      |  CAST(SUM(CASE WHEN t.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS hits_at_k,
      |  MIN(CASE WHEN t.id IS NOT NULL THEN s.srank END) AS first_hit_rank,
      |  CAST(COUNT(*) AS BIGINT) AS n_system
      |FROM sysr s LEFT JOIN truth t
      |  ON t.query_id = s.query_id AND t.id = s.sid
      |GROUP BY s.query_id""".stripMargin

  /** R3: positional inverted index + boolean/phrase retrieval
    * ([[Postings]]) — conjunctive AND over three terms and an exact
    * two-word phrase, both answered from the same positional postings.
    * Everything is integer/array arithmetic on the shared normalized
    * tokenization, so DuckDB rebuilds the postings (zipped UNNEST for
    * positions) and replays both query modes verbatim.
    */
  private val R3Phrase = Seq("table", "value")
  private val R3AndTerms = Seq("vector", "stream", "window")

  val r3PhraseSearch: Q = (s, d) => {
    // prune to the union of queried terms ONCE and materialize: the
    // per-term filters inside phrase()/conjunctive() push below the
    // postings aggregation, so three query legs would otherwise each
    // re-run the corpus scan + normalize + explode (no exchange reuse
    // across differing pushed filters). The materialized frame is the
    // queried terms' postings only — tiny at any corpus scale.
    val terms = (R3Phrase ++ R3AndTerms).distinct
    val post = Postings.build(t(s, d, "documents"), "doc_id", "text")
      .filter(col("term").isin(terms: _*))
      .barrier(true)
    val ph = Postings.phrase(post, R3Phrase)
      .select(lit("phrase").as("mode"), col("doc_id"),
        col("n_matches").as("metric"))
    val conj = Postings.conjunctive(post, R3AndTerms)
      .select(lit("and").as("mode"), col("doc_id"),
        col("total_tf").as("metric"))
    ph.unionByName(conj)
  }
  val r3Oracle: String = {
    val andList = R3AndTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH z AS (SELECT doc_id, $wordsSql AS w FROM documents),
       |tk AS (SELECT doc_id,
       |    UNNEST(range(1, len(w) + 1)) - 1 AS pos, UNNEST(w) AS tok
       |  FROM z),
       |tk2 AS (SELECT doc_id, pos, tok FROM tk WHERE length(tok) > 0),
       |post AS (SELECT tok AS term, doc_id,
       |    list_sort(list(pos)) AS positions, COUNT(*) AS tf
       |  FROM tk2 GROUP BY tok, doc_id),
       |ph AS (SELECT a.doc_id,
       |    len(list_filter(a.positions,
       |        p -> list_contains(b.positions, p + 1))) AS m
       |  FROM post a JOIN post b ON a.doc_id = b.doc_id
       |  WHERE a.term = '${R3Phrase(0)}' AND b.term = '${R3Phrase(1)}'),
       |conj AS (SELECT doc_id, SUM(tf) AS total_tf FROM post
       |  WHERE term IN ($andList) GROUP BY doc_id
       |  HAVING COUNT(DISTINCT term) = ${R3AndTerms.size})
       |SELECT 'phrase' AS mode, doc_id, CAST(m AS BIGINT) AS metric
       |FROM ph WHERE m > 0
       |UNION ALL
       |SELECT 'and' AS mode, doc_id, CAST(total_tf AS BIGINT) AS metric
       |FROM conj""".stripMargin
  }

  /** T31: weight-proportional systematic sampling
    * ([[Sampling.weightedSystematic]]) — keep ~50 docs with probability
    * ∝ n_chars, deterministically (no rand(), all int64). The Spark side
    * runs the hierarchical shard-cumsum; the oracle replays the SAME
    * selection with one global window, which must agree because the
    * shard is a prefix of the sort key.
    */
  val t31WeightedSample: Q = (s, d) =>
    Sampling.weightedSystematic(t(s, d, "documents"), "doc_id", "n_chars",
        target = 50L)
      .select(col("doc_id"), col("n_chars"), col("cum"), col("step"))
  val t31Oracle =
    """WITH h AS (SELECT doc_id, n_chars,
      |    md5(CAST(doc_id AS STRING)) AS hx FROM documents),
      |c AS (SELECT doc_id, n_chars,
      |    CAST(SUM(n_chars) OVER (ORDER BY hx, doc_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM h),
      |s AS (SELECT CAST(GREATEST(SUM(n_chars) // 50, 1) AS BIGINT) AS step
      |      FROM documents)
      |SELECT doc_id, n_chars, cum, step FROM c, s
      |WHERE cum // step > (cum - n_chars) // step""".stripMargin

  /** T38: contiguous global example index ([[Sampling.globalIndex]]) —
    * 0..N-1 ids in total (lang, doc_id) order with a lang shard (order-
    * consistent by construction), assigned via the hierarchical
    * shard-cumsum instead of the unpartitioned window that would
    * collapse 100 TB onto one task. The oracle IS that single global
    * window — per-shard positions + shard offsets must reproduce it
    * exactly, row for row.
    */
  val t38GlobalIndex: Q = (s, d) =>
    Sampling.globalIndex(
      t(s, d, "documents").select("doc_id", "lang", "n_chars"),
      shardCol = col("lang"),
      orderCols = Seq(col("lang"), col("doc_id")))
      .select(col("doc_id"), col("lang"), col("idx"))
  val t38Oracle =
    """SELECT doc_id, lang,
      |  CAST(ROW_NUMBER() OVER (ORDER BY lang, doc_id) - 1 AS BIGINT)
      |    AS idx
      |FROM documents""".stripMargin

  /** M6: perceptual-hash image dedup ([[Multimodal.dHash64]]) — the
    * multimodal×dedup bridge: byte-distinct gradient PNGs that differ
    * only in exposure (`id div 64` brightness offsets on the same
    * `id mod 64` structure) hash EQUAL under dHash (neighbor comparisons
    * cancel uniform shifts), so the groups an md5 dedup can never find
    * fall out of one hash groupBy. The fixture pattern is arithmetic and
    * PNG is lossless, so the oracle recomputes every hash bit — real
    * `javax.imageio` decode on the Spark side, closed-form integer
    * replay on the DuckDB side — plus the grouping. `n_exposures` > 1 on
    * multi-member groups states "the payload bytes differed" as data.
    */
  val m6PhashDedup: Q = (s, d) => {
    // EAGER barrier (not lazy .cache()): the hash frame feeds both the
    // group aggregate and the join back, and those two consumers run in
    // ONE job — a lazy cache lets them race and every PNG decodes twice.
    // Spread first: the decode is CPU-dense and the input is one file.
    val hashed = spread(t(s, d, "documents").select(col("doc_id")))
      .withColumn("payload",
        Multimodal.syntheticGradientPayload(col("doc_id")))
      .withColumn("dhash", Multimodal.dHashCol(col("payload")))
      .drop("payload").barrier(true)
    val groups = hashed.groupBy("dhash")
      .agg(count(lit(1)).as("group_size"),
        min("doc_id").as("keeper_id"),
        countDistinct(expr("(doc_id div 64) % 3")).as("n_exposures"))
    hashed.join(groups, "dhash")
      .select(col("doc_id"), col("dhash"), col("group_size"),
        col("keeper_id"), col("n_exposures"))
  }
  val m6Oracle: String = {
    // integer Rec.601 luminance of the gradient pattern at 9x8-grid cell
    // (xExpr, y) after nearest-neighbor sampling (sx = x*16//9, sy = y)
    def lum(xExpr: String): String = {
      val sx = s"((($xExpr) * 16) // 9)"
      val sy = "(j // 8)"
      s"(299 * ((11 * $sx + 23 * $sy + 5 * p) % 250 + b) + " +
        s"587 * ((7 * $sx + 31 * $sy + 3 * p) % 250 + b) + " +
        s"114 * ((17 * $sx + 13 * $sy + 11 * p) % 250 + b))"
    }
    s"""WITH ids AS (SELECT doc_id, CAST(doc_id % 64 AS INT) AS p,
       |    CAST((doc_id // 64) % 3 AS INT) AS b FROM documents),
       |hraw AS (SELECT doc_id, b,
       |    list_sum(list_transform(range(0, 64), j ->
       |      CASE WHEN ${lum("(j % 8) + 1")} > ${lum("j % 8")}
       |      THEN (CAST(1 AS HUGEINT) << j) ELSE CAST(0 AS HUGEINT) END))
       |      AS s
       |  FROM ids),
       |hx AS (SELECT doc_id, b,
       |    CAST(CASE WHEN s >= CAST(9223372036854775808 AS HUGEINT)
       |         THEN s - CAST(18446744073709551616 AS HUGEINT)
       |         ELSE s END AS BIGINT) AS dhash
       |  FROM hraw),
       |g AS (SELECT dhash, COUNT(*) AS group_size, MIN(doc_id) AS keeper_id,
       |        COUNT(DISTINCT b) AS n_exposures
       |      FROM hx GROUP BY dhash)
       |SELECT h.doc_id, h.dhash, g.group_size, g.keeper_id, g.n_exposures
       |FROM hx h JOIN g USING (dhash)""".stripMargin
  }

  /** T30: Luhn-validated PII detection ([[TextAnalysis.luhnValid]]) —
    * beyond q_t9's shape-only redaction: a 16-digit run is only a card
    * number if its mod-10 checksum holds, and a real pipeline must not
    * shred every long number (order ids, timestamps). Each doc gets a
    * deterministic candidate injected — doc_id % 3 = 0 a VALID pan whose
    * check digit the engine itself computes ([[TextAnalysis
    * .luhnCheckDigit]]), % 3 = 1 the same pan with the check digit
    * off-by-one (invalid), % 3 = 2 none — so both validator outcomes are
    * exercised on every fixture and the oracle recomputes the full chain
    * (pan construction, extraction, checksum) from raw data.
    */
  val t30LuhnPii: Q = (s, d) => {
    val base15 = concat(lit("453201511"),
      lpad((col("doc_id") % 1000000).cast("string"), 6, "0"))
    val cd = TextAnalysis.luhnCheckDigit(base15)
    val pan = concat(base15, cd.cast("string"))
    val badPan = concat(base15, ((cd + 1) % 10).cast("string"))
    val aug = when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" card "), pan))
      .when(col("doc_id") % 3 === 1,
        concat(col("text"), lit(" card "), badPan))
      .otherwise(col("text"))
    t(s, d, "documents")
      .select(col("doc_id"),
        explode(TextAnalysis.cardCandidates(aug)).as("candidate"))
      .withColumn("luhn_valid", TextAnalysis.luhnValid(col("candidate")))
      .withColumn("expected_valid", col("doc_id") % 3 === 0)
  }
  val t30Oracle: String = {
    def luhnSum(b: String, parity: Int): String =
      s"list_sum(list_transform(range(1, length($b) + 1), i -> " +
        s"CASE WHEN i % 2 = $parity THEN " +
        s"CASE WHEN 2 * (ascii(substr(reverse($b), i, 1)) - 48) > 9 " +
        s"THEN 2 * (ascii(substr(reverse($b), i, 1)) - 48) - 9 " +
        s"ELSE 2 * (ascii(substr(reverse($b), i, 1)) - 48) END " +
        s"ELSE ascii(substr(reverse($b), i, 1)) - 48 END))"
    s"""WITH b AS (SELECT doc_id, text,
       |    '453201511' || lpad(CAST(doc_id % 1000000 AS STRING), 6, '0')
       |      AS base15
       |  FROM documents),
       |c AS (SELECT doc_id, text, base15,
       |    CAST((10 - ${luhnSum("base15", 1)} % 10) % 10 AS STRING) AS cd
       |  FROM b),
       |aug AS (SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN text || ' card ' || base15 || cd
       |         WHEN doc_id % 3 = 1 THEN text || ' card ' || base15 ||
       |           CAST((CAST(cd AS INT) + 1) % 10 AS STRING)
       |         ELSE text END AS ta
       |  FROM c),
       |e AS (SELECT doc_id,
       |    UNNEST(regexp_extract_all(ta, '\\b\\d{13,19}\\b')) AS candidate
       |  FROM aug)
       |SELECT doc_id, candidate,
       |  ${luhnSum("candidate", 0)} % 10 = 0 AS luhn_valid,
       |  doc_id % 3 = 0 AS expected_valid
       |FROM e""".stripMargin
  }

  /** S15: contrastive hard-negative mining
    * ([[Retrieval.hardNegativeTopK]]) — per anchor, the top-10 nearest
    * vectors of a DIFFERENT label. Same full-replay form as q_s1 plus
    * the label-inequality predicate.
    */
  val s15HardNegatives: Q = (s, d) => {
    val emb = t(s, d, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("label").as("qlabel"))
    Retrieval.hardNegativeTopK(emb, "vec_id", "embedding", "label", q, k = 10)
  }
  val s15Oracle =
    """WITH e AS (
      |  SELECT vec_id, label, embedding,
      |    SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
      |          FROM (SELECT UNNEST(embedding) AS x) ux)) AS nrm
      |  FROM embeddings),
      |q AS (SELECT vec_id AS query_id, label AS qlabel, embedding AS qvec,
      |             nrm AS qnrm
      |      FROM e WHERE vec_id < 5),
      |sc AS (
      |  SELECT q.query_id, e.vec_id AS id, CAST(e.label AS BIGINT) AS neg_label,
      |    ROUND(CASE WHEN e.nrm * q.qnrm = 0 THEN 0.0 ELSE
      |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
      |       FROM (SELECT UNNEST(e.embedding) AS x, UNNEST(q.qvec) AS y) u)
      |      / (e.nrm * q.qnrm) END, 6) AS cosine_sim
      |  FROM e CROSS JOIN q WHERE e.label <> q.qlabel)
      |SELECT query_id, rank, id, neg_label, cosine_sim FROM (
      |  SELECT query_id, id, neg_label, cosine_sim,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY cosine_sim DESC, id) AS rank
      |  FROM sc) z WHERE rank <= 10""".stripMargin

  /** S16: per-label prototype vectors ([[Clustering.labelPrototypes]]) in
    * the exact integer arithmetic of q_s14 — one partial-agg shuffle,
    * every coordinate replayed engine-for-engine.
    */
  val s16LabelPrototypes: Q = (s, d) =>
    Clustering.labelPrototypes(t(s, d, "embeddings"), "label", "embedding")
  val s16Oracle = {
    val m = Clustering.offsetFor(1024)
    s"""WITH qv AS (SELECT label, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS q
       |  FROM embeddings),
       |u AS (SELECT CAST(label AS BIGINT) AS label, d, SUM(q[d]) AS s,
       |             COUNT(*) AS n_vecs
       |      FROM qv, range(1, 65) t(d) GROUP BY label, d)
       |SELECT label, n_vecs, d - 1 AS dim,
       |  CAST((2 * (s + $m * n_vecs) + n_vecs) // (2 * n_vecs) - $m
       |       AS BIGINT) AS c_q
       |FROM u""".stripMargin
  }

  /** S17: label-outlier mining ([[Clustering.labelOutliers]]) — per
    * label, the 5 vectors farthest from their own label prototype:
    * mislabel/noise candidates. Integer distances against the q_s16
    * prototypes; the oracle rebuilds prototypes and replays ranking.
    */
  val s17LabelOutliers: Q = (s, d) =>
    Clustering.labelOutliers(t(s, d, "embeddings"), "vec_id", "embedding",
      "label", k = 5)
  val s17Oracle = {
    val m = Clustering.offsetFor(1024)
    s"""WITH qv AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
       |    list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS q
       |  FROM embeddings),
       |u AS (SELECT label, d, SUM(q[d]) AS s, COUNT(*) AS n
       |      FROM qv, range(1, 65) t(d) GROUP BY label, d),
       |c AS (SELECT label,
       |    list((2 * (s + $m * n) + n) // (2 * n) - $m ORDER BY d) AS cent
       |  FROM u GROUP BY label)
       |SELECT label, rank, id, dist_sq FROM (
       |  SELECT v.label, v.vec_id AS id,
       |    CAST(list_sum(list_transform(range(1, 65),
       |      i -> (v.q[i] - c.cent[i]) * (v.q[i] - c.cent[i]))) AS BIGINT)
       |      AS dist_sq,
       |    ROW_NUMBER() OVER (PARTITION BY v.label ORDER BY
       |      list_sum(list_transform(range(1, 65),
       |        i -> (v.q[i] - c.cent[i]) * (v.q[i] - c.cent[i]))) DESC,
       |      v.vec_id) AS rank
       |  FROM qv v JOIN c ON c.label = v.label) z WHERE rank <= 5""".stripMargin
  }

  /** S14: distributed Lloyd k-means in exact integer arithmetic
    * ([[Clustering.kmeansExact]]) — the reproducible-clustering primitive
    * under curation cells / SemDeDup-style semantic grouping. Because
    * every stage is integer (power-of-two quantization, int64 sums,
    * sign-safe half-up centroid rounding, integer argmin with
    * lowest-cell ties), the oracle UNROLLS all three Lloyd iterations in
    * SQL — seed selection, three assignment+update rounds, final
    * assignment — and replays the result bit-for-bit from the raw
    * embeddings. A float k-means could never be checked this way (ulp
    * drift at cell boundaries); the quantized one is exactly portable.
    */
  private val KmK = 8; private val KmIters = 3
  private val KmScale = 1024; private val KmDim = 64

  val s14Kmeans: Q = (s, d) =>
    Clustering.kmeansExact(t(s, d, "embeddings"), "vec_id", "embedding",
        k = KmK, iters = KmIters, scale = KmScale)
      .select(col("id").as("vec_id"), col("cell"), col("dist_sq"))

  val s14Oracle: String = {
    val m = Clustering.offsetFor(KmScale)
    val rng = s"range(1, ${KmDim + 1})"
    def distSql(v: String, c: String): String =
      s"CAST(list_sum(list_transform($rng, i -> ($v.q[i] - $c.cent[i]) * ($v.q[i] - $c.cent[i]))) AS BIGINT)"
    def iterSql(it: Int): String = {
      val prev = s"c${it - 1}"
      s"""a$it AS (SELECT vec_id, q, cell FROM (
         |  SELECT vec_id, q, cell,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
         |  FROM (SELECT v.vec_id, v.q, c.cell, ${distSql("v", "c")} AS dist
         |        FROM qv v CROSS JOIN $prev c) zz) z WHERE rn = 1),
         |u$it AS (SELECT cell, d, SUM(q[d]) AS s, COUNT(*) AS n
         |  FROM a$it, range(1, ${KmDim + 1}) t(d) GROUP BY cell, d),
         |c$it AS (SELECT p.cell, COALESCE(nc.cent, p.cent) AS cent
         |  FROM c${it - 1} p LEFT JOIN (
         |    SELECT cell, list((2 * (s + $m * n) + n) // (2 * n) - $m
         |                      ORDER BY d) AS cent
         |    FROM u$it GROUP BY cell) nc USING (cell))""".stripMargin
    }
    s"""WITH qv AS (SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * $KmScale) AS BIGINT)) AS q
       |  FROM embeddings),
       |c0 AS (SELECT cell, q AS cent FROM (
       |  SELECT q, ROW_NUMBER() OVER (
       |    ORDER BY md5(CAST(vec_id AS STRING)), vec_id) - 1 AS cell
       |  FROM qv) z WHERE cell < $KmK),
       |${(1 to KmIters).map(iterSql).mkString(",\n")}
       |SELECT vec_id, CAST(cell AS BIGINT) AS cell, dist AS dist_sq FROM (
       |  SELECT vec_id, cell, dist,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
       |  FROM (SELECT v.vec_id, c.cell, ${distSql("v", "c")} AS dist
       |        FROM qv v CROSS JOIN c$KmIters c) zz) z WHERE rn = 1""".stripMargin
  }

  /** T29: HTML boilerplate removal ([[TextAnalysis.extractHtmlText]]) —
    * the web-corpus cleaning step. Each document is wrapped in a
    * deterministic HTML page (title + style/script payloads with stray
    * `<`, nav/footer chrome, entity-laden metadata) INSIDE the query, so
    * the extractor runs against real markup while DuckDB can rebuild the
    * identical page and replay the identical regexp chain — a full ✓
    * oracle over every row. The emitted `roundtrip_ok` flag additionally
    * states the end-to-end invariant (extracted = title + decoded meta +
    * body text) as data the driver hash-checks.
    */
  private val HtmlPre = "<html><head><title>Doc "
  private val HtmlMid =
    "</title><style>p{margin:0}</style>" +
      "<script>var t=\"x\"; if (1<2) { go(); }</script></head>" +
      "<body><nav><a href=\"/\">Home</a> | <a href=\"/about\">About</a></nav>" +
      "<div class=\"meta\">id &amp; rank &lt;raw&gt; &amp;lt;esc&amp;gt;</div><p>"
  private val HtmlPost = "</p><footer>(c) corpus</footer></body></html>"
  private val HtmlMetaDecoded = " id & rank <raw> &lt;esc&gt; "

  val t29HtmlExtract: Q = (s, d) => {
    val html = concat(lit(HtmlPre), col("doc_id").cast("string"),
      lit(HtmlMid), col("text"), lit(HtmlPost))
    t(s, d, "documents")
      .select(col("doc_id"), col("text"),
        TextAnalysis.extractHtmlText(html).as("extracted"))
      .withColumn("n_chars", length(col("extracted")).cast("bigint"))
      .withColumn("roundtrip_ok", col("extracted") === concat(
        lit("Doc "), col("doc_id").cast("string"), lit(HtmlMetaDecoded),
        trim(regexp_replace(col("text"), "\\s+", " "))))
      .drop("text")
  }

  /** T32: deterministic sentence segmentation + per-doc sentence stats
    * ([[TextAnalysis.sentences]]) — the sentence-level feeder for
    * chunking and quality scoring. Split pattern `[.!?]+\s+` over
    * sentinel-terminated text lives in the Java-regex ∩ RE2 common
    * subset, so DuckDB replays the segmentation byte-exact: counts, word
    * totals, max, the raw-IEEE average, and the first sentence string
    * all hash-compare. One narrow codegen scan, no shuffle.
    */
  val t32Sentences: Q = (s, d) =>
    t(s, d, "documents")
      .select(col("doc_id"), TextAnalysis.sentences(col("text")).as("sents"))
      .select(col("doc_id"), col("sents"),
        TextAnalysis.sentenceWordCounts(col("sents")).as("wc"))
      .select(col("doc_id"), col("sents"),
        size(col("sents")).cast("bigint").as("n_sentences"),
        coalesce(aggregate(col("wc"), lit(0), (a, x) => a + x), lit(0))
          .cast("bigint").as("n_words"),
        coalesce(array_max(col("wc")), lit(0)).cast("bigint")
          .as("max_sentence_words"))
      .select(col("doc_id"), col("n_sentences"), col("n_words"),
        col("max_sentence_words"),
        when(col("n_sentences") === 0, lit(0.0))
          .otherwise(col("n_words").cast("double") / col("n_sentences"))
          .as("avg_words_per_sentence"),
        coalesce(element_at(col("sents"), 1), lit(""))
          .as("first_sentence"))
  val t32Oracle: String =
    """WITH s AS (
      |  SELECT doc_id,
      |    list_filter(list_transform(
      |      regexp_split_to_array(trim(text) || ' ', '[.!?]+\s+'),
      |      x -> trim(x)), x -> length(x) > 0) AS sents
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, sents,
      |    list_transform(sents, st -> len(list_filter(
      |      regexp_split_to_array(st, '\s+'), t -> length(t) > 0))) AS wc
      |  FROM s)
      |SELECT doc_id,
      |  CAST(len(sents) AS BIGINT) AS n_sentences,
      |  CAST(COALESCE(list_sum(wc), 0) AS BIGINT) AS n_words,
      |  CAST(COALESCE(list_max(wc), 0) AS BIGINT) AS max_sentence_words,
      |  CASE WHEN len(sents) = 0 THEN 0.0
      |       ELSE CAST(list_sum(wc) AS DOUBLE) / len(sents) END
      |    AS avg_words_per_sentence,
      |  COALESCE(sents[1], '') AS first_sentence
      |FROM w""".stripMargin

  /** T33: PMI collocation mining ([[TextAnalysis.pmiCollocations]]) —
    * top bigram associations ranked by the exact lift ratio (PMI =
    * log(lift), monotonic, so no log leaves the frame). Counts are
    * exact integers, the lift is a pinned-order IEEE chain, ties break
    * on the bigram — full hash compare.
    */
  val t33Pmi: Q = (s, d) =>
    TextAnalysis.pmiCollocations(t(s, d, "documents"), "text",
      minCount = 5, topN = 40)
  val t33Oracle: String =
    s"""WITH t AS (SELECT list_filter(string_split($normSql, ' '),
       |    x -> length(x) > 0) AS toks FROM documents),
       |u AS (SELECT unnest(toks) AS w FROM t),
       |uc AS (SELECT w, COUNT(*) AS c FROM u GROUP BY w),
       |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tokens FROM uc),
       |b AS (SELECT toks[i] AS w1, toks[i+1] AS w2
       |      FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1))
       |              AS i FROM t) z),
       |bc AS (SELECT w1, w2, COUNT(*) AS c_xy FROM b GROUP BY w1, w2),
       |m AS (SELECT CAST(SUM(c_xy) AS BIGINT) AS m_bigrams FROM bc),
       |j AS (SELECT bc.w1, bc.w2, bc.c_xy, x.c AS c_x, y.c AS c_y,
       |        n.n_tokens, m.m_bigrams
       |      FROM bc JOIN uc x ON x.w = bc.w1
       |              JOIN uc y ON y.w = bc.w2, n, m
       |      WHERE bc.c_xy >= 5),
       |s AS (SELECT *,
       |    ((CAST(c_xy AS DOUBLE) * CAST(n_tokens AS DOUBLE))
       |       * CAST(n_tokens AS DOUBLE))
       |      / ((CAST(m_bigrams AS DOUBLE) * CAST(c_x AS DOUBLE))
       |       * CAST(c_y AS DOUBLE)) AS lift FROM j)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY lift DESC, w1, w2)
       |    AS BIGINT) AS rank,
       |  w1, w2, c_xy, c_x, c_y, n_tokens, m_bigrams, lift
       |FROM s ORDER BY lift DESC, w1, w2 LIMIT 40""".stripMargin

  /** T34: C4-style line-level cleaning ([[TextAnalysis.c4LineClean]]) —
    * the paper's line filters (banned phrase / word floor / terminal
    * punctuation) plus the page-level kept-line floor. The corpus text
    * carries no newlines, so each document is wrapped in a deterministic
    * 8-line page INSIDE the query (one line per filter class: a
    * javascript notice, a nav bar, a doc header, a too-short line, the
    * text body, a curly-brace payload, a lorem-ipsum stuffer, a
    * copyright line); DuckDB rebuilds the identical page and replays the
    * identical lambda chain — full hash compare over every row,
    * including the reassembled `cleaned` text.
    */
  /** T35: token-budget epoch planner ([[Sampling.epochPlan]]) — the
    * mixture-to-repeats calculation a data-constrained training run
    * performs before sampling: per-source available tokens vs the
    * weight-allocated share of a 10M-token budget, with full-epoch and
    * partial-epoch consumption. Weights in basis points keep the whole
    * allocation integer (DIV/%); the only double is the repeat factor,
    * a raw IEEE division. Sources outside the mixture are excluded, so
    * the oracle's VALUES join is also the unlisted-source filter check.
    */
  val t35EpochPlan: Q = (s, d) => {
    val docs = t(s, d, "documents")
      .withColumn("n_tokens",
        TextAnalysis.tokenCount(col("text")).cast("bigint"))
    Sampling.epochPlan(docs, "source", "n_tokens",
      Map("src0" -> 4000L, "src1" -> 2500L, "src2" -> 1500L,
        "src3" -> 1000L, "src4" -> 1000L),
      budgetTokens = 10000000L)
  }
  val t35Oracle: String =
    """WITH tok AS (
      |  SELECT source,
      |    len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS n
      |  FROM documents),
      |a AS (SELECT source, CAST(SUM(n) AS BIGINT) AS available_tokens
      |      FROM tok GROUP BY source),
      |w(source, weight_bp) AS (VALUES
      |  ('src0', 4000), ('src1', 2500), ('src2', 1500),
      |  ('src3', 1000), ('src4', 1000)),
      |p AS (
      |  SELECT a.source, a.available_tokens,
      |    CAST(w.weight_bp AS BIGINT) AS weight_bp,
      |    CAST((CAST(10000000 AS BIGINT) * w.weight_bp) // 10000 AS BIGINT)
      |      AS target_tokens
      |  FROM a JOIN w USING (source))
      |SELECT source, available_tokens, weight_bp, target_tokens,
      |  CAST(CASE WHEN target_tokens = 0 THEN 0
      |       ELSE (target_tokens - 1) // available_tokens + 1 END AS BIGINT)
      |    AS epochs,
      |  CAST(target_tokens % available_tokens AS BIGINT)
      |    AS partial_epoch_tokens,
      |  CAST(target_tokens AS DOUBLE) / CAST(available_tokens AS DOUBLE)
      |    AS repeat_factor
      |FROM p""".stripMargin

  private val C4Boiler: Seq[(String, String)] = Seq(
    // (line planted before the text body, line planted after)
    ("Please enable JavaScript to continue", "{ \"layout\": 1 }"),
    ("Home | About | Contact", "Lorem ipsum dolor sit amet."),
    ("Ok.", "(c) 2026 corpus"))

  val t34C4Clean: Q = (s, d) => {
    val Seq((b1, a1), (b2, a2), (b3, a3)) = C4Boiler
    val page = concat_ws("\n",
      lit(b1), lit(b2),
      concat(lit("Document "), col("doc_id").cast("string"),
        lit(" starts below.")),
      lit(b3),
      concat(trim(col("text")), lit(".")),
      lit(a1), lit(a2), lit(a3))
    TextAnalysis.c4LineClean(
      t(s, d, "documents").withColumn("page", page), "doc_id", "page")
  }
  val t34Oracle: String = {
    val Seq((b1, a1), (b2, a2), (b3, a3)) = C4Boiler
    def q(x: String) = x.replace("'", "''")
    val pageSql = Seq(s"'${q(b1)}'", s"'${q(b2)}'",
      s"'Document ' || CAST(doc_id AS STRING) || ' starts below.'",
      s"'${q(b3)}'", "trim(text) || '.'",
      s"'${q(a1)}'", s"'${q(a2)}'", s"'${q(a3)}'")
      .mkString(" || chr(10) || ")
    val banned = "(contains(lower(x), 'javascript') OR " +
      "contains(lower(x), 'lorem ipsum') OR contains(lower(x), '{'))"
    val words = "len(list_filter(regexp_split_to_array(x, '\\s+'), " +
      "w -> length(w) > 0))"
    val punct = "regexp_matches(x, '[.!?]$')"
    val keep = s"(NOT $banned AND $words >= 3 AND $punct)"
    s"""WITH p AS (SELECT doc_id, $pageSql AS page FROM documents),
       |l AS (SELECT doc_id, list_filter(list_transform(
       |    string_split(page, chr(10)), x -> trim(x)),
       |    x -> length(x) > 0) AS lines FROM p)
       |SELECT doc_id,
       |  CAST(len(lines) AS BIGINT) AS n_lines,
       |  CAST(len(list_filter(lines, x -> $keep)) AS BIGINT) AS n_kept,
       |  CAST(len(list_filter(lines, x -> $banned)) AS BIGINT)
       |    AS n_dropped_banned,
       |  CAST(len(list_filter(lines, x -> NOT $banned AND $words < 3))
       |    AS BIGINT) AS n_dropped_short,
       |  CAST(len(list_filter(lines,
       |    x -> NOT $banned AND $words >= 3 AND NOT $punct)) AS BIGINT)
       |    AS n_dropped_punct,
       |  array_to_string(list_filter(lines, x -> $keep), chr(10))
       |    AS cleaned,
       |  len(list_filter(lines, x -> $keep)) >= 2 AS page_kept
       |FROM l""".stripMargin
  }

  val t29Oracle: String = {
    val chain = (Seq("script", "style", "nav", "footer", "header", "aside")
      .map(tag => s"(?is)<$tag[^>]*>.*?</$tag>" -> " ") ++
      Seq("<[^>]+>" -> " ", "&lt;" -> "<", "&gt;" -> ">",
        "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&"))
      .foldLeft("html")((acc, pr) =>
        s"regexp_replace($acc, '${pr._1.replace("'", "''")}', " +
          s"'${pr._2.replace("'", "''")}', 'g')")
    val extracted = s"trim(regexp_replace($chain, '\\s+', ' ', 'g'))"
    s"""WITH h AS (SELECT doc_id, text,
       |    '$HtmlPre' || CAST(doc_id AS STRING) || '$HtmlMid' || text ||
       |    '$HtmlPost' AS html
       |  FROM documents),
       |x AS (SELECT doc_id, text, $extracted AS extracted FROM h)
       |SELECT doc_id, extracted, length(extracted) AS n_chars,
       |  extracted = 'Doc ' || CAST(doc_id AS STRING) || '$HtmlMetaDecoded'
       |    || trim(regexp_replace(text, '\\s+', ' ', 'g')) AS roundtrip_ok
       |FROM x""".stripMargin
  }

  /** T16: Count-Min-sketch heavy hitters — the 100 TB twin of exact
    * q_t3: full-corpus token frequencies come from a tiny mergeable
    * sketch (fixed seed → deterministic), candidates from a hash-sample.
    * Emitted-row oracle: DuckDB recounts every emitted token exactly and
    * keeps the row only if `exact <= est <= exact + ceil(eps * n_total)`
    * with the emitted `n_total_tokens` matching the true total — an
    * underestimate, a blown error bound, a fabricated token, or a wrong
    * total all turn the driver row red.
    */
  val t16CmsHeavyHitters: Q = (s, d) =>
    TextAnalysis.cmsHeavyHitters(t(s, d, "documents"), "doc_id", "text",
      eps = 1e-4, confidence = 0.99, seed = 42,
      candidateFraction = 0.2, topN = 50)
  val t16Oracle =
    s"""WITH out AS (SELECT token, est_count, n_total_tokens
       |  FROM '__SPARK_OUT__/q_t16_cms_heavyhitters/*.parquet'),
       |tok AS (SELECT UNNEST($wordsSql) AS t FROM documents),
       |ex AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
       |n AS (SELECT COUNT(*) AS n FROM tok),
       |cand AS (
       |  SELECT t AS token FROM (
       |    SELECT UNNEST($wordsSql) AS t FROM documents
       |    WHERE substr(md5(CAST(doc_id AS STRING)), 1, 8) <
       |      '${Sampling.hexThreshold(0.2)}') z
       |  GROUP BY t ORDER BY COUNT(*) DESC, t ASC LIMIT 50),
       |ok AS (SELECT
       |    NOT EXISTS (SELECT 1 FROM cand c
       |                WHERE c.token NOT IN (SELECT token FROM out))
       |    AND NOT EXISTS (SELECT 1 FROM out o
       |                    WHERE o.token NOT IN (SELECT token FROM cand))
       |    AS complete)
       |SELECT o.token, o.est_count, o.n_total_tokens
       |FROM out o JOIN ex ON ex.t = o.token, n
       |WHERE o.n_total_tokens = n.n
       |  AND o.est_count >= ex.c
       |  AND o.est_count <= ex.c + CAST(ceil(0.0001 * n.n) AS BIGINT)
       |  AND (SELECT complete FROM ok)""".stripMargin

  /** T17: mergeable HLL distinct-count sketches — per-source sketches of
    * document fingerprints plus a pure-sketch union row (`__all__`): the
    * persistable incremental-cardinality pattern (per-shard sketches now,
    * any-combination distinct later, no re-scan). Echo oracle keeps each
    * emitted row only if the estimate is within 5% of DuckDB's exact
    * per-source (and overall) distinct count.
    */
  val t17HllDistinct: Q = (s, d) => {
    val docs = t(s, d, "documents")
    val sk = Sketches.distinctSketch(docs, Seq("source"),
      TextAnalysis.fingerprint(col("text")))
    Sketches.estimate(sk).select(col("source"), col("est_distinct"))
      .unionByName(Sketches.unionEstimate(sk)
        .select(lit("__all__").as("source"), col("est_distinct")))
  }
  val t17Oracle =
    s"""WITH out AS (SELECT source, est_distinct
       |  FROM '__SPARK_OUT__/q_t17_hll_distinct/*.parquet'),
       |ex AS (
       |  SELECT source, COUNT(DISTINCT md5($normSql)) AS c
       |  FROM documents GROUP BY source
       |  UNION ALL
       |  SELECT '__all__', COUNT(DISTINCT md5($normSql)) FROM documents),
       |ok AS (SELECT
       |    (SELECT COUNT(*) FROM out) =
       |      (SELECT COUNT(DISTINCT source) FROM documents) + 1
       |    AND NOT EXISTS (SELECT 1 FROM ex
       |                    WHERE ex.source NOT IN (SELECT source FROM out))
       |    AS complete)
       |SELECT o.source, o.est_distinct
       |FROM out o JOIN ex ON ex.source = o.source
       |WHERE ABS(o.est_distinct - ex.c) <=
       |      greatest(1, CAST(ceil(0.05 * ex.c) AS BIGINT))
       |  AND (SELECT complete FROM ok)""".stripMargin

  /** T18: the end-to-end training-data prep capstone — quality gate
    * (≥ 10 tokens) → exact dedup (min-id per fingerprint among
    * survivors) → source-mixture re-weighting → train/val/test split,
    * summarized per (split, source). Every stage is deterministic, so
    * ONE DuckDB oracle replays the whole pipeline: this pins not just
    * each operator but their composition.
    */
  val t18PrepPipeline: Q = (s, d) => {
    val docs = t(s, d, "documents")
    val quality = docs.filter(TextAnalysis.tokenCount(col("text")) >= 10)
    val deduped = Dedup.dedupExact(quality, "doc_id", "text")
    val mixed = Sampling.mixtureSample(deduped, "doc_id", "source",
      t14Rates, defaultRate = 0.5)
    val split = Sampling.hashSplit(mixed, "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    split.groupBy("split", "source").agg(
      count(lit(1)).as("n_docs"),
      sum(TextAnalysis.tokenCount(col("text")).cast("bigint")).as("n_tokens"))
  }
  val t18Oracle: String = {
    val ntSql =
      "len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '))"
    val mixCases = t14Rates.toSeq.sortBy(_._1).map { case (src, r) =>
      s"WHEN source = '$src' THEN '${Sampling.hexThreshold(r)}'"
    }.mkString(" ")
    val bMix = "substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8)"
    val bSplit = "substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)"
    s"""WITH q AS (
       |  SELECT doc_id, source, text FROM documents WHERE $ntSql >= 10),
       |dd AS (
       |  SELECT * FROM q WHERE doc_id IN (
       |    SELECT MIN(doc_id) FROM q GROUP BY md5($normSql))),
       |mixed AS (
       |  SELECT * FROM dd WHERE $bMix <
       |    CASE $mixCases ELSE '${Sampling.hexThreshold(0.5)}' END),
       |sp AS (
       |  SELECT *, CASE WHEN $bSplit < '${Sampling.hexThreshold(0.9)}' THEN 'train'
       |                 WHEN $bSplit < '${Sampling.hexThreshold(0.95)}' THEN 'val'
       |                 ELSE 'test' END AS split
       |  FROM mixed)
       |SELECT split, source, COUNT(*) AS n_docs,
       |  CAST(SUM($ntSql) AS BIGINT) AS n_tokens
       |FROM sp GROUP BY 1, 2""".stripMargin
  }

  /** T19: Gopher-style quality rule battery — token-count range, mean
    * word length range, distinct-stopword minimum, distinct-token ratio
    * (repetition guard), and the combined pass flag; one exchange-free
    * scan, fully replayed by the DuckDB oracle.
    */
  val t19GopherRules: Q = (s, d) =>
    TextAnalysis.gopherRules(t(s, d, "documents"), "doc_id", "text")
  val t19Oracle =
    s"""WITH w AS (SELECT doc_id, $wordsSql AS w FROM documents),
       |m AS (SELECT doc_id,
       |  CAST(len(w) AS BIGINT) AS n_tokens,
       |  CAST(len(list_intersect(w, ['the','a','of','to','and','in','is','it','that','for'])) AS BIGINT) AS stop_hits,
       |  CAST(len(array_to_string(w, '')) AS DOUBLE) / len(w) AS mean_word_len,
       |  CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS distinct_ratio
       |  FROM w)
       |SELECT doc_id, n_tokens, stop_hits, mean_word_len, distinct_ratio,
       |  (n_tokens >= 30 AND n_tokens <= 100000
       |   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
       |   AND stop_hits >= 2 AND distinct_ratio > 0.5) AS passes
       |FROM m""".stripMargin

  /** T20: CCNet-style bigram-LM quality scoring — train a bounded LM on
    * the corpus itself (top-20 unigrams / top-200 in-vocab bigrams at
    * fixture scale; deterministic tie-breaks make the model
    * engine-reproducible) and score every document's coverage against
    * it. Driver-checked columns are the exact integer coverage stats;
    * the stupid-backoff log-prob / perplexity doubles are
    * ScalaTest-verified (LmSpec) and dropped here — cross-engine libm
    * log() is not bit-contracted.
    */
  val t20LmScore: Q = (s, d) => {
    val docs = t(s, d, "documents")
    val lm = TextAnalysis.bigramLm(docs, "text", vocabSize = 20,
      maxBigrams = 200)
    TextAnalysis.lmScore(docs, "doc_id", "text", lm)
      .select("doc_id", "n_tokens", "n_oov", "n_bigrams", "n_bigram_hits")
  }
  val t20Oracle =
    s"""WITH w AS (
       |  SELECT doc_id, list_filter($wordsSql, x -> length(x) > 0) AS w
       |  FROM documents),
       |tok AS (SELECT unnest(w) AS tok FROM w),
       |uni AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok
       |        ORDER BY cnt DESC, tok ASC LIMIT 20),
       |pr AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
       |       FROM (SELECT doc_id, w,
       |             unnest(generate_series(1, len(w) - 1)) AS i FROM w) z),
       |big AS (SELECT w1, w2, COUNT(*) AS cnt FROM pr
       |        JOIN uni u1 ON pr.w1 = u1.tok JOIN uni u2 ON pr.w2 = u2.tok
       |        GROUP BY w1, w2 ORDER BY cnt DESC, w1 ASC, w2 ASC LIMIT 200),
       |oov AS (SELECT doc_id, COUNT(*) AS n_oov
       |        FROM (SELECT doc_id, unnest(w) AS tok FROM w) t
       |        LEFT JOIN uni ON t.tok = uni.tok
       |        WHERE uni.tok IS NULL GROUP BY doc_id),
       |hits AS (SELECT doc_id, COUNT(*) AS n_hits FROM pr
       |         JOIN big ON pr.w1 = big.w1 AND pr.w2 = big.w2
       |         GROUP BY doc_id)
       |SELECT w.doc_id, CAST(len(w.w) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(oov.n_oov, 0) AS BIGINT) AS n_oov,
       |  CAST(GREATEST(len(w.w) - 1, 0) AS BIGINT) AS n_bigrams,
       |  CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_bigram_hits
       |FROM w LEFT JOIN oov USING (doc_id)
       |LEFT JOIN hits USING (doc_id)""".stripMargin

  /** T37: CCNet-style bucket routing — the head/middle/tail corpus
    * split by LM fit, then per-bucket keep rates (keep all of head,
    * half of middle, a tenth of tail), emitting routed per
    * (bucket, source) stats. The bucket signal is the integer
    * bigram-coverage proxy from the T20 LM (`floor(1000·hits/bigrams)`
    * — exact small-int arithmetic, unlike libm perplexity which is not
    * bit-contracted cross-engine); sampling is the salted md5-threshold
    * scan every mixture op here uses. The oracle replays the ENTIRE
    * chain: LM training CTEs, coverage proxy, bucket CASE, keep
    * thresholds, rollup.
    */
  val t37CcnetBuckets: Q = (s, d) => {
    val docs = t(s, d, "documents")
    val lm = TextAnalysis.bigramLm(docs, "text", vocabSize = 20,
      maxBigrams = 200)
    val scored = TextAnalysis.lmScore(docs, "doc_id", "text", lm)
      .select("doc_id", "n_tokens", "n_bigrams", "n_bigram_hits")
      .join(docs.select("doc_id", "source"), "doc_id")
      .withColumn("cov_milli",
        floor(lit(1000) * col("n_bigram_hits")
          / greatest(col("n_bigrams"), lit(1))).cast("bigint"))
      .withColumn("bucket",
        when(col("cov_milli") >= 667, "head")
          .when(col("cov_milli") >= 333, "middle").otherwise("tail"))
    val keepThr = Map(
      "head" -> Sampling.hexThreshold(1.0),
      "middle" -> Sampling.hexThreshold(0.5),
      "tail" -> Sampling.hexThreshold(0.1))
    val kept = scored.withColumn("_b",
        Sampling.hashBucket(col("doc_id"), "ccnet"))
      .withColumn("kept", col("_b") <
        when(col("bucket") === "head", lit(keepThr("head")))
          .when(col("bucket") === "middle", lit(keepThr("middle")))
          .otherwise(lit(keepThr("tail"))))
    kept.groupBy("bucket", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).cast("bigint").as("n_kept"),
        sum(when(col("kept"), col("n_tokens")).otherwise(0L)).cast("bigint")
          .as("n_tokens_kept"))
  }
  val t37Oracle: String = {
    val thrH = Sampling.hexThreshold(1.0)
    val thrM = Sampling.hexThreshold(0.5)
    val thrT = Sampling.hexThreshold(0.1)
    s"""WITH w AS (
       |  SELECT doc_id, list_filter($wordsSql, x -> length(x) > 0) AS w
       |  FROM documents),
       |tok AS (SELECT unnest(w) AS tok FROM w),
       |uni AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok
       |        ORDER BY cnt DESC, tok ASC LIMIT 20),
       |pr AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
       |       FROM (SELECT doc_id, w,
       |             unnest(generate_series(1, len(w) - 1)) AS i FROM w) z),
       |big AS (SELECT w1, w2, COUNT(*) AS cnt FROM pr
       |        JOIN uni u1 ON pr.w1 = u1.tok JOIN uni u2 ON pr.w2 = u2.tok
       |        GROUP BY w1, w2 ORDER BY cnt DESC, w1 ASC, w2 ASC LIMIT 200),
       |hits AS (SELECT doc_id, COUNT(*) AS n_hits FROM pr
       |         JOIN big ON pr.w1 = big.w1 AND pr.w2 = big.w2
       |         GROUP BY doc_id),
       |sc AS (
       |  SELECT w.doc_id, CAST(len(w.w) AS BIGINT) AS n_tokens,
       |    CAST(FLOOR(1000.0 * COALESCE(hits.n_hits, 0) /
       |      GREATEST(len(w.w) - 1, 1)) AS BIGINT) AS cov_milli
       |  FROM w LEFT JOIN hits USING (doc_id)),
       |b AS (
       |  SELECT sc.doc_id, sc.n_tokens, d.source,
       |    CASE WHEN cov_milli >= 667 THEN 'head'
       |         WHEN cov_milli >= 333 THEN 'middle' ELSE 'tail' END AS bucket,
       |    substr(md5('ccnet:' || CAST(sc.doc_id AS STRING)), 1, 8) AS hb
       |  FROM sc JOIN documents d ON d.doc_id = sc.doc_id),
       |k AS (
       |  SELECT *, hb < CASE bucket WHEN 'head' THEN '$thrH'
       |    WHEN 'middle' THEN '$thrM' ELSE '$thrT' END AS kept
       |  FROM b)
       |SELECT bucket, source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT)
       |    AS n_tokens_kept
       |FROM k GROUP BY 1, 2""".stripMargin
  }

  /** D8: winnowing fingerprints (rolling k-gram hash + sliding-window
    * min, MOSS-style) — shared substrings of ≥ k+win-1 tokens guarantee a
    * shared fingerprint. md5-string hashes so DuckDB derives identical
    * values; aggregated to per-doc fingerprint counts plus the global
    * distinct count shape via a top-k of hottest fingerprints.
    */
  val d8Winnow: Q = (s, d) =>
    TextAnalysis.winnowFingerprints(t(s, d, "documents"), "doc_id", "text",
        k = 5, win = 4)
      .groupBy("fp").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("fp").asc)
      .limit(50)
  val d8Oracle =
    s"""WITH t AS (SELECT doc_id, $wordsSql AS w FROM documents),
       |g AS (
       |  SELECT doc_id,
       |    list_transform(generate_series(1, greatest(len(w) - 4, 0)),
       |      i -> md5(array_to_string(list_slice(w, i, i + 4), ' '))) AS hs
       |  FROM t),
       |f AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    list_transform(generate_series(1, greatest(len(hs) - 3, 0)),
       |      j -> list_min(list_slice(hs, j, j + 3))))) AS fp
       |  FROM g)
       |SELECT fp, COUNT(*) AS n_docs FROM f
       |GROUP BY fp HAVING COUNT(*) >= 2
       |ORDER BY n_docs DESC, fp ASC LIMIT 50""".stripMargin

  /** D9: segment-level (CCNet-style line) dedup — fixed 20-token windows,
    * drop every corpus-wide repeat of a segment (first occurrence wins),
    * reassemble documents from surviving segments. Exactly deterministic,
    * so the oracle recomputes the full pipeline in DuckDB.
    */
  val d9SegmentDedup: Q = (s, d) =>
    Dedup.segmentDedup(t(s, d, "documents"), "doc_id", "text", segTokens = 20)
  val d9Oracle =
    s"""WITH w AS (SELECT doc_id, $wordsSql AS w FROM documents),
       |segs AS (
       |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS seg_idx,
       |         array_to_string(w[(i-1)*20+1:i*20], ' ') AS seg
       |  FROM (SELECT doc_id, w,
       |          unnest(generate_series(1, CAST(ceil(len(w)/20.0) AS BIGINT))) AS i
       |        FROM w)),
       |keep AS (
       |  SELECT doc_id, seg_idx, seg,
       |         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
       |  FROM segs),
       |agg AS (
       |  SELECT doc_id, COUNT(*) AS kept_segments,
       |         string_agg(seg, ' ' ORDER BY seg_idx) AS text_deduped
       |  FROM keep WHERE rn = 1 GROUP BY doc_id)
       |SELECT w.doc_id, CAST(ceil(len(w.w)/20.0) AS BIGINT) AS total_segments,
       |       COALESCE(a.kept_segments, 0) AS kept_segments,
       |       COALESCE(a.text_deduped, '') AS text_deduped
       |FROM w LEFT JOIN agg a ON w.doc_id = a.doc_id""".stripMargin

  /** D10: exact duplicated-substring spans (ExactSubstr, Lee et al. 2022)
    * over the planted corpus — every length-20 token window occurring
    * more than once marks its start; overlapping windows merge into
    * maximal removal spans ([[Dedup.substringDedupSpans]]). The planted
    * identical clones guarantee the result is never vacuously empty
    * (every window of a cloned doc is duplicated by construction). The
    * oracle is a FULL DuckDB replay — window fingerprints, corpus-wide
    * counts, and the interval merge are all recomputed relationally, so
    * a missing span, a wrong boundary, or an extra span all fail the
    * hash compare.
    */
  val d10SubstrDedup: Q = (s, d) =>
    Dedup.substringDedupSpans(withPlantedClones(t(s, d, "documents")),
      "doc_id", "text", winTokens = 20)
  val d10Oracle =
    s"""WITH plant AS ($plantSql),
       |corpus AS ($plantedCorpusSql),
       |base AS (
       |  SELECT doc_id, w, len(w) AS n
       |  FROM (SELECT doc_id, $wordsSql AS w FROM corpus) z
       |  WHERE len(w) >= 20),
       |wins AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
       |         md5(array_to_string(w[i+1:i+20], ' ')) AS wfp
       |  FROM (SELECT doc_id, w, unnest(generate_series(0, n - 20)) AS i
       |        FROM base)),
       |dup AS (SELECT wfp FROM wins GROUP BY wfp HAVING COUNT(*) > 1),
       |dp AS (SELECT doc_id, pos FROM wins JOIN dup USING (wfp)),
       |fl AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
       |              > 20 THEN 1 ELSE 0 END AS nw
       |  FROM dp),
       |gr AS (
       |  SELECT doc_id, pos,
       |    SUM(nw) OVER (PARTITION BY doc_id ORDER BY pos
       |                  ROWS UNBOUNDED PRECEDING) AS grp
       |  FROM fl)
       |SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 20 AS span_end_excl,
       |       COUNT(*) AS n_windows
       |FROM gr GROUP BY doc_id, grp""".stripMargin

  /** D12: apply the D10 span-removal manifest — the "remove the
    * duplicated substring, keep the rest" step that closes the
    * ExactSubstr loop ([[Dedup.applySpanRemoval]]). The oracle recomputes
    * the ENTIRE chain relationally: window fingerprints → dup counts →
    * merged spans → span positions exploded → anti-join against token
    * positions → ordered reassembly — so a wrong span boundary, a
    * dropped-but-should-keep token, or a kept-but-should-drop token all
    * change `text_clean` and fail the hash compare.
    */
  val d12SubstrApply: Q = (s, d) => {
    val corpus = withPlantedClones(t(s, d, "documents"))
    val spans = Dedup.substringDedupSpans(corpus, "doc_id", "text",
      winTokens = 20)
    Dedup.applySpanRemoval(corpus, "doc_id", "text", spans)
  }
  val d12Oracle =
    s"""WITH plant AS ($plantSql),
       |corpus AS ($plantedCorpusSql),
       |sel AS (SELECT doc_id, $wordsSql AS w FROM corpus),
       |base AS (SELECT doc_id, w, len(w) AS n FROM sel WHERE len(w) >= 20),
       |wins AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
       |         md5(array_to_string(w[i+1:i+20], ' ')) AS wfp
       |  FROM (SELECT doc_id, w, unnest(generate_series(0, n - 20)) AS i
       |        FROM base)),
       |dup AS (SELECT wfp FROM wins GROUP BY wfp HAVING COUNT(*) > 1),
       |dp AS (SELECT doc_id, pos FROM wins JOIN dup USING (wfp)),
       |fl AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
       |              > 20 THEN 1 ELSE 0 END AS nw
       |  FROM dp),
       |spans AS (
       |  SELECT doc_id, MIN(pos) AS s, MAX(pos) + 20 AS e
       |  FROM (
       |    SELECT doc_id, pos,
       |      SUM(nw) OVER (PARTITION BY doc_id ORDER BY pos
       |                    ROWS UNBOUNDED PRECEDING) AS grp
       |    FROM fl) z GROUP BY doc_id, grp),
       |rem AS (
       |  SELECT doc_id, unnest(generate_series(s, e - 1)) AS pos FROM spans),
       |posi AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS pos, w[i+1] AS tok
       |  FROM (SELECT doc_id, w, unnest(generate_series(0, len(w) - 1)) AS i
       |        FROM sel)),
       |keptagg AS (
       |  SELECT p.doc_id, COUNT(*) AS n_after,
       |         string_agg(p.tok, ' ' ORDER BY p.pos) AS text_clean
       |  FROM posi p LEFT JOIN rem r
       |    ON r.doc_id = p.doc_id AND r.pos = p.pos
       |  WHERE r.pos IS NULL GROUP BY p.doc_id)
       |SELECT sel.doc_id, len(sel.w) AS n_tokens_before,
       |  COALESCE(k.n_after, 0) AS n_tokens_after,
       |  COALESCE(k.text_clean, '') AS text_clean
       |FROM sel LEFT JOIN keptagg k ON k.doc_id = sel.doc_id""".stripMargin

  /** D11: incremental cross-batch dedup — the nightly-ingest shape. The
    * corpus splits deterministically into a ~70% accumulated history and
    * a ~30% incoming batch, plus planted clones of ~5% of history docs in
    * the batch (so true duplicates are guaranteed to exist); each incoming
    * doc is flagged if its fingerprint already exists in history.
    * [[Dedup.crossBatchDedup]] Bloom-prefilters the HISTORY side before
    * its shuffle (the 100 TB side never exchanges more than the candidate
    * rows); the exact join makes the output independent of fpp, so the
    * oracle is a full DuckDB replay of the split + fingerprint + semi
    * join.
    */
  private val IncBatchThr = Sampling.hexThreshold(0.3)
  private val IncPlantThr = Sampling.hexThreshold(0.05)
  val d11CrossBatch: Q = (s, d) => {
    val docs = t(s, d, "documents")
    val bucket = Sampling.hashBucket(col("doc_id"), "incbatch")
    val history = docs.filter(bucket >= lit(IncBatchThr))
    val incoming = docs.filter(bucket < lit(IncBatchThr))
      .unionByName(history
        .filter(Sampling.hashBucket(col("doc_id"), "incplant") < lit(IncPlantThr))
        .withColumn("doc_id", col("doc_id") + lit(PlantOffset)))
    Dedup.crossBatchDedup(incoming, history, "doc_id", "text",
      expectedIncoming = 200000L)
  }
  val d11Oracle =
    s"""WITH b AS (
       |  SELECT doc_id, md5($normSql) AS fp,
       |    substr(md5('incbatch:' || CAST(doc_id AS STRING)), 1, 8) AS bk,
       |    substr(md5('incplant:' || CAST(doc_id AS STRING)), 1, 8) AS pk
       |  FROM documents),
       |inc AS (
       |  SELECT doc_id, fp FROM b WHERE bk < '$IncBatchThr'
       |  UNION ALL
       |  SELECT doc_id + $PlantOffset, fp FROM b
       |  WHERE bk >= '$IncBatchThr' AND pk < '$IncPlantThr'),
       |hist AS (SELECT DISTINCT fp FROM b WHERE bk >= '$IncBatchThr')
       |SELECT i.doc_id, i.fp, (h.fp IS NOT NULL) AS is_dup
       |FROM inc i LEFT JOIN hist h ON i.fp = h.fp""".stripMargin

  // ===== similarity ====================================================

  private def queryVecs(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings").filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

  /** S1: brute-force cosine top-k (exact baseline). */
  val s1TopKBruteForce: Q = (s, d) =>
    Similarity.bruteForceTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        queryVecs(s, d), k = 10)
      .withColumn("rank", col("rank").cast("bigint"))
  val s1Oracle =
    """WITH e AS (
      |  SELECT vec_id, embedding,
      |    SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
      |          FROM (SELECT UNNEST(embedding) AS x) ux)) AS nrm
      |  FROM embeddings),
      |q AS (SELECT vec_id AS query_id, embedding AS qvec, nrm AS qnrm
      |      FROM e WHERE vec_id < 5),
      |sc AS (
      |  SELECT q.query_id, e.vec_id AS id,
      |    ROUND(CASE WHEN e.nrm * q.qnrm = 0 THEN 0.0 ELSE
      |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
      |       FROM (SELECT UNNEST(e.embedding) AS x, UNNEST(q.qvec) AS y) u)
      |      / (e.nrm * q.qnrm) END, 6) AS cosine_sim
      |  FROM e CROSS JOIN q)
      |SELECT query_id, rank, id, cosine_sim FROM (
      |  SELECT query_id, id, cosine_sim,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY cosine_sim DESC, id) AS rank
      |  FROM sc) z WHERE rank <= 10""".stripMargin

  /** S23: binary (1-bit) embedding quantization + Hamming search
    * ([[Similarity.binaryQuantize]] / `binaryHammingTopK`) — the 32×
    * compression serving path: sign-bit-pack 64 floats into two 32-bit
    * words, coarse-rank by XOR+popcount (ascending, id ties), exact
    * full-precision cosine re-rank of the m-pool. Every stage is
    * integer-or-rounded-deterministic, so the oracle replays the ENTIRE
    * pipeline — the packed words, the Hamming cut, and the re-rank —
    * and one flipped sign bit anywhere shifts a Hamming distance and
    * fails the hash compare.
    */
  val s23BinaryQuant: Q = (s, d) =>
    Similarity.binaryHammingTopK(
      t(s, d, "embeddings").select("vec_id", "embedding"),
      "vec_id", "embedding", queryVecs(s, d), "query_id", "qvec",
      dim = 64, m = 50, k = 10)
  val s23Oracle: String =
    """WITH codes AS (
      |  SELECT vec_id, embedding,
      |    CAST(list_sum(list_transform(range(1, 33), d ->
      |      CASE WHEN CAST(embedding[d] AS DOUBLE) > 0
      |           THEN CAST(1 AS BIGINT) << (d - 1) ELSE 0 END))
      |      AS BIGINT) AS c0,
      |    CAST(list_sum(list_transform(range(33, 65), d ->
      |      CASE WHEN CAST(embedding[d] AS DOUBLE) > 0
      |           THEN CAST(1 AS BIGINT) << (d - 33) ELSE 0 END))
      |      AS BIGINT) AS c1
      |  FROM embeddings),
      |q AS (SELECT vec_id AS query_id, embedding AS qvec, c0 AS q0,
      |             c1 AS q1
      |      FROM codes WHERE vec_id < 5),
      |h AS (
      |  SELECT q.query_id, c.vec_id, c.embedding, q.qvec,
      |    CAST(bit_count(xor(c.c0, q.q0)) + bit_count(xor(c.c1, q.q1))
      |         AS BIGINT) AS hamming
      |  FROM codes c CROSS JOIN q),
      |pool AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY hamming, vec_id) AS cr
      |  FROM h),
      |fine AS (
      |  SELECT query_id, vec_id, hamming,
      |    ROUND(
      |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
      |       FROM (SELECT UNNEST(embedding) AS x, UNNEST(qvec) AS y) u)
      |      / (SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
      |               FROM (SELECT UNNEST(embedding) AS x) ux))
      |       * SQRT((SELECT SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))
      |               FROM (SELECT UNNEST(qvec) AS y) uy))), 6)
      |      AS cosine_sim
      |  FROM pool WHERE cr <= 50)
      |SELECT query_id, vec_id, hamming, cosine_sim,
      |  CAST(rnk AS BIGINT) AS rank
      |FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cosine_sim DESC, vec_id) AS rnk
      |  FROM fine) z
      |WHERE rnk <= 10""".stripMargin

  /** S24: per-dimension embedding diagnostics
    * ([[Similarity.dimensionDiagnostics]]) — the anisotropy/dead-dim/
    * clipping report over the embedding corpus: exact integer moments
    * of the floor-scaled components per dimension, one map-side-combined
    * aggregation to 64 rows. Fully replayed relationally (floor-scaling
    * makes every value an exact long on both engines).
    */
  val s24EmbeddingDiagnostics: Q = (s, d) =>
    Similarity.dimensionDiagnostics(
      t(s, d, "embeddings").select("embedding"), "embedding")
  val s24Oracle: String =
    """WITH x AS (
      |  SELECT g.d - 1 AS dim,
      |    CAST(FLOOR(CAST(embedding[g.d] AS DOUBLE) * 1000000) AS BIGINT)
      |      AS q
      |  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(d))
      |SELECT CAST(dim AS BIGINT) AS dim, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(q) AS BIGINT) AS sum_q, CAST(SUM(q*q) AS BIGINT)
      |    AS sumsq_q,
      |  MIN(q) AS min_q, MAX(q) AS max_q
      |FROM x GROUP BY dim""".stripMargin

  /** S25: IVF recall audit ([[Similarity.ivfIndex]] / [[Similarity.ivfTopK]]
    * against the exact [[Similarity.bruteForceTopK]] truth) — the
    * serving-side twin of q_d18: before shipping an nProbe setting,
    * measure what the cell-pruned probe actually returns against the
    * exact top-10. nProbe = 2 of 16 cells scans ~1/8 of the corpus, so
    * misses are EXPECTED — that trade-off is the measurement (q_s4's
    * nProbe = 4 is the serving default; this is the cheaper operating
    * point a capacity planner evaluates). The truth ranking is fully
    * replayed relationally (the S1 oracle chain); the hash-specific
    * `ivf_found` flag (Lloyd centroids from a seeded, bounded driver
    * fit) is read back from the emitted rows under a set-equality guard,
    * so a wrong truth pair, rank, or cosine turns the driver red.
    */
  val s25IvfRecall: Q = (s, d) => {
    val emb = t(s, d, "embeddings").select("vec_id", "embedding")
    val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queryVecs(s, d), k = 10)
      .withColumn("rank", col("rank").cast("bigint"))
    val (centroids, assigned) =
      Similarity.ivfIndex(emb, "vec_id", "embedding", nCells = 16)
    val ivf = Similarity.ivfTopK(assigned, centroids, queryVecs(s, d),
        k = 10, nProbe = 2)
      .select(col("query_id"), col("id"), lit(true).as("_hit"))
    truth.join(ivf, Seq("query_id", "id"), "left")
      .select(col("query_id"), col("rank"), col("id"), col("cosine_sim"),
        coalesce(col("_hit"), lit(false)).as("ivf_found"))
  }
  val s25Oracle: String =
    """WITH e AS (
      |  SELECT vec_id, embedding,
      |    SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
      |          FROM (SELECT UNNEST(embedding) AS x) ux)) AS nrm
      |  FROM embeddings),
      |q AS (SELECT vec_id AS query_id, embedding AS qvec, nrm AS qnrm
      |      FROM e WHERE vec_id < 5),
      |sc AS (
      |  SELECT q.query_id, e.vec_id AS id,
      |    ROUND(CASE WHEN e.nrm * q.qnrm = 0 THEN 0.0 ELSE
      |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
      |       FROM (SELECT UNNEST(e.embedding) AS x, UNNEST(q.qvec) AS y) u)
      |      / (e.nrm * q.qnrm) END, 6) AS cosine_sim
      |  FROM e CROSS JOIN q),
      |tr AS (
      |  SELECT query_id, CAST(rank AS BIGINT) AS rank, id, cosine_sim
      |  FROM (
      |    SELECT query_id, id, cosine_sim,
      |      ROW_NUMBER() OVER (PARTITION BY query_id
      |        ORDER BY cosine_sim DESC, id) AS rank
      |    FROM sc) z WHERE rank <= 10),
      |sp AS (SELECT query_id, id, ivf_found
      |       FROM '__SPARK_OUT__/q_s25_ivf_recall/*.parquet'),
      |-- flag floor: each query vector IS a corpus row (id = query_id,
      |-- cosine 1.0, rank 1); its assigned cell is by definition the
      |-- query's nearest centroid, i.e. the FIRST probed cell at any
      |-- nProbe >= 1, so the probe must return it regardless of the
      |-- Lloyd seed — an all-false flag join cannot pass silently
      |ok AS (SELECT (SELECT COUNT(*) FROM sp) = (SELECT COUNT(*) FROM tr)
      |         AND NOT EXISTS (SELECT 1 FROM sp
      |                         WHERE id = query_id AND NOT ivf_found)
      |         AS complete)
      |SELECT tr.query_id, tr.rank, tr.id, tr.cosine_sim, sp.ivf_found
      |FROM tr JOIN sp ON sp.query_id = tr.query_id AND sp.id = tr.id
      |WHERE (SELECT complete FROM ok)""".stripMargin

  /** S26: navigable-graph ANN recall audit ([[Hnsw.index]]/[[Hnsw.topK]]
    * against the exact [[Similarity.bruteForceTopK]] truth) — the third
    * recall instrument next to q_d18 (LSH) and q_s25 (IVF), covering the
    * graph-serving architecture (HNSW search shape over a bounded anchor
    * graph, SPANN-style region split). ef = 8 of 256 anchors probes only
    * the graph-reachable neighborhood, so misses are EXPECTED — the
    * measurement is what an operator reads before shipping an ef. Truth
    * is fully replayed relationally (the S1 oracle chain); the
    * `hnsw_found` flag is read back under a set-equality guard PLUS a
    * flag floor: a query that IS a corpus vector provably probes its own
    * assignment region (assignment and search share the greedy-descent
    * code path), so `id = query_id` rows must always be found.
    */
  val s26HnswRecall: Q = (s, d) => {
    val emb = t(s, d, "embeddings").select("vec_id", "embedding")
    val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queryVecs(s, d), k = 10)
      .withColumn("rank", col("rank").cast("bigint"))
    val (graph, assigned) = Hnsw.index(emb, "vec_id", "embedding",
      m = 8, sampleSize = 256)
    val found = Hnsw.topK(graph, assigned, queryVecs(s, d), k = 10, ef = 8)
      .select(col("query_id"), col("id"), lit(true).as("_hit"))
    truth.join(found, Seq("query_id", "id"), "left")
      .select(col("query_id"), col("rank"), col("id"), col("cosine_sim"),
        coalesce(col("_hit"), lit(false)).as("hnsw_found"))
  }
  val s26Oracle: String =
    """WITH e AS (
      |  SELECT vec_id, embedding,
      |    SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
      |          FROM (SELECT UNNEST(embedding) AS x) ux)) AS nrm
      |  FROM embeddings),
      |q AS (SELECT vec_id AS query_id, embedding AS qvec, nrm AS qnrm
      |      FROM e WHERE vec_id < 5),
      |sc AS (
      |  SELECT q.query_id, e.vec_id AS id,
      |    ROUND(CASE WHEN e.nrm * q.qnrm = 0 THEN 0.0 ELSE
      |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
      |       FROM (SELECT UNNEST(e.embedding) AS x, UNNEST(q.qvec) AS y) u)
      |      / (e.nrm * q.qnrm) END, 6) AS cosine_sim
      |  FROM e CROSS JOIN q),
      |tr AS (
      |  SELECT query_id, CAST(rank AS BIGINT) AS rank, id, cosine_sim
      |  FROM (
      |    SELECT query_id, id, cosine_sim,
      |      ROW_NUMBER() OVER (PARTITION BY query_id
      |        ORDER BY cosine_sim DESC, id) AS rank
      |    FROM sc) z WHERE rank <= 10),
      |sp AS (SELECT query_id, id, hnsw_found
      |       FROM '__SPARK_OUT__/q_s26_hnsw_recall/*.parquet'),
      |-- flag floor: each query IS a corpus row; its vector's assignment
      |-- region comes from the SAME greedy descent the search always
      |-- probes, so the self row must be found regardless of graph shape
      |ok AS (SELECT (SELECT COUNT(*) FROM sp) = (SELECT COUNT(*) FROM tr)
      |         AND NOT EXISTS (SELECT 1 FROM sp
      |                         WHERE id = query_id AND NOT hnsw_found)
      |         AS complete)
      |SELECT tr.query_id, tr.rank, tr.id, tr.cosine_sim, sp.hnsw_found
      |FROM tr JOIN sp ON sp.query_id = tr.query_id AND sp.id = tr.id
      |WHERE (SELECT complete FROM ok)""".stripMargin

  /** S22: Johnson–Lindenstrauss random projection
    * ([[Similarity.randomProjection]]) — 64 → 8 dims via the Achlioptas
    * ±1 construction, the distance-preserving shrink that cuts vector
    * shuffle bytes 8× in front of exact re-ranking. The sign matrix is
    * derived from md5("jl:j:d") hex parity, so the oracle REGENERATES
    * the matrix from the same formula and replays every projected
    * component (6dp, matching the s2 cosine discipline) — a wrong sign,
    * a dropped dimension, or a scale slip shifts values and fails the
    * hash compare.
    */
  val s22RandomProjection: Q = (s, d) =>
    Similarity.randomProjection(
      t(s, d, "embeddings").select("vec_id", "embedding"),
      "embedding", k = 8, dim = 64, seed = "jl")
      .select(col("vec_id"), posexplode(col("rp")).as(Seq("j", "v")))
      .select(col("vec_id"), col("j").cast("bigint").as("j"),
        round(col("v"), 6).as("value"))
  val s22Oracle: String =
    """SELECT vec_id, CAST(js.j AS BIGINT) AS j,
      |  ROUND(list_sum(list_transform(range(1, 65), d ->
      |    CAST(embedding[d] AS DOUBLE) *
      |    (CASE WHEN strpos('01234567',
      |            substr(md5('jl:' || js.j || ':' || (d - 1)), 1, 1)) > 0
      |          THEN 1.0 ELSE -1.0 END))) / sqrt(8.0), 6) AS value
      |FROM embeddings
      |CROSS JOIN (SELECT unnest(range(0, 8)) AS j) js""".stripMargin

  /** S20: two-stage truncated-prefix retrieval
    * ([[Similarity.truncatedRerank]]) — coarse cosine over the first 16
    * of 64 dims (the Matryoshka serving pattern: the coarse scan reads a
    * quarter of the bytes), top-50 pool, exact full-dim re-rank to
    * top-10. Both stage scores ride in the output; the oracle replays
    * BOTH rankings (truncated slice, 6dp round, id tie-break, pool cut,
    * full re-rank), so a wrong pool, a leaked full-dim shortcut, or a
    * stage-score drift all go red.
    */
  val s20TruncatedRerank: Q = (s, d) =>
    Similarity.truncatedRerank(t(s, d, "embeddings"), "vec_id", "embedding",
      queryVecs(s, d), prefixDims = 16, m = 50, k = 10)
  val s20Oracle: String =
    """WITH e AS (SELECT vec_id, embedding FROM embeddings),
      |q AS (SELECT vec_id AS query_id, embedding AS qvec FROM e
      |      WHERE vec_id < 5),
      |tv AS (SELECT vec_id, embedding[1:16] AS tvec FROM e),
      |tq AS (SELECT query_id, qvec[1:16] AS tqvec FROM q),
      |tn AS (SELECT vec_id, tvec,
      |  SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
      |        FROM (SELECT UNNEST(tvec) AS x) ux)) AS tnrm FROM tv),
      |tqn AS (SELECT query_id, tqvec,
      |  SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
      |        FROM (SELECT UNNEST(tqvec) AS x) ux)) AS tqnrm FROM tq),
      |coarse AS (
      |  SELECT tqn.query_id, tn.vec_id AS id,
      |    ROUND(CASE WHEN tn.tnrm * tqn.tqnrm = 0 THEN 0.0 ELSE
      |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
      |       FROM (SELECT UNNEST(tn.tvec) AS x, UNNEST(tqn.tqvec) AS y) u)
      |      / (tn.tnrm * tqn.tqnrm) END, 6) AS t_sim
      |  FROM tn CROSS JOIN tqn),
      |pool AS (
      |  SELECT query_id, id, t_sim FROM (
      |    SELECT query_id, id, t_sim,
      |      ROW_NUMBER() OVER (PARTITION BY query_id
      |        ORDER BY t_sim DESC, id) AS crank
      |    FROM coarse) z WHERE crank <= 50),
      |en AS (SELECT vec_id, embedding,
      |  SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
      |        FROM (SELECT UNNEST(embedding) AS x) ux)) AS nrm FROM e),
      |qn AS (SELECT query_id, qvec,
      |  SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
      |        FROM (SELECT UNNEST(qvec) AS x) ux)) AS qnrm FROM q),
      |fr AS (
      |  SELECT p.query_id, p.id, p.t_sim,
      |    ROUND(CASE WHEN en.nrm * qn.qnrm = 0 THEN 0.0 ELSE
      |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
      |       FROM (SELECT UNNEST(en.embedding) AS x, UNNEST(qn.qvec) AS y) u)
      |      / (en.nrm * qn.qnrm) END, 6) AS cosine_sim
      |  FROM pool p JOIN en ON en.vec_id = p.id
      |              JOIN qn ON qn.query_id = p.query_id)
      |SELECT query_id, rank, id, cosine_sim, t_sim FROM (
      |  SELECT query_id, id, cosine_sim, t_sim,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY cosine_sim DESC, id) AS BIGINT) AS rank
      |  FROM fr) z WHERE rank <= 10""".stripMargin

  /** S2: exact cosine near-dup pairs (brute force over all pairs). */
  val s2CosinePairs: Q = (s, d) =>
    Similarity.bruteForcePairs(t(s, d, "embeddings"), "vec_id", "embedding",
      threshold = 0.4)
  val s2Oracle =
    """WITH e AS (
      |  SELECT vec_id, embedding,
      |    SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
      |          FROM (SELECT UNNEST(embedding) AS x) ux)) AS nrm
      |  FROM embeddings),
      |p AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    ROUND(CASE WHEN a.nrm * b.nrm = 0 THEN 0.0 ELSE
      |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
      |       FROM (SELECT UNNEST(a.embedding) AS x, UNNEST(b.embedding) AS y) u)
      |      / (a.nrm * b.nrm) END, 6) AS cosine_sim
      |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
      |SELECT id_a, id_b, cosine_sim FROM p WHERE cosine_sim >= 0.4""".stripMargin

  /** Shared oracle shape for approximate top-k (S3 LSH / S4 IVF): the
    * candidate set is hash/index-specific (recall vs exact S1 asserted in
    * SimilaritySpec), but every emitted row must carry the *exact* cosine
    * of (query, id) and ranks must order the emitted set by
    * (cosine desc, id asc) — the emitted rows are the top k of the
    * candidate set, so re-ranking them reproduces rank 1..k exactly.
    * The oracle recomputes both from raw embeddings. Completeness: both
    * operators emit exactly k rows per query by contract (the fixture's
    * candidate sets are far larger than k), so the oracle also requires
    * every query id present with exactly k rows — under-emission empties
    * the oracle result and turns the driver red.
    */
  private def topKEchoOracle(name: String, k: Int = 10): String =
    s"""WITH sp AS (
       |  SELECT query_id, id FROM '__SPARK_OUT__/$name/*.parquet'),
       |ok AS (SELECT
       |    (SELECT COUNT(DISTINCT query_id) FROM sp) =
       |      (SELECT COUNT(*) FROM embeddings WHERE vec_id < 5)
       |    AND NOT EXISTS (SELECT 1 FROM sp GROUP BY query_id
       |                    HAVING COUNT(*) <> $k) AS complete),
       |e AS (
       |  SELECT vec_id, embedding,
       |    SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
       |          FROM (SELECT UNNEST(embedding) AS x) ux)) AS nrm
       |  FROM embeddings
       |  WHERE vec_id < 5 OR vec_id IN (SELECT id FROM sp)),
       |q AS (SELECT vec_id AS query_id, embedding AS qvec, nrm AS qnrm
       |      FROM e WHERE vec_id < 5),
       |sc AS (
       |  SELECT sp.query_id, sp.id,
       |    ROUND(CASE WHEN e.nrm * q.qnrm = 0 THEN 0.0 ELSE
       |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
       |       FROM (SELECT UNNEST(e.embedding) AS x, UNNEST(q.qvec) AS y) u)
       |      / (e.nrm * q.qnrm) END, 6) AS cosine_sim
       |  FROM sp JOIN e ON e.vec_id = sp.id JOIN q ON q.query_id = sp.query_id)
       |SELECT query_id,
       |  ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine_sim DESC, id) AS rank,
       |  id, cosine_sim
       |FROM sc WHERE (SELECT complete FROM ok)""".stripMargin

  /** S3: LSH-bucketed approximate top-k — every emitted (query, id,
    * cosine, rank) row is oracle-verified; see [[topKEchoOracle]].
    */
  val s3LshTopK: Q = (s, d) =>
    Similarity.lshTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        queryVecs(s, d), k = 10)
      .withColumn("rank", col("rank").cast("bigint"))
  val s3Oracle = topKEchoOracle("q_s3_lsh_topk")

  /** Planted-duplicate fixture for the S5 completeness oracle — the
    * embedding-space twin of [[withPlantedClones]]: an identical-vector
    * clone (`vec_id + PlantOffset`) of a deterministic ~4% of vectors.
    * Identical vectors make detection CERTAIN: every random hyperplane
    * puts both on the same side, so the pair collides in EVERY of the
    * OR-amplified hash tables and its exact cosine is 1 ≥ threshold —
    * which lets the oracle REQUIRE every planted pair among the emitted
    * rows, closing the one remaining vacuous-pass (under-emission) blind
    * spot. Zero vectors are excluded (cosine with a zero norm is defined
    * as 0 < threshold, so a zero-vector clone would never be emitted);
    * the predicate is mirrored in the DuckDB plant CTE.
    */
  private val VecPlantThr = Sampling.hexThreshold(0.04)
  private def withPlantedVecClones(vecs: DataFrame): DataFrame =
    vecs.unionByName(
      vecs.filter(Sampling.hashBucket(col("vec_id"), "plantv") < lit(VecPlantThr)
          && aggregate(col("embedding"), lit(0.0d),
               (acc, x) => acc + x.cast("double") * x.cast("double")) > 0)
        .withColumn("vec_id", col("vec_id") + lit(PlantOffset)))
  private val vecPlantSql =
    s"""SELECT vec_id, embedding FROM embeddings
       |  WHERE substr(md5('plantv:' || CAST(vec_id AS STRING)), 1, 8) < '$VecPlantThr'
       |    AND (SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
       |         FROM (SELECT UNNEST(embedding) AS x) ux) > 0""".stripMargin

  /** S5: embedding-cosine near-duplicate pairs via LSH bucket blocking —
    * the scale path of S2's exact all-pairs (only same-bucket vectors are
    * scored; exact cosine verifies). Bucketing is hash-specific (recall
    * vs S2 asserted in SimilaritySpec), but every emitted pair's cosine
    * is exact — the oracle recomputes it from raw embeddings and
    * re-enforces the threshold. Completeness: the corpus carries planted
    * identical-vector clones ([[withPlantedVecClones]]) and the oracle
    * requires every planted pair to be present — deleting any emitted
    * planted pair turns the driver red (tools/tamper_test.py).
    */
  val s5CosineNearDup: Q = (s, d) =>
    Similarity.cosineNearDups(withPlantedVecClones(t(s, d, "embeddings")),
      "vec_id", "embedding", threshold = 0.4, nBits = 5, tables = 16)
  val s5Oracle =
    s"""WITH sp AS (
      |  SELECT id_a, id_b FROM '__SPARK_OUT__/q_s5_cosine_neardup/*.parquet'),
      |plantv AS ($vecPlantSql),
      |corpus AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL SELECT vec_id + $PlantOffset, embedding FROM plantv),
      |e AS (
      |  SELECT vec_id, embedding,
      |    SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
      |          FROM (SELECT UNNEST(embedding) AS x) ux)) AS nrm
      |  FROM corpus
      |  WHERE vec_id IN (SELECT id_a FROM sp UNION SELECT id_b FROM sp)),
      |p AS (
      |  SELECT sp.id_a, sp.id_b,
      |    ROUND(CASE WHEN a.nrm * b.nrm = 0 THEN 0.0 ELSE
      |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
      |       FROM (SELECT UNNEST(a.embedding) AS x, UNNEST(b.embedding) AS y) u)
      |      / (a.nrm * b.nrm) END, 6) AS cosine_sim
      |  FROM sp JOIN e a ON a.vec_id = sp.id_a JOIN e b ON b.vec_id = sp.id_b),
      |ok AS (
      |  SELECT NOT EXISTS (SELECT 1 FROM plantv pl WHERE NOT EXISTS (
      |    SELECT 1 FROM sp WHERE sp.id_a = pl.vec_id
      |      AND sp.id_b = pl.vec_id + $PlantOffset)) AS complete)
      |SELECT id_a, id_b, cosine_sim FROM p
      |WHERE cosine_sim >= 0.4 AND id_a < id_b
      |  AND (SELECT complete FROM ok)""".stripMargin

  /** S4: IVF (inverted-file) approximate top-k — k-means cells + nProbe
    * probing. The index is model-derived (recall vs S1 asserted in
    * ScalaTest); emitted rows are oracle-verified like S3.
    */
  val s4IvfTopK: Q = (s, d) => {
    val (centroids, assigned) = Similarity.ivfIndex(
      t(s, d, "embeddings"), "vec_id", "embedding", nCells = 16)
    Similarity.ivfTopK(assigned, centroids, queryVecs(s, d), k = 10, nProbe = 4)
      .withColumn("rank", col("rank").cast("bigint"))
  }
  val s4Oracle = topKEchoOracle("q_s4_ivf_topk")

  /** One on-disk IVF index per (sfdir, embeddings-file signature), built
    * lazily and REUSED across invocations — indexing is offline work; the
    * query q_s6 exists to showcase is the partition-pruned probe, so the
    * build must not sit inside the timed path (and per-invocation temp
    * dirs must not accumulate). The directory name is deterministic
    * (md5 of sfdir + mtime:size of the embeddings file), so a fixture
    * rewrite changes the signature and the stale index for the same
    * sfdir is deleted and rebuilt; re-runs over an unchanged fixture —
    * including a later JVM, detected via the parquet `_SUCCESS` markers —
    * reuse the index byte-for-byte.
    */
  private def ivfIndexDir(s: SparkSession, d: String): String =
    FixtureCache.resolve("graft-ivf-index-v4", d, "embeddings.parquet")(
      dir => java.nio.file.Files.exists(
          dir.resolve("centroids").resolve("_SUCCESS")) &&
        java.nio.file.Files.exists(
          dir.resolve("assigned").resolve("_SUCCESS"))) { dir =>
      val (centroids, assigned) = Similarity.ivfIndex(
        t(s, d, "embeddings"), "vec_id", "embedding", nCells = 16)
      Similarity.ivfWriteIndex(centroids, assigned, dir.toString)
    }()

  /** S6: disk-probed IVF — the persisted form of S4 and the true 100 TB
    * serving shape: the index is laid out `partitionBy(cell)`
    * ([[Similarity.ivfWriteIndex]]) and each probe reads ONLY the probed
    * cells back via partition pruning ([[Similarity.ivfTopKIndexed]];
    * pruned scan + in-memory parity pinned in SimilaritySpec). The index
    * build happens once per fixture ([[ivfIndexDir]]) — the measured
    * query IS the serving path: centroid resolve + pruned scan of
    * nProbe/nCells partitions. Scoring is shared with S4, so the same
    * emitted-row + completeness oracle applies.
    */
  val s6IvfIndexed: Q = (s, d) =>
    Similarity.ivfTopKIndexed(s, ivfIndexDir(s, d), queryVecs(s, d),
        k = 10, nProbe = 4)
      .withColumn("rank", col("rank").cast("bigint"))
  val s6Oracle = topKEchoOracle("q_s6_ivf_indexed")

  /** S21: FILTERED vector search over the persisted IVF index
    * ([[Similarity.ivfTopKIndexedFiltered]]) — metadata-predicate
    * serving with PRE-FILTER semantics: top-10 among label ∈ {2,3,4}
    * rows only, probed at nProbe=8 so every query's qualifying pool
    * comfortably exceeds k. Oracle: the S4/S6 echo shape (exact cosine
    * recompute, rank re-derivation, per-query k-count) PLUS the filter
    * guarantee — any emitted id outside the predicate empties the
    * result and turns the driver red.
    */
  val s21FilteredSearch: Q = (s, d) => {
    val qualifying = t(s, d, "embeddings")
      .filter(col("label").isin(2, 3, 4))
      .select(col("vec_id").as("id"))
    Similarity.ivfTopKIndexedFiltered(s, ivfIndexDir(s, d), queryVecs(s, d),
        qualifying, k = 10, nProbe = 8)
      .withColumn("rank", col("rank").cast("bigint"))
  }
  val s21Oracle: String =
    s"""WITH sp AS (
       |  SELECT query_id, id FROM '__SPARK_OUT__/q_s21_filtered_search/*.parquet'),
       |ok AS (SELECT
       |    (SELECT COUNT(DISTINCT query_id) FROM sp) =
       |      (SELECT COUNT(*) FROM embeddings WHERE vec_id < 5)
       |    AND NOT EXISTS (SELECT 1 FROM sp GROUP BY query_id
       |                    HAVING COUNT(*) <> 10)
       |    AND NOT EXISTS (SELECT 1 FROM sp JOIN embeddings e2
       |                    ON e2.vec_id = sp.id
       |                    WHERE e2.label NOT IN (2, 3, 4)) AS complete),
       |e AS (
       |  SELECT vec_id, embedding,
       |    SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
       |          FROM (SELECT UNNEST(embedding) AS x) ux)) AS nrm
       |  FROM embeddings
       |  WHERE vec_id < 5 OR vec_id IN (SELECT id FROM sp)),
       |q AS (SELECT vec_id AS query_id, embedding AS qvec, nrm AS qnrm
       |      FROM e WHERE vec_id < 5),
       |sc AS (
       |  SELECT sp.query_id, sp.id,
       |    ROUND(CASE WHEN e.nrm * q.qnrm = 0 THEN 0.0 ELSE
       |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
       |       FROM (SELECT UNNEST(e.embedding) AS x, UNNEST(q.qvec) AS y) u)
       |      / (e.nrm * q.qnrm) END, 6) AS cosine_sim
       |  FROM sp JOIN e ON e.vec_id = sp.id JOIN q ON q.query_id = sp.query_id)
       |SELECT query_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine_sim DESC, id) AS BIGINT) AS rank,
       |  id, cosine_sim
       |FROM sc WHERE (SELECT complete FROM ok)""".stripMargin

  // Build-once appended-index fixture for S18: index trained and built
  // from the ¾ "original" corpus (vec_id % 4 != 0), then the remaining ¼
  // APPENDED via the incremental path — so the append code runs at
  // fixture build and the measured query is the serving probe over the
  // mixed (built + appended) layout.
  private def ivfAppendDir(s: SparkSession, d: String): String =
    FixtureCache.resolve("graft-ivf-append-v4", d, "embeddings.parquet")(
      // ready ⇔ the APPEND finished, not just the base build: both
      // _SUCCESS markers exist the moment ivfWriteIndex returns, so a
      // crash before the append would otherwise leave a half fixture
      // that every later run trusts
      dir => java.nio.file.Files.exists(dir.resolve("_APPENDED"))) { dir =>
      val emb = t(s, d, "embeddings")
      val (centroids, assigned) = Similarity.ivfIndex(
        emb.filter(col("vec_id") % 4 =!= 0), "vec_id", "embedding",
        nCells = 16)
      Similarity.ivfWriteIndex(centroids, assigned, dir.toString)
      Similarity.ivfAppendIndex(s, dir.toString,
        emb.filter(col("vec_id") % 4 === 0), "vec_id", "embedding")
      java.nio.file.Files.writeString(dir.resolve("_APPENDED"), "ok")
      ()
    }()

  /** S18: incremental IVF index maintenance
    * ([[Similarity.ivfAppendIndex]]) — new vectors assigned against the
    * FROZEN centroids and appended into the partitioned layout, no
    * rebuild. The queries are themselves APPENDED vectors
    * (`vec_id % 4 = 0, < 20`), so the oracle's self-presence guard —
    * every query's own id must appear in its emitted top-k — turns the
    * driver red if the append path drops, mis-assigns, or fails to
    * surface rows through the pruned probe; every emitted cosine is
    * recomputed exactly besides.
    */
  val s18IvfAppend: Q = (s, d) => {
    val q = t(s, d, "embeddings")
      .filter(col("vec_id") % 4 === 0 && col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    Similarity.ivfTopKIndexed(s, ivfAppendDir(s, d), q, k = 10, nProbe = 4)
      .withColumn("rank", col("rank").cast("bigint"))
  }
  val s18Oracle: String =
    """WITH sp AS (
      |  SELECT query_id, id FROM '__SPARK_OUT__/q_s18_ivf_append/*.parquet'),
      |qids AS (SELECT vec_id FROM embeddings
      |         WHERE vec_id % 4 = 0 AND vec_id < 20),
      |ok AS (SELECT
      |    (SELECT COUNT(DISTINCT query_id) FROM sp) =
      |      (SELECT COUNT(*) FROM qids)
      |    AND NOT EXISTS (SELECT 1 FROM sp GROUP BY query_id
      |                    HAVING COUNT(*) <> 10)
      |    AND NOT EXISTS (SELECT 1 FROM qids q
      |          WHERE NOT EXISTS (SELECT 1 FROM sp
      |                WHERE sp.query_id = q.vec_id AND sp.id = q.vec_id))
      |    AS complete),
      |e AS (
      |  SELECT vec_id, embedding,
      |    SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
      |          FROM (SELECT UNNEST(embedding) AS x) ux)) AS nrm
      |  FROM embeddings
      |  WHERE vec_id IN (SELECT vec_id FROM qids)
      |     OR vec_id IN (SELECT id FROM sp)),
      |q AS (SELECT vec_id AS query_id, embedding AS qvec, nrm AS qnrm
      |      FROM e WHERE vec_id IN (SELECT vec_id FROM qids)),
      |sc AS (
      |  SELECT sp.query_id, sp.id,
      |    ROUND(CASE WHEN e.nrm * q.qnrm = 0 THEN 0.0 ELSE
      |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
      |       FROM (SELECT UNNEST(e.embedding) AS x, UNNEST(q.qvec) AS y) u)
      |      / (e.nrm * q.qnrm) END, 6) AS cosine_sim
      |  FROM sp JOIN e ON e.vec_id = sp.id JOIN q ON q.query_id = sp.query_id)
      |SELECT query_id,
      |  ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cosine_sim DESC, id) AS rank,
      |  id, cosine_sim
      |FROM sc WHERE (SELECT complete FROM ok)""".stripMargin

  // Build-once appended-HNSW fixture for S27 — the q_s18 pattern on the
  // navigable-graph index: graph + regions built from the ¾ "original"
  // corpus (vec_id % 4 != 0), the remaining ¼ APPENDED against the
  // frozen anchor graph, so the append path runs at fixture build and
  // the measured query is the serving probe over the mixed layout.
  private def hnswAppendDir(s: SparkSession, d: String): String =
    FixtureCache.resolve("graft-hnsw-append-v5", d, "embeddings.parquet")(
      dir => java.nio.file.Files.exists(dir.resolve("_APPENDED"))) { dir =>
      val emb = t(s, d, "embeddings")
      val (graph, assigned) = Hnsw.index(
        emb.filter(col("vec_id") % 4 =!= 0), "vec_id", "embedding",
        m = 8, sampleSize = 256)
      Hnsw.writeIndex(graph, assigned, dir.toString)
      Hnsw.appendIndex(s, dir.toString,
        emb.filter(col("vec_id") % 4 === 0), "vec_id", "embedding")
      java.nio.file.Files.writeString(dir.resolve("_APPENDED"), "ok")
      ()
    }()

  /** S27: incremental HNSW index maintenance ([[Hnsw.appendIndex]]) —
    * the frozen-anchor append that makes the two serving indexes
    * operationally symmetric (IVF got q_s18; this is its navigable-graph
    * twin). New vectors descend the FROZEN anchor graph via the same
    * Catalyst expression assignment always uses and land appended in the
    * partitioned region layout; the queries are themselves APPENDED
    * vectors (`vec_id % 4 = 0, < 20`), so the oracle's self-presence
    * guard — every query's own id must appear in its emitted top-k,
    * guaranteed because search and assignment share one descent — turns
    * the driver red if the append drops, mis-assigns, or fails to
    * surface rows through the pruned probe; every emitted cosine is
    * recomputed exactly besides.
    */
  val s27HnswAppend: Q = (s, d) => {
    val q = t(s, d, "embeddings")
      .filter(col("vec_id") % 4 === 0 && col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    Hnsw.topKIndexed(s, hnswAppendDir(s, d), q, k = 10, ef = 8)
      .withColumn("rank", col("rank").cast("bigint"))
  }
  val s27Oracle: String =
    """WITH sp AS (
      |  SELECT query_id, id FROM '__SPARK_OUT__/q_s27_hnsw_append/*.parquet'),
      |qids AS (SELECT vec_id FROM embeddings
      |         WHERE vec_id % 4 = 0 AND vec_id < 20),
      |ok AS (SELECT
      |    (SELECT COUNT(DISTINCT query_id) FROM sp) =
      |      (SELECT COUNT(*) FROM qids)
      |    AND NOT EXISTS (SELECT 1 FROM sp GROUP BY query_id
      |                    HAVING COUNT(*) <> 10)
      |    AND NOT EXISTS (SELECT 1 FROM qids q
      |          WHERE NOT EXISTS (SELECT 1 FROM sp
      |                WHERE sp.query_id = q.vec_id AND sp.id = q.vec_id))
      |    AS complete),
      |e AS (
      |  SELECT vec_id, embedding,
      |    SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
      |          FROM (SELECT UNNEST(embedding) AS x) ux)) AS nrm
      |  FROM embeddings
      |  WHERE vec_id IN (SELECT vec_id FROM qids)
      |     OR vec_id IN (SELECT id FROM sp)),
      |q AS (SELECT vec_id AS query_id, embedding AS qvec, nrm AS qnrm
      |      FROM e WHERE vec_id IN (SELECT vec_id FROM qids)),
      |sc AS (
      |  SELECT sp.query_id, sp.id,
      |    ROUND(CASE WHEN e.nrm * q.qnrm = 0 THEN 0.0 ELSE
      |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
      |       FROM (SELECT UNNEST(e.embedding) AS x, UNNEST(q.qvec) AS y) u)
      |      / (e.nrm * q.qnrm) END, 6) AS cosine_sim
      |  FROM sp JOIN e ON e.vec_id = sp.id JOIN q ON q.query_id = sp.query_id)
      |SELECT query_id,
      |  ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cosine_sim DESC, id) AS rank,
      |  id, cosine_sim
      |FROM sc WHERE (SELECT complete FROM ok)""".stripMargin

  // Build-once streamed-ingestion fixture for S28 — the q_s18 append on
  // the STREAMING path: base IVF index built from the ¾ "original"
  // corpus, then the remaining ¼ arrives as a two-micro-batch file
  // stream whose foreachBatch sink calls the same frozen-centroid
  // append the batch path uses. A crash mid-stream leaves no _INGESTED
  // marker, and the rebuild's ivfWriteIndex overwrite wipes any
  // partial appends, so a half-ingested fixture is never trusted.
  private def ivfStreamIngestDir(s: SparkSession, d: String): String =
    FixtureCache.resolve("graft-ivf-stream-ingest-v2", d,
      "embeddings.parquet")(
      dir => java.nio.file.Files.exists(dir.resolve("_INGESTED"))) { dir =>
      val emb = t(s, d, "embeddings")
      val (centroids, assigned) = Similarity.ivfIndex(
        emb.filter(col("vec_id") % 4 =!= 0), "vec_id", "embedding",
        nCells = 16)
      Similarity.ivfWriteIndex(centroids, assigned, dir.toString)
      val arriving = emb.filter(col("vec_id") % 4 === 0)
        .select("vec_id", "embedding")
      val inDir = stageTwoBatches("graft-s28-ingest", d,
        arriving.filter(col("vec_id") % 8 === 0),
        arriving.filter(col("vec_id") % 8 =!= 0))
      val ck = java.nio.file.Paths.get(inDir).getParent.resolve("ck")
      val sq = s.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // the batch frame analyzes against the MICRO-BATCH's cloned
          // session (isolated temp-function registry) — the append must
          // register its nearest-cell expression there, not on the
          // outer session, or the stream dies UNRESOLVED_ROUTINE
          Similarity.ivfAppendIndex(batch.sparkSession, dir.toString,
            batch, "vec_id", "embedding")
          ()
        }
        .option("checkpointLocation", ck.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      sq.awaitTermination()
      java.nio.file.Files.writeString(dir.resolve("_INGESTED"), "ok")
      ()
    }()

  /** S28: STREAMING ingestion into the persisted IVF serving index —
    * the lifecycle piece a production vector store runs continuously:
    * `readStream` over arriving vector files → `foreachBatch` calling
    * the same frozen-centroid [[Similarity.ivfAppendIndex]] the batch
    * path (q_s18) uses → the partition-pruned probe immediately serves
    * old + new rows. The fixture streams the held-out ¼ corpus in two
    * real micro-batches (maxFilesPerTrigger=1, AvailableNow); the
    * measured query probes the mixed layout with stream-appended
    * vectors as queries. Guards: the q_s18 self-presence floor (every
    * appended query finds itself — drops/mis-assignments go red) PLUS
    * an exactly-once row count — `ingested_total` on every emitted row
    * must equal the full corpus count, so a double-applied or dropped
    * micro-batch turns the driver red. At 100 TB this is the standard
    * continuous-ingestion shape: per-batch work is one narrow scan of
    * the batch + a partitioned append; no training, no rewrite, no
    * unbounded state.
    */
  val s28StreamIvfIngest: Q = (s, d) => {
    val dir = ivfStreamIngestDir(s, d)
    val total = s.read.parquet(s"$dir/assigned").count()
    val q = t(s, d, "embeddings")
      .filter(col("vec_id") % 4 === 0 && col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    Similarity.ivfTopKIndexed(s, dir, q, k = 10, nProbe = 4)
      .withColumn("rank", col("rank").cast("bigint"))
      .withColumn("ingested_total", lit(total))
  }
  val s28Oracle: String =
    """WITH sp AS (
      |  SELECT query_id, id, ingested_total
      |  FROM '__SPARK_OUT__/q_s28_stream_ivf_ingest/*.parquet'),
      |qids AS (SELECT vec_id FROM embeddings
      |         WHERE vec_id % 4 = 0 AND vec_id < 20),
      |ok AS (SELECT
      |    (SELECT COUNT(DISTINCT query_id) FROM sp) =
      |      (SELECT COUNT(*) FROM qids)
      |    AND NOT EXISTS (SELECT 1 FROM sp GROUP BY query_id
      |                    HAVING COUNT(*) <> 10)
      |    AND NOT EXISTS (SELECT 1 FROM qids q
      |          WHERE NOT EXISTS (SELECT 1 FROM sp
      |                WHERE sp.query_id = q.vec_id AND sp.id = q.vec_id))
      |    AND (SELECT MIN(ingested_total) FROM sp) =
      |      (SELECT COUNT(*) FROM embeddings)
      |    AND (SELECT MAX(ingested_total) FROM sp) =
      |      (SELECT COUNT(*) FROM embeddings)
      |    AS complete),
      |e AS (
      |  SELECT vec_id, embedding,
      |    SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
      |          FROM (SELECT UNNEST(embedding) AS x) ux)) AS nrm
      |  FROM embeddings
      |  WHERE vec_id IN (SELECT vec_id FROM qids)
      |     OR vec_id IN (SELECT id FROM sp)),
      |q AS (SELECT vec_id AS query_id, embedding AS qvec, nrm AS qnrm
      |      FROM e WHERE vec_id IN (SELECT vec_id FROM qids)),
      |sc AS (
      |  SELECT sp.query_id, sp.id,
      |    ROUND(CASE WHEN e.nrm * q.qnrm = 0 THEN 0.0 ELSE
      |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
      |       FROM (SELECT UNNEST(e.embedding) AS x, UNNEST(q.qvec) AS y) u)
      |      / (e.nrm * q.qnrm) END, 6) AS cosine_sim
      |  FROM sp JOIN e ON e.vec_id = sp.id JOIN q ON q.query_id = sp.query_id)
      |SELECT query_id,
      |  ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cosine_sim DESC, id) AS rank,
      |  id, cosine_sim,
      |  CAST((SELECT COUNT(*) FROM embeddings) AS BIGINT) AS ingested_total
      |FROM sc WHERE (SELECT complete FROM ok)""".stripMargin

  // Build-once streamed-ingestion fixture for S29 — the navigable-graph
  // twin of S28: base HNSW graph + regions from the ¾ corpus, held-out ¼
  // streamed in two micro-batches through a foreachBatch frozen-anchor
  // append. Same crash discipline: no _INGESTED marker → rebuild, and
  // the rebuild's writeIndex overwrite wipes partial appends.
  private def hnswStreamIngestDir(s: SparkSession, d: String): String =
    FixtureCache.resolve("graft-hnsw-stream-ingest-v4", d,
      "embeddings.parquet")(
      dir => java.nio.file.Files.exists(dir.resolve("_INGESTED"))) { dir =>
      val emb = t(s, d, "embeddings")
      val (graph, assigned) = Hnsw.index(
        emb.filter(col("vec_id") % 4 =!= 0), "vec_id", "embedding",
        m = 8, sampleSize = 256)
      Hnsw.writeIndex(graph, assigned, dir.toString)
      val arriving = emb.filter(col("vec_id") % 4 === 0)
        .select("vec_id", "embedding")
      val inDir = stageTwoBatches("graft-s29-ingest", d,
        arriving.filter(col("vec_id") % 8 === 0),
        arriving.filter(col("vec_id") % 8 =!= 0))
      val ck = java.nio.file.Paths.get(inDir).getParent.resolve("ck")
      val sq = s.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // micro-batch cloned-session discipline — see S28
          Hnsw.appendIndex(batch.sparkSession, dir.toString, batch,
            "vec_id", "embedding")
          ()
        }
        .option("checkpointLocation", ck.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      sq.awaitTermination()
      java.nio.file.Files.writeString(dir.resolve("_INGESTED"), "ok")
      ()
    }()

  /** S29: STREAMING ingestion into the persisted HNSW serving index —
    * the navigable-graph twin of q_s28, completing the lifecycle
    * symmetry (both serving indexes now have: build, batch append,
    * STREAMED append, persisted pruned probe, filtered serving). New
    * vectors descend the FROZEN anchor graph inside `foreachBatch` via
    * the same expression assignment always uses; search shares that
    * descent, so every stream-appended query provably probes its own
    * region — the self-presence floor — and `ingested_total` pins
    * exactly-once ingestion across the two micro-batches.
    */
  val s29StreamHnswIngest: Q = (s, d) => {
    val dir = hnswStreamIngestDir(s, d)
    val total = s.read.parquet(s"$dir/assigned").count()
    val q = t(s, d, "embeddings")
      .filter(col("vec_id") % 4 === 0 && col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    Hnsw.topKIndexed(s, dir, q, k = 10, ef = 8)
      .withColumn("rank", col("rank").cast("bigint"))
      .withColumn("ingested_total", lit(total))
  }
  val s29Oracle: String =
    """WITH sp AS (
      |  SELECT query_id, id, ingested_total
      |  FROM '__SPARK_OUT__/q_s29_stream_hnsw_ingest/*.parquet'),
      |qids AS (SELECT vec_id FROM embeddings
      |         WHERE vec_id % 4 = 0 AND vec_id < 20),
      |ok AS (SELECT
      |    (SELECT COUNT(DISTINCT query_id) FROM sp) =
      |      (SELECT COUNT(*) FROM qids)
      |    AND NOT EXISTS (SELECT 1 FROM sp GROUP BY query_id
      |                    HAVING COUNT(*) <> 10)
      |    AND NOT EXISTS (SELECT 1 FROM qids q
      |          WHERE NOT EXISTS (SELECT 1 FROM sp
      |                WHERE sp.query_id = q.vec_id AND sp.id = q.vec_id))
      |    AND (SELECT MIN(ingested_total) FROM sp) =
      |      (SELECT COUNT(*) FROM embeddings)
      |    AND (SELECT MAX(ingested_total) FROM sp) =
      |      (SELECT COUNT(*) FROM embeddings)
      |    AS complete),
      |e AS (
      |  SELECT vec_id, embedding,
      |    SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
      |          FROM (SELECT UNNEST(embedding) AS x) ux)) AS nrm
      |  FROM embeddings
      |  WHERE vec_id IN (SELECT vec_id FROM qids)
      |     OR vec_id IN (SELECT id FROM sp)),
      |q AS (SELECT vec_id AS query_id, embedding AS qvec, nrm AS qnrm
      |      FROM e WHERE vec_id IN (SELECT vec_id FROM qids)),
      |sc AS (
      |  SELECT sp.query_id, sp.id,
      |    ROUND(CASE WHEN e.nrm * q.qnrm = 0 THEN 0.0 ELSE
      |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
      |       FROM (SELECT UNNEST(e.embedding) AS x, UNNEST(q.qvec) AS y) u)
      |      / (e.nrm * q.qnrm) END, 6) AS cosine_sim
      |  FROM sp JOIN e ON e.vec_id = sp.id JOIN q ON q.query_id = sp.query_id)
      |SELECT query_id,
      |  ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cosine_sim DESC, id) AS rank,
      |  id, cosine_sim,
      |  CAST((SELECT COUNT(*) FROM embeddings) AS BIGINT) AS ingested_total
      |FROM sc WHERE (SELECT complete FROM ok)""".stripMargin

  // Build-once versioned-index fixture for S30: the IVF assigned frame
  // hosted as a SnapshotTableStore TABLE — v1 committed from the ¾
  // corpus build, v2 appended with the held-out ¼ assigned against the
  // frozen centroids (Similarity.ivfAssign). The manifest is the commit
  // point, so a crash mid-append leaves v1 fully readable and no marker
  // file is needed beyond the store's own versions.
  private def versionedAnnDir(s: SparkSession, d: String): String =
    FixtureCache.resolve("graft-ann-versioned-v2", d, "embeddings.parquet")(
      dir => {
        val st = new graft.catalog.SnapshotTableStore(
          dir.resolve("store").toString)
        st.currentVersion("ann_assigned").contains(2) &&
          st.currentVersion("ann_centroids").contains(1)
      }) { dir =>
      // a crashed half-build would re-claim ever-higher versions on
      // rebuild and never satisfy the ready check — start clean
      FixtureCache.deleteRecursively(dir.resolve("store"))
      val store = new graft.catalog.SnapshotTableStore(
        dir.resolve("store").toString)
      val emb = t(s, d, "embeddings")
      val (centroids, assigned) = Similarity.ivfIndex(
        emb.filter(col("vec_id") % 4 =!= 0), "vec_id", "embedding",
        nCells = 16)
      store.overwrite(centroids, "ann_centroids")            // v1
      store.overwrite(assigned.select("id", "vec", "cell"),
        "ann_assigned")                                      // v1
      val appended = Similarity.ivfAssign(centroids,
        emb.filter(col("vec_id") % 4 === 0), "vec_id", "embedding")
      store.append(appended.select("id", "vec", "cell"),
        "ann_assigned")                                      // v2
      appended.unpersist(blocking = false)
      ()
    }()

  /** S30: the IVF serving index hosted INSIDE the transactional
    * snapshot store — the serve-while-ingest consistency story the
    * plain partitioned layout cannot give (a reader listing a directory
    * mid-append can see a torn file set; the store's manifest commit
    * cannot). v1 = the ¾-corpus build, v2 = frozen-centroid append of
    * the rest; the measured query probes BOTH pinned versions with the
    * appended vectors as queries and emits a version label per row.
    * Guards: snapshot ISOLATION — no appended id may appear in any
    * v_base row (a probe pinned to v1 serves the immutable pre-append
    * index even after v2 commits) — plus the usual self-presence floor
    * at v_latest, per-(version, query) k-counts, and exact cosine
    * recompute. At 100 TB: appends commit only appended bytes (the
    * manifest carries prior data dirs forward), old versions stay
    * readable for pinned serving until vacuumed, and cell-layout
    * pruning composes by partitioning each commit's data dirs by cell.
    */
  val s30VersionedAnn: Q = (s, d) => {
    val store = new graft.catalog.SnapshotTableStore(
      s"${versionedAnnDir(s, d)}/store")
    val centroids = store.read(s, "ann_centroids")
    val q = t(s, d, "embeddings")
      .filter(col("vec_id") % 4 === 0 && col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    def probe(v: Int, label: String) =
      Similarity.ivfTopK(store.readVersion(s, "ann_assigned", v),
          centroids, q, k = 10, nProbe = 4)
        .withColumn("version", lit(label))
    val vs = store.versions("ann_assigned")
    probe(vs.head, "v_base").unionByName(probe(vs.last, "v_latest"))
      .withColumn("rank", col("rank").cast("bigint"))
  }
  val s30Oracle: String =
    """WITH sp AS (
      |  SELECT query_id, id, version
      |  FROM '__SPARK_OUT__/q_s30_versioned_ann/*.parquet'),
      |qids AS (SELECT vec_id FROM embeddings
      |         WHERE vec_id % 4 = 0 AND vec_id < 20),
      |ok AS (SELECT
      |    (SELECT COUNT(*) FROM (SELECT DISTINCT version, query_id
      |       FROM sp) g) = 2 * (SELECT COUNT(*) FROM qids)
      |    AND NOT EXISTS (SELECT 1 FROM sp GROUP BY version, query_id
      |                    HAVING COUNT(*) <> 10)
      |    -- snapshot isolation: the pre-append version never serves
      |    -- an appended (vec_id % 4 = 0) row
      |    AND NOT EXISTS (SELECT 1 FROM sp
      |                    WHERE version = 'v_base' AND id % 4 = 0)
      |    -- self-presence floor at the latest version
      |    AND NOT EXISTS (SELECT 1 FROM qids q
      |          WHERE NOT EXISTS (SELECT 1 FROM sp
      |                WHERE sp.version = 'v_latest'
      |                  AND sp.query_id = q.vec_id AND sp.id = q.vec_id))
      |    AS complete),
      |e AS (
      |  SELECT vec_id, embedding,
      |    SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
      |          FROM (SELECT UNNEST(embedding) AS x) ux)) AS nrm
      |  FROM embeddings
      |  WHERE vec_id IN (SELECT vec_id FROM qids)
      |     OR vec_id IN (SELECT id FROM sp)),
      |q AS (SELECT vec_id AS query_id, embedding AS qvec, nrm AS qnrm
      |      FROM e WHERE vec_id IN (SELECT vec_id FROM qids)),
      |sc AS (
      |  SELECT sp.version, sp.query_id, sp.id,
      |    ROUND(CASE WHEN e.nrm * q.qnrm = 0 THEN 0.0 ELSE
      |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
      |       FROM (SELECT UNNEST(e.embedding) AS x, UNNEST(q.qvec) AS y) u)
      |      / (e.nrm * q.qnrm) END, 6) AS cosine_sim
      |  FROM sp JOIN e ON e.vec_id = sp.id JOIN q ON q.query_id = sp.query_id)
      |SELECT query_id,
      |  ROW_NUMBER() OVER (PARTITION BY version, query_id
      |    ORDER BY cosine_sim DESC, id) AS rank,
      |  id, cosine_sim, version
      |FROM sc WHERE (SELECT complete FROM ok)""".stripMargin

  // Build-once versioned-HNSW fixture for S31 — q_s30's navigable-graph
  // twin: the anchor graph AND the assigned region frame hosted as
  // SnapshotTableStore TABLES. v1 = the ¾-corpus build (graph tables
  // committed once; appends freeze anchors by contract), v2 =
  // frozen-anchor append of the held-out ¼ via Hnsw.assign. The
  // manifest commit is the atomicity point; the plain partitioned
  // layout q_s29 streams into has a torn-read window during an append —
  // this closes it for the second serving index.
  private def versionedHnswDir(s: SparkSession, d: String): String =
    FixtureCache.resolve("graft-hnsw-versioned-v3", d, "embeddings.parquet")(
      dir => {
        val st = new graft.catalog.SnapshotTableStore(
          dir.resolve("store").toString)
        st.currentVersion("hnsw_assigned").contains(2) &&
          st.currentVersion("hnsw_anchors").contains(1) &&
          st.currentVersion("hnsw_graph").contains(1)
      }) { dir =>
      // same crash discipline as the S30 fixture: a half-build would
      // re-claim ever-higher versions on rebuild — start clean
      FixtureCache.deleteRecursively(dir.resolve("store"))
      val store = new graft.catalog.SnapshotTableStore(
        dir.resolve("store").toString)
      val emb = t(s, d, "embeddings")
      val (graph, assigned) = Hnsw.index(
        emb.filter(col("vec_id") % 4 =!= 0), "vec_id", "embedding",
        m = 8, sampleSize = 256)
      import s.implicits._
      store.overwrite(graph.anchors.zipWithIndex.toSeq
        .map { case (v, i) => (i, v.toSeq) }.toDF("anchor", "vec"),
        "hnsw_anchors")                                      // v1
      store.overwrite((for {
        l <- graph.layerSizes.indices
        i <- 0 until graph.layerSizes(l)
      } yield (l, i, graph.neighbors(l)(i).toSeq))
        .toDF("layer", "node", "nbrs"), "hnsw_graph")        // v1
      store.overwrite(assigned.select("id", "vec", "cell"),
        "hnsw_assigned")                                     // v1
      val appended = Hnsw.assign(graph,
        emb.filter(col("vec_id") % 4 === 0), "vec_id", "embedding")
      store.append(appended.select("id", "vec", "cell"),
        "hnsw_assigned")                                     // v2
      appended.unpersist(blocking = false)
      ()
    }()

  /** S31: versioned HNSW serving inside the transactional snapshot
    * store — the navigable-graph twin of q_s30, completing the
    * versioned-serving symmetry between the two ANN indexes (both now
    * have: build, batch append, streamed append, compaction, filtered
    * serving, AND manifest-committed versioned serving). The frozen
    * anchor graph is itself a store table (rebuilt via
    * [[graft.operators.Hnsw.graphFromFrames]]); probes pin v_base and
    * v_latest of the assigned frame. Guards mirror q_s30: snapshot
    * ISOLATION (no appended id in any v_base row — a reader pinned to
    * v1 serves the immutable pre-append regions even after v2 commits),
    * self-presence floor at v_latest (search and assignment share one
    * descent), per-(version, query) k-counts, exact cosine recompute.
    */
  val s31VersionedHnsw: Q = (s, d) => {
    val store = new graft.catalog.SnapshotTableStore(
      s"${versionedHnswDir(s, d)}/store")
    val graph = Hnsw.graphFromFrames(store.read(s, "hnsw_anchors"),
      store.read(s, "hnsw_graph"))
    val q = t(s, d, "embeddings")
      .filter(col("vec_id") % 4 === 0 && col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    def probe(v: Int, label: String) =
      Hnsw.topK(graph, store.readVersion(s, "hnsw_assigned", v),
          q, k = 10, ef = 8)
        .withColumn("version", lit(label))
    val vs = store.versions("hnsw_assigned")
    probe(vs.head, "v_base").unionByName(probe(vs.last, "v_latest"))
      .withColumn("rank", col("rank").cast("bigint"))
  }
  val s31Oracle: String =
    """WITH sp AS (
      |  SELECT query_id, id, version
      |  FROM '__SPARK_OUT__/q_s31_versioned_hnsw/*.parquet'),
      |qids AS (SELECT vec_id FROM embeddings
      |         WHERE vec_id % 4 = 0 AND vec_id < 20),
      |ok AS (SELECT
      |    (SELECT COUNT(*) FROM (SELECT DISTINCT version, query_id
      |       FROM sp) g) = 2 * (SELECT COUNT(*) FROM qids)
      |    -- k caps, it does not promise: the 256 HNSW regions are far
      |    -- finer than q_s30's 16 IVF cells, so a v_base probe's
      |    -- <= ef+1 regions can legitimately hold fewer than k base
      |    -- rows. More than k is always wrong; a DELETED row is still
      |    -- caught by the rank-sequence recompute below (spark ranks
      |    -- skip, replayed ROW_NUMBER does not) + the self-presence
      |    -- floor the tamper target hits.
      |    AND NOT EXISTS (SELECT 1 FROM sp GROUP BY version, query_id
      |                    HAVING COUNT(*) > 10)
      |    -- snapshot isolation: the pre-append version never serves
      |    -- an appended (vec_id % 4 = 0) row
      |    AND NOT EXISTS (SELECT 1 FROM sp
      |                    WHERE version = 'v_base' AND id % 4 = 0)
      |    -- self-presence floor at the latest version
      |    AND NOT EXISTS (SELECT 1 FROM qids q
      |          WHERE NOT EXISTS (SELECT 1 FROM sp
      |                WHERE sp.version = 'v_latest'
      |                  AND sp.query_id = q.vec_id AND sp.id = q.vec_id))
      |    AS complete),
      |e AS (
      |  SELECT vec_id, embedding,
      |    SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
      |          FROM (SELECT UNNEST(embedding) AS x) ux)) AS nrm
      |  FROM embeddings
      |  WHERE vec_id IN (SELECT vec_id FROM qids)
      |     OR vec_id IN (SELECT id FROM sp)),
      |q AS (SELECT vec_id AS query_id, embedding AS qvec, nrm AS qnrm
      |      FROM e WHERE vec_id IN (SELECT vec_id FROM qids)),
      |sc AS (
      |  SELECT sp.version, sp.query_id, sp.id,
      |    ROUND(CASE WHEN e.nrm * q.qnrm = 0 THEN 0.0 ELSE
      |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
      |       FROM (SELECT UNNEST(e.embedding) AS x, UNNEST(q.qvec) AS y) u)
      |      / (e.nrm * q.qnrm) END, 6) AS cosine_sim
      |  FROM sp JOIN e ON e.vec_id = sp.id JOIN q ON q.query_id = sp.query_id)
      |SELECT query_id,
      |  ROW_NUMBER() OVER (PARTITION BY version, query_id
      |    ORDER BY cosine_sim DESC, id) AS rank,
      |  id, cosine_sim, version
      |FROM sc WHERE (SELECT complete FROM ok)""".stripMargin

  // Build-once retrain-lifecycle fixture for S32: base IVF index from
  // the ¾ corpus (ivfWriteIndex records the trained-against count),
  // held-out ¼ appended against the frozen centroids, staleness
  // measured BEFORE (must read appended_fraction = 1/4 exactly), then
  // ivfRetrainIndex rebuilds centroids on the full corpus and swaps the
  // (assigned, centroids) pair crash-recoverably, staleness measured
  // AFTER (must read 0). Both metric frames persist beside the index so
  // cached runs re-emit the same numbers.
  private def ivfRetrainDir(s: SparkSession, d: String): String =
    FixtureCache.resolve("graft-ivf-retrain-v2", d, "embeddings.parquet")(
      dir => java.nio.file.Files.exists(dir.resolve("_RETRAINED"))) { dir =>
      val emb = t(s, d, "embeddings")
      val (centroids, assigned) = Similarity.ivfIndex(
        emb.filter(col("vec_id") % 4 =!= 0), "vec_id", "embedding",
        nCells = 16)
      Similarity.ivfWriteIndex(centroids, assigned, dir.toString)
      Similarity.ivfAppendIndex(s, dir.toString,
        emb.filter(col("vec_id") % 4 === 0), "vec_id", "embedding")
      Similarity.ivfStaleness(s, dir.toString).write.mode("overwrite")
        .parquet(dir.resolve("stale_before").toString)
      Similarity.ivfRetrainIndex(s, dir.toString, nCells = 16)
      Similarity.ivfStaleness(s, dir.toString).write.mode("overwrite")
        .parquet(dir.resolve("stale_after").toString)
      java.nio.file.Files.writeString(dir.resolve("_RETRAINED"), "ok")
      ()
    }()

  /** S32: index staleness measurement + retrain-and-swap
    * ([[Similarity.ivfStaleness]] / [[Similarity.ivfRetrainIndex]]) —
    * the missing lifecycle piece after q_s18/q_s28's frozen-centroid
    * appends: under sustained drift the frozen index degrades with no
    * signal, so the layout now carries its trained-against row count
    * and reports `appended_fraction` + cell skew, and the measured
    * trigger has a crash-recoverable retrain path (centroids rebuilt on
    * a fresh hash-uniform sample of the FULL corpus, every row
    * re-assigned, the (assigned, centroids) pair swapped atomically-
    * or-rolled-back). The emitted rows carry the drift counters before
    * and after the retrain as EXACT integers (the never-round-a-double
    * oracle discipline) — the oracle recomputes both from the corpus
    * (appended_before = count(vec_id%4=0); a wrong count or an
    * unrefreshed marker goes red; appended_after = 0) — plus the usual
    * self-presence floor and exact cosine recompute over the RETRAINED
    * index's probes.
    */
  val s32IvfRetrain: Q = (s, d) => {
    val dir = ivfRetrainDir(s, d)
    // exact integer drift counters (never ROUND a double across engines
    // — the graft.Queries oracle discipline): appended = total − trained
    val before = s.read.parquet(s"$dir/stale_before")
      .select((col("rows_total") - col("rows_trained"))
          .cast("bigint").as("appended_before"),
        col("rows_total").cast("bigint").as("rows_total"))
    val after = s.read.parquet(s"$dir/stale_after")
      .select((col("rows_total") - col("rows_trained"))
        .cast("bigint").as("appended_after"))
    val q = t(s, d, "embeddings")
      .filter(col("vec_id") % 4 === 0 && col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    Similarity.ivfTopKIndexed(s, dir, q, k = 10, nProbe = 4)
      .withColumn("rank", col("rank").cast("bigint"))
      .crossJoin(broadcast(before)).crossJoin(broadcast(after))
  }
  val s32Oracle: String =
    """WITH sp AS (
      |  SELECT query_id, id
      |  FROM '__SPARK_OUT__/q_s32_ivf_retrain/*.parquet'),
      |qids AS (SELECT vec_id FROM embeddings
      |         WHERE vec_id % 4 = 0 AND vec_id < 20),
      |ok AS (SELECT
      |    (SELECT COUNT(DISTINCT query_id) FROM sp) =
      |      (SELECT COUNT(*) FROM qids)
      |    AND NOT EXISTS (SELECT 1 FROM sp GROUP BY query_id
      |                    HAVING COUNT(*) <> 10)
      |    AND NOT EXISTS (SELECT 1 FROM qids q
      |          WHERE NOT EXISTS (SELECT 1 FROM sp
      |                WHERE sp.query_id = q.vec_id AND sp.id = q.vec_id))
      |    AS complete),
      |e AS (
      |  SELECT vec_id, embedding,
      |    SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
      |          FROM (SELECT UNNEST(embedding) AS x) ux)) AS nrm
      |  FROM embeddings
      |  WHERE vec_id IN (SELECT vec_id FROM qids)
      |     OR vec_id IN (SELECT id FROM sp)),
      |q AS (SELECT vec_id AS query_id, embedding AS qvec, nrm AS qnrm
      |      FROM e WHERE vec_id IN (SELECT vec_id FROM qids)),
      |sc AS (
      |  SELECT sp.query_id, sp.id,
      |    ROUND(CASE WHEN e.nrm * q.qnrm = 0 THEN 0.0 ELSE
      |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
      |       FROM (SELECT UNNEST(e.embedding) AS x, UNNEST(q.qvec) AS y) u)
      |      / (e.nrm * q.qnrm) END, 6) AS cosine_sim
      |  FROM sp JOIN e ON e.vec_id = sp.id JOIN q ON q.query_id = sp.query_id)
      |SELECT query_id,
      |  ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cosine_sim DESC, id) AS rank,
      |  id, cosine_sim,
      |  CAST((SELECT COUNT(*) FILTER (WHERE vec_id % 4 = 0)
      |        FROM embeddings) AS BIGINT) AS appended_before,
      |  CAST((SELECT COUNT(*) FROM embeddings) AS BIGINT) AS rows_total,
      |  CAST(0 AS BIGINT) AS appended_after
      |FROM sc WHERE (SELECT complete FROM ok)""".stripMargin

  /** S19: scalar (int8-range) quantization two-stage search
    * ([[Similarity.sqTopK]]) — the serving tier between brute force and
    * PQ: per-dim corpus bounds → integer codes 0..255 → exact integer L2
    * prunes to 30 candidates per query over the THIN code frame → exact
    * cosine rerank of the bounded candidate set. Every stage is
    * deterministic IEEE/integer arithmetic, so the oracle replays the
    * whole pipeline — bounds, the `floor(((x-lo)*255)/(hi-lo))` code
    * chain, code-space ranking with id tie-breaks, and the rerank — and
    * any drift (wrong bounds, mis-clamped code, dropped candidate,
    * unstable ties) turns the row red.
    */
  val s19SqTopK: Q = (s, d) =>
    Similarity.sqTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        queryVecs(s, d), k = 10, candK = 30)
      .withColumn("rank", col("rank").cast("bigint"))
  val s19Oracle: String =
    """WITH p AS (
      |  SELECT pos, MIN(CAST(x AS DOUBLE)) AS minv,
      |         MAX(CAST(x AS DOUBLE)) AS maxv
      |  FROM (SELECT UNNEST(range(1, len(embedding) + 1)) AS pos,
      |               UNNEST(embedding) AS x FROM embeddings) z
      |  GROUP BY pos),
      |pa AS (SELECT list(minv ORDER BY pos) AS mins,
      |              list(maxv ORDER BY pos) AS maxs FROM p),
      |c AS (
      |  SELECT vec_id,
      |    list_transform(range(1, len(embedding) + 1), i ->
      |      CASE WHEN maxs[i] - mins[i] = 0 THEN 0
      |           ELSE CAST(LEAST(GREATEST(FLOOR(
      |             ((CAST(embedding[i] AS DOUBLE) - mins[i]) * 255.0)
      |               / (maxs[i] - mins[i])), 0), 255) AS INT) END) AS codes
      |  FROM embeddings, pa),
      |q AS (SELECT vec_id AS query_id, codes AS qcodes FROM c
      |      WHERE vec_id < 5),
      |sc AS (
      |  SELECT q.query_id, c.vec_id AS id,
      |    CAST(list_sum(list_transform(range(1, len(c.codes) + 1), i ->
      |      CAST(c.codes[i] - q.qcodes[i] AS BIGINT)
      |        * CAST(c.codes[i] - q.qcodes[i] AS BIGINT))) AS BIGINT)
      |      AS code_l2
      |  FROM c CROSS JOIN q),
      |cand AS (SELECT query_id, id, code_l2 FROM (
      |    SELECT sc.*, ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY code_l2, id) AS crank FROM sc) z
      |  WHERE crank <= 30),
      |e AS (
      |  SELECT vec_id, embedding,
      |    SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
      |          FROM (SELECT UNNEST(embedding) AS x) ux)) AS nrm
      |  FROM embeddings),
      |fin AS (
      |  SELECT cand.query_id, cand.id, cand.code_l2,
      |    ROUND(CASE WHEN e.nrm * qe.nrm = 0 THEN 0.0 ELSE
      |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
      |       FROM (SELECT UNNEST(e.embedding) AS x,
      |                    UNNEST(qe.embedding) AS y) u)
      |      / (e.nrm * qe.nrm) END, 6) AS cosine_sim
      |  FROM cand JOIN e ON e.vec_id = cand.id
      |            JOIN e qe ON qe.vec_id = cand.query_id)
      |SELECT query_id, rank, id, code_l2, cosine_sim FROM (
      |  SELECT fin.*, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY cosine_sim DESC, id) AS rank FROM fin) z
      |WHERE rank <= 10""".stripMargin

  /** S8/S9/S10: product quantization — the compressed-index pairing of
    * IVF for 100 TB ANN ([[Similarity.pqIndex]]/[[Similarity.pqTopK]]).
    * Three artifacts, each driver-checked:
    *   - q_s8 emits the trained codebook (echo oracle with structural
    *     guards: exact (subspace, code) bijection, centroid dimension,
    *     finiteness — k-means itself is not SQL-replayable, exactly like
    *     the IVF centroid table);
    *   - q_s9 emits every vector's per-subspace code, and DuckDB FULLY
    *     replays the assignment: argmin over the emitted codebook of the
    *     squared subvector distance, ties to the lowest code, plus a
    *     (vector × subspace) bijection;
    *   - q_s10 emits the ADC top-k serving result, and DuckDB recomputes
    *     the ENTIRE serving path from the emitted index artifacts + raw
    *     embeddings — it never reads q_s10's own dump, so any wrong,
    *     missing, or fabricated row mismatches. Float distances stay out
    *     of every emitted frame (ranks only, ties by id) so no IEEE sum
    *     is ever compared across engines.
    */
  private val PqSubDim = 16 // 64-dim embeddings / 4 subspaces
  val s8PqCodebook: Q = (s, d) => {
    val (_, codebook, _) = Similarity.pqIndex(
      t(s, d, "embeddings"), "vec_id", "embedding")
    // Long form (subspace, code, dim, value): emitted frames carry only
    // scalar columns — the driver's pandas hasher cannot sort an
    // array-typed column (COVERAGE.md, determinism rules).
    codebook.select(col("subspace").cast("bigint").as("subspace"),
        col("code").cast("bigint").as("code"),
        posexplode(col("centroid")).as(Seq("dim", "value")))
      .select(col("subspace"), col("code"),
        col("dim").cast("bigint").as("dim"),
        col("value").cast("double").as("value"))
  }
  val s8Oracle =
    s"""WITH sp AS (
       |  SELECT * FROM '__SPARK_OUT__/q_s8_pq_codebook/*.parquet'),
       |ok AS (SELECT
       |    (SELECT COUNT(*) FROM sp) = 64 * $PqSubDim
       |    AND (SELECT COUNT(*) FROM
       |         (SELECT DISTINCT subspace, code, dim FROM sp) z)
       |      = 64 * $PqSubDim
       |    AND NOT EXISTS (SELECT 1 FROM sp
       |          WHERE subspace NOT BETWEEN 0 AND 3
       |             OR code NOT BETWEEN 0 AND 15
       |             OR dim NOT BETWEEN 0 AND ${PqSubDim - 1}
       |             OR NOT isfinite(value))
       |    AS complete)
       |SELECT subspace, code, dim, value FROM sp
       |WHERE (SELECT complete FROM ok)""".stripMargin

  val s9PqCodes: Q = (s, d) => {
    val (_, _, codes) = Similarity.pqIndex(
      t(s, d, "embeddings"), "vec_id", "embedding")
    codes.select(col("id").as("vec_id"),
        posexplode(col("codes")).as(Seq("subspace", "code")))
      .select(col("vec_id"), col("subspace").cast("bigint").as("subspace"),
        col("code").cast("bigint").as("code"))
  }
  val s9Oracle =
    s"""WITH sp AS (
       |  SELECT * FROM '__SPARK_OUT__/q_s9_pq_codes/*.parquet'),
       |cb AS (SELECT subspace, code, list(value ORDER BY dim) AS centroid
       |       FROM '__SPARK_OUT__/q_s8_pq_codebook/*.parquet'
       |       GROUP BY subspace, code),
       |d2 AS (
       |  SELECT e.vec_id, cb.subspace, cb.code,
       |    (SELECT SUM((CAST(a AS DOUBLE) - CAST(b AS DOUBLE))
       |               * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE)))
       |     FROM (SELECT UNNEST(list_slice(e.embedding,
       |             cb.subspace * $PqSubDim + 1,
       |             cb.subspace * $PqSubDim + $PqSubDim)) AS a,
       |           UNNEST(cb.centroid) AS b) u) AS dd
       |  FROM embeddings e, cb),
       |amin AS (
       |  SELECT vec_id, subspace, code FROM (
       |    SELECT vec_id, subspace, code, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id, subspace ORDER BY dd, code) AS rn
       |    FROM d2) z WHERE rn = 1),
       |ok AS (SELECT
       |    (SELECT COUNT(*) FROM sp)
       |      = 4 * (SELECT COUNT(*) FROM embeddings)
       |    AND (SELECT COUNT(*) FROM
       |         (SELECT DISTINCT vec_id, subspace FROM sp) z)
       |      = (SELECT COUNT(*) FROM sp)
       |    AND NOT EXISTS (SELECT 1 FROM sp
       |          JOIN amin ON amin.vec_id = sp.vec_id
       |                   AND amin.subspace = sp.subspace
       |          WHERE amin.code <> sp.code)
       |    AS complete)
       |SELECT vec_id, subspace, code FROM sp
       |WHERE (SELECT complete FROM ok)""".stripMargin

  val s10PqTopK: Q = (s, d) => {
    val (model, _, codes) = Similarity.pqIndex(
      t(s, d, "embeddings"), "vec_id", "embedding")
    Similarity.pqTopK(model, codes, queryVecs(s, d), k = 10)
      .withColumn("rank", col("rank").cast("bigint"))
  }
  val s10Oracle =
    s"""WITH cb AS (
       |  SELECT subspace, code, list(value ORDER BY dim) AS centroid
       |  FROM '__SPARK_OUT__/q_s8_pq_codebook/*.parquet'
       |  GROUP BY subspace, code),
       |cd AS (SELECT * FROM '__SPARK_OUT__/q_s9_pq_codes/*.parquet'),
       |q AS (SELECT vec_id AS query_id, embedding AS qvec
       |      FROM embeddings WHERE vec_id < 5),
       |dist AS (
       |  SELECT q.query_id, cd.vec_id AS id,
       |    SUM((SELECT SUM((CAST(a AS DOUBLE) - CAST(b AS DOUBLE))
       |                   * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE)))
       |         FROM (SELECT UNNEST(list_slice(q.qvec,
       |                 cb.subspace * $PqSubDim + 1,
       |                 cb.subspace * $PqSubDim + $PqSubDim)) AS a,
       |               UNNEST(cb.centroid) AS b) u)) AS dd
       |  FROM q, cd
       |  JOIN cb ON cb.subspace = cd.subspace AND cb.code = cd.code
       |  GROUP BY q.query_id, cd.vec_id)
       |SELECT query_id,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dd, id) AS rank,
       |  id
       |FROM dist QUALIFY rank <= 10""".stripMargin

  /** S11/S12: the combined IVF+PQ serving path — the production ANN
    * architecture ([[Similarity.ivfPqTopK]]): IVF prunes to nProbe=4 of
    * 16 cells, PQ's ADC tables score the survivors. q_s11 emits the IVF
    * centroid table (structural echo, like q_s8); q_s12's oracle then
    * replays the ENTIRE pipeline from emitted artifacts — every vector's
    * cell assignment (argmin vs the centroid dump), each query's probed
    * cell set (top-nProbe by distance, ties by cell), and the ADC
    * ranking over exactly those candidates — without reading q_s12's own
    * dump. Ranks only, ties by id: no cross-engine float compare.
    */
  val s11IvfCentroids: Q = (s, d) => {
    val (centroids, _) = Similarity.ivfIndex(
      t(s, d, "embeddings"), "vec_id", "embedding")
    // Long form (cell, dim, value) — same scalar-columns-only rule as
    // q_s8: the driver's pandas hasher cannot sort array columns.
    centroids.select(col("cell").cast("bigint").as("cell"),
        posexplode(col("centroid")).as(Seq("dim", "value")))
      .select(col("cell"), col("dim").cast("bigint").as("dim"),
        col("value").cast("double").as("value"))
  }
  val s11Oracle =
    """WITH sp AS (
      |  SELECT * FROM '__SPARK_OUT__/q_s11_ivf_centroids/*.parquet'),
      |ok AS (SELECT
      |    (SELECT COUNT(*) FROM sp) = 16 * 64
      |    AND (SELECT COUNT(*) FROM
      |         (SELECT DISTINCT cell, dim FROM sp) z) = 16 * 64
      |    AND NOT EXISTS (SELECT 1 FROM sp
      |          WHERE cell NOT BETWEEN 0 AND 15
      |             OR dim NOT BETWEEN 0 AND 63
      |             OR NOT isfinite(value))
      |    AS complete)
      |SELECT cell, dim, value FROM sp
      |WHERE (SELECT complete FROM ok)""".stripMargin

  val s12IvfPqTopK: Q = (s, d) => {
    val emb = t(s, d, "embeddings")
    val (centroidsDf, assigned) = Similarity.ivfIndex(emb, "vec_id", "embedding")
    val cents = centroidsDf.orderBy("cell").collect()
      .map(_.getSeq[Float](1).toArray)
    val (model, _, codes) = Similarity.pqIndex(emb, "vec_id", "embedding")
    Similarity.ivfPqTopK(cents, assigned, model, codes, queryVecs(s, d),
        k = 10, nProbe = 4)
      .withColumn("rank", col("rank").cast("bigint"))
  }
  val s12Oracle =
    s"""WITH cb AS (
       |  SELECT subspace, code, list(value ORDER BY dim) AS centroid
       |  FROM '__SPARK_OUT__/q_s8_pq_codebook/*.parquet'
       |  GROUP BY subspace, code),
       |cd AS (SELECT * FROM '__SPARK_OUT__/q_s9_pq_codes/*.parquet'),
       |ce AS (SELECT cell, list(value ORDER BY dim) AS centroid
       |       FROM '__SPARK_OUT__/q_s11_ivf_centroids/*.parquet'
       |       GROUP BY cell),
       |q AS (SELECT vec_id AS query_id, embedding AS qvec
       |      FROM embeddings WHERE vec_id < 5),
       |vd AS (
       |  SELECT e.vec_id, ce.cell,
       |    (SELECT SUM((CAST(a AS DOUBLE) - CAST(b AS DOUBLE))
       |               * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE)))
       |     FROM (SELECT UNNEST(e.embedding) AS a,
       |                  UNNEST(ce.centroid) AS b) u) AS dd
       |  FROM embeddings e, ce),
       |vcell AS (SELECT vec_id, cell FROM (
       |  SELECT vec_id, cell, ROW_NUMBER() OVER (
       |    PARTITION BY vec_id ORDER BY dd, cell) AS rn FROM vd) z
       |  WHERE rn = 1),
       |qd AS (
       |  SELECT q.query_id, ce.cell,
       |    (SELECT SUM((CAST(a AS DOUBLE) - CAST(b AS DOUBLE))
       |               * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE)))
       |     FROM (SELECT UNNEST(q.qvec) AS a,
       |                  UNNEST(ce.centroid) AS b) u) AS dd
       |  FROM q, ce),
       |probed AS (SELECT query_id, cell FROM (
       |  SELECT query_id, cell, ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY dd, cell) AS rn FROM qd) z
       |  WHERE rn <= 4),
       |dist AS (
       |  SELECT p.query_id, cd.vec_id AS id,
       |    SUM((SELECT SUM((CAST(a AS DOUBLE) - CAST(b AS DOUBLE))
       |                   * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE)))
       |         FROM (SELECT UNNEST(list_slice(q.qvec,
       |                 cb.subspace * $PqSubDim + 1,
       |                 cb.subspace * $PqSubDim + $PqSubDim)) AS a,
       |               UNNEST(cb.centroid) AS b) u)) AS dd
       |  FROM probed p
       |  JOIN vcell v ON v.cell = p.cell
       |  JOIN q ON q.query_id = p.query_id
       |  JOIN cd ON cd.vec_id = v.vec_id
       |  JOIN cb ON cb.subspace = cd.subspace AND cb.code = cd.code
       |  GROUP BY p.query_id, cd.vec_id)
       |SELECT query_id,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dd, id) AS rank,
       |  id
       |FROM dist QUALIFY rank <= 10""".stripMargin

  /** S7: the full embedding-dedup pipeline as an audit MANIFEST — the
    * vector twin of q_d6: LSH cosine pairs → connected components →
    * keeper decision per input vector, with the direct witness and its
    * exact cosine as evidence. The oracle demands an id BIJECTION with
    * the embeddings corpus (deleted/fabricated rows turn it red),
    * recomputes every witnessed row's cosine exactly in DuckDB, and
    * checks keeper consistency (survivor ⟺ keeper = id; dropped rows
    * have a witness, a smaller keeper, and that keeper is a survivor).
    */
  val s7EmbedDedupManifest: Q = (s, d) =>
    Similarity.embeddingDedupManifest(t(s, d, "embeddings"),
      "vec_id", "embedding", threshold = 0.4, nBits = 5, tables = 16)
  val s7Oracle =
    s"""WITH sp AS (
       |  SELECT * FROM '__SPARK_OUT__/q_s7_embed_dedup_manifest/*.parquet'),
       |ok AS (SELECT
       |    (SELECT COUNT(*) FROM sp) = (SELECT COUNT(*) FROM embeddings)
       |    AND (SELECT COUNT(DISTINCT id) FROM sp) = (SELECT COUNT(*) FROM sp)
       |    AND NOT EXISTS (SELECT 1 FROM embeddings e
       |                    WHERE e.vec_id NOT IN (SELECT id FROM sp))
       |    AS complete),
       |e AS (
       |  SELECT vec_id, embedding,
       |    SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
       |          FROM (SELECT UNNEST(embedding) AS x) ux)) AS nrm
       |  FROM embeddings
       |  WHERE vec_id IN (SELECT id FROM sp WHERE witness_id IS NOT NULL
       |                   UNION SELECT witness_id FROM sp
       |                   WHERE witness_id IS NOT NULL)),
       |w AS (
       |  SELECT sp.id,
       |    ROUND(CASE WHEN a.nrm * b.nrm = 0 THEN 0.0 ELSE
       |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
       |       FROM (SELECT UNNEST(a.embedding) AS x, UNNEST(b.embedding) AS y) u)
       |      / (a.nrm * b.nrm) END, 6) AS c
       |  FROM sp JOIN e a ON a.vec_id = sp.id
       |          JOIN e b ON b.vec_id = sp.witness_id
       |  WHERE sp.witness_id IS NOT NULL)
       |SELECT sp.id, sp.keeper_id, sp.is_survivor, sp.witness_id,
       |       sp.witness_cosine
       |FROM sp JOIN embeddings ev ON ev.vec_id = sp.id
       |LEFT JOIN w ON w.id = sp.id
       |WHERE (SELECT complete FROM ok)
       |  AND sp.is_survivor = (sp.keeper_id = sp.id)
       |  AND (sp.witness_id IS NULL OR (sp.witness_id <> sp.id
       |       AND w.c = sp.witness_cosine AND w.c >= 0.4))
       |  AND (sp.is_survivor OR (sp.witness_id IS NOT NULL
       |       AND sp.keeper_id < sp.id
       |       AND sp.keeper_id IN (SELECT id FROM sp WHERE is_survivor)))""".stripMargin

  /** S13: SemDeDup-style semantic near-dedup manifest — clustered
    * blocking via [[Similarity.semanticDedupManifest]] over the planted
    * corpus ([[withPlantedVecClones]]): identical-vector clones always
    * share a k-means cell AND score cosine 1, so their detection is
    * certain and the oracle REQUIRES each planted pair to share a keeper
    * with at most one survivor — under-emission (or an empty manifest)
    * turns the driver red (tools/tamper_test.py). The rest is the q_s7
    * shape: corpus bijection, keeper consistency, witness-cosine
    * recompute ≥ threshold, keeper-is-survivor; plus semantic-cell
    * structural checks (cell in range; witness within the SAME cell —
    * candidates are generated per cell, so a cross-cell witness is a
    * fabrication).
    */
  val s13SemanticDedup: Q = (s, d) =>
    Similarity.semanticDedupManifest(
      withPlantedVecClones(t(s, d, "embeddings")),
      "vec_id", "embedding", threshold = 0.85, nCells = 16)
  val s13Oracle =
    s"""WITH sp AS (
       |  SELECT * FROM '__SPARK_OUT__/q_s13_semantic_dedup/*.parquet'),
       |plantv AS ($vecPlantSql),
       |corpus AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL SELECT vec_id + $PlantOffset, embedding FROM plantv),
       |ok AS (SELECT
       |    (SELECT COUNT(*) FROM sp) = (SELECT COUNT(*) FROM corpus)
       |    AND (SELECT COUNT(DISTINCT id) FROM sp) = (SELECT COUNT(*) FROM sp)
       |    AND NOT EXISTS (SELECT 1 FROM corpus e
       |                    WHERE e.vec_id NOT IN (SELECT id FROM sp))
       |    AND NOT EXISTS (SELECT 1 FROM sp WHERE cell < 0 OR cell >= 16)
       |    AND NOT EXISTS (SELECT 1 FROM plantv pl
       |        JOIN sp a ON a.id = pl.vec_id
       |        JOIN sp b ON b.id = pl.vec_id + $PlantOffset
       |        WHERE a.keeper_id <> b.keeper_id
       |           OR (a.is_survivor AND b.is_survivor))
       |    AS complete),
       |e AS (
       |  SELECT vec_id, embedding,
       |    SQRT((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
       |          FROM (SELECT UNNEST(embedding) AS x) ux)) AS nrm
       |  FROM corpus
       |  WHERE vec_id IN (SELECT id FROM sp WHERE witness_id IS NOT NULL
       |                   UNION SELECT witness_id FROM sp
       |                   WHERE witness_id IS NOT NULL)),
       |w AS (
       |  SELECT sp.id,
       |    ROUND(CASE WHEN a.nrm * b.nrm = 0 THEN 0.0 ELSE
       |      (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
       |       FROM (SELECT UNNEST(a.embedding) AS x, UNNEST(b.embedding) AS y) u)
       |      / (a.nrm * b.nrm) END, 6) AS c
       |  FROM sp JOIN e a ON a.vec_id = sp.id
       |          JOIN e b ON b.vec_id = sp.witness_id
       |  WHERE sp.witness_id IS NOT NULL)
       |SELECT sp.id, sp.cell, sp.keeper_id, sp.is_survivor, sp.witness_id,
       |       sp.witness_cosine
       |FROM sp JOIN corpus ev ON ev.vec_id = sp.id
       |LEFT JOIN w ON w.id = sp.id
       |LEFT JOIN sp wc ON wc.id = sp.witness_id
       |WHERE (SELECT complete FROM ok)
       |  AND sp.is_survivor = (sp.keeper_id = sp.id)
       |  AND (sp.witness_id IS NULL OR (sp.witness_id <> sp.id
       |       AND w.c = sp.witness_cosine AND w.c >= 0.85
       |       AND wc.cell = sp.cell))
       |  AND (sp.is_survivor OR (sp.witness_id IS NOT NULL
       |       AND sp.keeper_id < sp.id
       |       AND sp.keeper_id IN (SELECT id FROM sp WHERE is_survivor)))""".stripMargin

  // ===== streaming =====================================================

  /** ST2: the streaming SimHash near-dup family under a driver-visible
    * oracle — [[graft.streaming.StreamingDedup.nearSimhash]] replayed
    * one-shot over the planted documents fixture with an `availableNow`
    * trigger (a real Structured Streaming run: file source → keyed state
    * → memory sink), then the emitted hits normalized to (id_a < id_b)
    * pairs with both signatures riding along. The emitted pair SET is
    * invariant to micro-batch splitting: every same-bucket pair is
    * compared exactly once, when its later-processed member arrives, and
    * `maxBucket` is sized above the fixture's largest bucket so no state
    * eviction perturbs it (batch-parity asserted in StreamingDedupSpec).
    * The oracle is the q_d5 shape: recompute hamming = popcount(sh_a XOR
    * sh_b) in DuckDB, enforce the threshold and id order, join both ids
    * back to the planted corpus, and REQUIRE every planted clone pair
    * (identical text ⇒ certain detection) — so under-emission turns the
    * driver red (tools/tamper_test.py).
    *
    * The bounded result is collected off the memory sink (it is a
    * verification harness; production runs write to a real sink) and
    * re-created as a local frame so no temp view outlives the query.
    */
  val st2StreamNearDup: Q = (s, d) => {
    import s.implicits._
    graft.functions.VecExprs.register(s)
    val sch = s.read.parquet(s"$d/documents.parquet").schema
    // documents.parquet is a single FILE: a non-glob path makes
    // FileStreamSource force basePath to the path itself, which must be a
    // directory — so glob the last character and pin basePath to the
    // fixture dir.
    val stream = s.readStream.schema(sch).option("basePath", d)
      .parquet(s"$d/documents.parque*")
    val planted = stream.select("doc_id", "text").unionByName(
      stream.filter(Sampling.hashBucket(col("doc_id"), "plant") < lit(PlantThr)
          && size(split(TextAnalysis.normalize(col("text")), " ")) >= 3)
        .select((col("doc_id") + lit(PlantOffset)).as("doc_id"), col("text")))
    val hits = graft.streaming.StreamingDedup.nearSimhash(
      planted.as[(Long, String)], maxHamming = 3, maxBucket = 1 << 20)
    val localDf = graft.streaming.Replay.availableNow(hits.toDF())
    // hits carry both signatures as evidence, so the canonical (id_a <
    // id_b) pair frame is a pure projection — no corpus-wide signature
    // re-derivation join (it cost a second documents scan pre-round-8)
    val flip = col("docId") > col("dupOfId")
    localDf.select(
        least(col("docId"), col("dupOfId")).as("id_a"),
        greatest(col("docId"), col("dupOfId")).as("id_b"),
        when(flip, col("dupOfSh")).otherwise(col("docSh")).as("sh_a"),
        when(flip, col("docSh")).otherwise(col("dupOfSh")).as("sh_b"),
        col("hamming"))
      .dropDuplicates("id_a", "id_b")
  }
  val st2Oracle =
    s"""WITH sp AS (
       |  SELECT * FROM '__SPARK_OUT__/q_st2_stream_neardup/*.parquet'),
       |plant AS ($plantSql),
       |corpus AS ($plantedCorpusSql),
       |ok AS (
       |  SELECT NOT EXISTS (SELECT 1 FROM plant pl WHERE NOT EXISTS (
       |    SELECT 1 FROM sp WHERE sp.id_a = pl.doc_id
       |      AND sp.id_b = pl.doc_id + $PlantOffset
       |      AND sp.hamming = 0)) AS complete)
       |SELECT sp.id_a, sp.id_b, sp.sh_a, sp.sh_b, sp.hamming
       |FROM sp
       |JOIN corpus da ON da.doc_id = sp.id_a
       |JOIN corpus db ON db.doc_id = sp.id_b
       |WHERE bit_count(xor(sp.sh_a, sp.sh_b)) = sp.hamming
       |  AND sp.hamming <= 3 AND sp.id_a < sp.id_b
       |  AND (SELECT complete FROM ok)""".stripMargin

  /** Q1: declarative data-quality expectations
    * ([[Expectations]]) — the EXPECT/quarantine surface in front of a
    * 100 TB ingest: three named rules (NULL = failure), per-rule
    * pass/fail metrics from ONE partial-aggregated scan, the
    * valid/quarantined split from the same annotated scan, and the
    * violated-rule-combination breakdown from the quarantine's
    * `_failed` array. All four frames ride in one emitted result
    * (rule-typed rows); the oracle replays every row class — a flipped
    * NULL verdict, a lost quarantine row, or a wrong combo label all
    * fail the hash compare.
    */
  val q1Expectations: Q = (s, d) => {
    import Expectations.Rule
    val docs = t(s, d, "documents")
    val rules = Seq(
      Rule("western_lang", col("lang").isin("en", "de", "fr", "es")),
      Rule("short_text", col("n_chars") <= 300),
      Rule("text_nonempty", length(col("text")) > 0))
    val m = Expectations.metrics(docs, rules)
    val (valid, quar) = Expectations.split(docs, rules)
    val totals = valid.agg(count(lit(1)).as("n_pass"))
      .crossJoin(quar.agg(count(lit(1)).as("n_fail")))
      .select(lit("_total").as("rule"), col("n_pass"), col("n_fail"),
        (col("n_fail").cast("double") /
          (col("n_pass") + col("n_fail")).cast("double")).as("fail_rate"))
    val combos = quar
      .groupBy(array_join(col("_failed"), "+").as("combo"))
      .agg(count(lit(1)).as("n_fail"))
      .select(concat(lit("combo:"), col("combo")).as("rule"),
        lit(0L).as("n_pass"), col("n_fail"),
        lit(null).cast("double").as("fail_rate"))
    m.unionByName(totals).unionByName(combos)
  }
  val q1Oracle: String =
    """WITH f AS (
      |  SELECT COALESCE(lang IN ('en','de','fr','es'), FALSE) AS okw,
      |         COALESCE(n_chars <= 300, FALSE) AS oks,
      |         COALESCE(length(text) > 0, FALSE) AS okt
      |  FROM documents),
      |rules AS (
      |  SELECT 'western_lang' AS rule,
      |    CAST(SUM(CASE WHEN okw THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
      |    CAST(SUM(CASE WHEN okw THEN 0 ELSE 1 END) AS BIGINT) AS n_fail
      |  FROM f
      |  UNION ALL SELECT 'short_text',
      |    CAST(SUM(CASE WHEN oks THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(SUM(CASE WHEN oks THEN 0 ELSE 1 END) AS BIGINT) FROM f
      |  UNION ALL SELECT 'text_nonempty',
      |    CAST(SUM(CASE WHEN okt THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(SUM(CASE WHEN okt THEN 0 ELSE 1 END) AS BIGINT) FROM f),
      |tot AS (
      |  SELECT '_total' AS rule,
      |    CAST(SUM(CASE WHEN okw AND oks AND okt THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_pass,
      |    CAST(SUM(CASE WHEN okw AND oks AND okt THEN 0 ELSE 1 END)
      |      AS BIGINT) AS n_fail
      |  FROM f),
      |combos AS (
      |  SELECT 'combo:' || array_to_string(list_filter([
      |      CASE WHEN NOT okw THEN 'western_lang' END,
      |      CASE WHEN NOT oks THEN 'short_text' END,
      |      CASE WHEN NOT okt THEN 'text_nonempty' END],
      |      x -> x IS NOT NULL), '+') AS rule,
      |    CAST(0 AS BIGINT) AS n_pass,
      |    CAST(COUNT(*) AS BIGINT) AS n_fail
      |  FROM f WHERE NOT (okw AND oks AND okt) GROUP BY 1)
      |SELECT rule, n_pass, n_fail,
      |  CAST(n_fail AS DOUBLE) / CAST(n_pass + n_fail AS DOUBLE)
      |    AS fail_rate
      |FROM rules
      |UNION ALL SELECT rule, n_pass, n_fail,
      |  CAST(n_fail AS DOUBLE) / CAST(n_pass + n_fail AS DOUBLE)
      |FROM tot
      |UNION ALL SELECT rule, n_pass, n_fail, CAST(NULL AS DOUBLE)
      |FROM combos""".stripMargin

  /** T39: k-anonymity audit + suppression ([[Privacy]]) — the
    * metadata-shape privacy floor over (lang, source, 100-char length
    * bucket) quasi-identifiers: the per-class audit, then the released
    * view under suppression re-aggregated per class so BOTH verbs are
    * hash-checked (a class leaking through suppression, a wrong bucket
    * width, or a flipped at-risk flag all go red). `phase` distinguishes
    * the audit rows from the released rows in one frame.
    */
  val t39KAnonymity: Q = (s, d) => {
    val docs = t(s, d, "documents")
      .withColumn("chars_bucket", Privacy.widthBucket(col("n_chars"), 100L))
    val quasi = Seq("lang", "source", "chars_bucket")
    val report = Privacy.kAnonymityReport(docs, quasi, k = 3L)
      .select(lit("audit").as("phase"), col("lang"), col("source"),
        col("chars_bucket"), col("group_size").as("n"), col("at_risk"))
    val released = Privacy.suppress(docs, quasi, k = 3L)
      .groupBy("lang", "source", "chars_bucket")
      .agg(count(lit(1)).as("n"))
      .select(lit("released").as("phase"), col("lang"), col("source"),
        col("chars_bucket"), col("n"), lit(false).as("at_risk"))
    report.unionByName(released)
  }
  val t39Oracle: String =
    """WITH q AS (
      |  SELECT lang, source,
      |    CAST(FLOOR(n_chars / 100) * 100 AS BIGINT) AS chars_bucket
      |  FROM documents),
      |g AS (
      |  SELECT lang, source, chars_bucket, COUNT(*) AS n
      |  FROM q GROUP BY 1, 2, 3)
      |SELECT 'audit' AS phase, lang, source, chars_bucket, n,
      |  (n < 3) AS at_risk
      |FROM g
      |UNION ALL
      |SELECT 'released', lang, source, chars_bucket, n, FALSE
      |FROM g WHERE n >= 3""".stripMargin

  /** T40: deterministic keyed pseudonymization
    * ([[Privacy.pseudonymize]]) — identities are masked with salted
    * sha2 token prefixes in BOTH tables, then the tables are joined ON
    * THE TOKENS: the aggregate matching the clear-key join is the proof
    * that masking preserves join/group semantics (the property that
    * makes pseudonymized corpora analyzable). Pure codegen scans, no
    * lookup table; the oracle recomputes every token with DuckDB's
    * sha256 from the same salt formula.
    */
  val t40Pseudonymize: Q = (s, d) => {
    val cust = t(s, d, "customer").select(
      Privacy.pseudonymize(col("c_custkey"), "k1").as("cust_token"),
      Privacy.pseudonymize(col("c_name"), "k1").as("name_token"),
      col("c_mktsegment"))
    val ords = t(s, d, "orders").select(
      Privacy.pseudonymize(col("o_custkey"), "k1").as("cust_token"),
      col("o_totalprice"))
    ords.join(cust, "cust_token")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(18,4)")), 2)
          .cast("double").as("sum_price"),
        countDistinct(col("name_token")).as("n_names"))
  }
  val t40Oracle: String =
    """WITH c AS (
      |  SELECT substr(sha256('k1:' || CAST(c_custkey AS VARCHAR)), 1, 16)
      |      AS cust_token,
      |    substr(sha256('k1:' || c_name), 1, 16) AS name_token,
      |    c_mktsegment
      |  FROM customer),
      |o AS (
      |  SELECT substr(sha256('k1:' || CAST(o_custkey AS VARCHAR)), 1, 16)
      |      AS cust_token,
      |    o_totalprice
      |  FROM orders)
      |SELECT c_mktsegment, COUNT(*) AS n,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
      |    AS sum_price,
      |  CAST(COUNT(DISTINCT name_token) AS BIGINT) AS n_names
      |FROM o JOIN c USING (cust_token)
      |GROUP BY c_mktsegment""".stripMargin

  // ===== entity resolution =============================================

  /** Shared dirty-records fixture for entity resolution: the customer
    * table plus deterministic single-edit variants — a deletion typo
    * (rid = key*10+1, every 5th customer) and a character smudge
    * (rid = key*10+2, every 7th) at key-derived digit positions, each
    * carrying a near-miss account balance. Pure integer/substr
    * arithmetic, identical text in both dialects.
    */
  private[graft] val erRecsSql =
    """SELECT c_custkey * 10 AS rid, c_name AS name,
      |       c_nationkey AS nation, c_acctbal AS acctbal,
      |       c_mktsegment AS segment
      |FROM customer
      |UNION ALL
      |SELECT c_custkey * 10 + 1,
      |       substr(c_name, 1, 9 + (c_custkey % 8)) ||
      |         substr(c_name, 11 + (c_custkey % 8), length(c_name)),
      |       c_nationkey, c_acctbal - 1.0, c_mktsegment
      |FROM customer WHERE c_custkey % 5 = 0
      |UNION ALL
      |SELECT c_custkey * 10 + 2,
      |       substr(c_name, 1, 9 + (c_custkey % 9)) || 'x' ||
      |         substr(c_name, 11 + (c_custkey % 9), length(c_name)),
      |       c_nationkey, c_acctbal + 2.0, c_mktsegment
      |FROM customer WHERE c_custkey % 7 = 0""".stripMargin

  private def erResolved(s: SparkSession, d: String) = {
    // cached: resolve reads the records THREE times (deletion keys +
    // both verify legs) and the golden-record pass re-reads the output;
    // without it the 3-way synthetic-variant UNION recomputes per leg
    val recs = Tables.sql(s, d, erRecsSql).cache()
    EntityResolution.resolve(recs,
      "rid", "name", Seq("nation"), delFrom = 10, delTo = 18,
      maxDist = 1,
      extraVerify = col("l.segment") === col("r.segment") &&
        abs(col("l.acctbal") - col("r.acctbal")) <= 2.5)
  }

  /** ER1: full record-linkage resolution ([[EntityResolution.resolve]])
    * — SymSpell deletion-neighborhood blocking (exact recall at edit
    * distance 1 by construction), levenshtein + multi-attribute verify,
    * min-label clustering. Oracle replays blocking, verification, and a
    * recursive-CTE component walk independently; every (record →
    * cluster) assignment is hash-matched.
    */
  val er1Resolve: Q = (s, d) =>
    erResolved(s, d).select(col("rid"), col("name"),
      col("nation").cast("bigint").as("nation"), col("cluster_id"))

  /** Shared DuckDB replay of the full ER chain, ending in `resolved`. */
  private val erOracleChain =
    s"""WITH RECURSIVE recs AS ($erRecsSql),
       |keys AS (
       |  SELECT rid, nation, CASE WHEN p = 9 THEN name
       |    ELSE substr(name, 1, p - 1) || substr(name, p + 1, length(name))
       |    END AS k
       |  FROM recs CROSS JOIN (
       |    SELECT unnest(generate_series(9, 18)) AS p) ps),
       |cand AS (
       |  SELECT DISTINCT a.rid AS ra, b.rid AS rb
       |  FROM keys a JOIN keys b
       |    ON a.nation = b.nation AND a.k = b.k AND a.rid < b.rid),
       |edges AS (
       |  SELECT ra, rb FROM cand
       |  JOIN recs x ON x.rid = cand.ra
       |  JOIN recs y ON y.rid = cand.rb
       |  WHERE levenshtein(x.name, y.name) <= 1
       |    AND x.segment = y.segment
       |    AND abs(x.acctbal - y.acctbal) <= 2.5),
       |sym AS (SELECT ra AS a, rb AS b FROM edges
       |        UNION SELECT rb, ra FROM edges),
       |walk AS (
       |  SELECT a AS id, a AS reach FROM (SELECT DISTINCT a FROM sym) n
       |  UNION
       |  SELECT w.id, sy.b FROM walk w JOIN sym sy ON sy.a = w.reach),
       |comp AS (SELECT id, MIN(reach) AS comp FROM walk GROUP BY id),
       |resolved AS (
       |  SELECT r.rid, r.name, r.nation, r.acctbal, r.segment,
       |    COALESCE(c.comp, r.rid) AS cluster_id
       |  FROM recs r LEFT JOIN comp c ON c.id = r.rid)""".stripMargin

  val er1Oracle: String =
    s"""$erOracleChain
       |SELECT rid, name, CAST(nation AS BIGINT) AS nation, cluster_id
       |FROM resolved""".stripMargin

  /** ER2: survivorship — one golden record per resolved cluster
    * ([[EntityResolution.goldenRecords]]): canonical id = min member,
    * canonical name = longest (min-id tiebreak), member count, max
    * balance. The oracle rebuilds the survivor via a window over the
    * replayed resolution.
    */
  val er2Golden: Q = (s, d) =>
    EntityResolution.goldenRecords(erResolved(s, d), "rid", "name",
      valueAggs = Seq(max(col("acctbal")).as("acctbal")))
  val er2Oracle: String =
    s"""$erOracleChain
       |SELECT cluster_id, CAST(crid AS BIGINT) AS canonical_rid,
       |  name AS canonical_name, CAST(nm AS BIGINT) AS n_members,
       |  bal AS acctbal
       |FROM (
       |  SELECT cluster_id, rid, name,
       |    ROW_NUMBER() OVER (PARTITION BY cluster_id
       |      ORDER BY length(name) DESC, rid) AS rnk,
       |    COUNT(*) OVER (PARTITION BY cluster_id) AS nm,
       |    MIN(rid) OVER (PARTITION BY cluster_id) AS crid,
       |    MAX(acctbal) OVER (PARTITION BY cluster_id) AS bal
       |  FROM resolved) z
       |WHERE rnk = 1""".stripMargin

  // ===== registry ======================================================

  val all: Map[String, Q] = Map(
    "q_er1_entity_resolution" -> er1Resolve,
    "q_er2_golden_records" -> er2Golden,
    "q_q1_expectations" -> q1Expectations,
    "q_t39_k_anonymity" -> t39KAnonymity,
    "q_t40_pseudonymize" -> t40Pseudonymize,
    "q_t41_stratified_quota" -> t41StratifiedQuota,
    "q_t43_diversity" -> t43Diversity,
    "q_t44_novelty" -> t44Novelty,
    "q_t45_conversation_qa" -> t45ConversationQa,
    "q_d1_fingerprint" -> d1Fingerprint,
    "q_d2_dedup_exact" -> d2DedupExact,
    "q_d3_jaccard_pairs" -> d3JaccardPairs,
    "q_d16_containment" -> d16Containment,
    "q_d17_corpus_overlap" -> d17CorpusOverlap,
    "q_d18_lsh_recall" -> d18LshRecall,
    "q_d4_minhash_neardup" -> d4MinhashNearDup,
    "q_d5_simhash_neardup" -> d5SimhashNearDup,
    "q_d14_ppjoin" -> d14PpjoinPairs,
    "q_d15_incremental_neardup" -> d15IncrementalNearDup,
    "q_st10_stream_dedup" -> st10StreamDedup,
    "q_st14_token_quota" -> st14TokenQuota,
    "q_st15_lag_features" -> st15LagFeatures,
    "q_st16_running_counts" -> st16RunningCounts,
    "q_t37_ccnet_buckets" -> t37CcnetBuckets,
    "q_s21_filtered_search" -> s21FilteredSearch,
    "q_m7_audio_fingerprint" -> m7AudioFingerprint,
    "q_d6_dedup_near" -> d6DedupNear,
    "q_d7_editdist" -> d7EditDist,
    "q_d8_winnow" -> d8Winnow,
    "q_d9_segment_dedup" -> d9SegmentDedup,
    "q_d10_substr_dedup" -> d10SubstrDedup,
    "q_d11_crossbatch_dedup" -> d11CrossBatch,
    "q_d12_substr_apply" -> d12SubstrApply,
    "q_t1_quality" -> t1Quality,
    "q_t2_langid" -> t2LangId,
    "q_t3_top_tokens" -> t3TopTokens,
    "q_t4_chunking" -> t4Chunk,
    "q_t5_tfidf" -> t5Tfidf,
    "q_t6_split" -> t6Split,
    "q_t7_sample" -> t7Sample,
    "q_t14_mixture" -> t14Mixture,
    "q_t15_interleave" -> t15Interleave,
    "q_x5_url" -> x5Url,
    "q_t8_bigrams" -> t8Bigrams,
    "q_t9_redact" -> t9Redact,
    "q_t10_pack" -> t10Pack,
    "q_t11_repetition" -> t11Repetition,
    "q_t12_token_accounting" -> t12TokenAccounting,
    "q_t13_decontaminate" -> t13Decontaminate,
    "q_t26_fuzzy_decontaminate" -> t26FuzzyDecontaminate,
    "q_t27_nfc" -> t27Nfc,
    "q_t28_bm25" -> t28Bm25,
    "q_r1_hybrid_rrf" -> r1HybridRrf,
    "q_s14_kmeans" -> s14Kmeans,
    "q_t29_html_extract" -> t29HtmlExtract,
    "q_t32_sentences" -> t32Sentences,
    "q_t33_pmi" -> t33Pmi,
    "q_t34_c4_clean" -> t34C4Clean,
    "q_t35_epoch_plan" -> t35EpochPlan,
    "q_t36_domain_blocklist" -> t36DomainBlocklist,
    "q_r2_mmr" -> r2Mmr,
    "q_d13_dedup_keepbest" -> d13KeepBest,
    "q_s15_hard_negatives" -> s15HardNegatives,
    "q_t30_luhn_pii" -> t30LuhnPii,
    "q_t31_weighted_sample" -> t31WeightedSample,
    "q_t38_global_index" -> t38GlobalIndex,
    "q_m6_phash_dedup" -> m6PhashDedup,
    "q_r3_phrase_search" -> r3PhraseSearch,
    "q_r4_retrieval_pipeline" -> r4RetrievalPipeline,
    "q_r5_rank_eval" -> r5RankEval,
    "q_s16_label_prototypes" -> s16LabelPrototypes,
    "q_s17_label_outliers" -> s17LabelOutliers,
    "q_x6_url_dedup" -> x6UrlDedup,
    "q_t16_cms_heavyhitters" -> t16CmsHeavyHitters,
    "q_t17_hll_distinct" -> t17HllDistinct,
    "q_t18_prep_pipeline" -> t18PrepPipeline,
    "q_t19_gopher_rules" -> t19GopherRules,
    "q_t20_lm_score" -> t20LmScore,
    "q_t21_temperature_mixture" -> t21TempMixture,
    "q_t22_bpe_stats" -> t22BpeStats,
    "q_t23_seq_packing" -> t23SeqPacking,
    "q_t24_quality_classifier" -> t24QualityClassifier,
    "q_t25_dsir_weights" -> t25DsirWeights,
    "q_m1_media_meta" -> m1MediaMeta,
    "q_m2_frames" -> m2Frames,
    "q_m3_resize_roundtrip" -> m3ResizeRoundtrip,
    "q_m4_audio_decode" -> m4AudioDecode,
    "q_m5_video_frames" -> m5VideoFrames,
    "q_s1_topk_bruteforce" -> s1TopKBruteForce,
    "q_s20_truncated_rerank" -> s20TruncatedRerank,
    "q_s22_random_projection" -> s22RandomProjection,
    "q_s23_binary_quant" -> s23BinaryQuant,
    "q_s24_embedding_diagnostics" -> s24EmbeddingDiagnostics,
    "q_s25_ivf_recall" -> s25IvfRecall,
    "q_s26_hnsw_recall" -> s26HnswRecall,
    "q_s2_cosine_pairs" -> s2CosinePairs,
    "q_s3_lsh_topk" -> s3LshTopK,
    "q_s4_ivf_topk" -> s4IvfTopK,
    "q_s5_cosine_neardup" -> s5CosineNearDup,
    "q_s6_ivf_indexed" -> s6IvfIndexed,
    "q_s18_ivf_append" -> s18IvfAppend,
    "q_s27_hnsw_append" -> s27HnswAppend,
    "q_s28_stream_ivf_ingest" -> s28StreamIvfIngest,
    "q_s29_stream_hnsw_ingest" -> s29StreamHnswIngest,
    "q_s30_versioned_ann" -> s30VersionedAnn,
    "q_s31_versioned_hnsw" -> s31VersionedHnsw,
    "q_s32_ivf_retrain" -> s32IvfRetrain,
    "q_s19_sq_topk" -> s19SqTopK,
    "q_s7_embed_dedup_manifest" -> s7EmbedDedupManifest,
    "q_s8_pq_codebook" -> s8PqCodebook,
    "q_s9_pq_codes" -> s9PqCodes,
    "q_s10_pq_topk" -> s10PqTopK,
    "q_s11_ivf_centroids" -> s11IvfCentroids,
    "q_s12_ivfpq_topk" -> s12IvfPqTopK,
    "q_s13_semantic_dedup" -> s13SemanticDedup,
    "q_st2_stream_neardup" -> st2StreamNearDup)

  val oracles: Map[String, String] = Map(
    "q_d1_fingerprint" -> d1Oracle,
    "q_d2_dedup_exact" -> d2Oracle,
    "q_d3_jaccard_pairs" -> d3Oracle,
    "q_d16_containment" -> d16Oracle,
    "q_d17_corpus_overlap" -> d17Oracle,
    "q_d18_lsh_recall" -> d18Oracle,
    "q_t1_quality" -> t1Oracle,
    "q_t2_langid" -> t2Oracle,
    "q_t3_top_tokens" -> t3Oracle,
    "q_t4_chunking" -> t4Oracle,
    "q_t5_tfidf" -> t5Oracle,
    "q_t6_split" -> t6Oracle,
    "q_er1_entity_resolution" -> er1Oracle,
    "q_er2_golden_records" -> er2Oracle,
    "q_q1_expectations" -> q1Oracle,
    "q_t39_k_anonymity" -> t39Oracle,
    "q_t40_pseudonymize" -> t40Oracle,
    "q_t41_stratified_quota" -> t41Oracle,
    "q_t43_diversity" -> t43Oracle,
    "q_t44_novelty" -> t44Oracle,
    "q_t45_conversation_qa" -> t45Oracle,
    "q_t7_sample" -> t7Oracle,
    "q_t14_mixture" -> t14Oracle,
    "q_t15_interleave" -> t15Oracle,
    "q_d7_editdist" -> d7Oracle,
    "q_d8_winnow" -> d8Oracle,
    "q_d9_segment_dedup" -> d9Oracle,
    "q_d10_substr_dedup" -> d10Oracle,
    "q_d11_crossbatch_dedup" -> d11Oracle,
    "q_d12_substr_apply" -> d12Oracle,
    "q_x5_url" -> x5Oracle,
    "q_t8_bigrams" -> t8Oracle,
    "q_t9_redact" -> t9Oracle,
    "q_t10_pack" -> t10Oracle,
    "q_t11_repetition" -> t11Oracle,
    "q_t12_token_accounting" -> t12Oracle,
    "q_t13_decontaminate" -> t13Oracle,
    "q_t26_fuzzy_decontaminate" -> t26Oracle,
    "q_t27_nfc" -> t27Oracle,
    "q_t28_bm25" -> t28Oracle,
    "q_r1_hybrid_rrf" -> r1Oracle,
    "q_s14_kmeans" -> s14Oracle,
    "q_t29_html_extract" -> t29Oracle,
    "q_t32_sentences" -> t32Oracle,
    "q_t33_pmi" -> t33Oracle,
    "q_t34_c4_clean" -> t34Oracle,
    "q_t35_epoch_plan" -> t35Oracle,
    "q_t36_domain_blocklist" -> t36Oracle,
    "q_r2_mmr" -> r2Oracle,
    "q_d13_dedup_keepbest" -> d13KeepBestOracle,
    "q_s15_hard_negatives" -> s15Oracle,
    "q_t30_luhn_pii" -> t30Oracle,
    "q_t31_weighted_sample" -> t31Oracle,
    "q_t38_global_index" -> t38Oracle,
    "q_m6_phash_dedup" -> m6Oracle,
    "q_r3_phrase_search" -> r3Oracle,
    "q_r4_retrieval_pipeline" -> r4Oracle,
    "q_r5_rank_eval" -> r5Oracle,
    "q_s16_label_prototypes" -> s16Oracle,
    "q_s17_label_outliers" -> s17Oracle,
    "q_x6_url_dedup" -> x6Oracle,
    "q_t16_cms_heavyhitters" -> t16Oracle,
    "q_t17_hll_distinct" -> t17Oracle,
    "q_t18_prep_pipeline" -> t18Oracle,
    "q_t19_gopher_rules" -> t19Oracle,
    "q_t20_lm_score" -> t20Oracle,
    "q_t21_temperature_mixture" -> t21Oracle,
    "q_t22_bpe_stats" -> t22Oracle,
    "q_t23_seq_packing" -> t23Oracle,
    "q_t24_quality_classifier" -> t24Oracle,
    "q_t25_dsir_weights" -> t25Oracle,
    "q_m1_media_meta" -> m1Oracle,
    "q_m2_frames" -> m2Oracle,
    "q_m3_resize_roundtrip" -> m3Oracle,
    "q_m4_audio_decode" -> m4Oracle,
    "q_m5_video_frames" -> m5Oracle,
    "q_s1_topk_bruteforce" -> s1Oracle,
    "q_s20_truncated_rerank" -> s20Oracle,
    "q_s22_random_projection" -> s22Oracle,
    "q_s23_binary_quant" -> s23Oracle,
    "q_s24_embedding_diagnostics" -> s24Oracle,
    "q_s25_ivf_recall" -> s25Oracle,
    "q_s26_hnsw_recall" -> s26Oracle,
    "q_s2_cosine_pairs" -> s2Oracle,
    "q_d4_minhash_neardup" -> d4Oracle,
    "q_d5_simhash_neardup" -> d5Oracle,
    "q_d14_ppjoin" -> d14Oracle,
    "q_d15_incremental_neardup" -> d15Oracle,
    "q_st10_stream_dedup" -> st10Oracle,
    "q_st14_token_quota" -> st14Oracle,
    "q_st15_lag_features" -> st15Oracle,
    "q_st16_running_counts" -> st16Oracle,
    "q_t37_ccnet_buckets" -> t37Oracle,
    "q_s21_filtered_search" -> s21Oracle,
    "q_m7_audio_fingerprint" -> m7Oracle,
    "q_d6_dedup_near" -> d6Oracle,
    "q_s3_lsh_topk" -> s3Oracle,
    "q_s4_ivf_topk" -> s4Oracle,
    "q_s5_cosine_neardup" -> s5Oracle,
    "q_s6_ivf_indexed" -> s6Oracle,
    "q_s18_ivf_append" -> s18Oracle,
    "q_s27_hnsw_append" -> s27Oracle,
    "q_s28_stream_ivf_ingest" -> s28Oracle,
    "q_s29_stream_hnsw_ingest" -> s29Oracle,
    "q_s30_versioned_ann" -> s30Oracle,
    "q_s31_versioned_hnsw" -> s31Oracle,
    "q_s32_ivf_retrain" -> s32Oracle,
    "q_s19_sq_topk" -> s19Oracle,
    "q_s7_embed_dedup_manifest" -> s7Oracle,
    "q_s8_pq_codebook" -> s8Oracle,
    "q_s9_pq_codes" -> s9Oracle,
    "q_s10_pq_topk" -> s10Oracle,
    "q_s11_ivf_centroids" -> s11Oracle,
    "q_s12_ivfpq_topk" -> s12Oracle,
    "q_s13_semantic_dedup" -> s13Oracle,
    "q_st2_stream_neardup" -> st2Oracle)
}
