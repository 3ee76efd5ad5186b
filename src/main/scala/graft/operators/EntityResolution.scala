package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage) over structured records: the
  * "same real-world entity, different rows" half of dedup that document
  * fingerprinting ([[Dedup]]) does not cover. The reference exposes only
  * exact-key joins over scanned resources (internal/query SQL surface);
  * resolving near-identical records — typo'd names, re-registered
  * accounts — needs a blocking + verify + cluster pipeline, the classic
  * Fellegi–Sunter shape:
  *
  *  1. '''Blocking''' — SymSpell-style deletion-neighborhood keys: each
  *     record emits its name plus every string obtainable by deleting one
  *     character in a bounded position range. Two names within edit
  *     distance 1 (any single insert / delete / substitute inside the
  *     range) are GUARANTEED to share a key, so recall at the verify
  *     threshold is exact — unlike prefix or sorted-neighborhood
  *     blocking, which both collapse on low-entropy prefixes. Cost is a
  *     constant ≤ (range+1) key rows per record: at 100 TB the keyed
  *     frame is thin (id, block, key), the self-join shuffles on
  *     (block, key), and the quadratic blow-up is confined to records
  *     sharing a key — never all pairs.
  *  2. '''Verify''' — exact `levenshtein` plus caller-supplied
  *     multi-attribute agreement (segment equality, balance tolerance …)
  *     on the candidate pairs only. Attribute agreement is what keeps
  *     genuinely ambiguous single-edit neighbors (…007 vs …017 via a
  *     smudged digit) from chaining into one cluster.
  *  3. '''Cluster''' — surviving pairs are edges;
  *     [[Graph.connectedComponents]] assigns cluster = min member id.
  *  4. '''Survivorship''' — [[goldenRecords]] folds each cluster to one
  *     canonical row (longest name, min-id tiebreak).
  *
  * All stages are codegen'd builtins — no UDFs, no driver loops; the
  * only driver state is CC's gated contracted endgame.
  */
object EntityResolution {

  /** Deletion-neighborhood blocking keys for `nameCol` over 1-based
    * character positions [delFrom, delTo], plus the identity key (the
    * name itself). Emits (idCol, blockCols…, _k): ≤ delTo-delFrom+2 thin
    * rows per record. Any two names equal after at most one character
    * deletion each *inside the range* — which covers every single-edit
    * pair (delete, insert, substitute at positions delFrom..delTo) —
    * share at least one (blockCols, _k) key.
    */
  def deletionKeys(df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], delFrom: Int, delTo: Int): DataFrame = {
    require(delFrom >= 1 && delTo >= delFrom,
      s"bad deletion range [$delFrom,$delTo]")
    val nm = col(nameCol)
    // Sentinel position delFrom-1 = "no deletion" (the identity key).
    val withP = df
      .select((col(idCol).as("_rid") +: nm.as("_nm") +: blockCols.map(col)): _*)
      .withColumn("_p", explode(sequence(lit(delFrom - 1), lit(delTo))))
    withP.withColumn("_k",
        when(col("_p") === lit(delFrom - 1), col("_nm"))
          .otherwise(concat(
            col("_nm").substr(lit(1), col("_p") - 1),
            col("_nm").substr(col("_p") + 1, length(col("_nm"))))))
      .select((col("_rid") +: col("_k") +: blockCols.map(col)): _*)
  }

  /** Distinct candidate pairs (ra < rb) sharing any (blockCols, key):
    * one shuffle on the composite blocking key, then a pair-level
    * distinct. Requires a numeric id (the `<` ordering and downstream
    * min-label clustering rely on it).
    *
    * Fan-out control, cheap-to-expensive:
    *
    *  - (rid, key) rows are DEDUPED before the self-join. Deleting
    *    different characters of a run (the zeros of `Customer#000000012`)
    *    yields the same key, so a record can emit one key many times —
    *    and k copies on both sides turn one logical pair into k² joined
    *    rows that the pair-level distinct then collapses. The dedupe is
    *    exactness-preserving (the pigeonhole guarantee needs each key
    *    once) and shrinks the hot groups quadratically.
    *  - `maxKeyGroup` (default unlimited) is the SymSpell hot-key
    *    frequency cutoff: a blocking key shared by more than this many
    *    records is dropped ENTIRELY before pairing. This is a RECALL
    *    trade — a pair whose only shared key is dropped is lost — for a
    *    hard cap on the per-key quadratic term; production corpora with
    *    adversarial low-entropy names (empty strings, "test", …) need it,
    *    exact-recall runs leave it off. The frequency count is one thin
    *    partial-agg over (key) — no extra pass when unlimited.
    */
  def candidatePairs(df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], delFrom: Int, delTo: Int,
      maxKeyGroup: Int = Int.MaxValue): DataFrame = {
    require(df.schema(idCol).dataType.isInstanceOf[
        org.apache.spark.sql.types.NumericType],
      s"$idCol must be numeric for ordered pairing")
    require(maxKeyGroup >= 2, s"maxKeyGroup must be >= 2, got $maxKeyGroup")
    val keyed0 = deletionKeys(df, idCol, nameCol, blockCols, delFrom, delTo)
      .withColumn("_bk",
        concat_ws("\u0001", (col("_k") +: blockCols.map(c =>
          col(c).cast("string"))): _*))
      .select("_rid", "_bk").distinct()
    val keyed =
      if (maxKeyGroup == Int.MaxValue) keyed0
      else {
        val hot = keyed0.groupBy("_bk").count()
          .where(col("count") > maxKeyGroup).select("_bk")
        keyed0.join(broadcast(hot), Seq("_bk"), "left_anti")
      }
    val a = keyed.select(col("_rid").as("ra"), col("_bk"))
    val b = keyed.select(col("_rid").as("rb"), col("_bk"))
    a.join(b, "_bk").where(col("ra") < col("rb"))
      .select("ra", "rb").distinct()
  }

  /** Full resolution: blocking → levenshtein(≤ maxDist) + `extraVerify`
    * on candidate pairs → connected components. Returns the input plus
    * `cluster_id` (min id of the resolved cluster; singletons keep their
    * own id). `extraVerify` sees the pair's two sides under dataset
    * aliases `l` / `r` (e.g. `col("l.segment") === col("r.segment")`).
    */
  def resolve(records: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], delFrom: Int, delTo: Int,
      maxDist: Int = 1, extraVerify: Column = lit(true),
      maxKeyGroup: Int = Int.MaxValue): DataFrame = {
    val cand = candidatePairs(records, idCol, nameCol, blockCols,
      delFrom, delTo, maxKeyGroup)
    val l = records.as("l")
    val r = records.as("r")
    // Verify = cheap-to-expensive conjunction, all inside one codegen
    // predicate: the length-difference guard (|len(a)−len(b)| > maxDist
    // ⇒ distance must exceed maxDist — pure integer arithmetic) prunes
    // before any DP runs, and the surviving pairs use the THRESHOLDED
    // levenshtein, whose banded O(n·maxDist) DP early-exits at the bound
    // (returns -1 above it) instead of filling the full O(n·m) matrix.
    val edges = cand
      .join(l, col("ra") === col(s"l.$idCol"))
      .join(r, col("rb") === col(s"r.$idCol"))
      .where(
        abs(length(col(s"l.$nameCol")) - length(col(s"r.$nameCol")))
          <= lit(maxDist) &&
        levenshtein(col(s"l.$nameCol"), col(s"r.$nameCol"), maxDist) >= 0 &&
        extraVerify)
      .select(col("ra").as("from_id"), col("rb").as("to_id"))
    val cc = Graph.connectedComponents(edges)
      .select(col("id").as("_ccid"), col("comp"))
    records.join(cc, col(idCol) === col("_ccid"), "left")
      .withColumn("cluster_id", coalesce(col("comp"), col(idCol)))
      .drop("_ccid", "comp")
  }

  /** Survivorship: one golden row per cluster — canonical id = min id,
    * canonical name = longest name (min-id tiebreak), member count, plus
    * caller aggregates (`max(col("acctbal")).as("acctbal")` …). One
    * partial-agg shuffle on cluster_id; the name survivor rides a single
    * `max(struct(len, -id, name))` so no window pass is needed.
    */
  def goldenRecords(resolved: DataFrame, idCol: String, nameCol: String,
      clusterCol: String = "cluster_id",
      valueAggs: Seq[Column] = Seq.empty): DataFrame = {
    require(resolved.schema(idCol).dataType.isInstanceOf[
        org.apache.spark.sql.types.NumericType],
      s"$idCol must be numeric for the min-id survivorship tiebreak")
    val survivor = max(struct(
      length(col(nameCol)).cast("long").as("l"),
      (-col(idCol)).as("ni"),
      col(nameCol).as("nm")))
    val aggs = Seq(
      min(col(idCol)).as(s"canonical_${idCol}"),
      survivor.getField("nm").as(s"canonical_${nameCol}"),
      count(lit(1)).as("n_members")) ++ valueAggs
    resolved.groupBy(col(clusterCol)).agg(aggs.head, aggs.tail: _*)
  }
}
