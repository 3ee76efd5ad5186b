package graft.operators

import graft.Barrier.BarrierOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines over `documents`:
  * exact (hash-groupBy), MinHash+LSH, SimHash, and n-gram Jaccard
  * verification. Designed for the 100 TB path:
  *  - exact dedup is a single hash aggregation (map-side partial combine);
  *  - MinHash/LSH never compares all pairs — candidate pairs come from a
  *    band-bucket self-join, so the shuffle is on (band, bucket-hash) keys
  *    and the quadratic blow-up is confined to same-bucket groups;
  *  - Jaccard verification runs only on candidate pairs.
  * Everything is built from codegen'd builtins + higher-order functions —
  * no Scala UDFs, no driver-side loops.
  */
object Dedup {

  /** Exact duplicate groups by normalized-text hash: one row per group with
    * >1 member, keeper = min(id). Single shuffle on the 128-bit hash.
    */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("group_size"), min("id").as("keep_id"),
        array_sort(collect_list("id")).as("member_ids"))
      .filter(col("group_size") > 1)

  /** Exact dedup: keep the min-id row per normalized-text group.
    * Implemented as a min-id aggregation + semi join back (two shuffles on
    * narrow keys) rather than a wide window — at 100 TB the agg side only
    * carries (fp, id).
    */
  def dedupExact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = df
      .select(col(idCol).as("kid"), TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp").agg(min("kid").as("kid"))
    df.join(keep, df(idCol) === keep("kid"), "left_semi")
  }

  /** Exact dedup keeping the BEST row per group instead of the min-id
    * one: keeper = argmax of `quality` with min-id tie-break — the rule a
    * curation pipeline actually wants (of N copies, keep the longest /
    * highest-scoring capture, not whichever crawled first). Deterministic
    * via one `max(struct(quality, -id, id))` aggregate (struct ordering
    * compares fields left to right, so equal quality falls through to the
    * smallest id) — same two-narrow-shuffles shape as [[dedupExact]];
    * the quality column adds one value per row to the agg side.
    *
    * Returns the kept rows with their `group_size` appended.
    */
  def dedupExactKeepBest(df: DataFrame, idCol: String, textCol: String,
      quality: Column): DataFrame = {
    // The min-id tie-break rides on unary negation inside the max-struct;
    // a non-numeric id would silently cast (null/double) and make the
    // keeper nondeterministic instead of failing loudly — reject it here.
    require(df.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"dedupExactKeepBest needs a numeric id column for its min-id " +
        s"tie-break; '$idCol' is ${df.schema(idCol).dataType.simpleString} " +
        "(use dedupExact, or map the id to a numeric surrogate first)")
    val keep = df
      .select(col(idCol).as("kid"), quality.as("q"),
        TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("group_size"),
        max(struct(col("q"), (-col("kid")).as("ni"), col("kid").as("k")))
          .as("m"))
      .select(col("group_size"), col("m.k").as("kid"))
    df.join(keep, df(idCol) === keep("kid"), "inner").drop("kid")
  }

  /** Word w-shingles of the normalized text (distinct, the MinHash input
    * universe). HOT-PATH WARNING: HOF lambdas re-evaluate referenced
    * subtrees per element, so used directly on a raw text column this
    * re-runs normalize+split once PER SHINGLE (O(len²) per doc — the
    * measured 64× class from [[shingleFrame]]'s scaladoc). Operators
    * that scan a corpus must tokenize behind a materialization barrier
    * first ([[tokenFrame]]) and call [[shinglesFromTokens]].
    */
  def shingles(text: Column, w: Int = 3): Column =
    shinglesFromTokens(split(TextAnalysis.normalize(text), " "), w)

  /** String w-shingles from an already-materialized token array
    * attribute (the string twin of [[hashedShinglesFromTokens]] — kept
    * as strings where a DuckDB oracle must replay the gram text).
    */
  def shinglesFromTokens(toks: Column, w: Int): Column =
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(size(toks) - w, lit(0))),
          i => when(i + w <= size(toks),
            concat_ws(" ", slice(toks, i + 1, lit(w))))),
        s => s.isNotNull))

  /** Materialized (carried cols, toks) token frame — the barrier that
    * keeps shingle HOF lambdas from re-running normalize+split per
    * element (CollapseProject would inline the split subtree straight
    * back into the lambda; the localCheckpoint truncates the lineage so
    * the lambda sees an in-memory array attribute). Spread across all
    * cores first for the same reason as [[shingleFrame]].
    */
  private[operators] def tokenFrame(df: DataFrame, carry: Seq[(String, String)],
      textCol: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(carry.map { case (c, as) => col(c).as(as) } :+
        split(TextAnalysis.normalize(col(textCol)), " ").as("toks"): _*)
      .barrier(true)

  /** Hashed shingles: sorted distinct xxhash64 of each w-shingle. Longs
    * are far cheaper than strings in the pairwise loops, and sorting lets
    * the Jaccard intersection run as a codegen'd merge
    * (graft.functions.SortedLongIntersectCount). Hash collisions would
    * need ~2^32 shingles per doc to matter.
    */
  def hashedShingles(text: Column, w: Int = 3): Column =
    array_sort(array_distinct(transform(shingles(text, w), s => xxhash64(s))))

  /** Materialized (id, sh) shingle frame. The barrier is load-bearing:
    * HOF lambdas re-evaluate their argument subtree per outer element, so
    * an inlined shingles expression would recompute once per minhash seed
    * (measured 64x slowdown). At cluster scale this is a persisted
    * signature table.
    */
  private[graft] def shingleFrame(df: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    graft.functions.VecExprs.register(df.sparkSession)
    // Two stages: the shingle lambda indexes into the token array (HOF
    // lambdas re-evaluate referenced subtrees per element), and the input
    // is spread across all cores first — a single small parquet file would
    // otherwise pin the whole CPU-bound shingle pass to one task.
    val toks = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"),
        split(TextAnalysis.normalize(col(textCol)), " ").as("toks"))
      .barrier(true)
    val sh = toks
      .select(col("id"), hashedShinglesFromTokens(col("toks"), w).as("sh"))
      .barrier(true)
    // sh is materialized with its own blocks — the token barrier is dead.
    toks.unpersist(blocking = false)
    sh
  }

  /** Hashed shingles from an already-materialized token array attribute. */
  def hashedShinglesFromTokens(toks: Column, w: Int): Column = {
    val sh = array_distinct(
      filter(
        transform(sequence(lit(0), greatest(size(toks) - w, lit(0))),
          i => when(i + w <= size(toks),
            concat_ws(" ", slice(toks, i + 1, lit(w))))),
        s => s.isNotNull))
    array_sort(array_distinct(transform(sh, s => xxhash64(s))))
  }

  /** Exact Jaccard over two sorted distinct long arrays — codegen merge. */
  def jaccardFast(a: Column, b: Column): Column = {
    val inter = call_function("arr_inter", a, b).cast("double")
    val uni = (size(a) + size(b)).cast("double") - inter
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** MinHash signature: k permutation-free min-hashes, h_i(s) =
    * xxhash64(s, seed=i) — a codegen'd k×n loop
    * (graft.functions.MinHashSigExpr; bit-compatible with the
    * transform/array_min HOF formulation it replaced). Per-row, no
    * explode, no shuffle. Requires VecExprs.register on the session.
    */
  def minhashSignature(shingleArr: Column, k: Int = 64): Column =
    call_function("minhash_sig", shingleArr, lit(k))

  /** The interpreted HOF twin of [[minhashSignature]], kept as the parity
    * reference for DedupSpec (must stay bit-identical).
    */
  private[graft] def minhashSignatureHof(shingleArr: Column, k: Int = 64): Column =
    transform(sequence(lit(0), lit(k - 1)),
      seed => array_min(transform(shingleArr, s => xxhash64(s, seed))))

  /** LSH parameter planner — the standard S-curve solve: with `bands`
    * bands of `rows` rows over a k = bands·rows MinHash signature, a
    * pair of Jaccard similarity s collides in ≥1 band with probability
    * p(s) = 1 − (1 − s^rows)^bands. Given a signature budget k and a
    * similarity threshold, pick the (bands, rows) factorization whose
    * S-curve midpoint (the similarity where p = 1/2, ≈ (1/bands)^(1/rows))
    * sits closest under the threshold — maximizing precision while
    * keeping recall at the threshold above ~1 − (1−1/2)… callers wanting
    * a recall floor use [[lshCollisionProb]] directly to check
    * p(threshold) against their target and widen `k` if it falls short.
    * Driver-side integer/double math over the divisors of k — nothing
    * distributed; the S-curve shape is from Leskovec/Rajaraman/Ullman,
    * Mining of Massive Datasets §3.4.
    */
  def lshCollisionProb(s: Double, bands: Int, rows: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, rows), bands)

  def lshPlan(k: Int, threshold: Double): (Int, Int) = {
    require(k > 0 && threshold > 0 && threshold < 1,
      s"need k > 0 and 0 < threshold < 1, got k=$k threshold=$threshold")
    val options = (1 to k).filter(k % _ == 0).map(b => (b, k / b))
    // S-curve midpoint for (b, r): similarity where collision prob = 1/2
    def midpoint(b: Int, r: Int): Double =
      math.pow(1.0 - math.pow(0.5, 1.0 / b), 1.0 / r)
    // closest midpoint at-or-below the threshold → candidates start
    // ramping just under it (high recall at s ≥ threshold, low waste
    // below); if every factorization's midpoint is above the threshold
    // (tiny k, low threshold), take the lowest midpoint available.
    val below = options.filter { case (b, r) => midpoint(b, r) <= threshold }
    val pick = if (below.nonEmpty) below.maxBy { case (b, r) => midpoint(b, r) }
               else options.minBy { case (b, r) => midpoint(b, r) }
    pick
  }

  /** LSH banding: split the k-length signature into `bands` bands of
    * k/bands rows each; each band hashes to a bucket.
    * Returns array of (band, bucket) structs.
    */
  def lshBands(sig: Column, k: Int = 64, bands: Int = 16): Column = {
    val r = k / bands
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(concat_ws(",", slice(sig, b * r + 1, lit(r)))).as("bucket")))
  }

  /** Candidate pairs from LSH: docs sharing any (band, bucket). The
    * self-join is on the band/bucket key — only same-bucket groups pair up.
    * Pairs are deduped (a<b) across bands.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      k: Int = 64, bands: Int = 16, shingleW: Int = 3): DataFrame =
    candidatesFromShingles(shingleFrame(df, idCol, textCol, shingleW), k, bands)

  private def candidatesFromShingles(sh: DataFrame, k: Int,
      bands: Int): DataFrame = {
    // Barrier again: the signature must not be re-inlined per band.
    val sig = sh.select(col("id"), minhashSignature(col("sh"), k).as("sig"))
      .barrier(true)
    val banded = sig.select(col("id"), col("sig"),
        explode(lshBands(col("sig"), k, bands)).as("bb"))
      .select(col("id"), col("sig"), col("bb.band"), col("bb.bucket"))
    val a = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        // estimated Jaccard from signature agreement
        (size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), c => c))
          .cast("double") / k).as("est_jaccard"))
      .dropDuplicates("id_a", "id_b")
  }

  /** MinHash+LSH near-dup pairs: candidates whose *exact* n-gram Jaccard
    * (verified on the candidate set only) clears `threshold`.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, k: Int = 64, bands: Int = 16,
      shingleW: Int = 3): DataFrame = {
    val shf = shingleFrame(df, idCol, textCol, shingleW)
    val cands = candidatesFromShingles(shf, k, bands)
    cands
      .join(shf.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(shf.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", round(jaccardFast(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard", "jaccard")
  }

  /** Exact Jaccard over two string arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** Pairwise n-gram Jaccard within a blocking key (e.g. same source) —
    * the non-LSH variant for small blocks; the join is per-block so the
    * quadratic cost is bounded by block size.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, w: Int = 3, threshold: Double = 0.5): DataFrame = {
    graft.functions.VecExprs.register(df.sparkSession)
    // Same two-stage tokenize-then-shingle as shingleFrame (lambdas must
    // index a materialized token attribute, not the normalize subtree).
    val toks = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(blockCol).as("blk"), col(idCol).as("id"),
        split(TextAnalysis.normalize(col(textCol)), " ").as("toks"))
      .barrier(true)
    val sh = toks
      .select(col("blk"), col("id"),
        hashedShinglesFromTokens(col("toks"), w).as("sh"))
      .barrier(true) // compute shingles once, not per join side
    toks.unpersist(blocking = false) // shingles materialized; tokens dead
    val a = sh.select(col("blk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("blk"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", round(jaccardFast(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("blk"), col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Asymmetric containment pairs — the quote/subset detector Jaccard
    * structurally misses: a document fully quoted inside a 2× larger one
    * has containment 1.0 but Jaccard ≈ 0.5, so symmetric near-dup at any
    * sane threshold keeps both copies. Same blocked shingle self-join
    * shape as [[ngramJaccardPairs]] (one codegen sorted-merge intersect
    * per candidate pair); emits BOTH directions (`cont_ab` = |A∩B|/|A|,
    * how much of A lives inside B; `cont_ba` likewise) and keeps pairs
    * where either crosses the threshold.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, w: Int = 3, threshold: Double = 0.9): DataFrame = {
    graft.functions.VecExprs.register(df.sparkSession)
    val toks = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(blockCol).as("blk"), col(idCol).as("id"),
        split(TextAnalysis.normalize(col(textCol)), " ").as("toks"))
      .barrier(true)
    val sh = toks
      .select(col("blk"), col("id"),
        hashedShinglesFromTokens(col("toks"), w).as("sh"))
      .barrier(true)
    toks.unpersist(blocking = false)
    val a = sh.select(col("blk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("blk"), col("id").as("id_b"), col("sh").as("sh_b"))
    val inter = call_function("arr_inter", col("sh_a"), col("sh_b"))
      .cast("double")
    def cont(denom: Column) =
      round(when(size(denom) === 0, 0.0)
        .otherwise(inter / size(denom).cast("double")), 6)
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cont_ab", cont(col("sh_a")))
      .withColumn("cont_ba", cont(col("sh_b")))
      .filter(greatest(col("cont_ab"), col("cont_ba")) >= threshold)
      .select(col("blk"), col("id_a"), col("id_b"),
        col("cont_ab"), col("cont_ba"))
  }

  /** Exact global set-similarity self-join via prefix filtering — the
    * PPJoin/SSJoin family (Chaudhuri et al. ICDE'06; Xiao et al. WWW'08)
    * in the distributed formulation of Vernica et al. (SIGMOD'10,
    * "Efficient parallel set-similarity joins using MapReduce"). Unlike
    * [[ngramJaccardPairs]] (all pairs inside a caller-chosen block) this
    * needs NO blocking key and is still provably COMPLETE: under any
    * global total order over tokens, two sets with Jaccard ≥ t must
    * share at least one token among each side's first
    * `n − ceil(t·n) + 1` tokens (the Jaccard prefix), so joining on
    * prefix tokens only cannot lose a qualifying pair. Tokens are
    * ordered by ascending document frequency (rarest first — the
    * published candidate-minimizing order), with the token value as the
    * tie-break; the df order also bounds skew, since a token's join
    * fan-out is its prefix df, and frequent tokens land DEEP in every
    * prefix (usually past it).
    *
    * 100 TB shape: one explode+groupBy for df, one per-doc ranking
    * window (partition = one document's shingle set, O(doc) state), a
    * prefix-token equi-join whose shuffle carries only (token, id, n) —
    * never the shingle arrays — a distinct on candidate pairs, then two
    * id-keyed joins fetch the sorted signature arrays for the exact
    * codegen'd Jaccard verify ([[jaccardFast]]). The length filter
    * (t·max(n_a,n_b) ≤ min(n_a,n_b), a Jaccard necessity) prunes
    * candidates before the distinct. Reference semantics:
    * near-duplicate detection per `dedup.rs` analogs in the reference's
    * pipeline surface; algorithm entirely from the public literature.
    */
  def ppjoinPairs(df: DataFrame, idCol: String, textCol: String,
      w: Int = 3, threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0,1], got $threshold")
    val sh = shingleFrame(df, idCol, textCol, w) // (id, sh: sorted longs)
    val sizes = sh.select(col("id"), size(col("sh")).as("n"))
    val ex = sh.select(col("id"), explode(col("sh")).as("tok"))
    val dfreq = ex.groupBy("tok").agg(count(lit(1)).as("df"))
    val pref = ex.join(dfreq, "tok")
      .withColumn("rn", row_number().over(
        Window.partitionBy("id").orderBy(col("df"), col("tok"))))
      .join(sizes, "id")
      // Jaccard prefix length: n − ceil(t·n) + 1 (Xiao et al., Table 1)
      .filter(col("rn") <=
        col("n") - ceil(col("n") * lit(threshold)).cast("int") + 1)
      .select(col("tok"), col("id"), col("n"))
    val cand = pref.select(col("tok"), col("id").as("id_a"), col("n").as("n_a"))
      .join(pref.select(col("tok"), col("id").as("id_b"), col("n").as("n_b")),
        "tok")
      .filter(col("id_a") < col("id_b")
        && col("n_a") * lit(threshold) <= col("n_b")
        && col("n_b") * lit(threshold) <= col("n_a"))
      .select("id_a", "id_b").distinct()
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", round(jaccardFast(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over tokens: per-bit majority vote of token-hash bits
    * — a codegen'd one-pass loop (graft.functions.SimHash64Expr;
    * bit-compatible with the aggregate/zip_with HOF formulation it
    * replaced, which re-hashed every token once per bit). Per-row, no
    * shuffle. Requires VecExprs.register (callers below do it).
    */
  def simhash64(text: Column): Column =
    call_function("simhash64",
      array_distinct(split(TextAnalysis.normalize(text), " ")))

  /** The interpreted HOF twin of [[simhash64]], kept as the parity
    * reference for DedupSpec (must stay bit-identical).
    */
  private[graft] def simhash64Hof(text: Column): Column = {
    val toks = array_distinct(split(TextAnalysis.normalize(text), " "))
    val counts = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (c, bit) => c + when(call_function("shiftright", h, bit)
            .bitwiseAND(1) === 1, 1).otherwise(-1))
      })
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)),
        (c, bit) => when(c > 0, call_function("shiftleft", lit(1L), bit))
          .otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Cluster near-dup pairs into duplicate groups: connected components
    * over the pair graph, component = min member id ("canonical" doc).
    */
  def dupClusters(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 20): DataFrame =
    Graph.connectedComponents(
      pairs.select(col(idA).as("from_id"), col(idB).as("to_id")), maxIter)
      .withColumnRenamed("comp", "cluster_id")

  /** End-to-end near-dedup: MinHash+LSH pairs → connected-component
    * clusters → keep the min-id doc per cluster plus every unpaired doc.
    * The full training-data dedup pipeline in one call; every stage is a
    * join/agg over narrow keys (id, cluster_id), so the wide text column
    * is only touched by the shingle scan.
    */
  def dedupNear(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8): DataFrame = {
    val pairs = minhashNearDups(df, idCol, textCol, threshold)
    val clusters = dupClusters(pairs)
    val drop = clusters
      .filter(col("id") =!= col("cluster_id")) // non-canonical members
      .select(col("id").as("drop_id"))
    df.join(drop, df(idCol) === drop("drop_id"), "left_anti")
  }

  /** Near-dedup MANIFEST: one row for EVERY input doc — the keep/drop
    * decision plus its direct evidence. This is both what a production
    * pipeline audits (why was this doc dropped?) and what makes
    * completeness externally checkable: a verifier can demand full
    * corpus coverage (any deleted row breaks the doc_id bijection) and
    * recompute each eliminated row's witness similarity exactly, without
    * ever rebuilding the hash-specific candidate graph.
    *
    * Columns: `id`; `keeper_id` — the min id of the doc's near-dup
    * cluster (its own id when unpaired); `is_survivor` —
    * `keeper_id == id`; `witness_id` — the smallest DIRECT near-dup
    * partner from the verified pair set (NULL when unpaired);
    * `witness_jaccard` — the exact n-gram Jaccard to that witness
    * (≥ threshold by construction).
    *
    * Scale shape: identical to [[dedupNear]] plus two narrow joins on
    * `id` — the manifest adds no stage touching text.
    */
  def dedupNearManifest(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8): DataFrame = {
    // Eager checkpoint: the CC gate job and the witness aggregation both
    // consume the pair set — without a barrier each recomputes the full
    // shingle/minhash/verify pass. Thresholded pairs are tiny vs the
    // corpus, so the checkpoint is cheap and stays distributed.
    val pairs = minhashNearDups(df, idCol, textCol, threshold)
      .barrier(true)
    val clusters = dupClusters(pairs)
    // Smallest direct partner rides as a struct min (lexicographic on
    // (w, jaccard); w is unique per id so the pick is deterministic).
    val wit = pairs
      .select(col("id_a").as("id"),
        struct(col("id_b").as("w"), col("jaccard")).as("wj"))
      .unionByName(pairs.select(col("id_b").as("id"),
        struct(col("id_a").as("w"), col("jaccard")).as("wj")))
      .groupBy("id").agg(min("wj").as("wj"))
    df.select(col(idCol).as("id"))
      .join(clusters.select(col("id"), col("cluster_id")), Seq("id"), "left")
      .join(wit, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("cluster_id"), col("id")).as("keeper_id"),
        (coalesce(col("cluster_id"), col("id")) === col("id")).as("is_survivor"),
        col("wj.w").as("witness_id"),
        col("wj.jaccard").as("witness_jaccard"))
  }

  /** Hamming distance between two 64-bit simhashes (popcount via bit_count). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on the 4 16-bit quarters of the hash
    * (any pair within Hamming distance 3 shares at least one exact quarter
    * — pigeonhole), verify with full Hamming distance.
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    graft.functions.VecExprs.register(df.sparkSession)
    // spread the CPU-bound hash pass across cores (small single-file
    // inputs arrive as one partition)
    val hashed = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"), simhash64(col(textCol)).as("sh"))
      .barrier(true) // barrier: simhash64 is a wide HOF expression
    val blocked = hashed.select(col("id"), col("sh"),
        explode(transform(sequence(lit(0), lit(3)),
          q => struct(q.as("q"),
            call_function("shiftright", col("sh"), q * 16)
              .bitwiseAND(0xFFFFL).as("part")))).as("blk"))
      .select(col("id"), col("sh"), col("blk.q"), col("blk.part"))
    val a = blocked.select(col("q"), col("part"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = blocked.select(col("q"), col("part"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("q", "part"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming64(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      // both signatures ride along so any downstream verifier (or the
      // driver's oracle) can recheck hamming = popcount(sh_a XOR sh_b)
      .select("id_a", "id_b", "sh_a", "sh_b", "hamming")
  }

  /** Segment-level (CCNet/RefinedWeb-style line) dedup: split every
    * document into fixed windows of `segTokens` normalized tokens, drop
    * every repeat of a segment that occurs anywhere else in the corpus
    * (keep the first occurrence — lowest (id, seg_idx)), and reassemble
    * each document from its surviving segments in order. Documents whose
    * every segment was seen earlier survive with `kept_segments = 0` and
    * empty text, so the caller can filter or keep them.
    *
    * 100 TB shape: one explode (narrow), ONE shuffle — the first-occurrence
    * window partitions on `md5(seg)` so the exchange hashes and sorts
    * 32-char fingerprints, never long segment strings — then a groupBy on
    * the document id (second narrow shuffle) to reassemble, and a narrow
    * left join back for all-dropped documents. No all-pairs stage exists
    * anywhere; identical segments co-locate by fingerprint exactly like
    * CCNet shards lines by hash.
    */
  def segmentDedup(df: DataFrame, idCol: String, textCol: String,
      segTokens: Int = 20): DataFrame = {
    require(segTokens > 0, s"segTokens must be positive: $segTokens")
    import org.apache.spark.sql.expressions.Window
    val toks = split(TextAnalysis.normalize(col(textCol)), " ")
    val base = df
      .select(col(idCol), toks.as("_toks"))
      .withColumn("total_segments",
        ceil(size(col("_toks")) / lit(segTokens.toDouble)).cast("bigint"))
    val segs = base
      .withColumn("seg_idx", explode(sequence(lit(0L), col("total_segments") - 1)))
      .select(col(idCol), col("seg_idx"),
        concat_ws(" ", slice(col("_toks"),
          (col("seg_idx") * segTokens + 1).cast("int"), lit(segTokens))).as("seg"))
    val firstSeen = Window.partitionBy(md5(col("seg")))
      .orderBy(col(idCol), col("seg_idx"))
    val kept = segs
      .withColumn("_rn", row_number().over(firstSeen))
      .filter(col("_rn") === 1)
    val reassembled = kept.groupBy(idCol).agg(
      count(lit(1)).as("kept_segments"),
      array_join(
        transform(array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
          s => s.getField("seg")), " ").as("text_deduped"))
    base.select(col(idCol), col("total_segments"))
      .join(reassembled, Seq(idCol), "left")
      .select(col(idCol), col("total_segments"),
        coalesce(col("kept_segments"), lit(0L)).as("kept_segments"),
        coalesce(col("text_deduped"), lit("")).as("text_deduped"))
  }

  /** Exact duplicated-substring spans (the ExactSubstr operator of Lee et
    * al. 2022, "Deduplicating Training Data Makes Language Models Better"):
    * every window of `winTokens` consecutive normalized tokens that occurs
    * MORE THAN ONCE in the corpus (across documents or repeated within
    * one) marks its start position as duplicated; per document,
    * overlapping / adjacent duplicated windows merge into maximal spans.
    * Output is a removal manifest in token coordinates:
    * `(id, span_start, span_end_excl, n_windows)` — the span covers token
    * positions `[span_start, span_end_excl)` (0-based).
    *
    * The reference paper builds a suffix array over the concatenated
    * corpus; the distributed equivalent is this shingle-sort: the set of
    * length-L windows with count > 1 is exactly the set of positions a
    * suffix-array dup scan with minimum match length L reports, and a
    * hash-groupBy IS the distributed sort.
    *
    * 100 TB shape: one explode (one row per token position — corpus token
    * count, not quadratic), ONE shuffle partitioned on the 128-bit window
    * fingerprint (rows are (id, pos, fp) — the text never shuffles) with
    * a window count marking duplicated fingerprints, then a per-document
    * window over (id, pos) integer pairs. No all-pairs stage; the
    * quadratic structure of "which window equals which" is absorbed by
    * hash partitioning exactly like exact dedup absorbs it for whole
    * documents, and fingerprints are uniform so the shuffle cannot skew.
    */
  def substringDedupSpans(df: DataFrame, idCol: String, textCol: String,
      winTokens: Int = 20): DataFrame = {
    require(winTokens > 0, s"winTokens must be positive: $winTokens")
    import org.apache.spark.sql.expressions.Window
    val toks = split(TextAnalysis.normalize(col(textCol)), " ")
    // Spread first: a single small parquet file would pin the CPU-bound
    // normalize + per-window md5 pass to one task.
    val base = Spread(df).select(col(idCol), toks.as("_toks"))
      .withColumn("_n", size(col("_toks")))
      .filter(col("_n") >= winTokens)
    // One row per window start; the window fingerprint is md5 of the
    // space-joined tokens so the oracle recomputes the identical value.
    // The fingerprint ARRAY is built per doc first and the explode runs
    // over it — exploding positions while carrying `_toks` would copy the
    // whole token array into every position row (quadratic bytes per
    // doc); the 32-char fingerprints are what actually fan out.
    val wins = base
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), col("_n") - winTokens),
          i => md5(concat_ws(" ", slice(col("_toks"), i + 1, lit(winTokens))))))
          .as(Seq("pos", "wfp")))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("wfp"))
    // Corpus-wide dup detection as ONE window count over the fingerprint —
    // a groupBy + join-back would either recompute the whole upstream
    // (AQE broadcasts the small dup side, dropping exchange reuse) or
    // shuffle the positions twice; the window shuffles them once.
    val dupPos = wins
      .withColumn("_cnt", count(lit(1)).over(Window.partitionBy("wfp")))
      .filter(col("_cnt") > 1).select(col(idCol), col("pos"))
    // Interval merge: windows are fixed-length [pos, pos+L); a new span
    // starts when the gap to the previous duplicated start exceeds L
    // (NULL lag => first row => ELSE 0, same in the DuckDB replay).
    val byPos = Window.partitionBy(idCol).orderBy("pos")
    val spans = dupPos
      .withColumn("_new",
        when(col("pos") - lag("pos", 1).over(byPos) > winTokens, 1)
          .otherwise(0))
      .withColumn("_grp", sum("_new").over(
        byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("_grp"))
      .agg(min("pos").as("span_start"),
        (max("pos") + winTokens).as("span_end_excl"),
        count(lit(1)).as("n_windows"))
      .drop("_grp")
    spans
  }

  /** Apply a duplicated-span removal manifest ([[substringDedupSpans]])
    * to the corpus: drop every token whose position falls inside one of
    * the document's spans and reassemble the remaining (normalized)
    * tokens in order — the Lee et al. "remove the duplicated substring,
    * keep the rest of the document" step.
    *
    * 100 TB shape: the manifest is tiny relative to the corpus (spans
    * per doc, two longs each), so the join back is narrow and keyed on
    * the doc id; the removal itself is a per-row codegen HOF pass over
    * the token array — no shuffle beyond the manifest join.
    */
  def applySpanRemoval(df: DataFrame, idCol: String, textCol: String,
      spans: DataFrame): DataFrame = {
    val spanType = "array<struct<span_start:bigint,span_end_excl:bigint>>"
    val spansAgg = spans.groupBy(idCol).agg(
      collect_list(struct(col("span_start"), col("span_end_excl")))
        .as("_spans"))
    val toks = split(TextAnalysis.normalize(col(textCol)), " ")
    val kept = filter(
      transform(sequence(lit(0L), size(col("_toks")).cast("long") - 1), i =>
        when(!exists(col("_spans"), sp =>
            i >= sp.getField("span_start") && i < sp.getField("span_end_excl")),
          element_at(col("_toks"), (i + 1).cast("int")))),
      x => x.isNotNull)
    Spread(df).select(col(idCol), toks.as("_toks"))
      .join(spansAgg, Seq(idCol), "left")
      .withColumn("_spans", coalesce(col("_spans"), array().cast(spanType)))
      .select(col(idCol),
        size(col("_toks")).cast("long").as("n_tokens_before"),
        size(kept).cast("long").as("n_tokens_after"),
        concat_ws(" ", kept).as("text_clean"))
  }

  /** Incremental cross-batch exact dedup: flag each `incoming` document
    * whose normalized-text fingerprint already exists in `history`,
    * without shuffling history. The Bloom filter is built over the SMALL
    * side (the incoming batch's fingerprints) and the accumulated corpus
    * is semi-filtered BEFORE any exchange ([[BloomJoin.preFilter]]), so
    * the history-side shuffle carries only the ~|incoming| candidate
    * rows; the exact inner join on the fingerprint then eliminates Bloom
    * false positives, so the output is exact for any fpp.
    *
    * This is the nightly-ingest shape at 100 TB: history is the 100 TB
    * corpus (scanned once, reduced to candidate fingerprints map-side),
    * incoming is the day's batch.
    */
  def crossBatchDedup(incoming: DataFrame, history: DataFrame,
      idCol: String, textCol: String, expectedIncoming: Long,
      fpp: Double = 0.01): DataFrame = {
    val finc = incoming.select(col(idCol),
      TextAnalysis.fingerprint(col(textCol)).as("fp"))
    val fhist = history
      .select(TextAnalysis.fingerprint(col(textCol)).as("fp"))
    val candidates =
      BloomJoin.preFilter(fhist, finc.select("fp"), "fp", expectedIncoming, fpp)
    val dupFps = candidates.distinct()
    finc.join(dupFps.withColumn("_hit", lit(true)), Seq("fp"), "left")
      .select(col(idCol), col("fp"),
        coalesce(col("_hit"), lit(false)).as("is_dup"))
  }

  /** The persistable signature frame `(id, sh, sig)`: sorted hashed
    * shingles plus the k-wide MinHash signature. This is what an
    * incremental pipeline stores per document instead of re-reading
    * text — shingle hashes (8 bytes each) carry EXACT Jaccard
    * verification, the signature carries LSH candidate generation, and
    * both are computed exactly once per document ever.
    */
  def signatureFrame(df: DataFrame, idCol: String, textCol: String,
      shingleW: Int = 3, k: Int = 64): DataFrame =
    shingleFrame(df, idCol, textCol, shingleW)
      .select(col("id"), col("sh"), minhashSignature(col("sh"), k).as("sig"))

  /** Incremental NEAR-dup against a persisted signature index — the
    * MinHash sibling of [[crossBatchDedup]] (which is exact-only): an
    * incoming batch is checked for near-duplicates of an arbitrarily
    * large history WITHOUT rescanning any history text. `index` is a
    * [[signatureFrame]] table (e.g. a
    * [[graft.catalog.SnapshotTableStore]] version, appended batch by
    * batch). Candidates come from the banded (band, bucket) equi-join of
    * the two sides' exploded signatures — the shuffle carries only
    * (band, bucket, id) rows on BOTH sides, never arrays; verification
    * joins the persisted shingle arrays id-keyed and keeps pairs whose
    * EXACT Jaccard clears the threshold, so the emitted contract is
    * identical to [[minhashNearDups]] (hash-specific recall, exact
    * emitted values).
    *
    * 100 TB shape: the history index shuffles once per batch on its
    * banded keys (or is pre-bucketed by (band, bucket) in the store and
    * doesn't shuffle at all); incoming is the small side. The quadratic
    * blow-up is confined to same-bucket groups exactly as in the
    * self-join variant.
    */
  def incrementalNearDups(incoming: DataFrame, idCol: String,
      textCol: String, index: DataFrame, threshold: Double = 0.8,
      k: Int = 64, bands: Int = 16, shingleW: Int = 3): DataFrame = {
    val inc = signatureFrame(incoming, idCol, textCol, shingleW, k)
      .barrier(true)
    def banded(sigF: DataFrame, as: String) = sigF
      .select(col("id").as(as), explode(lshBands(col("sig"), k, bands)).as("bb"))
      .select(col(as), col("bb.band"), col("bb.bucket"))
    val cand = banded(inc, "id_new")
      .join(banded(index, "id_hist"), Seq("band", "bucket"))
      .select("id_new", "id_hist").distinct()
    cand
      .join(inc.select(col("id").as("id_new"), col("sh").as("sh_new")), "id_new")
      .join(index.select(col("id").as("id_hist"), col("sh").as("sh_hist")),
        "id_hist")
      .withColumn("jaccard", round(jaccardFast(col("sh_new"), col("sh_hist")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_new"), col("id_hist"), col("jaccard"))
  }

  /** Corpus-pair shingle overlap: exact n-gram Jaccard between whole
    * corpora (sources, snapshots, train/test splits) rather than between
    * documents — the corpus-granularity leakage/contamination report
    * (did split B's text leak into split A?). Reference scope: the same
    * shingle universe [[shingles]] feeds per-document; corkscrew has no
    * corpus-level twin, this is the beyond-ref aggregate.
    *
    * 100 TB shape: ONE distinct shuffle builds the (corpus, gram) set;
    * the intersection is a self-equi-join on `gram` whose fan-out per
    * gram is bounded by the CORPUS cardinality (a dimension, not the
    * data) — never all-pairs over rows; per-corpus totals are a small
    * broadcast. Emits one row per overlapping pair: exact intersection,
    * union and Jaccard.
    */
  def corpusOverlap(df: DataFrame, corpusCol: String, textCol: String,
      w: Int = 5): DataFrame = {
    // Barriered: consumed three times (per-corpus counts + both sides of
    // the intersection self-join). Without the cut the explode + distinct
    // subtree re-evaluates per consumer — q_d17's plan showed it 4×.
    val grams = tokenFrame(df, Seq(corpusCol -> "corpus"), textCol)
      .select(col("corpus"),
        explode(shinglesFromTokens(col("toks"), w)).as("gram"))
      .distinct().barrier(true)
    val perCorpus = grams.groupBy("corpus").agg(count(lit(1)).as("n"))
    val inter = grams.as("x")
      .join(grams.as("y"), Seq("gram"))
      .where(col("x.corpus") < col("y.corpus"))
      .groupBy(col("x.corpus").as("corpus_a"), col("y.corpus").as("corpus_b"))
      .agg(count(lit(1)).as("inter"))
    val unionN = col("na") + col("nb") - col("inter")
    inter
      .join(broadcast(perCorpus.select(col("corpus").as("corpus_a"),
        col("n").as("na"))), "corpus_a")
      .join(broadcast(perCorpus.select(col("corpus").as("corpus_b"),
        col("n").as("nb"))), "corpus_b")
      .select(col("corpus_a"), col("corpus_b"), col("inter"),
        unionN.as("union_n"),
        round(col("inter") / unionN, 6).as("jaccard"))
  }
}
