package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StringType}

/** Cross-resource correlation — rule-driven relationship discovery over a
  * multi-cloud inventory (reference: pkg/idmsdiscovery/correlation_engine
  * .go:13-135 — CorrelationRule / CrossProviderRule tables with per-rule
  * confidence; FindCorrelations at :138-160 runs same-provider rules
  * always and cross-provider rules behind a config gate).
  *
  * Spark re-expression: the reference nested-loops every (source, target)
  * pair of each rule's type slices through an opaque Go matcher. Here
  * every same-provider matcher is re-expressed as a KEY EXTRACTOR pair —
  * a projection from the resource's metadata JSON to one or more join
  * keys — so each rule becomes one distributed hash equi-join between two
  * thin (id, key) frames, never an all-pairs loop: array-valued fields
  * explode to one key per element, map-valued fields to one key per
  * entry. Cross-provider rules are genuinely fuzzy (name similarity with
  * tiered scores), so they run as a broadcast nested-loop over thin
  * (id, name[, config]) projections — the type-filtered slices of a
  * cloud inventory are control-plane-small (thousands, not billions),
  * which is the same cardinality argument the reference's O(n·m) loops
  * rest on, minus the single-machine limit.
  *
  * Input contract (the reference's models.Resource shape): columns
  * `id`, `provider`, `resource_type`, `name`, `metadata` (JSON text).
  * Output: one row per correlated pair per rule —
  * (source_id, target_id, rule, description, confidence, cross_provider).
  */
object Correlation {

  /** One same-provider rule: resources of `sourceType` correlate to
    * resources of `targetType` when any source key equals any target key
    * (correlation_engine.go:19-26). `sourceKeys`/`targetKeys` map a
    * type-filtered (id, name, metadata) frame to an (id, ckey) frame —
    * one row per candidate key, so multi-valued metadata participates
    * without an all-pairs scan.
    */
  final case class CorrelationRule(
      name: String,
      description: String,
      sourceType: String,
      targetType: String,
      confidence: Double,
      sourceKeys: DataFrame => DataFrame,
      targetKeys: DataFrame => DataFrame)

  /** One cross-provider rule (correlation_engine.go:28-36): pairs from
    * (providerA, resourceTypeA) × (providerB, resourceTypeB) correlate
    * when the tiered name similarity of `simField` clears `minSim`
    * strictly, AND — for rules carrying a config check — the metadata
    * config similarity clears `minConfigSim` (the Multi-Cloud-Database
    * matcher at :331-344).
    */
  final case class CrossProviderRule(
      name: String,
      description: String,
      providerA: String,
      providerB: String,
      resourceTypeA: String,
      resourceTypeB: String,
      confidence: Double,
      minSim: Double,
      simField: Option[String] = None,
      minConfigSim: Double = 0.0)

  private def meta(field: String): Column =
    get_json_object(col("metadata"), s"$$.$field")

  /** (id, ckey) from one scalar metadata field. */
  def keyOf(field: String): DataFrame => DataFrame =
    df => df.select(col("id"), meta(field).as("ckey"))

  /** (id, ckey) per element of a metadata array-of-objects field —
    * `attachments[].instance_id` and friends. The nested array parses
    * from the field's JSON text, so the outer metadata map stays opaque.
    */
  def keyOfEach(arrayField: String, elemField: String): DataFrame => DataFrame =
    df => df.select(col("id"),
        explode(from_json(meta(arrayField),
          ArrayType(MapType(StringType, StringType)))).as("e"))
      .select(col("id"), col("e").getItem(elemField).as("ckey"))

  /** (id, ckey) per string element of a metadata array field; `segment`
    * keeps only the trailing `/`-path segment — the scalable equi-key for
    * the reference's GCP disk-users substring check (:316-326), whose
    * `users` entries address instances as `.../instances/<name>`.
    */
  def keyOfStrings(arrayField: String, segment: Boolean = false): DataFrame => DataFrame =
    df => {
      val e = df.select(col("id"),
        explode(from_json(meta(arrayField), ArrayType(StringType))).as("u"))
      val k = if (segment) element_at(split(col("u"), "/"), -1) else col("u")
      e.select(col("id"), k.as("ckey"))
    }

  /** (id, ckey) per entry of a metadata map field, encoded `key=value` —
    * the K8s selector/label any-entry-matches contract (:295-309).
    */
  def keyOfEntries(mapField: String): DataFrame => DataFrame =
    df => df.select(col("id"),
        explode(from_json(meta(mapField),
          MapType(StringType, StringType))).as(Seq("k", "v")))
      .select(col("id"), concat(col("k"), lit("="), col("v")).as("ckey"))

  /** The resource's own id as its key — matchLoadBalancerToTargets joins
    * the LB's declared target ids against the instance's ID itself.
    */
  val selfId: DataFrame => DataFrame =
    df => df.select(col("id"), col("id").as("ckey"))

  /** The reference's six built-in same-provider rules
    * (correlation_engine.go:51-101), each as its equi-join re-expression.
    */
  val defaultRules: Seq[CorrelationRule] = Seq(
    CorrelationRule("EC2-EBS-Attachment",
      "EC2 instances attached to EBS volumes",
      "aws:ec2:instance", "aws:ebs:volume", 0.95,
      keyOf("instance_id"), keyOfEach("attachments", "instance_id")),
    CorrelationRule("LoadBalancer-Target",
      "Load balancers and their target instances",
      "aws:elbv2:loadbalancer", "aws:ec2:instance", 0.9,
      keyOfEach("targets", "id"), selfId),
    CorrelationRule("VPC-Subnet-Relationship",
      "VPC to subnet relationships",
      "aws:vpc:vpc", "aws:vpc:subnet", 0.98,
      keyOf("vpc_id"), keyOf("vpc_id")),
    CorrelationRule("K8s-Pod-Service",
      "Kubernetes pods and services relationship",
      "k8s:core:service", "k8s:core:pod", 0.92,
      keyOfEntries("selectors"), keyOfEntries("labels")),
    CorrelationRule("Azure-VM-Disk",
      "Azure VMs and their attached disks",
      "azure:compute:virtualmachine", "azure:storage:disk", 0.95,
      keyOf("vm_id"), keyOf("attached_vm")),
    CorrelationRule("GCP-Instance-Disk",
      "GCP instances and persistent disks",
      "gcp:compute:instance", "gcp:storage:disk", 0.95,
      keyOf("name"), keyOfStrings("users", segment = true)))

  /** The reference's three built-in cross-provider rules
    * (correlation_engine.go:104-135).
    */
  val defaultCrossRules: Seq[CrossProviderRule] = Seq(
    CrossProviderRule("Multi-Cloud-Database",
      "Databases across cloud providers with similar configurations",
      "aws", "azure", "aws:rds:instance", "azure:sql:database",
      0.75, minSim = 0.7, minConfigSim = 0.6),
    CrossProviderRule("Cross-Cloud-Storage",
      "Storage buckets/containers across providers",
      "aws", "gcp", "aws:s3:bucket", "gcp:storage:bucket",
      0.7, minSim = 0.8),
    CrossProviderRule("Hybrid-Load-Balancing",
      "Load balancers that might be part of hybrid architecture",
      "aws", "azure", "aws:elbv2:loadbalancer", "azure:network:loadbalancer",
      0.6, minSim = 0.6, simField = Some("dns_name")))

  /** Tiered name similarity (correlation_engine.go:377-401): 1.0 exact
    * (case-folded), 0.8 containment either way, 0.6 shared 3-prefix when
    * both names exceed 3 chars, else 0. Pure Catalyst — stays codegen.
    */
  def nameSimilarity(a: Column, b: Column): Column =
    nameSimilarityLowered(lower(a), lower(b))

  /** [[nameSimilarity]] over ALREADY case-folded inputs — the pairwise
    * join form, where folding must happen in the per-row projection,
    * never per candidate pair.
    */
  def nameSimilarityLowered(la: Column, lb: Column): Column =
    when(la.isNull || lb.isNull, lit(0.0))
      .when(la === lb, lit(1.0))
      .when(la.contains(lb) || lb.contains(la), lit(0.8))
      .when(length(la) > 3 && length(lb) > 3 &&
        substring(la, 1, 3) === substring(lb, 1, 3), lit(0.6))
      .otherwise(lit(0.0))

  /** Database config similarity (correlation_engine.go:403-431): engine
    * equality scores 1.0, size-word agreement of instance_class vs sku
    * scores 0.8, averaged over the checks BOTH sides populate; no
    * populated checks → 0.
    */
  def configSimilarity(engA: Column, engB: Column,
      sizeA: Column, sizeB: Column): Column = {
    val engineCheck = engA.isNotNull && engB.isNotNull
    val engineScore = when(engineCheck && lower(engA) === lower(engB), 1.0)
      .otherwise(0.0)
    val sizeCheck = sizeA.isNotNull && sizeB.isNotNull
    val sizeWord = (x: Column) => when(lower(x).contains("small"), "small")
      .when(lower(x).contains("medium"), "medium")
      .when(lower(x).contains("large"), "large")
    val sizeScore = when(sizeCheck &&
      sizeWord(sizeA).isNotNull && sizeWord(sizeA) === sizeWord(sizeB), 0.8)
      .otherwise(0.0)
    val checks = engineCheck.cast("int") + sizeCheck.cast("int")
    when(checks === 0, lit(0.0)).otherwise((engineScore + sizeScore) / checks)
  }

  private val outCols = Seq("source_id", "target_id", "rule",
    "description", "confidence", "cross_provider")

  /** Run the rule tables over `resources` (FindCorrelations,
    * correlation_engine.go:138-160). `enableCrossProvider` mirrors the
    * reference's EnableCrossProviderCorre config gate. Each rule dedups
    * to one row per (source, target) pair — multi-valued keys (several
    * matching selector entries, duplicate array elements) collapse the
    * way the reference's boolean matcher does.
    *
    * At scale: every same-provider rule is a hash join between two thin
    * exploded key frames of ONE type slice each — the resource corpus is
    * scanned per slice with the type filter pushed to the parquet scan,
    * and nothing wider than (id, key) ever shuffles.
    *
    * EAGER when it pays: with more than one rule side consuming the
    * input, the thin 5-column projection is materialized (session
    * [[graft.Barrier]] policy) AT CALL TIME — a Spark job runs before
    * the returned frame is ever acted on. With a single rule, or a
    * streaming input (where checkpoint/persist are unsupported), the
    * projection stays lazy and the returned frame is plan-only as usual.
    */
  def correlate(resources: DataFrame,
      rules: Seq[CorrelationRule] = defaultRules,
      crossRules: Seq[CrossProviderRule] = defaultCrossRules,
      enableCrossProvider: Boolean = true): DataFrame = {
    import graft.Barrier.BarrierOps
    // Materialize the thin projection ONCE: every rule side is a filtered
    // read of it, so without a barrier the 6 same-provider + 3 cross
    // rules re-execute the whole upstream (often a many-way inventory
    // union) ~18 times — measured as 36 parquet scans in q_e20's plan.
    // This is the cache the scale note below always demanded of callers;
    // doing it here makes every caller get it. Skipped when only one
    // rule consumes the input (nothing is re-read — eagerness would cost
    // a pointless extra pass) and on streaming inputs (checkpoint/persist
    // unsupported; see scaladoc).
    val proj = resources
      .select("id", "provider", "resource_type", "name", "metadata")
    val ruleSides = rules.size +
      (if (enableCrossProvider) crossRules.size else 0)
    val thin =
      if (ruleSides > 1 && !proj.isStreaming) proj.barrier(true) else proj
    def slice(tpe: String) = thin.filter(col("resource_type") === tpe)

    val same = rules.map { r =>
      val src = r.sourceKeys(slice(r.sourceType))
        .filter(col("ckey").isNotNull)
        .select(col("id").as("source_id"), col("ckey"))
      val tgt = r.targetKeys(slice(r.targetType))
        .filter(col("ckey").isNotNull)
        .select(col("id").as("target_id"), col("ckey"))
      src.join(tgt, "ckey")
        .select("source_id", "target_id").distinct()
        .withColumn("rule", lit(r.name))
        .withColumn("description", lit(r.description))
        .withColumn("confidence", lit(r.confidence))
        .withColumn("cross_provider", lit(false))
        .select(outCols.map(col): _*)
    }

    val cross = if (!enableCrossProvider) Nil else crossRules.map { r =>
      // Names are case-folded IN THE PROJECTION, not in the join
      // predicate: a predicate-side lower() re-runs ICU case folding for
      // every candidate PAIR (measured dominating the whole rule at 10×),
      // where a projected lower() runs once per ROW and the codegen'd
      // pair loop compares bytes.
      def side(p: String, tpe: String, tag: String) = {
        val s = thin.filter(col("provider") === p && col("resource_type") === tpe)
        // getResourceName (:370-375): the name metadata field, else the id
        s.select(col("id").as(s"${tag}_id"),
          lower(r.simField.map(meta).getOrElse(
            coalesce(meta("name"), col("name")))).as(s"${tag}_name"),
          meta("engine").as(s"${tag}_engine"),
          meta(if (tag == "a") "instance_class" else "sku").as(s"${tag}_size"))
      }
      // Broadcast-BNL parallelism equals the STREAM side's partition
      // count — a thin pre-filtered slice often collapses to 1-2 input
      // partitions, which would serialize the whole pairwise loop on one
      // core. Spread the stream side first; the broadcast side stays put.
      val para = resources.sparkSession.sparkContext.defaultParallelism
      val a = side(r.providerA, r.resourceTypeA, "a").repartition(para)
      val b = broadcast(side(r.providerB, r.resourceTypeB, "b"))
      val sim = nameSimilarityLowered(col("a_name"), col("b_name"))
      val cfg = configSimilarity(col("a_engine"), col("b_engine"),
        col("a_size"), col("b_size"))
      val pred =
        if (r.minConfigSim > 0.0) sim > r.minSim && cfg > r.minConfigSim
        else sim > r.minSim
      a.join(b, pred)
        .select(col("a_id").as("source_id"), col("b_id").as("target_id"))
        .withColumn("rule", lit(r.name))
        .withColumn("description", lit(r.description))
        .withColumn("confidence", lit(r.confidence))
        .withColumn("cross_provider", lit(true))
        .select(outCols.map(col): _*)
    }

    (same ++ cross).reduce(_ unionByName _)
  }
}
