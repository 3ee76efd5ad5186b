package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}

/** REST halves of the cloud inventory connectors — the PUBLIC wire
  * protocols the reference's SDK clients speak, implemented directly so
  * the only thing a zero-egress sandbox cannot exercise is a real
  * credential:
  *
  *  - Azure Resource Graph (plugins/azure-provider/resource_graph.go:
  *    299-345): POST `{endpoint}/providers/Microsoft.ResourceGraph/
  *    resources?api-version=...` with `{query, subscriptions,
  *    options:{resultFormat:"objectArray", $top, $skipToken}}`; the
  *    response carries `data` (the row array) and `$skipToken` — loop
  *    until the token disappears.
  *  - GCP Cloud Asset Inventory (plugins/gcp-provider/asset_inventory
  *    .go:107-134): GET `{endpoint}/v1/{parent}/assets?contentType=
  *    RESOURCE&pageSize=&pageToken=`; the response carries `assets` and
  *    `nextPageToken`.
  *
  * Scale shape: a token-chained page loop is inherently sequential *per
  * scope*, so the Spark fan-out parallelizes across SCOPES (Azure
  * subscription batches, GCP parents) — one task per scope, each task
  * paging its own slice on an executor, rows landing as JSON text that
  * parses under `spark.read.json` with the scan-batch pattern
  * [[ScannerSource]] established. The driver never touches a row.
  */
object RestScanner {

  /** Minimal bearer-credential abstraction (the azcore.TokenCredential /
    * google.FindDefaultCredentials seam). Serializable so executor-side
    * page loops can authenticate; real implementations wrap a token
    * fetcher, fixtures use a static token.
    */
  trait BearerToken extends Serializable { def token(): String }
  final case class StaticToken(value: String) extends BearerToken {
    def token(): String = value
  }

  private def http(timeoutMs: Long): HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  private def send(client: HttpClient, req: HttpRequest): String = {
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() < 200 || resp.statusCode() >= 300)
      throw new HttpStatusException(resp.statusCode(),
        s"HTTP ${resp.statusCode()} from ${req.uri()}: " +
          resp.body().take(200))
    resp.body()
  }

  /** Non-2xx with its status carried — the retry loop needs to separate
    * transient classes (429/5xx) from permanent ones (4xx).
    */
  final class HttpStatusException(val status: Int, msg: String)
    extends java.io.IOException(msg)

  /** Per-provider retry/throttle budget (the reference's
    * `internal/parallel/executor.go:209-281` backoff + rate-limit knobs,
    * re-expressed per executor task): `maxRetries` additional attempts on
    * TRANSIENT failures only — connect errors and 429/500/502/503/504;
    * a 403 or 400 fails immediately (retrying an auth error burns the
    * budget and hides the real problem). Backoff is deterministic
    * exponential (`backoffMs * 2^attempt`) — no RNG, so failure traces
    * reproduce. `throttleMs` spaces successive page requests WITHIN one
    * scope's sequential loop; cross-scope rate is the executor fan-out's
    * job (cap tasks, not sleeps).
    */
  final case class RetryPolicy(maxRetries: Int = 3, backoffMs: Long = 200L,
      throttleMs: Long = 0L) {
    require(maxRetries >= 0 && backoffMs >= 0 && throttleMs >= 0,
      s"bad retry policy: $this")
  }

  private val TransientStatuses = Set(429, 500, 502, 503, 504)

  /** Ceiling on one backoff sleep: the shift is also clamped to 20
    * doublings so a large user-supplied `maxRetries` can never overflow
    * `backoffMs << attempt` into a negative sleep (Thread.sleep throws on
    * negatives, which would mask the real transport error).
    */
  private val MaxBackoffMs = 60000L

  private def sendWithRetry(client: HttpClient, req: HttpRequest,
      policy: RetryPolicy): String = {
    var attempt = 0
    while (true) {
      try return send(client, req)
      catch {
        case e: HttpStatusException
            if !TransientStatuses.contains(e.status) => throw e
        case scala.util.control.NonFatal(e) =>
          if (attempt >= policy.maxRetries) throw e
          Thread.sleep(
            math.min(MaxBackoffMs, policy.backoffMs << math.min(attempt, 20)))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Progress guard for the three paging loops: a (broken or malicious)
    * endpoint that keeps returning the same continuation token would
    * otherwise loop forever inside an executor task — the retry policy
    * bounds FAILURES, not successful non-advancing pages. Returns the
    * token to carry into the next iteration.
    */
  private def advanceToken(kind: String, prev: String, next: String): String = {
    if (next == prev)
      throw new java.io.IOException(
        s"$kind paging stalled: continuation token '$next' did not advance")
    next
  }

  /** One Azure Resource Graph query over one subscription batch,
    * following `$skipToken` until exhausted. Returns each `data` element
    * re-serialized as compact JSON text.
    */
  def azureQueryPages(endpoint: String, cred: BearerToken, kql: String,
      subscriptions: Seq[String], top: Int = 1000,
      timeoutMs: Long = 30000L,
      policy: RetryPolicy = RetryPolicy()): Seq[String] = {
    val mapper = new ObjectMapper()
    val client = http(timeoutMs)
    val out = Seq.newBuilder[String]
    var skipToken: String = null
    var more = true
    var first = true
    while (more) {
      if (!first && policy.throttleMs > 0) Thread.sleep(policy.throttleMs)
      first = false
      val body = mapper.createObjectNode()
      body.put("query", kql)
      val subs = body.putArray("subscriptions")
      subscriptions.foreach(subs.add)
      val opts = body.putObject("options")
      opts.put("resultFormat", "objectArray")
      opts.put("$top", top)
      if (skipToken != null) opts.put("$skipToken", skipToken)
      val req = HttpRequest.newBuilder(URI.create(
          s"${endpoint.stripSuffix("/")}/providers/Microsoft.ResourceGraph/" +
            "resources?api-version=2021-03-01"))
        .timeout(Duration.ofMillis(timeoutMs))
        .header("Authorization", s"Bearer ${cred.token()}")
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(body)))
        .build()
      val root = mapper.readTree(sendWithRetry(client, req, policy))
      val data = root.path("data")
      (0 until data.size()).foreach(i => out += mapper.writeValueAsString(data.get(i)))
      val tok = root.path("$skipToken")
      if (tok.isTextual && tok.asText().nonEmpty)
        skipToken = advanceToken("azure $skipToken", skipToken, tok.asText())
      else more = false
    }
    out.result()
  }

  /** Distributed Azure Resource Graph scan: one task per subscription
    * batch (`batchSize` mirrors the API's 1000-subscription request
    * cap), each paging independently on an executor; the union parses
    * once under json inference (or pass an explicit schema downstream).
    */
  def azureScan(spark: SparkSession, endpoint: String, cred: BearerToken,
      kql: String, subscriptions: Seq[String], top: Int = 1000,
      batchSize: Int = 100,
      policy: RetryPolicy = RetryPolicy()): DataFrame = {
    import spark.implicits._
    import graft.Barrier.BarrierOps
    val batches = subscriptions.grouped(batchSize).toSeq
    val rows = spark.sparkContext
      .parallelize(batches, math.max(batches.size, 1))
      .flatMap(batch => azureQueryPages(endpoint, cred, kql, batch, top,
        policy = policy))
    // barrier BEFORE read.json: schema inference is its own pass, and an
    // un-cut lineage would replay every REST page per pass (non-idempotent
    // against a live API, and measurably doubles the fetch volume)
    spark.read.json(rows.toDS().barrier())
  }

  /** One AWS JSON-protocol (target-header) `List*`/`Describe*` page
    * chain — the third cloud's wire shape, making the connector trio
    * symmetric (reference `plugins/aws-provider/runtime/pipeline.go:
    * 230-368` ScanServices per (service, region);
    * `generator/reflection_executor.go:356` names `NextToken` as the
    * paginator token field): POST `{endpoint}` with header
    * `X-Amz-Target: <Service>.<Action>` and body
    * `{"MaxResults": n, "NextToken": tok}`; the response carries one
    * resource array (`itemsField`) and `NextToken` — loop until the
    * token disappears. Production AWS signs with SigV4; the
    * [[BearerToken]] seam is where a signer plugs in, and is the only
    * unexercised half in a zero-egress sandbox.
    */
  def awsListPages(endpoint: String, cred: BearerToken, target: String,
      itemsField: String = "Resources", pageSize: Int = 100,
      timeoutMs: Long = 30000L,
      policy: RetryPolicy = RetryPolicy()): Seq[String] = {
    val mapper = new ObjectMapper()
    val client = http(timeoutMs)
    val out = Seq.newBuilder[String]
    var nextToken: String = null
    var more = true
    var first = true
    while (more) {
      if (!first && policy.throttleMs > 0) Thread.sleep(policy.throttleMs)
      first = false
      val body = mapper.createObjectNode()
      body.put("MaxResults", pageSize)
      if (nextToken != null) body.put("NextToken", nextToken)
      val req = HttpRequest.newBuilder(URI.create(endpoint))
        .timeout(Duration.ofMillis(timeoutMs))
        .header("Authorization", s"Bearer ${cred.token()}")
        .header("Content-Type", "application/x-amz-json-1.1")
        .header("X-Amz-Target", target)
        .POST(HttpRequest.BodyPublishers.ofString(
          mapper.writeValueAsString(body)))
        .build()
      val root = mapper.readTree(sendWithRetry(client, req, policy))
      val items = root.path(itemsField)
      (0 until items.size()).foreach(i =>
        out += mapper.writeValueAsString(items.get(i)))
      val tok = root.path("NextToken")
      if (tok.isTextual && tok.asText().nonEmpty)
        nextToken = advanceToken("aws NextToken", nextToken, tok.asText())
      else more = false
    }
    out.result()
  }

  /** One AWS `Describe*` enrichment call: POST `{idField: id}` under the
    * describe target, returning the detail object as JSON text
    * (scanner_registry.go:135-189 — "scan and enrich in one pass").
    */
  def awsDescribe(endpoint: String, cred: BearerToken, target: String,
      idField: String, id: String, timeoutMs: Long = 30000L,
      policy: RetryPolicy = RetryPolicy()): String = {
    val mapper = new ObjectMapper()
    val body = mapper.createObjectNode()
    body.put(idField, id)
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(Duration.ofMillis(timeoutMs))
      .header("Authorization", s"Bearer ${cred.token()}")
      .header("Content-Type", "application/x-amz-json-1.1")
      .header("X-Amz-Target", target)
      .POST(HttpRequest.BodyPublishers.ofString(
        mapper.writeValueAsString(body)))
      .build()
    sendWithRetry(http(timeoutMs), req, policy)
  }

  /** One AWS service's scan recipe: the parameter-free list action
    * (aws_resource_lister.go:280-304 filters exactly these), the
    * optional per-ref describe enrichment, and the response field names.
    */
  final case class AwsAction(
      service: String,
      listTarget: String,
      describeTarget: Option[String] = None,
      itemsField: String = "Resources",
      idField: String = "Id",
      pageSize: Int = 100)

  /** Distributed AWS-shaped scan: one task per (service, region) — the
    * reference's ScanServices × region loop (pipeline.go:306-368)
    * parallelized across executors. Each task pages its list call, then
    * describes every ref sequentially (the SDK's own enrichment shape);
    * a FAILED describe falls back to the listed ref instead of dropping
    * the resource (scanner_registry.go:156-163 "create basic resource on
    * enrichment failure"). `endpointTemplate` may carry `{region}` —
    * real AWS scopes region into the host (`ec2.us-east-1.amazonaws
    * .com`); a loopback fixture folds it into the path. The engine
    * attaches `service`/`region` to every row (resource_converter.go's
    * metadata attach) since AWS detail payloads don't carry them.
    */
  def awsScan(spark: SparkSession, endpointTemplate: String,
      cred: BearerToken, actions: Seq[AwsAction], regions: Seq[String],
      timeoutMs: Long = 30000L,
      policy: RetryPolicy = RetryPolicy()): DataFrame = {
    import spark.implicits._
    import graft.Barrier.BarrierOps
    val work = for { a <- actions; r <- regions } yield (a, r)
    val rows = spark.sparkContext
      .parallelize(work, math.max(work.size, 1))
      .flatMap { case (a, region) =>
        val ep = endpointTemplate.replace("{region}", region)
        val mapper = new ObjectMapper()
        def attach(json: String): String = {
          val node = mapper.readTree(json)
            .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          node.put("service", a.service)
          node.put("region", region)
          mapper.writeValueAsString(node)
        }
        val refs = awsListPages(ep, cred, a.listTarget, a.itemsField,
          a.pageSize, timeoutMs, policy)
        val enriched = a.describeTarget match {
          case None => refs
          case Some(dt) => refs.map { ref =>
            val id = mapper.readTree(ref).path(a.idField).asText()
            try awsDescribe(ep, cred, dt, a.idField, id, timeoutMs, policy)
            catch { case scala.util.control.NonFatal(_) => ref }
          }
        }
        enriched.map(attach)
      }
    // one fetch pass total — see azureScan
    spark.read.json(rows.toDS().barrier())
  }

  /** One GCP Cloud Asset Inventory listing for one parent
    * (`projects/…`/`folders/…`/`organizations/…`), following
    * `nextPageToken`. Returns each `assets` element as JSON text.
    */
  def gcpAssetPages(endpoint: String, cred: BearerToken, parent: String,
      contentType: String = "RESOURCE", pageSize: Int = 500,
      timeoutMs: Long = 30000L,
      policy: RetryPolicy = RetryPolicy()): Seq[String] = {
    val mapper = new ObjectMapper()
    val client = http(timeoutMs)
    val out = Seq.newBuilder[String]
    var pageToken: String = null
    var more = true
    var first = true
    while (more) {
      if (!first && policy.throttleMs > 0) Thread.sleep(policy.throttleMs)
      first = false
      val tok = if (pageToken == null) ""
        else s"&pageToken=${java.net.URLEncoder.encode(pageToken, "UTF-8")}"
      val req = HttpRequest.newBuilder(URI.create(
          s"${endpoint.stripSuffix("/")}/v1/$parent/assets" +
            s"?contentType=$contentType&pageSize=$pageSize$tok"))
        .timeout(Duration.ofMillis(timeoutMs))
        .header("Authorization", s"Bearer ${cred.token()}")
        .GET().build()
      val root = mapper.readTree(sendWithRetry(client, req, policy))
      val assets = root.path("assets")
      (0 until assets.size()).foreach(i =>
        out += mapper.writeValueAsString(assets.get(i)))
      val next = root.path("nextPageToken")
      if (next.isTextual && next.asText().nonEmpty)
        pageToken = advanceToken("gcp nextPageToken", pageToken, next.asText())
      else more = false
    }
    out.result()
  }

  /** Distributed GCP asset scan: one task per parent (the reference
    * iterates `projects/folders/org` parents sequentially,
    * asset_inventory.go:65-105 — here they page concurrently).
    */
  def gcpScan(spark: SparkSession, endpoint: String, cred: BearerToken,
      parents: Seq[String], contentType: String = "RESOURCE",
      pageSize: Int = 500,
      policy: RetryPolicy = RetryPolicy()): DataFrame = {
    import spark.implicits._
    import graft.Barrier.BarrierOps
    val rows = spark.sparkContext
      .parallelize(parents, math.max(parents.size, 1))
      .flatMap(p => gcpAssetPages(endpoint, cred, p, contentType, pageSize,
        policy = policy))
    // one fetch pass total — see azureScan
    spark.read.json(rows.toDS().barrier())
  }
}
