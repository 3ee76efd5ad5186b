package graft.compliance

import java.nio.file.{Files, Path, StandardCopyOption}
import java.security.MessageDigest
import java.time.Instant
import scala.jdk.CollectionConverters._

/** Pack registry client — discovery, search, download, and installation of
  * compliance packs with a persistent local cache
  * (reference: pkg/query/compliance/registry.go:1-1047, behaviors pinned by
  * registry_test.go:16-620).
  *
  * The remote side is abstracted behind [[RegistryTransport]]: the
  * reference speaks the GitHub API (topic search → manifest fetch →
  * releases → tarball); here a transport serves a registry *index*
  * document and per-version file bundles, so the registry semantics —
  * TTL'd offline cache, criteria search with sort + pagination, version
  * resolution, checksum verification, retry with exponential backoff —
  * are engine-owned and testable without a network.
  */
object PackRegistry {

  /** One published version of a pack (registry.go:88-103). */
  final case class PackVersion(
      version: String,
      tag: String = "",
      releaseDateMs: Long = 0L,
      checksum: String = "", // sha256 hex of the bundle
      size: Long = 0L,
      downloadUrl: String = "",
      deprecated: Boolean = false)

  /** Registry-visible pack metadata (registry.go:67-86). */
  final case class PackInfo(
      name: String,
      namespace: String,
      description: String = "",
      provider: String = "",
      frameworks: Seq[String] = Nil,
      tags: Seq[String] = Nil,
      categories: Seq[String] = Nil,
      maintainers: Seq[String] = Nil,
      downloadsTotal: Long = 0L,
      lastUpdatedMs: Long = 0L,
      latestVersion: String = "",
      versions: Seq[PackVersion] = Nil)

  /** Search parameters (registry.go:120-132). */
  final case class SearchCriteria(
      query: String = "",
      provider: String = "",
      framework: String = "",
      category: String = "",
      tags: Seq[String] = Nil,
      namespace: String = "",
      sort: String = "",  // name | downloads | updated (default name)
      order: String = "", // asc | desc (default asc)
      limit: Int = 0,
      offset: Int = 0)

  final case class SearchResult(
      packs: Seq[PackInfo],
      total: Int,
      limit: Int,
      offset: Int,
      query: String,
      durationMs: Long)

  final case class RetryConfig(
      maxRetries: Int = 3,
      retryDelayMs: Long = 1000L,
      backoff: Double = 2.0)

  final case class RegistryError(operation: String, url: String,
      message: String, cause: Option[Throwable] = None)
      extends RuntimeException(
        s"registry $operation failed for '$url': $message" +
          cause.map(c => s" (caused by: ${c.getMessage})").getOrElse(""))

  /** Remote access abstraction. `fetchIndex` returns a registry index
    * document (YAML list of pack entries, the cache's serialized shape);
    * `fetchBundle` returns a pack bundle (YAML map of relative file path →
    * content — the tarball stand-in). Both return Left on transport
    * failure; the client retries per [[RetryConfig]].
    */
  trait RegistryTransport {
    def fetchIndex(baseUrl: String): Either[RegistryError, String]
    def fetchBundle(url: String): Either[RegistryError, String]
  }

  /** A transport that always fails — the offline default. */
  object NoTransport extends RegistryTransport {
    def fetchIndex(baseUrl: String): Either[RegistryError, String] =
      Left(RegistryError("fetch", baseUrl, "no transport configured"))
    def fetchBundle(url: String): Either[RegistryError, String] =
      Left(RegistryError("download", url, "no transport configured"))
  }

  final case class Cache(
      lastUpdatedMs: Long,
      ttlMs: Long,
      packs: Map[String, PackInfo],
      version: String)

  object Cache {
    val DefaultTtlMs: Long = 24L * 60 * 60 * 1000
    def empty: Cache = Cache(0L, DefaultTtlMs, Map.empty, "1.0")
  }

  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}

class PackRegistry(
    cachePath: Path,
    transport: PackRegistry.RegistryTransport = PackRegistry.NoTransport,
    baseUrls: Seq[String] = Seq("https://registry.example.com"),
    offlineMode: Boolean = false,
    retryConfig: PackRegistry.RetryConfig = PackRegistry.RetryConfig(),
    now: () => Instant = () => Instant.now(),
    sleeper: Long => Unit = ms => Thread.sleep(ms)) {
  import PackRegistry._

  val userAgent = "Graft-Registry-Client/1.0"

  private var cache: Cache = loadCache()

  def withOfflineMode(offline: Boolean): PackRegistry =
    new PackRegistry(cachePath, transport, baseUrls, offline, retryConfig,
      now, sleeper)

  // ===== cache persistence (registry.go:938-1001) =====================

  /** Load the cache from disk; a missing or corrupted file reinitializes
    * an empty cache rather than failing.
    */
  def loadCache(): Cache = {
    cache = if (!Files.exists(cachePath)) Cache.empty
    else try parseCache(Files.readString(cachePath))
    catch { case _: Exception => Cache.empty }
    cache
  }

  /** Persist atomically: write a temp file, then move over the target. */
  def saveCache(): Unit = {
    Files.createDirectories(cachePath.toAbsolutePath.getParent)
    val tmp = cachePath.resolveSibling(cachePath.getFileName.toString + ".tmp")
    Files.writeString(tmp, renderCache(cache))
    Files.move(tmp, cachePath, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  def clearCache(): Unit = {
    cache = Cache.empty
    saveCache()
  }

  def currentCache: Cache = cache
  private[compliance] def setCache(c: Cache): Unit = { cache = c }

  def getCacheInfo: Map[String, Any] =
    if (cache.packs.isEmpty && cache.lastUpdatedMs == 0L)
      Map("status" -> "empty")
    else Map(
      "last_updated" -> cache.lastUpdatedMs,
      "ttl" -> cache.ttlMs,
      "version" -> cache.version,
      "pack_count" -> cache.packs.size,
      "cache_path" -> cachePath.toString,
      "offline_mode" -> offlineMode)

  // ===== update (registry.go:259-297) =================================

  /** Refresh the cache from the configured registries. No-op when offline
    * or when the cache is younger than its TTL (unless forced). Transport
    * failures on individual registries are skipped, matching the
    * reference's continue-on-error fan-out.
    */
  def updateRegistry(forceRefresh: Boolean = false): Either[RegistryError, Unit] = {
    if (offlineMode) return Right(())
    val age = now().toEpochMilli - cache.lastUpdatedMs
    if (!forceRefresh && cache.lastUpdatedMs > 0 && age < cache.ttlMs)
      return Right(())
    val fetched = baseUrls.flatMap { url =>
      doWithRetry(() => transport.fetchIndex(url)) match {
        case Right(doc) => parseIndex(doc)
        case Left(_)    => Nil // continue with other registries
      }
    }
    cache = cache.copy(
      lastUpdatedMs = now().toEpochMilli,
      packs = cache.packs ++ fetched.map(p => p.namespace -> p))
    saveCache()
    Right(())
  }

  // ===== search (registry.go:563-698) =================================

  def searchPacks(criteria: SearchCriteria): SearchResult = {
    val t0 = System.nanoTime()
    if (!offlineMode) updateRegistry() // refresh if stale; cached on failure
    val matches0 = cache.packs.values.filter(matchesCriteria(_, criteria)).toSeq
    val sorted = sortPacks(matches0, criteria.sort, criteria.order)
    val total = sorted.size
    val page =
      if (criteria.limit <= 0) sorted
      else if (criteria.offset > sorted.size) Nil
      else sorted.slice(criteria.offset, criteria.offset + criteria.limit)
    SearchResult(page, total, criteria.limit, criteria.offset,
      criteria.query, (System.nanoTime() - t0) / 1000000)
  }

  /** Criteria semantics (registry.go:626-667): query is a lowercase
    * substring match over name/description/tags; provider exact;
    * framework/category membership; namespace prefix; every requested tag
    * must be present.
    */
  private[compliance] def matchesCriteria(pack: PackInfo,
      c: SearchCriteria): Boolean = {
    val q = c.query.toLowerCase
    (c.query.isEmpty ||
      pack.name.toLowerCase.contains(q) ||
      pack.description.toLowerCase.contains(q) ||
      pack.tags.exists(_.toLowerCase.contains(q))) &&
    (c.provider.isEmpty || pack.provider == c.provider) &&
    (c.framework.isEmpty || pack.frameworks.contains(c.framework)) &&
    (c.category.isEmpty || pack.categories.contains(c.category)) &&
    (c.namespace.isEmpty || pack.namespace.startsWith(c.namespace)) &&
    c.tags.forall(pack.tags.contains)
  }

  /** Sort by name | downloads | updated, asc | desc; defaults name asc
    * (registry.go:670-698).
    */
  private[compliance] def sortPacks(packs: Seq[PackInfo], sortBy: String,
      order: String): Seq[PackInfo] = {
    val asc = packs.sortWith { (a, b) =>
      sortBy match {
        case "downloads" => a.downloadsTotal < b.downloadsTotal
        case "updated"   => a.lastUpdatedMs < b.lastUpdatedMs
        case _           => a.name < b.name
      }
    }
    if (order == "desc") asc.reverse else asc
  }

  // ===== download + install (registry.go:700-775) =====================

  /** Resolve a version ("" or "latest" → first listed; else match version
    * or tag), fetch the bundle, verify its sha256 when the registry
    * provides one, materialize the files under destDir/namespace, and
    * load the resulting pack through [[PackLoader]].
    */
  def downloadPack(namespace: String, version: String,
      destDir: Path): Either[RegistryError, PackManifest] = {
    val packInfo = cache.packs.get(namespace) match {
      case Some(p) => p
      case None =>
        return Left(RegistryError("download", namespace,
          "pack not found in registry"))
    }
    val resolved =
      if (version.isEmpty || version == "latest") packInfo.versions.headOption
      else packInfo.versions.find(v => v.version == version || v.tag == version)
    val pv = resolved match {
      case Some(v) => v
      case None =>
        return Left(RegistryError("download", namespace,
          s"version $version not found"))
    }
    doWithRetry(() => transport.fetchBundle(pv.downloadUrl)).flatMap { bundle =>
      if (pv.checksum.nonEmpty && sha256Hex(bundle) != pv.checksum)
        Left(RegistryError("verify", pv.downloadUrl,
          s"checksum mismatch: expected ${pv.checksum}, got ${sha256Hex(bundle)}"))
      else {
        val extractDir = destDir.resolve(namespace)
        extractBundle(bundle, extractDir)
        try Right(PackLoader.load(extractDir.resolve("manifest.yaml")))
        catch { case e: Exception =>
          Left(RegistryError("install", namespace, "pack load failed", Some(e)))
        }
      }
    }
  }

  /** Write a bundle's files under destDir, refusing path traversal
    * (registry.go:869-880's prefix guard).
    */
  private def extractBundle(bundle: String, destDir: Path): Unit = {
    Files.createDirectories(destDir)
    val yaml = new org.yaml.snakeyaml.Yaml()
    val files = yaml.load[java.util.Map[String, Object]](bundle).asScala
    files.foreach { case (rel, content) =>
      val target = destDir.resolve(rel).normalize()
      if (target.startsWith(destDir.normalize())) {
        Files.createDirectories(target.getParent)
        Files.writeString(target, String.valueOf(content))
      }
    }
  }

  // ===== retry (registry.go:913-936) ==================================

  /** Retry with exponential backoff: maxRetries + 1 total attempts, delay
    * multiplied by the backoff factor after each failure.
    */
  private[compliance] def doWithRetry[A](
      f: () => Either[RegistryError, A]): Either[RegistryError, A] = {
    var delay = retryConfig.retryDelayMs
    var last: Either[RegistryError, A] = null
    var attempt = 0
    while (attempt <= retryConfig.maxRetries) {
      if (attempt > 0) {
        sleeper(delay)
        delay = (delay * retryConfig.backoff).toLong
      }
      last = f()
      if (last.isRight) return last
      attempt += 1
    }
    last
  }

  // ===== serialization (YAML; the cache file shape) ===================

  private def packToMap(p: PackInfo): java.util.Map[String, Object] = {
    val m = new java.util.LinkedHashMap[String, Object]()
    m.put("name", p.name); m.put("namespace", p.namespace)
    m.put("description", p.description); m.put("provider", p.provider)
    m.put("frameworks", p.frameworks.asJava); m.put("tags", p.tags.asJava)
    m.put("categories", p.categories.asJava)
    m.put("maintainers", p.maintainers.asJava)
    m.put("downloads_total", java.lang.Long.valueOf(p.downloadsTotal))
    m.put("last_updated_ms", java.lang.Long.valueOf(p.lastUpdatedMs))
    m.put("latest_version", p.latestVersion)
    m.put("versions", p.versions.map { v =>
      val vm = new java.util.LinkedHashMap[String, Object]()
      vm.put("version", v.version); vm.put("tag", v.tag)
      vm.put("release_date_ms", java.lang.Long.valueOf(v.releaseDateMs))
      vm.put("checksum", v.checksum)
      vm.put("size", java.lang.Long.valueOf(v.size))
      vm.put("download_url", v.downloadUrl)
      vm.put("deprecated", java.lang.Boolean.valueOf(v.deprecated))
      vm
    }.asJava)
    m
  }

  private def packFromMap(m: Map[String, Object]): PackInfo = {
    def str(k: String) = m.get(k).map(String.valueOf).getOrElse("")
    def lng(k: String) = m.get(k).collect { case n: Number => n.longValue }.getOrElse(0L)
    def strs(k: String) = Option(m.getOrElse(k, null))
      .map(_.asInstanceOf[java.util.List[Object]].asScala.toSeq.map(String.valueOf))
      .getOrElse(Nil)
    PackInfo(str("name"), str("namespace"), str("description"),
      str("provider"), strs("frameworks"), strs("tags"), strs("categories"),
      strs("maintainers"), lng("downloads_total"), lng("last_updated_ms"),
      str("latest_version"),
      Option(m.getOrElse("versions", null))
        .map(_.asInstanceOf[java.util.List[java.util.Map[String, Object]]]
          .asScala.toSeq.map { vm0 =>
            val vm = vm0.asScala.toMap
            def vstr(k: String) = vm.get(k).map(String.valueOf).getOrElse("")
            def vlng(k: String) =
              vm.get(k).collect { case n: Number => n.longValue }.getOrElse(0L)
            PackVersion(vstr("version"), vstr("tag"), vlng("release_date_ms"),
              vstr("checksum"), vlng("size"), vstr("download_url"),
              vm.get("deprecated").contains(java.lang.Boolean.TRUE))
          })
        .getOrElse(Nil))
  }

  private def renderCache(c: Cache): String = {
    val root = new java.util.LinkedHashMap[String, Object]()
    root.put("last_updated_ms", java.lang.Long.valueOf(c.lastUpdatedMs))
    root.put("ttl_ms", java.lang.Long.valueOf(c.ttlMs))
    root.put("version", c.version)
    root.put("packs", c.packs.toSeq.sortBy(_._1).map(_._2)
      .map(packToMap).asJava)
    new org.yaml.snakeyaml.Yaml().dump(root)
  }

  private def parseCache(s: String): Cache = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = yaml.load[java.util.Map[String, Object]](s).asScala.toMap
    def lng(k: String) =
      root.get(k).collect { case n: Number => n.longValue }.getOrElse(0L)
    val packs = Option(root.getOrElse("packs", null))
      .map(_.asInstanceOf[java.util.List[java.util.Map[String, Object]]]
        .asScala.toSeq.map(pm => packFromMap(pm.asScala.toMap)))
      .getOrElse(Nil)
    Cache(lng("last_updated_ms"),
      if (lng("ttl_ms") > 0) lng("ttl_ms") else Cache.DefaultTtlMs,
      packs.map(p => p.namespace -> p).toMap,
      root.get("version").map(String.valueOf).getOrElse("1.0"))
  }

  /** Parse a registry index document: a YAML list of pack entries in the
    * cache shape.
    */
  private def parseIndex(doc: String): Seq[PackInfo] =
    try {
      val yaml = new org.yaml.snakeyaml.Yaml()
      Option(yaml.load[java.util.List[java.util.Map[String, Object]]](doc))
        .map(_.asScala.toSeq.map(pm => packFromMap(pm.asScala.toMap)))
        .getOrElse(Nil)
    } catch { case _: Exception => Nil }
}
