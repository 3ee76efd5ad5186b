package graft.compliance

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import java.time.Instant
import PackRegistry._

/** Registry semantics pinned against the reference's
  * registry_test.go:16-620 — search filtering, sorting, pagination,
  * cache save/load/clear, offline mode, retry with backoff, cache info,
  * and the download → checksum → install path.
  */
class PackRegistrySpec extends AnyFunSuite {

  private def tmpDir(): Path = graft.SparkSpec.tempDir("graft-registry")
  private def client(cachePath: Path,
      transport: RegistryTransport = NoTransport,
      offline: Boolean = true,
      retry: RetryConfig = RetryConfig(retryDelayMs = 1L),
      nowMs: () => Long = () => 1700000000000L): PackRegistry =
    new PackRegistry(cachePath, transport, Seq("https://reg.example"),
      offline, retry, () => Instant.ofEpochMilli(nowMs()), _ => ())

  private val now = 1700000000000L

  private def seedTwoPacks(c: PackRegistry): Unit = c.setCache(Cache(
    lastUpdatedMs = now, ttlMs = Cache.DefaultTtlMs, version = "1.0",
    packs = Map(
      "test-org/aws-security" -> PackInfo(
        name = "aws-security", namespace = "test-org/aws-security",
        description = "AWS security compliance pack", provider = "aws",
        frameworks = Seq("ccc", "nist"), tags = Seq("security", "aws"),
        categories = Seq("security"), lastUpdatedMs = now),
      "test-org/azure-compliance" -> PackInfo(
        name = "azure-compliance", namespace = "test-org/azure-compliance",
        description = "Azure compliance pack", provider = "azure",
        frameworks = Seq("iso27001"), tags = Seq("compliance", "azure"),
        categories = Seq("governance"), lastUpdatedMs = now))))

  test("client defaults (registry_test.go:16-30)") {
    val c = client(tmpDir().resolve("registry.yaml"))
    assert(c.userAgent == "Graft-Registry-Client/1.0")
    assert(RetryConfig().maxRetries == 3)
    assert(c.getCacheInfo("status") == "empty")
  }

  test("searchPacks filters (registry_test.go:32-119)") {
    val c = client(tmpDir().resolve("registry.yaml"))
    seedTwoPacks(c)
    val cases: Seq[(SearchCriteria, Int)] = Seq(
      SearchCriteria() -> 2,
      SearchCriteria(provider = "aws") -> 1,
      SearchCriteria(framework = "ccc") -> 1,
      SearchCriteria(tags = Seq("security")) -> 1,
      SearchCriteria(query = "azure") -> 1,
      SearchCriteria(provider = "gcp") -> 0)
    cases.foreach { case (crit, expected) =>
      val r = c.searchPacks(crit)
      assert(r.packs.size == expected, s"criteria $crit")
      assert(r.total == expected, s"criteria $crit total")
    }
  }

  test("matchesCriteria table (registry_test.go:515-607)") {
    val c = client(tmpDir().resolve("registry.yaml"))
    val pack = PackInfo(
      name = "aws-security", namespace = "org/aws-security",
      description = "AWS security compliance pack", provider = "aws",
      frameworks = Seq("ccc", "nist"), tags = Seq("security", "compliance"),
      categories = Seq("security"))
    val cases: Seq[(SearchCriteria, Boolean)] = Seq(
      SearchCriteria() -> true,
      SearchCriteria(query = "aws") -> true,       // matches name
      SearchCriteria(query = "security") -> true,  // matches description
      SearchCriteria(query = "compliance") -> true, // matches tag
      SearchCriteria(query = "azure") -> false,
      SearchCriteria(provider = "aws") -> true,
      SearchCriteria(provider = "azure") -> false,
      SearchCriteria(framework = "ccc") -> true,
      SearchCriteria(framework = "iso27001") -> false,
      SearchCriteria(category = "security") -> true,
      SearchCriteria(namespace = "org") -> true,   // prefix
      SearchCriteria(tags = Seq("security")) -> true,
      SearchCriteria(tags = Seq("security", "missing")) -> false)
    cases.foreach { case (crit, expected) =>
      assert(c.matchesCriteria(pack, crit) == expected, s"criteria $crit")
    }
  }

  test("search sorting (registry_test.go:274-361)") {
    val c = client(tmpDir().resolve("registry.yaml"))
    c.setCache(Cache(now, Cache.DefaultTtlMs, Map(
      "test/alpha" -> PackInfo(name = "alpha", namespace = "test/alpha",
        lastUpdatedMs = now - 2 * 3600 * 1000, downloadsTotal = 100),
      "test/beta" -> PackInfo(name = "beta", namespace = "test/beta",
        lastUpdatedMs = now - 1 * 3600 * 1000, downloadsTotal = 200),
      "test/gamma" -> PackInfo(name = "gamma", namespace = "test/gamma",
        lastUpdatedMs = now, downloadsTotal = 50)), "1.0"))
    val cases: Seq[(String, String, Seq[String])] = Seq(
      ("name", "asc", Seq("alpha", "beta", "gamma")),
      ("name", "desc", Seq("gamma", "beta", "alpha")),
      ("downloads", "desc", Seq("beta", "alpha", "gamma")),
      ("updated", "desc", Seq("gamma", "beta", "alpha")))
    cases.foreach { case (sort, order, expected) =>
      val r = c.searchPacks(SearchCriteria(sort = sort, order = order))
      assert(r.packs.map(_.name) == expected, s"sort=$sort order=$order")
    }
  }

  test("search pagination (registry_test.go:363-423)") {
    val c = client(tmpDir().resolve("registry.yaml"))
    val packs = (0 until 10).map { i =>
      val name = f"pack-$i%02d"
      s"test/$name" -> PackInfo(name = name, namespace = s"test/$name",
        provider = "aws")
    }.toMap
    c.setCache(Cache(now, Cache.DefaultTtlMs, packs, "1.0"))
    val r = c.searchPacks(SearchCriteria(
      limit = 3, offset = 2, sort = "name", order = "asc"))
    assert(r.total == 10)
    assert(r.limit == 3 && r.offset == 2)
    assert(r.packs.map(_.name) == Seq("pack-02", "pack-03", "pack-04"))
  }

  test("cache save / load / clear roundtrip (registry_test.go:199-256)") {
    val path = tmpDir().resolve("test-registry.yaml")
    val c = client(path)
    c.setCache(Cache(now, Cache.DefaultTtlMs, Map(
      "test/pack" -> PackInfo(name = "test-pack", namespace = "test/pack",
        provider = "aws", versions = Seq(PackVersion("1.2.0", tag = "v1.2.0",
          checksum = "abc", downloadUrl = "u")))), "1.0"))
    c.saveCache()
    assert(Files.exists(path))

    val reloaded = c.loadCache()
    assert(reloaded.packs.size == 1)
    val p = reloaded.packs("test/pack")
    assert(p.name == "test-pack" && p.provider == "aws")
    assert(p.versions == Seq(PackVersion("1.2.0", tag = "v1.2.0",
      checksum = "abc", downloadUrl = "u")))

    c.clearCache()
    assert(c.currentCache.packs.isEmpty)
    assert(c.loadCache().packs.isEmpty) // clear persisted too
  }

  test("corrupted cache file reinitializes instead of failing") {
    val path = tmpDir().resolve("registry.yaml")
    Files.writeString(path, "{{{{ not valid yaml")
    val c = client(path)
    assert(c.currentCache.packs.isEmpty)
  }

  test("offline mode never touches the transport (registry_test.go:258-272)") {
    var called = 0
    val spy = new RegistryTransport {
      def fetchIndex(u: String) = { called += 1; Right("[]") }
      def fetchBundle(u: String) = { called += 1; Right("{}") }
    }
    val c = client(tmpDir().resolve("registry.yaml"), spy, offline = true)
    assert(c.updateRegistry(forceRefresh = true).isRight)
    c.searchPacks(SearchCriteria())
    assert(called == 0)
  }

  test("updateRegistry fetches, merges, persists, and honors TTL") {
    val path = tmpDir().resolve("registry.yaml")
    var calls = 0
    val index =
      """- name: test-pack
        |  namespace: test-org/test-pack
        |  description: Test compliance pack
        |  provider: aws
        |  versions:
        |    - version: 1.0.0
        |      tag: v1.0.0
        |""".stripMargin
    val transport = new RegistryTransport {
      def fetchIndex(u: String) = { calls += 1; Right(index) }
      def fetchBundle(u: String) = Left(RegistryError("download", u, "n/a"))
    }
    var clock = now
    val c = client(path, transport, offline = false, nowMs = () => clock)
    assert(c.updateRegistry(forceRefresh = true).isRight)
    assert(calls == 1)
    assert(Files.exists(path))
    assert(c.currentCache.packs.contains("test-org/test-pack"))

    // within TTL: no refetch
    clock += 1000
    assert(c.updateRegistry().isRight)
    assert(calls == 1)
    // past TTL: refetch
    clock += Cache.DefaultTtlMs
    assert(c.updateRegistry().isRight)
    assert(calls == 2)
  }

  test("retry: fails twice, succeeds on third attempt (registry_test.go:472-513)") {
    var attempts = 0
    var slept = Seq.empty[Long]
    val c = new PackRegistry(tmpDir().resolve("registry.yaml"), NoTransport,
      Nil, false, RetryConfig(maxRetries = 3, retryDelayMs = 10, backoff = 1.5),
      () => Instant.ofEpochMilli(now), ms => slept :+= ms)
    val r = c.doWithRetry { () =>
      attempts += 1
      if (attempts <= 2) Left(RegistryError("fetch", "u", "HTTP 500"))
      else Right("ok")
    }
    assert(r == Right("ok"))
    assert(attempts == 3)
    assert(slept == Seq(10L, 15L)) // exponential backoff applied
  }

  test("retry exhausts and returns the last error") {
    val c = client(tmpDir().resolve("registry.yaml"),
      retry = RetryConfig(maxRetries = 2, retryDelayMs = 1))
    var attempts = 0
    val r = c.doWithRetry { () =>
      attempts += 1
      Left(RegistryError("fetch", "u", s"HTTP 500 #$attempts"))
    }
    assert(attempts == 3) // initial + 2 retries
    assert(r.swap.toOption.get.message == "HTTP 500 #3")
  }

  test("getCacheInfo (registry_test.go:425-470)") {
    val c = client(tmpDir().resolve("registry.yaml"))
    assert(c.getCacheInfo("status") == "empty")
    c.setCache(Cache(now, Cache.DefaultTtlMs, Map(
      "test/pack1" -> PackInfo(name = "pack1", namespace = "test/pack1"),
      "test/pack2" -> PackInfo(name = "pack2", namespace = "test/pack2")),
      "1.0"))
    val info = c.getCacheInfo
    assert(info("pack_count") == 2)
    assert(info("version") == "1.0")
    assert(info("offline_mode") == true)
  }

  // ===== download → checksum → install ================================

  private val bundleYaml: String = {
    val manifest =
      """apiVersion: v1
        |kind: QueryPack
        |metadata:
        |  name: mini
        |  namespace: test-org/minipack
        |  version: 1.0.0
        |  description: minimal pack
        |  provider: aws
        |spec:
        |  queries:
        |    - id: Q1
        |      title: one
        |      severity: LOW
        |      category: security
        |      query_file: queries/q1.sql
        |      enabled: true
        |""".stripMargin
    val m = new java.util.LinkedHashMap[String, Object]()
    m.put("manifest.yaml", manifest)
    m.put("queries/q1.sql", "SELECT 1 AS ok")
    new org.yaml.snakeyaml.Yaml().dump(m)
  }

  private def downloadClient(dest: Path, checksum: String): PackRegistry = {
    val transport = new RegistryTransport {
      def fetchIndex(u: String) = Left(RegistryError("fetch", u, "n/a"))
      def fetchBundle(u: String) =
        if (u == "bundle://minipack/1.0.0") Right(bundleYaml)
        else Left(RegistryError("download", u, "404"))
    }
    val c = client(dest.resolve("registry.yaml"), transport, offline = true)
    c.setCache(Cache(now, Cache.DefaultTtlMs, Map(
      "test-org/minipack" -> PackInfo(
        name = "minipack", namespace = "test-org/minipack", provider = "aws",
        latestVersion = "1.0.0",
        versions = Seq(PackVersion("1.0.0", tag = "v1.0.0",
          checksum = checksum, downloadUrl = "bundle://minipack/1.0.0")))),
      "1.0"))
    c
  }

  test("downloadPack installs latest through the loader path") {
    val dir = tmpDir()
    val c = downloadClient(dir, PackRegistry.sha256Hex(bundleYaml))
    val r = c.downloadPack("test-org/minipack", "latest", dir.resolve("packs"))
    assert(r.isRight, r)
    val m = r.toOption.get
    assert(m.fullName == "test-org/minipack/mini")
    assert(m.queries.head.sql.contains("SELECT 1"))
    assert(Files.exists(
      dir.resolve("packs/test-org/minipack/queries/q1.sql")))
  }

  test("downloadPack resolves a specific version by tag") {
    val dir = tmpDir()
    val c = downloadClient(dir, "")
    assert(c.downloadPack("test-org/minipack", "v1.0.0",
      dir.resolve("packs")).isRight)
  }

  test("downloadPack errors: unknown pack, unknown version, checksum mismatch") {
    val dir = tmpDir()
    val c = downloadClient(dir, "deadbeef")
    val missing = c.downloadPack("test-org/nope", "latest", dir)
    assert(missing.swap.toOption.get.message == "pack not found in registry")
    val badVer = c.downloadPack("test-org/minipack", "9.9.9", dir)
    assert(badVer.swap.toOption.get.message == "version 9.9.9 not found")
    val badSum = c.downloadPack("test-org/minipack", "latest", dir)
    assert(badSum.swap.toOption.get.operation == "verify")
  }

  test("bundle extraction refuses path traversal") {
    val dir = tmpDir()
    val evil = {
      val m = new java.util.LinkedHashMap[String, Object]()
      m.put("../escape.txt", "nope")
      m.put("manifest.yaml", "apiVersion: v1")
      new org.yaml.snakeyaml.Yaml().dump(m)
    }
    val transport = new RegistryTransport {
      def fetchIndex(u: String) = Left(RegistryError("fetch", u, "n/a"))
      def fetchBundle(u: String) = Right(evil)
    }
    val c = client(dir.resolve("registry.yaml"), transport, offline = true)
    c.setCache(Cache(now, Cache.DefaultTtlMs, Map(
      "t/p" -> PackInfo(name = "p", namespace = "t/p",
        versions = Seq(PackVersion("1.0.0", downloadUrl = "u")))), "1.0"))
    c.downloadPack("t/p", "latest", dir.resolve("packs"))
    assert(!Files.exists(dir.resolve("packs/t/escape.txt")))
    assert(!Files.exists(dir.resolve("packs/escape.txt")))
  }
}
