package graft.compliance

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import PackRegistry.{RegistryError, RegistryTransport}

/** HTTP [[PackRegistry.RegistryTransport]] — the live half of the
  * registry client (reference: pkg/query/compliance/registry.go:257-318
  * fetches the registry document and release bundles over HTTP with a
  * client timeout and a User-Agent header; :913-936's retry wraps it).
  *
  * URL contract: the registry index is served at
  * `<baseUrl>/index.yaml`; bundle URLs come verbatim from each
  * version's `download_url`. Errors — non-2xx statuses, timeouts,
  * connection failures — surface as Left(RegistryError), which the
  * client's retry/backoff loop (and its continue-on-error registry
  * fan-out) already handles; the transport itself never retries.
  */
final class HttpTransport(
    timeoutMs: Long = 30000L,
    userAgent: String = "Graft-Registry-Client/1.0") extends RegistryTransport {

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  private def get(operation: String, url: String): Either[RegistryError, String] =
    try {
      val req = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMillis(timeoutMs))
        .header("User-Agent", userAgent)
        .header("Accept", "application/x-yaml, text/plain")
        .GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 200 && resp.statusCode() < 300)
        Right(resp.body())
      else Left(RegistryError(operation, url, s"HTTP ${resp.statusCode()}"))
    } catch {
      case e: InterruptedException => throw e
      case e: Exception =>
        Left(RegistryError(operation, url,
          Option(e.getMessage).getOrElse(e.getClass.getSimpleName), Some(e)))
    }

  def fetchIndex(baseUrl: String): Either[RegistryError, String] =
    get("fetch", baseUrl.stripSuffix("/") + "/index.yaml")

  def fetchBundle(url: String): Either[RegistryError, String] =
    get("download", url)
}
