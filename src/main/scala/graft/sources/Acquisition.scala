package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import scala.util.matching.Regex

/** Driver-side acquisition layer (SURVEY §2.1 S1-S3, §2.9 X12-X15).
  *
  * The reference scrapes the CPC bulk-download page, extracts `.zip` hrefs,
  * resolves the latest 6-digit version, and streams downloads with a
  * skip-if-exists guard (reference: src/cpc_etl/downloader.py:34-176). This
  * is cross-machine I/O, not dataflow, so it stays plain Scala on the driver
  * — Spark reads the landed files.
  *
  * `PageFetcher` abstracts the two network touch points so tests inject
  * fixtures (the reference's own tests fully mock `requests`,
  * tests/test_downloader.py:32-53), and so the zero-egress build never dials
  * out. The intended `--force` flag (broken in the reference —
  * orchestrator.py:65 passes a kwarg `download_bulk_files` doesn't accept) is
  * implemented working here, per SURVEY §3 E2.
  */
trait PageFetcher {
  /** GET the bulk page HTML. */
  def fetchPage(url: String): String
  /** Stream a file URL to a local path. */
  def fetchFile(url: String, dest: Path): Unit
}

class Acquisition(fetcher: PageFetcher,
    baseUrl: String = "https://www.cooperativepatentclassification.org",
    rawDir: Path = Paths.get("data", "raw")) {

  val bulkPageUrl = s"$baseUrl/cpcSchemeAndDefinitions/bulk"
  private val hrefRe: Regex = """(?i)<a\s[^>]*href=["']([^"']+)["']""".r
  private val versionRe: Regex = """(\d{6})""".r

  private lazy val zipHrefs: Seq[String] =
    hrefRe.findAllMatchIn(fetcher.fetchPage(bulkPageUrl)).map(_.group(1))
      .filter(_.endsWith(".zip")).toSeq

  /** All 6-digit versions on the page, ascending (downloader.py:34-61). */
  lazy val availableVersions: Seq[String] = {
    val vs = zipHrefs.flatMap(h => versionRe.findFirstMatchIn(h).map(_.group(1))).distinct.sorted
    if (vs.isEmpty) throw new RuntimeException("No CPC versions found on download page")
    vs
  }

  /** Latest version, preferring an already-landed one unless the page has
    * newer (downloader.py:63-99). Lexicographic max == chronological for
    * zero-padded YYYYMM. */
  lazy val version: String = {
    val latestAvailable = availableVersions.last
    val existing =
      if (Files.isDirectory(rawDir))
        Files.list(rawDir).iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".zip"))
          .flatMap(n => versionRe.findFirstMatchIn(n).map(_.group(1))).toSeq
      else Seq.empty
    if (existing.isEmpty) latestAvailable
    else { val latestExisting = existing.max
      if (latestAvailable > latestExisting) latestAvailable else latestExisting }
  }

  /** filename -> absolute URL for the current version (downloader.py:101-129). */
  lazy val availableFiles: Map[String, String] =
    zipHrefs.filter(_.contains(version)).map { h =>
      val abs = if (h.startsWith("/")) s"$baseUrl$h" else h
      abs.split("/").last -> abs
    }.toMap

  def checkFileAvailability(): Boolean =
    try availableFiles.nonEmpty catch { case _: Exception => false }

  /** Download all files for the version; skip-if-exists unless `force`
    * (downloader.py:131-167 + the fixed force semantics). */
  def downloadBulkFiles(force: Boolean = false): Seq[Path] = {
    if (availableFiles.isEmpty) throw new RuntimeException("No files found for download")
    Files.createDirectories(rawDir)
    availableFiles.toSeq.sortBy(_._1).map { case (name, url) =>
      val dest = rawDir.resolve(name)
      if (force || !Files.exists(dest)) fetcher.fetchFile(url, dest)
      dest
    }
  }
}

/** Fixture-backed fetcher for tests / offline runs: serves a local HTML file
  * and copies local zips instead of dialing out. */
class LocalFixtureFetcher(pageHtml: String, files: Map[String, Path]) extends PageFetcher {
  override def fetchPage(url: String): String = pageHtml
  override def fetchFile(url: String, dest: Path): Unit = {
    val name = url.split("/").last
    files.get(name).foreach(src => Files.copy(src, dest, StandardCopyOption.REPLACE_EXISTING))
  }
}

/** Production fetcher over `java.net.http.HttpClient`: the reference streams
  * downloads in 8 KiB chunks to disk (downloader.py:150-167); here the
  * response body is exposed as an InputStream and streamed straight to a
  * temp file, then atomically moved into place — a partial download can
  * never be mistaken for a landed file by the skip-if-exists guard.
  * Integration-tested against an in-process localhost server
  * (HttpFetcherSpec); never dials out during CI. */
class HttpPageFetcher(
    connectTimeout: java.time.Duration = java.time.Duration.ofSeconds(20),
    requestTimeout: java.time.Duration = java.time.Duration.ofMinutes(10)) extends PageFetcher {
  import java.net.URI
  import java.net.http.{HttpClient, HttpRequest, HttpResponse}

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(connectTimeout)
    .build()

  private def request(url: String): HttpRequest =
    HttpRequest.newBuilder(URI.create(url)).timeout(requestTimeout).GET().build()

  private def ensure2xx(url: String, status: Int): Unit =
    if (status < 200 || status >= 300)
      throw new RuntimeException(s"GET $url failed: HTTP $status")

  override def fetchPage(url: String): String = {
    val resp = client.send(request(url), HttpResponse.BodyHandlers.ofString())
    ensure2xx(url, resp.statusCode())
    resp.body()
  }

  override def fetchFile(url: String, dest: Path): Unit = {
    val resp = client.send(request(url), HttpResponse.BodyHandlers.ofInputStream())
    ensure2xx(url, resp.statusCode())
    val tmp = Files.createTempFile(
      Option(dest.getParent).getOrElse(Paths.get(".")), s".${dest.getFileName}.", ".part")
    try {
      val in = resp.body()
      try Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING) finally in.close()
      try Files.move(tmp, dest, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(tmp, dest, StandardCopyOption.REPLACE_EXISTING) }
    } finally Files.deleteIfExists(tmp)
  }
}
