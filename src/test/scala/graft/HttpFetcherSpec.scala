package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.{Acquisition, HttpPageFetcher}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite

/** Integration test for the production HttpPageFetcher against an
  * in-process localhost HTTP server serving the fixture zips — real
  * sockets, zero egress. Covers: page fetch + href/version extraction,
  * streamed file download, skip-if-exists, --force re-download, redirect
  * following, and non-2xx failure. */
class HttpFetcherSpec extends AnyFunSuite {

  private def withServer(test: (String, java.nio.file.Path, AtomicInteger) => Unit): Unit = {
    val fixtures = CpcFixtures.dataDir()
    val hits = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    val page =
      s"""<html><body>
         |<a href="/bulk/CPCTitleList${CpcFixtures.Version}.zip">titles</a>
         |<a href="/bulk/CPCSymbolList${CpcFixtures.Version}.zip">symbols</a>
         |<a href="/bulk/CPCValidityFile${CpcFixtures.Version}.zip">validity</a>
         |<a href="/bulk/CPCSchemeXML${CpcFixtures.Version}.zip">scheme</a>
         |<a href="/other/notazip.txt">ignored</a>
         |</body></html>""".stripMargin
    def respond(ex: HttpExchange, code: Int, body: Array[Byte]): Unit = {
      ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) ex.getResponseBody.write(body)
      ex.close()
    }
    server.createContext("/cpcSchemeAndDefinitions/bulk", (ex: HttpExchange) =>
      respond(ex, 200, page.getBytes(StandardCharsets.UTF_8)))
    server.createContext("/bulk/", { (ex: HttpExchange) =>
      val name = ex.getRequestURI.getPath.split("/").last
      val f = fixtures.resolve(name)
      if (Files.exists(f)) { hits.incrementAndGet(); respond(ex, 200, Files.readAllBytes(f)) }
      else respond(ex, 404, Array.empty)
    })
    // 302 -> the real page, to prove redirect following
    server.createContext("/redirected", { (ex: HttpExchange) =>
      ex.getResponseHeaders.add("Location", s"$base/cpcSchemeAndDefinitions/bulk")
      respond(ex, 302, Array.empty)
    })
    server.start()
    try test(base, fixtures, hits) finally server.stop(0)
  }

  test("end-to-end acquisition over real HTTP: page scan, versions, streamed downloads") {
    withServer { (base, fixtures, hits) =>
      val rawDir = Files.createTempDirectory("http-raw")
      val acq = new Acquisition(new HttpPageFetcher(), baseUrl = base, rawDir = rawDir)
      assert(acq.availableVersions == Seq(CpcFixtures.Version))
      assert(acq.version == CpcFixtures.Version)
      assert(acq.availableFiles.keySet == Set(
        s"CPCTitleList${CpcFixtures.Version}.zip",
        s"CPCSymbolList${CpcFixtures.Version}.zip",
        s"CPCValidityFile${CpcFixtures.Version}.zip",
        s"CPCSchemeXML${CpcFixtures.Version}.zip"))
      val landed = acq.downloadBulkFiles()
      assert(landed.size == 4 && landed.forall(Files.exists(_)))
      assert(hits.get() == 4)
      // byte-identical to the served fixtures (streamed, not truncated)
      landed.foreach { p =>
        val want = Files.readAllBytes(fixtures.resolve(p.getFileName.toString))
        assert(java.util.Arrays.equals(Files.readAllBytes(p), want), s"bytes differ: $p")
      }
      // skip-if-exists: no new server hits
      acq.downloadBulkFiles()
      assert(hits.get() == 4)
      // --force: all four re-fetched
      acq.downloadBulkFiles(force = true)
      assert(hits.get() == 8)
      // no .part litter left behind
      assert(Files.list(rawDir).iterator().asScala.forall(!_.getFileName.toString.endsWith(".part")))
    }
  }

  test("fetcher follows redirects and raises on non-2xx") {
    withServer { (base, _, _) =>
      val f = new HttpPageFetcher()
      assert(f.fetchPage(s"$base/redirected").contains("CPCTitleList"))
      val err = intercept[RuntimeException](f.fetchPage(s"$base/bulk/nope.zip"))
      assert(err.getMessage.contains("404"))
      val errDl = intercept[RuntimeException] {
        f.fetchFile(s"$base/bulk/nope.zip", Files.createTempDirectory("dl").resolve("x.zip"))
      }
      assert(errDl.getMessage.contains("404"))
    }
  }

  private implicit class IterOps[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
  }
}
