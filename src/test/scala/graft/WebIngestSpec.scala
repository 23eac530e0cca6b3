package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-page tests for [[graft.operators.HtmlExtract]] and framing /
  * determinism tests for [[graft.sources.WarcSource]] — the web-crawl
  * ingestion tier (round 18). The q480-q483 rows prove the corpus-scale
  * oracle match; these pin the RULES on hand-planted HTML and the WARC
  * container's byte-level contracts. */
class WebIngestSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def extractOne(html: String): (String, Long, Long) = {
    val df = graft.operators.HtmlExtract.extract(
      Seq((1L, html)).toDF("id", "html"), "html")
    val r = df.select("text", "n_blocks", "n_boiler").head()
    (r.getString(0), r.getLong(1), r.getLong(2))
  }

  test("script/style/noscript/comment subtrees and <head> are stripped wholesale") {
    val (text, _, _) = extractOne(
      "<html><head><title>T</title><style>p{}</style></head><body>" +
        "<script>var leak = 'script text must never surface';</script>" +
        "<!-- comment text must never surface -->" +
        "<noscript>noscript text must never surface</noscript>" +
        "<p>this is the one real paragraph with more than ten words in it</p>" +
        "</body></html>")
    assert(text == "this is the one real paragraph with more than ten words in it")
  }

  test("word gate: short blocks drop, long blocks keep, counts are exact") {
    val (text, nBlocks, nBoiler) = extractOne(
      "<div>too short</div>" +
        "<p>alpha beta gamma delta epsilon zeta eta theta iota kappa</p>" +
        "<div>Copyright 2026 Example Corp</div>")
    assert(text == "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    assert(nBlocks == 1L && nBoiler == 2L)
  }

  test("link density: a 24-word all-link block drops despite passing the word gate") {
    val related = (1 to 12)
      .map(i => s"""<a href="/r$i">related item</a>""").mkString(" ")
    val (text, _, nBoiler) = extractOne(
      s"""<div class="related">$related</div>""" +
        "<p>one two three four five six seven eight nine ten eleven</p>")
    assert(text == "one two three four five six seven eight nine ten eleven")
    assert(nBoiler == 1L)
  }

  test("mixed block keeps: link words count toward text but density stays under 1/3") {
    val (text, nBlocks, _) = extractOne(
      "<p>read the full analysis of the quarterly numbers at " +
        """<a href="/report">annual report</a> before the meeting</p>""")
    assert(text == "read the full analysis of the quarterly numbers at " +
      "annual report before the meeting")
    assert(nBlocks == 1L)
  }

  test("entities decode AFTER tag stripping; &amp; decodes last") {
    val (text, _, _) = extractOne(
      "<p>tips &amp; tricks for &lt;html&gt; parsing &amp;lt;escaped&amp;gt; " +
        "entities in this ten word paragraph body</p>")
    assert(text == "tips & tricks for <html> parsing &lt;escaped&gt; " +
      "entities in this ten word paragraph body")
  }

  test("numeric character references decode: decimal, hex, supplementary, invalid") {
    val (text, _, _) = extractOne(
      "<p>em&#8212;dash and don&#x27;t and emoji &#128512; plus the " +
        "invalid &#xD800; and &#0; stay literal here verbatim</p>")
    assert(text == "em—dash and don't and emoji 😀 plus the " +
      "invalid &#xD800; and &#0; stay literal here verbatim")
  }

  test("numeric refs keep single-pass semantics: &#38;lt; lands as &lt;") {
    val (text, _, _) = extractOne(
      "<p>the escaped marker &#38;lt; survives as literal entity " +
        "text in this twelve word paragraph</p>")
    assert(text == "the escaped marker &lt; survives as literal entity " +
      "text in this twelve word paragraph")
  }

  test("every entity decodes exactly once: &#38;amp; lands as &amp;, never &") {
    // the r19 shape ran a global &amp;-replace AFTER the numeric pass, so
    // &#38;amp; double-decoded to '&'; the folded single-scan kernel
    // resumes after each decoded token (ADVICE r19 #2)
    val (text, _, _) = extractOne(
      "<p>the doubly escaped marker &#38;amp; must surface as literal " +
        "ampersand entity in this paragraph</p>")
    assert(text == "the doubly escaped marker &amp; must surface as literal " +
      "ampersand entity in this paragraph")
    import graft.expressions.DecodeHtmlNumRefs.decode_html_num_refs
    val r = Seq("a &amp;lt; b &#38;amp; c &amp; d").toDF("s")
      .select(decode_html_num_refs(col("s"))).head().getString(0)
    assert(r == "a &lt; b &amp; c & d")
  }

  test("empty and all-boilerplate pages extract to empty text") {
    assert(extractOne("")._1 == "")
    val (text, nBlocks, _) = extractOne(
      "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav><div>tiny</div>")
    assert(text == "" && nBlocks == 0L)
  }

  test("warc export is deterministic: two exports are byte-identical, gz and plain") {
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "epsilon"))
      .toDF("doc_id", "text")
    for (gz <- Seq(false, true)) {
      val d1 = java.nio.file.Files.createTempDirectory("warc-det1").toString
      val d2 = java.nio.file.Files.createTempDirectory("warc-det2").toString
      graft.sources.WarcSource.exportWarc(docs, d1, 2, "s", gzip = gz)
      graft.sources.WarcSource.exportWarc(docs, d2, 2, "s", gzip = gz)
      val ext = if (gz) ".warc.gz" else ".warc"
      for (f <- new java.io.File(d1).list().sorted
           if f.startsWith("shard-")) { // skip hadoop .crc sidecars
        assert(f.endsWith(ext))
        val b1 = java.nio.file.Files.readAllBytes(new java.io.File(d1, f).toPath)
        val b2 = java.nio.file.Files.readAllBytes(new java.io.File(d2, f).toPath)
        assert(java.util.Arrays.equals(b1, b2), s"$f differs between exports")
      }
    }
  }

  test("warc roundtrip: records carry pinned headers and exact body bytes") {
    val docs = Seq((7L, "the quick brown fox"), (8L, "jumps over"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("warc-rt").toString
    val n = graft.sources.WarcSource.exportWarc(docs, dir, 1, "rt", gzip = true)
    assert(n == 2L)
    val recs = graft.sources.WarcSource.records(spark, dir).collect()
      .sortBy(_.recordIdx)
    assert(recs.length == 3)
    assert(recs(0).warcType == "warcinfo")
    val resp = recs.filter(_.warcType == "response")
    assert(resp.forall(_.date == "1970-01-01T00:00:00Z"))
    assert(resp.forall(_.recordId.startsWith("<urn:uuid:")))
    val bodies = resp.map { r =>
      val (status, body) = graft.sources.WarcSource.httpParts(r.payload)
      assert(status == "HTTP/1.1 200 OK")
      r.targetUri.split("/doc/")(1).toLong ->
        new String(body, java.nio.charset.StandardCharsets.UTF_8)
    }.toMap
    assert(bodies == Map(7L -> "the quick brown fox", 8L -> "jumps over"))
  }

  test("warc reader is strict: corrupt framing throws with file+offset") {
    val dir = java.nio.file.Files.createTempDirectory("warc-bad")
    val good = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 4\r\n\r\nBODY\r\n\r\n"
    // truncate the record boundary
    java.nio.file.Files.write(dir.resolve("shard-00000.warc"),
      good.dropRight(2).getBytes("US-ASCII"))
    val ex = intercept[org.apache.spark.SparkException] {
      graft.sources.WarcSource.records(spark, dir.toString).collect()
    }
    assert(ex.getMessage.contains("overruns") ||
      ex.getMessage.contains("boundary"))
    // missing Content-Length
    java.nio.file.Files.write(dir.resolve("shard-00000.warc"),
      "WARC/1.0\r\nWARC-Type: response\r\n\r\nBODY\r\n\r\n".getBytes("US-ASCII"))
    val ex2 = intercept[org.apache.spark.SparkException] {
      graft.sources.WarcSource.records(spark, dir.toString).collect()
    }
    assert(ex2.getMessage.contains("Content-Length"))
  }

  test("export rejects null body cells up front") {
    val docs = Seq((1L, "ok"), (2L, null)).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("warc-null").toString
    val ex = intercept[IllegalArgumentException] {
      graft.sources.WarcSource.exportWarc(docs, dir, 1, "s")
    }
    assert(ex.getMessage.contains("null"))
  }

  test("paragraph dedup: cross-doc repeats survive only at the global first occurrence") {
    // doc 1: A B C;  doc 2: B D;  doc 3: C B E;  doc 4: only repeats
    val A = "alpha paragraph content one"; val B = "shared banner text"
    val C = "common footer line"; val D = "delta unique body"
    val E = "epsilon unique body"
    val docs = Seq(
      (1L, s"$A\n$B\n$C"), (2L, s"$B\n$D"), (3L, s"$C\n$B\n$E"),
      (4L, s"$B\n$C"), (5L, "")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.paragraphDedup(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((1L, s"$A\n$B\n$C", 3L, 0L))) // first occurrences keep
    assert(out(1) == ((2L, D, 1L, 1L)))             // B excised
    assert(out(2) == ((3L, E, 1L, 2L)))             // C and B excised
    assert(out(3) == ((4L, "", 0L, 2L)))            // everything excised
    assert(out(4) == ((5L, "", 0L, 0L)))            // empty doc still has a row
  }

  test("paragraph dedup keeps within-doc order and drops separator artifacts") {
    val docs = Seq((1L, "z last\n\nfirst words\nz last again")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.paragraphDedup(docs).head()
    // empty paragraph (double separator) is dropped silently, order kept
    assert(out.getString(1) == "z last\nfirst words\nz last again")
    assert(out.getLong(2) == 3L && out.getLong(3) == 0L)
  }

  test("link extraction absolutizes per RFC rules and drops non-http anchors") {
    val html = """<div><a href="https://other.net/x">abs</a>
      |<a href="//example.org/pp">proto rel</a>
      |<a href="/root1">site abs</a>
      |<a href="sub/page.html">dir rel</a>
      |<a href="#frag">frag only</a>
      |<a href="mailto:a@b.c">mail</a>
      |<a href="javascript:void(0)">js</a></div>""".stripMargin
    val out = Seq((1L, html, "https://example.org/dir/base.html"))
      .toDF("id", "html", "url")
      .select(explode(graft.operators.HtmlExtract
        .links(col("html"), col("url"))).as("l"))
      .select("l.url", "l.anchor").as[(String, String)].collect().toMap
    assert(out == Map(
      "https://other.net/x" -> "abs",
      "https://example.org/pp" -> "proto rel",
      "https://example.org/root1" -> "site abs",
      "https://example.org/dir/sub/page.html" -> "dir rel"))
  }

  test("links: <base href> overrides the page URL; dot segments resolve per RFC 3986") {
    val html = """<head><base href="https://cdn.example.net/assets/v2/page.html"></head>
      |<div><a href="style/../theme.css">theme</a>
      |<a href="./deep/../../up.html">up</a>
      |<a href="/a/b/./c/../d">mixed</a>
      |<a href="../../../over.html">over</a></div>""".stripMargin
    val out = Seq((1L, html, "https://example.org/dir/base.html"))
      .toDF("id", "html", "url")
      .select(explode(graft.operators.HtmlExtract
        .links(col("html"), col("url"))).as("l"))
      .select("l.url").as[String].collect().toSeq
    assert(out == Seq(
      "https://cdn.example.net/assets/v2/theme.css",
      "https://cdn.example.net/assets/up.html",
      "https://cdn.example.net/a/b/d",
      // three ".." against a two-deep base clamp to the root
      "https://cdn.example.net/over.html"))
    // no base tag: the document URL resolves, with dot segments
    val plain = Seq((1L, """<p><a href="../x.html">x</a></p>""",
      "https://example.org/d1/d2/page.html")).toDF("id", "html", "url")
      .select(explode(graft.operators.HtmlExtract
        .links(col("html"), col("url"))).as("l"))
      .select("l.url").as[String].head()
    assert(plain == "https://example.org/d1/x.html")
  }

  test("url canonicalization: ports, case, params, fragments, slashes") {
    val cases = Seq(
      "HTTP://WWW.Site.COM:80/A/B/?z=1&utm_campaign=x&a=2#top" ->
        "http://www.site.com/A/B?a=2&z=1",
      "https://site.com:443/" -> "https://site.com",
      "https://site.com/path/?fbclid=abc" -> "https://site.com/path",
      "https://site.com/p?gclid=1&msclkid=2&utm_x=3" -> "https://site.com/p",
      " https://site.com/x " -> "https://site.com/x",
      "ftp://site.com/x#f" -> "ftp://site.com/x", // non-http passthrough
      "not a url" -> "not a url")
    val got = cases.map(_._1).toDF("url")
      .select(graft.operators.HtmlExtract.canonicalizeUrl(col("url")))
      .as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  private def robotsCheck(robots: String, agent: String,
      path: String): Boolean =
    Seq((robots, agent, path)).toDF("r", "a", "p")
      .select(graft.operators.Robots.robotsAllows(
        graft.operators.Robots.parseRobots(col("r")), col("a"), col("p")))
      .as[Boolean].head()

  test("robots: group selection prefers the longest matching product token") {
    val r = "User-agent: bot\nDisallow: /a\nUser-agent: graftbot\n" +
      "Disallow: /b\nUser-agent: *\nDisallow: /"
    // 'graftbot' (8) beats 'bot' (3) beats '*' for this UA
    assert(robotsCheck(r, "GraftBot/2.0", "/a"))      // graftbot group: /a fine
    assert(!robotsCheck(r, "GraftBot/2.0", "/b"))     // graftbot group: /b blocked
    assert(!robotsCheck(r, "somebot", "/a"))          // 'bot' group: /a blocked
    assert(!robotsCheck(r, "spider", "/anything"))    // '*' group: all blocked
    assert(robotsCheck("", "any", "/x"))              // empty robots: allowed
  }

  test("robots: longest rule wins; allow wins length ties; empty disallow allows") {
    val r = "User-agent: *\nDisallow: /shop\nAllow: /shop/sale\n"
    assert(!robotsCheck(r, "bot", "/shop/item"))
    assert(robotsCheck(r, "bot", "/shop/sale/item"))
    val tie = "User-agent: *\nDisallow: /dir/\nAllow: /dir*\n" // both len 5... lengths 5 vs 5
    assert(robotsCheck(tie, "bot", "/dir/x"))
    assert(robotsCheck("User-agent: *\nDisallow:\n", "bot", "/x"))
  }

  test("robots: wildcard and end-anchor matching") {
    val r = "User-agent: *\nDisallow: /*/private$\nDisallow: /dl/*.exe$\n" +
      "Disallow: /mid*dle\n"
    assert(!robotsCheck(r, "b", "/en/private"))        // * spans, $ at end
    assert(robotsCheck(r, "b", "/en/private/page"))    // $ rejects longer path
    assert(!robotsCheck(r, "b", "/dl/a.exe"))
    assert(robotsCheck(r, "b", "/dl/a.exe.txt"))
    assert(!robotsCheck(r, "b", "/midXXXdle/rest"))    // unanchored wildcard
    assert(robotsCheck(r, "b", "/midXXX"))
  }

  test("redirects: relative/absolute Location hops, caps, and cycles") {
    val rows = Seq(
      // a -> b (relative, dir-resolved) -> c (absolute) -> terminal
      ("https://h/x/a", 301, "b"),
      ("https://h/x/b", 302, "https://h/c"),
      ("https://h/c", 200, ""),
      // site-absolute Location
      ("https://h/d", 307, "/c"),
      // 2-cycle: never resolves
      ("https://h/p", 301, "/q"),
      ("https://h/q", 301, "/p"),
      // 3xx without Location: terminal (resolved) where it stands
      ("https://h/nl", 304, "")).toDF("url", "status_code", "location")
    val got = graft.operators.Redirects.follow(rows, maxHops = 8)
      .as[(String, String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("https://h/x/a") == (("https://h/c", 2L, true)))
    assert(got("https://h/x/b") == (("https://h/c", 1L, true)))
    assert(got("https://h/c") == (("https://h/c", 0L, true)))
    assert(got("https://h/d") == (("https://h/c", 1L, true)))
    assert(got("https://h/nl") == (("https://h/nl", 0L, true)))
    val (pf, ph, pr) = got("https://h/p")
    assert(!pr && ph == 8L && (pf == "https://h/p" || pf == "https://h/q"))
  }

  test("crawl-delay: group selection, last-wins, '*' fallback, absent -> null") {
    val r = "User-agent: graftbot\r\nCrawl-delay: 2\r\nCrawl-delay: 3\r\n" +
      "User-agent: *\r\nCrawl-delay: 10\r\nUser-agent: slowbot\r\nDisallow: /\r\n"
    def delayFor(ua: String): Option[Double] =
      Seq(r).toDF("r").select(graft.operators.Robots.crawlDelayFor(
        graft.operators.Robots.crawlDelays(col("r")), lit(ua)))
        .as[Option[Double]].head()
    assert(delayFor("GraftBot/1.0") == Some(3.0)) // last declared wins
    assert(delayFor("otherbot") == Some(10.0))    // '*' fallback
    assert(delayFor("slowbot") == None)           // its group declares none
    assert(Seq("").toDF("r").select(graft.operators.Robots.crawlDelayFor(
      graft.operators.Robots.crawlDelays(col("r")), lit("x")))
      .as[Option[Double]].head().isEmpty)
  }

  test("sitemap index: child locs extract with entity decoding") {
    val xml = """<?xml version="1.0"?><sitemapindex>
      |<sitemap><loc>https://a/s1.xml</loc><lastmod>2026-01-01</lastmod></sitemap>
      |<sitemap><loc>https://a/s2.xml?x=1&amp;y=2</loc></sitemap>
      |</sitemapindex>""".stripMargin
    val got = Seq(xml).toDF("x")
      .select(graft.operators.Sitemaps.indexLocs(col("x")))
      .as[Seq[String]].head()
    assert(got == Seq("https://a/s1.xml", "https://a/s2.xml?x=1&y=2"))
  }

  test("robots: sitemaps are extracted group-independently") {
    val r = "User-agent: *\nDisallow: /\nSitemap: https://a/s1.xml\n" +
      "# c\nSITEMAP: https://a/s2.xml\n"
    val got = Seq(r).toDF("r")
      .select(graft.operators.Robots.sitemaps(col("r")))
      .as[Seq[String]].head()
    assert(got == Seq("https://a/s1.xml", "https://a/s2.xml"))
  }

  test("robots: CRLF line endings and tab-padded values parse identically to LF") {
    // a CRLF-transmitted robots.txt (the common real-world case) must not
    // leave \r on tokens — that would fail every match and allow everything
    val lf = "User-agent: graftbot\nDisallow: /private/\nUser-agent: *\nDisallow: /\n"
    val crlf = lf.replace("\n", "\r\n").replace("Disallow: ", "Disallow:\t ")
    assert(!robotsCheck(crlf, "graftbot", "/private/x"))
    assert(robotsCheck(crlf, "graftbot", "/public/x"))
    assert(!robotsCheck(crlf, "otherbot", "/anything"))
    val sm = Seq("User-agent: *\r\nSitemap:\thttps://a/s.xml\r\n").toDF("r")
      .select(graft.operators.Robots.sitemaps(col("r")))
      .as[Seq[String]].head()
    assert(sm == Seq("https://a/s.xml"))
  }

  test("warc zstd codec: per-frame members roundtrip and are deterministic") {
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "epsilon"))
      .toDF("doc_id", "text")
    val d1 = java.nio.file.Files.createTempDirectory("warc-zst1").toString
    val d2 = java.nio.file.Files.createTempDirectory("warc-zst2").toString
    assert(graft.sources.WarcSource.exportWarc(docs, d1, 2, "s", codec = "zstd") == 3L)
    graft.sources.WarcSource.exportWarc(docs, d2, 2, "s", codec = "zstd")
    for (f <- new java.io.File(d1).list().sorted if f.startsWith("shard-")) {
      assert(f.endsWith(".warc.zst"))
      val b1 = java.nio.file.Files.readAllBytes(new java.io.File(d1, f).toPath)
      val b2 = java.nio.file.Files.readAllBytes(new java.io.File(d2, f).toPath)
      assert(java.util.Arrays.equals(b1, b2), s"$f differs between exports")
    }
    val bodies = graft.sources.WarcSource.responseBodies(spark, d1)
      .select("body").as[String].collect().toSet
    assert(bodies == Set("alpha beta", "gamma delta", "epsilon"))
  }

  test("export sweeps stale shards: fewer shards over a prior export leave no leftovers") {
    val docs = (1L to 20L).map(i => (i, s"body $i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("warc-stale").toString
    graft.sources.WarcSource.exportWarc(docs, dir, 8, "s1", gzip = true)
    // re-export with fewer shards AND another codec: both the extra shard
    // ordinals and the other extension must be gone
    val n = graft.sources.WarcSource.exportWarc(docs, dir, 2, "s2")
    assert(n == 20L)
    val files = new java.io.File(dir).list().filter(_.startsWith("shard-")).sorted
    assert(files.toSeq == Seq("shard-00000.warc", "shard-00001.warc"))
    assert(graft.sources.WarcSource.records(spark, dir)
      .filter(_.warcType == "response").count() == 20L)
  }

  test("export verify=false skips the read-back scan and returns -1") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("warc-nov").toString
    assert(graft.sources.WarcSource.exportWarc(docs, dir, 1, "s",
      verify = false) == -1L)
    assert(graft.sources.WarcSource.records(spark, dir)
      .filter(_.warcType == "response").count() == 1L)
  }

  test("warc reader streams: the first record parses without consuming the whole shard") {
    // build a many-record gz shard with incompressible payloads, then
    // prove the walker is lazy: after pulling ONE record, only a small
    // prefix of the compressed stream has been consumed — the round-18
    // whole-shard inflate would have read it all before the first record
    val rnd = new java.util.Random(7)
    val recs = (0 until 32).map { i =>
      val body = new Array[Byte](256 * 1024)
      rnd.nextBytes(body)
      val b64 = java.util.Base64.getEncoder.encodeToString(body)
      ("WARC/1.0\r\nWARC-Type: response\r\n" +
        s"Content-Length: ${b64.length}\r\n\r\n" + b64 + "\r\n\r\n")
        .getBytes("US-ASCII")
    }
    val bos = new java.io.ByteArrayOutputStream()
    recs.foreach { r =>
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(r); gz.close()
    }
    val all = bos.toByteArray
    var consumed = 0L
    val counting = new java.io.InputStream {
      private val in = new java.io.ByteArrayInputStream(all)
      def read(): Int = { val b = in.read(); if (b >= 0) consumed += 1; b }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        val n = in.read(b, off, len); if (n > 0) consumed += n; n
      }
    }
    val it = graft.sources.WarcSource.parse("t.warc.gz",
      new java.util.zip.GZIPInputStream(counting, 64 * 1024))
    val first = it.next()
    assert(first.contentLength > 256 * 1024)
    // one ~350 KB member + gzip readahead ≪ the ~11 MB whole file
    assert(consumed < all.length / 4,
      s"walker consumed $consumed of ${all.length} compressed bytes for one record")
    assert(it.size == 31) // the rest still parse cleanly
  }

  test("walker hasNext is idempotent after exhaustion (closed-stream safe)") {
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 2\r\n\r\nok\r\n\r\n").getBytes("US-ASCII")
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(rec); gz.close()
    val it = graft.sources.WarcSource.parse("t.warc.gz",
      new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray)))
    assert(it.hasNext)
    it.next()
    // Iterator.flatMap re-evaluates an exhausted child's hasNext; the
    // first false closes the stream, repeats must stay false instead of
    // re-reading the closed codec stream (ADVICE r19 #1)
    assert(!it.hasNext && !it.hasNext && !it.hasNext)
  }

  test("charset resolution: header param beats meta sniff beats UTF-8 fallback") {
    import graft.sources.WarcSource.resolveCharset
    val latin = "café".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    // 1. header charset wins, even over a contradicting meta tag
    val metaUtf8 = ("<meta charset=\"utf-8\">café")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(resolveCharset(Some("text/html; charset=ISO-8859-1"), metaUtf8) ==
      (("ISO-8859-1", "<meta charset=\"utf-8\">café")))
    // 2. no header param -> meta charset sniff (both tag shapes)
    // 0x80/0x97 are the windows-1252-only euro and em dash code units
    val metaWb = "<meta charset=windows-1252><p>a".getBytes("US-ASCII") ++
      Array(0x80.toByte, 0x97.toByte) ++ "b</p>".getBytes("US-ASCII")
    assert(resolveCharset(Some("text/html"), metaWb) ==
      (("windows-1252", "<meta charset=windows-1252><p>a€—b</p>")))
    val httpEquiv = ("<meta http-equiv=\"Content-Type\" content=\"text/html; " +
      "charset=iso-8859-1\">café")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(resolveCharset(None, httpEquiv)._1 == "ISO-8859-1")
    // 3. nothing declared -> UTF-8
    assert(resolveCharset(Some("text/plain"),
      "héllo".getBytes("UTF-8")) == (("UTF-8", "héllo")))
    // 4. unknown names fall through (header unknown -> meta; both -> UTF-8)
    val unkMeta = ("<meta charset=\"no-such-cs\">x").getBytes("UTF-8")
    assert(resolveCharset(Some("text/html; charset=bogus-9"), unkMeta)._1 == "UTF-8")
    // 5. meta sniff only reads the first 1024 bytes
    val lateMeta = (" " * 1100 + "<meta charset=\"ISO-8859-1\">").getBytes("UTF-8")
    assert(resolveCharset(None, lateMeta)._1 == "UTF-8")
  }

  test("ExtractBlocks kernel ≡ the declarative column chain, block for block") {
    // the kernel replaced the interpreted per-block/per-anchor HOFs; the
    // retained declarative twin IS the spec — both must agree on every
    // planted shape: noise subtrees, nested inline tags, entities incl.
    // numeric refs and double-escapes, link-saturated blocks, empty and
    // whitespace-only blocks, unclosed tags, mixed case
    val pages = Seq(
      "<html><head><title>T</title><style>p{}</style></head><body>" +
        "<script>var x=1;</script><!-- c --><p>one real paragraph with " +
        "plenty of words inside of it</p></body></html>",
      "<DIV>upper case block</DIV><P>tips &amp; tricks for &lt;html&gt; " +
        "&#8212; &#x27; &#38;amp; parsing here</P>",
      "<div><a href='/a'>link one text</a> <a href='/b'>link two text</a></div>",
      "<p>   </p><p></p><div>tiny</div>",
      "<p>unclosed paragraph runs on <span>with inline span</span>",
      "<ul><li>item one here</li><li>item two here</li></ul>" +
        "<table><tr><td>cell text</td></tr></table>",
      "") ++ (0 until 4).map(i =>
      s"<p>generated paragraph number $i with &nbsp; entity and " +
        s"<b>bold</b> plus <a href='/x$i'>an anchor of several words</a></p>")
    val df = pages.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "html")
    val a = df.select(col("id"),
      graft.operators.HtmlExtract.blockStats(col("html")).as("bs"))
      .orderBy("id").collect().map(_.toString)
    val b = df.select(col("id"),
      graft.operators.HtmlExtract.blockStatsDeclarative(col("html")).as("bs"))
      .orderBy("id").collect().map(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("rel=nofollow flags per anchor (both orders), noopener decoy stays false") {
    val html = """<a href="/a" rel="nofollow">x</a>""" +
      """<a rel="me nofollow" href="/b">y</a>""" +
      """<a href="/c" rel="noopener">z</a>""" +
      """<a href="/d">plain rel=nofollow text must not flag</a>"""
    val rows = Seq((1L, html)).toDF("id", "html")
      .select(explode(graft.operators.HtmlExtract
        .links(col("html"), lit("https://h.example/"))).as("l"))
      .select(col("l.url"), col("l.nofollow")).collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toSeq
    assert(rows == Seq(
      ("https://h.example/a", true), ("https://h.example/b", true),
      ("https://h.example/c", false), ("https://h.example/d", false)))
  }

  test("meta robots: both attribute orders, token matching, absent -> ''") {
    import graft.operators.HtmlExtract.{pageMeta, robotsMetaHas}
    def metaOf(html: String): String =
      Seq((1L, html)).toDF("id", "html")
        .select(pageMeta(col("html")).getField("meta_robots")).head().getString(0)
    assert(metaOf("""<head><meta name="robots" content="noindex, nofollow">""" +
      "</head>") == "noindex, nofollow")
    assert(metaOf("""<head><meta content="noindex" name="robots"></head>""")
      == "noindex")
    assert(metaOf("<head><title>t</title></head>") == "")
    val checks = Seq((1L, "x")).toDF("id", "x").select(
      robotsMetaHas(lit("noindex, nofollow"), "noindex"),
      robotsMetaHas(lit("noindex, nofollow"), "nofollow"),
      robotsMetaHas(lit("noindex"), "nofollow"),
      // token semantics: 'nofollowx' is NOT the nofollow directive
      robotsMetaHas(lit("nofollowx"), "nofollow"),
      robotsMetaHas(lit("NOFOLLOW"), "nofollow"),
      // case folds on BOTH sides, and metacharacters are quoted, not
      // interpreted (a '.' directive must not match arbitrary chars)
      robotsMetaHas(lit("noindex"), "NOINDEX"),
      robotsMetaHas(lit("nofollow"), "n.follow")).head()
    assert((checks.getBoolean(0), checks.getBoolean(1), checks.getBoolean(2),
      checks.getBoolean(3), checks.getBoolean(4), checks.getBoolean(5),
      checks.getBoolean(6)) ==
      ((true, true, false, false, true, true, false)))
  }

  test("canonical collapse: designated copy wins, offsite falls back to min id, MinHash workload shrinks") {
    import graft.operators.Dedup
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    // docs 0-3: four URL-variants of ONE page, all declaring doc/0 as
    // canonical (doc/0 itself landed); 4-5: an off-corpus canonical
    // cluster (no member IS the target); 6-7: undeclared self-groups
    val docs = Seq(
      (0L, "https://example.org/doc/0", "https://example.org/doc/0", base),
      (1L, "https://example.org/doc/0?utm_source=feed", "https://example.org/doc/0", base),
      (2L, "https://example.org/doc/0/print", "https://example.org/doc/0", base),
      (3L, "https://m.example.org/doc/0", "https://example.org/doc/0", base),
      (4L, "https://example.org/a", "https://example.org/main",
        "shared mirror body on two hosts describing one canonical resource"),
      (5L, "https://example.org/b", "https://example.org/main",
        "shared mirror body on two hosts describing one canonical resource"),
      (6L, "https://example.org/c", "", "unrelated text about completely different topics entirely"),
      (7L, "https://example.org/d", "", "another standalone page with its own unique words here"))
      .toDF("doc_id", "url", "canonical", "text")
    val collapsed = Dedup.canonicalCollapse(docs)
    val byKey = collapsed.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byKey("https://example.org/doc/0") == ((0L, 4L))) // designated copy, not min-of-cluster by accident
    assert(byKey("https://example.org/main") == ((4L, 2L)))  // offsite target: min id wins
    assert(byKey("https://example.org/c") == ((6L, 1L)))
    assert(byKey.size == 4)
    // the point of running it BEFORE MinHash: the near-dup pass sees
    // only winners — the 4-variant cluster contributes zero pairs
    val winners = docs.join(collapsed.select("doc_id"), Seq("doc_id"), "left_semi")
    val pairsBefore = Dedup.minHashLshPairs(docs, 0.7).count()
    val pairsAfter = Dedup.minHashLshPairs(winners, 0.7).count()
    assert(pairsBefore >= 6L) // the identical 4-cluster alone yields C(4,2)
    assert(pairsAfter == 0L)  // winners {0,4,6,7} share no near-dup text
  }

  test("warc export with wire encodings stays byte-deterministic") {
    // the content-addressing claim must survive encodingCol: JDK gzip
    // headers are zeroed, Deflater defaults are deterministic, chunk
    // framing is fixed-size — two exports must be byte-identical
    val docs = Seq(
      (1L, "plain body", ""), (2L, "gzip body here", "gzip"),
      (3L, "deflate body here", "deflate"),
      (4L, "chunked body " + ("x" * 600), "chunked"),
      (5L, "both layers " + ("y" * 600), "gzip,chunked"))
      .toDF("doc_id", "text", "enc")
    val dirs = (1 to 2).map(_ =>
      java.nio.file.Files.createTempDirectory("warc-encdet").toString)
    dirs.foreach(d => graft.sources.WarcSource.exportWarc(
      docs, d, 2, "s", encodingCol = "enc", gzip = true, verify = false))
    for (f <- new java.io.File(dirs.head).list().sorted
         if f.startsWith("shard-")) {
      val b = dirs.map(d => java.nio.file.Files.readAllBytes(
        new java.io.File(d, f).toPath))
      assert(java.util.Arrays.equals(b.head, b(1)), s"$f differs")
    }
    // and the roundtrip recovers every body through the decode stack
    val back = graft.sources.WarcSource.responseBodies(spark, dirs.head)
      .select("body").as[String].collect().toSet
    assert(back == docs.select("text").as[String].collect().toSet)
  }

  test("http body decode: chunked de-frames before content-coding, before charset") {
    import graft.sources.WarcSource.{decodeHttpBody, dechunk, resolveCharset}
    val text = "wire body with naïve café content репей"
    val plain = text.getBytes("UTF-8")
    // gzip the representation, then chunk-frame the wire (RFC 9112
    // layering); decode must undo them in reverse order
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(plain); g.close(); bos.toByteArray
    }
    val chunked = {
      val bos = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < gz.length) {
        val n = math.min(7, gz.length - i) // tiny chunks, many frames
        bos.write(s"${n.toHexString};ext=1\r\n".getBytes("US-ASCII"))
        bos.write(gz, i, n)
        bos.write("\r\n".getBytes("US-ASCII"))
        i += n
      }
      bos.write("0\r\nTrailer: x\r\n\r\n".getBytes("US-ASCII"))
      bos.toByteArray
    }
    val (decoded, ce, wasChunked) = decodeHttpBody(
      Map("transfer-encoding" -> "chunked", "content-encoding" -> "gzip"),
      chunked)
    assert(wasChunked && ce == "gzip")
    assert(new String(decoded, "UTF-8") == text)
    // deflate: zlib-wrapped decodes; the raw-deflate server slip retries bare
    val zlib = {
      val bos = new java.io.ByteArrayOutputStream()
      val d = new java.util.zip.DeflaterOutputStream(bos)
      d.write(plain); d.close(); bos.toByteArray
    }
    assert(new String(decodeHttpBody(
      Map("content-encoding" -> "deflate"), zlib)._1, "UTF-8") == text)
    val rawDeflate = {
      val bos = new java.io.ByteArrayOutputStream()
      val d = new java.util.zip.DeflaterOutputStream(bos,
        new java.util.zip.Deflater(-1, true))
      d.write(plain); d.close(); bos.toByteArray
    }
    assert(new String(decodeHttpBody(
      Map("content-encoding" -> "deflate"), rawDeflate)._1, "UTF-8") == text)
    // unknown coding passes bytes through with the name in the audit slot
    val (kept, keptCe, _) = decodeHttpBody(Map("content-encoding" -> "br"), plain)
    assert(keptCe == "br" && java.util.Arrays.equals(kept, plain))
    // a TE LIST decodes last-coding-outermost: "gzip, chunked" means
    // de-chunk, then gunzip the transfer coding itself (RFC 9112)
    val teStack = {
      val bos = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < gz.length) {
        val n = math.min(64, gz.length - i)
        bos.write(s"${n.toHexString}\r\n".getBytes("US-ASCII"))
        bos.write(gz, i, n); bos.write("\r\n".getBytes("US-ASCII")); i += n
      }
      bos.write("0\r\n\r\n".getBytes("US-ASCII")); bos.toByteArray
    }
    val (teDecoded, _, teChunked) = decodeHttpBody(
      Map("transfer-encoding" -> "gzip, chunked"), teStack)
    assert(teChunked && new String(teDecoded, "UTF-8") == text)
    // an unknown TE coding blocks the layers beneath it: the outer
    // chunked frame still decodes, the inner 'frob' layer stays as-is
    val (teKept, _, _) = decodeHttpBody(
      Map("transfer-encoding" -> "frob, chunked"), teStack)
    assert(java.util.Arrays.equals(teKept, gz))
    // corrupt chunk framing fails loudly, never resyncs
    intercept[java.io.IOException](dechunk("zz\r\nabc".getBytes("US-ASCII")))
    intercept[java.io.IOException](
      dechunk("5\r\nab".getBytes("US-ASCII"))) // overruns
    intercept[java.io.IOException](
      dechunk("-5\r\nab\r\n0\r\n\r\n".getBytes("US-ASCII"))) // negative size
    intercept[java.io.IOException](
      dechunk("7fffffff\r\nab\r\n".getBytes("US-ASCII"))) // overflow-sized
    // and the decoded bytes then hit charset resolution (full precedence)
    assert(resolveCharset(Some("text/plain"), decoded)._1 == "UTF-8")
  }

  test("BOM outranks the header charset and strips from the decoded text") {
    import graft.sources.WarcSource.resolveCharset
    val utf16le = Array(0xFF.toByte, 0xFE.toByte) ++
      "wide text café".getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    // WHATWG: the BOM wins even over a contradicting Content-Type param
    assert(resolveCharset(Some("text/html; charset=ISO-8859-1"), utf16le) ==
      (("UTF-16LE", "wide text café")))
    val utf16be = Array(0xFE.toByte, 0xFF.toByte) ++
      "big endian".getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
    assert(resolveCharset(None, utf16be) == (("UTF-16BE", "big endian")))
    val utf8bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "plain utf8".getBytes("UTF-8")
    assert(resolveCharset(None, utf8bom) == (("UTF-8", "plain utf8")))
  }

  test("incremental frontier: BFS depths, convergence, and replay is a no-op") {
    // 12-node graph: 0->1->2->3 chain, 2->4, a cycle 3->0, and 5..11
    // unreachable; two seeds {0, 5}
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (2L, 4L), (3L, 0L))
      .toDF("src", "dst")
    // multi-partition seeds: the seed wave must land as SEVERAL part
    // files under one wave prefix and still ingest as one wave
    val seeds = Seq(0L, 5L).toDF("doc_id").repartition(2)
    val root = java.nio.file.Files.createTempDirectory("graft-cf").toString
    val got = graft.streaming.CrawlFrontier.run(spark, edges, seeds, root)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 5L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 3L))
    def landed(): Seq[String] = new java.io.File(s"$root/landing").list()
      .filter(_.endsWith(".parquet")).toSeq.sorted
    val files = landed()
    val waves = files.map(_.replaceAll("-part-.*$", "")).distinct.sorted
    assert(waves == Seq("wave-00000", "wave-00001", "wave-00002",
      "wave-00003")) // depths 0..3; the cycle back to 0 lands nothing
    assert(files.count(_.startsWith("wave-00000-")) >= 2,
      s"seed wave should span multiple part files, got $files")
    // replay convergence: a re-run over the same root (same checkpoint,
    // same visited table, same wave files) changes NOTHING — no new
    // waves, no duplicate admissions, identical depths
    val again = graft.streaming.CrawlFrontier.run(spark, edges, seeds, root)
      .as[(Long, Long)].collect().toMap
    assert(again == got)
    assert(landed() == files)
    assert(graft.sources.ManifestCommit
      .readManifested(spark, s"$root/visited").count() == 6L)
  }

  test("canonical collapse plans as ONE exchange (combinable min/count agg)") {
    val docs = Seq((1L, "https://a/x", "")).toDF("doc_id", "url", "canonical")
    val plan = graft.operators.Dedup.canonicalCollapse(docs)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"collapse must shuffle exactly once:\n$plan")
  }

  test("extraction plan is one shuffle-free projection over the scan") {
    val pages = Seq((1L, "<p>x</p>")).toDF("doc_id", "html")
    val plan = graft.operators.HtmlExtract.extract(pages, "html")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"extraction must not shuffle:\n$plan")
  }
}
