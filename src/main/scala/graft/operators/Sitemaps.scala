package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** sitemaps.org XML parsing — the OTHER discovery channel next to the
  * link graph: robots.txt points at sitemaps ([[Robots.sitemaps]]),
  * sitemap indexes point at child sitemaps, and `<urlset>` files carry
  * the URL inventory with change metadata. Pure column expressions
  * (regexp over the XML — the documents are machine-generated and
  * schema-fixed, the same discipline as the reference's XML edge
  * extraction), so parsing fans out per-file on whatever partitioning
  * landed the fetch.
  */
object Sitemaps {

  /** `array<struct<loc, lastmod, changefreq, priority>>` from a
    * `<urlset>` sitemap body; absent optional fields are ''. Entity
    * escapes in loc (&amp;) are decoded. */
  def entries(xml: Column): Column =
    transform(
      regexp_extract_all(xml, lit("(?is)<url\\b[^>]*>(.*?)</url>"), lit(1)),
      u => {
        def field(tag: String) = {
          val v = regexp_extract(u, s"(?is)<$tag[^>]*>(.*?)</$tag>", 1)
          trim(replace(replace(replace(v, lit("&lt;"), lit("<")),
            lit("&gt;"), lit(">")), lit("&amp;"), lit("&")))
        }
        struct(field("loc").as("loc"), field("lastmod").as("lastmod"),
          field("changefreq").as("changefreq"),
          field("priority").as("priority"))
      })

  /** Child sitemap locations of a `<sitemapindex>` body. */
  def indexLocs(xml: Column): Column =
    transform(
      regexp_extract_all(xml,
        lit("(?is)<sitemap\\b[^>]*>.*?<loc[^>]*>(.*?)</loc>.*?</sitemap>"),
        lit(1)),
      l => trim(replace(l, lit("&amp;"), lit("&"))))

  /** Deterministic `<sitemapindex>` builder for an array of child
    * sitemap locations — the write twin of [[indexLocs]] (`&` escaped,
    * callers pass locs pre-sorted). */
  def buildSitemapindex(locs: Column): Column = concat(
    lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
      "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"),
    array_join(transform(locs, l => concat(
      lit("<sitemap><loc>"),
      replace(l, lit("&"), lit("&amp;")),
      lit("</loc></sitemap>"))), ""),
    lit("</sitemapindex>"))

  /** Deterministic `<urlset>` builder for (loc, lastmod) struct arrays
    * — the oracle-able write side of the round trip (entries sorted by
    * the caller; `&` escaped). */
  def buildUrlset(urls: Column): Column = concat(
    lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
      "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"),
    array_join(transform(urls, u => concat(
      lit("<url><loc>"),
      replace(u.getField("loc"), lit("&"), lit("&amp;")),
      lit("</loc><lastmod>"), u.getField("lastmod"),
      lit("</lastmod></url>"))), ""),
    lit("</urlset>"))
}
