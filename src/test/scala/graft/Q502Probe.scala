package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
object Q502Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/tmp/sf1"
    def time(label: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
      println(f"PROBE $label ${ts.min}%.2f s")
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val page = concat(lit("<html><head><title>x</title></head><body>"),
      lit("<a href=\"/a1\" rel=\"nofollow\">one anchor text with several words</a> "),
      lit("<a rel=\"me nofollow\" href=\"/a2\">two anchor &amp; entity text</a> "),
      lit("<a href=\"/a3\" rel=\"noopener\">three anchor text here too</a> "),
      lit("<a href=\"/a4\">four plain anchor text words</a>"), lit("</body></html>"))
    val base = docs.select(col("doc_id"), page.as("html"),
      concat(lit("https://example.org/p/"), col("doc_id")).as("url"))
    val anchorsPat = "(?is)<a\\b[^>]*\\bhref\\s*=\\s*[\"'][^\"']*[\"'][^>]*>.*?</a>"
    // the pre-kernel per-anchor chain, verbatim
    def oldCleanText(b: Column): Column = {
      val pre = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&apos;" -> "'", "&nbsp;" -> " ")
      val named = pre.foldLeft(regexp_replace(b, "<[^>]*>", " ")) {
        case (acc, (e, r)) => replace(acc, lit(e), lit(r)) }
      trim(regexp_replace(
        graft.expressions.DecodeHtmlNumRefs.decode_html_num_refs(named),
        "\\s+", " "))
    }
    time("OLD per-anchor chain") {
      base.select(transform(regexp_extract_all(
        graft.operators.HtmlExtract.stripNoise(col("html")),
        lit(anchorsPat), lit(0)), a => {
          val openTag = regexp_extract(a, "(?is)^<a\\b[^>]*>", 0)
          val href = regexp_extract(openTag,
            "(?is)\\bhref\\s*=\\s*[\"']([^\"']*)[\"']", 1)
          val nofollow = openTag.rlike(
            "(?is)\\brel\\s*=\\s*[\"'][^\"']*\\bnofollow\\b[^\"']*[\"']")
          struct(href.as("href"), oldCleanText(a).as("anchor"),
            nofollow.as("nofollow"))
        }))
        .write.mode("overwrite").format("noop").save()
    }
    time("NEW parse_anchor kernel") {
      base.select(transform(regexp_extract_all(
        graft.operators.HtmlExtract.stripNoise(col("html")),
        lit(anchorsPat), lit(0)),
        a => graft.expressions.ParseAnchor.parse_anchor(a)))
        .write.mode("overwrite").format("noop").save()
    }
    time("full links (new)") {
      base.select(graft.operators.HtmlExtract.links(col("html"), col("url")))
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
