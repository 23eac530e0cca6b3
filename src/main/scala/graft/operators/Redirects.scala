package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTTP redirect resolution over a landed crawl — the third discovery
  * input next to page links and sitemaps: ~1 in 5 real fetches is a
  * 3xx, and a corpus that drops them silently loses every moved page.
  * Consumes the (url, status_code, location) columns
  * [[graft.sources.WarcSource.responseBodies]] lands and follows
  * Location hops to a fixed point.
  *
  * Location values absolutize like anchor hrefs (RFC 9110 permits
  * relative references): absolute http(s) kept, leading-`/` against
  * the redirecting URL's origin, anything else against its directory.
  *
  * SCALE: the redirect map (3xx rows only — a small fraction of the
  * corpus) is localCheckpoint-materialized once; each hop is one
  * key-partitioned join of the state against it, and the loop exits as
  * soon as no URL still sits on a redirect source (chains in real
  * crawls are 1-3 hops; `maxHops` caps cycles). No driver-side state
  * beyond the hop counter.
  */
object Redirects {

  /** Follows redirect chains. Input needs `urlCol` (unique per row),
    * `statusCol` (HTTP status code), `locationCol` (Location header,
    * '' when absent). Returns one row per input url:
    * (url, final_url, n_hops, resolved) — `resolved` false when the
    * chain still points at a redirect after `maxHops` (a cycle or an
    * over-long chain; final_url then holds the last hop reached). */
  def follow(responses: DataFrame, maxHops: Int = 8,
      urlCol: String = "url", statusCol: String = "status_code",
      locationCol: String = "location"): DataFrame = {
    val loc = col(locationCol)
    val origin = regexp_extract(col(urlCol), "^(https?://[^/?#]+)", 1)
    val baseDir = regexp_replace(
      regexp_replace(col(urlCol), "[?#].*$", ""), "[^/]*$", "")
    val target = when(loc.rlike("^https?://"), loc)
      .when(loc.startsWith("/"), concat(origin, loc))
      .otherwise(concat(baseDir, loc))
    val redirects = responses
      .where(col(statusCol).cast("int").between(300, 399) && loc =!= "")
      .select(col(urlCol).as("_from"), target.as("_to"))
      .localCheckpoint()
    val sources = redirects.select(col("_from").as("cur")).distinct()
      .localCheckpoint()
    var state = responses
      .select(col(urlCol).as("url"), col(urlCol).as("cur"),
        lit(0L).as("n_hops"))
      .localCheckpoint()
    var hop = 0
    var pending = state.join(sources, Seq("cur"), "left_semi").limit(1).count()
    while (hop < maxHops && pending > 0) {
      state = state
        .join(redirects, state("cur") === redirects("_from"), "left")
        .select(col("url"),
          coalesce(col("_to"), col("cur")).as("cur"),
          (col("n_hops") +
            when(col("_to").isNotNull, 1L).otherwise(0L)).as("n_hops"))
        .localCheckpoint()
      pending = state.join(sources, Seq("cur"), "left_semi").limit(1).count()
      hop += 1
    }
    state
      .join(sources.withColumn("_pending", lit(true)), Seq("cur"), "left")
      .select(col("url"), col("cur").as("final_url"), col("n_hops"),
        coalesce(!col("_pending"), lit(true)).as("resolved"))
  }
}
