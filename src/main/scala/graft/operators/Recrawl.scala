package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Conditional-revalidation recrawl planning — the step between "the
  * sitemap says this URL changed" (the q500 delta) and actually
  * re-fetching it. A real recrawler keeps the validators the last
  * fetch returned (ETag, Last-Modified) and issues CONDITIONAL
  * requests: a 304 Not Modified costs headers, not a body — at
  * recrawl scale most of the fleet's bandwidth rides on this.
  *
  * Decision per wave URL:
  *   - absent from the fetched state            → `new`       (plain GET)
  *   - stale (sitemap lastmod > fetch date) and a validator is held
  *     → `revalidate` (conditional GET: `If-None-Match: <etag>`
  *       preferred over `If-Modified-Since: <last_modified>` — RFC
  *       9110 §13.1.3 ranks entity tags above dates)
  *   - stale with no validator                  → `refetch`   (plain GET)
  *   - fresh → no row (nothing to do).
  *
  * SCALE: ONE left join of the wave against the state on the URL key —
  * scan-speed, no window, no iteration; both sides are key-partitioned
  * tables (the state is exactly the fetched-state table q500 already
  * maintains, grown by two columns).
  */
object Recrawl {

  /** `wave`: (loc, lastmod) — the freshly fetched sitemap inventory.
    * `state`: (loc, fetched, etag, last_modified) — the per-URL fetch
    * record; '' / null validators mean "server sent none". Returns
    * (loc, reason, validator, cond_header) for the URLs that need
    * network work. */
  def delta(wave: DataFrame, state: DataFrame): DataFrame = {
    val j = wave.join(
      state.select(col("loc"), col("fetched"), col("etag"),
        col("last_modified")),
      Seq("loc"), "left")
    val isNew = col("fetched").isNull
    val stale = col("lastmod") > col("fetched")
    val hasEtag = coalesce(col("etag"), lit("")) =!= ""
    val hasLm = coalesce(col("last_modified"), lit("")) =!= ""
    j.where(isNew || stale)
      .select(col("loc"),
        when(isNew, lit("new"))
          .when(hasEtag || hasLm, lit("revalidate"))
          .otherwise(lit("refetch")).as("reason"),
        when(isNew, lit(""))
          .when(hasEtag, lit("etag"))
          .when(hasLm, lit("last-modified"))
          .otherwise(lit("")).as("validator"),
        when(isNew, lit(""))
          .when(hasEtag, concat(lit("If-None-Match: "), col("etag")))
          .when(hasLm, concat(lit("If-Modified-Since: "),
            col("last_modified")))
          .otherwise(lit("")).as("cond_header"))
  }
}
