package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** robots.txt (RFC 9309, the Robots Exclusion Protocol) — the crawl-
  * politeness gate that sits between frontier discovery
  * ([[HtmlExtract.links]] / [[HtmlExtract.canonicalizeUrl]]) and the
  * fetcher. Everything is pure Column expressions: the FILE is tiny and
  * per-host (parse once, broadcast), the DECISION is per-URL (billions)
  * — so `parseRobots` runs on the small side of a broadcast join and
  * [[robotsAllows]] evaluates at scan speed on the URL stream with no
  * shuffle and no UDF.
  *
  * Supported semantics (the RFC core + the de-facto Google rules):
  *   - groups: consecutive `User-agent:` lines share the rule block
  *     that follows; a later `User-agent:` after rules starts a new
  *     group; comments (#) and blank lines ignored; field names
  *     case-insensitive.
  *   - group selection: the matching product token with the LONGEST
  *     length wins (case-insensitive substring of the crawler's UA);
  *     `*` is the fallback group.
  *   - rule matching: longest-match wins across allow+disallow; equal
  *     lengths → allow wins; no matching rule → allowed. `*` matches
  *     any span; `$` anchors the match end. `Disallow:` with an empty
  *     value is recorded as a zero-length allow (RFC: no restriction).
  */
object Robots {

  /** Whitespace-regex trim: Spark's `trim` strips only ASCII space, so
    * CRLF bodies would leave `\r` on every token and tabs after ':'
    * would poison values — the politeness gate would silently allow
    * everything. Trim the full `\s` class instead. */
  private def wtrim(c: Column): Column =
    regexp_replace(c, "^\\s+|\\s+$", "")

  /** `array<struct<agent, pat, allow>>` parsed from a robots.txt body.
    * One entry per (agent, rule) pair — a rule under N user-agent lines
    * fans out to N entries, so downstream selection is a flat filter.
    * Lines split on `\r?\n` (CRLF-transmitted robots.txt is the common
    * real-world case) and tokens trimmed with [[wtrim]]. */
  def parseRobots(txt: Column): Column = {
    val lines = filter(
      transform(split(txt, "\r?\n"),
        l => wtrim(regexp_replace(l, "#.*$", ""))),
      l => l =!= "")
    val ruleT = "array<struct<agent:string,pat:string,allow:boolean>>"
    val accT = s"struct<agents:array<string>,ua:boolean,out:$ruleT>"
    val init = struct(
      typedLit(Seq.empty[String]).as("agents"),
      lit(false).as("ua"),
      typedLit(Seq.empty[(String, String, Boolean)])
        .cast(ruleT).as("out"))
    val acc = aggregate(lines, init.cast(accT), (st, l) => {
      val field = lower(wtrim(substring_index(l, ":", 1)))
      val value = wtrim(expr_substr_after_colon(l))
      val isUa = field === "user-agent"
      val isAllow = field === "allow"
      val isDis = field === "disallow"
      val agents2 = when(isUa && st.getField("ua"),
          concat(st.getField("agents"), array(lower(value))))
        .when(isUa, array(lower(value)))
        .otherwise(st.getField("agents"))
      // empty disallow = "no restriction" -> zero-length allow
      val allowFlag = isAllow || (isDis && value === "")
      val newRules = when(isAllow || isDis,
          transform(st.getField("agents"), a =>
            struct(a.as("agent"), value.as("pat"), allowFlag.as("allow"))))
        .otherwise(typedLit(Seq.empty[(String, String, Boolean)]).cast(ruleT))
      struct(agents2.as("agents"), isUa.as("ua"),
        concat(st.getField("out"), newRules).as("out"))
    })
    acc.getField("out")
  }

  /** [[parseRobots]] evaluated once, returned as a LITERAL rules column
    * — for a host-constant robots body consumed by a per-URL scan. An
    * aggregate-HOF over `lit(txt)` is not constant-folded by Catalyst,
    * so inlining the parse into the scan re-parses the file per row;
    * this evaluates it a single time driver-side (one local job over
    * one row) and embeds the result. Same parse implementation — one
    * semantic, two call shapes. */
  def rulesLiteral(spark: org.apache.spark.sql.SparkSession,
      txt: String): Column = {
    val rows = spark.range(1)
      .select(parseRobots(lit(txt)).as("r"))
      .selectExpr("inline(r)")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
      .toSeq
    typedLit(rows)
      .cast("array<struct<agent:string,pat:string,allow:boolean>>")
  }

  /** `array<struct<agent, delay>>` of per-group `Crawl-delay:` values
    * (not in RFC 9309 but honored by every major crawler). Every
    * `User-agent:` token also lands a null-delay MARKER entry, so group
    * SELECTION sees groups that declare no delay — a crawler whose own
    * group is silent must get "no delay", not the `*` group's value.
    * Non-numeric delay values are dropped. */
  def crawlDelays(txt: Column): Column = {
    val lines = filter(
      transform(split(txt, "\r?\n"),
        l => wtrim(regexp_replace(l, "#.*$", ""))),
      l => l =!= "")
    val ruleT = "array<struct<agent:string,delay:double>>"
    val accT = s"struct<agents:array<string>,ua:boolean,out:$ruleT>"
    val empty = typedLit(Seq.empty[(String, Double)]).cast(ruleT)
    val init = struct(
      typedLit(Seq.empty[String]).as("agents"),
      lit(false).as("ua"), empty.as("out"))
    val acc = aggregate(lines, init.cast(accT), (st, l) => {
      val field = lower(wtrim(substring_index(l, ":", 1)))
      val value = wtrim(expr_substr_after_colon(l))
      val isUa = field === "user-agent"
      val agents2 = when(isUa && st.getField("ua"),
          concat(st.getField("agents"), array(lower(value))))
        .when(isUa, array(lower(value)))
        .otherwise(st.getField("agents"))
      val d = value.cast("double")
      val newRules = when(isUa,
          array(struct(lower(value).as("agent"),
            lit(null).cast("double").as("delay"))))
        .when(field === "crawl-delay" && d.isNotNull,
          transform(st.getField("agents"), a =>
            struct(a.as("agent"), d.as("delay"))))
        .otherwise(empty)
      struct(agents2.as("agents"), isUa.as("ua"),
        concat(st.getField("out"), newRules).as("out"))
    })
    acc.getField("out")
  }

  /** The Crawl-delay for a crawler UA: the group with the longest
    * matching product token wins (`*` fallback, [[robotsAllows]]'
    * selection rule); within the group the LAST declared value wins
    * (the [[graft.sources.CpcDimSources]] keepLast convention). Null
    * when the selected group (or the whole file) declares none. */
  def crawlDelayFor(delays: Column, agent: Column): Column = {
    val ua = lower(agent)
    val bestAgentLen = aggregate(delays, lit(-1), (m, r) => {
      val t = r.getField("agent")
      when(t =!= "*" && ua.contains(t) && length(t).cast("int") > m,
        length(t).cast("int")).otherwise(m)
    })
    val chosen = filter(delays, r => {
      val t = r.getField("agent")
      when(bestAgentLen >= 0,
        t =!= "*" && ua.contains(t) && length(t).cast("int") === bestAgentLen)
        .otherwise(t === "*")
    })
    aggregate(chosen, lit(null).cast("double"),
      (acc, r) => coalesce(r.getField("delay"), acc))
  }

  /** `Sitemap:` URLs of a robots.txt body (group-independent per RFC). */
  def sitemaps(txt: Column): Column =
    filter(
      transform(split(txt, "\r?\n"), l => {
        val c = wtrim(regexp_replace(l, "#.*$", ""))
        when(lower(wtrim(substring_index(c, ":", 1))) === "sitemap",
          wtrim(expr_substr_after_colon(c))).otherwise(lit(null))
      }),
      v => v.isNotNull)

  /** everything after the first ':' ('' when there is none). */
  private def expr_substr_after_colon(l: Column): Column =
    when(l.contains(":"),
      l.substr(instr(l, ":") + 1, lit(1 << 24))).otherwise(lit(""))

  /** Does `path` match the RFC rule pattern `pat`? `*` spans, `$`
    * anchors the end, otherwise prefix-match from the path start.
    * Greedy left-to-right `locate` per literal segment — linear in
    * path length per segment. */
  private[graft] def matchesPat(path: Column, pat: Column): Column = {
    val anchored = pat.endsWith("$")
    val core = when(anchored, pat.substr(lit(1), length(pat) - 1))
      .otherwise(pat)
    val segs = split(core, "\\*", -1)
    val n = size(segs)
    val seg0 = element_at(segs, 1)
    val start = when(path.startsWith(seg0), length(seg0).cast("int"))
      .otherwise(lit(-1))
    // fold literal segments [from..to] (1-based, inclusive) through
    // leftmost locate; empty segments (adjacent *) consume nothing
    def fold(from: Column, to: Column, init: Column): Column =
      aggregate(slice(segs, from, greatest(to - from + 1, lit(0))),
        init, (c, seg) =>
          when(c < 0, c)
            .when(length(seg) === 0, c)
            .otherwise({
              val idx = call_function("locate", seg, path, c + 1)
              when(idx === 0, lit(-1))
                .otherwise(idx - 1 + length(seg).cast("int"))
            }))
    val last = element_at(segs, -1)
    when(!anchored, fold(lit(2), n, start) >= 0)
      // anchored, single segment: the pattern is start- AND end-pinned
      .when(n === 1, path === core)
      // anchored, wildcards: match all but the last segment greedily,
      // then the last must sit at the very end, after the consumed span
      .otherwise({
        val consumed = fold(lit(2), n - 1, start)
        consumed >= 0 && path.endsWith(last) &&
          (length(path) - length(last)).cast("int") >= consumed
      })
  }

  /** RFC decision for (rules, crawler UA, path): select the group with
    * the longest UA-matching product token (`*` as fallback), then the
    * longest-matching rule; allow wins length ties; no match → allowed. */
  def robotsAllows(rules: Column, agent: Column, path: Column): Column = {
    val ua = lower(agent)
    val bestAgentLen = aggregate(rules, lit(-1), (m, r) => {
      val t = r.getField("agent")
      when(t =!= "*" && ua.contains(t) && length(t).cast("int") > m,
        length(t).cast("int")).otherwise(m)
    })
    val chosen = filter(rules, r => {
      val t = r.getField("agent")
      when(bestAgentLen >= 0,
        t =!= "*" && ua.contains(t) && length(t).cast("int") === bestAgentLen)
        .otherwise(t === "*")
    })
    val verdictT = "struct<len:int,allow:boolean>"
    val best = aggregate(chosen,
      struct(lit(-1).as("len"), lit(true).as("allow")).cast(verdictT),
      (st, r) => {
        val pl = length(r.getField("pat")).cast("int")
        val better = matchesPat(path, r.getField("pat")) &&
          (pl > st.getField("len") ||
            (pl === st.getField("len") &&
              r.getField("allow") && !st.getField("allow")))
        when(better,
          struct(pl.as("len"), r.getField("allow").as("allow"))
            .cast(verdictT)).otherwise(st)
      })
    best.getField("len") < 0 || best.getField("allow")
  }
}
