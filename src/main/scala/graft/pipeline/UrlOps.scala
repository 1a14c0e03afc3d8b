package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + capture dedup for Common-Crawl-style corpora.
  *
  * A web-scale crawl sees the same page under many spellings — scheme/host
  * case, default ports, trailing slashes, tracking parameters, fragments,
  * shuffled query order — and under many capture timestamps. Before any
  * content-level dedup (exact / MinHash / SimHash in [[Dedup]]) a training
  * pipeline collapses captures by *canonical URL*, keeping the latest. This
  * is the URL-normalization stage of that pipeline (RFC 3986 §6 syntax-based
  * normalization plus the usual crawl-specific extras), expressed entirely as
  * codegen'd column operations (`functions._`, no UDFs) so it runs at full
  * Parquet scan speed; the dedup itself is ONE hash shuffle on the canonical
  * key — the same shape as `dedup_exact`, linear at any corpus size.
  *
  * Every rule is RE2-compatible (no backreferences), so a SQL oracle can
  * replicate the whole pipeline with the same regexes.
  */
object UrlOps {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostRe   = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
  private val PathRe   = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
  private val QueryRe  = "\\?([^#]*)"

  /** Tracking parameters dropped by canonicalization (`utm_*` plus the
    * common click identifiers). Anchored match on the `key=` prefix.
    */
  val TrackingParamRe = "^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|igshid|ref_src)="

  /** Canonical form of an absolute http(s) URL:
    *
    *   - scheme and host lowercased,
    *   - default ports stripped (`:80` for http, `:443` for https; any other
    *     explicit port survives),
    *   - empty path normalized to `/`, trailing slashes stripped otherwise,
    *   - fragment dropped,
    *   - tracking parameters ([[TrackingParamRe]]) and empty params dropped,
    *   - surviving query parameters sorted (order-insensitive equality).
    *
    * Pure `functions._` composition — stays inside whole-stage codegen.
    */
  def canonicalUrl(url: Column): Column = {
    val scheme   = lower(regexp_extract(url, SchemeRe, 1))
    val hostport = lower(regexp_extract(url, HostRe, 1))
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val rawPath  = regexp_extract(url, PathRe, 1)
    val stripped = rtrim(rawPath, "/")
    val path     = when(stripped === "", lit("/")).otherwise(stripped)
    val params = filter(
      split(regexp_extract(url, QueryRe, 1), "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe))
    val qs = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }

  /** Host of an absolute URL (lowercased, port stripped). */
  def hostOf(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, HostRe, 1)), ":[0-9]+$", "")

  /** Registrable domain of a host — the last two dot-labels
    * (`www.site3.example.com` → `example.com`). The zero-shuffle pure-column
    * approximation: WRONG for multi-label public suffixes (`site.co.uk`
    * collapses to `co.uk`, merging unrelated registrants) — use
    * [[PublicSuffix.withRegistrableDomain]] (the PSL broadcast-join,
    * [[domainStats]]'s default) wherever grouping correctness matters; this
    * stays for single-pass column contexts that tolerate the
    * approximation.
    */
  def registrableDomain(host: Column): Column = {
    val last2 = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    when(last2 === "", host).otherwise(last2)
  }

  /** Per-domain crawl rollup — the domain-level statistics stage of a
    * web-corpus pipeline (head-domain skew report, per-domain quality
    * inputs): pages, distinct canonical URLs, distinct hosts, language
    * spread, and mean text length per registrable domain. ONE hash shuffle
    * on the domain key; the distinct counts ride the same aggregation as
    * HLL-free exact `count_distinct` (at 100 TB swap to
    * `approx_count_distinct` — same plan shape, documented tradeoff).
    */
  def domainStats(pages: DataFrame, urlCol: String, textLenCol: String,
                  langCol: String, psl: Boolean = true): DataFrame = {
    val curl = canonicalUrl(col(urlCol))
    val hosted = pages
      .withColumn("curl", curl)
      .withColumn("host", hostOf(col("curl")))
    val domained =
      if (psl) PublicSuffix.withRegistrableDomain(hosted, "host")
      else hosted.withColumn("domain", registrableDomain(col("host")))
    domained
      .groupBy(col("domain"))
      .agg(
        count(lit(1)).as("pages"),
        count_distinct(col("curl")).as("n_urls"),
        count_distinct(col("host")).as("n_hosts"),
        count_distinct(col(langCol)).as("n_langs"),
        sum(col(textLenCol)).cast("long").as("len_sum"))
      // exact integer sum + one division: the mean is bit-deterministic
      // regardless of aggregation order (float sums are not)
      .withColumn("avg_len",
        col("len_sum").cast("double") / col("pages").cast("double"))
      .drop("len_sum")
  }

  /** Regex matching one complete double-quoted link, `<a href="…" …>text</a>`
    * (RE2-safe: no backreferences, so a DuckDB oracle can run it verbatim).
    * Anchor text is the tag's immediate character run — a link whose text
    * holds nested markup, or an unterminated `<a>`, simply doesn't match.
    */
  val LinkRe = "<a href=\"[^\"]+\"[^>]*>[^<]*</a>"

  /** (href, anchor-text) pairs exploded from an HTML column — the
    * link-extraction step of an anchor-text corpus (the web-graph signal a
    * search index feeds beside body text; the reference's crawl heritage
    * keeps an HTML link parser in its benchmark feeds,
    * `/root/reference/lucene/benchmark/.../feeds/DemoHTMLParser.java`).
    * ONE `regexp_extract_all` pulls whole links, then href and text are
    * re-extracted per link — a single match list, so a malformed tag drops
    * its own pair and can never misalign the pairs after it (zipping two
    * independent extractions would). One projection + one explode, no
    * shuffle; all codegen'd `functions._`.
    */
  def anchorPairs(pages: DataFrame, htmlCol: String,
                  dropNofollow: Boolean = false): DataFrame = {
    val linked = pages
      .withColumn("__link",
        explode(regexp_extract_all(col(htmlCol), lit(LinkRe), lit(0))))
    val kept =
      if (dropNofollow) {
        // rel="nofollow" links carry no ranking endorsement. The rel value
        // is read from the TAG portion only (before '>') and matched on
        // token boundaries: multi-token values (rel="ugc nofollow",
        // rel="nofollow noopener") must drop too, and an anchor TEXT that
        // merely contains the literal string must not — same boundary
        // discipline as dropNoindex's directive match.
        val rel = regexp_extract(col("__link"), "^<a [^>]*rel=\"([^\"]*)\"", 1)
        linked.where(!rel.rlike("(^|\\s)nofollow(\\s|$)"))
      } else linked
    kept
      .withColumn("href", regexp_extract(col("__link"), "<a href=\"([^\"]+)\"", 1))
      .withColumn("anchor", regexp_extract(col("__link"), ">([^<]*)</a>", 1))
      .drop("__link")
  }

  /** Anchor-text rollup per link target: canonicalize each href and
    * aggregate the anchors pointing at it — links, distinct sources, and
    * the sorted distinct anchor texts. ONE hash shuffle on the canonical
    * target.
    */
  def anchorTexts(pages: DataFrame, htmlCol: String, idCol: String,
                  dropNofollow: Boolean = false): DataFrame =
    anchorPairs(pages, htmlCol, dropNofollow)
      .withColumn("target", canonicalUrl(col("href")))
      .groupBy(col("target"))
      .agg(
        count(lit(1)).as("n_links"),
        count_distinct(col(idCol)).as("n_sources"),
        array_join(array_sort(collect_set(col("anchor"))), "|").as("anchors"))

  /** Content of a page's `<meta name="robots" content="…">` directive
    * (empty string when absent). One codegen'd regexp over double-quoted
    * attributes in either order.
    */
  def metaRobots(html: Column): Column = {
    val a = regexp_extract(html,
      "<meta name=\"robots\" content=\"([^\"]*)\"", 1)
    val b = regexp_extract(html,
      "<meta content=\"([^\"]*)\" name=\"robots\"", 1)
    when(a =!= "", a).otherwise(b)
  }

  /** Drop pages whose robots directive declares `noindex` — the crawl
    * pipeline's index-eligibility gate (a search engine must not index
    * such pages; the reference leaves this to the feeding crawler, e.g.
    * Nutch's indexing filters). Token-boundary match inside the
    * comma-separated directive list; zero-shuffle filter.
    */
  def dropNoindex(pages: DataFrame, htmlCol: String): DataFrame =
    pages.where(!metaRobots(col(htmlCol))
      .rlike("(^|,)\\s*noindex\\s*(,|$)"))

  /** Declared canonical target of a page (`<link rel="canonical"
    * href="…">`), empty when absent. */
  def canonicalLink(html: Column): Column =
    regexp_extract(html, "<link rel=\"canonical\" href=\"([^\"]+)\"", 1)

  /** Fold pages onto their declared canonical URL: the effective identity
    * of a page is its canonical-link target when present, else its own
    * URL — applied BEFORE capture dedup so duplicate-content spellings
    * collapse to the canonical page (the crawl pipeline's canonical-tag
    * stage). Adds `eff_url` (canonicalized); zero-shuffle projection.
    */
  def foldCanonical(pages: DataFrame, htmlCol: String,
                    urlCol: String): DataFrame = {
    val declared = canonicalLink(col(htmlCol))
    pages.withColumn("eff_url",
      canonicalUrl(when(declared =!= "", declared).otherwise(col(urlCol))))
  }

  /** Recrawl snapshot diff — the incremental-crawl stage that feeds index
    * updates: full-outer join of two crawl snapshots on the canonical URL,
    * classifying each page as `new` (absent before), `gone` (absent now),
    * `changed` (content fingerprint differs) or `unchanged`. The `changed`
    * + `new` rows are exactly the docs an NRT ingest re-indexes and `gone`
    * the docs it tombstones (graft's `Streaming.indexStream` + `Deletes`).
    * ONE hash shuffle per side on the canonical key; snapshots are expected
    * canonical-unique (run [[latestCapture]] first on raw captures).
    */
  def recrawlDiff(prev: DataFrame, next: DataFrame,
                  urlCol: String, fpCol: String): DataFrame = {
    val p = prev.select(canonicalUrl(col(urlCol)).as("curl"),
      col(fpCol).as("old_fp"))
    val nx = next.select(canonicalUrl(col(urlCol)).as("curl"),
      col(fpCol).as("new_fp"))
    p.join(nx, Seq("curl"), "full_outer")
      .withColumn("status",
        when(col("old_fp").isNull, lit("new"))
          .when(col("new_fp").isNull, lit("gone"))
          .when(col("old_fp") === col("new_fp"), lit("unchanged"))
          .otherwise(lit("changed")))
  }

  /** Keep the latest capture per canonical URL: one groupBy on the canonical
    * key (`max_by` for the kept row, so a single shuffle carries both the
    * winner and the group size). `tsCol` is any totally-ordered capture
    * stamp (warc_ts, crawl id, docId); ties broken by the larger id via the
    * (ts, id) struct ordering.
    */
  def latestCapture(pages: DataFrame, urlCol: String, tsCol: String,
                    idCol: String): DataFrame =
    pages
      .withColumn("curl", canonicalUrl(col(urlCol)))
      .groupBy(col("curl"))
      .agg(
        max_by(col(idCol), struct(col(tsCol), col(idCol))).as("kept_id"),
        count(lit(1)).as("n_captures"))

  /** Resolve redirect chains to their final targets — the 3xx-folding stage
    * of a crawl frontier (a crawl sees `A -> B -> C` and must credit/crawl
    * only `C`; cycles and over-long chains are abandoned as unresolved).
    *
    * Pointer doubling, not linear chasing: each round composes the map with
    * itself (`f := f∘f`), so a `maxHops` bound needs `log2(maxHops)` joins —
    * at web scale a 16-hop budget costs 4 balanced self-joins instead of 16,
    * and a redirect cycle can never loop the driver (hops saturate at
    * `maxHops` and the row reports `resolved = false` because its target is
    * still a redirect source). `localCheckpoint` after each round keeps the
    * plan linear in rounds (the same superstep discipline as
    * [[graft.pipeline.WebGraph.pageRank]]).
    *
    * Returns (src, target, hops, resolved): `target` is the node reached
    * after exactly `min(chainLength, maxHops)` steps; `resolved` is false
    * iff that node still redirects (cycle or truncated chain). `maxHops`
    * must be a power of two so the doubled span lands exactly on the budget.
    * `checkpoint = false` skips the per-round localCheckpoint so the doubling
    * joins stay visible in one explain (plan-audit use only — production
    * callers keep the default, same knob as pageRank's `checkpointEvery`).
    */
  def resolveRedirects(redirects: DataFrame, srcCol: String, dstCol: String,
                       maxHops: Int = 16, checkpoint: Boolean = true): DataFrame = {
    require(maxHops >= 1 && (maxHops & (maxHops - 1)) == 0,
      s"maxHops must be a power of two, got $maxHops")
    var d = redirects
      .select(col(srcCol).as("src"), col(dstCol).as("cur"), lit(1L).as("hops"))
    var span = 1
    while (span < maxHops) {
      val right = d.select(col("src").as("j_src"), col("cur").as("j_cur"),
        col("hops").as("j_hops"))
      d = d.join(right, d("cur") === right("j_src"), "left")
        .select(col("src"),
          coalesce(col("j_cur"), col("cur")).as("cur"),
          (col("hops") + coalesce(col("j_hops"), lit(0L))).as("hops"))
      if (checkpoint) d = d.localCheckpoint()
      span *= 2
    }
    val srcs = redirects.select(col(srcCol).as("cur")).distinct()
      .withColumn("__isSrc", lit(true))
    d.join(srcs, Seq("cur"), "left")
      .select(col("src"), col("cur").as("target"), col("hops"),
        not(coalesce(col("__isSrc"), lit(false))).as("resolved"))
  }

  /** robots.txt allow/disallow decisions for a set of paths under ONE
    * user-agent's rule group — Google's REP semantics (RFC 9309 §2.2.2):
    * the rule with the longest pattern wins; on a length tie the least
    * restrictive (Allow) wins; no matching rule means allowed. Patterns are
    * path prefixes with `*` wildcards and an optional `$` end anchor.
    *
    * The rule group is crawl-config-sized, so it broadcasts: one
    * broadcast-join + one hash agg per decision batch, linear in paths.
    * Pattern chars are restricted to the RE2-safe set this translator
    * handles (`.` escaped, `*` -> `.*`, trailing `$` kept as the anchor).
    */
  def robotsDecisions(paths: DataFrame, idCol: String, pathCol: String,
                      rules: Seq[(String, Boolean)]): DataFrame = {
    val spark = paths.sparkSession
    import spark.implicits._
    val ruleRows = rules.map { case (p, allow) =>
      (p, robotsPatternRegex(p), p.length, if (allow) 1 else 0)
    }
    val rulesDf = ruleRows.toDF("pattern", "re", "plen", "allow_i")
    val matched = paths
      .select(col(idCol).as("__id"), col(pathCol).as("__path"))
      .join(broadcast(rulesDf), regexp_like(col("__path"), col("re")))
      .groupBy($"__id", $"__path")
      .agg(max(struct($"plen", $"allow_i")).as("best"))
      .select($"__id", $"__path", ($"best.allow_i" === 1).as("__allowed"))
    paths.select(col(idCol).as("__id"), col(pathCol).as("__path"))
      .join(matched, Seq("__id", "__path"), "left")
      .select(col("__id").as(idCol), col("__path").as(pathCol),
        coalesce(col("__allowed"), lit(true)).as("allowed"))
  }

  /** RE2 regex for a robots.txt path pattern: anchored prefix match, `*` is
    * any run, trailing `$` anchors the end. Restricted to the charset the
    * translator escapes correctly.
    */
  def robotsPatternRegex(pattern: String): String = {
    val (body, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true) else (pattern, false)
    require(body.forall(c => c.isLetterOrDigit || "/*._-".contains(c)),
      s"unsupported robots pattern char in '$pattern'")
    val re = body.flatMap {
      case '*' => ".*"
      case '.' => "\\."
      case c => c.toString
    }
    "^" + re + (if (anchored) "$" else "")
  }
}
