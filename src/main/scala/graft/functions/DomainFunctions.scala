package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-level (per-source) corpus curation — the "judge the domain, not
  * just the page" pass of web-scale pipelines (C4's blocklists,
  * RefinedWeb/CCNet per-domain quality gating): a source whose documents
  * are collectively low-quality is dropped wholesale, including its
  * individually-acceptable pages.
  *
  * Scale shape: the corpus aggregates ONCE keyed by source into a stats
  * table of |sources| rows (domains ≪ documents by many orders of
  * magnitude), decisions are made on that table, and the verdicts join
  * back as a broadcast semi-join — the corpus itself never shuffles.
  */
object DomainFunctions {

  /** Per-source corpus stats: document count, short-document count and
    * fraction (token count < `minTokens`), mean token count. All ratios
    * are `bigint-sum / bigint-count` double divisions — bit-identical
    * across engines, no rounding. */
  def sourceStats(docs: DataFrame, srcCol: String, textCol: String,
      minTokens: Int): DataFrame = {
    val toks = TextFunctions.tokenCount(col(textCol)).cast("long")
    docs.select(col(srcCol).as("source"), toks.as("__tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__tok") < minTokens, 1L).otherwise(0L)).as("n_short"),
        sum(col("__tok")).as("__sum_tok"))
      .select(col("source"), col("n_docs"), col("n_short"),
        (col("n_short").cast("double") / col("n_docs").cast("double"))
          .as("short_frac"),
        (col("__sum_tok").cast("double") / col("n_docs").cast("double"))
          .as("avg_tokens"))
  }

  /** Sources that pass the gate: short-doc fraction ≤ `maxShortFrac`. */
  def passingSources(docs: DataFrame, srcCol: String, textCol: String,
      minTokens: Int, maxShortFrac: Double): DataFrame =
    sourceStats(docs, srcCol, textCol, minTokens)
      .filter(col("short_frac") <= maxShortFrac)
      .select(col("source").as(srcCol))

  /** Domain-level quality filter: keep only documents whose source passes
    * [[passingSources]]. The verdict table is |passing sources| rows and
    * broadcasts; the kept fraction streams through a map-side semi-join. */
  def filterBySourceQuality(docs: DataFrame, srcCol: String, textCol: String,
      minTokens: Int, maxShortFrac: Double): DataFrame =
    docs.join(
      broadcast(passingSources(docs, srcCol, textCol, minTokens, maxShortFrac)),
      Seq(srcCol), "left_semi")

  /** URL canonicalization — the key function of crawl-level dedup (the
    * same page is fetched under scheme/host case variants, default
    * ports, tracking parameters, shuffled query order, trailing slashes
    * and fragments; CommonCrawl-style pipelines dedup by canonical URL
    * before any content pass). Rules, all engine-portable string ops so
    * the DuckDB oracle replays them bit-for-bit:
    *
    *  - scheme and host lowercase (path/query stay case-sensitive, per
    *    URL semantics);
    *  - default port stripped (:80 for http, :443 for https);
    *  - fragment dropped;
    *  - tracking parameters dropped (utm_*, fbclid, gclid);
    *  - surviving query parameters sorted;
    *  - trailing path slash stripped.
    *
    * Per-row and codegen'd (regex + array ops) — no shuffle, no UDF. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host0 = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .otherwise(host0)
    val path = regexp_replace(
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/$", "")
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val params = array_join(
      array_sort(filter(split(query, "&"), p =>
        p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid)="))), "&")
    concat(scheme, lit("://"), host, path,
      when(params === "", lit("")).otherwise(concat(lit("?"), params)))
  }

  /** Crawl dedup by canonical URL: one row per canonical form with the
    * kept fetch (lowest id) and the duplicate count — the pre-content
    * dedup tier that removes refetches before any text ever shuffles.
    * Groups on the canonical string; cost is one hash aggregation. */
  def dedupByCanonicalUrl(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"), canonicalizeUrl(col(urlCol)).as("url_canonical"))
      .groupBy("url_canonical")
      .agg(min(col("id")).as("kept_id"),
        (count(lit(1)) - 1).cast("long").as("n_dups"))
}
