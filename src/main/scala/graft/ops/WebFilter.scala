package graft.ops

import graft.functions.{TextFunctions, UrlFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain-level corpus curation (beyond-reference scope: the standard
  * web-crawl filtering stage — RefinedWeb/C4 drop whole registered domains
  * from a blocklist before any per-document work, because domain membership
  * is the cheapest highest-precision quality signal available).
  *
  * Scale shape: the domain is a codegen'd projection
  * ([[graft.functions.UrlFunctions.urlDomain]]), so blocklist filtering is a
  * scan-speed operation. Small blocklists inline as an `IN` predicate
  * (pushable to the source); arbitrarily large blocklist TABLES go through a
  * broadcast LEFT ANTI join — the corpus never shuffles either way.
  */
object WebFilter {

  /** Registered domain of `urlCol` (last two host labels, lowercased). */
  def domainOf(urlCol: Column): Column = UrlFunctions.urlDomain(urlCol)

  /** Drop rows whose registered domain is in `blocked` (inline literal list —
    * becomes one IN predicate evaluated at scan speed).
    */
  def blockDomains(df: DataFrame, urlCol: Column, blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "blockDomains: empty blocklist")
    df.where(!domainOf(urlCol).isin(blocked.map(_.toLowerCase): _*))
  }

  /** Drop rows whose registered domain appears in `blocklist` (a one-column
    * DataFrame of domains) — broadcast LEFT ANTI join, zero corpus shuffle.
    * The blocklist side is deduped + lowercased so callers can feed raw
    * lists.
    */
  def blockDomainsTable(df: DataFrame, urlCol: Column, blocklist: DataFrame): DataFrame = {
    val blockCol = blocklist.columns.head
    val bl = blocklist.select(lower(col(blockCol)).as("__blocked_domain")).distinct()
    df.join(broadcast(bl), domainOf(urlCol) === col("__blocked_domain"), "left_anti")
  }

  /** Per-domain corpus stats: `(domain, n_docs, n_tokens)` — the aggregate
    * behind manual blocklist curation (sort by n_docs, eyeball the head).
    * One partial-agg shuffle on the 'domain' key; integer-only so results
    * are engine-portable bit-for-bit.
    */
  def domainStats(df: DataFrame, urlCol: Column, textCol: Column): DataFrame =
    df.groupBy(domainOf(urlCol).as("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(textCol).cast("long")).as("n_tokens"),
      )
}
