package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTTP redirect-chain resolution — a crawl's 3xx captures carry a
  * `Location` header instead of content, and every downstream consumer
  * (dedup keys, link graphs, recrawl scheduling) wants the URL a chain
  * RESOLVES to, not the hop it entered at. Chains in the wild end four
  * ways, and all four must be first-class results rather than errors:
  *
  *   - `final`: the page itself is not a redirect (hops = 0).
  *   - `resolved`: the chain lands on a known final page after k hops.
  *   - `dangling`: the chain leaves the crawl (a Location nobody
  *     captured) — resolved_url is that unknown URL, hops counts the
  *     follows performed.
  *   - `loop`: the chain does not terminate within `maxHops` (cycles,
  *     or absurdly long chains — browsers cap around 20); resolved_url
  *     and hops are NULL.
  *
  * Shape at scale: one lookup round per hop, each a join of the
  * still-pending chains (a set that shrinks every round — most real
  * chains are 1-2 hops) against the page map. Bucket both sides on url
  * to co-locate the rounds' shuffles; `localCheckpoint` every few
  * rounds truncates the iterative plan. maxHops bounds the work
  * regardless of input: a crawl with a redirect cycle costs maxHops
  * rounds, never an infinite loop.
  */
object Redirects {

  /** Resolve redirect chains. `pages` must carry `urlCol` (unique key),
    * `isRedirectCol` (boolean), and `locationCol` (the redirect target,
    * ignored for non-redirects). Returns one row per input page:
    * (url, status, resolved_url, hops).
    */
  def resolve(pages: DataFrame, urlCol: String, isRedirectCol: String,
      locationCol: String, maxHops: Int = 8): DataFrame = {
    require(maxHops >= 1 && maxHops <= 64, s"resolve: maxHops in [1,64], got $maxHops")
    val map = pages.select(
      col(urlCol).as("_m_url"),
      col(isRedirectCol).as("_m_redir"),
      col(locationCol).as("_m_loc"))
    val finals = pages.filter(!col(isRedirectCol))
      .select(col(urlCol).as("url"), lit("final").as("status"),
        col(urlCol).as("resolved_url"), lit(0L).as("hops"))
    // pending chain state: url -> cur (the URL to look up next); hops =
    // Location follows performed so far. Chains LEAVE the iteration the
    // round they terminate, so each round's join input shrinks to the
    // still-unresolved tail (most real chains are 1-2 hops).
    var pending = pages.filter(col(isRedirectCol)).select(
      col(urlCol).as("url"), col(locationCol).as("cur"), lit(1L).as("hops"))
    val done = scala.collection.mutable.ArrayBuffer[DataFrame](finals)
    var hop = 0
    while (hop < maxHops) {
      val looked = pending.join(map, pending("cur") === map("_m_url"), "left")
      done += looked
        .filter(col("_m_url").isNull || !col("_m_redir"))
        .select(col("url"),
          when(col("_m_url").isNull, lit("dangling"))
            .otherwise(lit("resolved")).as("status"),
          col("cur").as("resolved_url"), col("hops"))
      pending = looked.filter(coalesce(col("_m_redir"), lit(false)))
        .select(col("url"), col("_m_loc").as("cur"), (col("hops") + 1L).as("hops"))
      hop += 1
      // truncate the iterative lineage before the plan tree compounds
      if (hop % 4 == 0 && hop < maxHops) pending = pending.localCheckpoint()
    }
    done += pending.select(col("url"), lit("loop").as("status"),
      lit(null: String).as("resolved_url"), lit(null: java.lang.Long).as("hops"))
    done.reduce(_ unionByName _)
  }

  /** Convenience column: is this HTTP status a redirect that carries a
    * Location to follow?
    */
  def isRedirectStatus(status: Column): Column =
    status.isin(301, 302, 303, 307, 308)
}
