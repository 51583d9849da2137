package graft.streaming

import graft.operators.Feeds
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Continuous feed-driven discovery: the streaming half of the
  * `tx_feed_discovery` seam. Feed fetches arrive as (event time, host,
  * feed bytes); every batch parses map-side (the same hardened
  * [[Feeds.parse]] walk as batch), entries that the crawl already knows
  * drop against the STATIC frontier first, and what survives dedupes
  * statefully so a re-polled feed — the normal case: a feed is fetched
  * hourly and its window overlaps for days — emits each NEW url exactly
  * once. "What did the web announce since the last scheduling epoch" as
  * a standing query.
  *
  * Scale design:
  *  - parse is per-record scalar work inside the source's partition;
  *    feed bytes never shuffle;
  *  - the frontier join is stream-static LEFT ANTI on the url key — the
  *    frontier side is a lake table, loaded per micro-batch plan, and
  *    prunable by the announcing hosts;
  *  - dedup state holds only urls that were NOT already known (the
  *    anti-join runs first), keyed inside the watermark horizon — state
  *    is O(new urls per horizon), the smallest set in the problem.
  */
object StreamingDiscovery {

  /** @param feedFetches streaming (event time, host, feed bytes)
    * @param frontier    STATIC known-url table; `urlCol` is its key
    * @return streaming (url, ts, host, kind, title, published) — one row
    *         per FIRST in-horizon announcement of an unknown url
    */
  def newUrls(
      feedFetches: Dataset[(Timestamp, String, Array[Byte])],
      frontier: DataFrame,
      urlCol: String = "url",
      watermarkDelay: String = "1 hour"): DataFrame = {
    import feedFetches.sparkSession.implicits._
    val entries = feedFetches
      .flatMap { case (ts, host, bytes) =>
        Feeds.parse(bytes).map(e => (ts, host, e.kind, e.link, e.title, e.published))
      }
      .toDF("ts", "host", "kind", "url", "title", "published")
    entries
      .withWatermark("ts", watermarkDelay)
      // already-crawled urls are not discoveries — drop them BEFORE any
      // state is spent on them
      .join(frontier.select(col(urlCol).as("url")), Seq("url"), "left_anti")
      // a re-polled feed re-announces its whole window: first sighting wins
      .dropDuplicatesWithinWatermark(Seq("url"))
  }
}
