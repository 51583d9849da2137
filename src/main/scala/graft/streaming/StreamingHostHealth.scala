package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Continuous host-health telemetry: the streaming half of the
  * `tx_host_health` seam — per (watermarked event-time window, host):
  * HTTP status-class counts off the live fetch stream, exact integer
  * error permille, and the backoff verdict that doubles the host's
  * declared Crawl-Delay before recomputing its per-epoch fetch capacity.
  * "Which hosts should the NEXT scheduling epoch slow down" as a standing
  * query instead of a nightly batch job.
  *
  * State per open (window, host) is five longs — independent of fetch
  * volume — and the watermark bounds how many windows stay open, so the
  * monitor's state is megabytes at any crawl scale. The robots dim is a
  * stream-static broadcast join (host-grain, tiny); the emitted rows are
  * the same report schema as the batch row, plus the window bounds, so
  * the scheduler consumes either source unchanged.
  */
object StreamingHostHealth {

  /** @param fetches   streaming DataFrame carrying `tsCol`, `hostCol`,
    *                  and integer `statusCol`
    * @param delays    STATIC host dim: (hostCol, delaySCol) — each host's
    *                  declared Crawl-Delay seconds (from `Robots
    *                  .crawlDelay`); broadcast into the stream
    * @param backoffPermille error permille at/above which the host backs
    *                  off (delay doubles)
    * @param epochSeconds the scheduling epoch the capacity is computed
    *                  for: capacity = epochSeconds div effective delay
    * @return streaming report per (closed window, host), append mode once
    *         the watermark passes the window end
    */
  def windowedHealth(
      fetches: DataFrame,
      tsCol: String,
      hostCol: String,
      statusCol: String,
      windowDuration: String,
      watermarkDelay: String,
      delays: DataFrame,
      delaySCol: String = "delay_s",
      backoffPermille: Int = 300,
      epochSeconds: Long = 3600L): DataFrame = {
    require(backoffPermille >= 0 && backoffPermille <= 1000,
      s"backoffPermille in [0, 1000], got $backoffPermille")
    require(epochSeconds > 0, s"epochSeconds must be positive, got $epochSeconds")
    def cls(lo: Int, hi: Int): Column =
      sum(when(col(statusCol) >= lo && col(statusCol) < hi, 1L).otherwise(0L))
    fetches
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(hostCol))
      .agg(count(lit(1)).as("n_fetches"),
        cls(200, 300).as("n_2xx"), cls(300, 400).as("n_3xx"),
        cls(400, 500).as("n_4xx"),
        sum(when(col(statusCol) >= 500, 1L).otherwise(0L)).as("n_5xx"))
      .withColumn("error_permille",
        expr("(n_4xx + n_5xx) * 1000 div n_fetches"))
      .withColumn("backoff", col("error_permille") >= backoffPermille)
      .join(broadcast(delays.select(col(hostCol),
        col(delaySCol).cast("long").as("delay_s"))), Seq(hostCol))
      .withColumn("effective_delay_s",
        when(col("backoff"), col("delay_s") * 2).otherwise(col("delay_s")))
      .withColumn("capacity", expr(s"$epochSeconds div effective_delay_s"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(hostCol),
        col("n_fetches"), col("n_2xx"), col("n_3xx"), col("n_4xx"),
        col("n_5xx"), col("error_permille"), col("backoff"),
        col("delay_s"), col("effective_delay_s"), col("capacity"))
  }
}
