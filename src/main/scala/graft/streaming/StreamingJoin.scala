package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the standard streaming
  * enrichment shape (impressions joined to the clicks that follow within a
  * bound, events to metadata updates, frames to transcripts).
  *
  * Both sides carry event-time watermarks and the join condition bounds the
  * right timestamp to `[leftTs - before, leftTs + after]`, so Spark's
  * symmetric-hash stream-stream join can evict buffered state as the
  * watermark advances: state volume is O(rows inside the watermark+interval
  * horizon) per side, independent of stream length — the property that makes
  * this runnable forever at 100 TB/day. Without the time bound the state
  * grows without limit (and Spark rejects outer joins outright).
  *
  * `left_outer` additionally emits unmatched left rows (null right columns)
  * once the watermark proves no match can still arrive — the streaming
  * equivalent of "impression with no click".
  *
  * The two inputs must not share column names (alias before calling); the
  * join condition references both sides by name.
  */
object StreamingJoin {

  def intervalJoin(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      before: String = "0 seconds", after: String = "10 minutes",
      watermarkDelay: String = "0 seconds",
      joinType: String = "inner"): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left/right column names must be disjoint, both have: ${overlap.mkString(", ")}")
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    val cond = col(leftKey) === col(rightKey) &&
      col(rightTs) >= col(leftTs) - expr(s"INTERVAL $before") &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $after")
    l.join(r, cond, joinType)
  }
}
