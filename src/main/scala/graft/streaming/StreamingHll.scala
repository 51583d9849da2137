package graft.streaming

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming surface for the HLL capability: incremental
  * approximate distinct counts over event-time windows.
  *
  * The sketch monoid is exactly what streaming state wants: each window's
  * state is a fixed-size register array (4 KiB at k=4096), merged
  * incrementally per micro-batch by the same TypedImperativeAggregate the
  * batch path uses — state size is O(windows x groups x m), independent of
  * event volume, so a 100 TB/day stream holds the same state as a 1 GB/day
  * one. Watermarking bounds the number of open windows.
  */
object StreamingHll {

  /** Windowed approximate distinct: `df` must be a streaming DataFrame with
    * an event-time column. Emits one row per (window, extra groups) with the
    * HLL estimate; append mode once the watermark passes.
    */
  def windowedDistinct(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      windowDuration: String,
      watermarkDelay: String,
      k: Int = 4096,
      extraGroups: Seq[String] = Nil): DataFrame = {
    val grouped = df
      .withWatermark(tsCol, watermarkDelay)
      .groupBy((window(col(tsCol), windowDuration) +: extraGroups.map(col)): _*)
    grouped.agg(GraftFunctions.hll_cardinality(col(valueCol), k).as("approx_distinct"))
  }

  /** Windowed approximate top-k heavy hitters (Misra-Gries): the same
    * mergeable [[graft.functions.ApproxTopK]] aggregate the batch path uses,
    * as streaming state — bounded at `capacity` counters per (window, group)
    * regardless of stream volume.
    */
  def windowedTopK(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      windowDuration: String,
      watermarkDelay: String,
      k: Int = 10,
      capacity: Int = 1024,
      extraGroups: Seq[String] = Nil): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy((window(col(tsCol), windowDuration) +: extraGroups.map(col)): _*)
      .agg(GraftFunctions.approx_top_k(col(valueCol), k, capacity).as("top_k"))

  /** Windowed Count-Min frequency sketch as a stored value: per-window
    * point-queryable frequency tables ([[graft.functions.CmsSketchAgg]])
    * with depth×width longs of state per (window, group) regardless of
    * stream volume — "how often did key X occur in each hour" without
    * keeping per-key state.
    */
  def windowedFrequency(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      windowDuration: String,
      watermarkDelay: String,
      depth: Int = 5,
      width: Int = 2048,
      extraGroups: Seq[String] = Nil): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy((window(col(tsCol), windowDuration) +: extraGroups.map(col)): _*)
      .agg(GraftFunctions.cms_sketch_agg(col(valueCol), depth, width).as("cms"))

  /** Windowed GK quantile summary as a stored value — per-window
    * percentile state bounded by O(1/relativeError · log εn), so latency
    * quantiles over an unbounded stream cost constant state per window.
    * The emitted sketches re-aggregate across windows via `gk_union_agg`.
    */
  def windowedQuantile(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      windowDuration: String,
      watermarkDelay: String,
      relativeError: Double = 0.01,
      extraGroups: Seq[String] = Nil): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy((window(col(tsCol), windowDuration) +: extraGroups.map(col)): _*)
      .agg(GraftFunctions.gk_sketch_agg(col(valueCol), relativeError).as("gk"))

  /** Windowed KMV bottom-k sketch as a stored value — at most k longs of
    * state per (window, group). The emitted sketches re-aggregate via
    * `kmv_union_agg` AND support native cross-window / cross-group set
    * algebra (`kmv_jaccard`, `kmv_intersect_estimate`): e.g. "how much does
    * this hour's audience overlap with last hour's" straight from the two
    * stored kilobyte values, no raw-event replay.
    */
  def windowedKmv(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      windowDuration: String,
      watermarkDelay: String,
      k: Int = 1024,
      extraGroups: Seq[String] = Nil): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy((window(col(tsCol), windowDuration) +: extraGroups.map(col)): _*)
      .agg(GraftFunctions.kmv_sketch_agg(col(valueCol), k).as("kmv"))

  /** Same, but emitting the mergeable sketch itself — downstream consumers
    * can re-aggregate across windows/groups without reprocessing the stream.
    */
  def windowedSketch(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      windowDuration: String,
      watermarkDelay: String,
      k: Int = 4096,
      extraGroups: Seq[String] = Nil): DataFrame = {
    val grouped = df
      .withWatermark(tsCol, watermarkDelay)
      .groupBy((window(col(tsCol), windowDuration) +: extraGroups.map(col)): _*)
    grouped.agg(GraftFunctions.hll_sketch_agg(col(valueCol), k).as("sketch"))
  }
}
