package graft.streaming

import graft.operators.Quality
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous data-quality gate: the declarative constraint suite of
  * [[graft.operators.Quality]] evaluated per watermarked event-time window
  * over a stream — "did the last hour of crawl output pass the corpus
  * checks" as a standing query instead of a nightly batch job.
  *
  * The row-level rules (null / range / set / regex membership, row floor)
  * compile to the SAME conditional aggregates the batch gate uses, grouped
  * by time window: per-window state is one long per rule plus the row
  * count — independent of event volume — and the watermark bounds how many
  * windows stay open, so a 100 TB/day stream carries kilobytes of state.
  * Each closed window emits one row per constraint
  * (window_start, window_end, check, target, violations, passed), the same
  * report schema as the batch gate plus the window bounds.
  *
  * [[Quality.Unique]] is rejected: an exact uniqueness verdict needs a
  * per-key distinct aggregation (unbounded state per window), and a sketch
  * verdict would be a false quality certificate. Key-collision monitoring
  * on a stream belongs to [[StreamingDedup]] (watermark-bounded keyed
  * state), or run the batch gate over each landed window partition.
  */
object StreamingQuality {

  /** @param df streaming DataFrame with event-time column `tsCol`
    * @return streaming report: one row per (closed window, constraint),
    *         append mode once the watermark passes the window end
    */
  def windowedCheck(
      df: DataFrame,
      tsCol: String,
      windowDuration: String,
      watermarkDelay: String,
      checks: Seq[Quality.Check]): DataFrame = {
    require(checks.nonEmpty, "quality suite needs at least one check")
    require(!checks.exists(_.isInstanceOf[Quality.Unique]),
      "Unique is not supported on streams (unbounded per-window state); " +
        "use StreamingDedup for keyed duplicate monitoring")
    val rules = Quality.compileRowRules(checks)
    val minRows = checks.collect { case Quality.MinRows(n) => n }

    val aggs = count(lit(1)).as("_n") +:
      rules.zipWithIndex.map { case (r, i) => r.agg.as(s"_v$i") }
    val agged = df
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(aggs.head, aggs.tail: _*)

    // post-aggregation projection is stateless: fan the per-window counters
    // out to one report row per constraint
    val reports =
      rules.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("check"), lit(r.target).as("target"),
          col(s"_v$i").as("violations"), (col(s"_v$i") === 0L).as("passed"))
      } ++ minRows.map { n =>
        struct(lit(s"min_rows[$n]").as("check"), lit("*").as("target"),
          greatest(lit(0L), lit(n) - col("_n")).as("violations"),
          (col("_n") >= n).as("passed"))
      }
    agged
      .select(col("window"), explode(array(reports: _*)).as("_r"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("_r.check").as("check"), col("_r.target").as("target"),
        col("_r.violations").as("violations"), col("_r.passed").as("passed"))
  }
}
