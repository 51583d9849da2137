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

  /** Windowed histogram emission — the streaming half of the drift
    * monitor: one count per (window, group, bin), constant state per open
    * (window, group, bin) cell regardless of volume. The emitted rows form
    * a standing histogram table; [[histogramDrift]] (batch, run over that
    * table by the alerting job) scores consecutive windows against each
    * other. Splitting it this way keeps the streaming query a single
    * stateful aggregation — cross-window comparison happens over the sink,
    * where both windows are already final.
    */
  def windowedHistogram(
      df: DataFrame,
      tsCol: String,
      windowDuration: String,
      watermarkDelay: String,
      groupCol: String,
      bin: org.apache.spark.sql.Column): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(groupCol),
        bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(groupCol),
        col("bin"), col("n"))

  /** Window-over-window drift from an emitted histogram table: total
    * variation distance between each (group, window) histogram and the
    * SAME group's previous window — [[graft.operators.Quality
    * .distributionDrift]]'s exact-integer formula applied along the time
    * axis. Returns one row per (group, window) that has a predecessor.
    */
  def histogramDrift(hist: DataFrame, groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // successor map: (_g, _w = a window, _next = the window that compares
    // against it); fresh column names so the hist self-joins below stay
    // unambiguous
    val succ = hist
      .select(col(groupCol).as("_g"), col("window_start").as("_w")).distinct()
      .withColumn("_next", lead(col("_w"), 1).over(
        Window.partitionBy(col("_g")).orderBy(col("_w"))))
      .filter(col("_next").isNotNull)
    // every histogram cell contributes to the comparison row of its OWN
    // window (as current) and of its successor window (as previous); the
    // union + re-aggregation aligns bins without a full-outer join
    val curContrib = hist
      .join(succ, col(groupCol) === col("_g") && col("window_start") === col("_next"))
      .select(col(groupCol), col("window_start"), col("bin"),
        col("n").as("_c1"), lit(0L).as("_c0"))
    val prevContrib = hist
      .join(succ, col(groupCol) === col("_g") && col("window_start") === col("_w"))
      .select(col(groupCol), col("_next").as("window_start"), col("bin"),
        lit(0L).as("_c1"), col("n").as("_c0"))
    val cells = curContrib.unionByName(prevContrib)
      .groupBy(col(groupCol), col("window_start"), col("bin"))
      .agg(sum(col("_c0")).as("_c0"), sum(col("_c1")).as("_c1"))
    val w = Window.partitionBy(col(groupCol), col("window_start"))
    cells
      .withColumn("_t0", sum(col("_c0")).over(w))
      .withColumn("_t1", sum(col("_c1")).over(w))
      .groupBy(col(groupCol), col("window_start"), col("_t0"), col("_t1"))
      .agg(sum(abs(col("_c1") * col("_t0") - col("_c0") * col("_t1"))).as("_num"))
      .select(col(groupCol), col("window_start"),
        col("_t0").as("n_prev"), col("_t1").as("n_cur"),
        (col("_num").cast("double") / (lit(2.0) * col("_t0") * col("_t1")))
          .as("tvd"))
  }

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
