package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: how many users completed stage k only counting
  * occurrences that happened AFTER their stage k−1 — the product-analytics
  * query (view → click → purchase) that naive per-stage counts get wrong
  * (a purchase before the first view must not count).
  *
  * Implementation: one cumulative per-user window per stage, chained — a
  * row satisfies stage k if it matches the stage type AND stage k−1 was
  * already satisfied somewhere earlier in the user's ordered history.
  * All windows share one partitioning (user) and ordering (ts, tiebreak),
  * so Catalyst plans ONE exchange + ONE sort and evaluates the chain in a
  * single per-user sweep; the per-user rollup reuses the same partitioning
  * (no second shuffle). At 100 TB: shuffle = |events| rows once, state =
  * one flag per stage per user-partition sweep.
  */
object Funnel {

  /** @return one row per stage: (stage_idx, stage, n_users) with n_users =
    *         users whose ordered history contains the stage prefix.
    */
  def funnel(
      events: DataFrame,
      userCol: String, tsCol: String, typeCol: String,
      stages: Seq[String],
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(!events.columns.exists(_.matches("_s\\d+")),
      "funnel reserves column names _s<i>")
    val order = Window.partitionBy(col(userCol))
      .orderBy((col(tsCol) +: tieBreakCols.map(col)): _*)
    val w = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var df = events
    stages.zipWithIndex.foreach { case (st, i) =>
      // stage k-1 must be satisfied STRICTLY EARLIER: read the cumulative
      // flag at the previous row (lag of a running max = max over strictly
      // preceding rows), else a repeated stage type (click -> click) would
      // credit both stages from one event
      val reached =
        if (i == 0) lit(1)
        else coalesce(lag(col(s"_s${i - 1}"), 1).over(order), lit(0))
      df = df.withColumn(s"_s$i",
        max(when(col(typeCol) === st && reached === 1, 1).otherwise(0)).over(w))
    }
    val perUser = df.groupBy(col(userCol))
      .agg(max(col("_s0")).as("_r0"),
        stages.indices.drop(1).map(i => max(col(s"_s$i")).as(s"_r$i")): _*)
    val totals = perUser.agg(
      sum(col("_r0")).as("_n0"),
      stages.indices.drop(1).map(i => sum(col(s"_r$i")).as(s"_n$i")): _*)
    val stacked = stages.zipWithIndex.map { case (st, i) =>
      s"$i, '${st.replace("\\", "\\\\").replace("'", "\\'")}', _n$i"
    }.mkString(", ")
    totals.selectExpr(
      s"stack(${stages.length}, $stacked) AS (stage_idx, stage, n_users)")
  }
}
