package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite — the gate a corpus drop must
  * pass before entering the pipeline (deequ-style). Row-level constraints
  * (null/range/set/regex membership and the row-count floor) compile to
  * conditional aggregates evaluated in ONE partial-aggregated scan — at
  * 100 TB the whole suite costs a single pass, not a pass per rule.
  * Uniqueness needs a distinct count, which is its own aggregation; each
  * `Unique` adds one exact-distinct pass (a wrong "unique" verdict from a
  * sketch would be a false quality certificate, so no approximation here).
  *
  * Report: one row per constraint — (check, target, violations, passed).
  */
object Quality {

  sealed trait Check
  /** Column must contain no NULLs. */
  case class NotNull(col: String) extends Check
  /** Non-null values must fall in [lo, hi]. */
  case class InRange(col: String, lo: Double, hi: Double) extends Check
  /** Non-null values must be one of `values`. */
  case class OneOf(col: String, values: Seq[String]) extends Check
  /** Non-null values must match `regex` (Java/RE2-compatible recommended). */
  case class Matches(col: String, regex: String) extends Check
  /** Key columns must be unique across the table. */
  case class Unique(cols: Seq[String]) extends Check
  /** Table must have at least `n` rows. */
  case class MinRows(n: Long) extends Check

  /** A row-level rule compiled to a conditional aggregate: evaluating
    * `agg` over any slice of the table yields that slice's violation count.
    * Shared by the batch gate below and the per-window streaming gate
    * ([[graft.streaming.StreamingQuality]]).
    */
  private[graft] case class CompiledRule(name: String, target: String, agg: Column)

  private[graft] def compileRowRules(checks: Seq[Check]): Seq[CompiledRule] = {
    def viol(cond: Column): Column = sum(when(cond, 1L).otherwise(0L))
    checks.collect {
      case NotNull(c) =>
        CompiledRule("not_null", c, viol(col(c).isNull))
      case InRange(c, lo, hi) =>
        CompiledRule(s"in_range[$lo,$hi]", c,
          viol(col(c).isNotNull && !col(c).between(lo, hi)))
      case OneOf(c, vs) =>
        CompiledRule(s"one_of[${vs.mkString("|")}]", c,
          viol(col(c).isNotNull && !col(c).isin(vs: _*)))
      case Matches(c, re) =>
        CompiledRule(s"matches[$re]", c,
          viol(col(c).isNotNull && !col(c).rlike(re)))
    }
  }

  /** Distribution drift between two cohorts (yesterday's crawl vs today's,
    * shard A vs shard B) per group: total variation distance between the
    * cohorts' value histograms — `0` identical, `1` disjoint. The alarm
    * that catches "source X suddenly ships much shorter documents" before
    * it poisons a training mix, without storing either cohort.
    *
    * TVD = 1/2 * sum_bins |p0 - p1| is computed in EXACT integer
    * arithmetic until the final division: the per-bin term |c0*t1 - c1*t0|
    * sums exactly in any engine and any aggregation order, so the score is
    * bit-reproducible (a naive sum of per-bin double ratios is not).
    * Scale shape: one shuffle to (group, bin) — conditional partial
    * aggregates, no row survives the scan — then a groups-sized rollup.
    *
    * @param cohort boolean column: true = baseline cohort, false = compare
    * @param bin    integer bin expression (same binning both cohorts)
    */
  def distributionDrift(
      df: DataFrame, groupCol: String, cohort: Column,
      bin: Column): DataFrame = {
    val cnt = df
      .groupBy(col(groupCol), bin.as("_bin"))
      .agg(
        sum(when(cohort, 1L).otherwise(0L)).as("_c0"),
        sum(when(cohort, 0L).otherwise(1L)).as("_c1"))
    cnt
      .withColumn("_t0", sum(col("_c0")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))))
      .withColumn("_t1", sum(col("_c1")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))))
      .groupBy(col(groupCol), col("_t0"), col("_t1"))
      .agg(sum(abs(col("_c0") * col("_t1") - col("_c1") * col("_t0"))).as("_num"))
      .select(col(groupCol),
        col("_t0").as("n_baseline"), col("_t1").as("n_compare"),
        (col("_num").cast("double") / (lit(2.0) * col("_t0") * col("_t1")))
          .as("tvd"))
  }

  def check(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "quality suite needs at least one check")
    val spark = df.sparkSession
    import spark.implicits._

    // one conditional aggregate per row-level rule + the shared row count
    val rowRules: Seq[(String, String, Column)] =
      compileRowRules(checks).zipWithIndex.map { case (r, i) =>
        (r.name, r.target, r.agg.as(s"_v$i"))
      }
    val minRows = checks.collect { case MinRows(n) => n }
    val aggs = count(lit(1)).as("_n") +: rowRules.map(_._3)
    val one = df.agg(aggs.head, aggs.tail: _*).collect().head
    val nRows = one.getLong(0)

    val rowReport = rowRules.zipWithIndex.map { case ((name, target, _), j) =>
      val v = one.getLong(j + 1)
      (name, target, v, v == 0L)
    }
    val minReport = minRows.map { n =>
      ("min_rows[" + n + "]", "*", math.max(0L, n - nRows), nRows >= n)
    }
    // uniqueness: exact distinct count, one extra aggregation per key set
    val uniqReport = checks.collect { case Unique(cols) =>
      val d = df.agg(
          count(lit(1)).as("_n"),
          countDistinct(struct(cols.map(col): _*)).as("_d"))
        .collect().head
      val v = d.getLong(0) - d.getLong(1)
      ("unique", cols.mkString(","), v, v == 0L)
    }
    (rowReport ++ uniqReport ++ minReport)
      .toDF("check", "target", "violations", "passed")
  }
}
