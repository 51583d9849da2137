package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass column profiling — the "what is in this table" report run
  * before any pipeline touches a new corpus drop: per column, row/null
  * counts, min/max, and a distinct-cardinality estimate.
  *
  * The distinct counts use the HLL aggregate rather than exact
  * `count_distinct`, deliberately: N exact distincts in one aggregation make
  * Catalyst plan an Expand (input multiplied ×N before the shuffle), and at
  * 100 TB profiling must stay ONE partial-aggregated scan with a
  * constant-size (N sketches) shuffle. Estimates are deterministic (fixed
  * hash), within the sketch's published error.
  */
object Profile {

  /** One row per profiled column: (col_name, n_rows, n_nulls, min_s, max_s,
    * n_distinct_est). min/max are string-rendered so heterogeneous column
    * types stack into one report.
    */
  def profile(df: DataFrame, cols: Seq[String], k: Int = 4096): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // positional intermediate aliases + backtick-quoted source refs: column
    // names with dots/spaces/quotes must not leak into parsed expressions
    def src(c: String) = col("`" + c.replace("`", "``") + "`")
    val aggs = count(lit(1)).as("_rows") +: cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        sum(when(src(c).isNull, 1L).otherwise(0L)).as(s"_nulls_$i"),
        min(src(c)).cast("string").as(s"_min_$i"),
        max(src(c)).cast("string").as(s"_max_$i"),
        GraftFunctions.hll_cardinality(src(c), k).as(s"_dist_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // stack takes a flat argument list, 6 values per output row
    val stacked = cols.zipWithIndex.map { case (c, i) =>
      val lit = c.replace("\\", "\\\\").replace("'", "\\'")
      s"'$lit', _rows, _nulls_$i, _min_$i, _max_$i, _dist_$i"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.length}, $stacked) AS " +
        "(col_name, n_rows, n_nulls, min_s, max_s, n_distinct_est)")
  }
}
