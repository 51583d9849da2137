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
    val aggs = count(lit(1)).as("_rows") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_nulls_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"),
        GraftFunctions.hll_cardinality(col(c), k).as(s"_dist_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // stack takes a flat argument list, 6 values per output row
    val stacked = cols.map { c =>
      s"'$c', _rows, _nulls_$c, _min_$c, _max_$c, _dist_$c"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.length}, $stacked) AS " +
        "(col_name, n_rows, n_nulls, min_s, max_s, n_distinct_est)")
  }
}
