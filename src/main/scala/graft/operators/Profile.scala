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
    profileImpl(df, cols, k)
  }

  /** [[profile]] plus an exactness escape hatch: columns in `exact` get a
    * precise `n_distinct` alongside the estimate — the "is this column an
    * enum" question that an HLL answer of 4.0000x leaves open.
    *
    * The exact side deliberately does NOT join the estimate pass's
    * aggregation: N exact distincts in one agg make Catalyst plan an Expand
    * (input ×N before the shuffle — the shape [[profile]] exists to avoid).
    * Instead each exact column runs its own two-level aggregate
    * (partial-distinct then count) over a ONE-column pruned scan; columnar
    * formats make that scan proportional to the single column, and the
    * results broadcast-join back into the report on col_name. Reserve it
    * for the low-cardinality columns the flag is named for — a high-card
    * column's exact distinct is the full shuffle the estimate path saves.
    */
  def profile(df: DataFrame, cols: Seq[String], k: Int,
      exact: Set[String]): DataFrame = {
    require(exact.subsetOf(cols.toSet),
      s"exact columns ${exact.diff(cols.toSet).mkString(",")} not in profiled columns")
    val base = profileImpl(df, cols, k)
    if (exact.isEmpty)
      return base.withColumn("n_distinct", lit(null).cast("long"))
    val exacts = exact.toSeq.sorted.map { c =>
      df.select(src(c)).distinct()
        .agg(count(src(c)).as("n_distinct")) // count(col): nulls excluded,
        .withColumn("col_name", lit(c))      // matching the estimate side
    }.reduce(_ unionByName _)
    base.join(broadcast(exacts), Seq("col_name"), "left")
  }

  /** The full one-pass profiler: [[profile]]'s base stats plus, per NUMERIC
    * column, GK quantiles (p25/p50/p75), and per CATEGORICAL column the
    * Misra-Gries top value with its count. Still ONE partial-aggregated
    * scan — per-column state is a KB-scale GK summary / `topCapacity` MG
    * entries, never an Expand, never a per-column rescan.
    *
    * Determinism contract: quantiles are within `relErr × n` ranks but the
    * exact returned sample can vary with partition merge order — treat
    * them as bounded estimates (the contract query checks rank bounds, not
    * values). Top values ARE deterministic when `topCapacity` covers the
    * column's distinct count (the regime categorical profiling targets).
    */
  def profileDeep(df: DataFrame, numeric: Seq[String], categorical: Seq[String],
      k: Int = 4096, relErr: Double = 0.01, topCapacity: Int = 64): DataFrame = {
    require(numeric.nonEmpty || categorical.nonEmpty, "profileDeep needs columns")
    require(numeric.intersect(categorical).isEmpty,
      s"columns in both lists: ${numeric.intersect(categorical).mkString(",")}")
    val cols = numeric ++ categorical
    val aggs = count(lit(1)).as("_rows") +: (cols.zipWithIndex.flatMap { case (c, i) =>
      baseAggs(c, i, k)
    } ++ numeric.indices.map { i =>
      GraftFunctions.gk_sketch_agg(src(numeric(i)).cast("double"), relErr).as(s"_gk_$i")
    } ++ categorical.indices.map { i =>
      GraftFunctions.topk_sketch_agg(src(categorical(i)), topCapacity).as(s"_tk_$i")
    })
    var one = df.agg(aggs.head, aggs.tail: _*)
    numeric.indices.foreach { i =>
      one = one
        .withColumn(s"_p25_$i", GraftFunctions.gk_quantile(col(s"_gk_$i"), lit(0.25)))
        .withColumn(s"_p50_$i", GraftFunctions.gk_quantile(col(s"_gk_$i"), lit(0.5)))
        .withColumn(s"_p75_$i", GraftFunctions.gk_quantile(col(s"_gk_$i"), lit(0.75)))
    }
    categorical.indices.foreach { i =>
      // try_element_at, not element_at: an all-null column exports an
      // EMPTY entry list, and under ANSI (Spark 4 default) element_at on
      // an empty array throws instead of yielding the null row we want
      val top = try_element_at(
        GraftFunctions.topk_export(col(s"_tk_$i")).getField("entries"), lit(1))
      one = one
        .withColumn(s"_tv_$i", top.getField("item"))
        .withColumn(s"_tn_$i", top.getField("n"))
    }
    val stacked = cols.zipWithIndex.map { case (c, i) =>
      val (p25, p50, p75) =
        if (i < numeric.length) (s"_p25_$i", s"_p50_$i", s"_p75_$i")
        else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
      val (tv, tn) =
        if (i >= numeric.length) (s"_tv_${i - numeric.length}", s"_tn_${i - numeric.length}")
        else ("CAST(NULL AS STRING)", "CAST(NULL AS BIGINT)")
      s"'${stackLit(c)}', _rows, _nulls_$i, _min_$i, _max_$i, _dist_$i, " +
        s"$p25, $p50, $p75, $tv, $tn"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.length}, $stacked) AS " +
        "(col_name, n_rows, n_nulls, min_s, max_s, n_distinct_est, " +
        "p25, p50, p75, top_value, top_n)")
  }

  // positional intermediate aliases + backtick-quoted source refs: column
  // names with dots/spaces/quotes must not leak into parsed expressions;
  // shared by profile and profileDeep so escaping fixes apply to both
  private def src(c: String) =
    col("`" + c.replace("`", "``") + "`")
  private def stackLit(c: String): String =
    c.replace("\\", "\\\\").replace("'", "\\'")
  private def baseAggs(c: String, i: Int, k: Int) = Seq(
    sum(when(src(c).isNull, 1L).otherwise(0L)).as(s"_nulls_$i"),
    min(src(c)).cast("string").as(s"_min_$i"),
    max(src(c)).cast("string").as(s"_max_$i"),
    GraftFunctions.hll_cardinality(src(c), k).as(s"_dist_$i"))

  private def profileImpl(df: DataFrame, cols: Seq[String], k: Int): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("_rows") +:
      cols.zipWithIndex.flatMap { case (c, i) => baseAggs(c, i, k) }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // stack takes a flat argument list, 6 values per output row
    val stacked = cols.zipWithIndex.map { case (c, i) =>
      s"'${stackLit(c)}', _rows, _nulls_$i, _min_$i, _max_$i, _dist_$i"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.length}, $stacked) AS " +
        "(col_name, n_rows, n_nulls, min_s, max_s, n_distinct_est)")
  }
}
