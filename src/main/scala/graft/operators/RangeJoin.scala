package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join. Spark plans the naive
  * `l.point BETWEEN r.start AND r.end` as a broadcast-nested-loop /
  * cartesian — quadratic at scale. This composition buckets the domain:
  * intervals explode into the fixed-width buckets they cover, points map to
  * one bucket, and the join becomes an equi-join on bucket + an exact
  * containment filter. Cost: |R| × avg-buckets-per-interval replicated rows,
  * one hash shuffle, no cross product.
  *
  * Pick `bucketWidth` ≈ typical interval length: short intervals replicate
  * ~2×; pathological long intervals dominate replication (split them out and
  * broadcast if few).
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val p = points.withColumn("_bucket", floor(col(pointCol) / bucketWidth))
    val iv = intervals.withColumn("_bucket",
      explode(sequence(floor(col(startCol) / bucketWidth), floor(col(endCol) / bucketWidth))))
    p.join(iv, Seq("_bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bucket")
  }

  /** Interval-overlap (range x range) join: pairs where
    * [lStart, lEnd] ∩ [rStart, rEnd] ≠ ∅. Same bucketing trick, both sides
    * explode into covered buckets; a pair sharing several buckets would
    * duplicate, so each candidate is kept only in the FIRST shared bucket
    * (the bucket of the later of the two starts) — dedup without a distinct
    * shuffle. One hash shuffle on bucket, never a cross product.
    *
    * Left/right column name sets must be disjoint.
    */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val l = left.withColumn("_bucket",
      explode(sequence(floor(col(lStart) / bucketWidth), floor(col(lEnd) / bucketWidth))))
    val r = right.withColumn("_bucket",
      explode(sequence(floor(col(rStart) / bucketWidth), floor(col(rEnd) / bucketWidth))))
    l.join(r, Seq("_bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      // first-shared-bucket rule: emit only where the bucket holds the later start
      .filter(col("_bucket") === floor(greatest(col(lStart), col(rStart)) / bucketWidth))
      .drop("_bucket")
  }
}

/** Event sessionization: consecutive events of the same key belong to one
  * session while gaps stay under `gapSeconds`; a larger gap starts a new
  * session. One shuffle (by key), two window passes — the standard
  * lag + cumulative-sum formulation, fully codegen'd.
  */
object Sessionize {

  def sessionize(df: DataFrame, keyCol: String, tsCol: String, gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    // fractional epoch seconds (matches DuckDB's epoch()) so boundary gaps
    // agree with the oracle; equal-timestamp ties are gap-0 either way
    val tsSec: Column = col(tsCol).cast("double")
    df.withColumn("_prev", lag(tsSec, 1).over(byKey))
      .withColumn("_new_session",
        when(col("_prev").isNull || tsSec - col("_prev") > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("_new_session")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_prev", "_new_session")
  }

  /** Per-session summary: bounds, event count, distinct-ish stats. */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String, gapSeconds: Long): DataFrame =
    sessionize(df, keyCol, tsCol, gapSeconds)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
}
