package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys at scale. */
object SkewTools {

  /** Exact count-distinct per group, salted: values are bucketed by their own
    * hash (same value -> same salt cell, so per-cell distinct sets are
    * disjoint and their counts sum exactly). A hot group's dedup shuffle is
    * split across `buckets` cells instead of landing on one reducer — the
    * standard two-phase rewrite for skewed COUNT(DISTINCT).
    */
  def saltedCountDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets > 0)
    val salted = df.withColumn("_salt", pmod(xxhash64(col(valueCol)), lit(buckets.toLong)))
    salted
      .groupBy((groupCols.map(col) :+ col("_salt")): _*)
      .agg(count_distinct(col(valueCol)).as("_partial"))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("_partial")).as(s"${valueCol}_distinct"))
  }

  /** Broadcast-salted join for a skewed equi-join: replicate the small side
    * `buckets` times with an explicit salt, salt the big side randomly-but-
    * deterministically by row hash, join on (key, salt). Spreads a hot key
    * over `buckets` tasks. Use when AQE's skew-join split isn't available
    * (e.g. non-shuffle joins) or needs forcing.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      buckets: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(buckets.toLong)))
    val explodedSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedBig.join(broadcast(explodedSmall),
        saltedBig(bigKey) === explodedSmall(smallKey) &&
        saltedBig("_salt") === explodedSmall("_salt"))
      .drop("_salt")
  }
}
