package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-execution join statistics from one pass over each input — the
  * planning question that matters most at 100 TB is "how big is this join
  * going to be?", and answering it must not cost a trial join.
  *
  * The estimator hash-buckets each side's join key and computes, per bucket,
  * the row count and an HLL distinct-key estimate. Under within-bucket
  * uniformity the expected equi-join output of bucket i is
  * `n_a(i) * n_b(i) / max(d_a(i), d_b(i))` — exact when the denser side's
  * keys are unique (the FK->PK case), and bucketing confines the uniformity
  * assumption to 1/buckets of the key space, so moderate skew lands in its
  * own buckets instead of biasing the global estimate.
  *
  * Scale shape: each side is one partial-aggregated scan (shuffle bounded by
  * `buckets` rows per task, never by data size); the final join is
  * `buckets` × `buckets`-row equi-join on the driver-sized result. Nothing
  * about the real join (shuffle, spill, output) is paid.
  */
object JoinStats {

  /** One row: (est_rows, buckets) — the estimated equi-join output size of
    * `a.join(b, aKey === bKey)`.
    */
  def equiJoinSizeEstimate(
      a: DataFrame, aKey: String,
      b: DataFrame, bKey: String,
      buckets: Int = 64, k: Int = 4096): DataFrame = {
    require(buckets > 0)
    def side(df: DataFrame, key: String, n: String, d: String): DataFrame =
      df.filter(col(key).isNotNull)
        .select(pmod(xxhash64(col(key)), lit(buckets.toLong)).as("_bkt"),
          col(key).as("_k"))
        .groupBy(col("_bkt"))
        .agg(count(lit(1)).as(n), GraftFunctions.hll_cardinality(col("_k"), k).as(d))
    // multiply in double: per-bucket n_a*n_b in long arithmetic overflows
    // (ANSI throws) at ~1e13-row inputs — exactly the target scale. An
    // empty/disjoint side must report 0, not a NULL sum.
    side(a, aKey, "_na", "_da")
      .join(side(b, bKey, "_nb", "_db"), "_bkt")
      .agg(coalesce(round(sum(col("_na").cast("double") * col("_nb")
          / greatest(col("_da"), col("_db")))), lit(0.0))
        .cast("long").as("est_rows"))
      .select(col("est_rows"), lit(buckets).as("buckets"))
  }
}
