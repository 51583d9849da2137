package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuously-fresh SKETCH warehouse: each micro-batch folds per-key
  * sketch columns (HLL / KMV / CMS / MG / GK — anything with a build
  * aggregate and a union aggregate) into a stored table, the sketch twin
  * of [[StreamingRollup]]'s sums.
  *
  * The point at 100 TB: the store answers distinct/frequency/quantile
  * questions at ANY later rollup without rescanning history — and keeping
  * it fresh costs one partial aggregate over each batch plus a union over
  * the TOUCHED keys only (left-semi / left-anti split, bucket-prunable),
  * never a rebuild, never stateful-agg store growth (sketch state is
  * constant per key).
  *
  * Correctness inherits the family's merge algebra: HLL registers max-fold
  * and CMS counters add commutatively, so the stored sketch is
  * BYTE-IDENTICAL to a single-pass build no matter how arrivals were
  * batched (asserted in the spec); MG stays exact while capacity covers
  * the per-key distinct count. Replay idempotence via the same
  * `_applied_batch` guard as [[StreamingRollup]]; crash safety via
  * [[StoreSwap]].
  */
object StreamingSketchRollup {

  /** Start the maintenance stream. `buildAggs` are the per-batch partial
    * sketch aggregates (e.g. `hll_sketch_agg(col("user_id")).as("users")`),
    * `unionAggs` the matching union aggregates over the SAME output names
    * (e.g. `hll_union_agg(col("users")).as("users")`).
    */
  def sketchSink(
      updates: DataFrame,
      storePath: String,
      checkpointPath: String,
      keyCols: Seq[String],
      buildAggs: Seq[Column],
      unionAggs: Seq[Column]): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, batchId, storePath, keyCols, buildAggs, unionAggs)
      }
      .start()

  /** Fold one batch into the stored sketch table. Skips replayed ids. */
  def foldBatch(
      batch: DataFrame,
      batchId: Long,
      storePath: String,
      keyCols: Seq[String],
      buildAggs: Seq[Column],
      unionAggs: Seq[Column]): Unit = {
    require(keyCols.nonEmpty && buildAggs.nonEmpty && unionAggs.size == buildAggs.size,
      "sketch rollup needs keys and matching build/union aggregate lists")
    val spark = batch.sparkSession
    StoreSwap.recover(spark, storePath)
    val partial = batch.groupBy(keyCols.map(col): _*)
      .agg(buildAggs.head, buildAggs.tail: _*)

    val newStore: DataFrame =
      if (!StoreSwap.exists(spark, storePath)) {
        partial.withColumn("_applied_batch", lit(batchId))
      } else {
        val store = spark.read.parquet(storePath)
        val applied = store.agg(max(col("_applied_batch"))).head()
        if (!applied.isNullAt(0) && applied.getLong(0) >= batchId) return
        val keys = partial.select(keyCols.map(col): _*)
        // null-SAFE key split: groupBy keeps a null-key group, but plain
        // equality joins never match null — an equi-join split would leave
        // the store's null-key row in `untouched` every batch and append a
        // fresh one, silently accumulating duplicate null-key rows
        val cond = keyCols.map(k => store(k) <=> keys(k)).reduce(_ && _)
        val untouched = store.join(keys, cond, "left_anti")
        val touched = store.join(keys, cond, "left_semi")
          .drop("_applied_batch")
        touched.unionByName(partial)
          .groupBy(keyCols.map(col): _*)
          .agg(unionAggs.head, unionAggs.tail: _*)
          .withColumn("_applied_batch", lit(batchId))
          .unionByName(untouched.withColumn("_applied_batch", lit(batchId)))
      }
    StoreSwap.swapIn(newStore, storePath)
  }
}
