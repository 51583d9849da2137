package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming rollup maintenance: each micro-batch folds into a stored
  * [[graft.operators.Upsert.rollup]] table via
  * [[graft.operators.Upsert.incrementalRollup]] — the continuously-fresh
  * aggregate table (per-key sums + counts) without Spark's stateful-agg
  * state store OR a full rebuild per batch.
  *
  * Scale shape: a batch touches only its own keys, so the fold splits the
  * store on the batch's key set (left-semi / left-anti — with the store
  * bucketed by key at 100 TB the semi-join prunes to touched buckets),
  * re-sums ONLY (touched rows ∪ batch partial aggregate), and swaps the
  * store crash-safely ([[StoreSwap]]).
  *
  * Replay idempotence: foreachBatch re-delivers the in-flight batch after
  * a crash, and double-folding a SUM is silent corruption. Every store row
  * carries `_applied_batch` = the id of the fold that wrote it; a batch id
  * at or below the store's max is a replay and is skipped. The id rides in
  * the same parquet generation as the data, so the guard can never be
  * newer or older than the sums it protects.
  */
object StreamingRollup {

  def rollupSink(
      updates: DataFrame,
      storePath: String,
      checkpointPath: String,
      keyCols: Seq[String],
      sumCols: Seq[String],
      countCol: String = "n_rows"): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, batchId, storePath, keyCols, sumCols, countCol)
      }
      .start()

  /** Fold one batch into the stored rollup. Skips already-applied ids. */
  def foldBatch(
      batch0: DataFrame,
      batchId: Long,
      storePath: String,
      keyCols: Seq[String],
      sumCols: Seq[String],
      countCol: String = "n_rows"): Unit = {
    val spark = batch0.sparkSession
    val batch = batch0.select((keyCols ++ sumCols).map(col): _*)
    StoreSwap.recover(spark, storePath)

    val newStore: DataFrame =
      if (!StoreSwap.exists(spark, storePath)) {
        graft.operators.Upsert.rollup(batch, keyCols, sumCols, countCol)
          .withColumn("_applied_batch", lit(batchId))
      } else {
        val store = spark.read.parquet(storePath)
        val applied = store.agg(max(col("_applied_batch"))).head()
        if (!applied.isNullAt(0) && applied.getLong(0) >= batchId) return
        val keys = batch.select(keyCols.map(col): _*).distinct()
        // null-SAFE key split (see StreamingSketchRollup): equality joins
        // never match a null key, which would duplicate its store row on
        // every batch that carries it
        val cond = keyCols.map(k => store(k) <=> keys(k)).reduce(_ && _)
        val untouched = store.join(keys, cond, "left_anti")
        val touched = store.join(keys, cond, "left_semi")
          .drop("_applied_batch")
        graft.operators.Upsert.incrementalRollup(
            touched, batch, keyCols, sumCols, countCol)
          .withColumn("_applied_batch", lit(batchId))
          .unionByName(untouched.withColumn("_applied_batch", lit(batchId)))
      }
    StoreSwap.swapIn(newStore, storePath)
  }
}
