package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental SCD2 maintenance from a CDC-style stream: each micro-batch
  * of (key, value, version) observations folds into a stored SCD2 table
  * ([[graft.operators.Upsert.scd2]] semantics — change-point rows with
  * valid_from / valid_to / is_current, plus a `_max_seen` column on
  * current rows recording the highest version ever applied for the key).
  *
  * Scale shape: a batch touches only its own keys, so the fold is
  * - one left-semi/left-anti split of the store on the batch's key set
  *   (with the store partitioned/bucketed by key hash at 100 TB, the
  *   semi-join prunes to the touched buckets);
  * - scd2 re-derivation over ONLY (current rows of touched keys ∪ batch) —
  *   closed intervals never recompute;
  * - a store rewrite, swapped crash-safely: write tmp → rename store aside
  *   → rename tmp in → drop the old generation. A crash between the two
  *   renames leaves `_old` on disk; the next fold renames it back before
  *   reading (no window where history can silently vanish), and every
  *   rename result is checked. At warehouse scale a table format or
  *   partition-level swap replaces this dance.
  *
  * Assumptions (standard CDC): (key, version) pairs are unique; versions
  * apply in non-decreasing order per key. Late observations at or below a
  * key's highest APPLIED version (`_max_seen`, not merely the open
  * interval's valid_from — an unchanged-value observation advances
  * `_max_seen` without opening an interval) are DROPPED rather than
  * silently rewriting history — replaying them is a batch backfill job,
  * not a streaming fold.
  */
object StreamingScd2 {

  def scd2Sink(
      updates: DataFrame,
      storePath: String,
      checkpointPath: String,
      keyCols: Seq[String],
      cmpCols: Seq[String],
      versionCol: String): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        foldBatch(batch, storePath, keyCols, cmpCols, versionCol)
      }
      .start()

  /** Fold one observation batch into the stored SCD2 table. Idempotent for
    * replayed batches: every replayed observation sits at or below
    * `_max_seen` and is dropped by the late-data guard.
    */
  def foldBatch(
      batch0: DataFrame,
      storePath: String,
      keyCols: Seq[String],
      cmpCols: Seq[String],
      versionCol: String): Unit = {
    val spark = batch0.sparkSession
    val obsCols = (keyCols ++ cmpCols :+ versionCol).map(col)
    val batch = batch0.select(obsCols: _*)
    StoreSwap.recover(spark, storePath)

    def withMaxSeen(scdOut: DataFrame, maxPerKey: DataFrame): DataFrame =
      scdOut.join(maxPerKey, keyCols, "left")
        .withColumn("_max_seen",
          when(col("is_current"), col("_mx")))
        .drop("_mx")

    val newStore: DataFrame =
      if (!StoreSwap.exists(spark, storePath)) {
        val mx = batch.groupBy(keyCols.map(col): _*)
          .agg(max(col(versionCol)).as("_mx"))
        withMaxSeen(
          graft.operators.Upsert.scd2(batch, keyCols, cmpCols, versionCol), mx)
      } else {
        val store = spark.read.parquet(storePath)
        val keys = batch.select(keyCols.map(col): _*).distinct()
        val touched = store.join(keys, keyCols, "left_semi")
        val untouched = store.join(keys, keyCols, "left_anti")
        val closed = touched.filter(!col("is_current"))
        val current = touched.filter(col("is_current"))
        // late-data guard on the highest APPLIED version, not the open
        // interval's start: unchanged-value observations advanced _max_seen
        // without opening an interval, and anything at/below it must not
        // rewrite history
        val applied = current.select(
          (keyCols.map(col) :+ col("_max_seen").as("_guard")): _*)
        val fresh = batch.join(applied, keyCols, "left")
          .filter(col("_guard").isNull || col(versionCol) > col("_guard"))
          .drop("_guard")
        // re-open current rows as observations at their valid_from version
        val currentObs = current.select(
          ((keyCols ++ cmpCols).map(col) :+ col("valid_from").as(versionCol)): _*)
        val redone = graft.operators.Upsert.scd2(
          currentObs.unionByName(fresh), keyCols, cmpCols, versionCol)
        val mx = current.select((keyCols.map(col) :+ col("_max_seen").as("_mx")): _*)
          .unionByName(fresh.groupBy(keyCols.map(col): _*)
            .agg(max(col(versionCol)).as("_mx")))
          .groupBy(keyCols.map(col): _*).agg(max(col("_mx")).as("_mx"))
        untouched.unionByName(closed).unionByName(withMaxSeen(redone, mx))
      }

    StoreSwap.swapIn(newStore, storePath)
  }
}
