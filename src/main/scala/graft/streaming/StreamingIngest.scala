package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Stream-to-lake ingestion with two-tier content dedup:
  *
  *  1. in-flight: watermark-bounded state drops re-deliveries inside the
  *     horizon ([[StreamingDedup.dedupByContent]] — 8-byte fingerprint keys).
  *  2. against history: each micro-batch is anti-joined on fingerprint
  *     against a dedicated FINGERPRINT INDEX table (`<sink>_fp`), catching
  *     duplicates that arrive AFTER their state was evicted (late crawler
  *     re-fetches, replays). The index holds one long column, is appended
  *     per batch, compacted every `compactEvery` batches, and — because the
  *     sink remains the source of truth — is rebuilt from the sink's `_fp`
  *     column whenever it is missing (first run after migration, or a crash
  *     mid-compaction). The full sink is never rescanned per batch.
  *
  * Collision trade-off: history dedup keys on a 64-bit content fingerprint,
  * so two DISTINCT documents colliding on xxhash64 would silently drop one.
  * Expected false drops are ~n^2/2^65 (≈0.03 docs at 1e9 documents) — fine
  * for corpus curation; pass `exactCheck = true` to re-verify fingerprint
  * matches against the sink's text (definite-fresh rows still skip the sink
  * entirely, so the extra scan is bounded by the suspect count).
  */
object StreamingIngest {

  /** Start the ingestion query (micro-batch, append). Caller stops it.
    *
    * `compactSinkEvery` (0 = off): every N batches the SINK itself is
    * rewritten into `ceil(bytes / targetFileBytes)` even files and swapped
    * in crash-safely ([[StoreSwap]]). Streaming appends accumulate
    * per-batch small files whose open/footer cost eventually dominates
    * scans; compacting inside `foreachBatch` is safe because the batch
    * callback is the only writer, and the two-rename swap plus the
    * `recover` call on start mean a crash at any point leaves a complete
    * generation on disk.
    */
  def dedupedIngest(
      docs: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      textCol: String,
      outPath: String,
      checkpointPath: String,
      exactCheck: Boolean = false,
      compactEvery: Int = 10,
      compactSinkEvery: Int = 0,
      targetFileBytes: Long = 128L * 1024 * 1024): StreamingQuery = {
    val spark = docs.sparkSession
    val fpPath = outPath + "_fp"
    // a previous run may have died mid-sink-compaction: restore the
    // surviving generation before the stream starts appending
    StoreSwap.recover(spark, outPath)
    // keep the fingerprint the in-flight tier already computed — no second
    // normalization+hash pass over the document text per batch
    val inFlight = StreamingDedup.dedupByContent(
      docs, tsCol, watermarkDelay, textCol, keepFingerprint = true)
    inFlight.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // filesystem-agnostic paths (local, HDFS, s3a, ...) — a driver-local
        // java.io.File test would silently disable this tier off-box
        val hconf = spark.sparkContext.hadoopConfiguration
        val sinkP = new org.apache.hadoop.fs.Path(outPath)
        val fpP = new org.apache.hadoop.fs.Path(fpPath)
        val fs = sinkP.getFileSystem(hconf)
        if (!fs.exists(fpP) && fs.exists(sinkP)) {
          // index missing but sink exists: rebuild the cache from the truth
          spark.read.parquet(outPath).select(col("_fp")).distinct()
            .write.mode("overwrite").parquet(fpPath)
        }
        val fresh =
          if (fs.exists(fpP)) {
            val seen = spark.read.parquet(fpPath)
            val definiteFresh = batch.join(seen, Seq("_fp"), "left_anti")
            if (!exactCheck) definiteFresh
            else {
              // fp matched history: confirm against sink text before
              // dropping, so a 64-bit collision cannot lose a distinct doc
              val suspects = batch.join(seen, Seq("_fp"), "left_semi")
              val sinkPairs = spark.read.parquet(outPath)
                .select(col("_fp").as("_sfp"), col(textCol).as("_stext"))
              val collided = suspects.join(sinkPairs,
                suspects("_fp") === col("_sfp") && suspects(textCol) === col("_stext"),
                "left_anti")
              definiteFresh.unionByName(collided)
            }
          } else batch
        // materialize once: the batch result feeds BOTH the sink append and
        // the index append — without this the anti-join plan runs twice
        val mat = fresh.localCheckpoint(true)
        mat.write.mode("append").parquet(outPath)
        mat.select(col("_fp")).distinct().write.mode("append").parquet(fpPath)
        if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1) && fs.exists(fpP)) {
          // compact the per-batch appends into one distinct file; a crash
          // between delete and rename only loses the CACHE (rebuilt above)
          val tmpP = new org.apache.hadoop.fs.Path(fpPath + ".compact")
          spark.read.parquet(fpPath).distinct().coalesce(1)
            .write.mode("overwrite").parquet(tmpP.toString)
          fs.delete(fpP, true)
          fs.rename(tmpP, fpP)
        }
        if (compactSinkEvery > 0 && batchId % compactSinkEvery == (compactSinkEvery - 1)
            && fs.exists(sinkP)) {
          // rewrite the sink into scan-sized files and swap crash-safely;
          // the sink is the SOURCE OF TRUTH, so unlike the fp cache above
          // it gets the full two-rename generation dance
          val totalBytes = fs.getContentSummary(sinkP).getLength
          val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes)
          StoreSwap.swapIn(
            spark.read.parquet(outPath).repartition(nFiles.toInt), outPath)
        }
        ()
      }
      .start()
  }
}
