package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Stream-to-lake ingestion with two-tier content dedup:
  *
  *  1. in-flight: watermark-bounded state drops re-deliveries inside the
  *     horizon ([[StreamingDedup.dedupByContent]] — 8-byte fingerprint keys).
  *  2. against history: each micro-batch is anti-joined on fingerprint
  *     against what the sink already holds, catching duplicates that arrive
  *     AFTER their state was evicted (late crawler re-fetches, replays).
  *
  * The sink stores the fingerprint column, so the history check is a join
  * on a single long column, never document text. At 100 TB the per-batch
  * `read.parquet(sink)` becomes a fingerprint index: keep the `_fp` column
  * in its own compacted table (or a periodically rebuilt Bloom filter via
  * `BloomTools`) and anti-join against that — the plan shape is identical;
  * only the right side's source changes.
  */
object StreamingIngest {

  /** Start the ingestion query (micro-batch, append). Caller stops it. */
  def dedupedIngest(
      docs: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      textCol: String,
      outPath: String,
      checkpointPath: String): StreamingQuery = {
    val spark = docs.sparkSession
    // keep the fingerprint the in-flight tier already computed — no second
    // normalization+hash pass over the document text per batch
    val inFlight = StreamingDedup.dedupByContent(
      docs, tsCol, watermarkDelay, textCol, keepFingerprint = true)
    inFlight.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // filesystem-agnostic existence check (local, HDFS, s3a, ...) — a
        // driver-local java.io.File test would silently disable this tier
        // for any non-local sink URI
        val sinkPath = new org.apache.hadoop.fs.Path(outPath)
        val fs = sinkPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val fresh =
          if (fs.exists(sinkPath)) {
            val seen = spark.read.parquet(outPath).select(col("_fp")).distinct()
            batch.join(seen, Seq("_fp"), "left_anti")
          } else batch
        fresh.write.mode("append").parquet(outPath)
      }
      .start()
  }
}
