package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication for ingest pipelines: drop re-deliveries and
  * content duplicates as data arrives, before anything lands in the lake.
  *
  * Scale design (100 TB/day streams):
  *  - state per retained key is just the key + event-time (no payload), and
  *    the watermark bounds retention — state is O(distinct keys inside the
  *    watermark horizon), not O(stream history).
  *  - content dedup keys on the 64-bit normalized fingerprint, so state and
  *    the dedup shuffle carry 8-byte keys, never document text — the same
  *    "digest, don't ship text" rule the batch path uses.
  *  - exactly the same normalization as batch [[TextAnalysis.fingerprint]],
  *    so a stream-deduped corpus and a batch-deduped corpus agree.
  */
object StreamingDedup {

  /** Drop events whose key columns repeat within the watermark horizon.
    * Re-deliveries later than `watermarkDelay` are pruned from state and
    * would pass again — the standard bounded-state trade-off.
    */
  def dedupByKey(
      df: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      keyCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Content-based streaming dedup: key = normalized 64-bit text fingerprint
    * (case/whitespace-insensitive), computed map-side so state never holds
    * text. Emits first-seen documents only.
    *
    * @param keepFingerprint keep the `_fp` column in the output so downstream
    *                        stages (e.g. a sink-history check) can reuse it
    *                        instead of re-hashing every document
    */
  def dedupByContent(
      df: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      textCol: String,
      keepFingerprint: Boolean = false): DataFrame = {
    val deduped = df.withColumn("_fp", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(Seq("_fp"))
    if (keepFingerprint) deduped else deduped.drop("_fp")
  }

  /** Media-content streaming dedup: key = the audio fingerprint of the
    * decoded PCM COMPOSED with the PCM's frame count and channel layout
    * ([[graft.functions.AudioDedupKey]]), so a clip re-delivered in a
    * different lossless container (WAV then OGG-FLAC) still drops — the
    * cross-container property the batch `mm_audio_dedup` contract pins.
    *
    * Why composed, not the bare fingerprint: the 64-bit energy-delta
    * fingerprint DEGENERATES on near-silent or very short clips (fewer
    * than 65 PCM frames, or stationary audio, all yield fingerprint 0),
    * so keying on it alone silently discards distinct clips as
    * duplicates. Duration and channels are decoded-PCM properties, so
    * the composition keeps the container invariance while separating
    * degenerate clips. Same state rule as [[dedupByContent]]: 8-byte
    * keys in state, never media bytes. Strict decode (this keys on
    * content; an undecodable clip cannot be deduped) — run
    * `resampleAudioSafe`-style quarantine upstream for crawl streams.
    */
  def dedupByAudioFingerprint(
      df: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      contentCol: String,
      keepFingerprint: Boolean = false): DataFrame = {
    val keyCol = org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.AudioDedupKey(
        org.apache.spark.sql.graftshim.GraftShims.expression(col(contentCol))))
    val deduped = df.withColumn("_afp", keyCol)
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(Seq("_afp"))
    if (keepFingerprint) deduped else deduped.drop("_afp")
  }
}
