package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous train/eval contamination monitor: every micro-batch of an
  * ingest stream is fingerprint-checked against a STATIC benchmark corpus,
  * emitting one alert row per (window, ingested doc, eval doc) whose
  * winnowing-fingerprint overlap crosses the threshold — "benchmark text is
  * entering the training corpus right now" as a standing query instead of a
  * pre-release batch audit ([[graft.operators.Contamination]]).
  *
  * Scale shape: the eval index is built ONCE on the static side (winnowed,
  * exploded, hot fingerprints capped exactly like the batch operator),
  * checkpointed, and BROADCAST into the stream-static join — eval suites
  * are small (thousands of docs), so each executor holds the index and no
  * stream row ever shuffles for the probe. Per-batch work is map-only
  * fingerprinting plus the broadcast hash join; the only stateful operator
  * is the windowed (doc, eval-doc) count, bounded by the watermark.
  *
  * Semantics vs the batch audit: the eval side caps hot fingerprints
  * identically, but the STREAM side cannot apply a corpus-wide posting cap
  * (a per-batch cap would make scores depend on batch boundaries), so
  * `a_total` counts ALL of the doc's fingerprints. Scores therefore match
  * the batch operator exactly when the ingested docs' fingerprints are
  * under the cap (the common case); the authoritative release gate remains
  * the batch audit.
  */
object StreamingContamination {

  /** @param docs streaming DataFrame with event-time `tsCol`
    * @return streaming alerts (window_start, window_end, a_id, b_id,
    *         shared, a_total, overlap)
    */
  def monitor(
      docs: DataFrame, tsCol: String, idCol: String, textCol: String,
      evalCorpus: DataFrame, evalId: String, evalText: String,
      windowDuration: String, watermarkDelay: String,
      threshold: Double = 0.2, kGram: Int = 8, winnowWindow: Int = 4,
      maxPostings: Int = 1000): DataFrame = {
    require(!evalCorpus.isStreaming, "evalCorpus must be a static DataFrame")
    // static side, built once: capped inverted index (f -> eval doc)
    val evalIdx = evalCorpus.select(col(evalId).as("b_id"),
        TextAnalysis.winnowingFingerprint(col(evalText), kGram, winnowWindow).as("_fp"))
      .select(col("b_id"), explode(col("_fp")).as("f"))
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("f"))))
      .filter(col("_n") <= maxPostings)
      .select(col("b_id"), col("f"))
      .localCheckpoint()

    val aFp = docs
      .withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol), col(idCol).as("a_id"),
        TextAnalysis.winnowingFingerprint(col(textCol), kGram, winnowWindow).as("_fp"))
      .withColumn("a_total", size(col("_fp")))
      .select(col(tsCol), col("a_id"), col("a_total"), explode(col("_fp")).as("f"))

    aFp.join(broadcast(evalIdx), "f")
      .groupBy(window(col(tsCol), windowDuration), col("a_id"), col("b_id"),
        col("a_total"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("overlap", round(col("shared") / col("a_total"), 4))
      .filter(col("overlap") >= threshold)
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("a_id"), col("b_id"), col("shared"), col("a_total"), col("overlap"))
  }
}
