package graft.streaming

import graft.operators.Quality
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Drift-gated ingestion: every micro-batch's per-source value
  * distribution is scored against a REFERENCE histogram (built from a
  * known-good corpus snapshot), and sources whose total variation
  * distance crosses the threshold have their rows diverted to a
  * quarantine path instead of the corpus — "source X started shipping
  * different documents" stops poisoning the training mix the moment it
  * happens, not at the next nightly audit.
  *
  * Scoring reuses [[Quality.distributionDrift]]'s exact-integer TVD: the
  * reference histogram rides in as the baseline cohort (replicated as
  * count-weighted rows is unnecessary — the union is at histogram grain,
  * expanded by `n`... rather, the reference is joined as pre-counted
  * bins), so the per-batch cost is the batch's own bin aggregation plus a
  * sources-sized rollup. Routing is per SOURCE, not per row: a drifted
  * source's entire batch slice is quarantined together, preserving it for
  * inspection and possible re-admission.
  *
  * Both destinations receive the same schema; quarantined rows carry the
  * offending `tvd` score as an extra column.
  */
object StreamingQuarantine {

  /** Build the reference histogram from a known-good corpus: one row per
    * (group, bin) with its count — the shape [[driftGatedIngest]] expects
    * at `referencePath`.
    */
  def writeReference(
      goodCorpus: DataFrame, groupCol: String, bin: Column,
      referencePath: String): Unit =
    goodCorpus.groupBy(col(groupCol), bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(referencePath)

  /** Exact-integer TVD per group between the reference histogram and the
    * given rows' histogram, at histogram grain (same contribution-union
    * shape as StreamingQuality.histogramDrift). Groups absent from either
    * side get no row — callers treat missing-score as "unknown to the
    * reference", which quarantines by definition.
    */
  private def tvdPerGroup(
      ref: DataFrame, rows: DataFrame, groupCol: String, bin: Column): DataFrame = {
    val hist = rows.groupBy(col(groupCol), bin.as("bin"))
      .agg(count(lit(1)).as("n"))
    val cells = ref.select(col(groupCol), col("bin"),
        col("n").as("_c0"), lit(0L).as("_c1"))
      .unionByName(hist.select(col(groupCol), col("bin"),
        lit(0L).as("_c0"), col("n").as("_c1")))
      .groupBy(col(groupCol), col("bin"))
      .agg(sum(col("_c0")).as("_c0"), sum(col("_c1")).as("_c1"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    cells
      .withColumn("_t0", sum(col("_c0")).over(w))
      .withColumn("_t1", sum(col("_c1")).over(w))
      .filter(col("_t0") > 0 && col("_t1") > 0)
      .groupBy(col(groupCol), col("_t0"), col("_t1"))
      .agg(sum(abs(col("_c1") * col("_t0") - col("_c0") * col("_t1"))).as("_num"))
      .select(col(groupCol),
        (col("_num").cast("double") / (lit(2.0) * col("_t0") * col("_t1")))
          .as("tvd"))
  }

  def driftGatedIngest(
      docs: DataFrame,
      groupCol: String,
      bin: Column,
      referencePath: String,
      tvdThreshold: Double,
      outPath: String,
      quarantinePath: String,
      checkpointPath: String): StreamingQuery = {
    require(tvdThreshold > 0 && tvdThreshold <= 1,
      s"tvdThreshold in (0,1], got $tvdThreshold")
    val spark = docs.sparkSession
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // reference re-read per batch: the good-corpus snapshot is
        // refreshed by batch jobs and must not freeze at query start
        val ref = spark.read.parquet(referencePath)
          .select(col(groupCol), col("bin"), col("n"))
        val tvd = tvdPerGroup(ref, batch, groupCol, bin)
        val routed = batch.join(broadcast(tvd), Seq(groupCol), "left")
        // null tvd = source unknown to the reference -> quarantine
        val pass = routed.filter(col("tvd").isNotNull && col("tvd") < tvdThreshold)
          .drop("tvd")
        val quarantined = routed
          .filter(col("tvd").isNull || col("tvd") >= tvdThreshold)
        pass.write.mode("append").parquet(outPath)
        if (!quarantined.isEmpty)
          quarantined.write.mode("append").parquet(quarantinePath)
        ()
      }
      .start()
  }

  /** Re-admission: re-score every quarantined source slice against the
    * CURRENT reference histogram and move the slices that now pass back
    * into the corpus. The drift gate quarantines against the reference as
    * it was at batch time; when the reference is later refreshed (a new
    * known-good snapshot blesses a legitimately-changed distribution),
    * this is the path that drains the quarantine instead of leaving it a
    * write-only graveyard.
    *
    * Mechanics per group (source): one TVD score over ALL of that source's
    * quarantined rows vs the current reference. Passing groups' rows are
    * appended to `outPath` (minus the diagnostic `tvd` column); remaining
    * groups — still-drifted or still unknown to the reference — are
    * rewritten in place via the crash-safe [[StoreSwap]] rename dance, so a
    * crash mid-rewrite never loses the quarantine store. Append happens
    * before the swap: a crash between the two re-admits the same rows again
    * on retry (at-least-once; dedup downstream if the corpus is keyed).
    *
    * Scale shape: the score is one aggregation over the quarantine at
    * histogram grain plus a sources-sized broadcast join — no shuffle of
    * the quarantined rows themselves; the rewrite is a filter scan.
    *
    * @return per-source summary: (groupCol, tvd, n_rows, readmitted) —
    *         unknown-to-reference sources carry a null tvd and stay put.
    */
  def readmit(
      spark: org.apache.spark.sql.SparkSession,
      groupCol: String,
      bin: Column,
      referencePath: String,
      tvdThreshold: Double,
      outPath: String,
      quarantinePath: String): DataFrame = {
    require(tvdThreshold > 0 && tvdThreshold <= 1,
      s"tvdThreshold in (0,1], got $tvdThreshold")
    import spark.implicits._
    val quarP = new org.apache.hadoop.fs.Path(quarantinePath)
    val fs = quarP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    StoreSwap.recover(spark, quarantinePath)
    if (!fs.exists(quarP))
      return Seq.empty[(String, Option[Double], Long, Boolean)]
        .toDF(groupCol, "tvd", "n_rows", "readmitted")
    // the previous readmit rewrote this path in place; refresh any cached
    // plans touching it before re-reading (file listings themselves are
    // per-read in this path — each spark.read.parquet lists fresh)
    spark.catalog.refreshByPath(quarantinePath)
    val quarantined = spark.read.parquet(quarantinePath).drop("tvd")
    val ref = spark.read.parquet(referencePath)
      .select(col(groupCol), col("bin"), col("n"))
    val rescored = tvdPerGroup(ref, quarantined, groupCol, bin)
    val summary = quarantined.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"))
      .join(rescored, Seq(groupCol), "left")
      .select(col(groupCol), col("tvd"), col("n_rows"),
        (col("tvd").isNotNull && col("tvd") < tvdThreshold).as("readmitted"))
      // summary is sources-sized; pin it before the swap invalidates lineage
      .localCheckpoint()
    val routed = quarantined.join(
      broadcast(summary.select(col(groupCol), col("readmitted"))), Seq(groupCol))
    routed.filter(col("readmitted")).drop("readmitted")
      .write.mode("append").parquet(outPath)
    val remaining = routed.filter(!col("readmitted")).drop("readmitted")
      .join(broadcast(rescored), Seq(groupCol), "left") // keep the fresh score
    // `remaining` is empty iff every source readmitted — already known in
    // the checkpointed sources-sized summary, so probe THAT instead of
    // recomputing the quarantine-scan join (r15: the isEmpty job re-ran
    // the full routed pipeline just to test for rows)
    val anyRemaining = !summary.filter(!col("readmitted")).isEmpty
    if (!anyRemaining) fs.delete(quarP, true)
    else StoreSwap.swapIn(remaining, quarantinePath)
    spark.catalog.refreshByPath(quarantinePath)
    summary
  }
}
