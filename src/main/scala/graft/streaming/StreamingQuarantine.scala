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
        val batchHist = batch.groupBy(col(groupCol), bin.as("bin"))
          .agg(count(lit(1)).as("n"))
        // exact-integer TVD per group between reference and batch bins,
        // at histogram grain (same contribution-union shape as
        // StreamingQuality.histogramDrift)
        val cells = ref.select(col(groupCol), col("bin"),
            col("n").as("_c0"), lit(0L).as("_c1"))
          .unionByName(batchHist.select(col(groupCol), col("bin"),
            lit(0L).as("_c0"), col("n").as("_c1")))
          .groupBy(col(groupCol), col("bin"))
          .agg(sum(col("_c0")).as("_c0"), sum(col("_c1")).as("_c1"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
        val tvd = cells
          .withColumn("_t0", sum(col("_c0")).over(w))
          .withColumn("_t1", sum(col("_c1")).over(w))
          // a source absent from either side has no score: unknown-to-
          // reference sources quarantine by definition (handled below)
          .filter(col("_t0") > 0 && col("_t1") > 0)
          .groupBy(col(groupCol), col("_t0"), col("_t1"))
          .agg(sum(abs(col("_c1") * col("_t0") - col("_c0") * col("_t1"))).as("_num"))
          .select(col(groupCol),
            (col("_num").cast("double") / (lit(2.0) * col("_t0") * col("_t1")))
              .as("tvd"))
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
}
