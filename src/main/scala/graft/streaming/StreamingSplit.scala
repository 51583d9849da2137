package graft.streaming

import graft.operators.Sampling
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Leakage-safe split assignment AT INGEST TIME: every arriving document
  * lands in the lake already carrying its train/val/test label, keyed on
  * the near-dup cluster representative ([[graft.operators.Sampling
  * .leakageSafeSplit]] as a standing query). A near-copy of a test
  * document that arrives next week gets the test label too — assigning
  * splits at training-prep time instead would either leak or force a full
  * recluster of the corpus.
  *
  * The cluster map (id -> cluster, maintained by the periodic batch dedup
  * job) is re-read EVERY micro-batch inside `foreachBatch`: a stream-static
  * join would freeze the map's file listing at query start and silently
  * assign month-old clusters forever. The map is small (proportional to
  * duplicates, not corpus) so the per-batch re-read is a footer scan plus
  * a broadcast; documents the map does not know are their own
  * representative — the same split the batch operator would give them.
  *
  * Output is partitioned by split label, so downstream training readers
  * prune to their split at planning time.
  */
object StreamingSplit {

  def splitAssignedIngest(
      docs: DataFrame,
      idCol: String,
      clusterMapPath: String,
      fractions: Seq[(String, Double)],
      outPath: String,
      checkpointPath: String): StreamingQuery = {
    val spark = docs.sparkSession
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val hconf = spark.sparkContext.hadoopConfiguration
        val mapP = new org.apache.hadoop.fs.Path(clusterMapPath)
        val haveMap = mapP.getFileSystem(hconf).exists(mapP)
        val assigned =
          if (haveMap) {
            val clusters = broadcast(spark.read.parquet(clusterMapPath))
            Sampling.leakageSafeSplit(batch, idCol, clusters, fractions)
          } else
            batch.withColumn("split",
              Sampling.portableSplit(col(idCol), fractions))
        assigned.write.mode("append").partitionBy("split").parquet(outPath)
        ()
      }
      .start()
  }
}
