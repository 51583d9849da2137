package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ANN index maintenance: the ivfAppendStats → ivfRefit →
  * StoreSwap pieces composed into one self-maintaining loop. Each
  * micro-batch of embeddings is assigned to the CURRENT centroid table
  * (map-only), appended to the corpus store, and folded into a per-bucket
  * stats store; when a batch's distribution drifts away from the standing
  * stats — bucket-share shift or fit drop, the same signals as
  * [[Similarity.ivfRefit]] — the drifted centroids are refit from a bounded
  * sample and the centroid table is swapped atomically
  * ([[StoreSwap]]), so queries either see the old generation or the new
  * one, never a torn mix.
  *
  * Scale design (100 TB):
  *  - NO standing-corpus rescans in the steady state: the corpus side of
  *    the drift comparison comes from the accumulated stats store (nlist
  *    rows), updated additively per batch. Per-batch cost is one map-only
  *    assignment pass over the batch plus an nlist-sized aggregate.
  *  - The corpus store is partitioned by assigned bucket, so a refit's
  *    corpus-side sample reads ONLY the drifted buckets' partitions
  *    (partition-pruned scan), never the corpus.
  *  - Refit preserves nlist and freezes undrifted slots (ids stay valid);
  *    the replacement fit runs on a bounded per-side sample — corpus and
  *    batch each get a proportional budget, so appended data always
  *    reaches the fit (the [[Similarity.ivfRefit]] sampling contract).
  *
  * Documented approximations (restored by [[recomputeStats]]):
  *  - Physical partitioning reflects assignment AT APPEND TIME. After a
  *    refit, rows appended earlier stay in their old partitions; queries
  *    are unaffected (assignment is always recomputed from the centroid
  *    table), but a later refit's pruned sample may miss migrated rows.
  *  - The post-refit stats rebuild rescans only the drifted partitions +
  *    the triggering batch under the new centroids; rows in undrifted
  *    partitions that would now prefer a refit bucket keep contributing to
  *    their old bucket's stats.
  *  Both make the stats a maintenance SIGNAL, not an exact inventory —
  *  run [[recomputeStats]] (one full pruned scan) on whatever cadence the
  *  deployment wants exactness, e.g. nightly.
  *
  * Delivery: foreachBatch is at-least-once — a crash between the corpus
  * append and the stats swap replays the batch on restart, duplicating
  * appended rows (dedup downstream by id if the corpus is keyed), same
  * contract as [[StreamingQuarantine.readmit]].
  */
object StreamingAnnIndex {

  /** Store layout under one index root. */
  final case class IndexPaths(root: String) {
    val centroids: String = s"$root/centroids" // StoreSwap'd: (bucket, centroid)
    val corpus: String = s"$root/corpus"       // append, partitioned by bucket
    val stats: String = s"$root/stats"         // StoreSwap'd: (bucket, n, fit_sum)
    val maintLog: String = s"$root/maintlog"   // append: one row per batch
  }

  /** Maintenance knobs; thresholds match [[Similarity.ivfRefit]]'s.
    *
    * fitDropThreshold caveat: the BOOTSTRAP batch's stats are in-sample
    * (its rows trained the centroids), while every later batch scores
    * out-of-sample, systematically lower by the k-means generalization
    * gap. At production scale the gap is negligible (a <=sampleSize fit
    * sample out of millions of rows leaves the batch effectively
    * held-out), but when the bootstrap batch is not much larger than
    * sampleSize, set fitDropThreshold above the measured gap — or rely on
    * shareDriftThreshold, which has no in/out-of-sample asymmetry. The
    * bias decays as out-of-sample batches accumulate into the stats store.
    *
    * shareFitMargin: a share-drift spike only refits a bucket whose
    * incoming traffic fits more than this margin WORSE than the bucket's
    * standing members — relative, so it needs no knowledge of the data's
    * achievable fit level. See the trigger comment in [[maintainBatch]]
    * for why that gate is what makes a one-time distribution shift
    * converge in one refit.
    */
  final case class Config(
      nlist: Int = 16,
      sampleSize: Int = 1024,
      iters: Int = 10,
      shareDriftThreshold: Double = 0.25,
      fitDropThreshold: Double = 0.15,
      shareFitMargin: Double = 0.05)

  def readCentroids(spark: SparkSession, paths: IndexPaths): Array[Array[Double]] = {
    StoreSwap.recover(spark, paths.centroids)
    val rows = spark.read.parquet(paths.centroids)
      .orderBy(col("bucket")).collect()
    val cents = rows.map(r => r.getSeq[Double](1).toArray)
    require(rows.zipWithIndex.forall { case (r, i) => r.getInt(0) == i },
      "centroid store buckets are not contiguous 0..n-1")
    cents
  }

  private def writeCentroids(
      spark: SparkSession, cents: Array[Array[Double]], path: String): Unit = {
    import spark.implicits._
    StoreSwap.swapIn(
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("bucket", "centroid").coalesce(1), path)
  }

  /** (id, vec, bucket, fit): one map-only pass against the given centroids. */
  private def assign(
      b: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]]): DataFrame = {
    val centLit = typedLit(cents.map(_.map(_.toFloat).toSeq).toSeq)
    b.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .filter(col("vec").isNotNull)
      .withColumn("bucket", Similarity.assignBucket(col("vec"), cents))
      .withColumn("fit", Similarity.cosine(col("vec"),
        element_at(centLit, col("bucket") + 1)))
  }

  /** nlist-grain stats of an assigned frame: (bucket, n, fit_sum). */
  private def statsOf(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("fit")).as("fit_sum"))

  /** Driver-side nlist-sized stats map: bucket -> (n, fit_sum). */
  private def collectStats(df: DataFrame): Map[Int, (Long, Double)] =
    df.collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap

  private def logRow(
      spark: SparkSession, paths: IndexPaths, batchId: Long, kind: String,
      nRows: Long, refit: Seq[Int]): Unit = {
    import spark.implicits._
    Seq((batchId, kind, nRows, refit, refit.length))
      .toDF("batch_id", "kind", "n_rows", "refit_buckets", "n_refit")
      .coalesce(1).write.mode("append").parquet(paths.maintLog)
  }

  /** One maintenance step. Public so batch replays (the contract query, a
    * backfill) can drive the exact streaming code path without a stream.
    * Returns the refit bucket ids (empty = plain append).
    */
  def maintainBatch(
      spark: SparkSession, batch: DataFrame, idCol: String, vecCol: String,
      paths: IndexPaths, cfg: Config, batchId: Long): Seq[Int] = {
    StoreSwap.recover(spark, paths.centroids)
    StoreSwap.recover(spark, paths.stats)
    val b = batch.select(col(idCol), col(vecCol)).filter(col(vecCol).isNotNull)

    if (!StoreSwap.exists(spark, paths.centroids)) {
      if (b.isEmpty) { logRow(spark, paths, batchId, "empty", 0L, Nil); return Nil }
      // bootstrap: fit the initial table on this batch's bounded sample
      val cents = Similarity.fitCentroids(b, vecCol, idCol, cfg.nlist, cfg.sampleSize, cfg.iters)
      writeCentroids(spark, cents, paths.centroids)
      val assigned = assign(b, idCol, vecCol, cents).localCheckpoint()
      assigned.drop("fit").write.partitionBy("bucket")
        .mode("append").parquet(paths.corpus)
      // one stats aggregate, collected: the store swap-in writes the
      // driver-side rows back out and the log row's count is their sum —
      // the separate assigned.count() job (r14) folded away
      val bootStats = collectStats(statsOf(assigned))
      import spark.implicits._
      StoreSwap.swapIn(bootStats.toSeq.map { case (k, (n, f)) => (k, n, f) }
        .sortBy(_._1).toDF("bucket", "n", "fit_sum").coalesce(1), paths.stats)
      logRow(spark, paths, batchId, "bootstrap", bootStats.values.map(_._1).sum, Nil)
      return Nil
    }

    val cents = readCentroids(spark, paths)
    val assigned = assign(b, idCol, vecCol, cents).localCheckpoint()
    val batchStats = collectStats(statsOf(assigned))
    // empty-batch detection from the collected stats — no separate isEmpty
    // job (the checkpoint + nlist-row aggregate above are the same scans)
    if (batchStats.isEmpty) {
      logRow(spark, paths, batchId, "empty", 0L, Nil); return Nil
    }
    val corpusStats = collectStats(spark.read.parquet(paths.stats))

    // Drift decision at nlist grain, driver-side (both maps are <= nlist
    // rows). Trigger semantics differ deliberately from the one-shot
    // ivfRefit: refit exists to fix POOR FIT, so the share-drift signal is
    // gated on the incoming traffic fitting more than shareFitMargin worse
    // than the bucket's standing members. Without the gate a stream that
    // permanently shifts to a new-but-now-well-modeled distribution would
    // re-trigger on every batch until the corpus mass caught up —
    // hot-but-well-fit traffic is a routing fact, not a model failure.
    // The margin is RELATIVE (vs the bucket's own corpus fit) because the
    // achievable absolute fit is data-dependent: tight clusters sit near
    // 1, near-isotropic embeddings near 1/sqrt(d). The fit_drop path needs
    // no gate: a refit raises the incoming fit, which closes the drop by
    // construction. Together this makes a single mid-stream distribution
    // shift converge in exactly one refit.
    val tc = corpusStats.values.map(_._1).sum.toDouble
    val tn = batchStats.values.map(_._1).sum.toDouble
    if (sys.env.contains("GRAFT_ANN_DEBUG"))
      (corpusStats.keySet ++ batchStats.keySet).toSeq.sorted.foreach { bkt =>
        val (nc, fc) = corpusStats.getOrElse(bkt, (0L, 0.0))
        val (nn, fn) = batchStats.getOrElse(bkt, (0L, 0.0))
        System.err.println(f"[annidx] batch=$batchId bkt=$bkt nc=$nc " +
          f"fcAvg=${if (nc > 0) fc / nc else -1}%.3f nn=$nn " +
          f"fnAvg=${if (nn > 0) fn / nn else -1}%.3f")
      }
    val drifted = (corpusStats.keySet ++ batchStats.keySet).filter { bkt =>
      val (nc, fc) = corpusStats.getOrElse(bkt, (0L, 0.0))
      val (nn, fn) = batchStats.getOrElse(bkt, (0L, 0.0))
      val shareDrift = math.abs(nn / math.max(tn, 1.0) - nc / math.max(tc, 1.0))
      val fitNewAvg = if (nn > 0) fn / nn else Double.NaN
      val fitDrop = if (nc > 0 && nn > 0) fc / nc - fitNewAvg else 0.0
      // nc == 0: the bucket has no standing members, so a share spike has
      // no fit baseline to clear — the centroid never modeled anything,
      // refit it
      val fitsWorse = nc == 0L || fitNewAvg < fc / nc - cfg.shareFitMargin
      fitDrop > cfg.fitDropThreshold ||
        (nn > 0 && shareDrift > cfg.shareDriftThreshold && fitsWorse)
    }.toSeq.sorted

    if (drifted.isEmpty) {
      assigned.drop("fit").write.partitionBy("bucket")
        .mode("append").parquet(paths.corpus)
      val merged = (corpusStats.keySet ++ batchStats.keySet).toSeq.map { bkt =>
        val (nc, fc) = corpusStats.getOrElse(bkt, (0L, 0.0))
        val (nn, fn) = batchStats.getOrElse(bkt, (0L, 0.0))
        (bkt, nc + nn, fc + fn)
      }
      import spark.implicits._
      StoreSwap.swapIn(merged.toDF("bucket", "n", "fit_sum").coalesce(1), paths.stats)
      // the batch row count is the stats sum — no recount job (r14)
      logRow(spark, paths, batchId, "append",
        batchStats.values.map(_._1).sum, Nil)
      return Nil
    }

    // ---- refit path ----
    val driftedSet = drifted.toSet
    // corpus-side sample: partition-pruned read of ONLY the drifted buckets
    // (pre-append read, so per-side budgets below see disjoint populations)
    val corpusDrifted = spark.read.parquet(paths.corpus)
      .filter(col("bucket").isInCollection(driftedSet))
    val batchDrifted = assigned.filter(col("bucket").isInCollection(driftedSet))
    // proportional per-side budgets, same contract as Similarity.ivfRefit:
    // an id-ascending union sample would starve the new side entirely
    val cDrift = drifted.map(b => corpusStats.getOrElse(b, (0L, 0.0))._1).sum
    val nDrift = drifted.map(b => batchStats.getOrElse(b, (0L, 0.0))._1).sum
    val newBudget =
      if (nDrift == 0L) 0
      else math.min(cfg.sampleSize, math.max(cfg.sampleSize / 4,
        (cfg.sampleSize.toLong * nDrift / math.max(1L, cDrift + nDrift)).toInt))
    val sample =
      Similarity.sampleVectors(corpusDrifted, "vec", "id", cfg.sampleSize - newBudget) ++
      Similarity.sampleVectors(batchDrifted, "vec", "id", newBudget)
    val kEff = math.min(drifted.length, sample.length)
    val (updated, refit) =
      if (kEff == 0) (cents, Nil) // pathological: nothing to fit on
      else {
        val replacements = Similarity.kmeansDot(sample, kEff, cfg.iters)
        val u = cents.map(_.clone())
        drifted.take(kEff).zipWithIndex.foreach { case (bkt, i) => u(bkt) = replacements(i) }
        (u, drifted.take(kEff))
      }
    if (refit.nonEmpty) writeCentroids(spark, updated, paths.centroids)
    // batch lands under the NEW assignment (fresh partitions stay aligned)
    val reassigned = assign(assigned.select(col("id").as(idCol), col("vec").as(vecCol)),
      idCol, vecCol, updated).localCheckpoint()
    reassigned.drop("fit").write.partitionBy("bucket")
      .mode("append").parquet(paths.corpus)
    // stats rebuild: carry undrifted buckets, re-stat the drifted partitions
    // (pre-append corpus slice) + the whole batch under the new centroids
    val restat = collectStats(statsOf(
      assign(corpusDrifted.select(col("id").as(idCol), col("vec").as(vecCol)),
        idCol, vecCol, updated)
        .unionByName(reassigned)))
    val carried = corpusStats.view.filterKeys(bkt => !driftedSet.contains(bkt)).toMap
    val merged = (carried.keySet ++ restat.keySet).toSeq.map { bkt =>
      val (nc, fc) = carried.getOrElse(bkt, (0L, 0.0))
      val (nn, fn) = restat.getOrElse(bkt, (0L, 0.0))
      (bkt, nc + nn, fc + fn)
    }
    import spark.implicits._
    StoreSwap.swapIn(merged.toDF("bucket", "n", "fit_sum").coalesce(1), paths.stats)
    // reassignment is row-preserving: the batch count is the stats sum
    logRow(spark, paths, batchId, "refit",
      batchStats.values.map(_._1).sum, refit)
    refit
  }

  /** Exactness restore: one full corpus pass re-assigned under the CURRENT
    * centroid table, swapped in as the new stats store. Run on whatever
    * cadence the deployment wants the drift signal exact (see the class doc
    * approximations); cost is one scan + an nlist-sized aggregate.
    */
  def recomputeStats(spark: SparkSession, paths: IndexPaths): Unit = {
    val cents = readCentroids(spark, paths)
    val corpus = spark.read.parquet(paths.corpus)
      .select(col("id"), col("vec"))
    StoreSwap.swapIn(statsOf(assign(corpus, "id", "vec", cents)), paths.stats)
  }

  /** The streaming entry point: every micro-batch runs [[maintainBatch]]. */
  def maintain(
      vectors: DataFrame, idCol: String, vecCol: String,
      paths: IndexPaths, checkpointPath: String,
      cfg: Config = Config()): StreamingQuery = {
    val spark = vectors.sparkSession
    vectors.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        maintainBatch(spark, batch, idCol, vecCol, paths, cfg, batchId)
        ()
      }
      .start()
  }
}
