package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (`array<float>`, unit-norm in the test tables so dot product = cosine).
  *
  * Scale design (100 TB):
  *  - brute force is the correctness baseline: broadcast the (small) query
  *    set, one scan of the corpus, per-query top-k via aggregation — no
  *    corpus shuffle at all.
  *  - IVF is the scale path: centroids fitted once on a bounded sample
  *    (driver-side k-means on <=4096 vectors — the standard
  *    fit-on-sample/assign-distributed split), assignment is map-only
  *    against broadcast centroids, and each query probes only `nprobe`
  *    partitions, cutting scanned rows by ~nlist/nprobe.
  * All distance math is codegen'd builtins (zip_with/aggregate), no UDFs.
  */
object Similarity {

  /** Dot product of two float-array columns, computed in double.
    * Native expression: tight primitive loop instead of the interpreted
    * aggregate(zip_with(...)) chain — ~10x on the ANN hot path.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.DotProductF(
        org.apache.spark.sql.graftshim.GraftShims.expression(a),
        org.apache.spark.sql.graftshim.GraftShims.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (safe against zero vectors). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n > 0, d / n).otherwise(lit(0.0))
  }

  /** Exact top-k neighbors for each query vector (brute force baseline).
    * queryDf must be small (it is broadcast).
    *
    * @param excludeSelf drop corpus rows whose id equals the query id. OFF
    *                    by default: the guard only makes sense when queries
    *                    are drawn from the corpus (same id space) — opt in
    *                    there. With unrelated id spaces a coincidental id
    *                    match would silently drop a true neighbor (same
    *                    default across the whole topK family).
    */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int = 10, excludeSelf: Boolean = false): DataFrame = {
    val c = corpus.alias("c")
    val q = queries.alias("q")
    val joined = c.crossJoin(broadcast(q))
      .withColumn("cos", cosine(col(s"c.$corpusVec"), col(s"q.$queryVec")))
      .filter(if (excludeSelf) col(s"c.$corpusId") =!= col(s"q.$queryId") else lit(true))
    val w = Window.partitionBy(col(s"q.$queryId")).orderBy(col("cos").desc, col(s"c.$corpusId"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(s"q.$queryId").as("query_id"), col("rank"),
        col(s"c.$corpusId").as("neighbor_id"), round(col("cos"), 4).as("cos"))
  }

  /** Deterministic k-means on a driver-side sample: seeds chosen evenly from
    * the id-sorted sample, fixed iteration count — same result every run.
    */
  def fitCentroids(
      corpus: DataFrame, vecCol: String, idCol: String,
      nlist: Int = 16, sampleSize: Int = 1024, iters: Int = 10): Array[Array[Double]] = {
    val sample = sampleVectors(corpus, vecCol, idCol, sampleSize)
    require(sample.length >= nlist, s"sample ${sample.length} < nlist $nlist")
    kmeansDot(sample, nlist, iters)
  }

  /** Deterministic bounded driver-side sample (id-sorted TakeOrdered, not a
    * full sort): the shared fit input for all centroid training.
    */
  private[graft] def sampleVectors(
      corpus: DataFrame, vecCol: String, idCol: String,
      sampleSize: Int): Array[Array[Double]] =
    corpus.filter(col(vecCol).isNotNull)
      .orderBy(col(idCol)).limit(sampleSize)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  /** Deterministic dot-product k-means on a driver-side sample: seeds chosen
    * evenly from the (already id-ordered) sample, fixed iteration count.
    */
  private[graft] def kmeansDot(
      sample: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    var centroids = Array.tabulate(k)(i => sample(i * sample.length / k).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](sample.head.length))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val c = nearestCentroid(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }
    }
    centroids
  }

  private def nearestCentroid(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < cs.length) {
      var d = 0.0
      var i = 0
      while (i < v.length) { d += v(i) * cs(c)(i); i += 1 }
      if (d > bestDot) { bestDot = d; best = c }
      c += 1
    }
    best
  }

  /** Map-only partition assignment against plan-embedded centroids:
    * bucket = argmax dot(vec, centroid) as a native one-pass expression.
    */
  def assignBucket(vec: Column, centroids: Array[Array[Double]]): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.NearestCentroid(
        org.apache.spark.sql.graftshim.GraftShims.expression(vec), centroids))

  /** Incremental IVF maintenance: assign a NEW embedding batch to the
    * FROZEN centroids (the same map-only [[assignBucket]] the index uses —
    * appends never rebuild anything) and report per-bucket drift against
    * the standing corpus: bucket-share shift plus each side's mean
    * similarity to its centroid. The refit signal: a bucket whose share of
    * new data diverges from its corpus share (`share_drift`), or whose new
    * members sit much farther from the centroid (`fit_drop`), means the
    * frozen partitioning no longer matches incoming data — refit then, and
    * only then. Scale shape: two map-only assignment passes and one
    * nlist-sized aggregate each; no join touches raw vectors across sides.
    */
  def ivfAppendStats(
      corpus: DataFrame, newBatch: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val centLit = typedLit(centroids.map(_.map(_.toFloat).toSeq).toSeq)
    def stats(df: DataFrame, nCol: String, fitCol: String): DataFrame =
      df.filter(col(vecCol).isNotNull)
        .withColumn("_b", assignBucket(col(vecCol), centroids))
        // cosine to the OWN assigned centroid, via the plan-embedded table
        .withColumn("_fit",
          cosine(col(vecCol), element_at(centLit, col("_b") + 1)))
        .groupBy(col("_b").as("bucket"))
        .agg(count(lit(1)).as(nCol), avg(col("_fit")).as(fitCol))
    val c = stats(corpus, "n_corpus", "fit_corpus")
    val n = stats(newBatch, "n_new", "fit_new")
    val joined = c.join(n, Seq("bucket"), "full_outer").na.fill(0L, Seq("n_corpus", "n_new"))
    val tc = sum(col("n_corpus")).over(org.apache.spark.sql.expressions.Window.partitionBy())
    val tn = sum(col("n_new")).over(org.apache.spark.sql.expressions.Window.partitionBy())
    joined
      .withColumn("corpus_share", col("n_corpus") / tc)
      .withColumn("new_share", col("n_new") / tn)
      .withColumn("share_drift", abs(col("new_share") - col("corpus_share")))
      .withColumn("fit_drop",
        when(col("fit_corpus").isNotNull && col("fit_new").isNotNull,
          col("fit_corpus") - col("fit_new")).otherwise(lit(null)))
      .select(col("bucket"), col("n_corpus"), col("n_new"),
        col("corpus_share"), col("new_share"), col("share_drift"),
        col("fit_corpus"), col("fit_new"), col("fit_drop"))
  }

  /** The refit executor that consumes [[ivfAppendStats]]'s drift signal:
    * buckets whose `share_drift` or `fit_drop` crosses its threshold get
    * their centroid REPLACED by re-running k-means over a bounded sample of
    * just those buckets' members (corpus + new batch together); undrifted
    * centroids are untouched. nlist is preserved, so existing bucket ids
    * outside the drifted set — and anything keyed on them — stay valid.
    *
    * Because assignment here is always computed map-only from the centroid
    * table ([[assignBucket]] plan-embedded), "re-assigning the drifted
    * buckets" costs nothing at refit time: the next query/encode pass
    * simply runs against the returned table. At 100 TB that is the point —
    * the refit touches a driver-side sample plus one nlist-sized stats
    * aggregate, never the full corpus.
    *
    * @return (updated centroids, the drift stats that drove the decision,
    *         the drifted bucket ids that were refit)
    */
  def ivfRefit(
      corpus: DataFrame, newBatch: DataFrame, vecCol: String, idCol: String,
      centroids: Array[Array[Double]],
      shareDriftThreshold: Double = 0.25,
      fitDropThreshold: Double = 0.15,
      sampleSize: Int = 1024, iters: Int = 10)
      : (Array[Array[Double]], DataFrame, Seq[Int]) = {
    val stats = ivfAppendStats(corpus, newBatch, vecCol, centroids)
      .localCheckpoint() // nlist-sized; pin so callers can reuse it cheaply
    val driftRows = stats
      .filter(col("share_drift") > shareDriftThreshold ||
        col("fit_drop") > fitDropThreshold)
      .select(col("bucket"), col("n_corpus"), col("n_new")).collect()
    val drifted = driftRows.map(_.getInt(0)).toSeq.sorted
    if (drifted.isEmpty) return (centroids, stats, Nil)
    val driftedSet = drifted.toSet
    def driftedMembers(df: DataFrame): DataFrame =
      df.select(col(idCol), col(vecCol))
        .filter(col(vecCol).isNotNull)
        .filter(assignBucket(col(vecCol), centroids)
          .isInCollection(driftedSet))
    // Bounded PER-SIDE samples, sized proportional to each side's drifted
    // membership (floor of sampleSize/4 for a non-empty new batch). An
    // id-ascending sample of the union would hold zero new-batch vectors
    // whenever appended ids sort above corpus ids (the normal append case),
    // so the replacement centroids would chase the old distribution and the
    // same buckets would re-trigger refit on every maintenance pass.
    val tc = driftRows.map(_.getLong(1)).sum
    val tn = driftRows.map(_.getLong(2)).sum
    val newBudget =
      if (tn == 0L) 0
      else math.min(sampleSize, math.max(sampleSize / 4,
        (sampleSize.toLong * tn / math.max(1L, tc + tn)).toInt))
    val sample =
      sampleVectors(driftedMembers(corpus), vecCol, idCol, sampleSize - newBudget) ++
      sampleVectors(driftedMembers(newBatch), vecCol, idCol, newBudget)
    // fewer members than drifted slots (pathological): refit what the data
    // supports, keep the starved slots' old centroids
    val kEff = math.min(drifted.length, sample.length)
    if (kEff == 0) return (centroids, stats, Nil)
    val replacements = kmeansDot(sample, kEff, iters)
    val updated = centroids.map(_.clone())
    drifted.take(kEff).zipWithIndex.foreach { case (b, i) =>
      updated(b) = replacements(i)
    }
    (updated, stats, drifted.take(kEff))
  }

  /** IVF top-k: probe only the `nprobe` buckets whose centroids are nearest
    * to each query. Returns the same schema as bruteForceTopK.
    */
  def ivfTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      centroids: Array[Array[Double]],
      k: Int = 10, nprobe: Int = 4, excludeSelf: Boolean = false): DataFrame = {
    val bucketed = corpus.withColumn("_bucket", assignBucket(col(corpusVec), centroids)).alias("c")
    // probe list per query: nprobe nearest centroids (small; computed as columns)
    val cLit = typedLit(centroids.map(_.toSeq).toSeq)
    val qDots = transform(cLit, c =>
      aggregate(zip_with(c, col(queryVec), (x, y) => x * y.cast("double")), lit(0.0), (a, x) => a + x))
    val probes = slice(reverse(array_sort(zip_with(qDots,
        sequence(lit(0), lit(centroids.length - 1)),
        (d, i) => struct(d.as("d"), i.as("i"))))), 1, nprobe)
    val qWithProbes = broadcast(
      queries.withColumn("_probes", transform(probes, p => p.getField("i"))).alias("q"))
    val selfGuard =
      if (excludeSelf) col(s"c.$corpusId") =!= col(s"q.$queryId") else lit(true)
    val joined = bucketed.join(qWithProbes,
        array_contains(col("_probes"), col("_bucket")) && selfGuard)
      .withColumn("cos", cosine(col(s"c.$corpusVec"), col(s"q.$queryVec")))
    val w = Window.partitionBy(col(s"q.$queryId")).orderBy(col("cos").desc, col(s"c.$corpusId"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(s"q.$queryId").as("query_id"), col("rank"),
        col(s"c.$corpusId").as("neighbor_id"), round(col("cos"), 4).as("cos"))
  }

  /** Product-quantization codebooks `[m][ksub][dsub]`: the vector space is
    * split into `m` contiguous subspaces and each gets its own deterministic
    * sample k-means (L2 metric — PQ quantizes by distance, not angle). Same
    * bounded-driver-sample split as [[fitCentroids]]: fit on <= sampleSize
    * vectors once, encode the corpus distributed and map-only.
    */
  def fitPqCodebooks(
      corpus: DataFrame, vecCol: String, idCol: String,
      m: Int = 8, ksub: Int = 16, sampleSize: Int = 1024,
      iters: Int = 10): Array[Array[Array[Double]]] = {
    require(ksub <= 256, s"ksub $ksub > 256 does not fit a byte code")
    val sample = corpus.filter(col(vecCol).isNotNull)
      .orderBy(col(idCol)).limit(sampleSize)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.length >= ksub, s"sample ${sample.length} < ksub $ksub")
    val d = sample.head.length
    require(d % m == 0, s"dim $d not divisible by m $m")
    val dsub = d / m
    Array.tabulate(m) { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      var cents = Array.tabulate(ksub)(i => sub(i * sub.length / ksub).clone())
      for (_ <- 0 until iters) {
        val sums = Array.fill(ksub)(new Array[Double](dsub))
        val counts = new Array[Int](ksub)
        sub.foreach { v =>
          val c = nearestL2(v, cents)
          counts(c) += 1
          var i = 0
          while (i < dsub) { sums(c)(i) += v(i); i += 1 }
        }
        cents = Array.tabulate(ksub) { c =>
          if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c))
        }
      }
      cents
    }
  }

  private def nearestL2(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0
      var i = 0
      while (i < v.length) { val x = v(i) - cs(c)(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** PQ code column (`m` bytes per vector) from plan-embedded codebooks. */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.PqEncode(
        org.apache.spark.sql.graftshim.GraftShims.expression(vec), codebooks))

  private def pqLutCol(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.PqLut(
        org.apache.spark.sql.graftshim.GraftShims.expression(vec), codebooks))

  private def pqAdcCol(code: Column, lut: Column, ksub: Int): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.PqAdcScore(
        org.apache.spark.sql.graftshim.GraftShims.expression(code),
        org.apache.spark.sql.graftshim.GraftShims.expression(lut), ksub))

  /** PQ top-k with ADC scan + exact re-rank — the 100 TB ANN layout:
    * the corpus is stored as `m`-byte codes (~32x smaller than the float
    * vectors, so the scan reads bytes, not floats), each query carries a
    * precomputed lookup table (one eval per query row), and scoring a
    * corpus row is `m` table lookups in whole-stage codegen. The top
    * `k*refine` ADC candidates per query are then re-ranked by exact cosine
    * against the original vectors — a second, tiny join that touches only
    * `k*refine*|queries|` corpus rows.
    *
    * Scale shape: one corpus scan of the narrow (id, code) projection, a
    * window top-k over (query_id, score) rows only — the float vectors never
    * ride through the scoring shuffle — then a broadcast join of the
    * candidate set back to the corpus for the re-rank.
    *
    * Sizing rule: ADC ranks between quantization cells; the exact re-rank
    * orders within one. On clustered corpora a whole cluster can share one
    * code, so `k * refine` must cover the largest cell a query lands in, or
    * the candidate set is an arbitrary same-score subset of it (ties broken
    * by id). See the clustered-recall test for the measured effect.
    */
  def pqTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      codebooks: Array[Array[Array[Double]]],
      k: Int = 10, refine: Int = 4, excludeSelf: Boolean = false): DataFrame = {
    val ksub = codebooks(0).length
    val coded = corpus.select(col(corpusId).as("_cid"),
      pqEncode(col(corpusVec), codebooks).as("_code"))
    val qLut = broadcast(queries.select(col(queryId).as("_qid"),
      pqLutCol(col(queryVec), codebooks).as("_lut")))
    val selfGuard = if (excludeSelf) col("_cid") =!= col("_qid") else lit(true)
    // ADC scan: narrow (qid, cid, score) rows only ride into the window
    val scored = coded.crossJoin(qLut).filter(selfGuard)
      .select(col("_qid"), col("_cid"),
        pqAdcCol(col("_code"), col("_lut"), ksub).as("_adc"))
    exactRerank(scored, corpus, corpusId, corpusVec, queries, queryId, queryVec, k, refine)
  }

  /** IVF-PQ: coarse centroids prune the scan to `nprobe`/`nlist` of the
    * corpus, PQ codes make the surviving scan byte-wide, ADC scores it, and
    * the exact re-rank fixes up the top k×refine — the standard
    * billion-scale ANN index expressed as one declarative plan. Codes
    * quantize the raw vectors (not centroid residuals); the re-rank absorbs
    * the recall difference in exchange for one shared codebook set.
    */
  def ivfPqTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      k: Int = 10, nprobe: Int = 4, refine: Int = 4,
      excludeSelf: Boolean = false): DataFrame = {
    val ksub = codebooks(0).length
    // corpus: bucket + byte code, both map-only against plan-embedded params
    val coded = corpus.select(col(corpusId).as("_cid"),
      assignBucket(col(corpusVec), centroids).as("_bucket"),
      pqEncode(col(corpusVec), codebooks).as("_code"))
    // query side: nprobe nearest centroids + the ADC lookup table
    val cLit = typedLit(centroids.map(_.toSeq).toSeq)
    val qDots = transform(cLit, c =>
      aggregate(zip_with(c, col(queryVec), (x, y) => x * y.cast("double")), lit(0.0), (a, x) => a + x))
    val probes = slice(reverse(array_sort(zip_with(qDots,
        sequence(lit(0), lit(centroids.length - 1)),
        (d, i) => struct(d.as("d"), i.as("i"))))), 1, nprobe)
    val qSide = broadcast(queries.select(col(queryId).as("_qid"),
      pqLutCol(col(queryVec), codebooks).as("_lut"),
      transform(probes, p => p.getField("i")).as("_probes")))
    val selfGuard = if (excludeSelf) col("_cid") =!= col("_qid") else lit(true)
    val scored = coded.join(qSide,
        array_contains(col("_probes"), col("_bucket")) && selfGuard)
      .select(col("_qid"), col("_cid"),
        pqAdcCol(col("_code"), col("_lut"), ksub).as("_adc"))
    exactRerank(scored, corpus, corpusId, corpusVec, queries, queryId, queryVec, k, refine)
  }

  /** Shared ANN tail: top k×refine by approximate score, then exact-cosine
    * re-rank of that tiny candidate set via broadcast joins back to the
    * corpus and query vectors.
    */
  private def exactRerank(
      scored: DataFrame,
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, refine: Int): DataFrame = {
    val wAdc = Window.partitionBy(col("_qid")).orderBy(col("_adc").desc, col("_cid"))
    val cands = scored.withColumn("_r", row_number().over(wAdc))
      .filter(col("_r") <= k * refine)
      .select(col("_qid"), col("_cid"))
    val withVec = corpus.select(col(corpusId).as("_cid"), col(corpusVec).as("_cv"))
      .join(broadcast(cands), "_cid")
    val rejoined = withVec.join(
      broadcast(queries.select(col(queryId).as("_qid"), col(queryVec).as("_qv"))), "_qid")
      .withColumn("cos", cosine(col("_cv"), col("_qv")))
    val w = Window.partitionBy(col("_qid")).orderBy(col("cos").desc, col("_cid"))
    rejoined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("_qid").as("query_id"), col("rank"),
        col("_cid").as("neighbor_id"), round(col("cos"), 4).as("cos"))
  }

  /** Per-table hyperplane sets for multi-table LSH (deterministic seeds). */
  def randomHyperplaneTables(
      tables: Int, nBits: Int, dim: Int, seed: Long = 0x9e3779b9L): Array[Array[Array[Double]]] =
    Array.tabulate(tables)(t => randomHyperplanes(nBits, dim, seed + 0x51_7c_c1_b7L * t))

  /** LSH-bucketed top-k: multi-table sign-bit hyperplane buckets with
    * Hamming-1 multi-probe. A corpus row is a candidate for a query if they
    * share a bucket in ANY table, where the query also probes every bucket
    * one bit-flip away (the standard multi-probe trick — most of the recall
    * of extra tables at no index cost).
    *
    * Scale shape: corpus bucketing is map-only (plan-embedded hyperplanes,
    * one `tables`-element array per row, posexploded — no shuffle). Probe
    * lists explode on the (small, broadcast) query side, so candidates come
    * from a broadcast equi-join on (table, bucket); the only shuffled data is
    * the candidate pair set (grouped to dedupe multi-table hits), which is
    * tiny relative to the corpus. Recall/scan-fraction is data-dependent:
    * on near-isotropic vectors (no cluster structure) sign-bit LSH needs
    * many tables to reach high recall — prefer IVF there.
    */
  def lshTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      tablePlanes: Array[Array[Array[Double]]],
      k: Int = 10, excludeSelf: Boolean = false): DataFrame = {
    val nbits = tablePlanes.head.length
    def bucketOf(vec: Column, t: Int) =
      org.apache.spark.sql.graftshim.GraftShims.column(
        graft.functions.HyperplaneBucket(
          org.apache.spark.sql.graftshim.GraftShims.expression(vec), tablePlanes(t)))
    val nt = tablePlanes.length
    // corpus: one (table, bucket) row per table, map-only
    val bucketed = corpus.select(col(corpusId), col(corpusVec),
      posexplode(array((0 until nt).map(t => bucketOf(col(corpusVec), t)): _*))
        .as(Seq("_tbl", "_bucket")))
      .alias("c")
    // queries: per table, own bucket + all Hamming-1 neighbors
    val probeCols = (0 until nt).flatMap { t =>
      val qb = bucketOf(col(queryVec), t)
      (qb +: (0 until nbits).map(b => qb.bitwiseXOR(lit(1 << b))))
        .map(p => struct(lit(t).as("_tbl"), p.as("_probe")))
    }
    val qProbes = broadcast(
      queries.select(col(queryId), col(queryVec),
        explode(array(probeCols: _*)).as("_p"))
      .select(col(queryId), col(queryVec),
        col("_p._tbl").as("_tbl"), col("_p._probe").as("_probe"))
      .alias("q"))
    val selfGuard =
      if (excludeSelf) col(s"c.$corpusId") =!= col(s"q.$queryId") else lit(true)
    // dedupe multi-table hits on the candidate PAIR set (small) FIRST, so a
    // pair matching in several tables pays for one cosine, not one per table
    val candidates = bucketed.join(qProbes,
        col("c._tbl") === col("q._tbl") && col("_bucket") === col("_probe") && selfGuard)
      .groupBy(col(s"q.$queryId").as("_qid"), col(s"c.$corpusId").as("_cid"))
      .agg(first(col(s"c.$corpusVec")).as("_cv"), first(col(s"q.$queryVec")).as("_qv"))
      .withColumn("cos", cosine(col("_cv"), col("_qv")))
    val w = Window.partitionBy(col("_qid")).orderBy(col("cos").desc, col("_cid"))
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("_qid").as("query_id"), col("rank"),
        col("_cid").as("neighbor_id"), round(col("cos"), 4).as("cos"))
  }

  /** Deterministic Gaussian hyperplanes for sign-bit LSH (fixed seed). */
  def randomHyperplanes(nBits: Int, dim: Int, seed: Long = 0x9e3779b9L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Embedding-cosine near-duplicate pairs via multi-table hyperplane-LSH
    * blocking. Each table hashes a vector to a sign-bit bucket from its own
    * `nbits >= 16` hyperplanes; a pair is a candidate if it collides in ANY
    * table (recall comes from table count, selectivity from bit count — the
    * standard trade instead of few-bits/one-table, which degenerates into an
    * n²/2^bits self-join). Candidates are deduped across tables before the
    * cosine verify, so a pair colliding in several tables pays once.
    *
    * Scale shape: bucketing is map-only (plan-embedded hyperplanes, one
    * posexplode per row); the only shuffle is the per-(table,bucket)
    * self-join, whose fan-out is bounded by `maxBucket` — oversized buckets
    * (duplicate-heavy or degenerate embeddings) are dropped, same skew guard
    * as the minhash band join.
    */
  def embeddingNearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      tablePlanes: Array[Array[Array[Double]]],
      threshold: Double = 0.95,
      maxBucket: Int = 1000): DataFrame = {
    require(tablePlanes.forall(_.length >= 16),
      s"each LSH table needs >= 16 bits (got ${tablePlanes.map(_.length).mkString(",")}) — " +
        "fewer bits makes the bucket self-join quadratic at scale")
    def bucketOf(vec: Column, t: Int) =
      org.apache.spark.sql.graftshim.GraftShims.column(
        graft.functions.HyperplaneBucket(
          org.apache.spark.sql.graftshim.GraftShims.expression(vec), tablePlanes(t)))
    val nt = tablePlanes.length
    val bucketedDf = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .select(col("id"), col("v"),
        posexplode(array((0 until nt).map(t => bucketOf(col("v"), t)): _*))
          .as(Seq("_tbl", "_bucket")))
      .withColumn("bsz", count(lit(1)).over(
        Window.partitionBy(col("_tbl"), col("_bucket"))))
      .filter(col("bsz") <= maxBucket)
      .drop("bsz")
    val l = bucketedDf.alias("l")
    val r = bucketedDf.alias("r")
    l.join(r,
        col("l._tbl") === col("r._tbl") && col("l._bucket") === col("r._bucket") &&
        col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("id1"), col("r.id").as("id2"))
      .agg(first(col("l.v")).as("v1"), first(col("r.v")).as("v2"))
      .withColumn("cos", cosine(col("v1"), col("v2")))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), round(col("cos"), 4).as("cos"))
  }

  /** Semantic deduplication (SemDeDup-style, Abbas et al. 2023): drop every
    * vector that has ANY lower-id near-duplicate at `cos >= threshold`,
    * keep the rest — the embedding-space analogue of the minhash keep-best
    * policy, with "first id wins" as the deterministic representative rule.
    * The drop rule is GLOBAL (any lower-id partner, whether or not that
    * partner itself survives), so the semantics are closed-form and an
    * external engine can replay them from the raw pair set — no dependence
    * on cluster assignments or iteration order.
    *
    * Returns the drop LIST (dropped_id, dup_of = the smallest-id partner
    * that condemned it); [[semanticDedupKeep]] anti-joins it to produce the
    * surviving corpus. Scale shape is [[embeddingNearDupPairs]]'s: map-only
    * multi-table LSH bucketing, bucket-capped self-join, pair-level dedupe
    * before the cosine verify.
    */
  def semanticDropList(
      corpus: DataFrame, idCol: String, vecCol: String,
      tablePlanes: Array[Array[Array[Double]]],
      threshold: Double = 0.95,
      maxBucket: Int = 1000): DataFrame =
    embeddingNearDupPairs(corpus, idCol, vecCol, tablePlanes, threshold, maxBucket)
      .groupBy(col("id2").as("dropped_id"))
      .agg(min(col("id1")).as("dup_of"))

  /** The surviving corpus under [[semanticDropList]]'s policy. */
  def semanticDedupKeep(
      corpus: DataFrame, idCol: String, vecCol: String,
      tablePlanes: Array[Array[Array[Double]]],
      threshold: Double = 0.95,
      maxBucket: Int = 1000): DataFrame = {
    val dropped = semanticDropList(corpus, idCol, vecCol, tablePlanes, threshold, maxBucket)
    corpus.join(dropped, corpus(idCol) === dropped("dropped_id"), "left_anti")
  }
}
