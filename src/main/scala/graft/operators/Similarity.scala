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
    */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int = 10): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .withColumn("cos", cosine(col(corpusVec), col(queryVec)))
      .filter(col(corpusId) =!= col(queryId))
    val w = Window.partitionBy(col(queryId)).orderBy(col("cos").desc, col(corpusId))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId).as("query_id"), col("rank"),
        col(corpusId).as("neighbor_id"), round(col("cos"), 4).as("cos"))
  }

  /** Deterministic k-means on a driver-side sample: seeds chosen evenly from
    * the id-sorted sample, fixed iteration count — same result every run.
    */
  def fitCentroids(
      corpus: DataFrame, vecCol: String, idCol: String,
      nlist: Int = 16, sampleSize: Int = 1024, iters: Int = 10): Array[Array[Double]] = {
    val sample = corpus.orderBy(col(idCol)).limit(sampleSize)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.length >= nlist, s"sample ${sample.length} < nlist $nlist")
    var centroids = Array.tabulate(nlist)(i => sample(i * sample.length / nlist).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(nlist)(new Array[Double](sample.head.length))
      val counts = new Array[Int](nlist)
      sample.foreach { v =>
        val c = nearestCentroid(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(nlist) { c =>
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

  /** IVF top-k: probe only the `nprobe` buckets whose centroids are nearest
    * to each query. Returns the same schema as bruteForceTopK.
    */
  def ivfTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      centroids: Array[Array[Double]],
      k: Int = 10, nprobe: Int = 4): DataFrame = {
    val bucketed = corpus.withColumn("_bucket", assignBucket(col(corpusVec), centroids))
    // probe list per query: nprobe nearest centroids (small; computed as columns)
    val cLit = typedLit(centroids.map(_.toSeq).toSeq)
    val qDots = transform(cLit, c =>
      aggregate(zip_with(c, col(queryVec), (x, y) => x * y.cast("double")), lit(0.0), (a, x) => a + x))
    val probes = slice(reverse(array_sort(zip_with(qDots,
        sequence(lit(0), lit(centroids.length - 1)),
        (d, i) => struct(d.as("d"), i.as("i"))))), 1, nprobe)
    val qWithProbes = broadcast(queries.withColumn("_probes", transform(probes, p => p.getField("i"))))
    val joined = bucketed.join(qWithProbes,
        array_contains(col("_probes"), col("_bucket")) && col(corpusId) =!= col(queryId))
      .withColumn("cos", cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId)).orderBy(col("cos").desc, col(corpusId))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId).as("query_id"), col("rank"),
        col(corpusId).as("neighbor_id"), round(col("cos"), 4).as("cos"))
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
      k: Int = 10): DataFrame = {
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
        col("_p._tbl").as("_tbl"), col("_p._probe").as("_probe")))
    // dedupe multi-table hits on the candidate PAIR set (small) FIRST, so a
    // pair matching in several tables pays for one cosine, not one per table
    val candidates = bucketed.join(qProbes,
        bucketed("_tbl") === qProbes("_tbl") && col("_bucket") === col("_probe") &&
        col(corpusId) =!= col(queryId))
      .groupBy(col(queryId), col(corpusId))
      .agg(first(col(corpusVec)).as("_cv"), first(col(queryVec)).as("_qv"))
      .withColumn("cos", cosine(col("_cv"), col("_qv")))
    val w = Window.partitionBy(col(queryId)).orderBy(col("cos").desc, col(corpusId))
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId).as("query_id"), col("rank"),
        col(corpusId).as("neighbor_id"), round(col("cos"), 4).as("cos"))
  }

  /** Deterministic Gaussian hyperplanes for sign-bit LSH (fixed seed). */
  def randomHyperplanes(nBits: Int, dim: Int, seed: Long = 0x9e3779b9L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Embedding-cosine near-duplicate pairs via hyperplane-LSH blocking:
    * sign-bit bucket from `nbits` fixed hyperplanes (derived from the
    * centroid fit or any deterministic source), verify cosine >= threshold.
    * Map-only bucketing; the only shuffle is the bucket self-join.
    */
  def embeddingNearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      hyperplanes: Array[Array[Double]],
      threshold: Double = 0.95): DataFrame = {
    val bucketedDf = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("_bucket", org.apache.spark.sql.graftshim.GraftShims.column(
        graft.functions.HyperplaneBucket(
          org.apache.spark.sql.graftshim.GraftShims.expression(col("v")), hyperplanes)))
    val l = bucketedDf.alias("l")
    val r = bucketedDf.alias("r")
    l.join(r, col("l._bucket") === col("r._bucket") && col("l.id") < col("r.id"))
      .withColumn("cos", cosine(col("l.v"), col("r.v")))
      .filter(col("cos") >= threshold)
      .select(col("l.id").as("id1"), col("r.id").as("id2"), round(col("cos"), 4).as("cos"))
  }
}
