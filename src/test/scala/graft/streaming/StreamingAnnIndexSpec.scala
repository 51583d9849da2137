package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The verdict contract for the streaming ANN maintenance loop: a
  * mid-stream distribution shift triggers EXACTLY ONE refit, and
  * post-refit queries recover recall.
  */
class StreamingAnnIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dim = 16

  /** Deterministic clustered vectors: unit centers from a fixed seed,
    * points = normalize(center + 0.15 * gaussian noise).
    */
  private def mkCenters(n: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(n) {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / nrm)
    }
  }

  private def points(
      ids: Range, center: Array[Double], seed: Long): Seq[(Long, Array[Float])] = {
    val rnd = new java.util.Random(seed)
    ids.map { i =>
      val v = center.map(_ + 0.15 * rnd.nextGaussian())
      val nrm = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(x => (x / nrm).toFloat))
    }
  }

  test("mid-stream shift: exactly one refit, frozen slots, recall recovers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_annstream")
    val paths = StreamingAnnIndex.IndexPaths(tmp.resolve("index").toString)
    val cfg = StreamingAnnIndex.Config(nlist = 8, sampleSize = 400)

    val centers = mkCenters(9, seed = 7L) // 8 in-distribution + 1 shifted
    def inDist(ids: Range, seed: Long): Seq[(Long, Array[Float])] = {
      val rnd = new java.util.Random(seed)
      ids.map { i =>
        val v = centers(i % 8).map(_ + 0.15 * rnd.nextGaussian())
        val nrm = math.sqrt(v.map(x => x * x).sum)
        (i.toLong, v.map(x => (x / nrm).toFloat))
      }
    }
    val shifted = centers(8)

    val stream = MemoryStream[(Long, Array[Float])]
    val q = StreamingAnnIndex.maintain(
      stream.toDF().toDF("id", "vec"), "id", "vec",
      paths, tmp.resolve("ckpt").toString, cfg)
    try {
      // batch 0: bootstrap; batch 1: same distribution (must not refit)
      stream.addData(inDist(0 until 400, seed = 100L))
      q.processAllAvailable()
      val c0 = StreamingAnnIndex.readCentroids(spark, paths)
      assert(c0.length == 8)
      stream.addData(inDist(1000 until 1400, seed = 200L))
      q.processAllAvailable()
      val c1 = StreamingAnnIndex.readCentroids(spark, paths)
      assert(c0.indices.forall(b => c1(b).toSeq == c0(b).toSeq),
        "in-distribution batch must leave the centroid store byte-stable")

      // batch 2: the shift — every vector from a NEW cluster
      stream.addData(points(2000 until 2300, shifted, seed = 300L))
      q.processAllAvailable()
      val c2 = StreamingAnnIndex.readCentroids(spark, paths)
      // batch 3: same shifted distribution — now well-modeled, must NOT refit
      stream.addData(points(3000 until 3300, shifted, seed = 400L))
      q.processAllAvailable()
      val c3 = StreamingAnnIndex.readCentroids(spark, paths)

      val log = spark.read.parquet(paths.maintLog)
        .select(col("batch_id"), col("kind"), col("refit_buckets"))
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getSeq[Int](2)))
        .toMap
      assert(log(0L)._1 == "bootstrap" && log(1L)._1 == "append")
      assert(log(2L)._1 == "refit", s"shift batch must refit, got ${log(2L)}")
      assert(log(3L)._1 == "append",
        s"post-refit same-distribution batch must not re-refit, got ${log(3L)}")
      assert(log.values.count(_._1 == "refit") == 1, "exactly one refit")

      // frozen slots byte-identical across the refit
      val refitSet = log(2L)._2.toSet
      assert(refitSet.nonEmpty)
      assert(c1.indices.filterNot(refitSet.contains)
        .forall(b => c2(b).toSeq == c1(b).toSeq), "frozen slots must not move")
      assert(c3.indices.forall(b => c3(b).toSeq == c2(b).toSeq))

      // post-refit recall: shifted-cluster queries against the full corpus,
      // IVF probe with the swapped-in centroids vs exact brute force
      val corpus = spark.read.parquet(paths.corpus)
        .select(col("id"), col("vec"))
      assert(corpus.count() == 1400)
      val queries = points(9000 until 9005, shifted, seed = 500L)
        .toDF("qid", "qvec")
      def hits(df: org.apache.spark.sql.DataFrame) =
        df.select(col("query_id"), col("neighbor_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = hits(Similarity.bruteForceTopK(
        corpus, "id", "vec", queries, "qid", "qvec", k = 10))
      val ivf = hits(Similarity.ivfTopK(
        corpus, "id", "vec", queries, "qid", "qvec", c2, k = 10, nprobe = 2))
      val recall = (exact intersect ivf).size.toDouble / exact.size
      assert(recall >= 0.9, s"post-refit recall $recall")

      // the exactness restore: stats inventory == corpus after recompute
      StreamingAnnIndex.recomputeStats(spark, paths)
      val statTotal = spark.read.parquet(paths.stats)
        .agg(sum(col("n"))).collect()(0).getLong(0)
      assert(statTotal == 1400L)
    } finally q.stop()
  }
}
