package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("connected components: chains, triangles, singleton-free") {
    import spark.implicits._
    // components: {1,2,3,4 chain}, {10,11,12 triangle}, {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (11L, 12L), (20L, 21L)).toDF("id1", "id2")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components: long chain converges (diameter > 2)") {
    import spark.implicits._
    val pairs = (0L until 20L).map(i => (i, i + 1)).toDF("id1", "id2")
    val cc = Dedup.connectedComponents(pairs, maxIters = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.toSet == Set(0L))
    assert(cc.size == 21)
  }

  test("materialized=true over a pinned edge list matches the default path") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (11L, 12L), (20L, 21L)).toDF("id1", "id2")
    val expected = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pinned = pairs.localCheckpoint()
    val viaPinned = Dedup.connectedComponents(pinned, materialized = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaPinned == expected)
    // and on the distributed path too (limit 0 forces it)
    val viaPinnedDist = Dedup.connectedComponents(pinned,
        smallGraphLimit = 0L, materialized = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaPinnedDist == expected)
  }

  test("distributed min-label path equals driver union-find on random graphs") {
    import spark.implicits._
    // the >smallGraphLimit path must agree with the collect-based
    // union-find on ANY graph shape: random sparse graphs from fixed seeds
    // (mix of chains, merged clusters, singleton pairs)
    (1 to 3).foreach { trial =>
      val rnd = new scala.util.Random(trial * 7919L)
      val n = 300
      val edges = (0 until 400).map { _ =>
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val pairs = edges.toDF("id1", "id2")
      val driver = Dedup.connectedComponents(pairs, maxIters = 64)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Dedup.connectedComponents(pairs, maxIters = 64, smallGraphLimit = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dist == driver, s"trial $trial: distributed != union-find")
    }
  }

  test("nearDedup keeps one representative per planted dup cluster") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the deep dark forest tonight"
    val docs = Seq(
      (1L, base),
      (2L, base),                               // dup of 1
      (3L, base.replace("tonight", "today")),   // near dup of 1 -> same cluster
      (4L, "a completely different corpus about distributed columnar execution engines and shuffles"),
      (5L, "another unrelated text concerning streaming watermarks and stateful aggregation semantics")
    ).toDF("doc_id", "text")
    val kept = Dedup.nearDedup(docs, "text", "doc_id", threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L)) // 2 and 3 collapse into cluster of 1
  }

  test("nearDedupKeepBest keeps the highest-scoring cluster member") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the deep dark forest tonight"
    val docs = Seq(
      (1L, base),
      (2L, base + " with an extra trailing clause making this copy longer"), // longest dup
      (3L, base.replace("tonight", "today")),
      (4L, "a completely different corpus about distributed columnar execution engines and shuffles")
    ).toDF("doc_id", "text")
    // policy: keep the LONGEST copy -> doc 2 wins its cluster (min-id
    // policy would keep doc 1)
    val kept = Dedup.nearDedupKeepBest(docs, "text", "doc_id",
        length(col("text")), threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(2L, 4L), s"got $kept")
    // tie on score falls back to lowest id -> same result as nearDedup
    val tied = Dedup.nearDedupKeepBest(docs, "text", "doc_id",
        lit(0), threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(tied == Seq(1L, 4L), s"got $tied")
  }

  test("hll_intersect_estimate approximates a known overlap") {
    import spark.implicits._
    import graft.functions.GraftFunctions
    // A = 0..5999, B = 4000..9999 -> |A ∩ B| = 2000
    val df = ((0 until 6000).map(i => ("a", s"u$i")) ++
      (4000 until 10000).map(i => ("b", s"u$i"))).toDF("side", "v")
    val sk = df.groupBy("side").agg(GraftFunctions.hll_sketch_agg(col("v"), 1 << 14).as("sk"))
    val a = sk.filter(col("side") === "a").select(col("sk").as("ska"))
    val b = sk.filter(col("side") === "b").select(col("sk").as("skb"))
    val est = a.crossJoin(b)
      .select(GraftFunctions.hll_intersect_estimate(col("ska"), col("skb")))
      .collect()(0).getDouble(0)
    assert(math.abs(est - 2000) / 2000.0 < 0.15, s"intersection estimate too far off: $est")
  }
}
