package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("hash sampling: deterministic, partition-invariant, near target rate") {
    import spark.implicits._
    val df = (0 until 100000).map(_.toString).toDF("k")
    val a = Sampling.hashSample(df.repartition(3), "k", 0.3).collect().map(_.getString(0)).toSet
    val b = Sampling.hashSample(df.repartition(11), "k", 0.3).collect().map(_.getString(0)).toSet
    assert(a == b) // same rows regardless of partitioning
    assert(math.abs(a.size - 30000) < 1000, s"rate off: ${a.size}")
    // nested property: rate 0.1 sample is a subset of rate 0.3 sample
    val c = Sampling.hashSample(df, "k", 0.1).collect().map(_.getString(0)).toSet
    assert(c.subsetOf(a))
  }

  test("hash split: stable, complete, near fractions") {
    import spark.implicits._
    val df = (0 until 50000).map(_.toString).toDF("k")
    val splits = df.withColumn("s", Sampling.hashSplit(col("k"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet == Set("train", "val", "test"))
    assert(splits.values.sum == 50000L) // every row assigned exactly once
    assert(math.abs(splits("train") - 40000) < 800)
    assert(math.abs(splits("val") - 5000) < 400)
  }

  test("portable sample: partition-invariant, near rate, JVM replay matches") {
    import spark.implicits._
    val df = (0 until 100000).map(_.toLong).toDF("k")
    val a = Sampling.portableSample(df.repartition(3), "k", 0.2)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.portableSample(df.repartition(11), "k", 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(math.abs(a.size - 20000) < 1500, s"rate off: ${a.size}")
    // bit-replay of the arithmetic outside Spark (what the SQL oracle does)
    val m = 2147483648L
    val replay = (0L until 100000L).filter { k =>
      val x1 = (k % m * 1103515245L + 12345L) % m
      (x1 * 1103515245L + 12345L) % m < (0.2 * m).toLong
    }.toSet
    assert(a == replay)
  }

  test("training mix: per-source rates honored, unlisted sources dropped") {
    import spark.implicits._
    val df = (0 until 40000).map(i => (s"src${i % 4}", i.toLong)).toDF("source", "doc_id")
    val mixed = Sampling.trainingMix(df, "source", "doc_id",
      Map("src0" -> 1.0, "src1" -> 0.5, "src3" -> 0.0))
    val bySrc = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == 10000L)                 // rate 1.0 keeps all
    assert(math.abs(bySrc("src1") - 5000) < 400)    // rate 0.5
    assert(!bySrc.contains("src2") && !bySrc.contains("src3")) // unlisted/zero dropped
  }

  test("portable split: complete, near fractions, JVM replay matches") {
    import spark.implicits._
    val df = (0L until 50000L).toDF("k")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = df.withColumn("s", Sampling.portableSplit(col("k"), fr))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sizes = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes.values.sum == 50000)
    assert(math.abs(sizes("train") - 40000) < 800)
    // plain-JVM replay of the LCG — what any other engine would compute
    val m = 2147483648L
    def lcg(x: Long): Long = (x * 1103515245L + 12345L) % m
    (0L until 50000L).foreach { k =>
      val x2 = lcg(lcg(k % m))
      val expect =
        if (x2 < (0.8 * m).toLong) "train"
        else if (x2 < (0.9 * m).toLong) "val" else "test"
      assert(got(k) == expect, s"k=$k")
    }
  }

  test("sample composed with split stays unbiased (default seeds are decorrelated)") {
    import spark.implicits._
    val df = (0 until 50000).map(_.toString).toDF("k")
    // rate-0.3 sample, then default split: under SAME seeds every sampled
    // key had u < 0.3 < 0.8 and 100% would land in train
    val splits = Sampling.hashSample(df, "k", 0.3)
      .withColumn("s", Sampling.hashSplit(col("k"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = splits.values.sum
    assert(splits.keySet == Set("train", "val", "test"), s"buckets drained: $splits")
    assert(math.abs(splits("train").toDouble / total - 0.8) < 0.02, s"$splits")
    assert(math.abs(splits("val").toDouble / total - 0.1) < 0.02, s"$splits")
  }

  test("per-group cap: binds at cap, partition-invariant, small groups untouched") {
    import spark.implicits._
    // group sizes 5 (under cap), 40, 400 (heavily over cap)
    val rows = (0 until 5).map(i => ("small", i.toLong)) ++
      (100 until 140).map(i => ("mid", i.toLong)) ++
      (1000 until 1400).map(i => ("big", i.toLong))
    val df = rows.toDF("src", "id")
    val cap = 10
    val a = Sampling.capPerGroup(df.repartition(3), "src", col("id"), cap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = Sampling.capPerGroup(df.repartition(13), "src", col("id"), cap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b, "kept set depends on partitioning")
    val sizes = a.groupBy(_._1).view.mapValues(_.size).toMap
    assert(sizes == Map("small" -> 5, "mid" -> cap, "big" -> cap))
    // under-cap groups keep EVERY row, not a sample
    assert((0 until 5).forall(i => a.contains(("small", i.toLong))))
  }

  test("relative filter: per-group quantile thresholds, groups with distinct scales") {
    import spark.implicits._
    // group a: scores 0..99; group b: scores 1000..1099 — an absolute
    // threshold keeping a's top 75% would keep ALL of b
    val df = ((0 until 100).map(i => ("a", i.toDouble)) ++
      (0 until 100).map(i => ("b", 1000.0 + i))).toDF("g", "score")
    val kept = Sampling.relativeFilter(df, "g", "score", 0.25)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val byG = kept.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // p25 of 0..99 (percentile_cont) = 24.75 -> keeps 25..99
    assert(byG("a").size == 75 && byG("a").min == 25.0)
    assert(byG("b").size == 75 && byG("b").min == 1025.0)
  }

  test("weighted replicate: floor copies + deterministic fractional, down-sampling") {
    import spark.implicits._
    val df = (0L until 10000L).map(i => (i, s"src${i % 2}")).toDF("id", "src")
    val out = Sampling.weightedReplicate(df, "id", "src",
      Map("src0" -> 2.5, "src1" -> 0.3))
    val stats = out.groupBy("src")
      .agg(count(lit(1)), countDistinct(col("id")), max(col("copy")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    // src0: every doc kept 2 or 3 times -> n_out ~ 2.5x, all docs present
    val (n0, d0, m0) = stats("src0")
    assert(d0 == 5000L && m0 == 2 && math.abs(n0 - 12500L) < 300, s"src0: $n0 $d0 $m0")
    // src1: ~30% of docs kept once
    val (n1, d1, m1) = stats("src1")
    assert(n1 == d1 && m1 == 0 && math.abs(n1 - 1500L) < 200, s"src1: $n1 $d1 $m1")
    // determinism: identical output set under different partitioning
    val again = Sampling.weightedReplicate(df.repartition(17), "id", "src",
      Map("src0" -> 2.5, "src1" -> 0.3))
      .groupBy("src").agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == Map("src0" -> n0, "src1" -> n1))
  }

  test("leakage-safe split: no near-dup pair straddles splits; naive split does leak") {
    import spark.implicits._
    // 400 base docs; every 8th doc gets a near-copy (one word changed), and
    // doc ids are adversarially far apart so naive id-keyed splits disagree
    val base = (0 until 400).map { i =>
      val words = (0 until 30).map(w => s"w${(i * 31 + w * 7) % 97}")
      (i.toLong, words.mkString(" "))
    }
    val copies = base.collect { case (id, text) if id % 8 == 0 =>
      (id + 100000L, text.replaceFirst("w", "v"))
    }
    val docs = (base ++ copies).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDupPairs(docs, "text", "doc_id", threshold = 0.6)
      .select(col("id1"), col("id2"))
    val clusters = Dedup.connectedComponents(pairs)
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val split = Sampling.leakageSafeSplit(docs, "doc_id", clusters, fr)
      .withColumn("naive", Sampling.portableSplit(col("doc_id"), fr))
    val audit = pairs
      .join(split.select(col("doc_id").as("id1"), col("split").as("s1"),
        col("naive").as("n1")), "id1")
      .join(split.select(col("doc_id").as("id2"), col("split").as("s2"),
        col("naive").as("n2")), "id2")
      .agg(count(lit(1)), sum(when(col("s1") =!= col("s2"), 1).otherwise(0)),
        sum(when(col("n1") =!= col("n2"), 1).otherwise(0)))
      .collect().head
    assert(audit.getLong(0) >= 40, s"pair generation broke: ${audit.getLong(0)}")
    assert(audit.getLong(1) == 0L, "leakage-safe split leaked")
    assert(audit.getLong(2) > 0L, "scenario too easy: naive split did not leak")
    // every document still assigned exactly once
    assert(split.count() == docs.count())
  }

  test("epoch rank: bijective per epoch, epochs decorrelated, JVM-replayable") {
    import spark.implicits._
    val n = 200000L
    val df = spark.range(n).toDF("id")
    def ranks(epoch: Int): Array[Long] =
      df.select(Sampling.epochRank(col("id"), epoch).as("r"))
        .collect().map(_.getLong(0))
    val r0 = ranks(0)
    val r1 = ranks(1)
    assert(r0.distinct.length == n && r1.distinct.length == n) // injective
    assert(r0.forall(r => r >= 0 && r < 2147483647L))
    // epochs produce genuinely different orders: almost no key keeps its rank
    val same = r0.zip(r1).count { case (a, b) => a == b }
    assert(same <= 1, s"$same keys kept their rank across epochs")
    // pure-arithmetic replay in plain Scala (what the DuckDB oracle does)
    val m = 2147483647L
    def replay(id: Long, e: Long): Long =
      ((id + e * 1013904223L) % m) * 48271L % m * 69621L % m
    (0L until 1000L).foreach { id =>
      assert(r0(id.toInt) == replay(id, 0) && r1(id.toInt) == replay(id, 1))
    }
  }

  test("epoch shuffle: range-partitioned, sorted within partitions, total") {
    import spark.implicits._
    val df = spark.range(20000).toDF("doc_id")
    val out = Sampling.epochShuffle(df, "doc_id", epoch = 3, nShards = 8)
    // per-partition: sorted by rank, and partition rank ranges are disjoint
    val parts = out.select(spark_partition_id().as("p"), col("_epoch_rank"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(parts.length == 20000)
    val byPart = parts.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    byPart.values.foreach(rs => assert(rs == rs.sorted))
    val spans = byPart.toSeq.sortBy(_._1).map { case (p, rs) => (p, rs.min, rs.max) }
    spans.sliding(2).foreach {
      case Seq((_, _, hi), (_, lo, _)) => assert(hi <= lo, "partition ranges overlap")
      case _ =>
    }
  }
}
