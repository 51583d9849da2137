package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling for training-data composition.
  *
  * Everything is keyed on content/id hashes, never RNG state: the same row
  * always makes the same decision regardless of partitioning, retries, or
  * cluster size — the property training-data pipelines need for exact
  * reproducibility and for consistent train/test splits across reruns.
  */
object Sampling {

  /** Keep a row iff xxhash64(key, seed) falls under `rate` of the hash
    * space. Deterministic, partition-invariant, O(1) per row, no shuffle.
    */
  def hashSampleCond(key: Column, rate: Double, seed: Long = 42L): Column = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    // map hash to [0,1): shift to non-negative then scale
    val u = (shiftrightunsigned(xxhash64(key, lit(seed)), 11)).cast("double") / lit((1L << 53).toDouble)
    u < lit(rate)
  }

  def hashSample(df: DataFrame, keyCol: String, rate: Double, seed: Long = 42L): DataFrame =
    df.filter(hashSampleCond(col(keyCol), rate, seed))

  /** Engine-portable TABLESAMPLE: keep a row iff a two-round LCG scramble of
    * the key lands under `rate` of the 2^31 space. Spark's native
    * `TABLESAMPLE` / `df.sample` draw from a partition-seeded RNG, so the
    * selected rows change with partitioning and cannot be replayed by
    * another engine; this variant is pure int64 arithmetic (`%`, `*`, `+`
    * on non-negative values), so any ANSI SQL engine reproduces the exact
    * row set — the property needed for cross-engine audits of a sampled
    * corpus. O(1) per row, no shuffle, folded into the scan filter.
    *
    * Intermediates stay under 2^31 * 1103515245 < 2^62: no int64 overflow
    * even under ANSI mode.
    */
  def portableSampleCond(key: Column, rate: Double): Column = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    val m = 2147483648L // 2^31
    val x0 = pmod(key.cast("long"), lit(m))
    val x1 = pmod(x0 * lit(1103515245L) + lit(12345L), lit(m))
    val x2 = pmod(x1 * lit(1103515245L) + lit(12345L), lit(m))
    x2 < lit((rate * m).toLong)
  }

  def portableSample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(portableSampleCond(col(keyCol), rate))

  /** Deterministic train/validation/test split: assigns each key a stable
    * bucket from fractions that must sum to <= 1 (remainder -> last bucket).
    *
    * The default seed deliberately differs from [[hashSampleCond]] /
    * [[trainingMix]]'s: both threshold the same uniform u(key, seed), so a
    * sample composed with a SAME-seed split keeps only low-u keys and
    * drains every split bucket but the first (a rate-0.5 source would come
    * out 100% train). Distinct xxhash64 seeds give independent streams;
    * keep them distinct if overriding.
    */
  def hashSplit(key: Column, fractions: Seq[(String, Double)], seed: Long = 9177L): Column = {
    require(fractions.nonEmpty && fractions.map(_._2).sum <= 1.0 + 1e-9)
    val u = (shiftrightunsigned(xxhash64(key, lit(seed)), 11)).cast("double") / lit((1L << 53).toDouble)
    val cum = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    fractions.zip(cum).foldRight(lit(fractions.last._1)) {
      case (((name, _), hi), acc) => when(u < hi, lit(name)).otherwise(acc)
    }
  }

  /** Engine-portable deterministic split (the [[portableSampleCond]] LCG
    * scramble with bucket thresholds instead of one cutoff): any ANSI SQL
    * engine replays the exact assignment with integer arithmetic, so a
    * split can be audited or re-derived outside Spark. Fractions must sum
    * to <= 1; the remainder falls into the last bucket.
    */
  def portableSplit(key: Column, fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty && fractions.map(_._2).sum <= 1.0 + 1e-9)
    val m = 2147483648L // 2^31
    val x0 = pmod(key.cast("long"), lit(m))
    val x1 = pmod(x0 * lit(1103515245L) + lit(12345L), lit(m))
    val x2 = pmod(x1 * lit(1103515245L) + lit(12345L), lit(m))
    val cum = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    fractions.zip(cum).foldRight(lit(fractions.last._1)) {
      case (((name, _), hi), acc) => when(x2 < lit((hi * m).toLong), lit(name)).otherwise(acc)
    }
  }

  /** Leakage-safe train/val/test split: the split decision keys on the
    * DUPLICATE-CLUSTER representative instead of the document, so two
    * near-duplicate documents can never land in different splits — the
    * train/test contamination a naive per-document split bakes in (a test
    * document whose near-copy sits in train is a leaked answer, and at
    * 100 TB web scale a large share of documents have near-copies).
    *
    * `clusters` is (id, cluster) from [[Dedup.connectedComponents]] over
    * any near-dup pair source (minhash LSH, exact Jaccard, simhash);
    * cluster labels there are the component's minimum id, so the
    * representative is deterministic. Unclustered documents are their own
    * representative. Scale shape: one broadcast-or-shuffle left join
    * against the (small — proportional to duplicates, not corpus) cluster
    * map, then the map-only portable split on the representative.
    */
  def leakageSafeSplit(
      docs: DataFrame, idCol: String, clusters: DataFrame,
      fractions: Seq[(String, Double)]): DataFrame =
    docs.join(clusters, docs(idCol) === clusters("id"), "left")
      .withColumn("split",
        portableSplit(coalesce(col("cluster"), docs(idCol)), fractions))
      .drop("id", "cluster")

  /** Per-source document cap (crawl-frequency winsorization): keep at most
    * `maxPerGroup` rows per group, chosen by the engine-portable LCG
    * scramble of the row key — not arrival order (which over-samples
    * whatever the crawler fetched first) and not RNG state (which changes
    * per run). A handful of mega-domains otherwise dominate a web corpus;
    * capping them is the standard mix-balancing step before training.
    *
    * Scale shape: one shuffle on the group key. The rank filter is a
    * `row_number <= k` over the window, which Catalyst rewrites to a
    * map-side WindowGroupLimit: each input partition forwards at most
    * `maxPerGroup` candidate rows per group BEFORE the exchange, so a
    * 100M-doc domain ships `maxPerGroup * numPartitions` rows, not 100M.
    * The ordering key is (scramble, key): unique, so the kept set is exact
    * and replayable by any engine's ROW_NUMBER.
    */
  def capPerGroup(
      df: DataFrame, groupCol: String, key: Column,
      maxPerGroup: Int, seed: Long = 1013904223L): DataFrame = {
    require(maxPerGroup > 0, s"maxPerGroup must be positive, got $maxPerGroup")
    require(seed >= 0, s"seed must be non-negative, got $seed")
    // the cap must NOT rank by the same scramble family portableSplit
    // thresholds on: two rounds of an LCG compose to an AFFINE map mod
    // 2^31, so any same-modulus variant (even seeded) is a constant
    // rotation of the split's order — composing cap -> split then drains
    // whole split buckets (found via tx_curation_pipeline, which came out
    // all-train). MINSTD over the DIFFERENT modulus 2^31-1 breaks the
    // affine relation while staying pure portable integer arithmetic.
    val m = 2147483647L // 2^31 - 1 (prime)
    val x0 = pmod(key.cast("long") + lit(seed), lit(m))
    val x1 = pmod(x0 * lit(48271L), lit(m))
    val x2 = pmod(x1 * lit(48271L), lit(m))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(x2, key)
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= maxPerGroup)
      .drop("_rk")
  }

  /** Relative (within-group) quality filter: keep rows whose score is at
    * or above their OWN group's `q`-quantile — "drop the worst quartile of
    * each language", the filter that absolute thresholds get wrong when
    * score distributions differ by group (a cutoff tuned on English text
    * would empty a lower-scoring language entirely). One shuffle on the
    * group key; the exact per-group percentile is a window aggregate over
    * it. At 100 TB group-value buffers get large — compute thresholds with
    * the mergeable GK summary instead ([[graft.functions.GraftFunctions
    * .gk_sketch_agg]], rank-error-bounded) and join them back; the exact
    * window is right up to millions of rows per group.
    */
  def relativeFilter(
      df: DataFrame, groupCol: String, scoreCol: String,
      quantile: Double): DataFrame = {
    require(quantile > 0 && quantile < 1, s"quantile in (0,1), got $quantile")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    df.withColumn("_thr", percentile(col(scoreCol), lit(quantile)).over(w))
      .filter(col(scoreCol) >= col("_thr"))
      .drop("_thr")
  }

  /** Deterministic weighted replication (temperature up/down-sampling): each
    * row is emitted `floor(weight)` times plus one more with probability
    * `frac(weight)` — decided by the portable LCG scramble of the key, so
    * the output corpus is identical across runs, partitionings, and
    * engines. Weights >= 1 up-sample (epoch mixing for high-quality
    * sources), weights < 1 down-sample; a copy index column distinguishes
    * replicas for downstream shuffling. Map-only: no shuffle, output size
    * ~= sum(weights per row).
    */
  def weightedReplicate(
      df: DataFrame, keyCol: String, sourceCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(w => w >= 0 && w <= 100), "weights in [0,100]")
    val wCol = weights.foldLeft(lit(0.0)) { case (acc, (src, w)) =>
      when(col(sourceCol) === src, lit(w)).otherwise(acc)
    }
    val m = 2147483648L // 2^31
    val x0 = pmod(col(keyCol).cast("long"), lit(m))
    val x1 = pmod(x0 * lit(1103515245L) + lit(12345L), lit(m))
    val x2 = pmod(x1 * lit(1103515245L) + lit(12345L), lit(m))
    val nCopies = (floor(wCol) +
      when(x2 < floor((wCol - floor(wCol)) * m).cast("long"), 1L).otherwise(0L))
      .cast("int")
    df.withColumn("_n", nCopies)
      .filter(col("_n") > 0)
      .withColumn("copy", explode(sequence(lit(0), col("_n") - 1)))
      .drop("_n")
  }

  /** Weighted training mix: per-source sampling rates composed into one
    * corpus, tagged with the mix weight used. `rates` maps source-column
    * value -> keep rate; unlisted sources are dropped.
    */
  def trainingMix(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      rates: Map[String, Double],
      seed: Long = 42L): DataFrame = {
    val rateCol = rates.foldLeft(lit(0.0)) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, lit(r)).otherwise(acc)
    }
    val u = (shiftrightunsigned(xxhash64(col(keyCol), lit(seed)), 11)).cast("double") / lit((1L << 53).toDouble)
    df.withColumn("_rate", rateCol)
      .filter(col("_rate") > 0 && u < col("_rate"))
      .withColumn("mix_rate", col("_rate"))
      .drop("_rate")
  }
  /** Rendezvous (highest-random-weight) shard assignment: the shard of
    * `key` is `argmax over s in [0, nShards) of md5(key || ':' || s)`.
    *
    * Why HRW instead of `hash(key) % n` at 100 TB: changing the shard
    * count from n to n+1 reassigns ONLY the keys whose new shard wins the
    * argmax — an expected 1/(n+1) of the corpus — while modulo reshuffles
    * (n-1)/n of every shard. Elastic resharding (adding output writers,
    * growing a bucketed layout) becomes an incremental move of one shard's
    * worth of data, not a full rewrite. A key's move target under n+1 is
    * always the NEW shard, so the delta is computable shard-locally.
    *
    * md5 (not xxhash) on purpose: every engine has it, so the assignment is
    * engine-portable and the DuckDB oracle replays it verbatim (hex strings
    * compare identically under binary collation). Cost is nShards hashes
    * per key -- inherent to HRW; cap nShards at 4096 and use a two-level
    * scheme (HRW over shard groups, then within) beyond that.
    */
  def rendezvousShard(key: Column, nShards: Int): Column = {
    require(nShards >= 1 && nShards <= 4096,
      s"rendezvousShard: nShards must be in [1, 4096], got $nShards")
    array_max(transform(sequence(lit(0), lit(nShards - 1)),
        s => struct(
          md5(concat(key.cast("string"), lit(":"), s.cast("string"))).as("h"),
          s.as("shard"))))
      .getField("shard")
  }

  /** The INGEST-PATH rendezvous variant: same HRW structure and elasticity
    * guarantees as [[rendezvousShard]], but one xxhash64 of the key plus one
    * long-mix per shard instead of nShards md5 rounds over concatenated
    * strings — [[graft.functions.HrwShard]] documents the scheme and the
    * deliberate md5/xxh64 split (portability vs throughput). The two
    * variants produce different (both valid) assignments.
    */
  def rendezvousShardFast(key: Column, nShards: Int, seed: Long = 0L): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.HrwShard(
        org.apache.spark.sql.graftshim.GraftShims.expression(key.cast("string")),
        nShards, seed))

  /** Deterministic, engine-portable EPOCH-SHUFFLE rank: a bijection on
    * [0, 2^31-1) per epoch, built from two multiplicative rounds mod the
    * Mersenne prime 2^31-1 (multipliers 48271 = MINSTD and 69621, both
    * coprime to the modulus, so each round is a permutation) over an
    * epoch-salted key. Training runs need every epoch to visit the corpus
    * in a DIFFERENT pseudorandom order that any engine (and any re-run)
    * reproduces exactly — Spark's `rand`/`shuffle` are partition-seeded
    * and irreproducible across layouts, this is pure int64 arithmetic a
    * DuckDB oracle replays verbatim. Intermediates stay under 2^48: no
    * overflow even under ANSI mode.
    *
    * Deliberately a different scramble family than [[portableSampleCond]]
    * (additive LCG mod 2^31) and [[capPerGroup]]'s ranking — composing
    * same-family scrambles correlated once before (see capPerGroup's
    * MINSTD note); the epoch salt keeps epochs decorrelated from each
    * other for the same reason.
    */
  def epochRank(key: Column, epoch: Int): Column = {
    require(epoch >= 0, s"epochRank: epoch must be >= 0, got $epoch")
    val m = 2147483647L // 2^31 - 1, prime
    val x0 = pmod(key.cast("long") + lit(epoch.toLong * 1013904223L), lit(m))
    val x1 = pmod(x0 * lit(48271L), lit(m))
    pmod(x1 * lit(69621L), lit(m))
  }

  /** Materialize one epoch's training order: rank every row with
    * [[epochRank]], range-partition on the rank, sort within partitions —
    * the [[Layout.sortedExport]] shape, so the epoch's global order is the
    * concatenation of output files. ONE exchange per epoch regardless of
    * corpus size; the rank is computed, never stored, so no epoch state
    * exists anywhere. Readers that only need per-shard locality can skip
    * the sort and range-partition alone.
    */
  def epochShuffle(df: DataFrame, keyCol: String, epoch: Int,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"epochShuffle: nShards must be >= 1, got $nShards")
    df.withColumn("_epoch_rank", epochRank(col(keyCol), epoch))
      .repartitionByRange(nShards, col("_epoch_rank"))
      .sortWithinPartitions(col("_epoch_rank"))
  }
}
