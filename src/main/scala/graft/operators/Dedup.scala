package graft.operators

import graft.functions.{MinHashSignature, ShingleHashes, SimHash64, SortedLongJaccard}
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design notes (100 TB):
  *  - exact dedup groups on fixed-width digests (xxhash64 + md5), never on
  *    raw text — the shuffle carries 24 bytes per doc instead of documents.
  *  - MinHash-LSH is the standard shingle->signature->band->bucket-join
  *    pipeline: signatures are pure map work; the only shuffle is the band
  *    join, keyed by (band index, band hash), whose fan-out is bounded by
  *    bucket sizes. Oversized buckets (degenerate content) are capped to
  *    keep the candidate join from exploding on skew.
  *  - SimHash pigeonholes 64 bits into 4 x 16-bit chunks: pairs within
  *    Hamming distance 3 must share at least one chunk, so candidates come
  *    from 4 equi-joins, verified with bit_count(a XOR b).
  */
object Dedup {

  def minhashSignature(text: Column, numHashes: Int = 64, shingleSize: Int = 3): Column =
    GraftShims.column(MinHashSignature(GraftShims.expression(text), numHashes, shingleSize))

  def simhash64(text: Column): Column =
    GraftShims.column(SimHash64(GraftShims.expression(text)))

  def shingleHashes(text: Column, shingleSize: Int = 3): Column =
    GraftShims.column(ShingleHashes(GraftShims.expression(text), shingleSize))

  def sortedJaccard(a: Column, b: Column): Column =
    GraftShims.column(SortedLongJaccard(GraftShims.expression(a), GraftShims.expression(b)))

  /** Exact-duplicate statistics: groups by content digest. */
  def exactDupStats(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), xxhash64(col(textCol)).as("h"), md5(col(textCol)).as("m"))
      .groupBy(col("h"), col("m"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))
      .agg(
        count(lit(1)).as("n_distinct_texts"),
        sum(col("n_copies")).as("n_docs"),
        sum(col("n_copies") - 1).as("n_dup_docs"))

  /** Exact dedup keeping the smallest id per distinct text. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = df.select(col(idCol).as("_id"), xxhash64(col(textCol)).as("h"), md5(col(textCol)).as("m"))
      .groupBy(col("h"), col("m")).agg(min(col("_id")).as("_keep"))
      .select(col("_keep"))
    df.join(keep, df(idCol) === keep("_keep"), "left_semi")
  }

  /** MinHash-LSH candidate pairs with exact Jaccard verification.
    *
    * @param bands      number of LSH bands (numHashes must divide evenly)
    * @param threshold  keep pairs with exact shingle-set Jaccard >= threshold
    * @param maxBucket  drop degenerate buckets larger than this (skew guard)
    */
  def minhashNearDupPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      threshold: Double = 0.8,
      maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, s"bands=$bands must divide numHashes=$numHashes")
    val rows = numHashes / bands

    val sigs = df.select(
      col(idCol).as("id"),
      minhashSignature(col(textCol), numHashes, shingleSize).as("sig"))

    // band hash: builtin hash() over the band's slice of the signature
    val banded = sigs.select(
        col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * rows + 1, lit(rows))))).as(Seq("band", "bh")))

    // skew guard: cap bucket size before the self-join
    val bucketed = banded
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bh"))))
      .filter(col("bsz") <= maxBucket)
      .drop("bsz")

    val l = bucketed.alias("l")
    val r = bucketed.alias("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"))
      .distinct()

    // exact verification on hashed shingle sets: sorted long arrays +
    // merge-count Jaccard (native expression — the per-candidate hot path).
    // NOT checkpointed (r14 A/B): materializing it measured slower
    // (dd_neardedup_keep +0.26 s) — the broadcast-join verify recomputes
    // the shingles cheaper than the checkpoint costs here.
    val sh = df.select(col(idCol).as("vid"),
      shingleHashes(col(textCol), shingleSize).as("sh"))
    candidates
      .join(sh.withColumnRenamed("vid", "id1").withColumnRenamed("sh", "sh1"), "id1")
      .join(sh.withColumnRenamed("vid", "id2").withColumnRenamed("sh", "sh2"), "id2")
      .withColumn("jaccard", sortedJaccard(col("sh1"), col("sh2")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Cross-corpus MinHash-LSH near-dup pairs: candidates only BETWEEN the
    * two corpora (never within one) — the incremental-pipeline shape, where
    * a new batch is deduped against the existing corpus without re-pairing
    * the corpus with itself. Same banding/verification as
    * [[minhashNearDupPairs]]; the bucket join is A-bands against B-bands, so
    * candidate cost is |A ∩ B buckets|, and the (typically small) new batch
    * side broadcasts.
    *
    * @return (a_id, b_id, jaccard) with exact Jaccard >= threshold
    */
  def minhashCrossDupPairs(
      corpusA: DataFrame,
      corpusB: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      threshold: Double = 0.8,
      maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, s"bands=$bands must divide numHashes=$numHashes")
    val rows = numHashes / bands
    def banded(df: DataFrame, side: String) =
      df.select(col(idCol).as(s"${side}_id"),
          minhashSignature(col(textCol), numHashes, shingleSize).as("sig"))
        .select(col(s"${side}_id"),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            b => hash(slice(col("sig"), b * rows + 1, lit(rows))))).as(Seq("band", "bh")))
    val a = banded(corpusA, "a")
    // skew guard on the (large) corpus side only; degenerate buckets carry
    // no discriminative signal either way
    val aCapped = a
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bh"))))
      .filter(col("bsz") <= maxBucket)
      .drop("bsz")
    val b = banded(corpusB, "b")
    val candidates = aCapped.join(b, Seq("band", "bh"))
      .select(col("a_id"), col("b_id")).distinct()
    def sh(df: DataFrame, side: String) =
      df.select(col(idCol).as(s"${side}_id"), shingleHashes(col(textCol), shingleSize).as(s"sh_$side"))
    candidates
      .join(sh(corpusA, "a"), "a_id")
      .join(sh(corpusB, "b"), "b_id")
      .withColumn("jaccard", sortedJaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Incremental dedup: rows of `newBatch` that are NOT near-duplicates of
    * anything in `corpus` (exact dups included — Jaccard 1.0 >= threshold).
    */
  def dedupAgainst(
      corpus: DataFrame,
      newBatch: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double = 0.8): DataFrame = {
    val dupIds = minhashCrossDupPairs(corpus, newBatch, textCol, idCol, threshold = threshold)
      .select(col("b_id").as("_dup"))
    newBatch.join(dupIds, newBatch(idCol) === col("_dup"), "left_anti")
  }

  /** SimHash near-dup pairs: 4x16-bit pigeonhole blocking + Hamming verify.
    *
    * @param maxBucket skew guard: chunk buckets larger than this are dropped
    *                  before the self-join. Boilerplate/empty documents share
    *                  simhash chunks, and an uncapped hot chunk value turns
    *                  the blocking join quadratic; capped buckets carry no
    *                  discriminative signal anyway (same trade-off as the
    *                  minhash band cap above).
    */
  def simhashNearDupPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame =
    hashNearDupPairs(
      df.select(col(idCol), simhash64(col(textCol)).as("_sh64")), "_sh64", idCol,
      maxHamming, maxBucket)

  /** Near-dup pairs over a PRECOMPUTED 64-bit hash column — the same
    * 4x16-bit pigeonhole blocking + Hamming verify as
    * [[simhashNearDupPairs]], exposed for hashes that don't come from text:
    * image perceptual hashes (`Multimodal.decodeImages`' ahash), audio
    * fingerprints, any locality-preserving 64-bit signature. Pigeonhole
    * guarantee: hamming <= 3 pairs agree on at least one 16-bit chunk, so
    * candidates come from an equi-join, never an all-pairs scan.
    */
  def hashNearDupPairs(
      df: DataFrame,
      hashCol: String,
      idCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    val hashed = df.select(col(idCol).as("id"), col(hashCol).cast("long").as("sh"))
    val chunked = hashed.select(col("id"), col("sh"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("sh"), c * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("chunk", "ck")))
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("chunk"), col("ck"))))
      .filter(col("bsz") <= maxBucket)
      .drop("bsz")
    val l = chunked.alias("l")
    val r = chunked.alias("r")
    l.join(r,
        col("l.chunk") === col("r.chunk") && col("l.ck") === col("r.ck") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"),
        col("l.sh").as("sh1"), col("r.sh").as("sh2"))
      .distinct()
      .withColumn("hamming", bit_count(col("sh1").bitwiseXOR(col("sh2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
  }

  /** Connected components over a near-dup pair list: assigns every node the
    * minimum id in its component (min-label propagation). Near-dup clusters
    * have tiny diameter, so convergence takes a handful of rounds; `maxIters`
    * caps the worst case. Per round: one shuffle (the groupBy-min). At very
    * large scale swap in large-star/small-star; min-propagation is the same
    * fixed point with more rounds on long chains.
    *
    * @param pairs DataFrame with columns (id1, id2), id1 < id2
    * @return DataFrame (id, cluster) for every id appearing in `pairs`
    */
  /** @param smallGraphLimit driver/distributed crossover in edges; the
    *        default keeps the collect under ~16 MB. Tests lower it to force
    *        the distributed path on small fixtures.
    * @param materialized caller promises `pairs` is already pinned
    *        (localCheckpoint/persist), so the internal materialization —
    *        which would copy the blocks through one more job — is skipped.
    *        The size probe and collect/iteration still read the caller's
    *        blocks, never the expensive pair-generation lineage.
    */
  def connectedComponents(
      pairs: DataFrame,
      maxIters: Int = 10,
      smallGraphLimit: Long = 1000000L,
      materialized: Boolean = false): DataFrame = {
    // Hybrid: near-dup pair graphs are tiny relative to the corpus (pairs ~=
    // number of duplicates). Up to `smallGraphLimit` edges, a driver-side
    // union-find in one collect beats N rounds of distributed jobs; past it,
    // fall through to distributed min-label propagation.
    val spark = pairs.sparkSession
    import spark.implicits._
    // materialize the edge list once: pair generation (LSH + verify) is the
    // expensive upstream, and both the size probe and the collect/iteration
    // below would otherwise recompute it. A global limit+collect would be
    // worse still — it forces the pipeline into one partition.
    val sel = pairs.select(col("id1").cast("long"), col("id2").cast("long"))
    val mat = if (materialized) sel else sel.localCheckpoint(true)
    val edgeCount = mat.count()
    if (edgeCount <= smallGraphLimit) {
      val es = mat.as[(Long, Long)].collect()
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val out = parent.keys.map(id => (id, find(id))).toSeq
      return spark.createDataset(out).toDF("id", "cluster")
    }
    distributedComponents(mat.toDF("id1", "id2"), maxIters)
  }

  /** Distributed min-label propagation (the >1M-edge path). */
  private def distributedComponents(pairs: DataFrame, maxIters: Int): DataFrame = {
    val edges = pairs.select(col("id1").as("a"), col("id2").as("b"))
      .union(pairs.select(col("id2").as("a"), col("id1").as("b")))
      .cache()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("cluster", col("id"))
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // each node adopts min(own label, neighbors' labels)
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "b2"), col("b") === col("b2"))
        .groupBy(col("a").as("id")).agg(min(col("cluster")).as("nmin"))
      // localCheckpoint truncates the lineage — iterative self-joins
      // otherwise grow the logical plan exponentially per round
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"))
        .localCheckpoint(true)
      val changed = next.alias("n")
        .join(labels.alias("o"), col("n.id") === col("o.id"))
        .filter(col("n.cluster") =!= col("o.cluster")).limit(1).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    edges.unpersist()
    labels
  }

  /** Full near-dup dedup: MinHash-LSH pairs -> connected components -> keep
    * the smallest id per cluster (singletons kept implicitly). Returns the
    * kept rows of `df`.
    */
  def nearDedup(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double = 0.8,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3): DataFrame = {
    val pairs = minhashNearDupPairs(df, textCol, idCol, numHashes, bands, shingleSize, threshold)
    val clusters = connectedComponents(pairs)
    val drop = clusters.filter(col("id") =!= col("cluster")).select(col("id").as("_drop"))
    df.join(drop, df(idCol) === col("_drop"), "left_anti")
  }

  /** [[nearDedup]] with an explicit representative policy: within each
    * near-dup cluster keep the row MAXIMIZING `score` (ties broken by
    * lowest id) instead of the lowest-id row — the realistic curation
    * choice (keep the longest / highest-quality / most recent copy).
    *
    * Scale shape: identical LSH + connected-components machinery; the
    * representative election windows ONLY the dup-involved rows (the
    * cluster membership set), so the extra shuffle is proportional to
    * duplicates found, not corpus size. Untouched rows never move.
    */
  def nearDedupKeepBest(
      df: DataFrame,
      textCol: String,
      idCol: String,
      score: Column,
      threshold: Double = 0.8,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3): DataFrame = {
    val pairs = minhashNearDupPairs(df, textCol, idCol, numHashes, bands, shingleSize, threshold)
    val clusters = connectedComponents(pairs)
    val members = df.withColumn("_score", score)
      .join(clusters, df(idCol) === clusters("id"), "inner")
      .select(col("id"), col("cluster"), col("_score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(col("_score").desc, col("id"))
    val keep = members.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).select(col("id").as("_keep"))
    val drop = clusters.join(keep, clusters("id") === col("_keep"), "left_anti")
      .select(col("id").as("_drop"))
    df.join(drop, df(idCol) === col("_drop"), "left_anti")
  }

  /** Media dedup on perceptual hashes: [[hashNearDupPairs]] blocking over a
    * precomputed 64-bit hash (image ahash, audio fingerprint) -> connected
    * components -> keep the smallest id per cluster. Returns EVERY input
    * row as (id, cluster, kept) — cluster is the representative id
    * (singletons represent themselves) — so the caller can either filter
    * `kept` or audit the groups.
    *
    * Scale shape: the hash column is all that moves (media bytes were
    * projected away at decode); candidates come from the 16-bit-chunk
    * equi-join; the final membership join is dup-rows-only against the
    * full id list — shuffle proportional to duplicates found plus one
    * pass of 8-byte hashes.
    */
  def perceptualDedup(
      df: DataFrame,
      hashCol: String,
      idCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    // (id, hash) is 16 bytes/row — checkpoint the projection so the
    // expensive upstream (the media DECODE that produced the hashes) runs
    // once. Before (r14 profile) the pair blocking and the membership join
    // each recomputed the full decode lineage; this makes the scaladoc's
    // "the hash column is all that moves" literally true in the plan.
    val hashes = df.select(col(idCol).cast("long").as(idCol),
        col(hashCol).as(hashCol))
      .localCheckpoint()
    val pairs = hashNearDupPairs(hashes, hashCol, idCol, maxHamming, maxBucket)
    val clusters = connectedComponents(pairs)
    hashes.select(col(idCol).cast("long").as("id"))
      .join(clusters.withColumnRenamed("cluster", "_cl"), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("_cl"), col("id")).as("cluster"),
        (coalesce(col("_cl"), col("id")) === col("id")).as("kept"))
  }

  /** Corpus-level line dedup (the CCNet/RefinedWeb boilerplate-removal
    * step): drop every line that occurs in at least `minDocFreq` distinct
    * documents, then reassemble each document from its surviving lines in
    * their original order.
    *
    * Output: (idCol, clean_text, n_lines, n_dup_lines). Documents whose
    * lines are all boilerplate survive with an empty `clean_text`; documents
    * with no non-blank lines drop out.
    *
    * Scale shape: line frequencies are a partial-aggregated count on the
    * 8-byte line hash (hot boilerplate lines combine map-side before the
    * exchange), and only hashes at/above `minDocFreq` — the boilerplate set,
    * tiny relative to the corpus — come back for the flag join. Lines cross
    * the wire once for reassembly, keyed by document id, so no stage ever
    * shuffles more than the exploded corpus itself. Frequency counting keys
    * on xxhash64 of the (optionally normalized) line; a 64-bit collision
    * mislabels a line, which at boilerplate scales is vanishingly rare.
    *
    * @param delimiter  split regex AND rejoin separator (default newline)
    * @param minDocFreq lines in >= this many distinct docs are dropped
    * @param normalize  lowercase+trim lines before hashing (raw bytes if false)
    */
  def lineDedup(
      df: DataFrame, idCol: String, textCol: String,
      delimiter: String = "\n",
      minDocFreq: Int = 2,
      normalize: Boolean = true): DataFrame = {
    val lines = df
      .select(col(idCol).as("_id"),
        posexplode(split(col(textCol), delimiter)).as(Seq("_pos", "_line")))
      .filter(length(trim(col("_line"))) > 0)
      .withColumn("_h",
        xxhash64(if (normalize) lower(trim(col("_line"))) else col("_line")))
    val hot = lines.groupBy(col("_h"))
      .agg(countDistinct(col("_id")).as("_df"))
      .filter(col("_df") >= minDocFreq)
      .select(col("_h"), lit(true).as("_dup"))
    lines.join(hot, Seq("_h"), "left")
      .groupBy(col("_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        count(col("_dup")).as("n_dup_lines"),
        concat_ws(delimiter,
          transform(
            sort_array(collect_list(
              when(col("_dup").isNull, struct(col("_pos"), col("_line"))))),
            x => x.getField("_line"))).as("clean_text"))
      .select(col("_id").as(idCol), col("clean_text"),
        col("n_lines"), col("n_dup_lines"))
  }

  /** EXACT all-pairs Jaccard threshold self-join via prefix filtering
    * (AllPairs/PPJoin family, Bayardo et al. WWW'07) — the deterministic
    * complement to MinHash-LSH: every pair with shingle-set Jaccard >=
    * threshold is returned, no probabilistic recall.
    *
    * Prefix theorem: under ANY global token order, two sets with
    * J(A,B) >= t share at least one token among the first
    * |X| - ceil(t·|X|) + 1 tokens of each side X (pigeonhole on the
    * order-smallest shared token). So candidates come from an equi-join of
    * PREFIX tokens only, then one merge-count verify per distinct pair.
    *
    * Ordering: `freqOrder=true` (default) orders tokens rarest-first by
    * global document frequency — prefixes then hold the most selective
    * tokens, collapsing candidate counts on skewed real corpora at the
    * cost of a doc-frequency aggregate + re-sort; `false` uses the hash
    * order the shingle arrays already arrive in (zero extra passes, more
    * candidates). Results are identical either way.
    */
  def jaccardSelfJoin(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleSize: Int = 3,
      freqOrder: Boolean = true): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    // materialized once (r14): the shingle arrays feed the token explode,
    // BOTH sides of the prefix self-join, and BOTH verify joins — without
    // the checkpoint Catalyst recomputes the shingling per consumer (the
    // r14 profile measured ~4x the shingle CPU in dd_jaccard_join)
    val docs = df.select(col(idCol).as("_id"),
        shingleHashes(col(textCol), shingleSize).as("_sh")) // sorted distinct
      .filter(size(col("_sh")) > 0)
      .localCheckpoint()
    def prefLen(n: Column): Column =
      (n - ceil(lit(threshold) * n) + 1).cast("int")
    val pref =
      if (!freqOrder)
        docs.select(col("_id"),
          explode(slice(col("_sh"), lit(1), prefLen(size(col("_sh"))))).as("_tk"))
      else {
        val toks = docs.select(col("_id"), explode(col("_sh")).as("_tk"))
        val dfreq = toks.groupBy(col("_tk")).agg(count(lit(1)).as("_df"))
        val ordered = toks.join(dfreq, "_tk")
          .groupBy(col("_id"))
          .agg(transform(
            array_sort(collect_list(struct(col("_df"), col("_tk")))),
            x => x.getField("_tk")).as("_ord"))
        ordered.select(col("_id"),
          explode(slice(col("_ord"), lit(1), prefLen(size(col("_ord"))))).as("_tk"))
      }
    val cand = pref.as("x").join(pref.as("y"),
        col("x._tk") === col("y._tk") && col("x._id") < col("y._id"))
      .select(col("x._id").as("_id1"), col("y._id").as("_id2")).distinct()
    cand
      .join(docs.select(col("_id").as("_id1"), col("_sh").as("_s1")), "_id1")
      .join(docs.select(col("_id").as("_id2"), col("_sh").as("_s2")), "_id2")
      .withColumn("_j", sortedJaccard(col("_s1"), col("_s2")))
      .filter(col("_j") >= threshold)
      .select(col("_id1").as("id1"), col("_id2").as("id2"),
        round(col("_j"), 4).as("jaccard"))
  }

  /** Cross-corpus variant of [[jaccardSelfJoin]]: every (A-doc, B-doc)
    * pair with shingle-set Jaccard >= threshold, exact recall. The prefix
    * theorem needs ONE global token order spanning both corpora, so
    * document frequencies are counted over the UNION of the two sides
    * before prefixes are cut. The candidate join is prefix(A) ⋈ prefix(B)
    * on token — between-sides only, never within a side (the self-join
    * case is [[jaccardSelfJoin]]).
    */
  def jaccardCrossJoin(
      corpusA: DataFrame, aId: String, aText: String,
      corpusB: DataFrame, bId: String, bText: String,
      threshold: Double, shingleSize: Int = 3): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    // checkpointed like jaccardSelfJoin's docs: each side feeds its token
    // explode, its prefix cut, and its verify join — one shingle pass per
    // side instead of three
    def docs(df: DataFrame, id: String, text: String) =
      df.select(col(id).as("_id"),
          shingleHashes(col(text), shingleSize).as("_sh"))
        .filter(size(col("_sh")) > 0)
        .localCheckpoint()
    val da = docs(corpusA, aId, aText)
    val db = docs(corpusB, bId, bText)
    def toks(d: DataFrame) = d.select(col("_id"), explode(col("_sh")).as("_tk"))
    // one frequency table over BOTH corpora: the global order must agree
    val dfreq = toks(da).unionByName(toks(db))
      .groupBy(col("_tk")).agg(count(lit(1)).as("_df"))
    def prefLen(n: Column): Column =
      (n - ceil(lit(threshold) * n) + 1).cast("int")
    def prefixes(d: DataFrame) =
      toks(d).join(dfreq, "_tk")
        .groupBy(col("_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("_df"), col("_tk")))),
          x => x.getField("_tk")).as("_ord"))
        .select(col("_id"),
          explode(slice(col("_ord"), lit(1), prefLen(size(col("_ord"))))).as("_tk"))
    val cand = prefixes(da).as("x").join(prefixes(db).as("y"), Seq("_tk"))
      .select(col("x._id").as("_ida"), col("y._id").as("_idb")).distinct()
    cand
      .join(da.select(col("_id").as("_ida"), col("_sh").as("_s1")), "_ida")
      .join(db.select(col("_id").as("_idb"), col("_sh").as("_s2")), "_idb")
      .withColumn("_j", sortedJaccard(col("_s1"), col("_s2")))
      .filter(col("_j") >= threshold)
      .select(col("_ida").as("a_id"), col("_idb").as("b_id"),
        round(col("_j"), 4).as("jaccard"))
  }

  /** Exact-substring containment pairs: (inner, outer) where inner's FULL
    * text occurs verbatim inside outer's text — quoted snippets, mirrored
    * excerpts, truncated re-posts that near-dup Jaccard misses when the
    * outer doc is much longer than the shared span.
    *
    * Candidate scheme (exact recall, no all-pairs): index each potential
    * container at strided positions 1, 1+s, 1+2s, … with `gram`-char
    * rolling anchors; an inner doc contributes its first `stride` anchor
    * offsets. If inner occurs in outer at any offset p, the first strided
    * container position ≥ p is at most stride-1 chars in, so some inner
    * anchor hash-joins some container anchor whenever
    * len(inner) ≥ gram + stride - 1 (the documented minimum; shorter docs
    * are excluded on BOTH sides so the oracle can replicate the filter).
    * Only 8-byte gram hashes + ids shuffle — text stays columnar until the
    * final verify. Candidates are distinct'd before the contains() check,
    * so a pair sharing many anchors is verified once.
    *
    * @param maxBucket skew guard for web-scale corpora: container anchor
    *   hashes shared by more than this many docs are dropped from the
    *   index. Default keeps every anchor (exact recall); capping trades
    *   recall on boilerplate-only matches for a bounded join, same knob as
    *   the LSH family.
    */
  def substringContainment(
      df: DataFrame, idCol: String, textCol: String,
      gram: Int = 32, stride: Int = 8,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    val minLen = gram + stride - 1
    val docs = df.select(col(idCol).as("_id"), col(textCol).as("_text"),
        length(col(textCol)).as("_len"))
      .filter(col("_len") >= minLen)
    // container index: anchors at strided positions (≈ len/stride rows/doc)
    val contIdx = docs
      .select(col("_id").as("_cid"), col("_len").as("_clen"),
        explode(sequence(lit(1), col("_len") - gram + 1, lit(stride))).as("_p"),
        col("_text"))
      .select(col("_cid"), col("_clen"),
        xxhash64(expr(s"substring(_text, _p, $gram)")).as("_g"))
    val capped =
      if (maxBucket == Int.MaxValue) contIdx
      else {
        import org.apache.spark.sql.expressions.Window
        contIdx
          .withColumn("_bsz",
            approx_count_distinct(col("_cid")).over(Window.partitionBy(col("_g"))))
          .filter(col("_bsz") <= maxBucket).drop("_bsz")
      }
    // inner probes: one anchor per offset residue (stride rows/doc)
    val probes = docs
      .select(col("_id").as("_aid"), col("_len").as("_alen"),
        explode(sequence(lit(1), lit(stride))).as("_p"), col("_text"))
      .select(col("_aid"), col("_alen"),
        xxhash64(expr(s"substring(_text, _p, $gram)")).as("_g"))
    val candidates = probes.join(capped, Seq("_g"))
      .filter(col("_aid") =!= col("_cid") && col("_alen") < col("_clen"))
      .select(col("_aid"), col("_cid")).distinct()
    // verify: join texts back by id (candidate set is small), exact contains
    val txt = docs.select(col("_id"), col("_text"))
    candidates
      .join(txt.select(col("_id").as("_aid"), col("_text").as("_at")), Seq("_aid"))
      .join(txt.select(col("_id").as("_cid"), col("_text").as("_ct")), Seq("_cid"))
      .filter(instr(col("_ct"), col("_at")) > 0)
      .select(col("_aid").as("inner_id"), col("_cid").as("outer_id"))
  }

  /** N-gram Jaccard similarity for a candidate pair set (exact, builtin-only):
    * self-contained variant for when candidates come from elsewhere.
    */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column = {
    val sa = array_distinct(TextAnalysis.shingles(a, n))
    val sb = array_distinct(TextAnalysis.shingles(b, n))
    when(size(array_union(sa, sb)) > 0,
      size(array_intersect(sa, sb)).cast("double") / size(array_union(sa, sb)).cast("double"))
      .otherwise(lit(0.0))
  }
}
