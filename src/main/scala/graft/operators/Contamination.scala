package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval contamination detection: find documents in corpus A sharing
  * substring-level content with corpus B (the check run before any
  * evaluation — did benchmark text leak into training data?).
  *
  * Implementation: winnowing fingerprints on both sides, exploded into an
  * inverted index (fingerprint -> doc), equi-joined on fingerprint, overlap
  * scored as |shared fingerprints| / |A-doc fingerprints|. One shuffle on
  * the fingerprint hash; ultra-common fingerprints (boilerplate shared by
  * >maxPostings docs) are dropped the same way LSH caps buckets — they
  * carry no discriminative signal and would quadratically blow up the join.
  *
  * Capping semantics: the cap applies to BOTH corpora (an uncapped hot
  * posting list on either side multiplies against the other), and `a_total`
  * counts only the A fingerprints that SURVIVE the cap — numerator and
  * denominator are measured over the same (discriminative) fingerprint
  * universe, so boilerplate-heavy documents are scored on their distinctive
  * content rather than silently biased below threshold. A document whose
  * fingerprints are ALL capped produces no pairs at all: it consists
  * entirely of corpus-wide boilerplate and has no identifiable overlap.
  *
  * Bias direction (applies to [[overlap]] and [[overlapPruned]] equally —
  * the Bloom prune is lossless; only the cap biases): capping is strictly
  * conservative-DOWN. Dropping a fingerprint removes it from numerator and
  * denominator together, so a pair's reported overlap can only fall toward
  * the score of its distinctive content, never rise, and contamination
  * carried entirely by >maxPostings boilerplate is invisible at this layer.
  * If boilerplate-level leakage matters for a corpus, raise maxPostings,
  * pre-dedup the boilerplate, or rank with [[groupOverlapMatrix]] (sketch
  * estimates, no cap) before auditing.
  */
object Contamination {

  /** Exploded (id, fingerprint) inverted index with the maxPostings skew
    * cap applied: fingerprints held by more than `maxPostings` docs carry
    * no discriminative signal and would quadratically blow up the join.
    */
  private def cappedIndex(
      corpus: DataFrame, id: String, text: String, outId: String,
      kGram: Int, window: Int, maxPostings: Int): DataFrame =
    corpus.select(col(id).as(outId),
        TextAnalysis.winnowingFingerprint(col(text), kGram, window).as("fp"))
      .select(col(outId), explode(col("fp")).as("f"))
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("f"))))
      .filter(col("_n") <= maxPostings)
      .drop("_n")

  /** @return (a_id, b_id, shared, a_total, overlap) for pairs with
    *         overlap >= threshold
    */
  def overlap(
      corpusA: DataFrame, aId: String, aText: String,
      corpusB: DataFrame, bId: String, bText: String,
      threshold: Double = 0.2,
      kGram: Int = 8,
      window: Int = 4,
      maxPostings: Int = 1000): DataFrame = {
    // the cap applies on BOTH sides: an uncapped hot posting list on either
    // side multiplies against the other (|A_f| x |B_f| rows per fingerprint)
    val bCapped = cappedIndex(corpusB, bId, bText, "b_id", kGram, window, maxPostings)
    joinScore(
      cappedA(corpusA, aId, aText, kGram, window, maxPostings),
      bCapped, threshold)
  }

  // a_total counted AFTER capping (same universe as the join numerator);
  // piggybacks on the a_id partitioning the groupBy needs anyway
  private def cappedA(
      corpusA: DataFrame, aId: String, aText: String,
      kGram: Int, window: Int, maxPostings: Int): DataFrame =
    cappedIndex(corpusA, aId, aText, "a_id", kGram, window, maxPostings)
      .withColumn("a_total", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("a_id"))))

  private def joinScore(
      aCapped: DataFrame, bCapped: DataFrame, threshold: Double): DataFrame =
    aCapped.join(bCapped, "f")
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("shared"), first(col("a_total")).as("a_total"))
      .withColumn("overlap", round(col("shared") / col("a_total"), 4))
      .filter(col("overlap") >= threshold)
      .select(col("a_id"), col("b_id"), col("shared"), col("a_total"), col("overlap"))

  /** Scale path for [[overlap]] — IDENTICAL output, fraction of the
    * shuffle. A Bloom filter over B's cap-surviving fingerprints drops A
    * index rows whose fingerprint is definitely absent from B before the
    * fingerprint join; on a mostly-clean training corpus that is nearly
    * every row. Bloom false positives only ADD candidate rows the join
    * then discards — no true pair is ever lost — and `a_total` is counted
    * before the prune, so scores match [[overlap]] bit-for-bit.
    *
    * The B index is localCheckpoint'd: it feeds both the filter build (an
    * action) and the join, and re-winnowing corpus B twice is the only
    * alternative.
    */
  def overlapPruned(
      corpusA: DataFrame, aId: String, aText: String,
      corpusB: DataFrame, bId: String, bText: String,
      threshold: Double = 0.2,
      kGram: Int = 8,
      window: Int = 4,
      maxPostings: Int = 1000,
      expectedBFingerprints: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val bCapped = cappedIndex(corpusB, bId, bText, "b_id", kGram, window, maxPostings)
      .localCheckpoint()
    // string-cast to match mightContain's probe-side coercion. No
    // distinct(): Bloom insertion is idempotent (same value sets the same
    // bits), so deduping first costs a full exchange of the fingerprint
    // index and changes not one bit of the filter (r15).
    val bloom = BloomTools.buildFilter(
      bCapped.select(col("f").cast("string").as("f")),
      "f", expectedBFingerprints, fpp)
    val aPruned = cappedA(corpusA, aId, aText, kGram, window, maxPostings)
      .filter(BloomTools.mightContain(col("f"), bloom))
    joinScore(aPruned, bCapped, threshold)
  }

  /** Sketch-only shard triage: estimated fingerprint overlap for every
    * (A-group, B-group) pair from per-group KMV sketches — the "which
    * shards even look contaminated" report, computed with NO
    * fingerprint-level join. Each group's winnowing fingerprints fold into
    * one bottom-k sketch under partial aggregation; the pair matrix is a
    * |G_A| x |G_B| cross of kilobyte sketch values.
    *
    * These are estimates with union-relative error ~1/sqrt(k): a pair
    * whose true overlap is a few fingerprints can estimate 0 (sampling
    * miss), so rank shards with this, then audit the suspicious ones with
    * [[overlap]] / enforce with [[overlapPruned]] (exact recall).
    */
  def groupOverlapMatrix(
      corpusA: DataFrame, aGroup: String, aText: String,
      corpusB: DataFrame, bGroup: String, bText: String,
      kGram: Int = 8,
      window: Int = 4,
      k: Int = 4096): DataFrame = {
    def sketches(df: DataFrame, g: String, text: String, out: String) =
      df.select(col(g).as(out),
          explode(TextAnalysis.winnowingFingerprint(col(text), kGram, window)).as("_f"))
        .groupBy(col(out))
        .agg(graft.functions.GraftFunctions.kmv_sketch_agg(col("_f"), k).as(s"_sk_$out"))
    val a = sketches(corpusA, aGroup, aText, "a_group")
    val b = sketches(corpusB, bGroup, bText, "b_group")
    a.crossJoin(broadcast(b))
      .select(col("a_group"), col("b_group"),
        round(graft.functions.GraftFunctions.kmv_intersect_estimate(
          col("_sk_a_group"), col("_sk_b_group")), 2).as("est_shared_fp"),
        round(graft.functions.GraftFunctions.kmv_jaccard(
          col("_sk_a_group"), col("_sk_b_group")), 4).as("est_jaccard"))
  }

  /** The remover to [[overlap]]'s auditor: drop every training document
    * whose overlap with ANY eval document reaches `threshold` — the
    * decontamination step run between the audit and the training mix.
    *
    * Scale shape: the flagged-id set (contaminated training docs only) is
    * the sole addition to [[overlap]]'s plan, applied as a left-anti join —
    * clean rows never shuffle.
    */
  def decontaminate(
      train: DataFrame, trainId: String, trainText: String,
      eval: DataFrame, evalId: String, evalText: String,
      threshold: Double = 0.2,
      kGram: Int = 8,
      window: Int = 4,
      maxPostings: Int = 1000): DataFrame = {
    val flagged = overlap(train, trainId, trainText, eval, evalId, evalText,
        threshold, kGram, window, maxPostings)
      .select(col("a_id").as("_contaminated")).distinct()
    train.join(flagged, train(trainId) === col("_contaminated"), "left_anti")
  }
}
