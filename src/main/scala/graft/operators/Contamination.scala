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
  */
object Contamination {

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
    val aIdx = corpusA.select(col(aId).as("a_id"),
        TextAnalysis.winnowingFingerprint(col(aText), kGram, window).as("fp"))
      .select(col("a_id"), explode(col("fp")).as("f"))
    val bIdx = corpusB.select(col(bId).as("b_id"),
        TextAnalysis.winnowingFingerprint(col(bText), kGram, window).as("fp"))
      .select(col("b_id"), explode(col("fp")).as("f"))

    // drop non-discriminative fingerprints (boilerplate) before the join —
    // on BOTH sides: an uncapped hot posting list on either side multiplies
    // against the other (|A_f| x |B_f| candidate rows per fingerprint)
    def cap(df: DataFrame) = df
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("f"))))
      .filter(col("_n") <= maxPostings)
      .drop("_n")

    // a_total counted AFTER capping (same universe as the join numerator);
    // piggybacks on the a_id partitioning the groupBy needs anyway
    val aCapped = cap(aIdx)
      .withColumn("a_total", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("a_id"))))

    aCapped.join(cap(bIdx), "f")
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("shared"), first(col("a_total")).as("a_total"))
      .withColumn("overlap", round(col("shared") / col("a_total"), 4))
      .filter(col("overlap") >= threshold)
      .select(col("a_id"), col("b_id"), col("shared"), col("a_total"), col("overlap"))
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
