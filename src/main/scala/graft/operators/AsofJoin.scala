package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the single right row with
  * the greatest right-time <= left-time within the same key — the standard
  * operator Spark lacks natively (quotes-to-trades, feature lookups,
  * slowly-changing dimensions).
  *
  * Implemented by composition (preference (a) from the build rules): union
  * both sides tagged left/right, one shuffle on (key), sort by (time, tag)
  * inside the window, and carry the last non-null right payload forward.
  * Scale properties: exactly ONE hash-partitioned shuffle of |L|+|R| rows,
  * no range cross-product, no per-key driver loop; skewed keys behave like
  * any window over a hot partition (salt upstream if a single key exceeds an
  * executor). This beats the naive inequality-join (which Spark plans as a
  * broadcast nested loop) by orders of magnitude at scale.
  */
object AsofJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param leftKeys   equi-key column names on the left
    * @param rightKeys  matching key column names on the right
    * @param leftTime   left event-time column
    * @param rightTime  right event-time column
    * @param rightCols  right columns to carry (prefixed in the output)
    * @param strict     true: right.t < left.t; false (default): right.t <= left.t
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      strict: Boolean = false): DataFrame = {
    require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty)

    val keyCols = leftKeys.indices.map(i => s"_k$i")
    // tag: right rows sort BEFORE left rows at equal time for <= semantics,
    // AFTER for strict < semantics
    val rightTag = if (strict) 1 else 0
    val leftTag = if (strict) 0 else 1

    val l = left.select(
      (leftKeys.zip(keyCols).map { case (c, k) => col(c).as(k) } :+
        col(leftTime).cast("timestamp").as("_t") :+
        lit(leftTag).as("_tag") :+
        struct(left.columns.map(col): _*).as("_lrow")) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)

    val r = right.select(
      (rightKeys.zip(keyCols).map { case (c, k) => col(c).as(k) } :+
        col(rightTime).cast("timestamp").as("_t") :+
        lit(rightTag).as("_tag") :+
        lit(null).cast(l.schema("_lrow").dataType).as("_lrow")) ++
        rightCols.map(c => col(c).as(s"_r_$c")): _*)

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t").asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      .select((col("_lrow") +: col("_tag") +:
        rightCols.map(c => last(col(s"_r_$c"), ignoreNulls = true).over(w).as(s"_rv_$c"))): _*)
      .filter(col("_tag") === leftTag)

    carried.select(
      (left.columns.map(c => col("_lrow").getField(c).as(c)) ++
        rightCols.map(c => col(s"_rv_$c").as(s"asof_$c"))): _*)
  }
}
