package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the single right row with
  * the greatest `rightTime <= leftTime` within the same key group —
  * the temporal-enrichment staple (latest quote per trade, latest
  * snapshot per request) that vanilla Spark can only express as a
  * theta join (BroadcastNestedLoop — quadratic) or a window over a
  * pre-joined blowup.
  *
  * Implementation is union + one window, the sort-merge formulation:
  * tag both inputs, union them, and within each key take the running
  * `last` non-null right payload over (time, side) order. Cost is ONE
  * shuffle of (left ∪ right) on the key plus a per-partition sort —
  * no join operator appears in the plan at all, so there is no
  * candidate blowup to mis-estimate and nothing for AQE to salvage.
  * At 100 TB this is exactly the plan a hand-written MapReduce
  * secondary-sort job would produce; key skew degrades into a long
  * sorted chain per hot key, never a cross product.
  *
  * Right rows sort BEFORE left rows at equal timestamps (side 0 < 1),
  * giving `<=` semantics; `tieBreak` orders equal-time right rows so
  * the match is deterministic (the greatest tieBreak wins). The right
  * payload rides in ONE struct so all matched columns come from the
  * SAME right row (per-column `last(ignoreNulls)` could mix rows when
  * a payload field is legitimately null).
  */
object AsOfJoin {

  /** @param key       equality column, same name on both inputs
    * @param leftTime  left's time column
    * @param rightTime right's time column
    * @param payload   (right column → output name) carried to matches;
    *                  output names must not collide with left columns
    * @param tieBreak  right column ordering equal-time right rows
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[(String, String)],
      tieBreak: Option[String] = None): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val leftCols = left.columns.toSeq
    // the tie column keeps its NATIVE type: a string cast would order
    // numeric tie-breaks lexicographically ("9" > "10"), silently
    // resolving equal-timestamp ties to the wrong right row across
    // digit-count boundaries. Left rows carry a typed NULL — their
    // relative order within an equal (t, side) group is irrelevant
    // (their __asof_r is null either way).
    val tieCol = tieBreak.map(col).getOrElse(lit(0))
    val rightSide = right.select(
      col(key),
      col(rightTime).as("__asof_t"),
      struct(payload.map { case (src, out) => col(src).as(out) }: _*).as("__asof_r"),
      tieCol.as("__asof_tie"),
      lit(0).as("__asof_side"))
    val leftSide = left
      .withColumn("__asof_t", col(leftTime))
      .withColumn("__asof_tie", lit(null).cast(rightSide.schema("__asof_tie").dataType))
      .withColumn("__asof_side", lit(1))
    val unioned = leftSide.unionByName(rightSide, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col("__asof_t").asc, col("__asof_side").asc, col("__asof_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__asof_m", last(col("__asof_r"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1)
    matched.select(
      leftCols.map(col) ++
        payload.map { case (_, out) => col(s"__asof_m.$out").as(out) }: _*)
  }
}
