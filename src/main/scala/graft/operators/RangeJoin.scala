package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join without a cross product: open-source Spark
  * plans `p.t BETWEEN i.start AND i.end` (no equi key) as a
  * BroadcastNestedLoopJoin — every point × every interval, quadratic
  * at scale. The standard fix is bin bucketing: quantize the axis into
  * fixed-width bins, explode each interval to the bins it overlaps,
  * bin the points, EQUI-join on the bin id, then apply the exact range
  * predicate. The join becomes an ordinary shuffled hash/sort-merge
  * join on the bin key; cost scales with points + Σ(interval span /
  * binWidth), never points × intervals.
  *
  * Pick `binWidth` near the typical interval length: one-to-few bins
  * per interval, and each point meets only the intervals sharing its
  * bin. A hot bin (dense time region) is ordinary join skew — AQE
  * skew-split handles it, which it cannot do for a nested-loop plan.
  */
object RangeJoin {

  /** Intervals are [start, end) half-open on a BIGINT axis (callers
    * convert timestamps with unix_micros). Returns points × matching
    * intervals with all columns from both inputs.
    *
    * @param pointCol  BIGINT column on `points`
    * @param startCol  BIGINT inclusive start on `intervals`
    * @param endCol    BIGINT exclusive end on `intervals`
    * @param binWidth  bin size in axis units (> 0)
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // exact integer floor-division: BIGINT `/` in Spark SQL is DOUBLE
    // division, whose rounding error near 2^53-scale axes (epoch micros
    // approach this) can flip a bin id at the boundary — a silently
    // missed match the exact post-filter cannot recover. `div` is exact
    // but truncates toward zero, so adjust for negative axis values.
    def floorDiv(c: String): String =
      s"(CASE WHEN $c < 0 AND $c % ${binWidth}L != 0 " +
        s"THEN $c div ${binWidth}L - 1 ELSE $c div ${binWidth}L END)"
    val binned = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bin", explode(expr(
        s"sequence(${floorDiv(startCol)}, ${floorDiv(s"($endCol - 1)")})")))
    val p = points.withColumn("__bin", expr(floorDiv(pointCol)))
    p.join(binned, "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }
}
