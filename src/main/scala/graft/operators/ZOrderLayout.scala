package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) file layout for cache-table writes — the write
  * path of the gated `zorder_layout_key` operator (queries/CoreQueries
  * .scala): interleave 16 bits of two scan-predicate columns into one
  * code, range-partition and sort by it, so each written file covers a
  * small rectangle of the (x, y) domain and a scan filtered on either
  * column (or both) prunes to a narrow band of files via parquet
  * min/max footer stats instead of reading every file.
  *
  * Scale notes: the code is pure map-side integer bit math; the only
  * added cost over a plain write is the range exchange + in-partition
  * sort the layout exists for — exactly what Delta/Iceberg OPTIMIZE
  * ZORDER pays. `buckets` is the output file count: size it to the
  * table (files of 100 MB–1 GB at 100 TB).
  */
object ZOrderLayout {

  /** SQL spelling of the 16-bit-per-axis interleave — shared with the
    * gated query so the write path and the gate use the same code. */
  def mortonExprSql(x: String, y: String): String =
    (0 until 16).map(i =>
      s"(((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1}))")
      .mkString(" + ")

  /** Morton code column of two integral columns (truncated to 16 bits
    * per axis — the layout key does not need full precision, only
    * locality). */
  def key(xCol: String, yCol: String): Column =
    expr(mortonExprSql(s"($xCol & 65535)", s"($yCol & 65535)")).cast("long")

  /** Re-lay a frame out in z-order: range-partition into `buckets`
    * output files by the Morton code of (xCol, yCol) and sort rows
    * within each file by it. Row SET is unchanged — only physical
    * placement moves, so correctness gates are unaffected.
    *
    * Each axis is min/max-NORMALIZED into the full 16-bit code domain
    * first (one tiny agg job, folded as literals) — without it, an
    * axis whose natural domain uses fewer bits than the other
    * contributes nothing to the code's high bits and never clusters
    * (observed: a 200-value partkey axis against a 6000-value orderkey
    * axis left partkey file spans at ~100% of global). This is what
    * engine OPTIMIZE ZORDER implementations do, and it is layout-only
    * arithmetic — no gate depends on it. */
  def apply(df: DataFrame, xCol: String, yCol: String, buckets: Int = 64): DataFrame = {
    val b = df.agg(
      min(xCol).cast("long"), max(xCol).cast("long"),
      min(yCol).cast("long"), max(yCol).cast("long")).collect().head
    def norm(c: String, lo: Long, hi: Long): String = {
      val span = math.max(hi - lo, 1L)
      s"CAST((($c - ${lo}L) * 65535.0) / ${span}L AS BIGINT)"
    }
    val z = "__graft_z"
    df.withColumn(z,
        expr(mortonExprSql(
          s"(${norm(xCol, b.getLong(0), b.getLong(1))} & 65535)",
          s"(${norm(yCol, b.getLong(2), b.getLong(3))} & 65535)")).cast("long"))
      .repartitionByRange(math.max(buckets, 1), col(z))
      .sortWithinPartitions(z)
      .drop(z)
  }
}
