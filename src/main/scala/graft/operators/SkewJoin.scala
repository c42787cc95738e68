package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join handling splits oversized SORT-MERGE partitions at
  * runtime and is the first line of defense (enabled in GraftSession).
  * Salting is the explicit fallback when one side's hot keys are known
  * to dwarf everything else (a handful of users with 10^9 events
  * against a user dimension): the skewed side gets a random salt in
  * [0, factor), the compact side is replicated `factor` times, and the
  * join key becomes (key, salt) — the hot key's rows spread across
  * `factor` reducers instead of melting one.
  *
  * Cost model: replicates the COMPACT side `factor`× (it must be the
  * small side) and adds a salt column to the shuffle key — worth it
  * only when a key's share of rows exceeds roughly 1/numPartitions.
  * Result equals the plain equi-join exactly (verified by the
  * salted_join_equivalence oracle entry).
  */
object SkewJoin {

  def saltedJoin(
      skewed: DataFrame,
      compact: DataFrame,
      skewedKey: String,
      compactKey: String,
      factor: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    // deterministic salt: hash of ALL row columns, so reruns and
    // retried tasks reproduce identical partitioning regardless of
    // partition layout (monotonically_increasing_id is only stable for
    // one fixed layout and would break the retry guarantee). Fully
    // duplicate rows share a salt — acceptable: they carry the same
    // join result, and real skew comes from distinct rows per hot key.
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col).toSeq: _*), lit(factor)))
    val replicated = compact
      .withColumn("__salt", explode(expr(s"sequence(0, ${factor - 1})")))
    val joined = salted.join(replicated,
      salted(skewedKey) === replicated(compactKey) &&
        salted("__salt") === replicated("__salt").cast("long"),
      joinType)
    joined.drop("__salt")
  }

  /** Convenience: per-key row counts with the heavy hitters first —
    * the profiling query that decides whether salting is warranted. */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).count().orderBy(col("count").desc, col(key)).limit(topN)

  /** Null-safe join condition helper used by callers that need
    * SQL-`<=>` semantics on the salted key. */
  def nullSafeEq(l: Column, r: Column): Column = l <=> r
}
