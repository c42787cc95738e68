package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Global sort placed BELOW a heavy projection (r15, guide §2.3/§2.4;
  * the multimodal sortedIds discipline generalized).
  *
  * A trailing `orderBy` above an expensive per-row projection makes the
  * range partitioner's SAMPLING pass re-execute the whole projection a
  * second time (the sampler runs the child plan to draw keys), and the
  * range exchange then carries the projected (often wider) rows.
  * Sorting FIRST on the cheap input columns and projecting AFTER the
  * sort runs the kernel exactly once per row and ships only the source
  * columns through the exchange. A per-row projection preserves both
  * the within-partition order and the range partitioning, so the
  * output ordering contract is unchanged.
  *
  * The explicit pinned partition count is `orderBy`'s own physical
  * shape (range exchange + intra-partition sort) but exempt from AQE
  * coalescing — at local/bench scale AQE would otherwise collapse the
  * small range exchange to few partitions and single-thread the heavy
  * projection above it. At real scale the pin equals the configured
  * parallelism and adds nothing.
  */
object SortedBy {
  def apply(df: DataFrame, keys: Column*): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    df.repartitionByRange(par, keys: _*).sortWithinPartitions(keys: _*)
  }
}
