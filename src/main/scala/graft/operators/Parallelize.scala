package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism guard for per-row-heavy stages (digest/ANN kernels).
  *
  * A kernel operator must not assume its input arrives well-split: a
  * small table is often ONE parquet file → one partition → the whole
  * per-row compute serializes on a single core (VERDICT r2 measured
  * winnowing at 33 s on one core vs the sub-second it costs on 32).
  *
  * `ensure` repartitions ONLY when the input's planned partition count
  * is below the cluster's default parallelism. At real scale the scan
  * already yields hundreds of splits, the condition is false, and no
  * shuffle is added — so this never turns into a 100 TB reshuffle; it
  * only rescues the small-input / cold-start case where the shuffle
  * being added is itself small.
  */
object Parallelize {
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
