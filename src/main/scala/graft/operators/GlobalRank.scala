package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-pass distributed global rank — the scale-safe replacement for
  * `row_number() OVER (ORDER BY …)` (an empty-partition window funnels
  * every row through ONE reducer task; at a 100 TB fact or even a
  * 10⁹-row dimension that single sort is the whole job's critical
  * path).
  *
  * Pass 1: `repartitionByRange` on the order key — Spark's range
  * partitioner samples boundaries so partition p's keys all precede
  * partition p+1's (a total order ACROSS partitions), then each
  * partition ranks LOCALLY with a partitioned window (parallel,
  * spill-safe). Pass 2: per-partition row counts — a `numPartitions`-
  * sized aggregate — collect to the driver (constant-sized side input,
  * the anchors/codebooks discipline) and fold the cumulative offsets
  * back in as a literal map lookup, so `rank = offset(pid) + local_rn`
  * is pure map-side arithmetic. No single-partition WindowExec appears
  * anywhere in the plan.
  *
  * The caller must make the order key UNIQUE (append a tie-break
  * column): ranks are then deterministic regardless of where the
  * sampled boundaries land, because any boundary split of equal keys
  * is impossible. Reference scope: flAPI serves global-rank shapes via
  * DuckDB's single-node sort (e.g. ROW_NUMBER templates,
  * `/root/reference/src/duckdb_manager.cpp` executes them in-process);
  * this operator is the cluster re-expression of the same semantics.
  */
object GlobalRank {

  /** Above this partition count the pid→offset fold switches from an
    * inline CreateMap literal (2·numPartitions expression-tree nodes —
    * fine at 32, a codegen-limit hazard at thousands) to a broadcast
    * equi join on a numPartitions-row offsets frame. */
  private val LiteralMapMaxPartitions = 64

  /** `df` plus a BIGINT column `rankCol` = 1-based global rank under
    * `order` (which MUST be a total order — include a tie-break; a
    * non-unique key makes ranks nondeterministic wherever the range
    * sampler splits equal keys across partitions). Set the session
    * conf `spark.graft.globalRank.selfCheck=true` to pay one
    * distinct-count aggregation per build that fails loudly
    * (IllegalArgumentException) on a duplicated key instead of
    * returning silently corrupt ranks — off by default because the
    * production callers construct provably-unique keys and the check
    * is a full extra shuffle of the key columns. The returned frame is
    * localCheckpoint-materialized (the count pass already executed it;
    * callers reuse the standing RDD — wrap in a SessionMemo for warm
    * serving).
    */
  def withRank(df: DataFrame, order: Seq[Column], rankCol: String,
               numPartitions: Int = 32): DataFrame =
    twoPass(df, order, numPartitions,
      local = w => row_number().over(w).cast("long"),
      perPartition = count(lit(1)),
      rankCol)

  /** `df` plus a BIGINT column `outCol` = inclusive global running sum
    * of `value` under `order` — the distributed PREFIX SCAN: same
    * two-pass shape as [[withRank]] (range partition → per-partition
    * local cumulative sum → fold each partition's TOTAL as the
    * partition offset), replacing `sum(v) OVER (ORDER BY …)` whose
    * empty partitioning is the same single-reducer hazard. Same
    * unique-order-key precondition and selfCheck conf. */
  def withPrefixSum(df: DataFrame, order: Seq[Column], value: Column,
                    outCol: String, numPartitions: Int = 32): DataFrame =
    twoPass(df, order, numPartitions,
      local = w => sum(value).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
      perPartition = sum(value).cast("long"),
      outCol)

  /** Shared two-pass core: `local(window)` computes the per-partition
    * running quantity, `perPartition` its partition total (the offset
    * unit), and the result column is `offset(pid) + local`. */
  private def twoPass(df: DataFrame, order: Seq[Column], numPartitions: Int,
      local: org.apache.spark.sql.expressions.WindowSpec => Column,
      perPartition: Column, outCol: String): DataFrame = {
    val ranked = df
      .repartitionByRange(numPartitions, order: _*)
      .withColumn("__gr_pid", spark_partition_id())
      .withColumn("__gr_loc",
        local(Window.partitionBy("__gr_pid").orderBy(order: _*)))
      .localCheckpoint(true)
    if (df.sparkSession.conf.get("spark.graft.globalRank.selfCheck", "false")
        .toBoolean) selfCheckUnique(ranked, order)
    val totals = ranked.groupBy("__gr_pid").agg(perPartition.as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.map(_._1)
      .zip(totals.scanLeft(0L)(_ + _._2).init)
    if (numPartitions <= LiteralMapMaxPartitions) {
      // literal pid -> offset map: folded into the projection, zero joins
      val offMap = map(offsets.flatMap { case (p, o) =>
        Seq(lit(p), lit(o)) }.toSeq: _*)
      ranked
        .withColumn(outCol, element_at(offMap, col("__gr_pid")) + col("__gr_loc"))
        .drop("__gr_pid", "__gr_loc")
    } else {
      // thousands of partitions: a 2·N-argument CreateMap bloats the
      // expression tree past whole-stage-codegen limits — ship the
      // offsets as a broadcast hash join on the pid instead (still one
      // row per partition, still no extra exchange over the data)
      val off = broadcast(df.sparkSession.createDataFrame(
        java.util.Arrays.asList(offsets.map { case (p, o) =>
          org.apache.spark.sql.Row(p, o) }: _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("__gr_pid_o",
            org.apache.spark.sql.types.IntegerType, nullable = false),
          org.apache.spark.sql.types.StructField("__gr_off",
            org.apache.spark.sql.types.LongType, nullable = false)))))
      ranked
        .join(off, col("__gr_pid") === col("__gr_pid_o"))
        .withColumn(outCol, col("__gr_off") + col("__gr_loc"))
        .drop("__gr_pid", "__gr_loc", "__gr_pid_o", "__gr_off")
    }
  }

  /** One distinct-count pass failing loudly on a duplicated order key
    * (conf-gated — see [[withRank]]). */
  private def selfCheckUnique(local: DataFrame, order: Seq[Column]): Unit = {
    // sort modifiers (x.desc) are SortOrder column nodes — strip to
    // the child so the tuple is projectable for the distinct count.
    // SortOrder is private[sql]; one reflective child() call per
    // BUILD (never per row) keeps the strip on the public Column
    // constructor without a package-injection shim.
    val keys = order.map { c =>
      val n = c.node
      if (n.getClass.getName == "org.apache.spark.sql.internal.SortOrder") {
        // a Spark upgrade that moves SortOrder or the Column(ColumnNode)
        // constructor must degrade to a DIAGNOSABLE error naming the
        // conf, not a bare reflective NoSuchElementException (r10
        // ADVICE) — the check is opt-in, so the remedy is in its name
        try {
          val child = n.getClass.getMethod("child").invoke(n)
          classOf[Column].getConstructors
            .find(_.getParameterTypes.map(_.getName).toSeq ==
              Seq("org.apache.spark.sql.internal.ColumnNode"))
            .getOrElse(throw new NoSuchMethodException(
              "Column(ColumnNode) constructor not found"))
            .newInstance(child).asInstanceOf[Column]
        } catch {
          case e: ReflectiveOperationException =>
            throw new IllegalStateException(
              "GlobalRank selfCheck (spark.graft.globalRank.selfCheck) " +
                "could not strip a sort modifier via reflection on this " +
                "Spark version — pass bare columns to the order, or " +
                "disable the conf", e)
        }
      } else c
    }
    val total = local.count()
    val distinct = local.select(keys: _*).distinct().count()
    require(distinct == total,
      s"GlobalRank: order key is not unique ($distinct distinct " +
        s"tuples over $total rows) — append a tie-break column; results " +
        "would be nondeterministic at range-partition boundaries")
  }

  /** SQL-standard `ntile(k)` derived from a 1-based global rank by pure
    * arithmetic (the first n mod k buckets take ceil(n/k) rows): the
    * scale path for quantile labels — no window at all once the rank
    * exists. `n` is the total row count.
    */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    // exact integer division: operands stay < 2^53 so the double
    // detour is exact; numerators are exact multiples of the divisor
    def idiv(a: Column, b: Column): Column = ((a - pmod(a, b)) / b).cast("long")
    val q = idiv(n, lit(k))            // small-bucket size
    val r = pmod(n, lit(k))            // number of big buckets
    val big = q + lit(1)               // big-bucket size
    when(rank <= r * big, idiv(rank - 1, big) + 1)
      // greatest() guards the (unreachable when q=0) small-bucket arm
      .otherwise(r + idiv(rank - lit(1) - r * big, greatest(q, lit(1))) + 1)
  }
}
