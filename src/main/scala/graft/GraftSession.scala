package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard config.
  *
  * Scale notes: these settings are what we'd ship in spark-defaults on a
  * real cluster — AQE for runtime coalescing/skew-join handling, shuffle
  * partition count sized to cores (the driver harness runs local[32]; on a
  * 1000-executor cluster this would be executors*cores*2-3 or simply left
  * to AQE's coalescing with a high initial value).
  */
object GraftSession {
  def build(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .withExtensions(graft.functions.GraftFunctions.register)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // runtime skew-join splitting: on a 1000-executor cluster a hot
      // key (a boilerplate near-dup bucket, a whale customer) otherwise
      // turns one reducer into the stage's critical path; local[32]
      // rarely triggers it but the setting is part of the shipped
      // defaults, not a tuning afterthought
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // demote to broadcast at runtime when a join side MEASURES small
      // even though static stats said otherwise (AQE's post-shuffle
      // size beats any estimate at 100 TB, where stats drift)
      .config("spark.sql.adaptive.localShuffleReader.enabled", "true")
      // ObjectHashAggregate (collect_set/collect_list/typed-imperative
      // aggs) silently degrades to SORT-based aggregation after only
      // 128 distinct keys per task — a full per-partition sort of the
      // input on both map and reduce side for every basket/segment/
      // sketch query (r14 measurement: q20's order-keyed collect_set
      // spent its time sorting lineitem, not aggregating). Our object
      // aggs all carry per-key state bounded by design (order line
      // counts, per-doc segments, ≤3k-node digests), so a 256K-key hash
      // map is tens of MB per task — far under execution memory at any
      // partition sizing — while the sort fallback remains as the
      // degenerate-state escape hatch. Env-overridable for deployments
      // with fatter agg state.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OBJ_AGG_FALLBACK_KEYS", "262144"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // duplicated-scan budget DEFAULT-ON (r11 verdict #1: the guard
      // shipped dark at max=0). Spark inlines CTEs, so one relation
      // referenced N times re-executes N× — every gated query passes
      // under this budget because shared frames are memoized or
      // checkpointed; that discipline is what the default enforces on
      // user-authored SQL too. Override per deployment (0 = off).
      .config(graft.plans.ScanBudgetRule.ConfKey,
        graft.plans.ScanBudgetRule.DefaultBudget.toString)
      // driver testdata ships TIMESTAMP(NANOS) parquet (events.ts); read as
      // long and convert in Tables.register (µs-precision data, lossless).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
