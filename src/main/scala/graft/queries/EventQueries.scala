package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, QuerySet, Tables}

/** Batch analytics over the `events` stream table: time-bucket rollups
  * and gap-based sessionization — the batch forms of the streaming
  * operators in graft.streaming (same SQL shape a late-night backfill
  * would run over the stream's archive).
  *
  * Scale: both queries shuffle once on their natural keys (bucket,
  * user); the sessionization window is per-user ordered by time —
  * user_id cardinality is high, so partitions stay balanced (unlike a
  * low-cardinality segment window, there is no 5-reducer funnel).
  */
object EventQueries extends QuerySet {

  /** Identical SQL on both engines. */
  private def sqlQuery(name: String, text: String): QueryDef =
    QueryDef(name, Some(text), (s, dir) => Tables.sql(s, dir, text))

  private val hourly = sqlQuery(
    "ev1_hourly_rollup",
    """SELECT cast(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
      |       event_type, count(*) AS n, round(sum(value), 2) AS total
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin)

  // Gap-based sessionization: a session break is >30 min of inactivity.
  // Session count per user = 1 + number of breaks; plus dwell stats.
  // Epoch math stays in INTEGER MICROSECONDS end to end — the one
  // engine-specific spelling is unix_micros (Spark) vs epoch_us
  // (DuckDB), both exact BIGINT, so no floor/round semantics can
  // diverge (second-floor vs round on sub-second timestamps broke the
  // r2 hash compare). The integer sum is cast to BIGINT because DuckDB
  // sums integers into HUGEINT, which pandas renders as float64 —
  // `3.0` vs `3` breaks the driver's value hash (no-op on Spark).
  private def sessionSql(epochFn: String => String) =
    s"""SELECT user_id,
       |  count(*) AS n_events,
       |  1 + cast(sum(CASE WHEN gap_us IS NOT NULL AND gap_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       |  max(gap_us) AS max_gap_us
       |FROM (
       |  SELECT user_id,
       |         ${epochFn("ts")} - ${epochFn("lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)")} AS gap_us
       |  FROM events) t
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  private val sessions = QueryDef(
    "ev2_sessionize",
    Some(sessionSql(e => s"epoch_us($e)")),
    (s, dir) => Tables.sql(s, dir, sessionSql(e => s"unix_micros($e)")))

  private val funnel = sqlQuery(
    "ev3_type_transition",
    """SELECT prev_type, event_type AS next_type, count(*) AS n
      |FROM (
      |  SELECT event_type,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events) t
      |WHERE prev_type IS NOT NULL
      |GROUP BY prev_type, event_type
      |ORDER BY prev_type, next_type""".stripMargin)

  // Salted-join equivalence: the skew-mitigation join must produce
  // EXACTLY the plain equi-join's result (oracle = plain join). The
  // compact side is a per-user dimension derived from events; the
  // "skewed" side is the raw event stream.
  private val salted = QueryDef(
    "salted_join_agg",
    Some("""SELECT e.user_id, count(*) AS n, d.first_event
           |FROM events e
           |JOIN (SELECT user_id AS dim_user, min(event_id) AS first_event
           |      FROM events GROUP BY user_id) d
           |  ON e.user_id = d.dim_user
           |GROUP BY e.user_id, d.first_event
           |ORDER BY e.user_id""".stripMargin),
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val events = Tables.table(s, dir, "events")
      val dim = events.groupBy(col("user_id").as("dim_user"))
        .agg(min("event_id").as("first_event"))
        .select("dim_user", "first_event")
      graft.operators.SkewJoin.saltedJoin(events, dim, "user_id", "dim_user", factor = 8)
        .groupBy(col("user_id"), col("first_event"))
        .agg(count(lit(1)).as("n"))
        .select("user_id", "n", "first_event")
        .orderBy("user_id")
    })

  // Advisor-routed join (r11 verdict #2: ev22 computes the skew
  // diagnostics, this consumes them): the same dim join as
  // salted_join_agg, but the path — salted vs plain — is picked by
  // [[graft.operators.SkewJoin.advise]] reading the SAME memoized
  // key-count frame ev22/ev29 share (three longs off a checkpointed
  // frame, no corpus re-scan). On this corpus the hottest user sits
  // ~1.3× the mean, under the 4× trigger, so the plain path fires and
  // nobody pays the 8× dim replication; flip the corpus to a whale
  // distribution and the salted path fires with the identical result
  // (equivalence is saltedJoin's contract; SkewJoinSpec flips the
  // trigger both ways against the physical plan). The oracle is the
  // plain join — correct for EITHER route.
  private val adaptiveJoin = QueryDef(
    "adaptive_join_agg",
    Some("""SELECT e.user_id, count(*) AS n, d.first_event
           |FROM events e
           |JOIN (SELECT user_id AS dim_user, min(event_id) AS first_event
           |      FROM events GROUP BY user_id) d
           |  ON e.user_id = d.dim_user
           |GROUP BY e.user_id, d.first_event
           |ORDER BY e.user_id""".stripMargin),
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val events = Tables.table(s, dir, "events")
      val keyCounts = skewCache.getOrElseUpdate(s, dir) {
        events.groupBy("user_id").agg(count(lit(1)).as("cnt"))
          .localCheckpoint(true)
      }
      val dim = events.groupBy(col("user_id").as("dim_user"))
        .agg(min("event_id").as("first_event"))
        .select("dim_user", "first_event")
      graft.operators.SkewJoin
        .adaptiveJoin(events, dim, "user_id", "dim_user", keyCounts)
        .groupBy(col("user_id"), col("first_event"))
        .agg(count(lit(1)).as("n"))
        .select("user_id", "n", "first_event")
        .orderBy("user_id")
    })

  // ---- keep-latest-per-key dedup -----------------------------------------
  // The temporal-dedup staple of ingest pipelines (keep the newest
  // version per key). Spark side is a struct-max AGGREGATION, not a
  // window: max(struct(ts, event_id, …)) compares lexicographically so
  // the latest (ts, then event_id) row wins — partial aggregation
  // combines map-side and no per-partition ORDER BY ever runs; at
  // 100 TB this is one shuffle of one struct per key vs a full sort of
  // every event. The oracle states the same semantics as a window.
  private val keepLatest = QueryDef(
    "dedup_keep_latest",
    Some("""SELECT user_id, event_id, event_type FROM (
           |  SELECT user_id, event_id, event_type,
           |         row_number() OVER (PARTITION BY user_id
           |                            ORDER BY ts DESC, event_id DESC) AS rn
           |  FROM events) t
           |WHERE rn = 1 ORDER BY user_id""".stripMargin),
    (s, dir) => {
      import org.apache.spark.sql.functions._
      Tables.table(s, dir, "events")
        .groupBy("user_id")
        .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("m"))
        .select(col("user_id"), col("m.event_id").as("event_id"),
          col("m.event_type").as("event_type"))
        .orderBy("user_id")
    })

  // ---- backward as-of join -----------------------------------------------
  // For every click, the user's most recent prior (or simultaneous)
  // view — the classic temporal enrichment. Oracle is DuckDB's native
  // ASOF JOIN; the Spark side is graft.operators.AsOfJoin (union + one
  // keyed window — ONE shuffle, no join node, no candidate blowup; see
  // the operator's scaladoc for the 100 TB argument). gap_us stays in
  // exact integer microseconds (unix_micros/epoch_us).
  private val asof = QueryDef(
    "asof_join_views",
    Some("""SELECT c.event_id AS click_id, c.user_id AS user_id,
           |       v.event_id AS view_id,
           |       epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
           |FROM (SELECT * FROM events WHERE event_type = 'click') c
           |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
           |  ON c.user_id = v.user_id AND v.ts <= c.ts
           |ORDER BY click_id""".stripMargin),
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val events = Tables.table(s, dir, "events")
      val clicks = events.filter(col("event_type") === "click")
      val views = events.filter(col("event_type") === "view")
      graft.operators.AsOfJoin.backward(
        clicks, views, key = "user_id", leftTime = "ts", rightTime = "ts",
        payload = Seq("event_id" -> "view_id", "ts" -> "view_ts"),
        tieBreak = Some("event_id"))
        .select(col("event_id").as("click_id"), col("user_id"),
          col("view_id"),
          (unix_micros(col("ts")) - unix_micros(col("view_ts"))).as("gap_us"))
        .orderBy("click_id")
    })

  // ---- binned range join --------------------------------------------------
  // Events inside [day, day+6h) per day-window. The oracle states it as
  // the naive theta join (which DuckDB executes as its IEJoin); the
  // Spark side goes through graft.operators.RangeJoin's bin bucketing —
  // an EQUI join on 4-hour bins plus exact filter, because open-source
  // Spark would otherwise plan the theta join as BroadcastNestedLoop
  // (points × intervals — quadratic; the PlanSpec lock asserts no
  // nested-loop/cartesian node survives here). 4h bins ⇒ each 6h
  // window explodes to ≤ 3 bins.
  private val rangeJoin = QueryDef(
    "range_join_windows",
    Some("""WITH w AS (SELECT DISTINCT date_trunc('day', ts) AS ws FROM events)
           |SELECT cast(w.ws AS TIMESTAMP) AS window_start,
           |       cast(count(e.event_id) AS BIGINT) AS n,
           |       cast(count(DISTINCT e.user_id) AS BIGINT) AS n_users
           |FROM w JOIN events e ON e.ts >= w.ws AND e.ts < w.ws + INTERVAL 6 HOUR
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val events = Tables.table(s, dir, "events")
        .withColumn("p", unix_micros(col("ts")))
      val windows = events
        .select(date_trunc("day", col("ts")).as("ws")).distinct()
        .withColumn("s", unix_micros(col("ws")))
        .withColumn("e", col("s") + lit(6L * 3600 * 1000000))
      graft.operators.RangeJoin.pointInInterval(
        events, "p", windows, "s", "e", binWidth = 4L * 3600 * 1000000)
        .groupBy(col("ws").as("window_start"))
        .agg(count(col("event_id")).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("window_start")
    })

  // Conversion funnel: first click → first subsequent purchase per
  // user, converted iff within 1 hour. Epoch math in integer
  // microseconds end to end (the ev2 discipline); integer sums cast to
  // BIGINT for the DuckDB HUGEINT→float64 rendering mismatch. Scale:
  // two user_id aggregations + one user_id join — all on the stream's
  // natural high-cardinality key, no low-cardinality funnel stage
  // until the final single-row digest.
  private def funnelSql(epochFn: String => String) =
    s"""WITH c AS (
       |  SELECT user_id, min(${epochFn("ts")}) AS t_click
       |  FROM events WHERE event_type = 'click' GROUP BY user_id),
       |p AS (
       |  SELECT e.user_id, min(${epochFn("e.ts")}) AS t_buy
       |  FROM events e JOIN c ON c.user_id = e.user_id
       |  WHERE e.event_type = 'purchase' AND ${epochFn("e.ts")} > c.t_click
       |  GROUP BY e.user_id)
       |SELECT count(*) AS clickers,
       |  cast(sum(CASE WHEN p.t_buy IS NOT NULL
       |                 AND p.t_buy - c.t_click <= 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS converted_1h,
       |  cast(min(p.t_buy - c.t_click) AS BIGINT) AS min_lag_us,
       |  cast(max(p.t_buy - c.t_click) AS BIGINT) AS max_lag_us
       |FROM c LEFT JOIN p ON p.user_id = c.user_id""".stripMargin

  private val conversion = QueryDef(
    "ev4_funnel_conversion",
    Some(funnelSql(e => s"epoch_us($e)")),
    (s, dir) => Tables.sql(s, dir, funnelSql(e => s"unix_micros($e)")))

  // ---- retention cohorts ---------------------------------------------------
  // The classic product-analytics grid: users cohorted by first-seen
  // day, retention = fraction of each cohort active again N days later.
  // Scale: first-seen is a partial-min agg on user_id; the activity set
  // collapses to DISTINCT (user, day) BEFORE the cohort join (two-phase
  // distinct — the corpus never reaches the join raw); the join key is
  // high-cardinality user_id; only the already-collapsed user-day rows
  // hit the final low-cardinality (cohort, offset) agg — and since they
  // arrive unique per (user, day), that agg is a plain count, not a
  // second distinct pass. The day-offset
  // spelling is the one engine-specific piece (Spark datediff vs DuckDB
  // date_diff), both exact integer days.
  private def retentionSql(dayDiff: (String, String) => String, oneD: String) =
    s"""WITH f AS (
       |  SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
       |  FROM events GROUP BY user_id),
       |a AS (
       |  SELECT DISTINCT user_id, date_trunc('day', ts) AS act_day FROM events),
       |sz AS (
       |  SELECT cohort_day, count(*) AS cohort_size FROM f GROUP BY cohort_day),
       |j AS (
       |  SELECT f.cohort_day, ${dayDiff("f.cohort_day", "a.act_day")} AS day_offset,
       |         a.user_id
       |  FROM a JOIN f ON a.user_id = f.user_id)
       |SELECT cast(j.cohort_day AS TIMESTAMP) AS cohort_day,
       |       cast(j.day_offset AS BIGINT) AS day_offset,
       |       cast(count(*) AS BIGINT) AS n_active,
       |       cast(sz.cohort_size AS BIGINT) AS cohort_size,
       |       round(count(*) * $oneD / sz.cohort_size, 6) AS retention
       |FROM j JOIN sz ON sz.cohort_day = j.cohort_day
       |GROUP BY j.cohort_day, j.day_offset, sz.cohort_size
       |ORDER BY cohort_day, day_offset""".stripMargin

  // 1.0 literal: `1.0` parses as DECIMAL in Spark — each engine spells
  // its exact-double literal.
  private val retention = QueryDef(
    "ev5_retention_cohorts",
    Some(retentionSql((c, a) => s"date_diff('day', $c, $a)", "1.0::DOUBLE")),
    (s, dir) => Tables.sql(s, dir,
      retentionSql((c, a) => s"datediff($a, $c)", "1.0D")))

  // ---- hourly anomaly detection -------------------------------------------
  // Ops-monitoring staple over the stream archive: flag (event_type,
  // hour) buckets whose count deviates >3σ from that type's hourly
  // mean. The z-test is done ENTIRELY in integer arithmetic — the
  // textbook |cnt − μ| > 3σ with μ = S/n, σ² = (nQ − S²)/n² cross-
  // multiplies to (n·cnt − S)² > 9(nQ − S²), every term an exact
  // BIGINT of counts — so the flag (and the emitted evidence columns)
  // is bit-identical across engines with zero float divisions.
  // Magnitudes: cnt ≤ events-per-hour, S ≤ |events|, so at 1e12 events
  // spread over ≥1e4 hours the products stay < 2^63; a corpus where
  // they would not (all events in one hour) has n = 1 and σ² = 0.
  //
  // 100 TB shape: the hourly rollup is one partial-agg shuffle on the
  // natural (type, hour) key; the per-type moment table is a second
  // partial agg over the ALREADY-collapsed hourly rows (tiny), joined
  // back broadcast. No window over the raw stream, no sort.
  private val anomalySql =
    """WITH h AS (
      |  SELECT event_type, cast(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
      |         CAST(sum(cnt) AS BIGINT) AS sm, CAST(sum(cnt * cnt) AS BIGINT) AS sq
      |  FROM h GROUP BY event_type)
      |SELECT h.event_type, h.hour, h.cnt, s.n_hours,
      |       (s.n_hours * h.cnt - s.sm) * (s.n_hours * h.cnt - s.sm) AS dev2_n2,
      |       9 * (s.n_hours * s.sq - s.sm * s.sm) AS nine_var_n2
      |FROM h JOIN s ON s.event_type = h.event_type
      |WHERE (s.n_hours * h.cnt - s.sm) * (s.n_hours * h.cnt - s.sm)
      |      > 9 * (s.n_hours * s.sq - s.sm * s.sm)
      |ORDER BY h.event_type, h.hour""".stripMargin

  private val anomaly = QueryDef(
    "ev6_anomaly_hours",
    Some(anomalySql),
    (s, dir) => Tables.sql(s, dir, anomalySql))

  // ---- winsorized value stats ---------------------------------------------
  // The outlier-clamp preprocessing every metrics/training pipeline
  // applies before aggregating a heavy-tailed value column: clamp to
  // the per-type [p05, p95] band, report clamp counts and the
  // winsorized sum. Cross-engine disciplines in play: the thresholds
  // use the a7-proven percentile ≡ quantile_cont parity (identical
  // interpolation); the winsorized SUM would be an order-dependent
  // double sum, so each clamped value rounds to an integer micro-unit
  // per ROW and only integer partials combine (bit-exact at any
  // parallelism). 100 TB shape: the 5-row threshold table broadcasts
  // back onto the stream, the clamp is map-side, the final agg
  // combines partially on the natural event_type key; the exact
  // percentile is the parity form — at 1e9-row groups the a7b split
  // applies (swap the threshold agg for the mergeable
  // approx_percentile sketch, everything downstream unchanged).
  private def winsorSql(pct: (String, String) => String, oneM: String) =
    s"""WITH t AS (
       |  SELECT event_type, ${pct("value", "0.05")} AS lo, ${pct("value", "0.95")} AS hi
       |  FROM events GROUP BY event_type)
       |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
       |       CAST(sum(CASE WHEN e.value < t.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_low,
       |       CAST(sum(CASE WHEN e.value > t.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_high,
       |       CAST(sum(CAST(round((CASE WHEN e.value < t.lo THEN t.lo
       |                                 WHEN e.value > t.hi THEN t.hi
       |                                 ELSE e.value END) * $oneM) AS BIGINT)) AS BIGINT)
       |         AS winsor_sum_micro,
       |       max(CAST(round(t.lo * $oneM) AS BIGINT)) AS lo_micro,
       |       max(CAST(round(t.hi * $oneM) AS BIGINT)) AS hi_micro
       |FROM events e JOIN t ON t.event_type = e.event_type
       |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  private val winsorized = QueryDef(
    "ev7_winsorized_stats",
    Some(winsorSql((c, p) => s"quantile_cont($c, $p)", "1000000.0::DOUBLE")),
    (s, dir) => Tables.sql(s, dir,
      winsorSql((c, p) => s"percentile($c, ${p}D)", "1000000.0D")))

  // ---- SCD Type-2 interval build ------------------------------------------
  // The warehouse staple: collapse each user's event-type stream into
  // validity intervals (one row per RUN of equal states) with
  // valid_from / valid_to / is_current — the slowly-changing-dimension
  // table an ingest job derives from a change stream. Classic
  // gaps-and-islands: a run boundary is `state <> lag(state)`, the run
  // id is the running count of boundaries (ROWS frame, explicit so
  // both engines pin the same frame), runs collapse by min(ts)/count,
  // and valid_to = the NEXT run's valid_from via lead (NULL ⇒ current).
  //
  // 100 TB shape: every window partitions by user_id — a single hash
  // exchange on the stream's natural high-cardinality key feeds the
  // lag and the running sum (same partitioning, one sort). The run
  // collapse and the lead window operate on RUN rows (already ~5×
  // smaller than the stream here, and in a real dimension stream
  // orders of magnitude smaller), so the second exchange carries the
  // collapsed table, never the raw stream. No corpus-wide sort, no
  // self-join — the naive SCD2 spelling (each event joined to the next
  // change via a theta join) never appears.
  // Integer casts: the run id is an integer-sum (DuckDB sums to
  // HUGEINT → BIGINT cast), count(*) likewise.
  private val scd2CoreSql =
    """WITH o AS (
      |  SELECT user_id, event_type, ts, event_id,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |m AS (
      |  SELECT user_id, event_type, ts,
      |         sum(CASE WHEN prev_type IS NULL OR prev_type <> event_type
      |                  THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      |  FROM o),
      |r AS (
      |  SELECT user_id, run_id, event_type AS state,
      |         min(ts) AS valid_from, count(*) AS n_events
      |  FROM m GROUP BY user_id, run_id, event_type),
      |f AS (
      |  SELECT user_id, run_id, state, valid_from, n_events,
      |         lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id) AS valid_to
      |  FROM r)""".stripMargin

  private val scd2Sql = scd2CoreSql + """
    |SELECT user_id, CAST(run_id AS BIGINT) AS version, state,
    |       CAST(valid_from AS TIMESTAMP) AS valid_from,
    |       CAST(valid_to AS TIMESTAMP) AS valid_to,
    |       CAST(n_events AS BIGINT) AS n_events,
    |       (valid_to IS NULL) AS is_current
    |FROM f ORDER BY user_id, version""".stripMargin

  private val scd2 = QueryDef(
    "ev8_scd2_intervals",
    Some(scd2Sql),
    (s, dir) => Tables.sql(s, dir, scd2Sql))

  // ---- session-scoped Markov transition matrix ----------------------------
  // The navigation model product analytics fits over a click stream:
  // P(next state | state), estimated from transitions WITHIN a session
  // (ev2's 30-minute gap rule — a transition across a session break is
  // a fiction the raw lag would happily count, which is exactly what
  // ev3's unscoped counts do; this op is the statistically honest
  // refinement). Probabilities are row-normalized to integer PPM so the
  // output is engine-exact: n and tot are exact BIGINT counts and the
  // one double division rounds half-up identically (positive domain).
  //
  // 100 TB shape: one window pass per user partition (single hash
  // exchange on user_id, lag of type and ts share one sort), then a
  // partial-agg collapse to the |types|² transition matrix — constant-
  // size output, map-side combined; the row-total join touches the
  // already-collapsed matrix (broadcast). Epoch math in exact integer
  // microseconds (unix_micros/epoch_us, the ev2 discipline).
  private def markovSql(epochFn: String => String, oneM: String) =
    s"""WITH o AS (
       |  SELECT user_id, event_type,
       |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
       |         ${epochFn("ts")} - ${epochFn("lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)")} AS gap_us
       |  FROM events),
       |t AS (
       |  SELECT prev_type AS from_state, event_type AS to_state,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM o
       |  WHERE prev_type IS NOT NULL AND gap_us <= 1800000000
       |  GROUP BY prev_type, event_type),
       |tot AS (
       |  SELECT from_state, CAST(sum(n) AS BIGINT) AS row_total
       |  FROM t GROUP BY from_state)
       |SELECT t.from_state, t.to_state, t.n, tot.row_total,
       |       CAST(round(t.n * $oneM / tot.row_total, 0) AS BIGINT) AS p_ppm
       |FROM t JOIN tot ON tot.from_state = t.from_state
       |ORDER BY t.from_state, t.to_state""".stripMargin

  private val markov = QueryDef(
    "ev9_markov_transitions",
    Some(markovSql(e => s"epoch_us($e)", "1000000.0::DOUBLE")),
    (s, dir) => Tables.sql(s, dir, markovSql(e => s"unix_micros($e)", "1000000.0D")))

  // ---- three-step strict-order funnel -------------------------------------
  // ev4's conversion funnel extended to the full view → click →
  // purchase chain with per-hop 1-hour windows — the product-analytics
  // report shape (entered / converted per step). Strict order: each
  // step's timestamp must exceed the previous step's FIRST qualifying
  // time (min-aggregation semantics, stated identically in the
  // oracle). Epoch math in exact integer microseconds (the ev2
  // discipline); counts cast BIGINT for DuckDB's HUGEINT rendering.
  //
  // 100 TB shape: three user_id partial-min aggregations and two
  // user_id joins — all on the stream's natural high-cardinality key;
  // each later step aggregates only the previous step's survivors, so
  // the funnel NARROWS the data per hop and the single-row digest is
  // the only low-cardinality stage.
  private def funnelStepsSql(epochFn: String => String) =
    s"""WITH v AS (
       |  SELECT user_id, min(${epochFn("ts")}) AS t0
       |  FROM events WHERE event_type = 'view' GROUP BY user_id),
       |c AS (
       |  SELECT e.user_id, min(${epochFn("e.ts")}) AS t1
       |  FROM events e JOIN v ON v.user_id = e.user_id
       |  WHERE e.event_type = 'click' AND ${epochFn("e.ts")} > v.t0
       |  GROUP BY e.user_id),
       |p AS (
       |  SELECT e.user_id, min(${epochFn("e.ts")}) AS t2
       |  FROM events e JOIN c ON c.user_id = e.user_id
       |  WHERE e.event_type = 'purchase' AND ${epochFn("e.ts")} > c.t1
       |  GROUP BY e.user_id)
       |SELECT CAST(count(*) AS BIGINT) AS viewers,
       |  CAST(count(c.user_id) AS BIGINT) AS clicked,
       |  CAST(sum(CASE WHEN c.t1 - v.t0 <= 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS clicked_1h,
       |  CAST(count(p.user_id) AS BIGINT) AS purchased,
       |  CAST(sum(CASE WHEN p.t2 - c.t1 <= 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS purchased_1h
       |FROM v
       |LEFT JOIN c ON c.user_id = v.user_id
       |LEFT JOIN p ON p.user_id = v.user_id""".stripMargin

  // Spark side: ONE events scan. The SQL spelling's CTE chain (v→c→p)
  // inlines to SIX events scans (v=1, c=2, p=3 — each step re-executes
  // its predecessors), which the default-on ScanBudgetRule rejects at
  // sf-independent plan level. The one-pass form: filter to the three
  // funnel types map-side, ONE user_id exchange, then three CHAINED
  // unordered windows over the same partitioning (t0 = first view,
  // t1 = first click after t0, t2 = first purchase after t1 — each
  // window may reference the previous column, and min-over-unbounded
  // needs no sort, so all three ride the single exchange). Semantics
  // identical: a null t0 nulls the t1 comparison (SQL's inner join on
  // v), and the 1-hour CASEs map nulls to 0 exactly as the oracle's
  // left joins do.
  private val funnelSteps = QueryDef(
    "ev10_funnel_steps",
    Some(funnelStepsSql(e => s"epoch_us($e)")),
    (s, dir) => {
      val w = Window.partitionBy("user_id")
      val staged = Tables.table(s, dir, "events")
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(ts)").as("us"))
        .withColumn("t0",
          min(when(col("event_type") === "view", col("us"))).over(w))
        .withColumn("t1",
          min(when(col("event_type") === "click" && col("us") > col("t0"),
            col("us"))).over(w))
        .withColumn("t2",
          min(when(col("event_type") === "purchase" && col("us") > col("t1"),
            col("us"))).over(w))
      staged.groupBy("user_id")
        .agg(max("t0").as("t0"), max("t1").as("t1"), max("t2").as("t2"))
        .filter(col("t0").isNotNull)
        .agg(count(lit(1)).cast("long").as("viewers"),
          count(col("t1")).cast("long").as("clicked"),
          sum(when(col("t1") - col("t0") <= 3600000000L, 1).otherwise(0))
            .cast("long").as("clicked_1h"),
          count(col("t2")).cast("long").as("purchased"),
          sum(when(col("t2") - col("t1") <= 3600000000L, 1).otherwise(0))
            .cast("long").as("purchased_1h"))
    })

  /** One streaming step of the SCD2 interval build (ev8's streaming
    * face — the CDC-processing form: a change stream arrives in
    * time-ordered micro-batches and the dimension's closed validity
    * intervals append continuously, with exactly one OPEN interval per
    * user held as state). Given the open-interval FRONTIER
    * (user_id, version, state, valid_from, n_events) and a batch,
    * returns (closed intervals to append, new frontier).
    *
    * Mechanics: the batch collapses to maximal runs (the ev8
    * gaps-and-islands), the frontier joins in as run 0, and a SECOND
    * gaps-and-islands pass over the per-user run sequence merges the
    * one place a boundary can continue a run (frontier.state == first
    * batch state) — uniform, so a user absent from the batch passes
    * through untouched. Version numbers stay continuous: the merged
    * run inherits the frontier's version, later runs increment.
    * State is one open interval per user (the stream's key
    * cardinality); closed intervals leave the operator per batch and
    * are never revisited — replaying the closed output plus the final
    * frontier reproduces the batch operator exactly (StreamingSpec
    * parity over time-ordered splits). */
  private[graft] def scd2Step(
      frontier: Option[org.apache.spark.sql.DataFrame],
      batch: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val batchRuns = batch.select("user_id", "event_type", "ts", "event_id")
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("brk", when(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"), 1).otherwise(0))
      .withColumn("run_id",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "run_id")
      .agg(max(col("event_type")).as("state"), // constant within a run
        min(col("ts")).as("valid_from"),
        count(lit(1)).cast("long").as("n_events"))
    val fr = frontier.map(_.select(col("user_id"), lit(0L).as("run_id"),
      col("state"), col("valid_from"), col("n_events"), col("version")))
    val seqd = batchRuns.withColumn("version", lit(null).cast("long"))
      .select("user_id", "run_id", "state", "valid_from", "n_events", "version")
      .unionByName(fr.getOrElse(batchRuns.limit(0)
        .select("user_id", "run_id", "state", "valid_from", "n_events")
        .withColumn("version", lit(null).cast("long"))))
    val w2 = Window.partitionBy("user_id").orderBy("run_id")
    val merged = seqd
      .withColumn("prev_state", lag(col("state"), 1).over(w2))
      .withColumn("brk", when(col("prev_state").isNull ||
        col("prev_state") =!= col("state"), 1).otherwise(0))
      .withColumn("mrun",
        sum(col("brk")).over(w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "mrun")
      .agg(max(col("state")).as("state"), min(col("valid_from")).as("valid_from"),
        sum(col("n_events")).cast("long").as("n_events"),
        min(col("version")).as("base0")) // non-null only on the frontier run
    val w3 = Window.partitionBy("user_id")
    val versioned = merged
      // the frontier (mrun 1 when present) carries the version base;
      // a frontier-less user starts at 1
      .withColumn("base", coalesce(min(col("base0")).over(w3), lit(1L)))
      .withColumn("version", col("base") + col("mrun") - 1)
      .withColumn("valid_to",
        lead(col("valid_from"), 1).over(w3.orderBy("mrun")))
      .withColumn("last", col("mrun") === max(col("mrun")).over(w3))
    val closed = versioned.filter(!col("last"))
      .select(col("user_id"), col("version"), col("state"), col("valid_from"),
        col("valid_to"), col("n_events"))
    val newFrontier = versioned.filter(col("last"))
      .select(col("user_id"), col("version"), col("state"), col("valid_from"),
        col("n_events"))
    (closed, newFrontier)
  }

  /** One streaming step of the session-scoped transition matrix (ev9's
    * streaming face, driven by [[graft.streaming.Streaming
    * .transitionStream]]): given the per-user FRONTIER — the last seen
    * event per user from prior batches — and a new time-ordered batch,
    * returns (transition partial counts, new frontier). The frontier
    * supplies exactly the cross-batch boundary transition the in-batch
    * lag cannot see; its own earlier transitions were counted when it
    * was the batch. State is one row per user (the stream's natural
    * key cardinality) plus the constant |types|² matrix — bounded
    * regardless of stream length, and the count merge is plain
    * addition (associative + commutative), so the standing matrix
    * updates cell-wise like the CMS sketch. Parity with the batch
    * operator over any time-ordered micro-batch split is locked in
    * StreamingSpec. */
  private[graft] def transitionStep(
      frontier: Option[org.apache.spark.sql.DataFrame],
      batch: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val cols = Seq("user_id", "event_type", "ts", "event_id").map(col)
    val slice = batch.select(cols: _*)
    val all = frontier.map(f => slice.unionByName(f.select(cols: _*)))
      .getOrElse(slice)
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val lagged = all
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
    val partial = lagged
      .filter(col("prev_type").isNotNull && col("gap_us") <= 1800000000L)
      .groupBy(col("prev_type").as("from_state"), col("event_type").as("to_state"))
      .agg(count(lit(1)).cast("long").as("n"))
    // keep-latest per user: struct-max partial agg, no window sort
    val newFrontier = all.groupBy("user_id")
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("m"))
      .select(col("user_id"), col("m.event_type").as("event_type"),
        col("m.ts").as("ts"), col("m.event_id").as("event_id"))
    (partial, newFrontier)
  }

  // ---- ev11: hopping (sliding) window rollup -----------------------------
  // Overlapping 1-hour windows sliding every 15 minutes — the standard
  // "smooth rate" dashboard aggregation, stated Spark-natively with
  // `window(ts, '1 hour', '15 minutes')` (each event lands in exactly
  // 4 windows; Catalyst expands it map-side and the count/sum combine
  // partially before the single window_start exchange). The oracle
  // restates the same semantics arithmetically: the 4 containing
  // window starts are time_bucket(15 min, ts) − k·15 min for k = 0..3
  // — both engines' buckets are epoch-aligned, so the starts agree
  // exactly. 100 TB shape: output is (time-range / slide) rows per
  // type, independent of corpus size; the only corpus-sized work is
  // the partial agg before the exchange.
  private val hopping = QueryDef(
    "ev11_hopping_window",
    Some("""SELECT start AS window_start, count(*) AS n,
           |       round(sum(value), 2) AS total
           |FROM (
           |  SELECT time_bucket(INTERVAL 15 minutes, ts)
           |           - k.k * INTERVAL '15 minutes' AS start, value
           |  FROM events, range(0, 4) k(k)
           |  WHERE event_type = 'purchase')
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, dir) => {
      import org.apache.spark.sql.functions._
      Tables.table(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .select(col("w.start").as("window_start"), col("n"), col("total"))
        .orderBy("window_start")
    })

  // ---- ev12: gap-fill + linear interpolation -----------------------------
  // Dense hourly spine per event type with missing hours linearly
  // interpolated between the neighboring observed hours — the
  // time-series repair step every monitoring/feature pipeline needs
  // before resampling. All arithmetic is exact-integer: hour index =
  // epoch_us div 3600e6 (BIGINT floor-div in both engines), and the
  // interpolated value is the integer-micro rounding of
  // (pn·(nh−h) + nn·(h−ph)) · 1e6 / (nh−ph) with identical
  // parenthesization. Neighbors come from IGNORE-NULLS running
  // first/last over the spine — windows partition on event_type and
  // the spine is (time-range × types)-sized, so at 100 TB the only
  // corpus-scale work is the hourly partial agg before one exchange;
  // the spine/window stage is constant-bounded by the calendar.
  private val gapfill = QueryDef(
    "ev12_gapfill_interpolate",
    Some("""WITH c AS (
           |  SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS n
           |  FROM events GROUP BY 1, 2),
           |b AS (SELECT event_type, min(h) AS mn, max(h) AS mx FROM c GROUP BY 1),
           |s AS (SELECT event_type, unnest(generate_series(mn, mx)) AS h FROM b),
           |j AS (
           |  SELECT s.event_type, s.h, c.n FROM s
           |  LEFT JOIN c ON c.event_type = s.event_type AND c.h = s.h),
           |f AS (
           |  SELECT event_type, h, n,
           |    last_value(CASE WHEN n IS NOT NULL THEN h END IGNORE NULLS)
           |      OVER (PARTITION BY event_type ORDER BY h
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
           |    last_value(CASE WHEN n IS NOT NULL THEN n END IGNORE NULLS)
           |      OVER (PARTITION BY event_type ORDER BY h
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pn,
           |    first_value(CASE WHEN n IS NOT NULL THEN h END IGNORE NULLS)
           |      OVER (PARTITION BY event_type ORDER BY h
           |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh,
           |    first_value(CASE WHEN n IS NOT NULL THEN n END IGNORE NULLS)
           |      OVER (PARTITION BY event_type ORDER BY h
           |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nn
           |  FROM j)
           |SELECT event_type, h,
           |       CASE WHEN n IS NOT NULL THEN 'obs' ELSE 'fill' END AS src,
           |       CASE WHEN n IS NOT NULL THEN n * 1000000
           |            ELSE CAST(round((pn * (nh - h) + nn * (h - ph)) * 1000000.0
           |                            / (nh - ph), 0) AS BIGINT)
           |       END AS n_u6
           |FROM f ORDER BY event_type, h""".stripMargin),
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val c = Tables.table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("h"))
        .agg(count(lit(1)).as("n"))
      val spine = c.groupBy("event_type")
        .agg(min("h").as("mn"), max("h").as("mx"))
        .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("h"))
      val j = spine.join(c, Seq("event_type", "h"), "left")
      val back = Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fwd = Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val present = col("n").isNotNull
      j.withColumn("ph", last(when(present, col("h")), ignoreNulls = true).over(back))
        .withColumn("pn", last(when(present, col("n")), ignoreNulls = true).over(back))
        .withColumn("nh", first(when(present, col("h")), ignoreNulls = true).over(fwd))
        .withColumn("nn", first(when(present, col("n")), ignoreNulls = true).over(fwd))
        .select(col("event_type"), col("h"),
          when(present, lit("obs")).otherwise(lit("fill")).as("src"),
          when(present, col("n") * lit(1000000L))
            .otherwise(round((col("pn") * (col("nh") - col("h"))
              + col("nn") * (col("h") - col("ph"))) * lit(1000000.0)
              / (col("nh") - col("ph")), 0).cast("long")).as("n_u6"))
        .orderBy("event_type", "h")
    })

  // ---- ev13: time-weighted average ---------------------------------------
  // The signal-processing mean for irregularly-sampled series: each
  // observation is weighted by how long it REMAINED the current value
  // (until the next event of its type) — the standard rate/gauge
  // aggregation downsampling pipelines need, where a plain avg
  // over-weights bursts. All arithmetic is exact-integer: value
  // rounds to micro-units once per row, the interval is an integer
  // floor-div to milliseconds, and only integer products/sums combine
  // (order-independent). Overflow headroom is time-range-bounded, not
  // corpus-bounded: Σ(v_u6·gap_ms) ≤ max_v_u6 · total-range-ms
  // (≈1.3e18 here) regardless of row count, so the BIGINT sum is safe
  // at any SF. One lead window per type, then a partial-combined agg.
  private def twaSql(epochFn: String => String, intDiv: String) =
    s"""WITH o AS (
       |  SELECT event_type, value,
       |         ${epochFn("ts")} AS t_us,
       |         ${epochFn("lead(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id)")} AS nxt_us
       |  FROM events),
       |i AS (
       |  SELECT event_type,
       |         CAST(round(value * 1000000.0) AS BIGINT) AS v_u6,
       |         (nxt_us - t_us) $intDiv 1000 AS gap_ms
       |  FROM o WHERE nxt_us IS NOT NULL),
       |a AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_intervals,
       |         CAST(sum(v_u6 * gap_ms) AS BIGINT) AS su,
       |         CAST(sum(gap_ms) AS BIGINT) AS sg
       |  FROM i GROUP BY event_type)
       |SELECT event_type, n_intervals,
       |       CAST(round(CAST(su AS DOUBLE) / sg, 0) AS BIGINT) AS twa_u6
       |FROM a ORDER BY event_type""".stripMargin

  private val twa = QueryDef(
    "ev13_time_weighted_avg",
    Some(twaSql(e => s"epoch_us($e)", "//")),
    (s, dir) => Tables.sql(s, dir, twaSql(e => s"unix_micros($e)", "div")))

  // ---- ev14: session path mining -----------------------------------------
  // The journey-analysis classic: the most common 3-step event paths
  // WITHIN sessions (30-min inactivity rule, the ev2 constant). The
  // session index is the gaps-and-islands running sum; the trigram
  // window partitions on (user, session) so a path can never straddle
  // a session break by construction — no post-filter on session
  // equality is needed, the partition boundary IS the rule. Both
  // engines run the identical text (modulo the epoch spelling); the
  // top-10 collapses through TakeOrderedAndProject, never a global
  // sort. Scale: two user-keyed window passes (high-cardinality key)
  // and one trigram partial agg over a constant-bounded key space
  // (|types|³).
  private def pathsSql(epochFn: String => String) =
    s"""WITH o AS (
       |  SELECT user_id, event_type, ts, event_id,
       |         CASE WHEN ${epochFn("ts")} - ${epochFn(
      "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)")} > 1800000000
       |              THEN 1 ELSE 0 END AS brk
       |  FROM events),
       |s AS (
       |  SELECT user_id, event_type, ts, event_id,
       |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                        ROWS UNBOUNDED PRECEDING) AS sess
       |  FROM o),
       |p AS (
       |  SELECT event_type AS e1,
       |         lead(event_type, 1) OVER (PARTITION BY user_id, sess
       |                                   ORDER BY ts, event_id) AS e2,
       |         lead(event_type, 2) OVER (PARTITION BY user_id, sess
       |                                   ORDER BY ts, event_id) AS e3
       |  FROM s)
       |SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
       |FROM p WHERE e2 IS NOT NULL AND e3 IS NOT NULL
       |GROUP BY e1, e2, e3
       |ORDER BY n DESC, e1, e2, e3 LIMIT 10""".stripMargin

  private val sessionPaths = QueryDef(
    "ev14_session_paths",
    Some(pathsSql(e => s"epoch_us($e)")),
    (s, dir) => Tables.sql(s, dir, pathsSql(e => s"unix_micros($e)")))

  // ---- ev15: point-in-time dimension lookup over the SCD2 build ----------
  // The consumption side of ev8: "what was each user's state AS OF
  // time T" — the temporal join every fact-to-dimension enrichment
  // with history needs. Three probe instants cross-join (broadcast,
  // constant side) onto the interval table and containment
  // `valid_from <= T < valid_to` (open-ended for the current run)
  // selects exactly one version per (user, probe) — uniqueness is a
  // THEOREM of ev8's contiguous maximal runs, asserted by the gate's
  // row count. At 100 TB the interval table is the compact dimension
  // (runs, not events); the probe set is constant — no corpus-sized
  // work beyond the ev8 build itself.
  private val pitSql = scd2CoreSql + """,
    |probes AS (SELECT CAST(pt AS TIMESTAMP) AS pt FROM (
    |  SELECT TIMESTAMP '2024-01-08 00:00:00' AS pt
    |  UNION ALL SELECT TIMESTAMP '2024-01-15 00:00:00'
    |  UNION ALL SELECT TIMESTAMP '2024-01-22 00:00:00') t)
    |SELECT p.pt, f.user_id, CAST(f.run_id AS BIGINT) AS version, f.state
    |FROM f JOIN probes p
    |  ON f.valid_from <= p.pt AND (f.valid_to IS NULL OR f.valid_to > p.pt)
    |WHERE f.user_id <= 50
    |ORDER BY p.pt, f.user_id""".stripMargin

  private val pointInTime = QueryDef(
    "ev15_scd2_point_in_time",
    Some(pitSql),
    (s, dir) => Tables.sql(s, dir, pitSql))

  // ---- ev16: deterministic experiment assignment ------------------------
  // The A/B bucketing every product-analytics pipeline runs: variant is
  // a pure function of the unit id (md5-hex threshold — the
  // source_mix_sample discipline), so assignment is reproducible across
  // reruns, engines, and backfills, and needs no assignment table. The
  // readout is per-variant users / events / converters / revenue — the
  // inputs to any downstream test statistic (SRM is visible as the
  // n_users split, conversion lift as n_converted/n_users).
  //
  // 100 TB shape: assignment is map-side hash arithmetic; the per-user
  // collapse is one (user) partial agg; the final 2-row rollup combines
  // per-variant partials. No corpus-sized join — `assign` is derived
  // from events itself, so Spark plans the USING join as an aggregate
  // reuse (distinct users), never a second scan of raw events.
  private val abAssign = QueryDef(
    "ev16_ab_assignment",
    Some("""WITH assign AS (
           |  SELECT DISTINCT user_id,
           |         CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 8) < '80000000'
           |              THEN 'control' ELSE 'treatment' END AS variant
           |  FROM events),
           |m AS (
           |  SELECT a.variant, e.user_id,
           |         count(*) AS n_events,
           |         count(*) FILTER (WHERE e.event_type = 'purchase') AS n_purch,
           |         CAST(sum(CASE WHEN e.event_type = 'purchase'
           |              THEN CAST(round(e.value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS rev_cents
           |  FROM events e JOIN assign a USING (user_id)
           |  GROUP BY a.variant, e.user_id)
           |SELECT variant, count(*) AS n_users,
           |       CAST(sum(n_events) AS BIGINT) AS n_events,
           |       CAST(count(*) FILTER (WHERE n_purch > 0) AS BIGINT) AS n_converted,
           |       CAST(sum(rev_cents) AS BIGINT) AS rev_cents
           |FROM m GROUP BY variant ORDER BY variant""".stripMargin),
    (s, dir) => Tables.sql(s, dir,
      """WITH assign AS (
        |  SELECT DISTINCT user_id,
        |         CASE WHEN substr(md5(CAST(user_id AS STRING)), 1, 8) < '80000000'
        |              THEN 'control' ELSE 'treatment' END AS variant
        |  FROM events),
        |m AS (
        |  SELECT a.variant, e.user_id,
        |         count(*) AS n_events,
        |         count(*) FILTER (WHERE e.event_type = 'purchase') AS n_purch,
        |         CAST(sum(CASE WHEN e.event_type = 'purchase'
        |              THEN CAST(round(e.value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS rev_cents
        |  FROM events e JOIN assign a USING (user_id)
        |  GROUP BY a.variant, e.user_id)
        |SELECT variant, count(*) AS n_users,
        |       CAST(sum(n_events) AS BIGINT) AS n_events,
        |       CAST(count(*) FILTER (WHERE n_purch > 0) AS BIGINT) AS n_converted,
        |       CAST(sum(rev_cents) AS BIGINT) AS rev_cents
        |FROM m GROUP BY variant ORDER BY variant""".stripMargin))

  // ---- ev17: DAU / rolling-7d WAU / stickiness --------------------------
  // Exact DAU and WAU come from the (day, user) distinct collapse; the
  // 7-day window joins the 30-row day spine against that collapse, so
  // the expansion is ≤7× a deduplicated frame, never raw events. The
  // scale path rides alongside and is gated like a8: per-day HLL
  // sketches (map-side mergeable partials over events) roll up by
  // UNIONING 7 sketches per spine day — 210 sketch rows instead of
  // re-shuffling user ids per window — and approx_ok asserts the
  // estimate lands within 10% of the exact count (2% sketches; the
  // oracle states the exact arithmetic and a literal true).
  // Stickiness is integer ppm (exact integer division, engine-exact).
  //
  // The (day, user) collapse is CHECKPOINTED once per (session, dir,
  // generation): the SQL spelling referenced it from four CTEs (days,
  // dau, roll, sk), which inlining turned into FIVE events scans —
  // rejected by the default-on ScanBudgetRule. Every consumer below
  // reads the standing deduplicated frame; the corpus is scanned once,
  // inside the memoized build.
  private val udCache =
    new graft.operators.DirMemo[org.apache.spark.sql.DataFrame]()

  private val stickiness = QueryDef(
    "ev17_dau_wau_stickiness",
    Some("""WITH ud AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id FROM events),
           |days AS (SELECT DISTINCT d FROM ud),
           |dau AS (SELECT d, count(*) AS dau FROM ud GROUP BY d),
           |roll AS (
           |  SELECT d1.d, count(DISTINCT u.user_id) AS wau
           |  FROM days d1 JOIN ud u ON u.d BETWEEN d1.d - 6 AND d1.d
           |  GROUP BY d1.d)
           |SELECT dau.d, CAST(dau.dau AS BIGINT) AS dau, CAST(roll.wau AS BIGINT) AS wau,
           |       CAST((dau.dau * 1000000) // roll.wau AS BIGINT) AS stickiness_ppm,
           |       true AS approx_ok
           |FROM dau JOIN roll ON dau.d = roll.d ORDER BY dau.d""".stripMargin),
    (s, dir) => {
      val ud = udCache.getOrElseUpdate(s, dir) {
        Tables.table(s, dir, "events")
          .select(expr("CAST(date_trunc('day', ts) AS DATE)").as("d"),
            col("user_id"))
          .distinct().localCheckpoint(true)
      }
      val spine = broadcast(ud.select(col("d").as("d1")).distinct())
      val dau = ud.groupBy("d").agg(count(lit(1)).cast("long").as("dau"))
      val roll = spine
        .join(ud, col("d").between(date_sub(col("d1"), 6), col("d1")))
        .groupBy("d1").agg(countDistinct(col("user_id")).cast("long").as("wau"))
      val sk = ud.groupBy("d").agg(expr("hll_sketch_agg(user_id)").as("s"))
      val ra = spine.withColumnRenamed("d1", "d2")
        .join(sk, col("d").between(date_sub(col("d2"), 6), col("d2")))
        .groupBy("d2")
        .agg(expr("hll_sketch_estimate(hll_union_agg(s))").as("wau_approx"))
      dau.join(roll, col("d") === col("d1")).join(ra, col("d") === col("d2"))
        .select(col("d"), col("dau"), col("wau"),
          expr("CAST(CAST(dau AS DECIMAL(38,0)) * 1000000 div wau AS BIGINT)")
            .as("stickiness_ppm"),
          expr("abs(wau_approx - wau) <= CAST(ceil(0.1 * wau) AS BIGINT)")
            .as("approx_ok"))
        .orderBy("d")
    })

  // ---- ev18: cohort lifetime value --------------------------------------
  // Revenue by (signup-week cohort, age-in-weeks) — the LTV grid growth
  // teams read. Cohort is the week of each user's FIRST event (one
  // user-level partial-min agg), age is exact integer week arithmetic
  // on week-truncated dates, revenue in integer cents. The corpus-sized
  // work is two partial aggs on user_id; the grid itself is
  // weeks² rows.
  private val cohortLtv = QueryDef(
    "ev18_cohort_ltv",
    Some("""WITH fe AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_w
           |           FROM events GROUP BY user_id),
           |ev AS (SELECT e.user_id, fe.cohort_w,
           |         CAST(datediff('day', fe.cohort_w, CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS BIGINT) AS age_w,
           |         CASE WHEN e.event_type = 'purchase' THEN CAST(round(e.value * 100) AS BIGINT) ELSE 0 END AS cents
           |       FROM events e JOIN fe USING (user_id))
           |SELECT cohort_w, age_w, CAST(count(DISTINCT user_id) AS BIGINT) AS active_users,
           |       CAST(sum(cents) AS BIGINT) AS rev_cents
           |FROM ev GROUP BY cohort_w, age_w ORDER BY cohort_w, age_w""".stripMargin),
    (s, dir) => Tables.sql(s, dir,
      """WITH fe AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_w
        |           FROM events GROUP BY user_id),
        |ev AS (SELECT e.user_id, fe.cohort_w,
        |         CAST(datediff(CAST(date_trunc('week', e.ts) AS DATE), fe.cohort_w) div 7 AS BIGINT) AS age_w,
        |         CASE WHEN e.event_type = 'purchase' THEN CAST(round(e.value * 100) AS BIGINT) ELSE 0 END AS cents
        |       FROM events e JOIN fe USING (user_id))
        |SELECT cohort_w, age_w, CAST(count(DISTINCT user_id) AS BIGINT) AS active_users,
        |       CAST(sum(cents) AS BIGINT) AS rev_cents
        |FROM ev GROUP BY cohort_w, age_w ORDER BY cohort_w, age_w""".stripMargin))

  // ---- ev19: time-to-convert percentiles --------------------------------
  // First view → first subsequent purchase, per user, summarized as
  // interpolated percentiles (the a7-proven quantile_cont/percentile
  // parity) over EXACT integer seconds — the delta is stated in epoch
  // microseconds with floor division on both engines, because
  // DuckDB's datediff('second') counts boundary crossings while
  // Spark's timestampdiff truncates the interval (a measured ±1 s
  // divergence on sub-second timestamps).
  private val timeToConvert = QueryDef(
    "ev19_time_to_convert",
    Some("""WITH v AS (SELECT user_id, min(ts) AS first_view FROM events
           |           WHERE event_type = 'view' GROUP BY user_id),
           |p AS (SELECT e.user_id, min(e.ts) AS first_purchase
           |      FROM events e JOIN v USING (user_id)
           |      WHERE e.event_type = 'purchase' AND e.ts > v.first_view
           |      GROUP BY e.user_id),
           |d AS (SELECT v.user_id,
           |        CAST((epoch_us(p.first_purchase) - epoch_us(v.first_view)) // 1000000 AS BIGINT) AS sec
           |      FROM v JOIN p USING (user_id))
           |SELECT CAST(count(*) AS BIGINT) AS n_users,
           |  CAST(round(quantile_cont(sec, 0.5)) AS BIGINT) AS p50_sec,
           |  CAST(round(quantile_cont(sec, 0.9)) AS BIGINT) AS p90_sec,
           |  CAST(min(sec) AS BIGINT) AS min_sec, CAST(max(sec) AS BIGINT) AS max_sec
           |FROM d""".stripMargin),
    (s, dir) => Tables.sql(s, dir,
      """WITH v AS (SELECT user_id, min(ts) AS first_view FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS first_purchase
        |      FROM events e JOIN v USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts > v.first_view
        |      GROUP BY e.user_id),
        |d AS (SELECT v.user_id,
        |        CAST((unix_micros(p.first_purchase) - unix_micros(v.first_view)) div 1000000 AS BIGINT) AS sec
        |      FROM v JOIN p USING (user_id))
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(round(percentile(sec, 0.5D)) AS BIGINT) AS p50_sec,
        |  CAST(round(percentile(sec, 0.9D)) AS BIGINT) AS p90_sec,
        |  CAST(min(sec) AS BIGINT) AS min_sec, CAST(max(sec) AS BIGINT) AS max_sec
        |FROM d""".stripMargin))

  // ---- ev20: behavioral entropy per user --------------------------------
  // Shannon entropy of each user's event-type distribution — the
  // diversity feature behavioral models consume (a bot hammers one
  // type, entropy ≈ 0; an engaged user spreads across types). Counts
  // are exact integers; each type's −p·ln(p) term rounds to integer
  // NANO-units before the per-user sum, so the only float op is one
  // ln per (user, type) row and the sum is order-independent — the
  // surprisal/KL discipline. Two partial aggs on user_id, no window.
  private val userEntropy = sqlQuery(
    "ev20_user_entropy",
    """WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY user_id, event_type),
      |t AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY user_id),
      |e AS (SELECT c.user_id,
      |        CAST(sum(CAST(round(-1e9 * (c.c * 1.0 / t.n) * ln(c.c * 1.0 / t.n)) AS BIGINT)) AS BIGINT) AS ent_nano
      |      FROM c JOIN t USING (user_id) GROUP BY c.user_id)
      |SELECT user_id, ent_nano FROM e ORDER BY user_id LIMIT 100""".stripMargin)

  // ---- ev21: MAD-robust outlier hours -----------------------------------
  // The robust complement of ev6's 3σ z-test: median absolute
  // deviation tolerates the contamination that inflates a standard
  // deviation (one huge hour widens σ until nothing is anomalous; the
  // median barely moves). Medians use the a7-proven interpolation
  // parity over exact integer counts, so the 3·MAD comparison is on
  // bit-identical doubles in both engines. Corpus work is one hourly
  // partial agg; the two median passes run over the (type, hour) frame.
  private def madSql(pct: (String, String) => String) =
    s"""WITH h AS (SELECT event_type, cast(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
       |                  CAST(count(*) AS BIGINT) AS c
       |           FROM events GROUP BY 1, 2),
       |med AS (SELECT event_type, ${pct("c", "0.5")} AS med FROM h GROUP BY event_type),
       |dev AS (SELECT h.event_type, h.hr, h.c, abs(h.c - med.med) AS ad
       |        FROM h JOIN med USING (event_type)),
       |m2 AS (SELECT event_type, ${pct("ad", "0.5")} AS mad FROM dev GROUP BY event_type)
       |SELECT d.event_type, d.hr, d.c,
       |       CAST(round(d.ad * 1000) AS BIGINT) AS ad_milli
       |FROM dev d JOIN m2 USING (event_type)
       |WHERE d.ad > 3 * m2.mad AND m2.mad > 0
       |ORDER BY d.event_type, d.hr""".stripMargin

  private val madOutliers = QueryDef(
    "ev21_mad_outliers",
    Some(madSql((x, q) => s"quantile_cont($x, $q)")),
    // r14: the CTE spelling re-ran the hourly corpus aggregate once per
    // reference (4 events scans in the plan audit — med, dev×2, final).
    // The (type, hour, count) frame is dimension-sized, so it
    // checkpoints once (the ev22/klStFrame discipline) and the median /
    // deviation / MAD passes all derive from it — ONE corpus pass.
    (s, dir) => {
      val h = Tables.sql(s, dir,
        """SELECT event_type, cast(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
          |       CAST(count(*) AS BIGINT) AS c
          |FROM events GROUP BY 1, 2""".stripMargin)
        .localCheckpoint()
      val med = h.groupBy("event_type")
        .agg(expr("percentile(c, 0.5D)").as("med"))
      val dev = h.join(broadcast(med), "event_type")
        .select(col("event_type"), col("hr"), col("c"),
          abs(col("c") - col("med")).as("ad"))
      val m2 = dev.groupBy("event_type")
        .agg(expr("percentile(ad, 0.5D)").as("mad"))
      dev.join(broadcast(m2), "event_type")
        .filter(col("ad") > lit(3) * col("mad") && col("mad") > lit(0))
        .select(col("event_type"), col("hr"), col("c"),
          expr("CAST(round(ad * 1000) AS BIGINT)").as("ad_milli"))
        .orderBy("event_type", "hr")
    })

  // ---- ev22: join-key skew profile ---------------------------------------
  // The diagnostic that decides whether a join needs the salted path
  // ([[graft.operators.SkewJoin]]): per-key cardinality of the join
  // key, the heavy-hitter head, each key's corpus share, and its ratio
  // to the mean — all exact integers. `hot_key` is the salting trigger
  // (≥ 4× the mean, cross-multiplied so no division ever rounds);
  // a pipeline reads this BEFORE planning the big join and routes hot
  // keys through the salt/broadcast split.
  //
  // 100 TB shape: one partial-combining count keyed on user_id (the
  // only corpus-sized shuffle — identical to what the join itself
  // would pay), materialized ONCE per (session, dir) — Spark inlines
  // CTEs, so the naive spelling re-scans events for the totals row
  // (the kl_divergence one-pass discipline; the key-cardinality frame
  // is two longs per key, cheap to checkpoint). The (total, n_keys)
  // rollup and the TakeOrdered top-10 head both derive from that
  // frame; the 1-row totals broadcast back (nested-loop, never a
  // corpus cartesian).
  private val skewCache =
    new graft.operators.DirMemo[org.apache.spark.sql.DataFrame]()

  private val skewProfile = QueryDef(
    "ev22_key_skew_profile",
    Some("""WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
           |g AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
           |             CAST(count(*) AS BIGINT) AS n_keys FROM c),
           |top AS (SELECT user_id, cnt FROM c ORDER BY cnt DESC, user_id LIMIT 10)
           |SELECT t.user_id, CAST(t.cnt AS BIGINT) AS cnt,
           |       CAST(CAST(t.cnt AS HUGEINT) * 1000000 // g.total AS BIGINT)
           |         AS share_ppm,
           |       CAST(CAST(t.cnt AS HUGEINT) * g.n_keys * 1000000 // g.total
           |            AS BIGINT) AS x_mean_ppm,
           |       CAST(t.cnt AS HUGEINT) * g.n_keys >= CAST(4 AS HUGEINT) * g.total
           |         AS hot_key
           |FROM top t CROSS JOIN g ORDER BY cnt DESC, user_id""".stripMargin),
    (s, dir) => {
      val c = skewCache.getOrElseUpdate(s, dir) {
        Tables.table(s, dir, "events")
          .groupBy("user_id").agg(count(lit(1)).as("cnt"))
          .localCheckpoint(true)
      }
      val g = c.agg(sum("cnt").cast("long").as("total"),
        count(lit(1)).cast("long").as("n_keys"))
      // DECIMAL(38,0) hoists (the ppm overflow class): cnt·n_keys·10⁶
      // clears BIGINT once cnt·n_keys > 9.2e12 — e.g. a 1e7-row hot
      // key over 1e6 distinct keys, exactly the regime this profile
      // exists to catch
      c.orderBy(col("cnt").desc, col("user_id")).limit(10)
        .crossJoin(broadcast(g))
        .select(col("user_id"), col("cnt"),
          expr("CAST(CAST(cnt AS DECIMAL(38,0)) * 1000000 div total AS BIGINT)")
            .as("share_ppm"),
          expr("CAST(CAST(cnt AS DECIMAL(38,0)) * n_keys * 1000000 div total " +
            "AS BIGINT)").as("x_mean_ppm"),
          expr("CAST(cnt AS DECIMAL(38,0)) * n_keys >= " +
            "CAST(4 AS DECIMAL(38,0)) * total").as("hot_key"))
        .orderBy(col("cnt").desc, col("user_id"))
    })

  // ---- ev23: PSI drift between time windows ------------------------------
  // Population Stability Index over the event-type mix, first half of
  // the month vs second — the standard "did the traffic distribution
  // shift" monitor (PSI_i = (p2-p1)·ln(p2/p1), Σ < 0.1 stable). Shares
  // [[CurationQueries]]' KL float discipline: proportions are exact
  // integer ppm; the single ln per EVENT-TYPE row (5 rows, not corpus
  // rows) rounds to integer micro-units with identical
  // parenthesization in both engines. Types absent from either window
  // are excluded (PSI is undefined at p=0), and so are types whose
  // ppm-quantized share rounds to 0 (n_i > 0 but n_i*1e6 < total):
  // ln(x/0) is Infinity, which Spark saturates while DuckDB errors on
  // the BIGINT cast — a data-dependent divergence on large skewed
  // windows, so the exclusion is on the quantized shares, not the raw
  // counts.
  //
  // 100 TB shape: the window split is a map-side boolean on the
  // timestamp; ONE partial-combining aggregate keyed on event_type
  // carries conditional-count partials for both windows in the same
  // pass (no second scan, no join of two filtered aggregates); the
  // totals are window sums OVER the aggregated type frame — a Window
  // over ≤|event types| rows (type-cardinality, not corpus), which
  // keeps the whole query one events pass even with CTE inlining.
  private def psiSql(idiv: String) =
    s"""WITH e AS (SELECT event_type,
       |             ts < TIMESTAMP '2024-01-16 00:00:00' AS w1 FROM events),
       |c AS (SELECT event_type,
       |        count(*) FILTER (WHERE w1) AS n1,
       |        count(*) FILTER (WHERE NOT w1) AS n2
       |      FROM e GROUP BY event_type),
       |p AS (SELECT event_type, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       |        CAST((n1 * 1000000) $idiv (sum(n1) OVER ()) AS BIGINT) AS p1_ppm,
       |        CAST((n2 * 1000000) $idiv (sum(n2) OVER ()) AS BIGINT) AS p2_ppm
       |      FROM c)
       |SELECT event_type, n1, n2, p1_ppm, p2_ppm,
       |  CAST(round((p2_ppm - p1_ppm) / 1000000.0 *
       |             ln(CAST(p2_ppm AS DOUBLE) / p1_ppm) * 1000000.0) AS BIGINT)
       |    AS psi_micro
       |FROM p WHERE p1_ppm > 0 AND p2_ppm > 0 ORDER BY event_type""".stripMargin

  private val psiDrift = QueryDef(
    "ev23_psi_drift_windows",
    Some(psiSql("//")),
    (s, dir) => Tables.sql(s, dir, psiSql("div")))

  // ---- ev24: sample-ratio-mismatch check ---------------------------------
  // The guardrail that must pass before ev16's A/B readout is
  // trustworthy: under a 50/50 split, the assignment counts follow a
  // 1-df chi-square with the closed form χ² = (c−t)²/(c+t) — EXACT as
  // a rational, so the micro-unit statistic and the 0.05-level verdict
  // (χ² > 3.841459) are pure integer arithmetic cross-multiplied
  // against the threshold: no double ever enters. The squared
  // difference is hoisted to DECIMAL(38,0)/HUGEINT per the ppm
  // overflow discipline — at 100 TB (c−t)²·10⁶ clears BIGINT.
  //
  // 100 TB shape: assignment is the same map-side md5 arithmetic as
  // ev16; the distinct-user collapse is one partial agg; the verdict
  // is a 1-row rollup. Nothing corpus-sized survives the first
  // exchange.
  /** The canonical md5 50/50 A/B assignment — ONE definition shared
    * by ev24's SQL and the streaming SRM guardrail
    * ([[graft.streaming.Streaming.srmMonitorStream]]), so the monitor
    * provably watches the same population as the exact batch check it
    * escalates to (r12 review: the expression was triplicated).
    * ev16/ev25 carry the same split spelled inline in their
    * stripMargin layouts — semantically identical, gated against the
    * same oracle arithmetic. */
  private[graft] def variantCaseSql(str: String = "STRING"): String =
    s"CASE WHEN substr(md5(CAST(user_id AS $str)), 1, 8) < '80000000' " +
      "THEN 'control' ELSE 'treatment' END"

  private def srmSql(big: String, idiv: String, str: String) =
    s"""WITH assign AS (
       |  SELECT DISTINCT user_id,
       |         ${variantCaseSql(str)} AS variant
       |  FROM events),
       |n AS (SELECT
       |        count(*) FILTER (WHERE variant = 'control') AS c,
       |        count(*) FILTER (WHERE variant = 'treatment') AS t
       |      FROM assign)
       |SELECT CAST(c AS BIGINT) AS n_control, CAST(t AS BIGINT) AS n_treatment,
       |       CAST(CAST((c - t) AS $big) * (c - t) * 1000000 $idiv (c + t) AS BIGINT)
       |         AS chi2_micro,
       |       CAST((c - t) AS $big) * (c - t) * 1000000 >
       |         CAST(3841459 AS $big) * (c + t) AS srm_detected
       |FROM n""".stripMargin

  private val srmCheck = QueryDef(
    "ev24_ab_srm_check",
    Some(srmSql("HUGEINT", "//", "VARCHAR")),
    (s, dir) => Tables.sql(s, dir, srmSql("DECIMAL(38,0)", "div", "STRING")))

  // ---- ev25: Poisson-bootstrap lift confidence interval ------------------
  // The uncertainty readout ev16's point lift needs: 100 bootstrap
  // replicates of the revenue-per-user lift, resampled at the USER
  // level (the exchangeable unit) with deterministic Poisson(1)
  // weights — weight w(user, r) comes from md5(user:r) against the
  // exact Poisson CDF literals (the division by 2³² is exact in
  // doubles and the thresholds are decimal literals, so the draw is
  // bit-identical across engines; the classic distributed-bootstrap
  // trick, since multinomial resampling needs global coordination but
  // Poisson(1) factorizes per row). The CI bounds are ORDER STATISTICS
  // (ceil(2.5%)/ceil(50%)/ceil(97.5%) of the VALID replicates — a
  // replicate whose resample empties an arm is dropped, common only on
  // tiny fixtures), not a percentile interpolation — integer-exact
  // selection, no float quantile math.
  //
  // 100 TB shape: the per-user collapse is one corpus-keyed partial
  // agg; the ×100 replicate expansion runs over the USER-cardinality
  // frame, not raw events, and collapses to 100 replicate rows in one
  // (r)-keyed partial agg (both variants' sums carried as conditional
  // partials — no self-join); everything after is a 100-row frame.
  // The CTE chain is strictly linear (each referenced once), so
  // Spark's CTE inlining cannot duplicate a corpus pass.
  private def bootSql(str: String, idiv: String, dlit: String,
      h32: String) =
    s"""WITH peruser AS (
       |  SELECT user_id,
       |         CASE WHEN substr(md5(CAST(user_id AS $str)), 1, 8) < '80000000'
       |              THEN 'control' ELSE 'treatment' END AS variant,
       |         CAST(sum(CASE WHEN event_type = 'purchase'
       |              THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
       |              AS BIGINT) AS rev_cents
       |  FROM events GROUP BY user_id),
       |u AS (
       |  SELECT variant, rev_cents, r,
       |         $h32 / 4294967296.0$dlit AS du
       |  FROM peruser CROSS JOIN reps),
       |w AS (
       |  SELECT variant, rev_cents, r,
       |         CASE
       |           WHEN du < 0.36787944117144233 THEN 0
       |           WHEN du < 0.7357588823428846 THEN 1
       |           WHEN du < 0.9196986029286058 THEN 2
       |           WHEN du < 0.9810118431238462 THEN 3
       |           WHEN du < 0.9963401531726563 THEN 4
       |           ELSE 5 END AS wt
       |  FROM u),
       |rep AS (
       |  SELECT r,
       |    CAST(sum(wt) FILTER (WHERE variant = 'control') AS BIGINT) AS c_users,
       |    CAST(sum(wt * rev_cents) FILTER (WHERE variant = 'control') AS BIGINT) AS c_rev,
       |    CAST(sum(wt) FILTER (WHERE variant = 'treatment') AS BIGINT) AS t_users,
       |    CAST(sum(wt * rev_cents) FILTER (WHERE variant = 'treatment') AS BIGINT) AS t_rev
       |  FROM w GROUP BY r),
       |lift AS (
       |  SELECT r, CAST((t_rev * 1000) $idiv t_users -
       |                 (c_rev * 1000) $idiv c_users AS BIGINT) AS lift_mc
       |  FROM rep WHERE c_users > 0 AND t_users > 0),
       |ord AS (SELECT r, lift_mc,
       |               row_number() OVER (ORDER BY lift_mc, r) AS rn,
       |               count(*) OVER () AS nv FROM lift),
       |agg AS (SELECT count(*) AS n_reps,
       |  CAST(min(CASE WHEN rn = greatest(1, (nv * 25 + 999) $idiv 1000)
       |           THEN lift_mc END) AS BIGINT) AS lo95_mc,
       |  CAST(min(CASE WHEN rn = (nv * 500 + 999) $idiv 1000
       |           THEN lift_mc END) AS BIGINT) AS med_mc,
       |  CAST(min(CASE WHEN rn = (nv * 975 + 999) $idiv 1000
       |           THEN lift_mc END) AS BIGINT) AS hi95_mc
       |  FROM ord)
       |SELECT n_reps, lo95_mc, med_mc, hi95_mc,
       |       lo95_mc <= 0 AND 0 <= hi95_mc AS ci_covers_zero
       |FROM agg""".stripMargin

  private val liftBootstrap = QueryDef(
    "ev25_ab_lift_bootstrap",
    Some("WITH reps AS (SELECT unnest(range(0, 100)) AS r),\n" +
      bootSql("VARCHAR", "//", "::DOUBLE",
        "('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':' || " +
          "CAST(r AS VARCHAR)), 1, 8))::BIGINT").substring(5)),
    (s, dir) => Tables.sql(s, dir,
      "WITH reps AS (SELECT explode(sequence(0, 99)) AS r),\n" +
        bootSql("STRING", "div", "D",
          "CAST(conv(substring(md5(CAST(user_id AS STRING) || ':' || " +
            "CAST(r AS STRING)), 1, 8), 16, 10) AS BIGINT)").substring(5)))

  // ---- ev26: two-sample Kolmogorov–Smirnov test --------------------------
  // "Did treatment change the purchase-value DISTRIBUTION" — the
  // nonparametric cousin of ev25's mean lift. D = sup|F₁−F₂| is exact
  // integer arithmetic once scaled by n₁·n₂: group by value (ties jump
  // together), run ONE distributed prefix scan for both samples'
  // cumulative counts (k₁ and k₂ ride a single pass encoded as
  // k₁·2³² + k₂ — exact while each sample holds < 2³¹ purchase rows,
  // the documented bound; beyond it, run the scan twice), and take the
  // max of |cum₁·n₂ − cum₂·n₁| over the jump points. The α=0.05
  // verdict compares the PPM-QUANTIZED statistic (d_ppm, itself an
  // exact floor) against 1.358² = 1.844164 cross-multiplied —
  // d_ppm²·n₁·n₂ > 1844164·(n₁+n₂)·10⁶ — hoisted to DECIMAL(38,0)/
  // HUGEINT, so no double enters anywhere AND nothing overflows at any
  // sample size (d_ppm ≤ 10⁶, so the left side tops out near 10³¹;
  // squaring the raw D_num instead clears 10³⁸ — DECIMAL's ceiling —
  // at only ~6·10⁷ rows per arm). The quantization can flip the
  // verdict only when D sits within 10⁻⁶ of the critical value — far
  // inside the statistic's own sampling noise.
  //
  // 100 TB shape: the value collapse is one corpus-keyed partial agg;
  // the ECDF is GlobalRank.withPrefixSum's two-pass distributed scan
  // (range exchange → per-partition cumsum → literal offsets — NO
  // single-reducer window, unlike the oracle's spelling); totals
  // derive from the scan's checkpointed frame (zero corpus re-scans);
  // the verdict is a 1-row rollup.
  private val ksTwoSample = QueryDef(
    "ev26_ks_two_sample",
    Some("""WITH p AS (
           |  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
           |                   < '80000000'
           |              THEN 0 ELSE 1 END AS grp, value
           |  FROM events WHERE event_type = 'purchase'),
           |g AS (SELECT value,
           |        count(*) FILTER (WHERE grp = 0) AS k1,
           |        count(*) FILTER (WHERE grp = 1) AS k2
           |      FROM p GROUP BY value),
           |c AS (SELECT value,
           |        sum(k1) OVER (ORDER BY value) AS cum1,
           |        sum(k2) OVER (ORDER BY value) AS cum2
           |      FROM g),
           |n AS (SELECT CAST(sum(k1) AS BIGINT) AS n1,
           |             CAST(sum(k2) AS BIGINT) AS n2 FROM g),
           |d AS (SELECT CAST(max(abs(cum1 * n.n2 - cum2 * n.n1)) AS BIGINT)
           |               AS d_num
           |      FROM c CROSS JOIN n)
           |SELECT n1, n2, d_num, d_ppm,
           |  CAST(d_ppm AS HUGEINT) * d_ppm * n1 * n2 >
           |    CAST(1844164 AS HUGEINT) * (n1 + n2) * 1000000 AS reject_05
           |FROM (
           |  SELECT n.n1, n.n2, d.d_num,
           |    CAST(CAST(d.d_num AS HUGEINT) * 1000000 // (n.n1 * n.n2) AS BIGINT)
           |      AS d_ppm
           |  FROM d CROSS JOIN n) t""".stripMargin),
    (s, dir) => {
      val g = Tables.table(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(
          when(substring(md5(col("user_id").cast("string")), 1, 8) < "80000000",
            0L).otherwise(1L).as("grp"),
          col("value"))
        .groupBy("value")
        .agg(sum(when(col("grp") === 0L, 1L).otherwise(0L)).as("k1"),
          sum(when(col("grp") === 1L, 1L).otherwise(0L)).as("k2"))
        .withColumn("enc", col("k1") * lit(4294967296L) + col("k2"))
      val pref = graft.operators.GlobalRank.withPrefixSum(
        g, Seq(col("value")), col("enc"), "cum")
      val n = pref.agg(sum("k1").cast("long").as("n1"),
        sum("k2").cast("long").as("n2"))
      pref
        .select(expr("cum div 4294967296").as("cum1"),
          (col("cum") % lit(4294967296L)).as("cum2"))
        .crossJoin(broadcast(n))
        .agg(max("n1").as("n1"), max("n2").as("n2"),
          max(abs(col("cum1") * col("n2") - col("cum2") * col("n1")))
            .cast("long").as("d_num"))
        .select(col("n1"), col("n2"), col("d_num"),
          expr("CAST(CAST(d_num AS DECIMAL(38,0)) * 1000000 div (n1 * n2) AS BIGINT)")
            .as("d_ppm"))
        .withColumn("reject_05",
          expr("CAST(d_ppm AS DECIMAL(38,0)) * d_ppm * n1 * n2 > " +
            "CAST(1844164 AS DECIMAL(38,0)) * (n1 + n2) * 1000000"))
    })

  // ---- ev29: join-size estimate -------------------------------------------
  // The planner diagnostic that complements ev22's per-key head: the
  // EXACT output cardinality of a self-equi-join on user_id is
  // Σ cnt(k)² — the quadratic-blowup check run before submitting a
  // pairs-style job (sessions × sessions, co-visitation, PYMK). Output:
  // input rows, distinct keys, exact join rows, the blowup factor in
  // milli-units, and the share of join output the top-5 keys alone
  // would produce (the salting target). Σcnt² is hoisted to
  // DECIMAL(38,0)/HUGEINT — a single 1e9-row key alone contributes
  // 1e18, at BIGINT's edge.
  //
  // 100 TB shape: derives entirely from ev22's memoized, checkpointed
  // key-count frame — the corpus is not re-scanned, the totals and the
  // TakeOrdered top-5 rollup are key-cardinality aggregates, and no
  // window (a rank over the key frame would be a single-reducer sort).
  private val joinSizeEstimate = QueryDef(
    "ev29_join_size_estimate",
    Some("""WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
           |g AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
           |             CAST(count(*) AS BIGINT) AS n_keys,
           |             sum(CAST(cnt AS HUGEINT) * cnt) AS join_rows FROM c),
           |top AS (SELECT user_id, cnt FROM c ORDER BY cnt DESC, user_id LIMIT 5),
           |t5 AS (SELECT sum(CAST(cnt AS HUGEINT) * cnt) AS top5 FROM top)
           |SELECT g.n_rows, g.n_keys,
           |  CAST(least(g.join_rows, 9223372036854775807) AS BIGINT) AS join_rows,
           |  CAST(g.join_rows * 1000 // g.n_rows AS BIGINT) AS blowup_milli,
           |  CAST(t5.top5 * 1000000 // g.join_rows AS BIGINT) AS top5_share_ppm
           |FROM g CROSS JOIN t5""".stripMargin),
    (s, dir) => {
      val c = skewCache.getOrElseUpdate(s, dir) {
        Tables.table(s, dir, "events")
          .groupBy("user_id").agg(count(lit(1)).as("cnt"))
          .localCheckpoint(true)
      }
      val g = c.agg(sum("cnt").cast("long").as("n_rows"),
        count(lit(1)).cast("long").as("n_keys"),
        sum(expr("CAST(cnt AS DECIMAL(38,0)) * cnt")).as("join_rows_d"))
      val t5 = c.orderBy(col("cnt").desc, col("user_id")).limit(5)
        .agg(sum(expr("CAST(cnt AS DECIMAL(38,0)) * cnt")).as("top5"))
      g.crossJoin(broadcast(t5))
        .select(col("n_rows"), col("n_keys"),
          // Σcnt² itself can clear BIGINT precisely in the blowup
          // regime the diagnostic detects — saturate the raw column
          // (identically in both engines) instead of overflowing; the
          // ratio columns divide BEFORE narrowing and stay exact
          expr("CAST(least(join_rows_d, " +
            "CAST(9223372036854775807 AS DECIMAL(38,0))) AS BIGINT)")
            .as("join_rows"),
          expr("CAST(join_rows_d * 1000 div n_rows AS BIGINT)").as("blowup_milli"),
          expr("CAST(top5 * 1000000 div join_rows_d AS BIGINT)").as("top5_share_ppm"))
    })

  // ---- ev31: CUSUM change-point detection ---------------------------------
  // The rate-shift monitor (Page 1954) run on ingestion/event streams
  // before trusting any windowed statistic: one-sided CUSUM over
  // hourly counts, S_i = max(0, S_{i-1} + (n_i − μ)). The max-recursion
  // is NOT a prefix sum — but the classic identity S_i = P_i −
  // min(0, min_{j≤i} P_j) over the centered prefix P turns it into two
  // scans, and CENTERING is exact by cross-multiplication: dev_i =
  // n_hours·cum_i − total·i (all integers; μ = total/n_hours never
  // divides). Peak location, peak value, the excess share in exact ppm
  // (DECIMAL(38,0)/HUGEINT hoist — S·10⁶ clears BIGINT at corpus
  // rates), and a deterministic detection rule (peak > 24·total ⟺
  // excess events > 24 hourly means) — all integer-exact, honestly
  // FALSE on this steady synthetic corpus.
  //
  // 100 TB shape: the only corpus-sized work is ONE hour-keyed
  // partial-combining count; everything after runs on the
  // TIME-cardinality frame (720 rows/month — the ev23 rule: windows
  // over type/time cardinality, never corpus rows).
  private def cusumSql(big: String, idiv: String) =
    s"""WITH h AS (SELECT date_trunc('hour', ts) AS hr, CAST(count(*) AS BIGINT) AS n
       |           FROM events GROUP BY date_trunc('hour', ts)),
       |g AS (SELECT CAST(count(*) AS BIGINT) AS n_hours, CAST(sum(n) AS BIGINT) AS total FROM h),
       |p AS (SELECT hr, n, CAST(sum(n) OVER (ORDER BY hr) AS BIGINT) AS cum,
       |             CAST(row_number() OVER (ORDER BY hr) AS BIGINT) AS i FROM h),
       |s AS (SELECT p.hr, p.i, g.n_hours * p.cum - g.total * p.i AS dev
       |      FROM p CROSS JOIN g),
       |c AS (SELECT hr, i, dev,
       |        dev - least(CAST(0 AS BIGINT),
       |                    min(dev) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
       |                                   AND CURRENT ROW)) AS cusum
       |      FROM s)
       |SELECT g.n_hours, g.total, c.hr AS peak_hr, c.cusum AS cusum_peak,
       |  CAST(CAST(c.cusum AS $big) * 1000000 $idiv (g.n_hours * g.total) AS BIGINT)
       |    AS excess_ppm,
       |  c.cusum > 24 * g.total AS detected
       |FROM c CROSS JOIN g ORDER BY c.cusum DESC, c.hr LIMIT 1""".stripMargin

  private val cusumChangepoint = QueryDef(
    "ev31_cusum_changepoint",
    Some(cusumSql("HUGEINT", "//")),
    (s, dir) => Tables.sql(s, dir, cusumSql("DECIMAL(38,0)", "div")))

  // ---- ev32: windowed PSI (trailing window vs opening baseline) -----------
  // The batch face of the r13 windowed PSI monitor, keeping the
  // monitor's statistic oracle-gated exactly like ev23 keeps the
  // cumulative one: the event-type mix of the TRAILING 7 event-time
  // days scored against the mix of the FIRST 7 days (the known-good
  // opening window standing in for the frozen baseline a deployment
  // snapshots). Arithmetic is ev23's verbatim — integer ppm shares
  // via window sums over the type-cardinality frame, zero-quantized-
  // share exclusion, one ln per type rounded to micro-units with
  // identical parenthesization. Both window memberships are map-side
  // booleans off the broadcast (d0, d1) row, so the whole query stays
  // ONE events pass + type-cardinality postprocessing.
  private def windowedPsiSql(idiv: String) =
    s"""WITH b AS (SELECT min(CAST(ts AS DATE)) AS d0,
       |                  max(CAST(ts AS DATE)) AS d1 FROM events),
       |c AS (SELECT event_type,
       |        count(*) FILTER (WHERE d < d0 + INTERVAL 7 DAY) AS n1,
       |        count(*) FILTER (WHERE d > d1 - INTERVAL 7 DAY) AS n2
       |      FROM (SELECT event_type, CAST(ts AS DATE) AS d FROM events) e
       |      CROSS JOIN b GROUP BY event_type),
       |p AS (SELECT event_type, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       |        CAST((n1 * 1000000) $idiv (sum(n1) OVER ()) AS BIGINT) AS p1_ppm,
       |        CAST((n2 * 1000000) $idiv (sum(n2) OVER ()) AS BIGINT) AS p2_ppm
       |      FROM c)
       |SELECT event_type, n1, n2, p1_ppm, p2_ppm,
       |  CAST(round((p2_ppm - p1_ppm) / 1000000.0 *
       |             ln(CAST(p2_ppm AS DOUBLE) / p1_ppm) * 1000000.0) AS BIGINT)
       |    AS psi_micro
       |FROM p WHERE p1_ppm > 0 AND p2_ppm > 0 ORDER BY event_type""".stripMargin

  private val windowedPsi = QueryDef(
    "ev32_windowed_psi",
    Some(windowedPsiSql("//")),
    (s, dir) => Tables.sql(s, dir, windowedPsiSql("div")))

  // ---- ev33: horizon-folded CUSUM (baseline-centered) ----------------------
  // The batch face of the r13 CUSUM horizon fold, oracle-gating the
  // monitor's centered arithmetic the way ev31 gates the self-centered
  // identity: hours OLDER than the trailing 168-hour horizon fold into
  // a frozen (sum s, count k) baseline, and the one-sided CUSUM runs
  // over the horizon with deviations centered on the BASELINE mean —
  // dev_i = k·cum_i − s·i (cross-multiplied, μ = s/k never divides),
  // peak = dev − min(0, running-min(dev)), detected ⟺ peak > 24·s
  // (cumulative in-horizon excess > 24 baseline-hour means). dev runs
  // in DECIMAL(38,0)/HUGEINT — k grows with stream age, so k·cum has
  // no static BIGINT bound; the emitted peak CASTs back to BIGINT
  // (ANSI-loud on overflow, never silent). A stream younger than the
  // horizon has an empty baseline (s = k = 0): every dev is 0 and the
  // query reports an honest non-detection — the monitor's pre-horizon
  // fallback to the self-centered ev31 identity is the library path.
  //
  // 100 TB shape: ONE hour-keyed partial-combining count; the fold,
  // the prefix scan, and the running min all run on the ≤168-row
  // horizon frame (time-cardinality, never corpus rows).
  // The post-hour-frame arithmetic, parameterized on the hour
  // relation: the ORACLE inlines `h` as a CTE (DuckDB executes CTEs
  // once); the Spark build points `hRel` at a CHECKPOINTED temp view —
  // the default-on scan budget caught the CTE spelling re-scanning
  // events SIX times through the inlined references (its own audit
  // working as designed), so every reference here reads the standing
  // 531-row hour RDD instead.
  private def cusumHorizonBody(hRel: String, big: String) =
    s"""WITH mx AS (SELECT max(hr) AS hmax FROM $hRel),
       |base AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS s,
       |                CAST(count(*) AS BIGINT) AS k
       |         FROM $hRel CROSS JOIN mx WHERE hr < hmax - INTERVAL 167 HOUR),
       |w AS (SELECT hr, n,
       |        CAST(sum(n) OVER (ORDER BY hr) AS BIGINT) AS cum,
       |        CAST(row_number() OVER (ORDER BY hr) AS BIGINT) AS i
       |      FROM $hRel CROSS JOIN mx WHERE hr >= hmax - INTERVAL 167 HOUR),
       |s2 AS (SELECT w.hr, w.i,
       |         CAST(base.k AS $big) * w.cum - CAST(base.s AS $big) * w.i AS dev
       |       FROM w CROSS JOIN base),
       |c AS (SELECT hr, i, dev,
       |        dev - least(CAST(0 AS $big),
       |                    min(dev) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
       |                                   AND CURRENT ROW)) AS cusum
       |      FROM s2)
       |SELECT base.k AS base_hours, base.s AS base_total,
       |  c.hr AS peak_hr, CAST(c.cusum AS BIGINT) AS cusum_peak,
       |  c.cusum > CAST(24 AS $big) * base.s AS detected
       |FROM c CROSS JOIN base ORDER BY c.cusum DESC, c.hr LIMIT 1""".stripMargin

  private val cusumHorizon = QueryDef(
    "ev33_cusum_horizon",
    Some("WITH h AS (SELECT date_trunc('hour', ts) AS hr, " +
      "CAST(count(*) AS BIGINT) AS n FROM events " +
      "GROUP BY date_trunc('hour', ts)), " +
      cusumHorizonBody("h", "HUGEINT").stripPrefix("WITH ")),
    (s, dir) => {
      val h = Tables.table(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).cast("long").as("n"))
        .localCheckpoint(true)
      h.createOrReplaceTempView("ev33_hours")
      s.sql(cusumHorizonBody("ev33_hours", "DECIMAL(38,0)"))
    })

  // ---- ev30: Misra–Gries heavy hitters (verified two-pass) ---------------
  // The deterministic-guarantee heavy-hitters protocol on the native
  // [[graft.functions.MisraGriesTopK]] aggregate: pass 1 builds
  // mergeable k=16 summaries map-side (O(k·partitions) shuffle payload
  // at any corpus size — the candidate set provably contains EVERY
  // item with frequency > n/17, no false negatives); pass 2 folds the
  // ≤16 candidates back as an `isin` LITERAL (pushed into the parquet
  // scan) and verifies exact counts against the n/8 threshold. The
  // verified output is exact and order-independent even though the raw
  // summary is not — which is why the oracle is the plain exact
  // aggregate and the gate stays hash-tight. Complements
  // cms_heavy_hitters (CMS gives overcount bounds, MG gives
  // no-false-negative candidate narrowing).
  private val mgHeavyHitters = QueryDef(
    "ev30_mg_heavy_hitters",
    Some("""WITH c AS (SELECT event_type, count(*) AS cnt
           |           FROM events WHERE event_type IS NOT NULL
           |           GROUP BY event_type),
           |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c)
           |SELECT c.event_type, CAST(c.cnt AS BIGINT) AS cnt,
           |       CAST(CAST(c.cnt AS HUGEINT) * 1000000 // n.n AS BIGINT)
           |         AS freq_ppm
           |FROM c CROSS JOIN n
           |WHERE CAST(c.cnt AS HUGEINT) * 8 > n.n
           |ORDER BY cnt DESC, event_type""".stripMargin),
    (s, dir) => {
      // pass 1: candidates + total in ONE corpus scan. NULL keys are
      // excluded EXPLICITLY on both sides — the MG update skips null
      // and `isin` never matches it, so without the filter a heavy
      // NULL group would appear in the oracle but never here
      val first = Tables.table(s, dir, "events")
        .filter(col("event_type").isNotNull)
        .agg(expr("mg_topk(event_type, 16)").as("mg"),
          count(lit(1)).cast("long").as("n")).collect()(0)
      val cands = first.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
      val total = first.getLong(1)
      // pass 2: exact verify over the candidate literal only
      Tables.table(s, dir, "events")
        .filter(col("event_type").isin(cands: _*))
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
        .filter(expr(s"CAST(cnt AS DECIMAL(38,0)) * 8 > ${total}L"))
        .select(col("event_type"), col("cnt"),
          expr(s"CAST(CAST(cnt AS DECIMAL(38,0)) * 1000000 div ${total}L AS BIGINT)")
            .as("freq_ppm"))
        .orderBy(col("cnt").desc, col("event_type"))
    })

  // ---- ev27/ev28: exact global order statistics ---------------------------
  // Exact corpus-scale quantiles are the one statistic everyone
  // approximates because the naive form is a single-reducer sort; the
  // two-pass GlobalRank makes them exact AND distributed. The ranked
  // (value, rk) frame materializes once per (session, dir) — range
  // exchange → per-partition row_number → literal offsets — and both
  // order-statistic queries below derive from the checkpointed frame
  // with zero corpus re-scans.
  private val rankedValueCache =
    new graft.operators.DirMemo[org.apache.spark.sql.DataFrame]()

  private def rankedValues(s: org.apache.spark.sql.SparkSession, dir: String) =
    rankedValueCache.getOrElseUpdate(s, dir) {
      graft.operators.GlobalRank.withRank(
        Tables.table(s, dir, "events").select(col("value")),
        Seq(col("value")), "rk")
    }

  // ev27: exact p50/p90/p99 as order statistics (rank = ceil(p·n), the
  // discrete quantile — no interpolation, so the selected DOUBLE is an
  // input value both engines hold bit-identically), plus the accuracy
  // gate on Spark's t-digest percentile_approx against the exact
  // values (≤1% relative — the a7b/ev17 approx-rides-alongside
  // discipline; the oracle states literal true).
  private val exactQuantiles = QueryDef(
    "ev27_exact_quantiles",
    Some("""WITH o AS (SELECT value,
           |             row_number() OVER (ORDER BY value) AS rk FROM events),
           |n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM events)
           |SELECT n.n_rows,
           |  max(CASE WHEN o.rk = (n.n_rows * 50 + 99) // 100 THEN o.value END) AS p50,
           |  max(CASE WHEN o.rk = (n.n_rows * 90 + 99) // 100 THEN o.value END) AS p90,
           |  max(CASE WHEN o.rk = (n.n_rows * 99 + 99) // 100 THEN o.value END) AS p99,
           |  true AS approx_ok
           |FROM o CROSS JOIN n GROUP BY n.n_rows""".stripMargin),
    (s, dir) => {
      val ranked = rankedValues(s, dir)
      val n = ranked.agg(count(lit(1)).cast("long").as("n_rows"))
      val ap = ranked.agg(percentile_approx(col("value"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("ap"))
      ranked.crossJoin(broadcast(n)).crossJoin(broadcast(ap))
        .groupBy("n_rows")
        .agg(
          max(when(col("rk") === expr("(n_rows * 50 + 99) div 100"),
            col("value"))).as("p50"),
          max(when(col("rk") === expr("(n_rows * 90 + 99) div 100"),
            col("value"))).as("p90"),
          max(when(col("rk") === expr("(n_rows * 99 + 99) div 100"),
            col("value"))).as("p99"),
          max(col("ap")).as("apv"))
        .select(col("n_rows"), col("p50"), col("p90"), col("p99"),
          expr("""abs(apv[0] - p50) <= 0.01 * abs(p50) AND
                 |abs(apv[1] - p90) <= 0.01 * abs(p90) AND
                 |abs(apv[2] - p99) <= 0.01 * abs(p99)""".stripMargin)
            .as("approx_ok"))
    })

  /** Accuracy artifact for Bench (the recall-curve discipline applied
    * to quantile sketches): max relative error in ppm of Spark's
    * t-digest `percentile_approx` at each sketch accuracy, measured
    * against the EXACT order statistics off the memoized ranked frame.
    * The curve documents what the 10000-accuracy default buys and what
    * a cheaper sketch would cost. */
  def quantileErrReport(s: org.apache.spark.sql.SparkSession, dir: String)
      : Seq[(Int, Long)] = {
    val ranked = rankedValues(s, dir)
    val n = ranked.count()
    val ps = Seq(50, 90, 99)
    val ks = ps.map(p => (p * n + 99) / 100)
    val byRank = ranked.filter(col("rk").isin(ks: _*))
      .select("rk", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = ks.map(byRank)
    Seq(100, 1000, 10000).map { acc =>
      val ap = ranked.agg(percentile_approx(col("value"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(acc)).as("ap"))
        .collect()(0).getSeq[Double](0)
      val errs = exact.zip(ap).map { case (e, a) =>
        if (e == 0.0) 0L else math.round(math.abs(a - e) / math.abs(e) * 1e6) }
      acc -> errs.max
    }
  }

  // ev28: equi-depth histogram — the 8 range-bucket boundaries a
  // repartitionByRange / zone-map layout would use, with per-bucket
  // exact counts proving balance (±1 row by construction). bucket =
  // (rk−1)·8 div n is pure integer arithmetic off the same ranked
  // frame; ties straddling a boundary land deterministically because
  // counts depend only on ranks and bucket min/max only on the value
  // multiset.
  private val equidepth = QueryDef(
    "ev28_equidepth_histogram",
    Some("""WITH o AS (SELECT value,
           |             row_number() OVER (ORDER BY value) AS rk FROM events),
           |n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM events)
           |SELECT CAST((o.rk - 1) * 8 // n.n_rows AS BIGINT) AS bucket,
           |       CAST(count(*) AS BIGINT) AS n_values,
           |       min(o.value) AS lo, max(o.value) AS hi
           |FROM o CROSS JOIN n
           |GROUP BY 1 ORDER BY bucket""".stripMargin),
    (s, dir) => {
      val ranked = rankedValues(s, dir)
      val n = ranked.agg(count(lit(1)).cast("long").as("n_rows"))
      ranked.crossJoin(broadcast(n))
        .select(expr("((rk - 1) * 8) div n_rows").as("bucket"), col("value"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_values"),
          min("value").as("lo"), max("value").as("hi"))
        .orderBy("bucket")
    })

  override val defs: Seq[QueryDef] =
    Seq(hourly, sessions, funnel, salted, adaptiveJoin, keepLatest, asof, rangeJoin, conversion,
      retention, anomaly, winsorized, scd2, markov, funnelSteps, hopping, gapfill,
      twa, sessionPaths, pointInTime, abAssign, stickiness, cohortLtv,
      timeToConvert, userEntropy, madOutliers, skewProfile, psiDrift, srmCheck,
      liftBootstrap, ksTwoSample, exactQuantiles, equidepth, joinSizeEstimate,
      mgHeavyHitters, cusumChangepoint, windowedPsi, cusumHorizon)
}
