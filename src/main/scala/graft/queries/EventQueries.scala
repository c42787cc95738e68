package graft.queries

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
  // (epoch extraction is the one engine-specific spelling:
  // unix_timestamp vs epoch.)
  private def sessionSql(epochFn: String => String) =
    s"""SELECT user_id,
       |  count(*) AS n_events,
       |  1 + sum(CASE WHEN gap_s IS NOT NULL AND gap_s > 1800 THEN 1 ELSE 0 END) AS n_sessions,
       |  max(gap_s) AS max_gap_s
       |FROM (
       |  SELECT user_id,
       |         ${epochFn("ts")} - ${epochFn("lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)")} AS gap_s
       |  FROM events) t
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  private val sessions = QueryDef(
    "ev2_sessionize",
    Some(sessionSql(e => s"cast(floor(epoch($e)) AS BIGINT)")), // floor to match unix_timestamp
    (s, dir) => Tables.sql(s, dir, sessionSql(e => s"unix_timestamp($e)")))

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

  override val defs: Seq[QueryDef] = Seq(hourly, sessions, funnel)
}
