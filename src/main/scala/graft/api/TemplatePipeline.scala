package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.EndpointConfig
import graft.dialect.DuckDialect
import graft.template._
import graft.validate.{RequestValidator, ValidationError}

/** The request query lifecycle, minus the HTTP shell — flapi's hot path
  * (SURVEY §3.1 steps 3-9) re-expressed on Spark:
  *
  *   params → validate → prepared-rewrite → Mustache render → dialect
  *   shim → `spark.sql(sql, positionalArgs)` → DataFrame
  *
  * Binding goes through Spark's parameterized SQL: every `?` becomes a
  * typed literal in the parsed plan, never string-spliced — structurally
  * injection-proof exactly like the reference's duckdb_bind_* path.
  */
object TemplatePipeline {

  final case class BadRequest(errors: Seq[ValidationError])
      extends RuntimeException(
        errors.map(e => s"${e.field}: ${e.message}").mkString("; "))

  /** Validate, rewrite, render, translate. Returns the final Spark SQL and
    * the ordered bind values (null = SQL NULL for absent params). */
  def prepare(
      endpoint: EndpointConfig,
      template: String,
      params: Map[String, String],
      connProps: Map[String, String] = Map.empty,
      envAllow: String => Boolean = _ => false,
      duckDialect: Boolean = true): Either[Seq[ValidationError], (String, Array[Any])] = {

    // 1. defaults for declared-but-absent fields
    val withDefaults = endpoint.requestFields.foldLeft(params) { (m, f) =>
      if (m.contains(f.fieldName)) m
      else f.defaultValue.fold(m)(d => m + (f.fieldName -> d))
    }

    // 2. validation (+ optional unknown-param rejection)
    val unknown =
      if (endpoint.requestFieldsValidation)
        RequestValidator.validateUnknownParams(endpoint.requestFields, withDefaults)
      else Nil
    val errors = RequestValidator.validate(endpoint.requestFields, withDefaults) ++ unknown
    if (errors.nonEmpty) return Left(errors)

    // 3. prepared rewrite on the RAW template (before any rendering, so
    //    bindable {{params.X}} can never be spliced as text)
    val rewrite = PreparedRewriter.rewrite(template, endpoint.requestFields)

    // 4. typed conversion of bind values, in position order
    val argsOrErr: Either[Seq[ValidationError], Array[Any]] = {
      val out = Array.newBuilder[Any]
      val errs = Seq.newBuilder[ValidationError]
      rewrite.bindings.foreach { b =>
        ValueConverter.convert(b.tpe, withDefaults.get(b.fieldName)) match {
          case ValueConverter.Ok(v) => out += v.orNull
          case ValueConverter.Err(m) => errs += ValidationError(b.fieldName, m)
        }
      }
      val e = errs.result()
      if (e.nonEmpty) Left(e) else Right(out.result())
    }
    argsOrErr.flatMap { args =>
      // 5. Mustache render (sections, conn/env/cache/auth, raw triples).
      //    Bound params were already consumed as '?'; sections still see
      //    the param map for presence tests.
      val ctx = TemplateContext.forRequest(withDefaults, connProps, envAllow)
      val rendered = Mustache.render(rewrite.sql, ctx)
      // 6. DuckDB-dialect shim (post-render: struct literals etc. may be
      //    produced inside conditional sections)
      val sql = if (duckDialect) DuckDialect.translate(rendered) else rendered
      Right((sql, args))
    }
  }

  /** prepare + execute; throws BadRequest on validation failure. */
  def run(
      spark: SparkSession,
      endpoint: EndpointConfig,
      template: String,
      params: Map[String, String],
      connProps: Map[String, String] = Map.empty,
      envAllow: String => Boolean = _ => false,
      duckDialect: Boolean = true): DataFrame =
    prepare(endpoint, template, params, connProps, envAllow, duckDialect) match {
      case Left(errs) => throw BadRequest(errs)
      case Right((sql, args)) =>
        PlanCache.getOrBuild(spark, sql, args.toSeq) {
          if (args.isEmpty) spark.sql(sql) else spark.sql(sql, args)
        }
    }
}

/** Analyzed-plan cache for the serving path (SURVEY §4.2c): repeated
  * identical requests — dashboards, agent retries, reloads of the same
  * page — skip SQL parse + analysis, a real slice of the reference's
  * 12-68 ms interactive budget that Spark otherwise pays per request.
  *
  * Key = (session, generation, rendered SQL, bound args). The rendered
  * text already encodes the Mustache section-presence bitmap
  * (SURVEY §7.4.5: two requests whose sections differ render different
  * SQL), so shape collisions are impossible. `invalidateAll` bumps the
  * generation — cache-table refreshes and config-API mutations call it,
  * so a cached plan can never serve against a changed world. Bounded
  * LRU; DataFrames are lazy plan objects (cheap to hold, thread-safe
  * to execute).
  */
object PlanCache {
  private val MaxEntries = 256
  /** TTL bounds staleness from OUT-OF-BAND table changes (an external
    * ETL job, a write endpoint with no cache block): generation bumps
    * cover in-engine mutations instantly, the TTL covers everything
    * the engine cannot observe. 30 s is the serving sweet spot —
    * dashboards/retries hit, data freshness stays near-real-time. */
  private val TtlMillis = 30000L
  private val generation = new java.util.concurrent.atomic.AtomicLong(0)

  // sessionUUID, not identityHashCode: identity hashes can be reused
  // after a session is GC'd, which would serve a dead session's plan
  // to a fresh one inside the TTL window
  private type Key = (String, Long, String, Seq[Any])
  private final case class Entry(df: DataFrame, builtAt: Long)
  private val cache = new java.util.LinkedHashMap[Key, Entry](64, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[Key, Entry]): Boolean =
      size() > MaxEntries
  }

  /** Drop every cached plan (generation bump — O(1), entries age out). */
  def invalidateAll(): Unit = generation.incrementAndGet()

  def getOrBuild(spark: SparkSession, sql: String, args: Seq[Any])(
      build: => DataFrame): DataFrame = {
    val key: Key =
      (graft.operators.SessionMemo.sessionToken(spark), generation.get(), sql, args)
    val now = System.currentTimeMillis()
    cache.synchronized(Option(cache.get(key)).filter(now - _.builtAt < TtlMillis)) match {
      case Some(e) => e.df
      case None =>
        val df = build // analysis outside the lock — it can take ~100 ms
        cache.synchronized(cache.put(key, Entry(df, now)))
        df
    }
  }
}

/** Pagination + count envelope (O2/A4; reference database_manager.cpp:
  * 429-531): every paginated GET wraps the rendered query in
  * LIMIT/OFFSET and runs a companion COUNT on the same plan, emitting
  * `{data, next, total_count}` plus X-Total-Count/X-Offset/X-Limit/X-Next.
  *
  * Scale notes: the count runs on the UN-limited logical plan — one job,
  * no re-render, and Catalyst prunes the count plan down to the scan
  * (columns referenced only in the projection are dropped). The page
  * itself is offset+limit rows through a single partition — fine for the
  * first pages (offset defaults 0, limit 100); DEEP pagination must use
  * keyset instead: `WHERE key > last_seen ORDER BY key LIMIT n` keeps the
  * scan indexed/pruned at any depth, which is the documented scale path
  * (see keysetPage).
  */
object Paginator {
  final case class Page(
      data: DataFrame,
      offset: Long,
      limit: Long,
      totalCount: Long,
      next: Option[String])

  val defaultOffset = 0L
  val defaultLimit = 100L // request_handler.cpp:19-20

  def params(raw: Map[String, String]): (Long, Long) = {
    def num(k: String, dflt: Long): Long =
      raw.get(k).flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(dflt)
    (math.max(0L, num("offset", defaultOffset)), math.max(0L, num("limit", defaultLimit)))
  }

  def paginate(df: DataFrame, offset: Long, limit: Long, basePath: String = ""): Page = {
    val total = df.count()
    // Dataset.offset/limit take Int; clamp rather than overflow-wrap for
    // absurd values (deep pagination should use keysetPage regardless).
    def asInt(v: Long): Int = math.min(v, Int.MaxValue.toLong).toInt
    val page = df.offset(asInt(offset)).limit(asInt(limit))
    val next =
      if (offset + limit < total)
        Some(s"$basePath?offset=${offset + limit}&limit=$limit")
      else None
    Page(page, offset, limit, total, next)
  }

  /** Keyset variant for deep pagination: strictly-after `lastSeen` on a
    * unique ordering key. O(page) not O(offset+page) — the plan pushes
    * `key > lastSeen` into the scan. A STRING cursor (every HTTP query
    * param arrives as text) is cast to the key column's own type, or
    * Spark would coerce the COLUMN to string and compare
    * lexicographically — "9" > "10". */
  def keysetPage(df: DataFrame, keyCol: String, lastSeen: Option[Any], limit: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val keyType = df.schema(keyCol).dataType
    val filtered = lastSeen.fold(df)(v =>
      df.filter(col(keyCol) > lit(v).cast(keyType)))
    filtered.orderBy(col(keyCol)).limit(limit.toInt)
  }

  /** One keyset page + cursor envelope: collects the (limit-bounded)
    * page ONCE, derives the `next` cursor from the last row's key.
    * `next` is present iff the page filled — the deep-page contract:
    * page N's plan is identical in shape to page 1's (pushed
    * `key > cursor` + LIMIT; no OFFSET anywhere). */
  final case class KeysetPage(
      rows: Array[org.apache.spark.sql.Row],
      schema: org.apache.spark.sql.types.StructType,
      limit: Long,
      totalCount: Long,
      next: Option[String])

  def keysetPaginate(df: DataFrame, keyCol: String, after: Option[String],
      limit: Long, basePath: String): KeysetPage = {
    val page = keysetPage(df, keyCol, after, limit)
    val rows = page.collect()
    // the count prunes to the scan like the offset path's companion
    val total = df.count()
    val next =
      if (rows.length == limit && rows.nonEmpty) {
        val cursor = java.net.URLEncoder.encode(
          String.valueOf(rows.last.getAs[Any](keyCol)), "UTF-8")
        Some(s"$basePath?after=$cursor&limit=$limit")
      } else None
    KeysetPage(rows, page.schema, limit, total, next)
  }
}
