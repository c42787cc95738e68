package graft.write

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.api.TemplatePipeline
import graft.config.EndpointConfig

/** rows_affected + optional returned data (reference WriteResult,
  * database_manager.hpp; HTTP 201/200 mapping lives with the serving
  * shell). */
final case class WriteResult(rowsAffected: Long, returnedData: Option[DataFrame])

/** Multi-statement write orchestration — the Spark re-expression of
  * executeWrite (/root/reference/src/database_manager.cpp:541-647):
  *
  *  1. render the endpoint template through the prepared pipeline;
  *  2. split into statements (quote/dollar-quote aware);
  *  3. slice the positional binding plan across statements by their
  *     `?` counts;
  *  4. execute sequentially; when the endpoint returns data and the
  *     LAST statement is a SELECT, it runs last and its result is the
  *     returned data (the reference's own RETURNING emulation
  *     convention, products-create.sql:63-65);
  *  5. rows_affected = rows added to INSERT targets (counted
  *     before/after; Spark DML does not report a row count the way
  *     duckdb_execute does).
  *
  * Transactions (D5): Spark has no multi-statement transaction. The
  * reference's BEGIN/COMMIT wrap maps to: statements run sequentially,
  * failures propagate after the audit trail, and tables that need
  * atomic visibility use the snapshot layer (pointer-swap commits).
  * JDBC-backed endpoints can get real transactions from their driver.
  */
object WriteExecutor {

  private def isSelect(s: String): Boolean =
    s.regionMatches(true, 0, "SELECT", 0, 6)

  private val InsertTarget = """(?is)^\s*INSERT\s+INTO\s+([\w.`"]+).*""".r

  def executeWrite(
      spark: SparkSession,
      endpoint: EndpointConfig,
      template: String,
      params: Map[String, String],
      returnsData: Boolean = true,
      connProps: Map[String, String] = Map.empty): WriteResult = {

    val (sql, args) = TemplatePipeline.prepare(endpoint, template, params, connProps) match {
      case Left(errs) => throw TemplatePipeline.BadRequest(errs)
      case Right(v) => v
    }
    val statements = SqlSplitter.split(sql)
    require(statements.nonEmpty, "write template rendered to no statements")
    val slices = SqlSplitter.sliceBindings(statements, args.toSeq)

    val lastIsSelect = statements.size > 1 && returnsData && isSelect(statements.last)
    val toExecute = if (lastIsSelect) statements.size - 1 else statements.size

    // INSERT targets get before/after counts for rows_affected.
    val targets = statements.take(toExecute).collect {
      case InsertTarget(t) => t.replace("`", "").replace("\"", "")
    }.distinct
    def countTargets(): Map[String, Long] =
      targets.flatMap { t =>
        try Some(t -> spark.table(t).count())
        catch { case _: Exception => None } // target created mid-batch
      }.toMap
    val before = countTargets()

    var lastResult: Option[DataFrame] = None
    (0 until toExecute).foreach { i =>
      val df =
        if (slices(i).isEmpty) spark.sql(statements(i))
        else spark.sql(statements(i), slices(i).toArray)
      // DML statements return an empty frame; a mid-batch SELECT (or a
      // future RETURNING-capable source) that yields columns+rows is
      // captured like the reference captures RETURNING output.
      if (df.columns.nonEmpty && statements(i).toUpperCase.contains("RETURNING"))
        lastResult = Some(df)
      else df.collect() // force execution in statement order
    }

    val after = countTargets()
    val rowsAffected = targets.map(t =>
      math.max(0L, after.getOrElse(t, 0L) - before.getOrElse(t, 0L))).sum

    val returned =
      if (lastIsSelect) {
        val df =
          if (slices.last.isEmpty) spark.sql(statements.last)
          else spark.sql(statements.last, slices.last.toArray)
        Some(df)
      } else lastResult
    WriteResult(rowsAffected, returned)
  }
}
