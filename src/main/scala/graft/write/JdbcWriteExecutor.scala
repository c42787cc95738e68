package graft.write

import java.sql.{Connection, DriverManager, PreparedStatement}

import graft.api.TemplatePipeline
import graft.config.EndpointConfig

/** JDBC write passthrough — the D2/D3/D5 path (UPDATE / DELETE /
  * transactions) for endpoints backed by an external database.
  *
  * Spark SQL cannot UPDATE/DELETE a JDBC-registered view, and has no
  * multi-statement transactions; the reference's northwind CRUD
  * (products-update.sql / products-delete.sql, wrapped BEGIN/COMMIT at
  * database_manager.cpp:649-676) targets its attached SQLite directly.
  * The same division of labor applies here: READS of JDBC sources go
  * through Spark (pushdown, big-table partitioned scans —
  * [[graft.sources.Connections]]); WRITES go point-to-point over JDBC
  * where the database's own transaction machinery provides atomicity.
  * A 100 TB analytical engine never bulk-writes through this path —
  * it exists for the operational CRUD surface the reference serves.
  *
  * Flow: prepared render → statement split → per-statement binding
  * slice → one connection, autocommit off → executeUpdate each →
  * trailing-SELECT returns data → commit (rollback on any failure).
  */
object JdbcWriteExecutor {

  final case class JdbcWriteResult(
      rowsAffected: Long,
      returnedData: Option[Seq[Map[String, Any]]])

  def executeWrite(
      url: String,
      endpoint: EndpointConfig,
      template: String,
      params: Map[String, String],
      returnsData: Boolean = true,
      connProps: Map[String, String] = Map.empty): JdbcWriteResult = {

    val (sql, args) = TemplatePipeline.prepare(
      endpoint, template, params, connProps, duckDialect = false) match {
      case Left(errs) => throw TemplatePipeline.BadRequest(errs)
      case Right(v) => v
    }
    val statements = SqlSplitter.split(sql)
    require(statements.nonEmpty, "write template rendered to no statements")
    val slices = SqlSplitter.sliceBindings(statements, args.toSeq)

    val lastIsSelect = statements.size > 1 && returnsData &&
      statements.last.regionMatches(true, 0, "SELECT", 0, 6)
    val toExecute = if (lastIsSelect) statements.size - 1 else statements.size

    val conn = DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false) // the reference's BEGIN TRANSACTION
      var rows = 0L
      (0 until toExecute).foreach { i =>
        val ps = conn.prepareStatement(statements(i))
        try {
          bindAll(ps, slices(i))
          rows += math.max(0, ps.executeUpdate()).toLong
        } finally ps.close()
      }
      val returned =
        if (lastIsSelect) Some(runSelect(conn, statements.last, slices.last))
        else None
      conn.commit()
      JdbcWriteResult(rows, returned)
    } catch {
      case e: Exception =>
        try conn.rollback() catch { case _: Exception => () }
        throw e
    } finally conn.close()
  }

  private def bindAll(ps: PreparedStatement, args: Seq[Any]): Unit =
    args.zipWithIndex.foreach { case (v, i) =>
      val idx = i + 1
      v match {
        case null => ps.setObject(idx, null)
        case d: java.time.LocalDate => ps.setDate(idx, java.sql.Date.valueOf(d))
        case t: java.time.LocalTime => ps.setTime(idx, java.sql.Time.valueOf(t))
        case other => ps.setObject(idx, other)
      }
    }

  private def runSelect(conn: Connection, sql: String, args: Seq[Any]): Seq[Map[String, Any]] = {
    val ps = conn.prepareStatement(sql)
    try {
      bindAll(ps, args)
      val rs = ps.executeQuery()
      val meta = rs.getMetaData
      val cols = (1 to meta.getColumnCount).map(meta.getColumnLabel)
      val out = Seq.newBuilder[Map[String, Any]]
      while (rs.next()) out += cols.map(c => c -> rs.getObject(c)).toMap
      out.result()
    } finally ps.close()
  }
}
