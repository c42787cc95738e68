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
      connProps: Map[String, String] = Map.empty,
      /** cap on trailing-SELECT rows — bounded BEFORE materialization
        * (setMaxRows + loop bound), the JDBC analog of the read path's
        * plan-level limit. */
      maxReturnedRows: Int = Int.MaxValue): JdbcWriteResult = {

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

    // connection credentials from the connection block, env:/secretfile:
    // refs resolved — the same properties the Spark JDBC READ path uses
    // (Connections.registerJdbc); a driver class is loaded when named.
    connProps.get("driver").foreach(d =>
      try Class.forName(d) catch { case _: ClassNotFoundException => () })
    val user = connProps.get("user")
      .map(graft.sources.CredentialManager.resolveRef(_))
    val password = connProps.get("password")
      .map(graft.sources.CredentialManager.resolveRef(_))
    val conn = user match {
      case Some(u) => DriverManager.getConnection(url, u, password.getOrElse(""))
      case None => DriverManager.getConnection(url)
    }
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
        if (lastIsSelect)
          Some(runSelect(conn, statements.last, slices.last, maxReturnedRows))
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

  private def runSelect(conn: Connection, sql: String, args: Seq[Any],
                        maxRows: Int = Int.MaxValue): Seq[Map[String, Any]] = {
    val ps = conn.prepareStatement(sql)
    try {
      if (maxRows != Int.MaxValue) ps.setMaxRows(maxRows)
      bindAll(ps, args)
      val rs = ps.executeQuery()
      val meta = rs.getMetaData
      val cols = (1 to meta.getColumnCount).map(meta.getColumnLabel)
      val out = Seq.newBuilder[Map[String, Any]]
      var n = 0
      while (n < maxRows && rs.next()) {
        out += cols.map(c => c -> jsonSafe(rs.getObject(c))).toMap
        n += 1
      }
      out.result()
    } finally ps.close()
  }

  /** Materialize JDBC values into JSON-safe forms WHILE the connection
    * is open: LOB accessors throw after close, and a post-commit
    * serialization failure would 500 a write that already persisted. */
  private def jsonSafe(v: Any): Any = v match {
    case c: java.sql.Clob => c.getSubString(1, math.min(c.length(), Int.MaxValue.toLong).toInt)
    case b: java.sql.Blob =>
      java.util.Base64.getEncoder.encodeToString(
        b.getBytes(1, math.min(b.length(), Int.MaxValue.toLong).toInt))
    case d: java.sql.Date => d.toString
    case t: java.sql.Time => t.toString
    case ts: java.sql.Timestamp => ts.toString
    case other => other
  }
}
