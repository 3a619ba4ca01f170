package graft.pipeline

import java.sql.{Connection, DriverManager}

/** Schema-migration idempotence ledger — the one §2.7 row previously
  * scoped out, re-expressed engine-side (reference:
  * migrations/001_core_schema.sql:5-31,285-289). Semantics preserved:
  *
  *  - a `schema_migrations` table (migration_name PK, applied_at) records
  *    what has run;
  *  - each migration applies AT MOST ONCE — re-running the whole sequence
  *    skips recorded names (the reference's `IF EXISTS ... RETURN`);
  *  - a migration's statements apply atomically with its ledger row (the
  *    reference's `BEGIN TRANSACTION` + `XACT_ABORT`): on failure
  *    everything in that migration rolls back, nothing is recorded, and
  *    the run fail-stops (later migrations may depend on earlier ones);
  *  - declared order is application order.
  *
  * The DDL strings themselves stay dialect-specific (the reference's are
  * T-SQL; the Derby test uses ANSI DDL) — the LEDGER mechanics are what
  * this module owns.
  */
object Migrations {

  final case class Migration(name: String, statements: Seq[String])

  val LedgerTable = "schema_migrations"

  private def applied(conn: Connection): Set[String] = {
    val rs = conn.createStatement()
      .executeQuery(s"SELECT migration_name FROM $LedgerTable")
    val out = Seq.newBuilder[String]
    while (rs.next()) out += rs.getString(1)
    out.result().toSet
  }

  /** Apply every not-yet-recorded migration in order; returns the names
    * actually applied this run (empty on a converged re-run). */
  def migrate(
      url: String, props: java.util.Properties,
      migrations: Seq[Migration]): Seq[String] = {
    // force strictness up front: a lazy Seq would defer filter/map past
    // the finally that closes the connection
    val all = migrations.toList
    require(all.map(_.name).distinct.size == all.size,
      "duplicate migration names")
    val conn = DriverManager.getConnection(url, props)
    try {
      if (!JdbcMeta.tableExists(conn, LedgerTable)) {
        conn.createStatement().executeUpdate(
          s"""CREATE TABLE $LedgerTable (
             |  migration_name VARCHAR(255) NOT NULL PRIMARY KEY,
             |  applied_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP
             |)""".stripMargin)
      }
      val done = applied(conn)
      val todo = all.filterNot(m => done.contains(m.name))
      conn.setAutoCommit(false)
      val ins = conn.prepareStatement(
        s"INSERT INTO $LedgerTable (migration_name) VALUES (?)")
      try {
        todo.map { m =>
          try {
            val stmt = conn.createStatement()
            try {
              m.statements.foreach(stmt.executeUpdate)
              ins.setString(1, m.name)
              ins.executeUpdate()
            } finally stmt.close()
            conn.commit()
            m.name
          } catch {
            case e: Throwable =>
              conn.rollback() // the failed migration leaves no trace
              throw new IllegalStateException(
                s"migration ${m.name} failed and was rolled back", e)
          }
        }
      } finally ins.close()
    } finally conn.close()
  }
}

/** One shared implementation of the JDBC metadata table-existence probe:
  * `DatabaseMetaData.getTables` takes a PATTERN, so '_' and '%' in a
  * table name must be escaped or an unrelated table can fake a match
  * (MXUSERS vs m_users), and the search is pinned to the connection's
  * current schema so another application's ledger in a sibling schema
  * can't shadow ours. */
private[pipeline] object JdbcMeta {
  def tableExists(conn: Connection, table: String): Boolean = {
    val meta = conn.getMetaData
    val esc = meta.getSearchStringEscape
    def escaped(t: String): String =
      t.replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
    val schema =
      try Option(conn.getSchema).filter(_.nonEmpty).orNull
      catch { case _: Throwable => null } // drivers may not implement it
    Seq(table, table.toUpperCase, table.toLowerCase)
      .exists(t => meta.getTables(null, schema, escaped(t), null).next())
  }
}
