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
  *
  * CONTRACT: atomic rollback of a failed migration requires the backend
  * to support transactional DDL (Derby, PostgreSQL, SQL Server with
  * XACT_ABORT — the reference's target). Backends that auto-commit each
  * DDL statement (MySQL, Oracle) would leave a partially applied
  * migration committed with no ledger row, so [[migrate]] probes
  * `DatabaseMetaData.supportsDataDefinitionAndDataManipulationTransactions`
  * / `dataDefinitionCausesTransactionCommit` and fails fast BEFORE
  * applying anything rather than corrupt silently.
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
      requireTransactionalDdl(conn)
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

  /** Fail fast on backends where DDL auto-commits: there, a mid-migration
    * failure could NOT be rolled back and the ledger's atomicity promise
    * would silently not hold. Metadata probes that themselves throw are
    * treated as "unknown" and allowed through (some drivers stub them) —
    * the guard targets backends that ADMIT non-transactional DDL. */
  private def requireTransactionalDdl(conn: Connection): Unit = {
    val meta = conn.getMetaData
    def probe(f: => Boolean, default: Boolean): Boolean =
      try f catch { case _: Throwable => default }
    val ddlInTxn =
      probe(meta.supportsDataDefinitionAndDataManipulationTransactions(), true)
    val ddlCommits = probe(meta.dataDefinitionCausesTransactionCommit(), false)
    val ddlIgnored = probe(meta.dataDefinitionIgnoredInTransactions(), false)
    require(ddlInTxn && !ddlCommits && !ddlIgnored,
      s"backend ${probe2(meta)} does not support transactional DDL " +
        "(DDL auto-commits or is ignored in transactions); the migration " +
        "ledger cannot guarantee atomic rollback there — refusing to run")
  }

  private def probe2(meta: java.sql.DatabaseMetaData): String =
    try meta.getDatabaseProductName catch { case _: Throwable => "<unknown>" }
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
