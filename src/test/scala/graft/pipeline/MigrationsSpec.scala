package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Ledger mechanics of the reference's migration scheme
  * (001_core_schema.sql:5-31,285-289) against embedded Derby: apply-once,
  * ordered, atomic-with-rollback, converged re-runs are no-ops. */
class MigrationsSpec extends AnyFunSuite {
  private val url = "jdbc:derby:memory:graftmig;create=true"
  private val props = new java.util.Properties()

  private def query1(sql: String): Seq[String] = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      val out = Seq.newBuilder[String]
      while (rs.next()) out += rs.getString(1)
      out.result()
    } finally conn.close()
  }

  test("migrations apply once, in order, and re-runs are no-ops") {
    val m1 = Migrations.Migration("001_core",
      Seq("CREATE TABLE mig_owners (owner_id BIGINT PRIMARY KEY, login VARCHAR(64) NOT NULL)"))
    val m2 = Migrations.Migration("002_repos",
      Seq("CREATE TABLE mig_repos (repo_id BIGINT PRIMARY KEY, owner_id BIGINT REFERENCES mig_owners(owner_id))",
        "INSERT INTO mig_owners VALUES (1, 'seed')"))

    assert(Migrations.migrate(url, props, Seq(m1, m2)) == Seq("001_core", "002_repos"))
    assert(query1(s"SELECT migration_name FROM ${Migrations.LedgerTable} ORDER BY migration_name")
      == Seq("001_core", "002_repos"))
    assert(query1("SELECT login FROM mig_owners") == Seq("seed"))

    // converged: nothing applies, ledger unchanged, seed row not duplicated
    assert(Migrations.migrate(url, props, Seq(m1, m2)).isEmpty)
    assert(query1("SELECT login FROM mig_owners") == Seq("seed"))

    // a later migration appends without re-running earlier ones
    val m3 = Migrations.Migration("003_idx",
      Seq("CREATE INDEX mig_repo_owner ON mig_repos(owner_id)"))
    assert(Migrations.migrate(url, props, Seq(m1, m2, m3)) == Seq("003_idx"))
  }

  test("a failing migration rolls back atomically and records nothing") {
    val good = Migrations.Migration("010_ok",
      Seq("CREATE TABLE mig_ok (id BIGINT PRIMARY KEY)"))
    val bad = Migrations.Migration("011_bad",
      Seq("INSERT INTO mig_ok VALUES (1)",      // would take effect...
        "CREATE TABLE mig_ok (id BIGINT)"))     // ...then fails (dup table)
    val after = Migrations.Migration("012_never", Seq("CREATE TABLE mig_never (id BIGINT)"))

    val e = intercept[IllegalStateException] {
      Migrations.migrate(url, props, Seq(good, bad, after))
    }
    assert(e.getMessage.contains("011_bad"))
    // good applied and recorded; bad left NO trace (insert rolled back);
    // later migrations never ran (fail-stop)
    assert(query1(s"SELECT migration_name FROM ${Migrations.LedgerTable} " +
      "WHERE migration_name LIKE '01%' ORDER BY 1") == Seq("010_ok"))
    assert(query1("SELECT COUNT(*) FROM mig_ok") == Seq("0"))
    assert(!java.sql.DriverManager.getConnection(url, props).getMetaData
      .getTables(null, null, "MIG_NEVER", null).next())
  }
}
