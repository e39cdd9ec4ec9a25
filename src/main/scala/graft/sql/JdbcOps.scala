package graft.sql

import java.sql.{Connection, DriverManager}

/** Raw-connection JDBC helpers (SURVEY.md §2 O9/O10/O21/O22): DDL,
  * CREATE SCHEMA, MERGE — the statements Spark's JDBC writer cannot
  * express. One connection per logical operation, driver-side only;
  * bulk row traffic goes through the distributed JDBC writer instead.
  */
object JdbcOps {

  def withConnection[A](url: String)(f: Connection => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  /** Execute one statement, autocommit (reference db.py:104-119). */
  def execute(url: String, stmt: String): Unit =
    withConnection(url) { conn =>
      val st = conn.createStatement()
      try st.execute(stmt) finally st.close()
    }

  /** Execute a statement, swallowing failures — for drops/creates that
    * are idempotent by intent but whose engine lacks IF EXISTS (Derby). */
  def executeIgnore(url: String, stmt: String): Unit =
    try execute(url, stmt) catch { case _: java.sql.SQLException => () }

  /** Table-existence check via DatabaseMetaData. Unlike a probe
    * SELECT, there is no exception ambiguity: a genuinely absent table
    * returns false, while a transient failure (lock timeout,
    * connection reset, failover) PROPAGATES — callers that branch to
    * destructive DDL on "missing" must never mistake a blip for
    * absence. getTables treats its arguments as LIKE patterns and some
    * drivers ship NO usable escape string (Derby's
    * getSearchStringEscape returns "" — caught by the spec), so rather
    * than trusting pattern escaping the match is re-verified against
    * the literal schema/table names on the returned rows: an
    * underscore acting as a wildcard can then never produce a false
    * "exists" (which would mis-route the streaming sink's
    * create-vs-merge branch). */
  def tableExists(url: String, schema: String, table: String): Boolean =
    withConnection(url) { conn =>
      val md = conn.getMetaData
      val esc = Option(md.getSearchStringEscape).getOrElse("")
      def pat(s: String) =
        if (esc.isEmpty) s
        else s.replace(esc, esc + esc)
          .replace("_", esc + "_").replace("%", esc + "%")
      val rs = md.getTables(null, pat(schema), pat(table), null)
      try {
        var found = false
        while (!found && rs.next())
          found = rs.getString("TABLE_SCHEM") == schema &&
            rs.getString("TABLE_NAME") == table
        found
      } finally rs.close()
    }

  def queryCount(url: String, sql: String): Long =
    withConnection(url) { conn =>
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(sql)
        rs.next()
        rs.getLong(1)
      } finally st.close()
    }
}
