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
    * the schema/table names on the returned rows: an underscore acting
    * as a wildcard can then never produce a false "exists".
    *
    * The comparison direction is chosen by failure mode — a false
    * "missing" routes the streaming sink to DROP+CREATE (destroys the
    * standing table), a false "exists" routes it to a MERGE that fails
    * LOUDLY and retries. Hence:
    *  - names are compared case-INsensitively (a case-insensitive
    *    store like default-collation SQL Server returns the stored
    *    case, which may differ from the probe's);
    *  - names are stripped first (the DDL path's Dialect.quote strips,
    *    so that is the form on the server);
    *  - `types = null` deliberately counts views/synonyms as "exists":
    *    an object of any type squatting on the name must block the
    *    DROP+CREATE branch (type-name vocabularies also differ across
    *    drivers — restricting to "TABLE" risks the destructive false
    *    "missing" on a driver that names base tables differently);
    *  - the schema on returned rows is read null-safely from
    *    TABLE_SCHEM, falling back to TABLE_CAT (some drivers report
    *    the namespace there), and a row reporting NEITHER counts as a
    *    schema match — on a schema-less store the name alone decides,
    *    again resolving the ambiguity toward "exists". */
  def tableExists(url: String, schema: String, table: String): Boolean =
    withConnection(url) { conn =>
      val (s, t) = (schema.strip(), table.strip())
      val md = conn.getMetaData
      val esc = Option(md.getSearchStringEscape).getOrElse("")
      def pat(x: String) =
        if (esc.isEmpty) x
        else x.replace(esc, esc + esc)
          .replace("_", esc + "_").replace("%", esc + "%")
      def schemaMatches(rs: java.sql.ResultSet): Boolean = {
        val sch = rs.getString("TABLE_SCHEM")
        if (sch != null) sch.strip().equalsIgnoreCase(s)
        else {
          val cat = rs.getString("TABLE_CAT")
          cat == null || cat.strip().equalsIgnoreCase(s)
        }
      }
      def scan(rs: java.sql.ResultSet): Boolean =
        try {
          var found = false
          while (!found && rs.next())
            found = schemaMatches(rs) &&
              rs.getString("TABLE_NAME").equalsIgnoreCase(t)
          found
        } finally rs.close()
      // Widening ladder, paid only on the would-be-destructive
      // "missing" path:
      //  1. exact-pattern probe — the common hit;
      //  2. schema-scoped wildcard — catches TABLE-name case divergence
      //     on a case-SENSITIVE metadata store (the LIKE itself is
      //     case-sensitive there) without enumerating the catalog;
      //  3. FULL catalog listing, UNCONDITIONALLY as the last rung.
      //     Rung 3 must not be skipped when rung 2 merely listed rows:
      //     with schemas "DBO" (exists, no such table) and "dbo"
      //     (holds the table) on a case-sensitive store, rung 2 lists
      //     "DBO" and misses — only the catalog-wide case-insensitive
      //     scan finds the table, and a false "missing" here routes a
      //     caller to destructive DROP+CREATE. The catalog enumeration
      //     cost is paid only when the table genuinely looks absent —
      //     exactly when getting the answer right matters most.
      //     Known, deliberate cost of the catalog-wide rung: on a
      //     driver whose rows carry NEITHER TABLE_SCHEM nor TABLE_CAT,
      //     schemaMatches resolves the ambiguity toward "exists", so a
      //     same-named table in an unrelated namespace can read as
      //     present — a false "exists" that fails LOUDLY downstream
      //     (MERGE to a missing table) and is retryable, versus the
      //     false "missing" whose DROP+CREATE destroys data. Direction
      //     chosen by failure mode, as the scaladoc above states.
      // The scans' case-insensitive re-verification keeps every rung
      // exact.
      scan(md.getTables(null, pat(s), pat(t), null)) ||
        scan(md.getTables(null, pat(s), "%", null)) ||
        scan(md.getTables(null, "%", "%", null))
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
