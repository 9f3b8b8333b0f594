package graft.sinks

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Transactional Postgres publish of one scan — the Spark-native form of
  * the reference's single-transaction epilogue (`fs.rs:103-114`,
  * `db.rs:34-136`): readers never observe a half-applied scan.
  *
  * JDBC has no distributed transaction, so the standard staged-table
  * resolution (SURVEY §7.3):
  *
  *  1. Executors bulk-append the enriched scan to a per-scan scratch table
  *     (`df.write.jdbc` with `batchsize` + `reWriteBatchedInserts=true` —
  *     the same one-round-trip-per-batch effect as the reference's
  *     array-bind UNNEST insert, `db.rs:72-100`, without manual
  *     transposition).
  *  2. The driver opens ONE connection, autocommit off, and runs the
  *     merge (J3, the reference's exact ON CONFLICT statement shape,
  *     `db.rs:105-118`), the anti-join tombstone UPDATE (J2,
  *     `db.rs:48-65`), drops the scratch table, and commits.
  *
  * Connection budget: `numPartitions` on the staging write caps parallel
  * connections (the reference pools 2, `db.rs:28`); the epilogue uses one.
  *
  * No Postgres server exists in this harness; the WHOLE execution path —
  * Spark's batched JDBC staging write, the single-connection
  * transactional epilogue, rollback on failure — runs live in tests
  * against an in-process DuckDB over JDBC (PgMergeSpec), with the
  * conflict-target spelling as the one documented dialect seam.
  */
object PgMerge {

  val table = "external_file"
  val constraint = "external_file_unique_constraint"

  /** Default conflict target: the reference names the constraint
    * (`db.rs:105`). Engines without named-constraint conflict targets
    * (the in-process DuckDB the test harness runs the epilogue against —
    * no Postgres server exists offline) pass the equivalent column set,
    * `(external_source, path, filename)`; everything else in the
    * statement runs verbatim on both. */
  val pgConflictTarget: String = s"ON CONSTRAINT $constraint"

  val pgDriver = "org.postgresql.Driver"

  def scratchName(scanId: String): String =
    "graft_scan_" + scanId.replaceAll("[^A-Za-z0-9_]", "_")

  /** J3 — conditional upsert from the scratch table. Mirrors
    * `db.rs:105-118`: insert new keys; update changed rows (including
    * mime_type); leave unchanged rows untouched so corrected mime_types
    * survive (`db.rs:88-90`). Uses IS DISTINCT FROM (documented deviation:
    * the reference's row-value `<>` is not null-safe, `db.rs:115-117`),
    * and resurrects reappeared files (`deleted = NULL` — the reference
    * leaves stale tombstones on reappearing keys).
    */
  def upsertSql(scratch: String, conflictTarget: String = pgConflictTarget): String =
    s"""INSERT INTO $table
       |  (external_source, filename, path, mime_type, created, modified, size, deleted)
       |SELECT external_source, filename, path, mime_type, created, modified, size, NULL
       |FROM $scratch
       |ON CONFLICT $conflictTarget DO UPDATE SET
       |  mime_type = EXCLUDED.mime_type,
       |  created = EXCLUDED.created,
       |  modified = EXCLUDED.modified,
       |  size = EXCLUDED.size,
       |  deleted = NULL
       |WHERE ($table.created IS DISTINCT FROM EXCLUDED.created
       |    OR $table.modified IS DISTINCT FROM EXCLUDED.modified
       |    OR $table.size IS DISTINCT FROM EXCLUDED.size
       |    OR $table.deleted IS NOT NULL)""".stripMargin

  /** J2 — tombstone every row of this source not present in the scan.
    * One set-based statement, transaction-start timestamp semantics
    * (`now()` is constant within the transaction, matching `db.rs:54`). */
  def markDeletedSql(scratch: String): String =
    s"""UPDATE $table SET deleted = now()
       |WHERE external_source = ?
       |  AND NOT EXISTS (SELECT 1 FROM $scratch t
       |    WHERE t.external_source = $table.external_source
       |      AND t.path = $table.path
       |      AND t.filename = $table.filename)""".stripMargin

  /** JDBC read of the current `external_file` slice for one source
    * (SURVEY §7.3 step 3). The `external_source` predicate is pushed into
    * the remote query (visible as `PushedFilters` in `.explain`), so only
    * this source's rows cross the wire; `partitionColumn` on a stable
    * numeric expression would shard the read for very large sources.
    */
  def readCurrent(
      spark: org.apache.spark.sql.SparkSession,
      jdbcUrl: String,
      user: String,
      password: String,
      externalSource: String,
      driverClass: String = pgDriver): DataFrame = {
    val props = new Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    props.setProperty("driver", driverClass)
    spark.read.jdbc(jdbcUrl, table, props)
      .filter(org.apache.spark.sql.functions.col("external_source") === externalSource)
  }

  /** Stage + merge + tombstone + commit. `scan` must carry columns
    * (external_source, path, filename, mime_type, created, modified, size).
    */
  def publishScan(
      scan: DataFrame,
      jdbcUrl: String,
      user: String,
      password: String,
      externalSource: String,
      maxConnections: Int = 2,
      driverClass: String = pgDriver,
      conflictTarget: String = pgConflictTarget): Unit = {
    val scratch = scratchName(java.util.UUID.randomUUID().toString)
    val props = new Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    props.setProperty("driver", driverClass)

    val staged = scan
      .coalesce(maxConnections)
      .write
      .mode(SaveMode.Append)
      .option("batchsize", 1000)
    // reWriteBatchedInserts is a Postgres driver property (collapses a
    // JDBC batch into one multi-row INSERT); other engines reject unknown
    // connection properties, and their executeBatch is already batched.
    (if (driverClass == pgDriver) staged.option("reWriteBatchedInserts", "true")
     else staged)
      .jdbc(jdbcUrl, scratch, props)

    var conn: Connection = null
    try {
      conn = DriverManager.getConnection(jdbcUrl, user, password)
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      st.execute(upsertSql(scratch, conflictTarget))
      val del = conn.prepareStatement(markDeletedSql(scratch))
      del.setString(1, externalSource)
      del.executeUpdate()
      st.execute(s"DROP TABLE $scratch")
      conn.commit()
    } catch {
      case e: Throwable =>
        if (conn != null) conn.rollback()
        throw e
    } finally {
      if (conn != null) conn.close()
    }
  }
}
