package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sinks.{PgMerge, PgWireClient}

/** Quantifies the changefeed's O(changes) claim on the live harness
  * PostgreSQL: drain N changes through the `graft-pg mode=changefeed`
  * stream (logical decoding end-to-end: server-side pgoutput decode →
  * wire transport → the engine's message decoder → InternalRows) and
  * compare against the rescan watch's cost model, where EVERY trigger
  * re-reads the whole table regardless of how little changed.
  *
  *   sbt "runMain graft.dev.CdcProbe [nRows] [rowsPerTx]"
  *
  * Prints changefeed rows/s (one bounded AvailableNow drain to the
  * noop sink), the batch-scan rows/s over the same table, and the
  * break-even table size: with T-row tables and C changed rows per
  * trigger, rescan costs T/scanRate per trigger vs C/feedRate — the
  * feed wins whenever T/C exceeds scanRate/feedRate, i.e. from a few
  * percent churn down the feed is the only shape that survives scale.
  */
object CdcProbe {
  def main(args: Array[String]): Unit = {
    // 1M default (r17): at 200k the ~3-4 s fixed stream-startup cost
    // dominates and repeat runs swing ±20% — measure ≥1M for a
    // steady-state drain number
    val nRows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val perTx = if (args.length > 1) args(1).toInt else 2000
    val host = sys.env.getOrElse("PGWIRE_HOST", "127.0.0.1")
    val port = sys.env.get("PGPORT").flatMap(_.toIntOption).getOrElse(54329)
    val url = s"$host:$port/postgres"
    val slot = "graft_cdc_probe"

    val c = new PgWireClient(host, port, "postgres", "postgres")
    try {
      require(c.queryOne("SHOW wal_level").contains("logical"),
        "CdcProbe needs wal_level=logical on the harness server")
      c.exec(s"DROP TABLE IF EXISTS ${PgMerge.table}")
      c.exec(
        s"""CREATE TABLE ${PgMerge.table} (
           |  external_source TEXT, path TEXT, filename TEXT,
           |  mime_type TEXT, created TIMESTAMPTZ, modified TIMESTAMPTZ,
           |  size BIGINT, deleted TIMESTAMPTZ,
           |  CONSTRAINT ${PgMerge.constraint}
           |    UNIQUE (external_source, path, filename))""".stripMargin)
      if (c.queryOne("SELECT count(*) FROM pg_replication_slots WHERE " +
        s"slot_name = '$slot'") == Some("1"))
        c.query(s"SELECT pg_drop_replication_slot('$slot')")
      c.exec("DROP PUBLICATION IF EXISTS graft_probe_pub")
    } finally c.close()

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the slot first (stream bootstrap is idempotent, but the backlog
    // must land AFTER the slot exists to be decodable)
    graft.sources.v2.PgChangeFeed.bootstrapSnapshot(Map(
      "url" -> url, "slot" -> slot,
      "publication" -> "graft_probe_pub")).close()

    // the backlog: nRows inserts in perTx-row transactions
    val w = new PgWireClient(host, port, "postgres", "postgres")
    val insertSecs =
      try {
        val t0 = System.nanoTime()
        var lo = 0L
        while (lo < nRows) {
          val hi = math.min(nRows, lo + perTx)
          w.exec(s"INSERT INTO ${PgMerge.table} " +
            s"SELECT 'probe', '/p' || (i % 97), 'f' || i, 'text/plain', " +
            "NULL, TIMESTAMPTZ '2026-01-02 03:04:05+00', i, NULL " +
            s"FROM generate_series(${lo + 1}, $hi) g(i)")
          lo = hi
        }
        (System.nanoTime() - t0) / 1e9
      } finally w.close()

    // drain the whole backlog through the changefeed (one AvailableNow
    // run, default unbounded batches) into the noop sink
    val t1 = System.nanoTime()
    val q = spark.readStream.format("graft-pg")
      .option("url", url).option("mode", "changefeed")
      .option("slot", slot).option("publication", "graft_probe_pub")
      .load()
      .writeStream.format("noop").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    require(q.awaitTermination(600000L), "drain timed out")
    val feedSecs = (System.nanoTime() - t1) / 1e9
    val fed = q.recentProgress.map(_.numInputRows).sum
    require(fed == nRows, s"drained $fed of $nRows")

    // the rescan comparator: one full batch read of the same table —
    // hash() over every column defeats the aggregate/count pushdown
    // (which would otherwise fold the "read" into ONE server-side
    // count row shipping nothing, r17: the r16 runtime-pushdown work
    // made a bare .count() measure the server's aggregate, not the
    // transport this comparator exists to price)
    def scanOnce(): Double = {
      val t = System.nanoTime()
      val df = spark.read.format("graft-pg").option("url", url)
        .option("partitions", "8").load()
        .filter(col("external_source") === "probe")
      val n = df.select(hash(df.columns.map(col).toSeq: _*).as("h"))
        .agg(count("h")).collect()(0).getLong(0)
      require(n == nRows, s"scan read $n")
      (System.nanoTime() - t) / 1e9
    }
    scanOnce() // warm
    val scanSecs = (1 to 3).map(_ => scanOnce()).min

    val feedRate = nRows / feedSecs
    val scanRate = nRows / scanSecs
    println(f"CdcProbe: $nRows rows in ${nRows / perTx} transactions")
    println(f"  insert   ${nRows / insertSecs}%9.0f rows/s ($insertSecs%6.2f s)")
    println(f"  feed     $feedRate%9.0f rows/s ($feedSecs%6.2f s, " +
      "decode+wire+adapt end-to-end)")
    println(f"  rescan   $scanRate%9.0f rows/s ($scanSecs%6.2f s per full read)")
    println(f"  => a trigger seeing C changed rows on a T-row table: " +
      f"feed wins when T/C > ${scanRate / feedRate}%.2f " +
      "(rescan pays T every trigger; the feed pays C)")

    val c2 = new PgWireClient(host, port, "postgres", "postgres")
    try {
      c2.query(s"SELECT pg_drop_replication_slot('$slot')")
      c2.exec("DROP PUBLICATION IF EXISTS graft_probe_pub")
      c2.exec(s"DROP TABLE ${PgMerge.table}")
    } finally c2.close()
    spark.stop()
  }
}
