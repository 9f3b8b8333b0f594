package graft.dev

import graft.sinks.{PgMerge, PgWireClient}
import graft.sources.v2.PgChangeFeed

/** Splits the changefeed drain cost into its layers (the r17 transport
  * work needs to know WHERE the ~23 µs/row goes):
  *   (a) server-side decode only   — count(*) over the peek
  *   (b) + wire transport          — raw binary drain, bytes discarded
  *   (c) + message decode          — Decoder.feed on every frame
  * against the same 8-column external_file backlog CdcProbe uses.
  *
  *   sbt "runMain graft.dev.CdcDecodeProbe [nRows]"
  */
object CdcDecodeProbe {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(200000L)
    val host = sys.env.getOrElse("PGWIRE_HOST", "127.0.0.1")
    val port = sys.env.get("PGPORT").flatMap(_.toIntOption).getOrElse(54329)
    val slot = "graft_cdc_decode_probe"

    val c = new PgWireClient(host, port, "postgres", "postgres")
    try {
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

    PgChangeFeed.bootstrapSnapshot(Map(
      "url" -> s"$host:$port/postgres", "slot" -> slot,
      "publication" -> "graft_probe_pub")).close()

    val w = new PgWireClient(host, port, "postgres", "postgres")
    try {
      var lo = 0L
      while (lo < nRows) {
        val hi = math.min(nRows, lo + 1000)
        w.exec(s"INSERT INTO ${PgMerge.table} " +
          s"SELECT 'probe', '/p' || (i % 97), 'f' || i, 'text/plain', " +
          "NULL, TIMESTAMPTZ '2026-01-02 03:04:05+00', i, NULL " +
          s"FROM generate_series(${lo + 1}, $hi) g(i)")
        lo = hi
      }
    } finally w.close()

    val fnArgs = s"('$slot', NULL, NULL, 'proto_version', '1', " +
      "'publication_names', 'graft_probe_pub')"
    def timed[A](what: String, rows: Long)(f: => A): A = {
      val t = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t) / 1e9
      println(f"  $what%-28s ${rows / s}%9.0f rows/s ($s%6.2f s)")
      r
    }

    val p = new PgWireClient(host, port, "postgres", "postgres")
    try {
      timed("server decode only", nRows) {
        p.queryOne("SELECT count(*) FROM " +
          s"pg_logical_slot_peek_binary_changes$fnArgs")
      }
      timed("+ binary wire drain", nRows) {
        var n = 0L
        val it = p.queryStreamRaw(
          s"SELECT lsn, data FROM pg_logical_slot_peek_binary_changes$fnArgs")
        while (it.hasNext) { it.next(); n += 1 }
        require(n > nRows, s"$n frames")
      }
      timed("+ hex wire drain", nRows) {
        var n = 0L
        val it = p.queryStream("SELECT lsn, encode(data,'hex') FROM " +
          s"pg_logical_slot_peek_binary_changes$fnArgs")
        while (it.hasNext) { it.next(); n += 1 }
        require(n > nRows, s"$n frames")
      }
      timed("+ Decoder.feed (binary)", nRows) {
        val d = new PgChangeFeed.Decoder(PgMerge.table)
        var changes = 0L
        val it = p.queryStreamRaw(
          s"SELECT lsn, data FROM pg_logical_slot_peek_binary_changes$fnArgs")
        while (it.hasNext) changes += d.feed(it.next()(1).get).length
        require(changes == nRows, s"$changes changes")
      }
    } finally p.close()

    val c2 = new PgWireClient(host, port, "postgres", "postgres")
    try {
      c2.query(s"SELECT pg_drop_replication_slot('$slot')")
      c2.exec("DROP PUBLICATION IF EXISTS graft_probe_pub")
      c2.exec(s"DROP TABLE ${PgMerge.table}")
    } finally c2.close()
  }
}
