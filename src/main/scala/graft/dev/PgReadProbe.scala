package graft.dev

import graft.sinks.PgWireClient

/** Measures the two wire read transports over the same 10⁶-row result
  * on the live harness PostgreSQL (VERDICT r14 #1's "measured
  * COPY-vs-DataRow throughput ratio"): [[PgWireClient.queryStream]]
  * (one DataRow message per row — per-field Int32 length headers, one
  * protocol message per row) vs [[PgWireClient.copyOut]] (`COPY … TO
  * STDOUT`, rows packed as tab-separated text in CopyData frames).
  * Both paths fully decode every field to `Vector[Option[String]]`, so
  * the delta is transport + parse, not work skipped. Best of 3 each,
  * bytes from the client's own counter. */
object PgReadProbe {
  def main(args: Array[String]): Unit = {
    val host = sys.env.getOrElse("PGWIRE_HOST", "127.0.0.1")
    val port = sys.env.get("PGPORT").flatMap(_.toIntOption).getOrElse(54329)
    val c = new PgWireClient(host, port, "postgres", "postgres")
    try {
      c.exec("DROP TABLE IF EXISTS pg_read_probe")
      c.exec("CREATE TABLE pg_read_probe AS " +
        "SELECT 'src-' || (i % 13) AS s, '/path/' || (i % 97) AS p, " +
        "'file_' || i AS f, 'text/plain' AS m, " +
        "TIMESTAMPTZ '2026-01-02 03:04:05.678901+00' + (i || ' s')::interval AS ts, " +
        "i AS n FROM generate_series(1, 1000000) g(i)")
      val select = "SELECT s, p, f, m, ts, n FROM pg_read_probe"

      def run(label: String, iter: () => Iterator[Vector[Option[String]]])
          : Double = {
        val times = (1 to 3).map { _ =>
          val b0 = c.bytesReceived
          val t0 = System.nanoTime()
          var rows = 0L
          var fields = 0L
          iter().foreach { r => rows += 1; fields += r.count(_.isDefined) }
          val sec = (System.nanoTime() - t0) / 1e9
          require(rows == 1000000L && fields == 6000000L,
            s"$label: $rows rows / $fields fields")
          println(f"  $label%-9s $sec%6.3f s  " +
            f"${(c.bytesReceived - b0) / 1e6}%7.1f MB  " +
            f"${rows / sec / 1e6}%5.2f M rows/s")
          sec
        }
        times.min
      }

      val dataRow = run("datarow", () => c.queryStream(select))
      val copy = run("copy", () => c.copyOut(s"COPY ($select) TO STDOUT"))
      println(f"best-of-3: datarow ${dataRow}%.3f s, copy ${copy}%.3f s " +
        f"-> COPY is ${dataRow / copy}%.2fx the DataRow throughput")
      // column pruning: the same rows, 2 of 6 columns — the byte and
      // wall-clock delta a pruned graft-pg projection keeps off the wire
      val b0 = c.bytesReceived
      val t0 = System.nanoTime()
      var n = 0L
      c.copyOut("COPY (SELECT f, n FROM pg_read_probe) TO STDOUT")
        .foreach(_ => n += 1)
      val sec = (System.nanoTime() - t0) / 1e9
      require(n == 1000000L)
      println(f"  pruned(2/6) $sec%6.3f s  ${(c.bytesReceived - b0) / 1e6}%7.1f MB")
      c.exec("DROP TABLE pg_read_probe")
    } finally c.close()
  }
}
