package graft.dev

import graft.sinks.PgWireClient

/** Measures the r17 timestamp fast path against the general ISO parser
  * it replaced on the per-row hot loops (two parses per COPY shard row,
  * one per changefeed change):
  *
  *   sbt "runMain graft.dev.TsParseProbe [n]"
  */
object TsParseProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000000)
    val rnd = new scala.util.Random(17)
    val samples = Array.fill(1024) {
      val micros = 1700000000000000L + (rnd.nextLong() % 100000000000000L)
      val sec = Math.floorDiv(micros, 1000000L)
      val frac = Math.floorMod(micros, 1000000L)
      val base = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochSecond(sec))
      val f = if (frac == 0L) ""
        else "." + f"$frac%06d".reverse.dropWhile(_ == '0').reverse
      s"$base$f+00"
    }
    def time(label: String, f: String => Long): Unit = {
      var sink = 0L
      var i = 0
      // warmup then measure
      while (i < n / 4) { sink ^= f(samples(i & 1023)); i += 1 }
      val t0 = System.nanoTime()
      i = 0
      while (i < n) { sink ^= f(samples(i & 1023)); i += 1 }
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $label%-22s ${n / s / 1e6}%7.1f M parses/s " +
        f"(${s / n * 1e9}%6.1f ns/parse, sink=$sink%d)")
    }
    time("general (OffsetDateTime)", s => {
      val i = PgWireClient.parsePgTimestamp(s).toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    })
    time("fast (integer arith)", PgWireClient.pgTimestampMicros)
  }
}
