package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only: per-phase attribution for the StreamBench op rows (VERDICT
  * r21 #3 — "profile the state-store ops the way JobProfile cracked the
  * batch queries"). Runs each op through the same harness the bench
  * uses and prints, per micro-batch, the engine's own durationMs
  * breakdown (addBatch = actual work, plus the fixed-cost phases:
  * latestOffset/getBatch source bookkeeping, queryPlanning, walCommit =
  * offset-log fsync, commitOffsets = commit-log fsync) and the state
  * operator's commit time — so "where do the 43 s go" is measured, not
  * guessed, before touching anything.
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.{RocksDb, StreamBench}
    val nRows = 200000L
    val dir = java.nio.file.Files.createTempDirectory("graft_sprof").toString
    StreamBench.writeStreamDir(spark, dir, nRows, 8)
    val scanDir = java.nio.file.Files
      .createTempDirectory("graft_sprof_scan").toString + "/scans"
    StreamBench.writeScanDir(spark, scanDir, math.max(1000L, nRows / 8L), 8)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    def profile(name: String, mode: String,
        mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val q = mk().writeStream.format("noop").outputMode(mode)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val ps = q.recentProgress
      val keys = Seq("addBatch", "latestOffset", "getBatch", "queryPlanning",
        "triggerExecution", "walCommit", "commitOffsets")
      println(f"== $name%-12s total=$secs%6.2f s  batches=${ps.length}")
      val sums = keys.map(k => k ->
        ps.map(p => Option(p.durationMs.get(k)).map(_.toLong).getOrElse(0L)).sum)
      println("   " + sums.map { case (k, v) => s"$k=${v}ms" }.mkString(" "))
      val commit = ps.flatMap(_.stateOperators.map(_.allUpdatesTimeMs)).sum
      val commitT = ps.flatMap(_.stateOperators.map(_.commitTimeMs)).sum
      println(s"   stateUpdates=${commit}ms stateCommit=${commitT}ms")
    }

    val src = () => StreamBench.sourceStream(spark, dir)
    try {
      profile("tumbling", "update", () => StreamBench.tumbling(src()))
      profile("sliding", "update", () => StreamBench.sliding(src()))
      profile("session", "append", () => StreamBench.session(src()))
      profile("dedup", "append", () => StreamBench.dedup(src()))
      profile("join", "append", () => StreamBench.intervalJoin(src()))
      profile("fmgs", "update", () => StreamBench.userTotals(spark, src()))
      RocksDb.withRocksDb(spark) {
        profile("tws_totals", "update", () => StreamBench.twsTotals(spark, src()))
      }
      RocksDb.withRocksDb(spark) {
        profile("scrape_tws", "append", () => StreamBench.scrapeTws(spark, scanDir))
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.stop()
  }
}
