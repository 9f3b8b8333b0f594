package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the `compact` lifecycle kernel (r19):
  * synthesize a change-event log of `keys` file identities × `scans`
  * re-stamped events each (the O(deleted × scans) growth shape the
  * command exists to cut), then time the staged compaction write —
  * the same `compactedEvents → parquet` job `graft.Main compact`
  * stages before its swap. Prints events/s and the shrink ratio.
  *
  * `sbt "runMain graft.dev.CompactProbe [keys] [scans]"`
  * (defaults 200000 × 50 = 10M events).
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val keys = if (args.length > 0) args(0).toLong else 200000L
    val scans = if (args.length > 1) args(1).toInt else 50
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graft_cp_probe")
      .toString
    val log = s"$dir/events"
    try {
    // one delete event per key per scan — every key tombstoned and
    // re-stamped each scan, the worst-case growth mix
    (0 until scans).foreach { s =>
      spark.range(keys).select(
        concat(lit("gen_"), col("id").cast("string"))
          .as("uuid_external_file"),
        lit("probe").as("external_source"),
        concat(lit("/d"), (col("id") % 100).cast("string")).as("path"),
        concat(lit("f"), col("id").cast("string")).as("filename"),
        lit("text/plain").as("mime_type"),
        lit(null).cast("bigint").as("created_ms"),
        (col("id") * 2L).as("modified_ms"),
        col("id").as("size"),
        lit(1000000L + s * 1000L).cast("bigint").as("deleted_ms"),
        lit("delete").as("action"),
        lit(1000000L + s * 1000L).cast("bigint").as("event_ms"),
        lit(0L).as("event_seq"))
        .write.mode("append").parquet(log)
    }
    val n = spark.read.parquet(log).count()
    val t0 = System.nanoTime()
    graft.streaming.ScrapeTws.compactedEvents(spark.read.parquet(log))
      .write.mode("overwrite").parquet(s"$dir/stage")
    val secs = (System.nanoTime() - t0) / 1e9
    val after = spark.read.parquet(s"$dir/stage").count()
    println(f"[compact-probe] events=$n%d keys=$keys%d -> $after%d " +
      f"rows in $secs%.2f s (${(n / secs).toLong}%d events/s, " +
      f"${n.toDouble / after}%.0fx shrink)")
    } finally {
      // a 10M-event default run leaves hundreds of MB in /tmp —
      // clean up and stop crash-safely (review r19)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      try rm(new java.io.File(dir))
      catch { case _: Throwable => () }
      spark.stop()
    }
  }
}
