package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Scrape

/** The reference's whole loop — scan batches → merge → tombstone — as an
  * incremental Structured-Streaming pipeline (SURVEY §2.10):
  *
  *  - micro-batch source: a watched directory of scan-listing parquet
  *    files, one file per trigger (`maxFilesPerTrigger=1` — the
  *    count-or-time chunking of `fs.rs:100` in Spark form);
  *  - `foreachBatch`: each batch merges into the persistent state exactly
  *    like the batch pipeline (J3 upsert classify + J2 deletion
  *    tombstoning), then atomically publishes the new snapshot — the
  *    `foreachBatch` epilogue is where the JDBC transaction (PgMerge)
  *    would run against Postgres; here state is a parquet snapshot dir,
  *    swapped via staging write + rename for the same readers-never-see-
  *    half-a-scan guarantee (K2, `fs.rs:103-114`).
  *
  * Each arriving file is treated as ONE complete scan of its
  * external_source (so vanished keys tombstone per batch).
  */
object ScrapeStream {

  private val stateCols = Seq("uuid_external_file", "external_source",
    "path", "filename", "mime_type", "created", "modified", "size", "deleted")

  /** Read the current snapshot (empty-schema DataFrame when absent).
    * Columns come back in canonical order regardless of the partition
    * layout (partition columns append last on read). */
  def readState(spark: SparkSession, stateDir: String): DataFrame = {
    val p = Paths.get(stateDir)
    if (Files.exists(p) && Files.list(p).findFirst().isPresent)
      spark.read.parquet(stateDir).select(stateCols.map(col): _*)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "uuid_external_file string, external_source string, path string, " +
            "filename string, mime_type string, created timestamp, " +
            "modified timestamp, size bigint, deleted timestamp"))
  }

  /** One batch of the merge loop: classify, apply, tombstone, publish.
    *
    * Partition-incremental: a scan touches only its own `external_source`
    * partition(s). The current state is read partition-pruned to the
    * scanned sources (matching is on (source, path, filename), so rows of
    * other sources can never join the scan), and the write uses dynamic
    * partition overwrite — partitions absent from the batch output are
    * left physically untouched. At 100 TB state a 1-file scan of one
    * source therefore rewrites one partition, not the whole table.
    * Publication atomicity is per partition (Spark's commit protocol
    * stages and swaps each partition dir); since one scan file = one
    * complete scan of one source, that is exactly per-scan atomicity. */
  def mergeBatch(spark: SparkSession, stateDir: String)(
      scan: DataFrame, batchId: Long): Unit = {
    // Bounded driver-side collect: one row per scanned source (a batch is
    // one scan file, almost always a single source).
    val sources = scan.select("external_source").distinct()
      .collect().map(_.getString(0)).toIndexedSeq
    if (sources.isEmpty) return
    val current = readState(spark, stateDir)
      .filter(col("external_source").isin(sources: _*))
    val classified = Scrape.upsertClassify(current, scan)
    val scanInstant = lit(new java.sql.Timestamp(1767225600000L + batchId))
      .cast("timestamp") // deterministic per-batch "transaction time"
    val applied = classified.select(
      coalesce(col("uuid_external_file"),
        concat(lit("gen_"), md5(concat_ws("\u001f",
          col("external_source"), col("path"), col("filename")))))
        .as("uuid_external_file"),
      col("external_source"), col("path"), col("filename"),
      col("mime_type"), col("created"), col("modified"), col("size"),
      lit(null).cast("timestamp").as("deleted"))
    val dels = Scrape.deletions(current, scan, scanInstant)
      .select("uuid_external_file", "deleted")
    val untouchedDeleted = current.join(
      scan.select("external_source", "path", "filename"),
      Seq("external_source", "path", "filename"), "left_anti")
    val newState = applied.unionByName(
      untouchedDeleted.drop("deleted")
        .join(dels, Seq("uuid_external_file"), "left")
        .select(applied.columns.toIndexedSeq.map(col): _*))
    // Dynamic partition overwrite: only the scanned sources' partitions
    // are replaced; every other partition's files stay byte-identical.
    // Hive-partitioned by source so the next scan's readState prunes to
    // its own slice; file count per partition follows the shuffle, not a
    // coalesce(1) bottleneck.
    newState.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("external_source").parquet(stateDir)
  }

  /** Run the incremental scrape over every scan file currently in
    * `watchDir`, one micro-batch per file, then stop. */
  def runAvailable(spark: SparkSession, watchDir: String, stateDir: String): Unit = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "external_source string, path string, filename string, " +
        "mime_type string, created timestamp, modified timestamp, size bigint")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .parquet(watchDir)
    val q = stream.writeStream
      .foreachBatch(mergeBatch(spark, stateDir) _)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", watchDir + ".checkpoint")
      .start()
    q.awaitTermination()
  }
}
