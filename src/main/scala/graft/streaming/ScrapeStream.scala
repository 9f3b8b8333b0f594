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
  *    tombstoning), then publishes partition-incrementally — the
  *    `foreachBatch` epilogue is where the JDBC transaction (PgMerge)
  *    would run against Postgres; here state is a parquet snapshot dir
  *    Hive-partitioned by `external_source`, and only the scanned
  *    sources' partition dirs are swapped (staged write → rename old
  *    aside → rename new in → drop old), approximating K2's
  *    readers-never-see-half-a-scan guarantee (`fs.rs:103-114`).
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
    * other sources can never join the scan), and publication swaps only
    * the scanned sources' partition dirs — every other partition's files
    * stay byte-identical. At 100 TB state a 1-file scan of one source
    * therefore rewrites one partition, not the whole table.
    *
    * Publication protocol (not Spark's overwrite commit, whose
    * delete-then-rename window can lose the old partition — including
    * tombstone rows a replay cannot reconstruct from the scan file): the
    * batch output is written to a per-batch staging dir, then per
    * partition the old dir is renamed aside into a dot-prefixed holding
    * dir (invisible to partition discovery), the staged dir is renamed
    * in, and the holding dir is dropped last. Any crash leaves either the
    * old or the new partition recoverable; [[recoverSwaps]] (run at the
    * start of every batch) finishes or rolls back an interrupted swap
    * before the streaming replay re-merges. Renames are atomic on
    * HDFS/POSIX; on object stores without atomic rename (raw S3) state
    * belongs in a log-structured table format instead. */
  def mergeBatch(spark: SparkSession, stateDir: String)(
      scan: DataFrame, batchId: Long): Unit = {
    // Bounded driver-side collect: one row per scanned source (a batch is
    // one scan file, almost always a single source).
    val sources = scan.select("external_source").distinct()
      .collect().map(_.getString(0)).toIndexedSeq
    if (sources.isEmpty) return
    recoverSwaps(spark, stateDir)
    val current = readState(spark, stateDir)
      .filter(col("external_source").isin(sources: _*))
    val classified = Scrape.upsertClassify(current, scan)
    val scanInstant = lit(new java.sql.Timestamp(1767225600000L + batchId))
      .cast("timestamp") // deterministic per-batch "transaction time"
    val applied = classified.select(
      coalesce(col("uuid_external_file"), ScrapeTws.uuidCol)
        .as("uuid_external_file"), // ONE copy of the surrogate (r18)
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
    // Stage the batch output beside the state dir (never inside it — the
    // stage must stay invisible to readState's partition discovery), then
    // swap the scanned partitions in explicitly. Hive-partitioned by
    // source so the next scan's readState prunes to its own slice; file
    // count per partition follows the shuffle, not a coalesce(1)
    // bottleneck.
    val stageDir = s"$stateDir.stage-$batchId"
    newState.write.mode(SaveMode.Overwrite)
      .partitionBy("external_source").parquet(stageDir)
    publishPartitions(spark, stageDir, stateDir, sources, batchId)
  }

  private def partDirName(source: String): String =
    "external_source=" + org.apache.spark.sql.catalyst.catalog
      .ExternalCatalogUtils.escapePathName(source)

  /** Swap the scanned sources' partition dirs from `stageDir` into
    * `stateDir`: old aside into `.old-<batchId>` → staged in → holding
    * dir dropped. Each step is a single FS rename (atomic on HDFS/POSIX);
    * [[recoverSwaps]] heals any crash between steps. */
  private def publishPartitions(spark: SparkSession, stageDir: String,
      stateDir: String, sources: Seq[String], batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val state = new Path(stateDir)
    val fs = state.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(state)
    val holding = new Path(state, s".old-$batchId")
    for (src <- sources) {
      val part = partDirName(src)
      val live = new Path(state, part)
      val staged = new Path(new Path(stageDir), part)
      if (fs.exists(staged)) {
        if (fs.exists(live)) {
          fs.mkdirs(holding)
          require(fs.rename(live, new Path(holding, part)),
            s"publish: failed to move $live aside")
        }
        require(fs.rename(staged, live), s"publish: failed to move $staged in")
      }
    }
    fs.delete(holding, true)
    fs.delete(new Path(stageDir), true)
  }

  /** Finish or roll back swaps interrupted by a crash. Rule per partition
    * found under a `.old-*` holding dir: if the live partition exists the
    * swap completed (the holding copy is garbage — drop it); if not, the
    * crash hit between aside and in — restore the old partition, and the
    * streaming replay of the uncommitted batch re-merges it. Leftover
    * `.stage-*` dirs are always garbage (the replay rewrites them). */
  def recoverSwaps(spark: SparkSession, stateDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val state = new Path(stateDir)
    val fs = state.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(state)) return
    for (h <- fs.listStatus(state)
         if h.isDirectory && h.getPath.getName.startsWith(".old-")) {
      for (p <- fs.listStatus(h.getPath) if p.isDirectory) {
        val live = new Path(state, p.getPath.getName)
        if (!fs.exists(live))
          require(fs.rename(p.getPath, live), s"recover: failed to restore $live")
      }
      fs.delete(h.getPath, true)
    }
    val parent = state.getParent
    if (parent != null && fs.exists(parent))
      for (st <- fs.listStatus(parent)
           if st.isDirectory && st.getPath.getName.startsWith(state.getName + ".stage-"))
        fs.delete(st.getPath, true)
  }

  /** The reference's scrape daemon, self-contained: each micro-batch of
    * the [[graft.sources.v2.FilesSource graft-files]] streaming source
    * is one complete distributed rescan of `rootUri`, merged into the
    * partitioned state exactly like [[runAvailable]]'s file-fed batches
    * (upsert classify → tombstone vanished keys → partition-swap
    * publish). `Trigger.AvailableNow` = one rescan cycle then stop (the
    * test/cron form); a `ProcessingTime` trigger = the reference's
    * poll-sleep loop (`main.rs:64-96`) with the interval as trigger
    * cadence. Because every batch is a complete scan of its source, the
    * per-batch deletion contract holds identically for live listings
    * and replayed scan files. */
  def runLiveListing(spark: SparkSession, rootUri: String, stateDir: String,
      identifier: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): Unit = {
    val reader = spark.readStream.format("graft-files").option("path", rootUri)
    val stream = identifier.fold(reader)(id => reader.option("identifier", id)).load()
    val q = stream.writeStream
      .foreachBatch(mergeBatch(spark, stateDir) _)
      .trigger(trigger)
      .option("checkpointLocation", stateDir + ".listing-checkpoint")
      .start()
    q.awaitTermination()
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
