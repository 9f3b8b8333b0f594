package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.col

import scala.jdk.CollectionConverters._

/** Size-targeted parquet compaction + range clustering — the layout
  * maintenance a 100 TB corpus needs between pipeline runs.
  *
  * Streaming scrapes and incremental merges leave datasets as thousands of
  * small files (each micro-batch commit is its own file set); small files
  * destroy scan throughput (per-file open/footer cost, no row-group
  * parallelism) and bloat the driver's split planning. Compaction rewrites
  * a dataset into files near a target byte size, range-clustered on a key:
  *
  *  - file sizing derives from the dataset's OWN bytes-per-row, measured
  *    from parquet footers (row counts) + file lengths — metadata only, no
  *    data scan before the rewrite;
  *  - `repartitionByRange` on the cluster key gives disjoint key ranges
  *    per file, so downstream point/range predicates prune whole files on
  *    parquet min/max stats (the poor man's Z-order for one dimension);
  *  - `maxRecordsPerFile` caps any straggler partition at the target.
  *
  * The rewrite itself is one range-shuffle of the data — exactly what a
  * distributed sort costs — and each output file is written by its own
  * task, so a 1000-executor cluster compacts 100 TB in parallel.
  */
object Compaction {

  /** What a compaction did: file counts/bytes before and after. */
  case class Report(
      inFiles: Int, inBytes: Long, rows: Long,
      outFiles: Int, outBytes: Long, rowsPerFile: Long)

  /** Per-file row count from the parquet footer (metadata read only). */
  private def footerRows(spark: SparkSession, file: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val in = HadoopInputFile.fromPath(new Path(file), conf)
    val r = ParquetFileReader.open(in)
    try r.getFooter.getBlocks.asScala.map(_.getRowCount).sum
    finally r.close()
  }

  private def listBytes(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.toString, s.getLen))
  }

  /** Rewrite `inDir` into `outDir` as range-clustered files of
    * ~`targetFileBytes` each, sorted by `clusterKeys` within and across
    * files. Returns a [[Report]] of the layout change. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      clusterKeys: Seq[String],
      targetFileBytes: Long = 512L * 1024 * 1024): Report = {
    require(clusterKeys.nonEmpty, "compaction needs at least one cluster key")
    val files = listBytes(spark, inDir)
    val inBytes = files.map(_._2).sum
    // Footer metadata only — the data itself is read once, by the rewrite.
    // At very large file counts this loop distributes trivially
    // (parallelize over file names); driver-side is fine into the tens of
    // thousands of footers.
    val rows = files.map(f => footerRows(spark, f._1)).sum
    val bytesPerRow = if (rows > 0) math.max(1L, inBytes / rows) else 1L
    val rowsPerFile = math.max(1L, targetFileBytes / bytesPerRow)
    val nFiles = math.max(1L, (rows + rowsPerFile - 1) / rowsPerFile).toInt
    val df = spark.read.parquet(inDir)
    df.repartitionByRange(nFiles, clusterKeys.map(col): _*)
      .sortWithinPartitions(clusterKeys.map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", rowsPerFile)
      .parquet(outDir)
    val out = listBytes(spark, outDir)
    Report(files.size, inBytes, rows, out.size, out.map(_._2).sum, rowsPerFile)
  }

  /** 16-bit even-position bit spread (classic z-curve "part1by1"), as
    * pure codegen'd bit algebra — x's 16 low bits land on bit positions
    * 0,2,4,…,30. */
  private def spread16(c: Column): Column = {
    import org.apache.spark.sql.functions.shiftleft
    val a = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(org.apache.spark.sql.functions.lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(org.apache.spark.sql.functions.lit(0x0F0F0F0FL))
    val d = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(org.apache.spark.sql.functions.lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(org.apache.spark.sql.functions.lit(0x55555555L))
  }

  /** Interleaved 32-bit z-value of two columns, each min/max-normalized
    * to 16 bits. Rows clustered by this key give every output file a
    * BOUNDED min/max rectangle in BOTH dimensions — multi-dimensional
    * file pruning, where 1-D clustering leaves the second column spanning
    * every file. */
  private def zValue(a: Column, b: Column,
      loA: Long, hiA: Long, loB: Long, hiB: Long): Column = {
    import org.apache.spark.sql.functions.{floor, least, lit}
    def scale(c: Column, lo: Long, hi: Long): Column =
      if (hi <= lo) lit(0L)
      else least(lit(65535L), floor(
        (c.cast("double") - lit(lo.toDouble)) * 65535.0d /
          lit((hi - lo).toDouble)).cast("long"))
    spread16(scale(a, loA, hiA))
      .bitwiseOR(shiftLeftL(spread16(scale(b, loB, hiB)), 1))
  }

  private def shiftLeftL(c: Column, n: Int): Column =
    org.apache.spark.sql.functions.shiftleft(c, n)

  /** [[compact]], but clustered on the z-order curve of TWO long columns:
    * one extra metadata-cheap min/max aggregation normalizes each
    * dimension, then the rewrite is the same single range-shuffle keyed on
    * the interleaved z-value. Point/range predicates on EITHER column
    * prune whole files on parquet min/max stats (spec-asserted against
    * the 1-D layout, where only the leading column prunes). */
  def compactZOrder(spark: SparkSession, inDir: String, outDir: String,
      colA: String, colB: String,
      targetFileBytes: Long = 512L * 1024 * 1024): Report = {
    val files = listBytes(spark, inDir)
    val inBytes = files.map(_._2).sum
    val rows = files.map(f => footerRows(spark, f._1)).sum
    val bytesPerRow = if (rows > 0) math.max(1L, inBytes / rows) else 1L
    val rowsPerFile = math.max(1L, targetFileBytes / bytesPerRow)
    val nFiles = math.max(1L, (rows + rowsPerFile - 1) / rowsPerFile).toInt
    val df = spark.read.parquet(inDir)
    import org.apache.spark.sql.functions.{max, min}
    val bounds = df.agg(
      min(col(colA)), max(col(colA)), min(col(colB)), max(col(colB))).head()
    val z =
      if (bounds.isNullAt(0) || bounds.isNullAt(2))
        org.apache.spark.sql.functions.lit(0L) // empty input
      else zValue(col(colA), col(colB),
        bounds.getLong(0), bounds.getLong(1),
        bounds.getLong(2), bounds.getLong(3))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", rowsPerFile)
      .parquet(outDir)
    val out = listBytes(spark, outDir)
    Report(files.size, inBytes, rows, out.size, out.map(_._2).sum, rowsPerFile)
  }

  /** Min/max of a long column per output file, from footers — the stats a
    * scan prunes on. Exposed for the layout spec. */
  def fileRanges(spark: SparkSession, dir: String, column: String): Seq[(Long, Long)] = {
    val df = spark.read.parquet(dir)
    df.select(
        org.apache.spark.sql.functions.input_file_name().as("f"),
        col(column).as("k"))
      .groupBy("f")
      .agg(org.apache.spark.sql.functions.min("k").as("lo"),
        org.apache.spark.sql.functions.max("k").as("hi"))
      .collect().toSeq
      .map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
  }
}
