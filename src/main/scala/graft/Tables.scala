package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Parquet table access for the driver-provided fixtures
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md).
  *
  * All queries in this engine read through here so that the scan side
  * stays uniform: plain `spark.read.parquet`, letting Catalyst push
  * filters/column pruning into the parquet scan. At cluster scale the
  * same call reads `s3a://` URIs unchanged.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * has no native type for (TimestampType is µs). With
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in Verify/Bench/test
    * sessions) the column arrives as LongType nanos; convert by integer
    * division → µs truncation, matching how DuckDB reads the same file.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = t(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Table row count from parquet footer metadata only — reads a few KB of
    * footer per file on the driver, no Spark job, no data scan. The right
    * way to size data-dependent parameters (e.g. LSH plane counts) at plan
    * construction time: an eager `df.count()` there would be a full pass
    * over the corpus before the query even runs. */
  def parquetRowCount(s: SparkSession, path: String): Long = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = s.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (f.isFile && !n.startsWith("_") && !n.startsWith(".")) files += f
    }
    files.iterator.map { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** Money-as-cents: `round(x*100)` recovers the exact integer cents from a
    * 2-decimal price stored as double, identically in Spark and DuckDB
    * (the value is never at a rounding tie because 2-decimal values are not
    * exactly representable in binary). Integer sums are then exact in both
    * engines — the basis of every oracle-checked monetary aggregate here,
    * instead of order-dependent floating-point summation.
    */
  def cents(c: Column): Column = round(c * 100).cast("bigint")
}
