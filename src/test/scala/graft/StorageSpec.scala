package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Read-side robustness levers a 100 TB table needs in practice: schema
  * evolution across file generations, and tolerance of corrupt files in
  * a scan (a petabyte-scale directory always contains a few). */
class StorageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("mergeSchema unifies appended columns; old files read as null") {
    val dir = Files.createTempDirectory("schema_evo")
    val d = Tables.documents(spark, TestSpark.sf0001)
    val gen1 = d.select(col("doc_id"), col("lang"))
    val gen2 = d.select(col("doc_id"), col("lang"),
      length(col("text")).as("n_chars2"))
    gen1.write.mode("overwrite").parquet(dir.toString + "/p=1")
    gen2.write.mode("overwrite").parquet(dir.toString + "/p=2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(dir.toString)
    assert(merged.columns.toSet == Set("doc_id", "lang", "n_chars2", "p"))
    val n = d.count()
    assert(merged.count() == 2 * n)
    // generation-1 rows surface the evolved column as null, not an error
    assert(merged.filter(col("n_chars2").isNull).count() == n)
  }

  test("ignoreCorruptFiles: a garbage file in the directory doesn't kill the scan") {
    val dir = Files.createTempDirectory("corrupt_scan")
    val d = Tables.documents(spark, TestSpark.sf0001).select("doc_id", "lang")
    d.write.mode("overwrite").parquet(dir.toString)
    Files.write(Paths.get(dir.toString, "part-junk.parquet"),
      Array.fill[Byte](512)(42))
    val prior = spark.conf.getOption("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try {
      val read = spark.read.parquet(dir.toString)
      assert(read.count() == d.count()) // all real rows, junk skipped
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.files.ignoreCorruptFiles", v)
      case None => spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
    }
  }
}
