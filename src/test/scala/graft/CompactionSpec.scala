package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Compaction

/** Layout properties of the compaction sink: file sizing from footer
  * metadata, row preservation, and disjoint per-file key ranges (the
  * min/max-pruning contract). */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fragmented(): (String, Long) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_frag").toString
    val d = Tables.documents(spark, TestSpark.sf001)
    // shuffle the key across 40 small files — the post-scrape worst case
    d.repartition(40, md5(col("doc_id").cast("string")))
      .write.mode("overwrite").parquet(dir)
    (dir, d.count())
  }

  test("compaction hits the target file count and preserves rows") {
    val (in, nRows) = fragmented()
    val out = java.nio.file.Files.createTempDirectory("graft_comp").toString
    val inBytes = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    // target ≈ a third of the data → expect ~3-4 output files
    val report = Compaction.compact(spark, in, out, Seq("doc_id"), inBytes / 3)
    assert(report.inFiles == 40)
    assert(report.rows == nRows)
    assert(report.outFiles < 10, s"still fragmented: ${report.outFiles} files")
    assert(spark.read.parquet(out).count() == nRows)
    // nothing lost or duplicated
    val sumIn = spark.read.parquet(in).agg(sum("doc_id")).head.getLong(0)
    val sumOut = spark.read.parquet(out).agg(sum("doc_id")).head.getLong(0)
    assert(sumIn == sumOut)
  }

  test("compacted files have disjoint cluster-key ranges") {
    val (in, _) = fragmented()
    val out = java.nio.file.Files.createTempDirectory("graft_comp2").toString
    val inBytes = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    Compaction.compact(spark, in, out, Seq("doc_id"), inBytes / 4)
    val ranges = Compaction.fileRanges(spark, out, "doc_id")
    assert(ranges.size > 1, "want multiple files to check disjointness")
    ranges.sliding(2).foreach { case Seq(a, b) =>
      assert(a._2 < b._1, s"overlapping file ranges $a and $b")
    case _ => ()
    }
  }

  test("z-order layout bounds BOTH dimensions; 1-D layout only the first") {
    import spark.implicits._
    // a 200x500 grid: x and y are independent — the adversarial case for
    // 1-D clustering
    val in = java.nio.file.Files.createTempDirectory("graft_zin").toString
    (0L until 100000L).map(i => (i % 200L, i / 200L, s"payload$i"))
      .toDF("x", "y", "p")
      .repartition(20).write.mode("overwrite").parquet(in)
    val inBytes = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val target = inBytes / 12 // ~12-16 output files

    val flat = java.nio.file.Files.createTempDirectory("graft_zflat").toString
    Compaction.compact(spark, in, flat, Seq("x"), target)
    val zord = java.nio.file.Files.createTempDirectory("graft_zord").toString
    Compaction.compactZOrder(spark, in, zord, "x", "y", target)

    def filesCovering(dir: String, column: String, v: Long): (Int, Int) = {
      val rs = Compaction.fileRanges(spark, dir, column)
      (rs.count { case (lo, hi) => lo <= v && v <= hi }, rs.size)
    }
    // both layouts prune on x
    assert(filesCovering(flat, "x", 100)._1 < filesCovering(flat, "x", 100)._2)
    assert(filesCovering(zord, "x", 100)._1 < filesCovering(zord, "x", 100)._2)
    // only the z-order layout prunes on y: 1-D files span all of y
    val (flatY, flatN) = filesCovering(flat, "y", 250)
    val (zY, zN) = filesCovering(zord, "y", 250)
    assert(flatY == flatN, s"1-D layout unexpectedly bounded y: $flatY/$flatN")
    assert(zY * 2 <= zN, s"z-order did not prune y: $zY/$zN files cover")
    // row preservation
    assert(spark.read.parquet(zord).count() == 100000L)
  }

  test("empty input compacts to an empty dataset without dividing by zero") {
    val in = java.nio.file.Files.createTempDirectory("graft_empty").toString
    val out = java.nio.file.Files.createTempDirectory("graft_empty_out").toString
    Tables.documents(spark, TestSpark.sf001).limit(0)
      .write.mode("overwrite").parquet(in)
    val report = Compaction.compact(spark, in, out, Seq("doc_id"))
    assert(report.rows == 0L)
    assert(spark.read.parquet(out).count() == 0L)
  }
}
