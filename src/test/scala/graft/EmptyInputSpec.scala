package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input sweep: every registered query must plan and execute
  * (returning zero or more rows, never throwing) against zero-row tables
  * with the production schema — the shape of a brand-new deployment, an
  * empty partition, or a filter that matched nothing upstream. */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("empty_sf").toString
    Sql.tableNames.foreach { t =>
      spark.read.parquet(s"${TestSpark.sf0001}/$t.parquet")
        .limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every registered query executes on zero-row tables") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
