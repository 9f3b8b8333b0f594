package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TextIngest

/** Line-oriented ingestion: explicit schema, malformed lines quarantined
  * per line (not per shard), clean lines unaffected. */
class TextIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType.fromDDL(
    "doc_id BIGINT, lang STRING, text STRING")

  test("jsonl: good lines parse to the schema, bad lines quarantine with raw text") {
    val dir = Files.createTempDirectory("jsonl_in")
    val lines = Seq(
      """{"doc_id": 1, "lang": "en", "text": "hello world"}""",
      """{"doc_id": 2, "lang": "de", "text": "hallo"}""",
      """{"doc_id": broken""",
      """not json at all""",
      """{"doc_id": 3, "lang": "fr", "text": "bonjour"}""")
    Files.write(dir.resolve("part-0.jsonl"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    val (good, bad) = TextIngest.readJsonl(spark, dir.toString, schema)
    assert(good.columns.toSeq == Seq("doc_id", "lang", "text"))
    val g = good.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(g == Set((1L, "en"), (2L, "de"), (3L, "fr")))
    val q = bad.collect().map(_.getString(0)).toSet
    assert(q == Set("""{"doc_id": broken""", "not json at all"))
  }

  test("csv: type-mismatched rows quarantine, not crash or coerce") {
    val dir = Files.createTempDirectory("csv_in")
    val lines = Seq(
      "10,en,alpha",
      "oops,de,beta", // doc_id not a bigint
      "12,zh,gamma")
    Files.write(dir.resolve("part-0.csv"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    val (good, bad) = TextIngest.readCsv(spark, dir.toString, schema)
    assert(good.collect().map(_.getLong(0)).sorted.toSeq == Seq(10L, 12L))
    assert(bad.collect().map(_.getString(0)).toSeq == Seq("oops,de,beta"))
  }
}
