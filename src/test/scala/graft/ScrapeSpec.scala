package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scrape

/** Scenario coverage from FIXTURES.md §B over handcrafted rows:
  * upsert 3-case semantics (insert / update / unchanged-preserves-mime,
  * `db.rs:88-90,105-118`), anti-join deletion (`db.rs:48-65`), null-safe
  * compares, cross-source isolation, and rescan idempotence.
  */
class ScrapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val t1 = "2026-01-01 10:00:00"
  private val t2 = "2026-01-02 10:00:00"

  // (uuid, source, path, filename, mime, created, modified, size, deleted)
  private def currentDF: DataFrame = Seq(
    ("u1", "s1", "/a", "keep.txt", Some("text/plain"), Some(ts(t1)), ts(t1), Some(10L), None),
    ("u2", "s1", "/a", "changed.txt", Some("text/plain"), Some(ts(t1)), ts(t1), Some(20L), None),
    ("u3", "s1", "/a", "corrected.bin", Some("application/x-hand-fixed"), None, ts(t1), Some(30L), None),
    ("u4", "s1", "/a", "vanished.txt", Some("text/plain"), None, ts(t1), Some(40L), None),
    ("u5", "s2", "/a", "keep.txt", Some("text/plain"), None, ts(t1), Some(50L), None),
    ("u6", "s1", "/a", "nullsize.txt", Some("text/plain"), None, ts(t1), None, None),
    ("u7", "s1", "/a", "tombstone.txt", Some("text/plain"), None, ts(t1), Some(70L), Some(ts(t1))),
  ).toDF("uuid_external_file", "external_source", "path", "filename",
    "mime_type", "created", "modified", "size", "deleted")

  // (source, path, filename, mime, created, modified, size)
  private def scanDF: DataFrame = Seq(
    ("s1", "/a", "keep.txt", Some("text/plain"), Some(ts(t1)), ts(t1), Some(10L)),
    ("s1", "/a", "changed.txt", Some("text/plain"), Some(ts(t1)), ts(t2), Some(25L)),
    ("s1", "/a", "corrected.bin", None, None, ts(t1), Some(30L)),
    ("s1", "/a", "brandnew.json", Some("application/json"), None, ts(t2), Some(99L)),
    ("s1", "/a", "nullsize.txt", Some("text/plain"), None, ts(t1), None),
  ).toDF("external_source", "path", "filename", "mime_type", "created", "modified", "size")

  private lazy val classified =
    Scrape.upsertClassify(currentDF, scanDF).collect()
      .map(r => r.getString(2) -> r).toMap

  test("new key classifies as insert with null uuid") {
    val r = classified("brandnew.json")
    assert(r.getString(3) == "insert")
    assert(r.isNullAt(8))
  }

  test("metadata change classifies as update, mime follows the scan") {
    val r = classified("changed.txt")
    assert(r.getString(3) == "update")
    assert(r.getString(4) == "text/plain")
    assert(r.getString(8) == "u2")
  }

  test("unchanged row preserves hand-corrected mime_type") {
    val r = classified("corrected.bin")
    assert(r.getString(3) == "unchanged")
    assert(r.getString(4) == "application/x-hand-fixed") // db.rs:88-90 rule
  }

  test("null sizes compare null-safely: both-null size is unchanged") {
    assert(classified("nullsize.txt").getString(3) == "unchanged")
  }

  test("identical key under another source does not collide") {
    val r = classified("keep.txt") // s1's row
    assert(r.getString(3) == "unchanged")
    assert(r.getString(8) == "u1") // not u5 (s2's)
  }

  test("deletions: vanished + other-source + tombstoned rows, scan instant stamped") {
    val instant = lit("2026-01-15 00:00:00").cast("timestamp")
    val dels = Scrape.deletions(currentDF, scanDF, instant).collect()
    val uuids = dels.map(_.getString(0)).toSet
    // u4 vanished; u5 belongs to s2 (its key never scanned under s2);
    // u7 already tombstoned is re-stamped (faithful to db.rs:54-58).
    assert(uuids == Set("u4", "u5", "u7"))
    assert(dels.forall(_.getTimestamp(4) == ts("2026-01-15 00:00:00")))
  }

  test("seen-set covers exactly the scanned keys, deduplicated") {
    val seen = Scrape.seenKeys(currentDF, scanDF)
    assert(seen.count() == 5)
    assert(seen.select("filename").distinct().count() == 5)
  }

  test("rescan idempotence: applying the same scan twice yields no updates") {
    // State after merge: scan rows become the new current.
    val merged = Scrape.upsertClassify(currentDF, scanDF)
      .select(
        when(col("uuid_external_file").isNotNull, col("uuid_external_file"))
          .otherwise(concat(lit("new_"), col("filename"))).as("uuid_external_file"),
        col("external_source"), col("path"), col("filename"),
        col("mime_type"), col("created"), col("modified"), col("size"),
        lit(null).cast("timestamp").as("deleted"))
    val again = Scrape.upsertClassify(merged, scanDF)
    assert(again.filter(col("action") =!= "unchanged").count() == 0)
  }

  test("splitKeyCols (the q_scrape_s3 column split) stays in lockstep " +
      "with S3Wire.splitKey over adversarial keys incl. the root-key " +
      "case the reference panics on") {
    val spark = TestSpark.spark
    import spark.implicits._
    val keys = Seq("a/b/c.txt", "top.json", "d/", "", "x//y", "/lead.txt",
      "a b/é漢/x y.bin", "dot.d/.hidden", "tab\there/n l.bin",
      // newlines are legal in POSIX names: bare `.`/`$` regexes stop
      // at/before a line terminator and desync from the index split
      "new\nline/dir\n2/f.txt", "trail/name\n", "nl\nroot")
    val (path, filename) = Scrape.splitKeyCols(col("key"))
    val got = keys.toDF("key")
      .select(col("key"), path.as("p"), filename.as("f"))
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2)))).toMap
    keys.foreach { k =>
      assert(got(k) == graft.sources.S3Wire.splitKey(k),
        s"column split diverged from S3Wire.splitKey on '$k'")
    }
  }
}
