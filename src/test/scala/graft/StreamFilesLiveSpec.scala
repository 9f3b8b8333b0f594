package graft

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.ScrapeStream

/** The graft-files streaming source: one micro-batch = one complete
  * rescan, driving the full live scrape loop (list → merge → tombstone)
  * against a real mutating directory tree — the reference's daemon
  * (`main.rs:64-96`) end-to-end with no intermediate scan files. */
class StreamFilesLiveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming rescan batch equals the batch listing") {
    val root = Files.createTempDirectory("graft_stream_src")
    Files.writeString(root.resolve("x.txt"), "xx")
    val sub = Files.createDirectories(root.resolve("s"))
    Files.writeString(sub.resolve("y.json"), "{}")

    val q = spark.readStream.format("graft-files")
      .option("path", root.toString).option("identifier", "ssrc").load()
      .writeStream.format("memory").queryName("files_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("files_stream")
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(6))).toSet
    val batch = spark.read.format("graft-files")
      .option("path", root.toString).option("identifier", "ssrc").load()
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(6))).toSet
    assert(streamed == batch && streamed.size == 2)
  }

  test("live scrape loop: rescans merge inserts, updates, tombstones") {
    val root = Files.createTempDirectory("graft_live_tree")
    val a = Files.createDirectories(root.resolve("a"))
    val b = Files.createDirectories(root.resolve("b"))
    Files.writeString(a.resolve("f1.txt"), "one")
    Files.writeString(a.resolve("f2.json"), "{}")
    Files.writeString(b.resolve("f3.txt"), "three")
    val state = Files.createTempDirectory("graft_live_state").toString

    ScrapeStream.runLiveListing(spark, root.toString, state, Some("livesrc"))
    val s1 = ScrapeStream.readState(spark, state).collect()
      .map(r => r.getString(3) -> r).toMap
    assert(s1.keySet == Set("f1.txt", "f2.json", "f3.txt"))
    assert(s1.values.forall(_.isNullAt(8))) // nothing tombstoned
    val f1Uuid = s1("f1.txt").getString(0)
    val f1ModBefore = s1("f1.txt").getTimestamp(6)

    // mutate the tree: delete f2, add f4, touch f1 forward
    Files.delete(a.resolve("f2.json"))
    Files.writeString(b.resolve("f4.csv"), "a,b")
    Files.writeString(a.resolve("f1.txt"), "one-changed")
    Files.setLastModifiedTime(a.resolve("f1.txt"),
      FileTime.fromMillis(f1ModBefore.getTime + 60000))

    ScrapeStream.runLiveListing(spark, root.toString, state, Some("livesrc"))
    val s2 = ScrapeStream.readState(spark, state).collect()
      .map(r => r.getString(3) -> r).toMap
    assert(s2.keySet == Set("f1.txt", "f2.json", "f3.txt", "f4.csv"))
    // vanished key tombstoned by the rescan
    assert(!s2("f2.json").isNullAt(8))
    // new file inserted live
    assert(s2("f4.csv").isNullAt(8) && s2("f4.csv").getLong(7) == 3L)
    // changed file updated in place, identity stable across rescans
    assert(s2("f1.txt").getTimestamp(6).getTime == f1ModBefore.getTime + 60000)
    assert(s2("f1.txt").getString(0) == f1Uuid)
    // untouched file survives unmodified
    assert(s2("f3.txt").isNullAt(8))
  }
}
