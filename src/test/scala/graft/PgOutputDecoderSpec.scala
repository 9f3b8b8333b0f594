package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.PgChangeFeed

/** OFFLINE coverage for the pgoutput (protocol v1) decoder behind the
  * `graft-pg` changefeed. The frames below are REAL bytes captured from
  * PostgreSQL 15.18's `pg_logical_slot_peek_binary_changes(…,
  * 'proto_version','1',…)` against the engine's own `external_file`
  * DDL — Begin/Relation/Insert from a default-identity table,
  * Update/Delete from the REPLICA IDENTITY FULL form the feed
  * bootstraps (old images complete). A PG-less environment still
  * covers every message shape the live feed decodes. */
class PgOutputDecoderSpec extends AnyFunSuite {

  private val begin =
    "4200000003c43227900002fc1c764993d10000229c"
  private val relation = // replident 'd' (pre-bootstrap), 8 columns
    "520000833f7075626c69630065787465726e616c5f66696c65006400080065787465726e616c5f736f757263650000000019ffffffff00706174680000000019ffffffff0066696c656e616d650000000019ffffffff006d696d655f747970650000000019ffffffff006372656174656400000004a0ffffffff006d6f64696669656400000004a0ffffffff0073697a650000000014ffffffff0064656c6574656400000004a0ffffffff"
  private val insert =
    "490000833f4e000874000000015374000000022f647400000005612e747874740000000a746578742f706c61696e6e740000001d323032362d30312d30322030333a30343a30352e3637383930312b30307400000001376e"
  private val commit =
    "430000000003c432279000000003c43227c00002fc1c764993d1"
  private val relationFull = // replident 'f' (the bootstrapped form)
    "520000833f7075626c69630065787465726e616c5f66696c65006600080165787465726e616c5f736f757263650000000019ffffffff01706174680000000019ffffffff0166696c656e616d650000000019ffffffff016d696d655f747970650000000019ffffffff016372656174656400000004a0ffffffff016d6f64696669656400000004a0ffffffff0173697a650000000014ffffffff0164656c6574656400000004a0ffffffff"
  private val update = // old image size=7, new image size=9
    "550000833f4f000874000000015374000000022f647400000005612e747874740000000a746578742f706c61696e6e740000001d323032362d30312d30322030333a30343a30352e3637383930312b30307400000001376e4e000874000000015374000000022f647400000005612e747874740000000a746578742f706c61696e6e740000001d323032362d30312d30322030333a30343a30352e3637383930312b30307400000001396e"
  private val delete = // old image size=9
    "440000833f4f000874000000015374000000022f647400000005612e747874740000000a746578742f706c61696e6e740000001d323032362d30312d30322030333a30343a30352e3637383930312b30307400000001396e"

  private def feed(d: PgChangeFeed.Decoder,
      hex: String): Seq[PgChangeFeed.Change] =
    d.feed(PgChangeFeed.fromHex(hex))

  test("captured pgoutput frames decode to the exact changes: insert " +
      "new image, update new image, delete OLD image (REPLICA IDENTITY " +
      "FULL), with the commit timestamp from Begin") {
    val d = new PgChangeFeed.Decoder("external_file")
    assert(feed(d, begin).isEmpty)
    assert(feed(d, relation).isEmpty)
    val ins = feed(d, insert).head
    assert(ins.action == "insert")
    assert(ins.values("external_source") == Some("S"))
    assert(ins.values("path") == Some("/d"))
    assert(ins.values("filename") == Some("a.txt"))
    assert(ins.values("mime_type") == Some("text/plain"))
    assert(ins.values("created").isEmpty, "NULL column decodes to None")
    assert(ins.values("modified") ==
      Some("2026-01-02 03:04:05.678901+00"))
    assert(ins.values("size") == Some("7"))
    assert(ins.values("deleted").isEmpty)
    // Begin's timestamp is pgoutput micros since 2000-01-01: the
    // captured transaction committed 2026-08-15 (this harness session)
    val committed = java.time.Instant.ofEpochSecond(
      ins.commitTsMicros / 1000000L)
    assert(committed.toString.startsWith("2026-08-15"),
      s"commit ts decoded: $committed")
    assert(feed(d, commit).isEmpty)
    // the FULL-identity relation re-registers, then update/delete
    assert(feed(d, relationFull).isEmpty)
    val upd = feed(d, update) match {
      case Seq(one) => one
      case more => fail(s"same-identity update emits ONE change: $more")
    }
    assert(upd.action == "update" && upd.values("size") == Some("9"),
      "update emits the NEW image")
    val del = feed(d, delete).head
    assert(del.action == "delete" && del.values("size") == Some("9") &&
      del.values("filename") == Some("a.txt"),
      "delete emits the complete OLD image under REPLICA IDENTITY FULL")
  }

  test("foreign relations are skipped, unregistered relations and " +
      "unknown tags fail loudly, LSNs round-trip") {
    // a decoder watching a DIFFERENT table sees the same frames: the
    // relation registers, but its changes emit nothing
    val other = new PgChangeFeed.Decoder("some_other_table")
    assert(feed(other, relation).isEmpty)
    assert(feed(other, insert).isEmpty)
    // a change BEFORE its Relation message is protocol corruption
    val fresh = new PgChangeFeed.Decoder("external_file")
    val e = intercept[IllegalStateException](feed(fresh, insert))
    assert(e.getMessage.contains("unregistered relation"))
    // unknown message tags are loud (silent drift = silently dropped
    // changes)
    val d = new PgChangeFeed.Decoder("external_file")
    val u = intercept[IllegalStateException](
      d.feed(PgChangeFeed.fromHex("7a00"))) // tag 'z'
    assert(u.getMessage.contains("unknown message tag"))
    // LSN text form round-trips through the 64-bit offset
    assert(PgChangeFeed.formatLsn(
      PgChangeFeed.parseLsn("3/C4322688")) == "3/C4322688")
    assert(PgChangeFeed.parseLsn("0/0") == 0L)
    assert(PgChangeFeed.parseLsn("FFFFFFFF/FFFFFFFF") == -1L)
    // slot/publication names travel into engine SQL: strict charset
    intercept[IllegalArgumentException](
      PgChangeFeed.checkedName("slot", "bad name"))
    intercept[IllegalArgumentException](
      PgChangeFeed.checkedName("slot", "1slot"))
    intercept[IllegalArgumentException](
      PgChangeFeed.checkedName("slot", "Slot'; DROP--"))
    assert(PgChangeFeed.checkedName("slot", "graft_slot_2") ==
      "graft_slot_2")
  }

  // --- review-r16 shapes, captured live from the same server ------------

  private val renameRelation = // fix_r: (source, path, filename, size), FULL
    "5200004d5c7075626c6963006669785f72006600040165787465726e616c5f736f757263650000000019ffffffff01706174680000000019ffffffff0166696c656e616d650000000019ffffffff0173697a650000000014ffffffff"
  private val renameUpdate = // UPDATE SET filename a.txt->b.txt, size 7->9
    "5500004d5c4f000474000000015374000000022f647400000005612e7478747400000001374e000474000000015374000000022f647400000005622e747874740000000139"

  test("an identity-changing UPDATE (rename) emits delete(old identity) " +
      "+ update(new identity) — the old image is USED, so compaction " +
      "never keeps a phantom live row under the old name") {
    val d = new PgChangeFeed.Decoder("fix_r")
    assert(feed(d, begin).isEmpty)
    assert(feed(d, renameRelation).isEmpty)
    val out = feed(d, renameUpdate)
    assert(out.length == 2, s"got $out")
    val Seq(delOld, updNew) = out
    assert(delOld.action == "delete" &&
      delOld.values("filename") == Some("a.txt") &&
      delOld.values("size") == Some("7"),
      "the OLD identity tombstones with its complete old image")
    assert(updNew.action == "update" &&
      updNew.values("filename") == Some("b.txt") &&
      updNew.values("size") == Some("9"))
    // a NON-identity update over the same relation stays one change
    // (the basic `update` fixture pins that above)

    // a key-only ('K') old tuple means the replica identity was
    // flipped mid-stream: its absent columns are indistinguishable
    // from SQL NULL, so the decoder fails LOUDLY (continuing would
    // risk a phantom old row or a null-identity tombstone) — a stream
    // restart re-bootstraps FULL
    val kForm = renameUpdate.replaceFirst("4f", "4b") // 'O' -> 'K'
    val dk = new PgChangeFeed.Decoder("fix_r")
    assert(feed(dk, begin).isEmpty)
    assert(feed(dk, renameRelation).isEmpty)
    val ke = intercept[IllegalStateException](feed(dk, kForm))
    assert(ke.getMessage.contains("REPLICA IDENTITY"), ke.getMessage)
  }

  test("foreign-table key-only images are SKIPPED, not fatal (review " +
      "r18): a DEFAULT-identity table published alongside must never " +
      "crash-loop the feed with the WATCHED table's remediation") {
    // decoder watches external_file; fix_r registers as a FOREIGN
    // relation whose updates/deletes arrive with 'K' old images
    // (default replica identity) — before the reorder these threw
    // keyOnlyMsg and, being past confirmed_flush_lsn, re-threw on
    // every restart
    val d = new PgChangeFeed.Decoder("external_file")
    assert(feed(d, begin).isEmpty)
    assert(feed(d, renameRelation).isEmpty)
    assert(feed(d, renameUpdate.replaceFirst("4f", "4b")).isEmpty,
      "foreign 'U' with a key-only old image skips")
    assert(feed(d, "4400004d5c4b0000").isEmpty,
      "foreign 'D' with a key-only old image skips")
    // the watched table's own frames still decode afterwards
    assert(feed(d, relationFull).isEmpty)
    assert(feed(d, update).exists(_.action == "update"),
      "the feed continues normally past the foreign frames")
  }

  test("an unchanged out-of-line (TOASTed) column arrives as 'u' and is " +
      "resolved from the REPLICA IDENTITY FULL old image — never " +
      "aliased to SQL NULL") {
    // captured frames: fix_t (big TEXT, STORAGE EXTERNAL, FULL),
    // UPDATE SET path='/e' not touching big — the new image carries
    // 'u' for big, the old image its full 2112-byte value
    val lines = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/pgoutput_toast_frames.txt"))
      .getLines().filterNot(_.startsWith("#")).toVector
    val Seq(toastRelation, toastUpdate) = lines
    val d = new PgChangeFeed.Decoder("fix_t")
    assert(feed(d, begin).isEmpty)
    assert(feed(d, toastRelation).isEmpty)
    val out = feed(d, toastUpdate)
    // SET path='/e' moves the file identity too, so the rename fan-out
    // fires: delete(old /d) + update(new /e) — and BOTH carry the big
    // value ('u' resolved in the new image, full text in the old)
    assert(out.length == 2 && out.map(_.action) == Seq("delete", "update"),
      s"got $out")
    val upd = out(1)
    assert(upd.values("path") == Some("/e"))
    assert(out(0).values("path") == Some("/d") &&
      out(0).values("big").exists(_.length == 2112))
    val big = upd.values("big")
    assert(big.exists(_.length == 2112),
      s"the unchanged TOAST value carries FORWARD (got " +
        s"${big.map(_.length)})")
    // md5('1') leads the string_agg fixture — an index-misalignment
    // regression in the carry-forward would break this exact prefix
    assert(big.exists(_.startsWith("c4ca4238a0b9")), s"got $big")
    // and WITHOUT a complete old image the same 'u' fails loudly
    // instead of silently corrupting: replay the new-image-only form
    // by synthesizing an Update with kind 'N' directly
    val hex = toastUpdate
    val body = PgChangeFeed.fromHex(hex)
    // locate the 'N' new-tuple start: tag(1) + oid(4), then 'O' old
    // tuple — rebuild as tag + oid + new tuple only
    val oidEnd = 5
    val nIdx = {
      // the old tuple is 4 cells; walk it like the decoder does
      var i = oidEnd + 1 + 2 // skip 'O', ncols
      (0 until 4).foreach { _ =>
        body(i).toChar match {
          case 't' =>
            val len = java.nio.ByteBuffer.wrap(body, i + 1, 4).getInt
            i += 5 + len
          case _ => i += 1
        }
      }
      i
    }
    assert(body(nIdx).toChar == 'N')
    val noOld = body.slice(0, oidEnd) ++ body.slice(nIdx, body.length)
    val d2 = new PgChangeFeed.Decoder("fix_t")
    assert(d2.feed(PgChangeFeed.fromHex(begin)).isEmpty)
    assert(d2.feed(PgChangeFeed.fromHex(toastRelation)).isEmpty)
    val e = intercept[IllegalStateException](d2.feed(noOld))
    assert(e.getMessage.contains("old image"), e.getMessage)
  }

  test("a same-named table in ANOTHER SCHEMA is not the watched " +
      "relation: namespace is matched, not just relname") {
    // the captured relation frame names public.fix_r; a decoder
    // watching audit.fix_r must skip its changes entirely
    val d = new PgChangeFeed.Decoder("fix_r", namespace = "audit")
    assert(feed(d, begin).isEmpty)
    assert(feed(d, renameRelation).isEmpty)
    assert(feed(d, renameUpdate).isEmpty,
      "public.fix_r's changes are not audit.fix_r's")
    // the default namespace matches the captured public frames
    val pub = new PgChangeFeed.Decoder("fix_r")
    assert(feed(pub, begin).isEmpty)
    assert(feed(pub, renameRelation).isEmpty)
    assert(feed(pub, renameUpdate).nonEmpty)
  }
}
