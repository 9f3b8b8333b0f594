package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.S3Wire

/** Contract spec for the ListObjectsV2 response parser (r17): the
  * generator KNOWS the page's truth, so every field asserts against it
  * directly — XML-escaped and unicode keys, namespaced and
  * namespace-free documents, nested Owner subtrees the parser must
  * skip, the echoed top-level request `<Prefix>` that must NOT be
  * collected as a common prefix, and the token-only-when-truncated
  * contract. The live-HTTP S3 suites cover real wire bytes end-to-end;
  * this pins the parse layer alone over shapes the in-JVM endpoint
  * doesn't emit. */
class S3ListXmlSpec extends AnyFunSuite {

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def page(ns: Boolean, echoPrefix: Option[String],
      objs: Seq[(String, String, Long)], prefixes: Seq[String],
      truncated: Boolean, token: Option[String],
      withOwner: Boolean): Array[Byte] = {
    val nsAttr = if (ns) " xmlns=\"http://s3.amazonaws.com/doc/2006-03-01/\"" else ""
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    sb ++= s"<ListBucketResult$nsAttr><Name>b</Name>"
    echoPrefix.foreach(p => sb ++= s"<Prefix>${esc(p)}</Prefix>")
    sb ++= s"<KeyCount>${objs.size}</KeyCount>"
    sb ++= s"<IsTruncated>$truncated</IsTruncated>"
    token.foreach(t =>
      sb ++= s"<NextContinuationToken>${esc(t)}</NextContinuationToken>")
    objs.foreach { case (k, lm, sz) =>
      sb ++= s"<Contents><Key>${esc(k)}</Key>"
      sb ++= s"<LastModified>$lm</LastModified>"
      if (withOwner)
        sb ++= "<Owner><ID>abc</ID><DisplayName>d&amp;n</DisplayName></Owner>"
      sb ++= "<ETag>&quot;x&quot;</ETag>"
      sb ++= s"<Size>$sz</Size><StorageClass>STANDARD</StorageClass>"
      sb ++= "</Contents>"
    }
    prefixes.foreach(p =>
      sb ++= s"<CommonPrefixes><Prefix>${esc(p)}</Prefix></CommonPrefixes>")
    sb ++= "</ListBucketResult>"
    sb.toString.getBytes("UTF-8")
  }

  test("adversarial generated pages parse to exactly the generated " +
      "truth; the echoed request Prefix is never collected") {
    val rnd = new scala.util.Random(17)
    val hostile = Seq("a&b<c>.txt", "dir x/é世.json", "q'\"r",
      "deep/a/b/c", "]]>odd", "sp ace & more")
    (1 to 200).foreach { _ =>
      val objs = (0 until rnd.nextInt(40)).map { i =>
        val key =
          if (rnd.nextBoolean()) hostile(rnd.nextInt(hostile.size)) + i
          else s"logs/f_$i.dat"
        val ts = java.time.Instant.ofEpochMilli(
          1700000000000L + rnd.nextLong() % 100000000000L)
        (key, ts.toString, rnd.nextLong().abs % 100000000L)
      }
      val prefixes = (0 until rnd.nextInt(4)).map(i => s"p$i/&x/")
      val truncated = rnd.nextBoolean()
      val token =
        if (rnd.nextBoolean()) Some("tok&<>" + rnd.nextInt()) else None
      val body = page(ns = rnd.nextBoolean(),
        echoPrefix = if (rnd.nextBoolean()) Some("echoed/&pre") else None,
        objs, prefixes, truncated, token, withOwner = rnd.nextBoolean())
      val got = S3Wire.parseListXml(body)
      assert(got.objects.map(o => (o.key, o.modifiedMs, o.size)) ==
        objs.map { case (k, lm, sz) =>
          (k, java.time.Instant.parse(lm).toEpochMilli, sz) },
        new String(body, "UTF-8"))
      assert(got.commonPrefixes == prefixes, "common prefixes exact — " +
        "the echoed request <Prefix> never leaks in")
      assert(got.nextToken == token.filter(_ => truncated),
        "the continuation token only counts on a truncated page")
    }
  }

  test("a DOCTYPE is refused (the response is data, not a trusted " +
      "document), and a Contents without Size fails loudly") {
    val doctype = ("<?xml version=\"1.0\"?><!DOCTYPE x [<!ENTITY e " +
      "\"y\">]><ListBucketResult><IsTruncated>false</IsTruncated>" +
      "</ListBucketResult>").getBytes("UTF-8")
    intercept[Exception](S3Wire.parseListXml(doctype))
    val missing = ("<ListBucketResult><Contents><Key>k</Key>" +
      "<LastModified>2026-01-01T00:00:00Z</LastModified>" +
      "</Contents><IsTruncated>false</IsTruncated>" +
      "</ListBucketResult>").getBytes("UTF-8")
    intercept[Exception](S3Wire.parseListXml(missing))
  }

  test("encoding-type=url (review r18): keys/prefixes decode ONLY when " +
      "the response echoes <EncodingType>url</> — '+' means space, " +
      "literal chars stay percent-encoded; raw pages keep '%' verbatim") {
    // S3's url form: space -> '+', '%' -> %25, control bytes -> %01
    // (the whole reason for the parameter: raw 0x01 is illegal XML)
    val encoded = ("<ListBucketResult>" +
      "<EncodingType>url</EncodingType>" +
      "<Contents><Key>dir+x/a%2Bb%2501%01.txt</Key>" +
      "<LastModified>2026-01-01T00:00:00Z</LastModified>" +
      "<Size>7</Size></Contents>" +
      "<CommonPrefixes><Prefix>sp+ace%2F/</Prefix></CommonPrefixes>" +
      "<IsTruncated>false</IsTruncated></ListBucketResult>")
      .replace("%01", "%2501") // keep the PAGE itself XML-legal
      .getBytes("UTF-8")
    val p = S3Wire.parseListXml(encoded)
    assert(p.objects.map(_.key) == Seq("dir x/a+b%01%01.txt"),
      s"decoded once, exactly: ${p.objects.map(_.key)}")
    assert(p.commonPrefixes == Seq("sp ace//"),
      s"prefixes decode too: ${p.commonPrefixes}")
    // NO echo: a store ignoring the parameter keeps raw keys — a '%'
    // or '+' in a real key must NOT be decoded
    val raw = ("<ListBucketResult>" +
      "<Contents><Key>100%+done.txt</Key>" +
      "<LastModified>2026-01-01T00:00:00Z</LastModified>" +
      "<Size>7</Size></Contents>" +
      "<IsTruncated>false</IsTruncated></ListBucketResult>")
      .getBytes("UTF-8")
    assert(S3Wire.parseListXml(raw).objects.map(_.key) ==
      Seq("100%+done.txt"), "raw pages stay verbatim")
  }

  test("LastModified with a numeric offset (review r18): a gateway " +
      "emitting +00:00 parses to the same instant as the Z form") {
    def one(lm: String): Long = S3Wire.parseListXml(
      ("<ListBucketResult><Contents><Key>k</Key>" +
        s"<LastModified>$lm</LastModified><Size>1</Size></Contents>" +
        "<IsTruncated>false</IsTruncated></ListBucketResult>")
        .getBytes("UTF-8")).objects.head.modifiedMs
    assert(one("2026-01-01T00:00:00Z") == one("2026-01-01T00:00:00+00:00"))
    assert(one("2026-01-01T03:00:00+03:00") == one("2026-01-01T00:00:00Z"))
  }
}
