package graft.dev

import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.sources.S3Wire
import graft.sources.S3Wire.{S3Conf, S3Object}

/** Measured evidence for the r14 shard planner (VERDICT r13 #4): an
  * in-JVM ListObjectsV2 endpoint serves a synthetic skewed namespace —
  * one hot hierarchical prefix holding ~everything plus one hot FLAT
  * prefix with hash-spread keys — and the probe times the full
  * distributed listing single-cursor (`maxDepth=0`, the r13 plan)
  * against the recursive plan (`maxDepth=2`: re-delimited children +
  * start-after range shards).
  *
  * The endpoint skips signature verification (the live S3WireSpec
  * endpoint verifies it; this probe measures SHARDING, not signing)
  * and responds from a sorted in-memory key array, so measured deltas
  * are cursor-parallelism, not server work.
  *
  * Run: `sbt "runMain graft.dev.S3ShardProbe [totalKeys]"`
  */
object S3ShardProbe {

  private def xesc(s: String): String = s.flatMap {
    case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"
    case c => c.toString
  }

  /** Lean ListObjectsV2 semantics over a sorted key array: prefix,
    * delimiter grouping, max-keys, continuation-token == last covered
    * key, start-after as an initial token. Takes a SUPPLIER so a caller
    * can swap the namespace between listings ([[graft.ProductBench]]'s
    * churn cycle); this probe's namespace is fixed. */
  private[graft] def handle(servedNow: () => Array[S3Object])(
      ex: HttpExchange): Unit = {
    val served = servedNow()
    val params = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      .split("&").filter(_.nonEmpty).map { kv =>
        val Array(k, v) = kv.split("=", 2).padTo(2, "")
        java.net.URLDecoder.decode(k, "UTF-8") ->
          java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
    val prefix = params.getOrElse("prefix", "")
    val delim = params.get("delimiter")
    val maxKeys = params.get("max-keys").map(_.toInt).getOrElse(1000)
    val after = params.get("continuation-token")
      .orElse(params.get("start-after"))
    val inPrefix = served.filter(_.key.startsWith(prefix))
    val entries: Seq[Either[S3Object, (String, String)]] = delim match {
      case None => inPrefix.toSeq.map(Left(_))
      case Some(d) =>
        val out = Seq.newBuilder[Either[S3Object, (String, String)]]
        var i = 0
        while (i < inPrefix.length) {
          val o = inPrefix(i)
          val rest = o.key.drop(prefix.length)
          if (rest.contains(d)) {
            val g = prefix + rest.takeWhile(_ != d.head) + d
            var j = i
            while (j < inPrefix.length && inPrefix(j).key.startsWith(g)) j += 1
            out += Right((g, inPrefix(j - 1).key))
            i = j
          } else { out += Left(o); i += 1 }
        }
        out.result()
    }
    val remaining = entries.filter {
      case Left(o) => after.forall(o.key > _)
      case Right((_, lastKey)) => after.forall(lastKey > _)
    }
    val page = remaining.take(maxKeys)
    val truncated = remaining.size > maxKeys
    val lastCovered = page.lastOption.map {
      case Left(o) => o.key
      case Right((_, lk)) => lk
    }
    val next =
      if (truncated) s"<NextContinuationToken>${xesc(lastCovered.get)}" +
        "</NextContinuationToken><IsTruncated>true</IsTruncated>"
      else "<IsTruncated>false</IsTruncated>"
    val xml = (s"""<?xml version="1.0" encoding="UTF-8"?>""" +
      "<ListBucketResult><Name>b</Name>" + next +
      page.collect { case Left(o) =>
        s"<Contents><Key>${xesc(o.key)}</Key><LastModified>" +
          java.time.Instant.ofEpochMilli(o.modifiedMs).toString +
          s"</LastModified><Size>${o.size}</Size></Contents>"
      }.mkString +
      page.collect { case Right((g, _)) =>
        s"<CommonPrefixes><Prefix>${xesc(g)}</Prefix></CommonPrefixes>"
      }.mkString + "</ListBucketResult>").getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/xml")
    ex.sendResponseHeaders(200, xml.length)
    ex.getResponseBody.write(xml)
  }

  def main(args: Array[String]): Unit = {
    val total = args.headOption.map(_.toInt).getOrElse(200000)
    // skew shape: 60% under ONE hierarchical prefix (20 day-children),
    // 39.9% under ONE flat prefix with hash-spread hex keys, a sliver
    // of root objects — the r13 "logs/ holds everything" degeneration
    val hierN = (total * 0.6).toInt
    val flatN = (total * 0.399).toInt
    val served = ((0 until hierN).map { i =>
      S3Object(f"logs/day${i % 20}%02d/part-$i%08d.json", 1700000000000L + i,
        100L + i)
    } ++ (0 until flatN).map { i =>
      S3Object(f"blobs/${Integer.toHexString(i * 2654435761L.toInt)}%s.bin",
        1700000000000L + i, 10L)
    } ++ (0 until (total - hierN - flatN)).map(i =>
      S3Object(s"root$i.txt", 1700000000000L, 1L)))
      .distinct.sortBy(_.key).toArray
    println(s"[s3-shard-probe] serving ${served.length} keys")

    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      try handle(() => served)(ex) finally ex.close()
    })
    val pool = java.util.concurrent.Executors.newFixedThreadPool(64)
    server.setExecutor(pool)
    server.start()
    val conf = S3Conf(s"http://127.0.0.1:${server.getAddress.getPort}",
      "us-east-1", "k", "s", pathStyle = true)

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("s3-shard-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String, depth: Int): Long = {
      val t0 = System.nanoTime()
      val n = S3Wire.listDF(spark, conf, "b", "", maxDepth = depth).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[s3-shard-probe] $label%-28s $n%8d keys in $sec%7.2f s " +
        f"(${n / sec}%9.0f keys/s)")
      n
    }
    // warmup primes codegen + the HTTP stack, then each mode twice
    time("warmup (depth 2)", 2)
    val a1 = time("single cursor (maxDepth=0)", 0)
    val b1 = time("recursive plan (maxDepth=2)", 2)
    val a2 = time("single cursor (maxDepth=0)", 0)
    val b2 = time("recursive plan (maxDepth=2)", 2)
    require(a1 == b1 && a2 == b2 && a1 == served.length,
      s"listing inequality: $a1 $b1 vs ${served.length}")
    server.stop(0)
    pool.shutdownNow() // non-daemon pool would pin the JVM open
    spark.stop()
  }
}
