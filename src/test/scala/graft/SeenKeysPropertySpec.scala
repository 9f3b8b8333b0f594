package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Equivalence proof for the round-8 seenKeys collapse: the or-filter
  * single-join form must return EXACTLY the r7 two-branch
  * union-distinct on arbitrary inputs — including duplicate natural
  * keys on either side, null sizes (the >i64 overflow case), null
  * created, and disjoint key sets. The old formulation is re-stated
  * here as the independent reference.
  */
class SeenKeysPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
  private lazy val spark = TestSpark.spark

  private val curSchema = StructType(Seq(
    StructField("uuid_external_file", StringType),
    StructField("external_source", StringType),
    StructField("path", StringType),
    StructField("filename", StringType),
    StructField("mime_type", StringType),
    StructField("created", TimestampType),
    StructField("modified", TimestampType),
    StructField("size", LongType),
    StructField("deleted", TimestampType)))

  private val scanSchema = StructType(Seq(
    StructField("external_source", StringType),
    StructField("path", StringType),
    StructField("filename", StringType),
    StructField("mime_type", StringType),
    StructField("created", TimestampType),
    StructField("modified", TimestampType),
    StructField("size", LongType)))

  private def ts(s: Long): java.sql.Timestamp = new java.sql.Timestamp(s * 1000)

  // Small key domain forces overlaps, duplicates, and misses.
  private val genKey = for {
    p <- Gen.oneOf("/a", "/b")
    f <- Gen.oneOf("x", "y", "z")
  } yield (p, f)
  private val genSize = Gen.oneOf(Gen.const(null.asInstanceOf[java.lang.Long]),
    Gen.choose(0L, 3L).map(java.lang.Long.valueOf))
  private val genTsOpt = Gen.oneOf(Gen.const(null.asInstanceOf[java.sql.Timestamp]),
    Gen.choose(0L, 3L).map(ts))

  private val genCurRow = for {
    (p, f) <- genKey
    u <- Gen.choose(0, 99)
    created <- genTsOpt
    mod <- Gen.choose(0L, 3L).map(ts)
    size <- genSize
  } yield Row(u.toString, "demo", p, f, "text/plain", created, mod, size, null)

  private val genScanRow = for {
    (p, f) <- genKey
    created <- genTsOpt
    mod <- Gen.choose(0L, 3L).map(ts)
    size <- genSize
  } yield Row("demo", p, f, "text/plain", created, mod, size)

  private def df(schema: StructType, rows: List[Row]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

  /** The r7 formulation, verbatim: two branches off one left join,
    * unioned distinct. */
  private def seenKeysReference(current: DataFrame, scan: DataFrame): DataFrame = {
    val c = current.as("c")
    val n = scan.as("n")
    val keyCols = Seq("external_source", "path", "filename")
    val joinCond = keyCols.map(k => n(k) === c(k)).reduce(_ && _)
    def changed = !(n("created") <=> c("created")) ||
      !(n("modified") <=> c("modified")) || !(n("size") <=> c("size"))
    val joined = n.join(c, joinCond, "left")
      .select(c("uuid_external_file"), n("path"), n("filename"),
        (c("filename").isNull || changed).as("upserted"),
        (c("filename").isNotNull && (n("size") <=> c("size"))).as("j1_match"),
        c("path").as("c_path"), c("filename").as("c_filename"))
    val upserted = joined.filter(col("upserted"))
      .select(col("uuid_external_file"), col("path"), col("filename"))
    val existing = joined.filter(col("j1_match"))
      .select(col("uuid_external_file"), col("c_path").as("path"),
        col("c_filename").as("filename"))
    upserted.union(existing).distinct()
  }

  test("or-filter seenKeys == two-branch union-distinct on random frames") {
    val genFrames = for {
      cur <- Gen.listOfN(8, genCurRow)
      scan <- Gen.listOfN(8, genScanRow)
    } yield (cur, scan)
    sample(genFrames, 30, seed = 88L).foreach { case (curRows, scanRows) =>
      val cur = df(curSchema, curRows)
      val scan = df(scanSchema, scanRows)
      def key(r: Row) = (Option(r.get(0)).map(_.toString),
        r.getString(1), r.getString(2))
      val got = graft.operators.Scrape.seenKeys(cur, scan)
        .collect().map(key).toSet
      val want = seenKeysReference(cur, scan).collect().map(key).toSet
      assert(got == want)
    }
  }
}
