package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Similarity

/** The custom codegen kernels must be bit-identical to the built-in
  * higher-order-function formulations they replace (the folds are what
  * the DuckDB oracles were verified against). */
class ExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("CosineSimExpr is bit-identical to the fold formulation on real embeddings") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val probe = e.limit(1).select(col("emb").as("probe_emb"))
    val both = e.crossJoin(broadcast(probe))
      .select(
        Similarity.cosine(col("probe_emb"), col("emb")).as("kernel"),
        Similarity.cosineFold(col("probe_emb"), col("emb")).as("fold"))
    assert(both.filter(col("kernel") =!= col("fold")).count() == 0)
  }

  test("cosine kernel and fold both propagate NaN on zero-norm vectors") {
    val sp = spark
    import sp.implicits._
    // 0/0 inside the cosine: Spark orders NaN above every double, so an
    // unguarded clamp `when(c > 1.0, 1.0)` silently turns NaN into 1.0
    // (ADVICE r8); both formulations must keep NaN, like DuckDB.
    val df = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0)),
        (Seq(0.0, 0.0), Seq(0.0, 0.0)))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("kernel"),
        Similarity.cosineFold(col("a"), col("b")).as("fold"))
    val rows = df.collect()
    assert(rows.forall(r => r.getDouble(0).isNaN && r.getDouble(1).isNaN))
  }

  test("MinHashSignatureExpr matches the aggregate-fold arithmetic") {
    import graft.plans.GraftExpressions
    val a = Array(3L, 7L)
    val b = Array(11L, 13L)
    val P = 2147483647L
    val sp = spark
    import sp.implicits._
    val df = sp.createDataset(Seq(Seq("x", "y", "z"))).toDF("g")
      .select(
        GraftExpressions.minhash_signature(col("g"), a, b).as("kernel"),
        aggregate(
          transform(col("g"), s => pmod(xxhash64(s), lit(P))),
          array_repeat(lit(P), 2),
          (acc, h) => zip_with(acc, typedlit(Seq((3L, 11L), (7L, 13L))),
            (m, ab) => least(m, pmod(h * ab("_1") + ab("_2"), lit(P))))).as("fold"))
    val r = df.collect()(0)
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
  }

  test("Shingles3Expr matches the built-in formulation, incl. unicode and repeats") {
    val sp = spark
    import sp.implicits._
    val texts = Seq(
      "a b c d e",
      "über café naïve 日本語 テスト 五 words",
      "x  y   z w", // repeated separators
      "dup dup dup dup dup",
      "one two")
    val toks = filter(split(col("text"), " "), t => t =!= "")
    val fold = when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", slice(toks, i + 1, lit(3))))))
      .otherwise(array().cast("array<string>"))
    val rows = texts.toDF("text")
      .select(graft.plans.GraftExpressions.shingles3(col("text")).as("kernel"),
        fold.as("fold"))
      .collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("SQL registration: custom functions callable from spark.sql") {
    graft.plans.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
        |  simhash64(array('a','b')) AS f,
        |  size(shingles3('a b c d')) AS ns,
        |  size(minhash_signature(shingles3('a b c d e'))) AS nm,
        |  size(sorted_pairs(array(3L, 1L, 2L))) AS np,
        |  size(rolling_hash('abcdefghij', 8)) AS nr""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == 1.0)
    assert(r.getInt(2) == 2)
    assert(r.getInt(3) == 64)
    assert(r.getInt(4) == 3)
    assert(r.getInt(5) == 3)
  }

  test("RollingHashExpr: rolling equals direct polynomial hashes, shift-invariant") {
    val sp = spark
    import sp.implicits._
    val M = BigInt("2305843009213693951") // 2^61-1
    def direct(s: String, w: Int): Seq[Long] = {
      val b = s.getBytes("UTF-8")
      val hs = (0 to b.length - w).map { i =>
        b.slice(i, i + w).foldLeft(BigInt(0))((h, c) => (h * 257 + (c & 0xFF)) % M)
      }
      hs.map(_.toLong).distinct
    }
    val texts = Seq("the quick brown fox jumps over the lazy dog", "ab")
    val got = sp.createDataset(texts).toDF("t")
      .select(graft.plans.GraftExpressions.rolling_hash(col("t"), 8).as("h"))
      .collect().map(_.getSeq[Long](0))
    assert(got(0) == direct(texts(0), 8)) // O(1)-update result == O(w) recompute
    assert(got(1).isEmpty) // shorter than the window
    // containment: a substring's windows are a subset of the superstring's
    val sub = "quick brown fox"
    val subH = sp.createDataset(Seq(sub)).toDF("t")
      .select(graft.plans.GraftExpressions.rolling_hash(col("t"), 8).as("h"))
      .collect()(0).getSeq[Long](0).toSet
    assert(subH.subsetOf(got(0).toSet))
  }

  test("SortedPairsExpr matches the higher-order-function pair formulation") {
    import graft.plans.GraftExpressions
    val sp = spark; import sp.implicits._
    val lists = Seq(Seq(5L, 2L, 9L, 1L), Seq(3L, 4L), Seq(7L), Seq.empty[Long])
    val fold = flatten(transform(col("docs"), (x, i) =>
      transform(slice(col("docs"), i + 2, size(col("docs"))), y =>
        struct(least(x, y).as("d1"), greatest(x, y).as("d2")))))
    val rows = sp.createDataset(lists).toDF("docs")
      .select(GraftExpressions.sorted_pairs(col("docs")).as("kernel"), fold.as("fold"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[org.apache.spark.sql.Row](0) == r.getSeq[org.apache.spark.sql.Row](1))
    }
  }

  test("LshBucketsExpr matches the per-plane fold formulation on real embeddings") {
    val np = 6
    val ps = Similarity.planesFor(64, np)
    val flat = ps.flatten.toArray
    val e = graft.Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("embedding").cast("array<double>").as("emb"))
    val both = e.select(
      graft.plans.GraftExpressions.lsh_buckets(col("emb"), flat, np).as("kernel"),
      array(ps.map(tp => Similarity.bucketOfFold(col("emb"), tp)): _*).as("fold"))
    val rows = both.collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1).map(_.toInt))
    }
  }

  test("SimHash64Expr: identical token multisets agree, distinct-by-hash") {
    import graft.plans.GraftExpressions
    val sp = spark; import sp.implicits._
    val df = sp.createDataset(Seq(
      Seq("a", "b", "c"),
      Seq("a", "a", "b", "c", "c"), // duplicates ignored
      Seq("d", "e", "f")))
      .toDF("toks").select(GraftExpressions.simhash64(col("toks")).as("fp"))
    val fps = df.collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("lsh_buckets: Int bucket packing is guarded, numPlanesFor caps at 30") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // 1 << p aliases mod 32: plane counts past 30 must be rejected, and the
    // sizing function must never produce them even at absurd corpus sizes
    assert(graft.functions.Similarity.numPlanesFor(Long.MaxValue) == 30)
    assert(graft.functions.Similarity.numPlanesFor(1000) == 5)
    val emb = new GenericArrayData(Array.fill[Any](4)(1.0))
    val planes = Array.fill(31)(Array.fill(4)(1.0))
    intercept[IllegalArgumentException] {
      graft.plans.Kernels.lshBuckets(emb, planes, 31)
    }
  }

  test("ivf_cells: zero-norm vectors rank by rule (last), never by NaN ordering") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val zero = new GenericArrayData(Array.fill[Any](4)(0.0))
    val cents = Array(Array(1.0, 0, 0, 0), Array(0, 1.0, 0, 0), Array(0, 0, 1.0, 0))
    // all-zero embedding: every score is the defined -2.0 → index-ascending
    assert(graft.plans.Kernels.ivfCells(zero, cents, 2).toIntArray().toSeq == Seq(0, 1))
    // zero centroid ranks below any real match
    val emb = new GenericArrayData(Array[Any](1.0, 0.0, 0.0, 0.0))
    val cents2 = Array(Array(0.0, 0, 0, 0), Array(1.0, 0, 0, 0))
    assert(graft.plans.Kernels.ivfCells(emb, cents2, 2).toIntArray().toSeq == Seq(1, 0))
  }

  test("ShinglesExpr: width 3 equals shingles3, wider widths window correctly") {
    val sp = spark
    import sp.implicits._
    import graft.plans.GraftExpressions
    val df = sp.createDataset(Seq("a b c d e f", "one two", "x  y   z w q"))
      .toDF("t")
    val rows = df.select(
      GraftExpressions.shingles(col("t"), 3).as("s3p"),
      GraftExpressions.shingles3(col("t")).as("s3"),
      GraftExpressions.shingles(col("t"), 5).as("s5")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
    assert(rows(0).getSeq[String](2) == Seq("a b c d e", "b c d e f"))
    assert(rows(1).getSeq[String](2).isEmpty) // shorter than the window
    assert(rows(2).getSeq[String](2) == Seq("x y z w q")) // empties skipped
    // SQL surface: width must be an integer literal
    graft.plans.GraftFunctions.register(sp)
    assert(sp.sql("SELECT size(shingles('a b c d e f', 5)) AS n")
      .collect()(0).getInt(0) == 2)
    intercept[org.apache.spark.sql.AnalysisException] {
      sp.sql("SELECT shingles('a b c', 'x')").collect()
    }
  }

  test("rolling_hash SQL surface rejects non-integer-literal window at analysis") {
    graft.plans.GraftFunctions.register(spark)
    spark.range(3).selectExpr("CAST(id AS INT) AS w", "'abcdefghij' AS t")
      .createOrReplaceTempView("rh_t")
    val nonFoldable = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT rolling_hash(t, w) FROM rh_t").collect()
    }
    assert(nonFoldable.getMessage.contains("rolling_hash"))
    val wrongType = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT rolling_hash(t, 'x') FROM rh_t").collect()
    }
    assert(wrongType.getMessage.contains("rolling_hash"))
  }
}
