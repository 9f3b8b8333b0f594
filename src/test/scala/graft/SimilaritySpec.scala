package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Similarity

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine: identity, orthogonality, antipodality") {
    val df = Seq(
      (Seq(1.0, 0.0, 2.0), Seq(1.0, 0.0, 2.0)),
      (Seq(1.0, 0.0, 0.0), Seq(0.0, 5.0, 0.0)),
      (Seq(1.0, 2.0, 3.0), Seq(-1.0, -2.0, -3.0)),
    ).toDF("a", "b").select(Similarity.cosine(col("a"), col("b")).as("c"))
    val got = df.collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(got(1) == 0.0)
    assert(math.abs(got(2) + 1.0) < 1e-12)
  }

  test("brute-force top-k: self excluded, k rows per probe, ranks ordered") {
    val rows = Similarity.qSimTopk(spark, TestSpark.sf0001).collect()
    val byProbe = rows.groupBy(_.getLong(0))
    byProbe.foreach { case (p, rs) =>
      assert(rs.length == 5)
      assert(!rs.exists(_.getLong(1) == p))
      val cosines = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH ANN: recall@3 vs brute force >= 0.5 at sf0.001") {
    val brute = Similarity.qSimTopk(spark, TestSpark.sf0001)
      .filter(col("rank") <= 3)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.qSimLsh(spark, TestSpark.sf0001)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.count(lsh.contains).toDouble / brute.size
    assert(recall >= 0.5, s"recall@3 = $recall")
  }

  test("IVF ANN: self-consistent cells, pruned candidates, recall floor") {
    val rows = Similarity.qSimIvf(spark, TestSpark.sf0001).collect()
    // every probe returns some ranked neighbors, ranks ordered by cosine
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.nonEmpty)
    byProbe.foreach { case (_, rs) =>
      val cosines = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
    val brute = Similarity.qSimTopk(spark, TestSpark.sf0001)
      .filter(col("rank") <= 3)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivfPairs = Similarity.qSimIvf(spark, TestSpark.sf0001)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.count(ivfPairs.contains).toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall@3 = $recall")
  }

  test("k-means refinement raises the mean best-cosine objective") {
    import graft.plans.GraftExpressions
    val e = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val init = Similarity.ivfCentroids(64, 16)
    def objective(c: Array[Array[Double]]): Double = {
      // mean cosine of each vector to its assigned (nearest) centroid
      val assigned = e.select(
        element_at(GraftExpressions.ivf_cells(col("emb"), c, 1), 1).as("cell"),
        col("emb"))
      val cents = c.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
        .toDF("cell", "cvec")
      assigned.join(broadcast(cents), "cell")
        .select(GraftExpressions.cosine_sim(col("emb"),
          col("cvec").cast("array<double>")).as("cos"))
        .agg(avg(col("cos"))).collect()(0).getDouble(0)
    }
    val before = objective(init)
    val trained = Similarity.kmeansRefine(e, init, iters = 2)
    val after = objective(trained)
    assert(after > before,
      s"objective did not improve: before=$before after=$after")
  }

  test("near-dup: finds exactly the 20 perturbed variants") {
    val rows = Similarity.qSimNeardup(spark, TestSpark.sf0001)
      .select("vec_id", "var_id").as[(Long, Long)].collect().toSet
    assert(rows == (0L until 20L).map(i => (i, i + 100000)).toSet)
  }

  test("inertia/separation: match a naive in-memory centroid recompute") {
    val vecs = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("label"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getInt(0),
        r.getSeq[Double](1).map(x => math.floor(x * 10000d + 0.5d)).toArray))
      .groupBy(_._1).map { case (l, v) => l -> v.map(_._2) }
    val cents = vecs.map { case (l, xs) =>
      val n = xs.length
      val c = xs.transpose.map(_.sum / n).toArray
      l -> (n, c)
    }
    // inertia: direct mean |x - c|^2 — validates the E|x|^2 - |c|^2
    // identity the operator uses, not just its arithmetic
    val gotI = Similarity.qEmbInertia(spark, TestSpark.sf0001).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(gotI.keySet == vecs.keySet)
    vecs.foreach { case (l, xs) =>
      val (n, c) = cents(l)
      val naive = xs.map(x =>
        x.zip(c).map { case (xi, ci) => (xi - ci) * (xi - ci) }.sum).sum / n
      val (gn, csq, inertia) = gotI(l)
      assert(gn == n.toLong)
      assert(math.abs(inertia - naive) < math.abs(naive) * 1e-9 + 1e-6,
        s"label $l inertia $inertia vs naive $naive")
      assert(inertia >= 0.0 && csq >= 0.0)
    }
    val gotS = Similarity.qEmbSeparation(spark, TestSpark.sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val labels = cents.keys.toSeq.sorted
    assert(gotS.size == labels.size * (labels.size - 1) / 2)
    for (a <- labels; b <- labels if a < b) {
      val (ca, cb) = (cents(a)._2, cents(b)._2)
      val naive = ca.zip(cb).map { case (x, y) => (x - y) * (x - y) }.sum
      val d = gotS((a, b))
      assert(math.abs(d - naive) < math.abs(naive) * 1e-9 + 1e-6,
        s"pair ($a,$b) dist_sq $d vs naive $naive")
      assert(d >= 0.0)
    }
  }

  test("emb clusters: labels equal an in-memory union-find over the same pairs") {
    val got = Similarity.qEmbClusters(spark, TestSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    val pairs = Similarity.qSimNeardup(spark, TestSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val exp = parent.keys.map(v => (v, find(v))).toMap
    assert(got.length == exp.size, "every endpoint of a pair is labeled once")
    got.foreach { case (v, c) => assert(exp(v) == c, s"vec $v") }
    // every variant id (>=100000) clusters below itself: its source wins
    got.filter(_._1 >= 100000).foreach { case (v, c) => assert(c < v) }
  }

  test("semantic dedup: exactly the same-octant variants, dup_of = source") {
    val got = Similarity.qDedupSemantic(spark, TestSpark.sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // in-memory expectation: a variant is caught iff its octant (sign of
    // the first five components) survives the x→0.95x+0.001 perturbation
    val embs = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) as emb")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    def octant(e: Seq[Double]): Int =
      (0 until 5).map(i => if (e(i) > 0.0) 1 << (4 - i) else 0).sum
    val expected = embs.filter(_._1 < 40).flatMap { case (id, e) =>
      val v = e.map(x => x * 0.95 + 0.001)
      if (octant(v) == octant(e)) Some((octant(v), id + 100000L, id)) else None
    }.toSet
    assert(got.toSet == expected)
    assert(got.nonEmpty)
    // no false positives from the raw corpus: only injected variants dup
    assert(got.forall(_._2 >= 100000L))
  }

  test("cluster ARI: matches an in-memory recompute from the contingency") {
    val r = Similarity.qClusterAri(spark, TestSpark.sf0001).collect().head
    val n = r.getAs[Long]("n")
    // independent recompute: collect the (cell,label) contingency directly
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("label"), col("embedding").cast("array<double>").as("emb"))
    val octant = (0 until 5)
      .map(i => when(element_at(col("emb"), i + 1) > 0.0, lit(1 << (4 - i)))
        .otherwise(lit(0))).reduce(_ + _)
    val ct = e.select(octant.as("cell"), col("label")).collect()
      .map(x => (x.getInt(0), x.getAs[Number](1).intValue))
    assert(ct.length.toLong == n)
    def c2(x: Long) = x * (x - 1) / 2
    val nij = ct.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ai = ct.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val bj = ct.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val sc2: Long = nij.values.map(c2).sum
    val sa2: Long = ai.values.map(c2).sum
    val sb2: Long = bj.values.map(c2).sum
    val exp = sa2.toDouble * sb2.toDouble / c2(n)
    val ariRef = (sc2 - exp) / ((sa2 + sb2) / 2.0 - exp)
    assert(math.abs(r.getAs[Double]("ari") - ariRef) < 1e-12)
    val purityRef = ct.groupBy(_._1).values
      .map(g => g.groupBy(_._2).values.map(_.length).max.toLong).sum.toDouble / n
    assert(math.abs(r.getAs[Double]("purity") - purityRef) < 1e-12)
    assert(r.getAs[Double]("ari") <= 1.0 + 1e-12)
  }
}
