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
}
