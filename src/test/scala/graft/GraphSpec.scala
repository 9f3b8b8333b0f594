package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Independent re-implementation check for the integer PageRank: a naive
  * single-threaded Scala fixpoint over the same synthetic graph must
  * reproduce the distributed result EXACTLY (integer arithmetic makes
  * that a meaningful equality, not a tolerance check). */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("integer pagerank == naive in-memory fixpoint, bit-exact") {
    val rows = Graph.qLinkPagerank(spark, TestSpark.sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = rows.size
    val edges = for {
      i <- 0 until n
      k <- 1 to 3
    } yield (i.toLong, (i.toLong * i + k * 7) % n)
    var rank = Array.fill(n)(1000000000000L)
    for (_ <- 1 to 3) {
      val next = Array.fill(n)(150000000000L)
      edges.foreach { case (src, dst) =>
        next(dst.toInt) += rank(src.toInt) * 17 / 60
      }
      rank = next
    }
    (0 until n).foreach { i =>
      assert(rows(i.toLong) == rank(i), s"node $i")
    }
  }

  test("triangle census == naive in-memory enumeration") {
    val r = Graph.qGraphTriangles(spark, TestSpark.sf0001).collect()(0)
    val n = Tables.documents(spark, TestSpark.sf0001).count().toInt
    val und = (for {
      i <- 0 until n
      k <- 1 to 3
      j = ((i.toLong * i + k * 7) % n).toInt
      if i != j
    } yield (math.min(i, j), math.max(i, j))).toSet
    val adj = und.groupBy(_._1).map { case (a, es) => a -> es.map(_._2) }
      .withDefaultValue(Set.empty[Int])
    val tris = und.toSeq.map { case (a, b) => (adj(a) & adj(b)).size }.sum
    val deg = und.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map(_._2.size.toLong)
    assert(r.getLong(0) == n.toLong, "n_nodes")
    assert(r.getLong(1) == und.size.toLong, "n_edges")
    assert(r.getLong(2) == deg.map(d => d * (d - 1) / 2).sum, "n_wedges")
    assert(r.getLong(3) == tris.toLong, "n_triangles")
    assert(r.getLong(3) <= r.getLong(2), "triangles bounded by wedges")
  }

  test("pagerank is invariant under repartitioning") {
    val a = Graph.qLinkPagerank(spark, TestSpark.sf001).collect().toSeq
    val b = Graph.qLinkPagerank(spark, TestSpark.sf001)
      .repartition(13).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("connected components == naive union-find on the chain graph") {
    val got = Graph.qGraphComponents(spark, TestSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = Tables.documents(spark, TestSpark.sf001).count().toInt
    // Naive: walk the chain, splitting at the break points.
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for (i <- 0 until n - 1 if i % 7 != 6 && i % 11 != 10) {
      val (a, b) = (find(i), find(i + 1)); if (a != b) parent(math.max(a, b)) = math.min(a, b)
    }
    val comps = (0 until n).groupBy(find)
    val exp = comps.toSeq.map { case (lab, ms) =>
      (lab.toLong, ms.size.toLong, ms.max.toLong)
    }.sortBy(_._1)
    assert(got.toSeq == exp)
    // six unrolled iterations really are enough: max component diameter ≤ 6
    assert(comps.values.map(_.size).max <= 7)
  }

  test("assortativity == naive Pearson over endpoint degrees") {
    val r = Graph.qGraphAssortativity(spark, TestSpark.sf001).collect()(0)
    val n = Tables.documents(spark, TestSpark.sf001).count().toInt
    val und = (for {
      i <- 0 until n; k <- 1 to 3
      j = ((i.toLong * i + k * 7) % n).toInt; if i != j
    } yield (math.min(i, j), math.max(i, j))).toSet
    val deg = und.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    val pairs = und.toSeq.flatMap { case (a, b) => Seq((deg(a), deg(b)), (deg(b), deg(a))) }
    val m2 = pairs.size.toLong
    val sx = pairs.map(_._1).map(BigInt(_)).sum
    val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
    val sx2 = pairs.map(p => BigInt(p._1) * p._1).sum
    val expected = (BigInt(m2) * sxy - sx * sx).toDouble / (BigInt(m2) * sx2 - sx * sx).toDouble
    assert(r.getLong(0) == m2)
    assert(r.getDouble(1) == expected, s"got ${r.getDouble(1)} expected $expected")
    assert(math.abs(r.getDouble(1)) <= 1.0)
  }

  test("lpa: two triangles with a bridge resolve to two communities") {
    import spark.implicits._
    // triangle {0,1,2}, triangle {10,11,12}, bridge 2-10
    val nodes = Seq(0L, 1L, 2L, 10L, 11L, 12L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L),
      (10L, 11L), (11L, 12L), (10L, 12L), (2L, 10L)).toDF("src", "dst")
    val lab = graft.operators.Graph.lpa(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab(0) == lab(1) && lab(1) == lab(2), s"left triangle split: $lab")
    assert(lab(10) == lab(11) && lab(11) == lab(12), s"right triangle split: $lab")
    assert(lab(0) != lab(10), s"bridge merged the triangles: $lab")
  }

  test("lpa: communities partition the node set; labels are members") {
    val rows = graft.operators.Graph.qGraphLpa(spark, TestSpark.sf0001).collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == 500L, s"partition lost nodes: $total")
    rows.foreach { r =>
      val (community, minId, maxId) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(community >= 0 && community < 500, s"label $community not a node id")
      assert(minId <= maxId)
    }
    assert(rows.length > 1 && rows.length < 500)
  }

  test("rank mass: teleport floor holds, total mass bounded by initial") {
    val ranks = Graph.qLinkPagerank(spark, TestSpark.sf001).collect()
      .map(_.getLong(1))
    assert(ranks.forall(_ >= 150000000000L))
    val n = ranks.length
    assert(ranks.sum <= n * 1000000000000L)
    // damping actually redistributes: ranks are not all equal
    assert(ranks.distinct.length > 1)
  }
}
