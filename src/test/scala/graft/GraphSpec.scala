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

  test("pagerank is invariant under repartitioning") {
    val a = Graph.qLinkPagerank(spark, TestSpark.sf001).collect().toSeq
    val b = Graph.qLinkPagerank(spark, TestSpark.sf001)
      .repartition(13).orderBy("doc_id").collect().toSeq
    assert(a == b)
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
