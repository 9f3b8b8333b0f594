package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Graph}

/** Property fuzz for the round-10 relational kernels against naive
  * in-memory reference implementations: repeated-span detection
  * (random corpora with INJECTED shared runs — random text alone never
  * collides on 8-grams) and synchronous self-inclusive LPA (random
  * undirected graphs). Each trial runs the SHIPPED DataFrame pipeline. */
class SpanPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  // --- substring spans ---------------------------------------------

  private val k = 8

  /** 2-4 base docs plus derived docs embedding a random slice of a base
    * doc between noise tokens — shared runs of varied length, some
    * below k (must stay invisible), some spanning whole docs. */
  private val genCorpus: Gen[Seq[(Long, String)]] = for {
    nBase <- Gen.choose(2, 4)
    bases <- Gen.listOfN(nBase, Gen.choose(0, 25).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff"))))
    nDer <- Gen.choose(0, 3)
    ders <- Gen.listOfN(nDer, for {
      src <- Gen.choose(0, nBase - 1)
      a <- Gen.choose(0, math.max(0, bases(src).length - 1))
      b <- Gen.choose(a, bases(src).length)
      pre <- Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, Gen.oneOf("p1", "p2", "p3")))
      suf <- Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, Gen.oneOf("s1", "s2", "s3")))
    } yield pre ++ bases(src).slice(a, b) ++ suf)
  } yield (bases ++ ders).zipWithIndex.map { case (w, i) =>
    (i.toLong, w.mkString(" "))
  }

  private def bruteSpans(docs: Seq[(Long, String)]): Set[(Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq }
    val grams = toks.flatMap { case (id, w) =>
      if (w.length < k) Nil
      else (0 to w.length - k).map(i => (id, i, w.slice(i, i + k).mkString(" ")))
    }
    val dup = grams.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.size >= 2).keySet
    grams.filter(g => dup(g._3)).map(g => (g._1, g._2))
      .groupBy(_._1).flatMap { case (id, ps) =>
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        ps.map(_._2).sorted.foreach { i =>
          if (spans.nonEmpty && spans.last._1 + spans.last._2 == i)
            spans(spans.size - 1) = (spans.last._1, spans.last._2 + 1)
          else spans += ((i, 1))
        }
        spans.map { case (st, c) => (id, st.toLong, (c + k - 1).toLong) }
      }.toSet
  }

  test("substring spans == brute-force recompute on random corpora with injected runs") {
    var sawSpan = false
    for (docs <- sample(genCorpus, 12, 77L)) {
      val got = Dedup.substringSpansOf(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = bruteSpans(docs)
      assert(got == want, s"docs=$docs")
      if (want.nonEmpty) sawSpan = true
    }
    assert(sawSpan, "generator never produced a shared run ≥ k — fuzz is vacuous")
  }

  // --- LPA ----------------------------------------------------------

  private val genGraph: Gen[(Seq[Long], Seq[(Long, Long)])] = for {
    n <- Gen.choose(3, 10)
    edges <- Gen.listOf(for {
      a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L)
    } yield (a, b))
  } yield ((0L until n.toLong), edges.take(14))

  private def bruteLpa(nodes: Seq[Long], edges: Seq[(Long, Long)],
      rounds: Int = 3): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val adj = (und ++ und.map(_.swap) ++ nodes.map(v => (v, v)))
      .groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var lab = nodes.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      lab = nodes.map { v =>
        val votes = adj.getOrElse(v, Seq(v)).map(lab)
          .groupBy(identity).view.mapValues(_.size).toSeq
        v -> votes.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    lab
  }

  test("entity resolution == brute force on random name sets (blocking recall)") {
    val genEntities: Gen[Seq[(Long, String, Long, Double)]] = for {
      n <- Gen.choose(4, 24)
      names <- Gen.listOfN(n, Gen.choose(0, 6).flatMap(len =>
        Gen.stringOfN(len, Gen.oneOf('a', 'b'))))
    } yield names.zipWithIndex.map { case (nm, i) =>
      (i.toLong, nm, i.toLong % 2, i.toDouble)
    }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (ents <- sample(genEntities, 10, 55L)) {
      val got = graft.operators.Capstone.resolveEntities(spark,
          ents.toDF("ekey", "name", "nation", "acctbal"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // brute: lev<=1 AND unequal length AND same nation → union-find
      val pairs = for {
        a <- ents; b <- ents
        if a._1 < b._1 && a._3 == b._3 &&
          a._2.length != b._2.length && lev(a._2, b._2) <= 1
      } yield (a._1, b._1)
      val parent = scala.collection.mutable.Map(ents.map(e => e._1 -> e._1): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val inCluster = ents.filter(e =>
        pairs.exists(p => p._1 == e._1 || p._2 == e._1))
      val want = inCluster.groupBy(e => find(e._1)).map { case (cid, ms) =>
        val g = ms.minBy(e => (-e._4, e._1))
        (cid, ms.size.toLong, g._1)
      }.toSet
      assert(got == want, s"ents=$ents")
    }
  }

  test("lpa == brute-force synchronous propagation on random graphs") {
    for (((nodes, edges), i) <- sample(genGraph, 8, 99L).zipWithIndex) {
      val got = Graph.lpa(nodes.toDF("id"), edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = bruteLpa(nodes, edges)
      assert(got == want, s"trial=$i nodes=$nodes edges=$edges")
    }
  }
}
