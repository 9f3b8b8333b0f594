package graft

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Kernels

/** Property fuzz for the codegen kernels against naive reference
  * implementations — random inputs catch the edge shapes the fixture
  * corpus never produces (empty strings, runs of separators, unicode,
  * single tokens, adversarial repeats). */
class KernelPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val genText: Gen[String] = for {
    words <- Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, Gen.oneOf(
      Gen.stringOfN(3, Gen.alphaLowerChar),
      Gen.oneOf("a", "bb", "ccc", "ωδ", "x y".take(1)),
      Gen.const(""))))         // empty tokens = separator runs when joined
    sep <- Gen.oneOf(" ", "  ", "   ")
  } yield words.mkString(sep)

  private def naiveShingles(s: String, w: Int): Seq[String] =
    s.split(" ").filter(_.nonEmpty).sliding(w).filter(_.length == w)
      .map(_.mkString(" ")).toSeq.distinct

  test("shinglesN matches the naive sliding-window formulation on random text") {
    for (text <- sample(genText, 200, 1L); w <- Seq(2, 3, 5)) {
      val got = Kernels.shinglesN(UTF8String.fromString(text), w)
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      assert(got == naiveShingles(text, w), s"text='$text' w=$w")
    }
  }

  test("sortedPairs yields exactly the ordered unordered-pair set") {
    val genIds = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-5L, 5L))).map(_.distinct)
    for (ids <- sample(genIds, 200, 2L)) {
      val arr = new GenericArrayData(ids.map(Long.box).toArray[Any])
      val got = (0 until Kernels.sortedPairs(arr).numElements()).map { i =>
        val r = Kernels.sortedPairs(arr).asInstanceOf[GenericArrayData]
          .array(i).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        (r.getLong(0), r.getLong(1))
      }.toSet
      val want = (for {
        i <- ids.indices; j <- (i + 1) until ids.length
      } yield (math.min(ids(i), ids(j)), math.max(ids(i), ids(j)))).toSet
      assert(got == want, s"ids=$ids")
    }
  }

  test("minhash is permutation-invariant and monotone under union") {
    def sig(xs: Seq[String]): Seq[Long] = {
      val a = Array(7L, 13L, 29L); val b = Array(3L, 5L, 11L)
      Kernels.minhash(new GenericArrayData(
        xs.map(s => UTF8String.fromString(s)).toArray[Any]), a, b).toLongArray().toSeq
    }
    val genSet = Gen.choose(1, 15).flatMap(n => Gen.listOfN(n, Gen.stringOfN(4, Gen.alphaNumChar))).map(_.distinct)
    for (xs <- sample(genSet, 100, 3L)) {
      assert(sig(xs) == sig(scala.util.Random.javaRandomToRandom(
        new java.util.Random(42)).shuffle(xs))) // order-free
      val ys = xs.map(_ + "!")
      // union can only lower each min
      sig(xs ++ ys).zip(sig(xs)).foreach { case (u, x) => assert(u <= x) }
    }
  }

  test("rollingHash: every substring window hash appears in the superstring") {
    val genAscii = Gen.choose(0, 60).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
    for (s <- sample(genAscii, 150, 4L); w <- Seq(4, 8)) {
      val full = Kernels.rollingHash(UTF8String.fromString(s), w).toLongArray().toSet
      if (s.length >= w + 3) {
        val sub = s.substring(1, s.length - 1)
        val subH = Kernels.rollingHash(UTF8String.fromString(sub), w).toLongArray().toSet
        assert(subH.subsetOf(full), s"s='$s' w=$w")
      } else {
        assert(full.size == math.max(0, s.getBytes("UTF-8").length - w + 1))
      }
    }
  }

  test("TopKAgg equals sort-take-k (score desc, id asc) for any merge tree") {
    val agg = new graft.functions.TopKAgg(4)
    val genPairs = Gen.choose(0, 24).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.oneOf(0.0, 0.25, 0.5, 1.0, -0.5), Gen.chooseNum(0L, 30L))))
    for (xs <- sample(genPairs, 150, 6L)) {
      val want = xs.sortBy { case (s, id) => (-s, id) }.take(4)
      val linear = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      assert(linear == want, s"xs=$xs")
      val (l, r) = xs.splitAt(xs.length / 2)
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      assert(merged == want, s"xs=$xs (merge)")
    }
  }

  test("CappedListAgg: under-cap groups keep membership, over-cap collapse on every merge tree") {
    val cap = 5
    val agg = new graft.functions.CappedListAgg(cap)
    val genXs = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, 99L)))
    for (xs <- sample(genXs, 150, 7L)) {
      def finishAll(splitAt: Int): Seq[Long] = {
        val (l, r) = xs.splitAt(splitAt)
        agg.finish(agg.merge(
          l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      }
      for (split <- Seq(0, xs.length / 3, xs.length / 2, xs.length)) {
        val got = finishAll(split)
        if (xs.length > cap) assert(got.isEmpty, s"xs=$xs split=$split")
        else assert(got.sorted == xs.sorted, s"xs=$xs split=$split")
        // buffers never exceed the cap mid-flight
        val buf = xs.foldLeft(agg.zero)(agg.reduce)
        assert(buf._1.length <= cap)
      }
    }
  }

  test("MinKAgg equals sort-take-k for any merge tree") {
    val agg = new graft.functions.MinKAgg(3)
    val genPairs = Gen.choose(0, 20).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.stringOfN(2, Gen.alphaLowerChar), Gen.chooseNum(0L, 9L))))
    for (xs <- sample(genPairs, 150, 5L)) {
      val want = xs.sorted.take(3)
      // linear reduce
      val linear = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      assert(linear == want, s"xs=$xs")
      // arbitrary two-sided merge
      val (l, r) = xs.splitAt(xs.length / 2)
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      assert(merged == want, s"xs=$xs (merge)")
    }
  }
}
