package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the hot per-row kernels (SURVEY §7.4's
  * preference order: native `Expression` with codegen > UDF).
  *
  * The lambda-expression (`aggregate`/`zip_with`) formulations of these
  * kernels work but box every intermediate (a fresh 64-element object array
  * per input element) and are excluded from subexpression elimination.
  * These expressions run the loops over primitive arrays — the codegen
  * emits a call into a statically-compiled kernel, so the JIT sees one hot
  * monomorphic method instead of janino-compiled megamorphic lambdas.
  *
  * Numeric/bit parity is preserved exactly:
  *  - base hash = `pmod(xxhash64(s), P)` (same XXH64, seed 42, same pmod),
  *  - signature step `(base·a+b) mod P` in the same Long arithmetic,
  *  - cosine folds left-to-right in double — bit-identical to both the
  *    lambda formulation and DuckDB's `list_cosine_similarity` oracle.
  */
object Kernels {
  val P: Long = 2147483647L // 2^31-1, matches graft.operators.Dedup.P

  def minhash(arr: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, P)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      val base = ((h % P) + P) % P
      var j = 0
      while (j < k) {
        val v = (base * a(j) + b(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def simhash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val seen = new java.util.HashSet[Long]()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      if (seen.add(h)) {
        var j = 0
        while (j < 64) {
          votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  /** Distinct word-n-gram shingles of a text: split on ' ' (empties
    * skipped), windows of `width` joined by ' ', first-occurrence order.
    * Semantics match the built-in formulation
    * `array_distinct(transform(sequence(...), i => concat_ws(slice(...))))`. */
  def shinglesN(text: org.apache.spark.unsafe.types.UTF8String, width: Int): ArrayData = {
    val toks = new scala.collection.mutable.ArrayBuffer[String](64)
    val s = text.toString
    var start = 0
    val len = s.length
    while (start < len) {
      var end = s.indexOf(' ', start)
      if (end < 0) end = len
      if (end > start) toks += s.substring(start, end)
      start = end + 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](math.max(0, toks.length - width + 1))
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i + width - 1 < toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < width) { sb.append(' ').append(toks(i + j)); j += 1 }
      val g = sb.toString
      if (seen.add(g)) out += org.apache.spark.unsafe.types.UTF8String.fromString(g)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def shingles3(text: org.apache.spark.unsafe.types.UTF8String): ArrayData =
    shinglesN(text, 3)

  /** Rabin-Karp rolling hash: polynomial hash of every `window`-byte
    * substring of the UTF-8 text, computed with O(1) updates per position
    * (base 257, modulus 2^61-1). Returns the distinct window hashes —
    * a character-level fingerprint set for containment/near-dup checks.
    */
  def rollingHash(text: org.apache.spark.unsafe.types.UTF8String, window: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < window) return new GenericArrayData(Array.empty[Any])
    val M = 2305843009213693951L // 2^61-1
    val B = 257L
    // B^(window-1) mod M via modular multiplication (values < 2^61 need
    // mulmod; use BigInt-free 128-bit-safe multiply via Math.multiplyHigh)
    def mulmod(a: Long, b: Long): Long = {
      val hi = Math.multiplyHigh(a, b)
      val lo = a * b
      // fold 128-bit product into mod 2^61-1: (x mod 2^61) + (x >> 61)
      val lo61 = lo & M
      val hi61 = (hi << 3) | (lo >>> 61)
      var r = lo61 + hi61
      if (r >= M) r -= M
      r
    }
    var pow = 1L
    var i = 1
    while (i < window) { pow = mulmod(pow, B); i += 1 }
    var h = 0L
    i = 0
    while (i < window) {
      h = mulmod(h, B) + (bytes(i) & 0xFF)
      if (h >= M) h -= M
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    seen.add(h)
    i = window
    while (i < n) {
      val drop = mulmod(pow, (bytes(i - window) & 0xFF).toLong)
      h -= drop
      if (h < 0) h += M
      h = mulmod(h, B) + (bytes(i) & 0xFF)
      if (h >= M) h -= M
      seen.add(h)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  /** All unordered pairs {x,y} from a distinct-element long array, each
    * emitted as (min, max). Replaces the nested higher-order-function
    * formulation `flatten(transform(docs, (x,i) => transform(slice(...),
    * y => struct(least, greatest))))`, which Spark evaluates interpreted
    * (lambda functions are outside whole-stage codegen) with a fresh
    * object tree per element. */
  def sortedPairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var j = i + 1
      while (j < n) {
        val y = arr.getLong(j)
        val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
        if (x <= y) { row.setLong(0, x); row.setLong(1, y) }
        else { row.setLong(0, y); row.setLong(1, x) }
        out(k) = row
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sign-LSH bucket per hash table: for table t, bit p of the bucket is
    * the sign of `emb · planes(t*planesPerTable+p)`. One primitive loop
    * over all tables×planes — replaces per-plane `aggregate(zip_with(…))`
    * folds (interpreted, re-evaluated per plane). Dot products accumulate
    * left-to-right in double, identical to the fold formulation. */
  def lshBuckets(emb: ArrayData, planes: Array[Array[Double]],
      planesPerTable: Int): ArrayData = {
    // Int bucket packing: `1 << p` aliases mod 32, so >30 planes per table
    // would silently fold distinct planes onto the same bit.
    require(planesPerTable <= 30,
      s"lsh_buckets: planesPerTable must be <= 30 (Int bucket), got $planesPerTable")
    val numTables = planes.length / planesPerTable
    val out = new Array[Any](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0
      var p = 0
      while (p < planesPerTable) {
        val w = planes(t * planesPerTable + p)
        val n = math.min(emb.numElements(), w.length)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += emb.getDouble(i) * w(i); i += 1 }
        if (dot >= 0) bucket |= (1 << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** IVF cell scan: cosine of the embedding against every centroid, top-n
    * centroid indices by similarity (descending, index-ascending ties).
    * n=1 is cell assignment; n=nprobe is the probe's cell shortlist. */
  def ivfCells(emb: ArrayData, cents: Array[Array[Double]], n: Int): ArrayData = {
    val k = cents.length
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val w = cents(c)
      val m = math.min(emb.numElements(), w.length)
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < m) {
        val x = emb.getDouble(i)
        dot += x * w(i); na += x * x; nb += w(i) * w(i)
        i += 1
      }
      // Degenerate vectors (all-zero embedding or zero centroid) would
      // yield NaN and leave cell assignment to NaN ordering inside sortBy;
      // score them -2.0 (below the cosine range) so they rank last by rule.
      scores(c) = if (na == 0.0 || nb == 0.0) -2.0
        else {
          // same op tree + clamp as Kernels.cosine
          val s = dot / (math.sqrt(na) * math.sqrt(nb))
          if (s > 1.0) 1.0 else if (s < -1.0) -1.0 else s
        }
      c += 1
    }
    val top = (0 until k).sortBy(i => (-scores(i), i)).take(math.min(n, k))
    new GenericArrayData(top.map(Int.box).toArray[Any])
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    // The EXACT DuckDB list_cosine_similarity op tree, determined
    // empirically against all 4990 probe pairs of the sf0.001 fixture:
    // dot / (sqrt(na)·sqrt(nb)), then CLAMP to [-1, 1]. The clamp is
    // load-bearing: sqrt(s)² can exceed s by an ulp, so cos(v, v)
    // evaluates to 1.0000000000000002 unclamped — caught by
    // q_sim_maxsim, whose label groups contain the query vector itself
    // (dot/sqrt(na·nb) fixes self-pairs but breaks 1735/4990 non-self
    // pairs by an ulp — measured, not guessed). NaN (zero-norm input)
    // passes through the clamp unchanged, as in DuckDB.
    val c = dot / (math.sqrt(na) * math.sqrt(nb))
    if (c > 1.0) 1.0 else if (c < -1.0) -1.0 else c
  }
}

/** Distinct word-3-grams of a text column: `string` → `array<string>`. */
case class Shingles3Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects string")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles3"

  override protected def nullSafeEval(v: Any): Any =
    Kernels.shingles3(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.Kernels.shingles3($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct word-n-grams of a text column for a fixed window width:
  * `string` → `array<string>`. [[Shingles3Expr]] is the width-3 special
  * case kept for the SQL name `shingles3`. */
case class ShinglesExpr(child: Expression, width: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects string")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override protected def nullSafeEval(v: Any): Any =
    Kernels.shinglesN(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Kernels.shinglesN($c, $width);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct Rabin-Karp window hashes of a text: `string` → `array<long>`. */
case class RollingHashExpr(child: Expression, window: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects string")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(v: Any): Any =
    Kernels.rollingHash(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Kernels.rollingHash($c, $window);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature of a shingle set: `array<string>` → `array<long>` of
  * width `a.length`. */
case class MinHashSignatureExpr(child: Expression, a: Array[Long], b: Array[Long])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExpressions.requireArrayOf(child, StringType, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(v: Any): Any =
    Kernels.minhash(v.asInstanceOf[ArrayData], a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", a, "long[]")
    val bRef = ctx.addReferenceObj("mhB", b, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Kernels.minhash($c, $aRef, $bRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** SimHash fingerprint of a token array (distinct-by-hash inside):
  * `array<string>` → `long`. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExpressions.requireArrayOf(child, StringType, prettyName)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(v: Any): Any =
    Kernels.simhash(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.Kernels.simhash($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Unordered (min,max) pairs of a distinct-element `array<long>`:
  * `array<long>` → `array<struct<d1:long,d2:long>>`. */
case class SortedPairsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExpressions.requireArrayOf(child, LongType, prettyName)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("d1", LongType, nullable = false),
      StructField("d2", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "sorted_pairs"

  override protected def nullSafeEval(v: Any): Any =
    Kernels.sortedPairs(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.Kernels.sortedPairs($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Sign-LSH buckets of an `array<double>` embedding, one int bucket per
  * hash table: `array<double>` → `array<int>` of width
  * `planes.length / planesPerTable`. */
case class LshBucketsExpr(child: Expression, planes: Array[Array[Double]],
    planesPerTable: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExpressions.requireArrayOf(child, DoubleType, prettyName)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override protected def nullSafeEval(v: Any): Any =
    Kernels.lshBuckets(v.asInstanceOf[ArrayData], planes, planesPerTable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Kernels.lshBuckets($c, $pRef, $planesPerTable);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Top-n IVF centroid indices for an `array<double>` embedding:
  * `array<double>` → `array<int>` of width min(n, centroids). */
case class IvfCellsExpr(child: Expression, cents: Array[Array[Double]], n: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExpressions.requireArrayOf(child, DoubleType, prettyName)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_cells"

  override protected def nullSafeEval(v: Any): Any =
    Kernels.ivfCells(v.asInstanceOf[ArrayData], cents, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Kernels.ivfCells($c, $cRef, $n);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Cosine similarity of two `array<double>` columns. */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = GraftExpressions.requireArrayOf(left, DoubleType, prettyName)
    if (l.isFailure) l else GraftExpressions.requireArrayOf(right, DoubleType, prettyName)
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.Kernels.cosine($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Bloom-filter membership probe over a LONG column, the filter carried
  * as a serialized-bytes constructor parameter rather than a plan
  * `Literal`: Java arrays compare by reference, so optimizer-time
  * canonicalization/equality never walks the (megabyte-scale) filter —
  * with Catalyst's own `BloomFilterMightContain(Literal(bytes), …)` every
  * semantic-equality check during optimization hashes the full array,
  * measured as ~half the runtime of the incremental-dedup query at 10×
  * scale. The filter deserializes once per executor (`@transient lazy`),
  * and codegen calls straight into the sketch's `mightContainLong`. */
case class BloomMightContainExpr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects bigint, got ${other.simpleString}")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_might_contain"

  @transient private lazy val bloom =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))

  def mightContain(v: Long): Boolean = bloom.mightContainLong(v)

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", this,
      classOf[BloomMightContainExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContain($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-API entry points. */
object GraftExpressions {
  private[plans] def requireArrayOf(
      e: Expression, elem: DataType, fn: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(t, _) if t == elem => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn expects array<${elem.simpleString}>, got ${other.simpleString}")
    }

  def shingles3(text: Column): Column =
    ColumnShim.column(Shingles3Expr(ColumnShim.expression(text)))

  def shingles(text: Column, width: Int): Column =
    ColumnShim.column(ShinglesExpr(ColumnShim.expression(text), width))

  def rolling_hash(text: Column, window: Int): Column =
    ColumnShim.column(RollingHashExpr(ColumnShim.expression(text), window))

  def minhash_signature(shingles: Column, a: Array[Long], b: Array[Long]): Column =
    ColumnShim.column(
      MinHashSignatureExpr(ColumnShim.expression(shingles), a, b))

  def simhash64(tokens: Column): Column =
    ColumnShim.column(SimHash64Expr(ColumnShim.expression(tokens)))

  def lsh_buckets(emb: Column, planes: Array[Array[Double]],
      planesPerTable: Int): Column =
    ColumnShim.column(
      LshBucketsExpr(ColumnShim.expression(emb), planes, planesPerTable))

  def ivf_cells(emb: Column, cents: Array[Array[Double]], n: Int): Column =
    ColumnShim.column(IvfCellsExpr(ColumnShim.expression(emb), cents, n))

  def sorted_pairs(docs: Column): Column =
    ColumnShim.column(SortedPairsExpr(ColumnShim.expression(docs)))

  def cosine_sim(a: Column, b: Column): Column =
    ColumnShim.column(
      CosineSimExpr(ColumnShim.expression(a), ColumnShim.expression(b)))

  def bloom_might_contain(hash: Column, bloomBytes: Array[Byte]): Column =
    ColumnShim.column(
      BloomMightContainExpr(ColumnShim.expression(hash), bloomBytes))
}
