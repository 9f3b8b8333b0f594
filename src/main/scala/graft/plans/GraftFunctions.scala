package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-surface registration for the custom expressions, so `spark.sql`
  * users can call them without the Scala Column API:
  *
  *  - cluster deployment: `spark.sql.extensions=graft.plans.GraftExtensions`
  *  - existing session: `GraftFunctions.register(spark)`
  *
  * `minhash_signature` is exposed with the library's default permutation
  * table (64 perms, fixed seed — [[graft.operators.Dedup.perms]] analog);
  * parameterized tables stay on the Scala API.
  */
object GraftFunctions {

  private lazy val (defaultA, defaultB): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(42)
    val perms = Seq.fill(64)((rnd.nextInt(Int.MaxValue - 1).toLong + 1,
      rnd.nextInt(Int.MaxValue).toLong))
    (perms.map(_._1).toArray, perms.map(_._2).toArray)
  }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (es => CosineSimExpr(es(0), es(1))),
    "simhash64" -> (es => SimHash64Expr(es.head)),
    "shingles3" -> (es => Shingles3Expr(es.head)),
    // width must be an integer literal, e.g. shingles(text, 5)
    "shingles" -> (es => {
      import org.apache.spark.sql.types._
      val okType = es(1).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      if (!es(1).foldable || !okType)
        throw org.apache.spark.sql.graftshim.ColumnShim
          .nonFoldableArgumentError("shingles", "width", IntegerType)
      ShinglesExpr(es(0), es(1).eval().asInstanceOf[Number].intValue())
    }),
    "minhash_signature" -> (es => MinHashSignatureExpr(es.head, defaultA, defaultB)),
    "sorted_pairs" -> (es => SortedPairsExpr(es.head)),
    // window size must be an integer literal, e.g. rolling_hash(text, 32):
    // a column reference is unevaluable at analysis time and a string
    // literal is not a Number — both must surface as a clear analysis
    // error, not an obscure internal one.
    "rolling_hash" -> (es => {
      import org.apache.spark.sql.types._
      val okType = es(1).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      if (!es(1).foldable || !okType)
        throw org.apache.spark.sql.graftshim.ColumnShim
          .nonFoldableArgumentError("rolling_hash", "window", IntegerType)
      RollingHashExpr(es(0), es(1).eval().asInstanceOf[Number].intValue())
    }),
  )
  // lsh_buckets / ivf_cells take matrix parameters (plane/centroid arrays)
  // and stay on the Scala Column API.

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.plans.GraftExpressions", name),
        builder))
    }
    // plan lint: no-op unless spark.graft.maxLiteralBytes > 0
    e.injectOptimizerRule(BigLiteralGuard)
    // range-join bucketization: no-op unless
    // spark.graft.rangeJoin.bucketWidth > 0
    e.injectOptimizerRule(RangeJoinRewrite.apply)
  }
}
