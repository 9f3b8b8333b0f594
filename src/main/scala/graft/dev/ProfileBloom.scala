package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: stage breakdown of the incremental bloom routing at
  * amplified scale. */
object ProfileBloom {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def docs(n: Int): DataFrame = {
      val d = graft.Tables.documents(spark, sfDir)
      (0 until n).map(i =>
        d.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
        .reduce(_ union _)
    }
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[bloomprof] $name%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val d = docs(mult)
    time("corpus scan+hash count")(
      d.select(xxhash64(col("text")).as("h")).filter(col("h") =!= 0).count())
    val n = 70000L * mult
    val nbits = math.max(64L,
      math.ceil(-n * math.log(0.01) / (math.log(2) * math.log(2))).toLong)
    time("bloom agg build") {
      val agg = new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(
          org.apache.spark.sql.graftshim.ColumnShim.expression(xxhash64(col("text"))),
          org.apache.spark.sql.catalyst.expressions.Literal(n),
          org.apache.spark.sql.catalyst.expressions.Literal(nbits))
        .toAggregateExpression()
      d.select(org.apache.spark.sql.graftshim.ColumnShim.column(agg).as("bf"))
        .head().getAs[Array[Byte]]("bf").length
    }
    time("corpus md5 distinct")(
      d.select(md5(col("text").cast("binary")).as("h")).distinct().count())
    val batch = d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 400000000L).as("doc_id"), col("text"))
      .union(d.filter(col("doc_id") % 5 === 1)
        .select((col("doc_id") + 500000000L).as("doc_id"),
          concat(lit("new material "), col("text")).as("text")))
    time("batch derive count")(batch.count())
    time("full novelAgainst")(
      graft.operators.Incremental.novelAgainst(d, batch, n, 0.01).count())
    spark.stop()
  }
}
