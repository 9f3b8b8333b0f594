package graft

import org.apache.spark.sql.SparkSession

/** Pure-SQL entry point: register the fixture tables as temp views and
  * the custom kernels as SQL functions, so a `spark.sql` user (or a
  * Thrift/Connect client on a cluster with
  * `spark.sql.extensions=graft.plans.GraftExtensions`) can run the whole
  * surface without the Scala Column API:
  *
  * {{{
  * graft.Sql.attach(spark, "/root/testdata/sf0.01")
  * spark.sql("SELECT doc_id, size(shingles(text, 5)) FROM documents ...")
  * }}}
  *
  * Views are lazy metadata over the parquet scans — attaching costs a few
  * footer reads, never a data pass, and every query through a view gets
  * the same pushdown/pruning as the Column API path.
  */
object Sql {
  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  def attach(spark: SparkSession, dir: String): Unit = {
    tableNames.foreach { t =>
      val df = t match {
        case "events" => Tables.events(spark, dir)
        case other => Tables.t(spark, dir, other)
      }
      df.createOrReplaceTempView(t)
    }
    plans.GraftFunctions.register(spark)
    // Spark 4 SQL UDFs (CREATE FUNCTION ... RETURN expr): declarative
    // helpers a pure-SQL user composes with — the body inlines into the
    // plan (full codegen, no UDF black box).
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION tok_count(text STRING)
        |RETURNS INT
        |RETURN size(filter(split(text, ' '), x -> x != ''))""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION cents(amount DOUBLE)
        |RETURNS BIGINT
        |RETURN cast(round(amount * 100) as bigint)""".stripMargin)
  }
}
