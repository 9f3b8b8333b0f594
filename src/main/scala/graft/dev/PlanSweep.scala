package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only: one-line plan summary per registered query — exchange /
  * sort / join-strategy counts over the whole registry, to catch plan
  * smells (unexpected sort-merge joins, exchange pile-ups) that
  * per-query audits miss. */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def count(p: String, what: String): Int = p.sliding(what.length).count(_ == what)
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        val ex = count(p, "Exchange") - count(p, "BroadcastExchange")
        val bhj = count(p, "BroadcastHashJoin")
        val smj = count(p, "SortMergeJoin")
        val bnl = count(p, "BroadcastNestedLoopJoin")
        val cart = count(p, "CartesianProduct")
        println(f"[sweep] $name%-24s shufEx=$ex bhj=$bhj smj=$smj bnl=$bnl cart=$cart")
      } catch { case e: Throwable =>
        println(s"[sweep] $name ERROR ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
  }
}
